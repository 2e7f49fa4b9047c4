"""From-scratch baseline PNG codec (sources/png.py) — round-trips over
every filter/color-type combination, hand-crafted decode fixtures for
the shapes the encoder doesn't write (palette, sub-byte depths,
16-bit), and the spec'd error paths (CRC, Adam7, truncation)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from xcube_spark.sources.png import (
    SIGNATURE,
    PngError,
    decode_png,
    encode_png,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _make_png(width, height, depth, ctype, raw_scanlines, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, 0)
    return (SIGNATURE + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(raw_scanlines))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "adaptive"])
def test_roundtrip_every_filter_and_color_type(channels, filter_type):
    rng = np.random.default_rng(channels * 10 + hash(str(filter_type)) % 7)
    for shape in ((1, 1), (3, 5), (17, 16), (40, 7)):
        a = rng.integers(0, 256, size=(*shape, channels), dtype=np.uint8)
        pix, info = decode_png(encode_png(a, filter_type=filter_type))
        got = pix if pix.ndim == 3 else pix[:, :, None]
        assert info["width"] == shape[1] and info["height"] == shape[0]
        assert np.array_equal(got, a)


def test_roundtrip_smooth_gradient_adaptive():
    """A smooth image makes the adaptive heuristic pick the predictive
    filters (Sub/Up/Avg/Paeth), exercising the recurrent decode."""
    x = np.arange(256, dtype=np.float64)
    img = np.stack([(np.add.outer(x, x) / 2), np.add.outer(x, x[::-1]) / 2,
                    np.tile(x, (256, 1))], axis=-1).astype(np.uint8)
    data = encode_png(img)
    pix, info = decode_png(data)
    assert np.array_equal(pix, img)
    # predictive filtering + zlib actually compresses
    assert len(data) < img.nbytes // 4


def test_decode_palette():
    """Color type 3: 8-bit palette indexes expand through PLTE."""
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    # 2x3 image of indexes, filter 0 rows
    raw = bytes([0, 0, 1, 2, 0, 3, 2, 0])
    data = _make_png(3, 2, 8, 3, raw, extra=_chunk(b"PLTE", palette))
    pix, info = decode_png(data)
    assert info["channels"] == 3 and info["color_type"] == 3
    assert pix.shape == (2, 3, 3)
    assert tuple(pix[0, 0]) == (255, 0, 0)
    assert tuple(pix[1, 0]) == (7, 8, 9)
    assert tuple(pix[1, 1]) == (0, 0, 255)


def test_decode_sub_byte_depths():
    """Gray at depths 1/2/4 unpack high-bit-first per spec."""
    # depth 1, width 10: bits 1100110011 -> 2 bytes per row (0xCC, 0xC0)
    raw = bytes([0, 0b11001100, 0b11000000])
    pix, info = decode_png(_make_png(10, 1, 1, 0, raw))
    assert info["bit_depth"] == 1
    assert pix.tolist() == [[1, 1, 0, 0, 1, 1, 0, 0, 1, 1]]
    # depth 4, width 3: samples F, 0, A -> bytes F0 A0
    raw4 = bytes([0, 0xF0, 0xA0])
    pix4, _ = decode_png(_make_png(3, 1, 4, 0, raw4))
    assert pix4.tolist() == [[15, 0, 10]]
    # depth 2, width 5: 3,2,1,0,3 -> 11100100 11000000
    raw2 = bytes([0, 0b11100100, 0b11000000])
    pix2, _ = decode_png(_make_png(5, 1, 2, 0, raw2))
    assert pix2.tolist() == [[3, 2, 1, 0, 3]]


def test_decode_16_bit():
    """Depth 16 decodes big-endian to uint16."""
    raw = bytes([0, 0x01, 0x00, 0xFF, 0xFE])  # 256, 65534
    pix, info = decode_png(_make_png(2, 1, 16, 0, raw))
    assert pix.dtype == np.uint16
    assert pix.tolist() == [[256, 65534]]


def test_decode_multiple_idat_chunks():
    """IDAT payload reassembles across chunk boundaries."""
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = encode_png(a, filter_type=0)
    # re-split the IDAT into two chunks (parse, don't slice blindly)
    pos, parts = 8, {}
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        parts[tag] = data[pos + 8:pos + 8 + length]
        pos += 12 + length
    comp = parts[b"IDAT"]
    half = len(comp) // 2
    rebuilt = (SIGNATURE + _chunk(b"IHDR", parts[b"IHDR"])
               + _chunk(b"IDAT", comp[:half])
               + _chunk(b"IDAT", comp[half:]) + _chunk(b"IEND", b""))
    pix, _ = decode_png(rebuilt)
    assert np.array_equal(pix, a)


def test_crc_mismatch_raises():
    data = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    data[20] ^= 0xFF  # corrupt inside IHDR body
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(data))


def test_adam7_roundtrip_matches_sequential():
    """r12: Adam7 is implemented — interlaced encodes of the same
    image decode byte-identical to the sequential decode, across
    shapes that exercise absent passes (w or h < 8) and all filter
    types."""
    rng = np.random.default_rng(7)
    for h, w, c in [(1, 1, 1), (2, 3, 3), (7, 7, 1), (8, 8, 4),
                    (9, 13, 3), (5, 2, 1), (1, 9, 3), (33, 31, 3)]:
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        if c == 1:
            img = img[:, :, 0]
        for ft in [0, 1, 2, 3, 4, "adaptive"]:
            dec, info = decode_png(
                encode_png(img, filter_type=ft, interlace=1))
            assert np.array_equal(dec, img)
            dec0, _ = decode_png(encode_png(img, filter_type=ft))
            assert np.array_equal(dec, dec0)


def test_adam7_pass_lattice_tiles_exactly():
    from xcube_spark.sources.png import _ADAM7

    cov = np.zeros((8, 8), dtype=int)
    for x0, y0, dx, dy in _ADAM7:
        cov[y0::dy, x0::dx] += 1
    assert (cov == 1).all()


def test_adam7_subbyte_depth_decodes():
    """Hand-packed depth-1 gray 4x4 Adam7 stream (no encoder path for
    sub-byte depths): a checkerboard where row r, col x is
    (r + x) % 2, packed MSB-first per pass scanline."""
    img = np.fromfunction(lambda r, x: (r + x) % 2, (4, 4),
                          dtype=np.int64).astype(np.uint8)
    from xcube_spark.sources.png import _ADAM7

    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if not sub.shape[0] or not sub.shape[1]:
            continue
        for row in sub:
            byte_row = np.packbits(row)  # depth 1, MSB-first
            out.append(0)  # filter None
            out.extend(byte_row.tobytes())
    ihdr = struct.pack(">IIBBBBB", 4, 4, 1, 0, 0, 0, 1)
    data = (SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b""))
    dec, info = decode_png(data)
    assert info["bit_depth"] == 1
    assert np.array_equal(dec, img)


def test_adam7_truncated_stream_raises():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)  # interlace=1
    data = (SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 20))
            + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="short"):
        decode_png(data)


def test_malformed_inputs_raise():
    with pytest.raises(PngError, match="signature"):
        decode_png(b"GIF89a not a png")
    with pytest.raises(PngError, match="IEND"):
        decode_png(SIGNATURE)  # no chunks at all
    # truncated IDAT: scanlines short of height*(stride+1)
    raw = bytes([0, 1, 2])  # one row worth for a 2-row image
    with pytest.raises(PngError, match="IDAT too short"):
        decode_png(_make_png(2, 2, 8, 0, raw))
    # palette image without PLTE
    with pytest.raises(PngError, match="PLTE"):
        decode_png(_make_png(1, 1, 8, 3, bytes([0, 0])))
    # palette index out of range
    data = _make_png(1, 1, 8, 3, bytes([0, 5]),
                     extra=_chunk(b"PLTE", bytes([1, 2, 3])))
    with pytest.raises(PngError, match="palette index"):
        decode_png(data)


def test_invalid_header_combinations_raise():
    with pytest.raises(PngError, match="bit depth"):
        decode_png(_make_png(1, 1, 3, 0, bytes([0, 0])))
    # depth 4 invalid for RGB (color type 2)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0)
    data = (SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes([0, 0])))
            + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="invalid for color type"):
        decode_png(data)
    with pytest.raises(PngError, match="zero-sized"):
        decode_png(_make_png(0, 1, 8, 0, b""))


def test_ancillary_chunks_skipped_but_crc_checked():
    a = np.full((2, 2), 9, dtype=np.uint8)
    data = encode_png(a, filter_type=0)
    # inject a tEXt chunk after IHDR
    head, rest = data[:8 + 25], data[8 + 25:]
    good = head + _chunk(b"tEXt", b"Comment\x00hi") + rest
    pix, _ = decode_png(good)
    assert np.array_equal(pix, a)
    bad_chunk = bytearray(_chunk(b"tEXt", b"Comment\x00hi"))
    bad_chunk[-1] ^= 1  # break the ancillary CRC
    with pytest.raises(PngError, match="CRC"):
        decode_png(head + bytes(bad_chunk) + rest)


# ---- hypothesis property sweep -----------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        c=st.integers(1, 4),
        ft=st.sampled_from([0, 1, 2, 3, 4, "adaptive"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_roundtrip_property(h, w, c, ft, seed):
        """encode ∘ decode == identity for every shape, channel count,
        and filter — the codec's core contract, swept randomly."""
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        pix, info = decode_png(encode_png(a, filter_type=ft))
        got = pix if pix.ndim == 3 else pix[:, :, None]
        assert info["width"] == w and info["height"] == h
        assert np.array_equal(got, a)
except ImportError:  # hypothesis is baked in, but stay import-safe
    pass
