"""JPEG 2000 codec + Spark open path (sources/jp2.py) — reference
parity target: the j2k/jp2 openers the reference registers via
plugin.py:102-107."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xcube_spark.sources.jp2 import (MQDecoder, MQEncoder, _fresh_contexts,
                                     decode_cblk, decode_j2k, encode_cblk,
                                     encode_j2k, fdwt53, idwt53,
                                     open_jp2_cube, parse_jp2_file, read_jp2,
                                     write_jp2)


def test_mq_coder_roundtrip():
    """MQ arithmetic coder: random decision/context streams decode to
    exactly the encoded bits (all 19 contexts, adaptive states)."""
    import random

    random.seed(3)
    for _ in range(3):
        bits = [(random.randint(0, 1), random.randrange(19))
                for _ in range(4000)]
        enc = MQEncoder()
        ectx = _fresh_contexts()
        for b, c in bits:
            enc.encode(b, ectx[c])
        data = enc.flush()
        dec = MQDecoder(data)
        dctx = _fresh_contexts()
        assert [dec.decode(dctx[c]) for _, c in bits] == [b for b, _ in bits]


def test_dwt53_reversible():
    """5/3 lifting: exact integer reconstruction for even/odd sizes
    and degenerate 1-wide shapes, multi-level."""
    rng = np.random.RandomState(0)
    for shape in [(64, 64), (37, 53), (1, 10), (10, 1), (5, 5)]:
        a = rng.randint(-30000, 30000, shape).astype(np.int64)
        for lev in (1, 2, 3):
            assert np.array_equal(idwt53(fdwt53(a, lev), lev), a)


def test_t1_cblk_roundtrip_all_orients():
    """EBCOT Tier-1: sparse signed blocks round-trip exactly in every
    subband orientation, including sub-4-row stripes and 1x1."""
    rng = np.random.RandomState(1)
    for orient in ("LL", "HL", "LH", "HH"):
        for shape in [(64, 64), (13, 7), (64, 3), (3, 64), (1, 1)]:
            a = rng.randint(-500, 500, shape).astype(np.int64)
            a[rng.rand(*shape) < 0.5] = 0
            data, npasses, zbp = encode_cblk(a, orient, 12)
            r = decode_cblk(data, shape[1], shape[0], orient, 12,
                            npasses, zbp)
            assert np.array_equal(r, a), (orient, shape)


def test_codestream_lossless_roundtrip():
    """Full codestream: smooth + noisy uint16, tiled and untiled,
    odd sizes — bit-exact lossless."""
    rng = np.random.RandomState(7)
    for shape, tile in [((128, 128), None), ((200, 300), (128, 128)),
                        ((65, 130), (64, 64)), ((1, 1), None)]:
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]]
        img = (5000 + 3000 * np.sin(yy / 17.0) + 2000 * np.cos(xx / 23.0)
               + rng.randint(0, 300, shape)).astype(np.uint16)
        code = encode_j2k(img, tile=tile)
        assert np.array_equal(decode_j2k(code), img), (shape, tile)
    # pure noise (stress every coding pass) + uint8
    img = rng.randint(0, 60000, (77, 91)).astype(np.uint16)
    assert np.array_equal(decode_j2k(encode_j2k(img)), img)
    img8 = rng.randint(0, 250, (50, 60)).astype(np.uint8)
    assert np.array_equal(decode_j2k(encode_j2k(img8, bitdepth=8)), img8)


def test_jp2_container_and_header_parse(tmp_path):
    """JP2 box wrapper round-trips; parse_jp2_file reads headers +
    the SOT table only (verified against the full decode)."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 4096, (90, 110)).astype(np.uint16)
    p = str(tmp_path / "t.jp2")
    write_jp2(p, img, tile=(64, 64))
    assert np.array_equal(read_jp2(p), img)
    j = parse_jp2_file(p)
    assert (j.width, j.height) == (110, 90)
    assert (j.tiles_x, j.tiles_y) == (2, 2)
    assert j.bitdepth == 16 and not j.signed
    assert sorted(j.tiles) == [0, 1, 2, 3]


def test_open_jp2_cube_matches_array(spark, tmp_path):
    """Distributed open: per-tile mapInPandas decode reassembles the
    exact image as cells, with georeferenced axes."""
    rng = np.random.RandomState(11)
    img = (rng.randint(0, 10000, (96, 130))).astype(np.uint16)
    p = str(tmp_path / "c.jp2")
    write_jp2(p, img, tile=(64, 64))
    cube = open_jp2_cube(spark, p, band_name="refl",
                         x_start=500_000.0, y_end=4_100_000.0, res=10.0)
    assert cube.columns == ["t_i", "y_i", "x_i", "y", "x", "refl"]
    rows = cube.collect()
    assert len(rows) == 96 * 130
    got = np.zeros((96, 130), np.int64)
    for r in rows:
        got[r["y_i"], r["x_i"]] = int(r["refl"])
    assert np.array_equal(got, img)
    r0 = next(r for r in rows if r["y_i"] == 0 and r["x_i"] == 0)
    assert r0["x"] == 500_005.0 and r0["y"] == 4_099_995.0


def test_jp2_dsio_dispatch(spark, tmp_path):
    """dsio facade: .jp2 suffix routes to the JPEG-2000 driver for
    both write (plane quantization) and read."""
    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.cube.new import new_cube
    from xcube_spark.sources.dsio import open_dataset, write_dataset

    grid = CubeGrid(width=40, height=30, time_periods=1, x_res=9.0,
                    y_res=6.0)
    cube = new_cube(spark, grid, {"v": "CAST(y_i * 40 + x_i AS DOUBLE)"})
    p = str(tmp_path / "d.jp2")
    write_dataset(cube, p, var_name="v", width=40, height=30)
    back = open_dataset(spark, p)
    assert back.count() == 40 * 30
    assert back.agg(F.sum("band_1")).collect()[0][0] \
        == sum(range(40 * 30))


def test_jp2_unsupported_features_raise(tmp_path):
    with pytest.raises(ValueError, match="not a JPEG 2000"):
        p = tmp_path / "x.jp2"
        p.write_bytes(b"\x00" * 32)
        parse_jp2_file(str(p))
