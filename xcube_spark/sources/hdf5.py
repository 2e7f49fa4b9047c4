"""netCDF-4 / HDF5 cube IO — xcube/core/dsio.py:359
(``Netcdf4DatasetIO``, the reference's default ``.nc`` driver).

The reference opens netCDF-4 through the netCDF4-python / libhdf5
stack; neither library ships in this container, but the HDF5 file
format is a public specification, so the subset the netCDF-4 data
model actually uses is parsed directly:

* superblock v0-v3, object headers v1 ("classic") and v2 (``OHDR``)
  with continuation blocks,
* old-style groups (symbol-table B-tree v1 + local heap + ``SNOD``)
  and new-style hard ``Link`` messages,
* dataspace v1/v2, datatypes fixed-point / IEEE float / fixed string /
  variable-length (string + sequence) / object reference (compound is
  recognised and skipped),
* data layouts: compact, contiguous, chunked with a B-tree v1 chunk
  index, and the common v4 indexes (single chunk / implicit /
  non-paged fixed array),
* filter pipeline v1/v2 with deflate, shuffle and fletcher32,
* attributes v1/v2/v3 including vlen values via the global heap
  (``GCOL``) — which is exactly how netCDF-4 encodes its
  ``DIMENSION_LIST`` dimension-scale wiring (object references into a
  global-heap collection).

Scale model matches the Zarr/GeoTIFF/netCDF-3 readers: the driver
parses only metadata (KBs); every chunk becomes a (address, nbytes)
row that ``mapInPandas`` tasks read and decode executor-locally, so a
100 TB archive of .nc granules fans out to one task per chunk with no
driver data movement.  CF decoding (_FillValue/scale/offset, time
units + calendar) is shared with the netCDF-3 reader.

The writer emits a minimal but spec-correct netCDF-4 flavoured HDF5
file (superblock v0, old-style root group, dimension-scale ``CLASS``/
``NAME``/``DIMENSION_LIST`` attributes, contiguous or
chunked+shuffle+deflate variables) — the interop/export twin used for
fixtures; bulk storage stays parquet/zarr.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# ---------------------------------------------------------------------------
# low-level reader
# ---------------------------------------------------------------------------


class _Reader:
    """Random-access byte reader (driver-side metadata parsing only)."""

    def __init__(self, path: str):
        self.f = open(path, "rb")

    def at(self, off: int, n: int) -> bytes:
        self.f.seek(off)
        return self.f.read(n)

    def close(self) -> None:
        self.f.close()


@dataclass
class H5Dataset:
    name: str
    addr: int                       # object header address (ref target)
    shape: tuple[int, ...] = ()
    dtype: object = None            # np.dtype | ('vlen_str',) | ('ref',) | ...
    layout: str = "contiguous"      # contiguous | chunked | compact
    data_addr: int = _UNDEF
    data_size: int = 0
    compact: bytes | None = None
    chunk_shape: tuple[int, ...] = ()
    chunk_index: tuple = ()         # layout-specific index description
    filters: list = field(default_factory=list)   # [(filter_id, cdata)]
    fill: bytes | None = None
    attrs: dict = field(default_factory=dict)

    @property
    def maskable(self) -> bool:
        return isinstance(self.dtype, np.dtype)


class H5File:
    """Driver-side HDF5 metadata parse: groups walked to a flat
    ``{path: H5Dataset}`` map (group nesting joins with ``/``)."""

    def __init__(self, path: str):
        self.path = path
        self.r = _Reader(path)
        sig = self.r.at(0, 8)
        if sig != _SIG:
            raise ValueError(f"not an HDF5 file: {path}")
        self.datasets: dict[str, H5Dataset] = {}
        self._by_addr: dict[int, str] = {}
        self.root_attrs: dict = {}
        self._parse_superblock()
        self.r.close()
        # resolve object references in attribute values to dataset names
        for ds in self.datasets.values():
            for k, v in list(ds.attrs.items()):
                ds.attrs[k] = self._deref(v)

    def _deref(self, v):
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "__ref__":
            return self._by_addr.get(v[1], v)
        if isinstance(v, list):
            return [self._deref(x) for x in v]
        return v

    # -- superblock --------------------------------------------------------

    def _parse_superblock(self) -> None:
        r = self.r
        ver = r.at(8, 1)[0]
        if ver in (0, 1):
            head = r.at(8, 16)
            self.O, self.L = head[5], head[6]
            # sig(8) + version/O/L block(8) + group-k/flags(8), then the
            # base/fs/eof/driver addresses, then the root symbol entry
            base = 24 if ver == 0 else 28  # v1 adds istore_k + reserved
            ent = base + 4 * self.O
            self._sym_entry(ent)
        elif ver in (2, 3):
            head = r.at(8, 4)
            self.O, self.L = head[1], head[2]
            addrs = r.at(12, 4 * self.O)
            root = int.from_bytes(addrs[3 * self.O:4 * self.O], "little")
            self.root_attrs = self._object_header(root, "")
        else:
            raise ValueError(f"unsupported HDF5 superblock v{ver}")

    def _u(self, b: bytes, off: int, n: int) -> int:
        return int.from_bytes(b[off:off + n], "little")

    def _sym_entry(self, off: int, prefix: str = "",
                   heap_addr: int = _UNDEF) -> None:
        """Symbol table entry: link into a group or dataset header."""
        O = self.O
        b = self.r.at(off, 2 * O + 8 + 16)
        name_off = self._u(b, 0, O)
        ohdr = self._u(b, O, O)
        name = ""
        if heap_addr != _UNDEF:
            name = self._heap_string(heap_addr, name_off)
        path = f"{prefix}{name}" if name else prefix.rstrip("/")
        attrs = self._object_header(ohdr, path)
        if path == "":
            self.root_attrs = attrs

    # -- local heap / group btree -----------------------------------------

    def _heap_string(self, heap_addr: int, off: int) -> str:
        O, L = self.O, self.L
        hd = self.r.at(heap_addr, 8 + 2 * L + O)
        if hd[:4] != b"HEAP":
            raise ValueError("bad local heap signature")
        data_addr = self._u(hd, 8 + 2 * L, O)
        raw = self.r.at(data_addr + off, 512)
        return raw.split(b"\0", 1)[0].decode("utf-8")

    def _group_btree(self, btree_addr: int, heap_addr: int,
                     prefix: str) -> None:
        O, L = self.O, self.L
        hd = self.r.at(btree_addr, 8 + 2 * O)
        if hd[:4] != b"TREE":
            raise ValueError("bad group B-tree signature")
        level, nent = hd[5], self._u(hd, 6, 2)
        body = self.r.at(btree_addr + 8 + 2 * O,
                         (nent + 1) * L + nent * O)
        pos = L  # skip key 0
        for _ in range(nent):
            child = self._u(body, pos, O)
            pos += O + L
            if level > 0:
                self._group_btree(child, heap_addr, prefix)
            else:
                self._snod(child, heap_addr, prefix)

    def _snod(self, addr: int, heap_addr: int, prefix: str) -> None:
        O = self.O
        hd = self.r.at(addr, 8)
        if hd[:4] != b"SNOD":
            raise ValueError("bad symbol node signature")
        nsym = self._u(hd, 6, 2)
        ent_size = 2 * O + 8 + 16
        for i in range(nsym):
            self._sym_entry(addr + 8 + i * ent_size, prefix, heap_addr)

    # -- object header (v1 + v2) -------------------------------------------

    def _object_header(self, addr: int, path: str) -> dict:
        sig = self.r.at(addr, 4)
        msgs = (self._oh2_messages(addr) if sig == b"OHDR"
                else self._oh1_messages(addr))
        return self._apply_messages(addr, path, msgs)

    def _oh1_messages(self, addr: int) -> list[tuple[int, bytes]]:
        hd = self.r.at(addr, 16)
        nmsg = self._u(hd, 2, 2)
        size = self._u(hd, 8, 4)
        blocks = [self.r.at(addr + 16, size)]
        msgs: list[tuple[int, bytes]] = []
        seen = bi = pos = 0
        while seen < nmsg:  # nmsg counts continuation messages too
            if pos + 8 > len(blocks[bi]):
                bi += 1
                if bi >= len(blocks):
                    break
                pos = 0
                continue
            b = blocks[bi]
            mtype = self._u(b, pos, 2)
            msize = self._u(b, pos + 2, 2)
            body = b[pos + 8:pos + 8 + msize]
            pos += 8 + msize
            seen += 1
            if mtype == 0x0010:  # continuation
                coff = self._u(body, 0, self.O)
                clen = self._u(body, self.O, self.L)
                blocks.append(self.r.at(coff, clen))
                continue
            msgs.append((mtype, body))
        return msgs

    def _oh2_messages(self, addr: int) -> list[tuple[int, bytes]]:
        hd = self.r.at(addr, 16)
        flags = hd[5]
        pos = 6
        if flags & 0x20:
            pos += 16  # access/mod/change/birth times
        if flags & 0x10:
            pos += 4   # max compact / min dense
        csize_len = 1 << (flags & 0x3)
        hd = self.r.at(addr, pos + csize_len)
        chunk0 = self._u(hd, pos, csize_len)
        pos += csize_len
        track = 2 if flags & 0x4 else 0
        blocks = [(addr + pos, chunk0)]
        msgs: list[tuple[int, bytes]] = []
        bi = 0
        while bi < len(blocks):
            start, length = blocks[bi]
            b = self.r.at(start, length)
            p = 0
            # chunk-0 size excludes the trailing checksum, and the
            # continuation buffers below are already trimmed to clen-8
            # (OCHK signature + checksum), so scan the full buffer; stop
            # only when fewer than one message header remains.
            while p + 4 + track <= len(b):
                mtype = b[p]
                msize = self._u(b, p + 1, 2)
                p += 4 + track
                body = b[p:p + msize]
                p += msize
                if mtype == 0x0010:
                    coff = self._u(body, 0, self.O)
                    clen = self._u(body, self.O, self.L)
                    # continuation block: OCHK signature + checksum
                    blocks.append((coff + 4, clen - 8))
                    continue
                msgs.append((mtype, body))
            bi += 1
        return msgs

    def _apply_messages(self, addr: int, path: str,
                        msgs: list[tuple[int, bytes]]) -> dict:
        O, L = self.O, self.L
        ds = H5Dataset(name=path, addr=addr)
        is_dataset = any(t == 0x0008 for t, _ in msgs)
        attrs: dict = {}
        sub_links: list[tuple[str, int]] = []
        sym: tuple[int, int] | None = None
        for mtype, b in msgs:
            if mtype == 0x0001:
                ds.shape = self._dataspace(b)
            elif mtype == 0x0003:
                ds.dtype = self._datatype(b)[0]
            elif mtype == 0x0005:
                ds.fill = self._fill_value(b)
            elif mtype == 0x0006:
                link = self._link(b)
                if link:
                    sub_links.append(link)
            elif mtype == 0x0008:
                self._layout(b, ds)
            elif mtype == 0x000B:
                ds.filters = self._filters(b)
            elif mtype == 0x000C:
                name, val = self._attribute(b)
                attrs[name] = val
            elif mtype == 0x0011:
                sym = (self._u(b, 0, O), self._u(b, O, O))
            elif mtype == 0x0015 and not is_dataset:
                pass  # dense attribute storage on groups: ignore
        if is_dataset:
            ds.attrs = attrs
            self.datasets[path] = ds
            self._by_addr[addr] = path
        else:
            prefix = f"{path}/" if path else ""
            if sym is not None:
                self._group_btree(sym[0], sym[1], prefix)
            for name, target in sub_links:
                self._object_header(target, f"{prefix}{name}")
        return attrs

    # -- message decoders --------------------------------------------------

    def _dataspace(self, b: bytes) -> tuple[int, ...]:
        ver, rank = b[0], b[1]
        off = 8 if ver == 1 else 4
        return tuple(self._u(b, off + i * self.L, self.L)
                     for i in range(rank))

    def _datatype(self, b: bytes):
        """Returns (dtype-descriptor, consumed-bytes)."""
        cls = b[0] & 0x0F
        bits0, size = b[1], self._u(b, 4, 4)
        order = ">" if bits0 & 1 else "<"
        if cls == 0:  # fixed-point
            kind = "i" if b[1] & 0x08 else "u"
            return np.dtype(f"{order}{kind}{size}"), 8 + 4
        if cls == 1:  # float
            return np.dtype(f"{order}f{size}"), 8 + 12
        if cls == 3:  # fixed string
            return ("string", size), 8
        if cls == 7:  # reference
            return ("ref",), 8
        if cls == 9:  # vlen
            base, used = self._datatype(b[8:])
            if bits0 & 0x0F == 1:
                return ("vlen_str",), 8 + used
            return ("vlen_seq", base), 8 + used
        if cls == 6:  # compound — recognised, values skipped
            return ("compound", size), len(b)
        raise ValueError(f"unsupported HDF5 datatype class {cls}")

    def _fill_value(self, b: bytes) -> bytes | None:
        ver = b[0]
        if ver in (1, 2):
            if ver == 2 and b[3] == 0:
                return None
            n = self._u(b, 4, 4)
            return b[8:8 + n] if n else None
        # v3: flags bit5 = fill value defined
        if b[1] & 0x20:
            n = self._u(b, 2, 4)
            return b[6:6 + n]
        return None

    def _link(self, b: bytes) -> tuple[str, int] | None:
        flags = b[1]
        pos = 2
        ltype = 0
        if flags & 0x08:
            ltype = b[pos]
            pos += 1
        if flags & 0x04:
            pos += 8
        if flags & 0x10:
            pos += 1
        nlen_size = 1 << (flags & 0x3)
        nlen = self._u(b, pos, nlen_size)
        pos += nlen_size
        name = b[pos:pos + nlen].decode("utf-8")
        pos += nlen
        if ltype != 0:
            return None  # soft/external links: skip
        return name, self._u(b, pos, self.O)

    def _layout(self, b: bytes, ds: H5Dataset) -> None:
        O, L = self.O, self.L
        ver = b[0]
        if ver == 3:
            cls = b[1]
            if cls == 0:
                n = self._u(b, 2, 2)
                ds.layout, ds.compact = "compact", b[4:4 + n]
            elif cls == 1:
                ds.layout = "contiguous"
                ds.data_addr = self._u(b, 2, O)
                ds.data_size = self._u(b, 2 + O, L)
            else:
                rank = b[2]  # = dataset rank + 1 (element-size dim)
                ds.layout = "chunked"
                addr = self._u(b, 3, O)
                dims = [self._u(b, 3 + O + 4 * i, 4) for i in range(rank)]
                ds.chunk_shape = tuple(dims[:-1])
                ds.chunk_index = ("btree1", addr)
        elif ver == 4:
            cls = b[1]
            if cls != 2:
                raise ValueError("HDF5 layout v4 supported for chunked only")
            flags, rank, enc = b[2], b[3], b[4]
            pos = 5
            dims = [self._u(b, pos + i * enc, enc) for i in range(rank)]
            pos += rank * enc
            itype = b[pos]
            pos += 1
            ds.layout = "chunked"
            ds.chunk_shape = tuple(dims)
            if itype == 1:  # single chunk
                fsize, fmask = 0, 0
                if flags & 0x02:
                    fsize = self._u(b, pos, L)
                    fmask = self._u(b, pos + L, 4)
                    pos += L + 4
                ds.chunk_index = ("single", self._u(b, pos, O), fsize, fmask)
            elif itype == 2:  # implicit
                ds.chunk_index = ("implicit", self._u(b, pos, O))
            elif itype == 3:  # fixed array
                page_bits = b[pos]
                ds.chunk_index = ("farray", self._u(b, pos + 1, O),
                                  page_bits, bool(flags & 0x02))
            else:
                raise ValueError(
                    f"HDF5 v4 chunk index type {itype} not supported "
                    "(extensible array / v2 B-tree)")
        else:
            raise ValueError(f"HDF5 layout message v{ver} not supported")

    def _filters(self, b: bytes) -> list:
        ver, nf = b[0], b[1]
        pos = 8 if ver == 1 else 2
        out = []
        for _ in range(nf):
            fid = self._u(b, pos, 2)
            if ver == 1 or fid >= 256:
                nlen = self._u(b, pos + 2, 2)
                pos += 4
            else:
                nlen = 0
                pos += 2
            nvals = self._u(b, pos + 2, 2)
            pos += 4
            if nlen:
                pad = (nlen + 7) // 8 * 8 if ver == 1 else nlen
                pos += pad
            cdata = [self._u(b, pos + 4 * i, 4) for i in range(nvals)]
            pos += 4 * nvals
            if ver == 1 and nvals % 2:
                pos += 4
            out.append((fid, cdata))
        return out

    def _attribute(self, b: bytes):
        ver = b[0]
        name_size = self._u(b, 2, 2)
        dt_size = self._u(b, 4, 2)
        sp_size = self._u(b, 6, 2)
        pos = 8 + (1 if ver == 3 else 0)
        pad = (lambda n: (n + 7) // 8 * 8) if ver == 1 else (lambda n: n)
        name = b[pos:pos + name_size].split(b"\0", 1)[0].decode("utf-8")
        pos += pad(name_size)
        dtype, _ = self._datatype(b[pos:pos + dt_size])
        pos += pad(dt_size)
        shape = self._dataspace(b[pos:pos + sp_size])
        pos += pad(sp_size)
        npts = int(np.prod(shape)) if shape else 1
        return name, self._attr_value(b[pos:], dtype, npts)

    def _attr_value(self, raw: bytes, dtype, npts: int):
        if isinstance(dtype, np.dtype):
            vals = np.frombuffer(raw[:npts * dtype.itemsize], dtype).tolist()
            return vals[0] if npts == 1 else vals
        if dtype[0] == "string":
            n = dtype[1]
            out = [raw[i * n:(i + 1) * n].split(b"\0", 1)[0].decode("utf-8")
                   for i in range(npts)]
            return out[0] if npts == 1 else out
        if dtype[0] == "ref":
            out = [("__ref__", self._u(raw, i * self.O, self.O))
                   for i in range(npts)]
            return out[0] if npts == 1 else out
        if dtype[0] in ("vlen_str", "vlen_seq"):
            out = []
            for i in range(npts):
                off = i * (4 + self.O + 4)
                n = self._u(raw, off, 4)
                gaddr = self._u(raw, off + 4, self.O)
                gidx = self._u(raw, off + 4 + self.O, 4)
                data = self._gheap_object(gaddr, gidx)
                if dtype[0] == "vlen_str":
                    out.append(data.decode("utf-8"))
                else:
                    out.append(self._attr_value(data, dtype[1], n))
            return out[0] if npts == 1 else out
        if dtype[0] == "compound":
            return ("__compound__",)  # e.g. REFERENCE_LIST: not needed
        raise ValueError(f"unsupported attribute type {dtype}")

    def _gheap_object(self, addr: int, idx: int) -> bytes:
        L = self.L
        hd = self.r.at(addr, 8 + L)
        if hd[:4] != b"GCOL":
            raise ValueError("bad global heap signature")
        size = self._u(hd, 8, L)
        b = self.r.at(addr, size)
        pos = 8 + L
        while pos + 8 + L <= size:
            oidx = self._u(b, pos, 2)
            osize = self._u(b, pos + 8, L)
            if oidx == idx:
                return b[pos + 8 + L:pos + 8 + L + osize]
            if oidx == 0:
                break
            pos += 8 + L + (osize + 7) // 8 * 8
        raise KeyError(f"global heap object {idx} not found")

    # -- chunk enumeration (re-opens the file: callable post-init) ---------

    def chunks(self, ds: H5Dataset) -> list[tuple[tuple[int, ...], int, int, int]]:
        """[(chunk_offset_coords, file_addr, nbytes, filter_mask)]."""
        r = _Reader(self.path)
        try:
            kind = ds.chunk_index[0]
            # A defined-but-never-written variable stores the undefined
            # address in its layout message: there are no chunks at all.
            # Readers must see "zero chunks" (all cells fill-valued), not
            # a garbage B-tree walk (matches h5py/netCDF4 semantics).
            if ds.chunk_index[1] == _UNDEF:
                return []
            if kind == "btree1":
                out: list = []
                self._walk_chunk_btree(r, ds.chunk_index[1], len(ds.shape),
                                       out)
                return out
            esize = ds.dtype.itemsize
            raw_chunk = int(np.prod(ds.chunk_shape)) * esize
            grid = [(s + c - 1) // c
                    for s, c in zip(ds.shape, ds.chunk_shape)]
            if kind == "single":
                _, addr, fsize, fmask = ds.chunk_index
                nb = fsize if ds.filters and fsize else raw_chunk
                return [((0,) * len(ds.shape), addr, nb, fmask
                         if ds.filters else 0)]
            if kind == "implicit":
                addr = ds.chunk_index[1]
                out = []
                for i, coord in enumerate(np.ndindex(*grid)):
                    off = tuple(c * s for c, s in
                                zip(coord, ds.chunk_shape))
                    out.append((off, addr + i * raw_chunk, raw_chunk, 0))
                return out
            if kind == "farray":
                return self._farray_chunks(r, ds, grid, raw_chunk)
            raise ValueError(f"unsupported chunk index {kind}")
        finally:
            r.close()

    def _walk_chunk_btree(self, r: _Reader, addr: int, rank: int,
                          out: list) -> None:
        O = self.O
        hd = r.at(addr, 8 + 2 * O)
        if hd[:4] != b"TREE":
            raise ValueError("bad chunk B-tree signature")
        level, nent = hd[5], self._u(hd, 6, 2)
        ksize = 8 + 8 * (rank + 1)
        body = r.at(addr + 8 + 2 * O, (nent + 1) * ksize + nent * O)
        pos = 0
        for _ in range(nent):
            nbytes = self._u(body, pos, 4)
            fmask = self._u(body, pos + 4, 4)
            coords = tuple(self._u(body, pos + 8 + 8 * i, 8)
                           for i in range(rank))
            pos += ksize
            child = self._u(body, pos, O)
            pos += O
            if level > 0:
                self._walk_chunk_btree(r, child, rank, out)
            else:
                out.append((coords, child, nbytes, fmask))

    def _farray_chunks(self, r: _Reader, ds: H5Dataset, grid: list[int],
                       raw_chunk: int) -> list:
        O, L = self.O, self.L
        _, haddr, page_bits, filtered = ds.chunk_index
        hd = r.at(haddr, 12 + L + O + 4)
        if hd[:4] != b"FAHD":
            raise ValueError("bad fixed-array header signature")
        entry_size = hd[6]
        nmax = self._u(hd, 8, L)
        if nmax > (1 << page_bits):
            raise ValueError("paged fixed-array chunk index not supported")
        dblock = self._u(hd, 8 + L, O)
        db = r.at(dblock, 6 + O + nmax * entry_size + 4)
        if db[:4] != b"FADB":
            raise ValueError("bad fixed-array data block signature")
        pos = 6 + O
        out = []
        for i, coord in enumerate(np.ndindex(*grid)):
            e = db[pos + i * entry_size:pos + (i + 1) * entry_size]
            addr = self._u(e, 0, O)
            if addr == _UNDEF:
                continue
            nb, fmask = raw_chunk, 0
            if filtered:
                nb = self._u(e, O, entry_size - O - 4)
                fmask = self._u(e, entry_size - 4, 4)
            off = tuple(c * s for c, s in zip(coord, ds.chunk_shape))
            out.append((off, addr, nb, fmask))
        return out


# -- chunk payload decode (runs executor-side) ------------------------------


def decode_chunk(raw: bytes, filters: list, fmask: int,
                 dtype: np.dtype, chunk_shape: tuple[int, ...]) -> np.ndarray:
    """Reverse the filter pipeline (last applied first) and reshape."""
    for i in range(len(filters) - 1, -1, -1):
        fid, cdata = filters[i]
        if fmask & (1 << i):
            continue
        if fid == 1:          # deflate
            raw = zlib.decompress(raw)
        elif fid == 2:        # shuffle
            n = cdata[0] if cdata else dtype.itemsize
            arr = np.frombuffer(raw, "u1")
            nel = len(raw) // n
            raw = (arr[:nel * n].reshape(n, nel).T.tobytes()
                   + raw[nel * n:])
        elif fid == 3:        # fletcher32: payload + 4-byte checksum
            raw = raw[:-4]
        else:
            raise ValueError(f"unsupported HDF5 filter id {fid}")
    return np.frombuffer(raw, dtype)[:int(np.prod(chunk_shape))] \
        .reshape(chunk_shape)


def _fill_scalar(dtype: np.dtype, fill_bytes: bytes | None,
                 attrs: dict | None = None):
    """Fill value for unallocated storage: the HDF5 fill-value message
    if present, else the netCDF ``_FillValue`` attribute, else NaN for
    floats / 0 for ints (the h5py default)."""
    if fill_bytes is not None and len(fill_bytes) == dtype.itemsize:
        return np.frombuffer(fill_bytes, dtype)[0]
    if attrs and "_FillValue" in attrs:
        try:
            return dtype.type(np.asarray(attrs["_FillValue"]).ravel()[0])
        except (TypeError, ValueError):
            pass
    return dtype.type(np.nan) if dtype.kind == "f" else dtype.type(0)


def read_h5_array(path: str, name: str,
                  h5: "H5File | None" = None) -> tuple[np.ndarray, dict]:
    """Full read of one dataset (tests / small coords).  Pass an
    already-parsed ``h5`` to skip re-walking the file's metadata —
    callers holding an H5File (cube glue, granule scans) read N
    arrays with ONE metadata parse."""
    f = h5 if h5 is not None else H5File(path)
    ds = f.datasets[name]
    if not isinstance(ds.dtype, np.dtype):
        raise ValueError(f"{name}: non-numeric dataset")
    if ds.layout == "compact":
        return (np.frombuffer(ds.compact, ds.dtype).reshape(ds.shape),
                ds.attrs)
    r = _Reader(path)
    try:
        if ds.layout == "contiguous":
            if ds.data_addr == _UNDEF:  # defined but never written
                return (np.full(ds.shape,
                                _fill_scalar(ds.dtype, ds.fill, ds.attrs),
                                ds.dtype), ds.attrs)
            n = int(np.prod(ds.shape)) * ds.dtype.itemsize
            arr = np.frombuffer(r.at(ds.data_addr, n), ds.dtype)
            return arr.reshape(ds.shape), ds.attrs
        # pre-fill so chunk coordinates absent from the index (sparse /
        # partially-written variables) come back as fill, not garbage
        out = np.full(ds.shape, _fill_scalar(ds.dtype, ds.fill, ds.attrs),
                      ds.dtype)
        for coords, addr, nbytes, fmask in f.chunks(ds):
            chunk = decode_chunk(r.at(addr, nbytes), ds.filters, fmask,
                                 ds.dtype, ds.chunk_shape)
            sel = tuple(slice(c, min(c + s, d))
                        for c, s, d in zip(coords, ds.chunk_shape, ds.shape))
            out[sel] = chunk[tuple(slice(0, s.stop - s.start)
                                   for s in sel)]
        return out, ds.attrs
    finally:
        r.close()


# ---------------------------------------------------------------------------
# cube glue: netCDF-4 dimension scales -> cells DataFrame
# ---------------------------------------------------------------------------


def _var_dims(ds: H5Dataset) -> list[str] | None:
    """Dimension names from the netCDF-4 DIMENSION_LIST attribute."""
    dl = ds.attrs.get("DIMENSION_LIST")
    if dl is None:
        return None
    out = []
    for per_dim in (dl if isinstance(dl, list) else [dl]):
        refs = per_dim if isinstance(per_dim, list) else [per_dim]
        if not refs or not isinstance(refs[0], str):
            return None
        out.append(refs[0].rsplit("/", 1)[-1])
    return out


def open_netcdf4_cube(
    spark: SparkSession,
    path: str,
    var_names: list[str] | None = None,
    time_dim: str = "time",
    y_dim: str = "lat",
    x_dim: str = "lon",
) -> DataFrame:
    """Open a netCDF-4 (HDF5) cube as a cells DataFrame
    (``t_i, y_i, x_i, time, y, x, <vars>``) — the HDF5 twin of
    ``open_netcdf_cube`` (reference ``Netcdf4DatasetIO``,
    core/dsio.py:359).

    Variables shaped ``(time, y, x)`` (wired by ``DIMENSION_LIST``)
    are read chunk-parallel: the driver enumerates chunk byte ranges
    from the B-tree / v4 index, and ``mapInPandas`` tasks seek, read,
    de-filter and CF-decode each chunk executor-locally.  Contiguous
    variables fan out as per-time-plane pseudo-chunks."""
    from xcube_spark.functions.cftime import decode_cf_time
    from xcube_spark.sources.netcdf3 import _cf_decode

    h5 = H5File(path)
    dims_of = {n: _var_dims(d) for n, d in h5.datasets.items()}
    # dimension sizes: from the dimension-scale datasets themselves
    scales = {n.rsplit("/", 1)[-1]: n for n, d in h5.datasets.items()
              if d.attrs.get("CLASS") == "DIMENSION_SCALE"}
    if y_dim not in scales and "y" in scales:
        y_dim = "y"
    if x_dim not in scales and "x" in scales:
        x_dim = "x"
    for want in (time_dim, y_dim, x_dim):
        if want not in scales:
            raise ValueError(
                f"dimension scale {want!r} not in {sorted(scales)}")
    want_dims = [time_dim, y_dim, x_dim]
    data_vars = {
        n.rsplit("/", 1)[-1]: d for n, d in h5.datasets.items()
        if dims_of[n] == want_dims
    }
    if var_names is not None:
        missing = set(var_names) - set(data_vars)
        if missing:
            raise KeyError(f"variables not in file: {sorted(missing)}")
        data_vars = {n: data_vars[n] for n in var_names}
    if not data_vars:
        raise ValueError(f"no ({'/'.join(want_dims)}) variables in {path}")
    names = list(data_vars)
    tp, h, w = next(iter(data_vars.values())).shape

    # driver-side chunk enumeration, grouped by region: all variables
    # share the cube chunk grid in netCDF-4 practice, so one task reads
    # every variable's chunk for its region and emits WIDE rows — no
    # pivot, no shuffle (mirrors the zarr reader's plan shape).
    regions: dict[tuple[int, int, int], dict[str, tuple[int, int, int]]] = {}
    for n, ds in data_vars.items():
        if ds.layout == "chunked":
            seen: set = set()
            for coords, addr, nbytes, fmask in h5.chunks(ds):
                regions.setdefault(tuple(coords), {})[n] = (
                    addr, nbytes, fmask)
                seen.add(tuple(coords))
            # chunk coordinates absent from the index (sparse archive /
            # never-written regions) become fill pseudo-chunks (addr -1)
            # so output cells exist with the fill value — the semantics
            # the netCDF4/xarray stack and our zarr reader both give.
            cgrid = [(s + c - 1) // c
                     for s, c in zip(ds.shape, ds.chunk_shape)]
            if len(seen) < int(np.prod(cgrid)):
                for coord in np.ndindex(*cgrid):
                    off = tuple(c * s for c, s in
                                zip(coord, ds.chunk_shape))
                    if off not in seen:
                        regions.setdefault(off, {})[n] = (-1, 0, 0)
        elif ds.layout == "contiguous":
            if ds.data_addr == _UNDEF:  # defined but never written
                for t in range(tp):
                    regions.setdefault((t, 0, 0), {})[n] = (-1, 0, 0)
            else:
                plane = h * w * ds.dtype.itemsize
                for t in range(tp):
                    regions.setdefault((t, 0, 0), {})[n] = (
                        ds.data_addr + t * plane, plane, 0)
        else:
            raise ValueError(f"{n}: compact layout is not a cube variable")
    aligned = all(len(vs) == len(names) for vs in regions.values())
    meta = {
        n: (str(ds.dtype),
            ds.chunk_shape if ds.layout == "chunked" else (1, h, w),
            ds.filters if ds.layout == "chunked" else [],
            {k: v for k, v in ds.attrs.items()
             if k in ("_FillValue", "missing_value", "scale_factor",
                      "add_offset")},
            _fill_scalar(ds.dtype, ds.fill, ds.attrs))
        for n, ds in data_vars.items()
    }
    if not aligned:
        # mixed chunk grids: fall back to per-(var, chunk) tasks + pivot
        return _open_unaligned(spark, path, regions, meta, names,
                               (tp, h, w), h5, scales,
                               (time_dim, y_dim, x_dim))
    rows = [(t0, y0, x0,
             [[n, *regions[(t0, y0, x0)][n]] for n in names])
            for (t0, y0, x0) in sorted(regions)]
    tasks = spark.createDataFrame(
        rows, "t0 INT, y0 INT, x0 INT, "
              "parts ARRAY<STRUCT<var STRING, addr LONG, nbytes LONG, "
              "fmask LONG>>")
    tasks = tasks.repartition(min(len(rows), 64))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as f:
            for pdf in batches:
                for r in pdf.itertuples():
                    out: dict = {}
                    grids = None
                    for part in r.parts:
                        n = part["var"]
                        dt, cshape, filters, cf, fillv = meta[n]
                        if part["addr"] < 0:  # unallocated: fill chunk
                            arr = np.full(cshape, fillv, np.dtype(dt))
                        else:
                            f.seek(part["addr"])
                            arr = decode_chunk(
                                f.read(int(part["nbytes"])), filters,
                                int(part["fmask"]), np.dtype(dt), cshape)
                        ct = min(cshape[0], tp - r.t0)
                        cy = min(cshape[1], h - r.y0)
                        cx = min(cshape[2], w - r.x0)
                        arr = arr[:ct, :cy, :cx]
                        if grids is None:
                            tt, yy, xx = np.meshgrid(
                                np.arange(r.t0, r.t0 + ct),
                                np.arange(r.y0, r.y0 + cy),
                                np.arange(r.x0, r.x0 + cx), indexing="ij")
                            grids = {
                                "t_i": tt.ravel().astype("int32"),
                                "y_i": yy.ravel().astype("int32"),
                                "x_i": xx.ravel().astype("int32")}
                        out[n] = _cf_decode(arr.ravel(), cf)
                    yield pd.DataFrame({**grids, **out})

    schema = "t_i INT, y_i INT, x_i INT, " + ", ".join(
        f"`{n}` DOUBLE" for n in names)
    cells = tasks.mapInPandas(gen, schema)
    cells = cells.select(
        "t_i", "y_i", "x_i",
        *[F.when(~F.isnan(n), F.col(n)).alias(n) for n in names])

    return _attach_axes(spark, path, cells, scales,
                        (time_dim, y_dim, x_dim), names, h5=h5)


def _attach_axes(spark, path, cells, scales, dims, names,
                 h5=None) -> DataFrame:
    """Broadcast-join the 1-D coordinate axes (+ CF time decode)."""
    from xcube_spark.functions.cftime import decode_cf_time

    for dim_name, idx_col, out_col in ((dims[0], "t_i", "time"),
                                       (dims[1], "y_i", "y"),
                                       (dims[2], "x_i", "x")):
        vals, attrs = read_h5_array(path, scales[dim_name], h5=h5)
        adf = spark.createDataFrame(pd.DataFrame({
            idx_col: np.arange(len(vals), dtype="int32"),
            out_col: vals.astype("float64")}))
        if out_col == "time":
            units = attrs.get("units", "seconds since 1970-01-01")
            adf = adf.select(idx_col, decode_cf_time(
                F.col("time"), units, attrs.get("calendar")).alias("time"))
        cells = cells.join(F.broadcast(adf), idx_col)
    return cells.select("t_i", "y_i", "x_i", "time", "y", "x", *names)


def _open_unaligned(spark, path, regions, meta, names, shape, h5, scales,
                    dims) -> DataFrame:
    """Fallback for variables with differing chunk grids: per-(var,
    chunk) tasks + one pivot shuffle on the cell key."""
    from xcube_spark.sources.netcdf3 import _cf_decode as _cf_decode_local

    tp, h, w = shape
    rows = []
    for (t0, y0, x0), parts in regions.items():
        for n, (addr, nbytes, fmask) in parts.items():
            rows.append((n, t0, y0, x0, addr, nbytes, fmask))
    tasks = spark.createDataFrame(
        pd.DataFrame(rows, columns=["var", "t0", "y0", "x0",
                                    "addr", "nbytes", "fmask"]))
    tasks = tasks.repartition(min(len(rows), 64))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as f:
            for pdf in batches:
                for r in pdf.itertuples():
                    dt, cshape, filters, cf, fillv = meta[r.var]
                    if r.addr < 0:  # unallocated: fill chunk
                        arr = np.full(cshape, fillv, np.dtype(dt))
                    else:
                        f.seek(r.addr)
                        arr = decode_chunk(f.read(int(r.nbytes)), filters,
                                           int(r.fmask), np.dtype(dt),
                                           cshape)
                    ct = min(cshape[0], tp - r.t0)
                    cy = min(cshape[1], h - r.y0)
                    cx = min(cshape[2], w - r.x0)
                    arr = arr[:ct, :cy, :cx]
                    tt, yy, xx = np.meshgrid(
                        np.arange(r.t0, r.t0 + ct),
                        np.arange(r.y0, r.y0 + cy),
                        np.arange(r.x0, r.x0 + cx), indexing="ij")
                    yield pd.DataFrame({
                        "t_i": tt.ravel().astype("int32"),
                        "y_i": yy.ravel().astype("int32"),
                        "x_i": xx.ravel().astype("int32"),
                        "var": r.var,
                        "val": _cf_decode_local(arr.ravel(), cf),
                    })

    cells = tasks.mapInPandas(
        gen, "t_i INT, y_i INT, x_i INT, var STRING, val DOUBLE")
    cells = cells.groupBy("t_i", "y_i", "x_i").pivot("var", names).agg(
        F.first("val"))
    cells = cells.select(
        "t_i", "y_i", "x_i",
        *[F.when(~F.isnan(n), F.col(n)).alias(n) for n in names])
    return _attach_axes(spark, path, cells, scales, dims, names, h5=h5)


# ---------------------------------------------------------------------------
# writer: minimal netCDF-4 flavoured HDF5 (superblock v0, classic groups)
# ---------------------------------------------------------------------------


class _Out:
    """Append-only buffer with named forward-reference patching."""

    def __init__(self):
        self.b = bytearray()
        self.addrs: dict[str, int] = {}
        self.patches: list[tuple[int, str]] = []

    def write(self, data: bytes) -> int:
        addr = len(self.b)
        self.b += data
        return addr

    def mark(self, key: str) -> None:
        self.addrs[key] = len(self.b)

    def ref(self, key: str) -> bytes:
        """8-byte placeholder resolved to ``addrs[key]`` at the end."""
        self.patches.append((len(self.b), key))
        return struct.pack("<Q", 0)

    def resolve(self) -> bytes:
        for pos, key in self.patches:
            self.b[pos:pos + 8] = struct.pack("<Q", self.addrs[key])
        return bytes(self.b)


def _dt_message(dtype: np.dtype | tuple) -> bytes:
    """Datatype message body (v1) for the writer's supported types."""
    if isinstance(dtype, tuple) and dtype[0] == "string":
        n = dtype[1]
        return bytes([0x13, 0, 0, 0]) + struct.pack("<I", n)
    if isinstance(dtype, tuple) and dtype[0] == "vlen_ref":
        base = bytes([0x17, 0, 0, 0]) + struct.pack("<I", 8)
        return bytes([0x19, 0, 0, 0]) + struct.pack("<I", 16) + base
    dt = np.dtype(dtype)
    if dt.kind == "f":
        sign = dt.itemsize * 8 - 1
        exp = {4: (23, 8, 127), 8: (52, 11, 1023)}[dt.itemsize]
        return (bytes([0x11, 0x20, sign, 0]) + struct.pack("<I", dt.itemsize)
                + struct.pack("<HHBBBBI", 0, dt.itemsize * 8,
                              exp[0], exp[1], 0, exp[0], exp[2]))
    signed = 0x08 if dt.kind == "i" else 0
    return (bytes([0x10, signed, 0, 0]) + struct.pack("<I", dt.itemsize)
            + struct.pack("<HH", 0, dt.itemsize * 8))


def _sp_message(shape: tuple[int, ...]) -> bytes:
    body = bytes([1, len(shape), 0, 0, 0, 0, 0, 0])
    for d in shape:
        body += struct.pack("<Q", d)
    return body


def _pad8(b: bytes) -> bytes:
    return b + b"\0" * ((8 - len(b) % 8) % 8)


def _attr_message(name: str, dtype, shape: tuple[int, ...],
                  data: bytes) -> bytes:
    nm = name.encode("utf-8") + b"\0"
    dt = _dt_message(dtype)
    sp = _sp_message(shape)
    body = struct.pack("<BBHHH", 1, 0, len(nm), len(dt), len(sp))
    return body + _pad8(nm) + _pad8(dt) + _pad8(sp) + data


def _attr_payload(name: str, value) -> bytes:
    """Attribute message for str / float / int / float-list values."""
    if isinstance(value, str):
        raw = value.encode("utf-8") + b"\0"
        return _attr_message(name, ("string", len(raw)), (), raw)
    if isinstance(value, (list, tuple)):
        arr = np.asarray(value, "<f8")
        return _attr_message(name, np.dtype("<f8"), (len(arr),),
                             arr.tobytes())
    if isinstance(value, (int, np.integer)):
        return _attr_message(name, np.dtype("<i4"), (),
                             struct.pack("<i", int(value)))
    arr = np.asarray(value)
    if arr.dtype.kind == "f" and arr.dtype.itemsize == 4:
        return _attr_message(name, np.dtype("<f4"), (),
                             struct.pack("<f", float(value)))
    return _attr_message(name, np.dtype("<f8"), (),
                         struct.pack("<d", float(value)))


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHBBBB", mtype, len(body), 0, 0, 0, 0) + body


def _object_header(msgs: list[bytes]) -> bytes:
    total = sum(len(m) for m in msgs)
    hd = struct.pack("<BBHII", 1, 0, len(msgs), 1, total) + b"\0" * 4
    return hd + b"".join(msgs)


def write_hdf5(path: str, datasets: dict, gattrs: dict | None = None) -> None:
    """Write a netCDF-4 flavoured HDF5 file.

    ``datasets`` maps name -> spec dict with keys: ``data``
    (np.ndarray), optional ``dims`` (list of dimension-scale dataset
    names; their own entries must exist and be 1-D), ``attrs``,
    ``chunks`` (tuple -> chunked + shuffle + deflate) — mirroring what
    the reference's ``Netcdf4DatasetIO.write`` produces through
    xarray/netCDF4 (core/dsio.py:359).  Fixture knobs mirroring files
    libhdf5 produces with late allocation: ``unallocated`` (layout
    address stays undefined — variable defined but never written),
    ``skip_chunks`` (set of chunk-offset tuples left out of the chunk
    B-tree — partially-written variable), ``fillvalue`` (scalar for
    the fill-value message; default 0)."""
    out = _Out()
    out.addrs["undef"] = _UNDEF
    names = sorted(datasets)
    dim_names = [n for n in names if "dims" not in datasets[n]
                 or datasets[n].get("dims") == [n]]

    # -- superblock (96 bytes, O = L = 8) ---------------------------------
    sb = _SIG + bytes([0, 0, 0, 0, 0, 8, 8, 0])
    sb += struct.pack("<HHI", 16, 16, 0)          # leaf_k=16, internal_k=16
    sb += struct.pack("<Q", 0)                    # base address
    sb += struct.pack("<Q", _UNDEF)               # free-space (none)
    out.write(sb)
    eof_pos = len(out.b)
    out.write(struct.pack("<Q", 0))               # EOF, patched at end
    out.write(struct.pack("<Q", _UNDEF))          # driver info
    # root symbol-table entry: name offset 0, header addr, cached btree/heap
    out.write(struct.pack("<Q", 0))
    out.write(out.ref("root_oh"))
    out.write(struct.pack("<II", 1, 0))
    out.write(out.ref("gbtree") + out.ref("lheap"))

    # -- local heap with link names ---------------------------------------
    heap_data = bytearray(b"\0" * 8)              # offset 0 = "" (root name)
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        heap_data += _pad8(n.encode("utf-8") + b"\0")
    out.mark("lheap")
    out.write(b"HEAP\0\0\0\0"
              + struct.pack("<QQ", len(heap_data), 1))
    out.write(out.ref("lheap_data"))
    out.mark("lheap_data")
    out.write(bytes(heap_data))

    # -- global heap for DIMENSION_LIST vlen refs -------------------------
    vlen_slots: dict[tuple[str, int], tuple[int, int]] = {}
    gheap = bytearray()
    idx = 0
    for n in names:
        for di, dim in enumerate(datasets[n].get("dims") or []):
            if dim == n:
                continue
            idx += 1
            vlen_slots[(n, di)] = (idx, len(gheap) + 16)
            gheap += struct.pack("<HHIQ", idx, 1, 0, 8)
            gheap += struct.pack("<Q", 0)         # ref, patched below
    if gheap:
        total = max(4096, 16 + len(gheap) + 16)
        head = b"GCOL\x01\0\0\0" + struct.pack("<Q", total)
        free = total - 16 - len(gheap)
        tail = struct.pack("<HHIQ", 0, 0, 0, free) + b"\0" * (free - 16)
        out.mark("gcol")
        gcol_base = out.write(head + bytes(gheap) + tail)
        for (n, di), (gidx, off) in vlen_slots.items():
            dim = datasets[n]["dims"][di]
            out.patches.append((gcol_base + 16 + off, f"oh:{dim}"))

    # -- dataset object headers -------------------------------------------
    for n in names:
        spec = datasets[n]
        arr = np.ascontiguousarray(spec["data"])
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        chunks = spec.get("chunks")
        msgs = [_msg(0x0001, _sp_message(arr.shape)),
                _msg(0x0003, _dt_message(arr.dtype))]
        fill = np.full(1, spec.get("fillvalue", 0), arr.dtype).tobytes()
        msgs.append(_msg(0x0005, struct.pack("<BBBBI", 2, 1, 0, 1,
                                             len(fill)) + fill))
        if chunks is None:
            body = bytes([3, 1])
            body += struct.pack("<QQ", 0, arr.nbytes)
            lay = _msg(0x0008, body)
        else:
            body = bytes([3, 2, len(chunks) + 1])
            body += struct.pack("<Q", 0)          # btree addr, patched
            for c in chunks:
                body += struct.pack("<I", c)
            body += struct.pack("<I", arr.dtype.itemsize)
            lay = _msg(0x0008, body)
            # shuffle (itemsize) then deflate (level 4), both padded v1
            filt = struct.pack("<BB6x", 1, 2)
            filt += struct.pack("<HHHHI4x", 2, 0, 0, 1, arr.dtype.itemsize)
            filt += struct.pack("<HHHHI4x", 1, 0, 1, 1, 4)
            msgs.append(_msg(0x000B, filt))
        msgs.append(lay)
        attrs = dict(spec.get("attrs") or {})
        dims = spec.get("dims")
        if n in dim_names:
            attrs.setdefault("CLASS", "DIMENSION_SCALE")
            attrs.setdefault("NAME", n)
        for k, v in attrs.items():
            msgs.append(_msg(0x000C, _attr_payload(k, v)))
        if dims and dims != [n]:
            data = b""
            for di in range(len(dims)):
                gidx, _ = vlen_slots[(n, di)]
                data += struct.pack("<I", 1)
                data += struct.pack("<QI", 0, gidx)  # gcol addr patched
            body = _attr_message("DIMENSION_LIST", ("vlen_ref",),
                                 (len(dims),), data)
            msgs.append(_msg(0x000C, body))
        oh = _object_header(msgs)
        out.mark(f"oh:{n}")
        base = out.write(oh)
        # patch layout address + DIMENSION_LIST gheap addresses by scan:
        # find the placeholders we just wrote (zero 8-byte slots at known
        # offsets inside this header)
        off = 16  # v1 prefix + pad
        for m in msgs:
            mtype = struct.unpack_from("<H", oh, off)[0]
            msize = struct.unpack_from("<H", oh, off + 2)[0]
            body_at = base + off + 8
            if mtype == 0x0008:
                if spec.get("unallocated"):
                    key = "undef"
                else:
                    key = f"data:{n}" if chunks is None else f"btree:{n}"
                out.patches.append(
                    (body_at + (2 if chunks is None else 3), key))
            if mtype == 0x000C and dims and dims != [n]:
                # DIMENSION_LIST: locate data section of the attr
                b = oh[off + 8:off + 8 + msize]
                nm_len = struct.unpack_from("<H", b, 2)[0]
                dt_len = struct.unpack_from("<H", b, 4)[0]
                sp_len = struct.unpack_from("<H", b, 6)[0]
                if b[8:8 + nm_len].startswith(b"DIMENSION_LIST"):
                    dpos = (8 + len(_pad8(b"x" * nm_len))
                            + len(_pad8(b"x" * dt_len))
                            + len(_pad8(b"x" * sp_len)))
                    for di in range(len(dims)):
                        out.patches.append(
                            (body_at + dpos + di * 16 + 4, "gcol"))
            off += 8 + msize

    # -- root group object header -----------------------------------------
    # (addresses inside message bodies are patched after the write)
    root_msgs = [_msg(0x0011, struct.pack("<QQ", 0, 0))]
    for k, v in (gattrs or {}).items():
        root_msgs.append(_msg(0x000C, _attr_payload(k, v)))
    out.mark("root_oh")
    root_base = out.write(_object_header(root_msgs))
    out.patches.append((root_base + 16 + 8, "gbtree"))
    out.patches.append((root_base + 16 + 16, "lheap"))

    # -- SNOD + group B-tree ----------------------------------------------
    out.mark("snod")
    snod = b"SNOD\x01\0" + struct.pack("<H", len(names))
    out.write(snod)
    for n in names:
        out.write(struct.pack("<Q", name_off[n]))
        out.write(out.ref(f"oh:{n}"))
        out.write(struct.pack("<II", 0, 0) + b"\0" * 16)
    out.mark("gbtree")
    bt = b"TREE\0\0" + struct.pack("<H", 1)
    bt += struct.pack("<QQ", _UNDEF, _UNDEF)
    bt += struct.pack("<Q", 0)                    # key 0: "" offset
    out.write(bt)
    out.write(out.ref("snod"))
    out.write(struct.pack("<Q", name_off[names[-1]]))

    # -- raw data ----------------------------------------------------------
    for n in names:
        spec = datasets[n]
        arr = np.ascontiguousarray(spec["data"])
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        chunks = spec.get("chunks")
        if spec.get("unallocated"):
            continue
        if chunks is None:
            out.mark(f"data:{n}")
            out.write(arr.tobytes())
            continue
        skip = {tuple(s) for s in spec.get("skip_chunks") or ()}
        grid = [(s + c - 1) // c for s, c in zip(arr.shape, chunks)]
        entries = []
        for coord in np.ndindex(*grid):
            if tuple(c * s for c, s in zip(coord, chunks)) in skip:
                continue
            sel = tuple(slice(c * s, min((c + 1) * s, d))
                        for c, s, d in zip(coord, chunks, arr.shape))
            block = np.zeros(chunks, arr.dtype)
            block[tuple(slice(0, s.stop - s.start) for s in sel)] = arr[sel]
            raw = block.tobytes()
            nel = len(raw) // arr.dtype.itemsize
            shuffled = (np.frombuffer(raw, "u1")
                        .reshape(nel, arr.dtype.itemsize).T.tobytes())
            payload = zlib.compress(shuffled, 4)
            addr = out.write(payload)
            offs = tuple(c * s for c, s in zip(coord, chunks))
            entries.append((offs, addr, len(payload)))
        out.mark(f"btree:{n}")
        nb = b"TREE\x01\0" + struct.pack("<H", len(entries))
        nb += struct.pack("<QQ", _UNDEF, _UNDEF)
        node = bytearray(nb)
        for offs, addr, size in entries:
            node += struct.pack("<II", size, 0)
            for o in offs:
                node += struct.pack("<Q", o)
            node += struct.pack("<Q", 0)
            node += struct.pack("<Q", addr)
        node += struct.pack("<II", 0, 0)
        for d in arr.shape:
            node += struct.pack("<Q", d)
        node += struct.pack("<Q", 0)
        out.write(bytes(node))

    out.b[eof_pos:eof_pos + 8] = struct.pack("<Q", len(out.b))
    with open(path, "wb") as f:
        f.write(out.resolve())


def write_netcdf4_cube(
    cube: DataFrame,
    path: str,
    grid,
    var_names: list[str] | None = None,
    attrs: dict | None = None,
    chunks: tuple[int, int, int] | None = None,
) -> None:
    """Write a cells cube as netCDF-4/HDF5 (dimension scales, CF time
    units + _FillValue, chunked + shuffle + deflate variables) — the
    export twin of ``open_netcdf4_cube``; collects driver-side, so use
    for slices/fixtures (bulk storage stays parquet/zarr)."""
    from datetime import timezone

    from xcube_spark.cube.grid import var_names as cube_vars
    from xcube_spark.sources.geotiff import _guard_driver_collect

    vars_ = list(var_names) if var_names is not None else cube_vars(cube)
    tp, h, w = grid.time_periods, grid.height, grid.width
    _guard_driver_collect(tp * h * w * len(vars_), "write_netcdf4_cube")
    fill = -9.0e33
    planes = {n: np.full(tp * h * w, fill, "<f8") for n in vars_}
    for r in cube.select("t_i", "y_i", "x_i", *vars_).collect():
        base = (r["t_i"] * h + r["y_i"]) * w + r["x_i"]
        for n in vars_:
            if r[n] is not None:
                planes[n][base] = r[n]

    t_vals = np.array([grid.t_start.replace(tzinfo=timezone.utc).timestamp()
                       + (i + 0.5) * grid.t_freq_days * 86400.0
                       for i in range(tp)], "<f8")
    y_vals = np.array([(grid.y_end - (i + 0.5) * grid.y_res)
                       if grid.inverse_y
                       else (grid.y_start + (i + 0.5) * grid.y_res)
                       for i in range(h)], "<f8")
    x_vals = np.array([grid.x_start + (i + 0.5) * grid.x_res
                       for i in range(w)], "<f8")
    if chunks is None:
        chunks = grid.chunks
    spec = {
        "time": {"data": t_vals, "dims": ["time"], "attrs": {
            "units": "seconds since 1970-01-01 00:00:00"}},
        "lat": {"data": y_vals, "dims": ["lat"],
                "attrs": {"units": "degrees_north"}},
        "lon": {"data": x_vals, "dims": ["lon"],
                "attrs": {"units": "degrees_east"}},
    }
    for n in vars_:
        spec[n] = {"data": planes[n].reshape(tp, h, w),
                   "dims": ["time", "lat", "lon"],
                   "attrs": {"_FillValue": fill},
                   "chunks": chunks}
    write_hdf5(path, spec,
               gattrs={"Conventions": "CF-1.8", **(attrs or {})})
