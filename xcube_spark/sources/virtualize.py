"""Distributed multi-granule virtualization — the kerchunk workflow
the reference consumes through its reference data store
(``kerchunk``/``fsspec`` reference filesystem; repo twin
``sources/zarrio.py read_kerchunk_store``), built Spark-first.

A 100 TB netCDF-4 archive is millions of granule files.  Opening it as
one cube must NOT parse a million HDF5 headers on the driver: here the
metadata scan itself is a Spark job — ``mapInPandas`` tasks parse each
granule's HDF5 superblock/B-trees executor-locally and emit (a) chunk
byte-range rows and (b) tiny per-granule summaries (time values, axis
hashes).  Only the summaries and chunk KEYS come back to build the
combined reference document; no data bytes move at all.

The output is a standard kerchunk refs JSON describing ONE virtual
Zarr v2 cube concatenated along time (``{"version": 1, "refs":
{...}}``, byte ranges into the original .nc files, HDF5
shuffle+deflate chunks mapped to numcodecs ``shuffle`` + ``zlib``),
which then opens chunk-parallel through the existing
``open_kerchunk_cube`` — scan once, query forever.
"""

from __future__ import annotations

import base64
import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

_SCAN_SCHEMA = ("path STRING, kind STRING, var STRING, t0 INT, y0 INT, "
                "x0 INT, addr LONG, nbytes LONG, info STRING")


def _zarr_codecs(filters: list) -> tuple[list | None, dict | None]:
    """HDF5 filter pipeline -> (zarr filters, compressor)."""
    flt, comp = [], None
    for fid, cdata in filters:
        if fid == 2:
            flt.append({"id": "shuffle",
                        "elementsize": int(cdata[0]) if cdata else 0})
        elif fid == 1:
            comp = {"id": "zlib",
                    "level": int(cdata[0]) if cdata else 1}
        else:
            raise ValueError(
                f"HDF5 filter {fid} has no zarr reference mapping")
    return (flt or None), comp


def scan_netcdf4_granules(spark: SparkSession, paths: list[str],
                          var_names: list[str] | None = None,
                          time_dim: str = "time", y_dim: str = "lat",
                          x_dim: str = "lon"):
    """Distributed granule metadata scan: one task per batch of paths
    parses HDF5 metadata and emits chunk/axis/meta rows."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xcube_spark.sources.hdf5 import H5File, _var_dims, read_h5_array

        for pdf in batches:
            for path in pdf["path"]:
                h5 = H5File(path)
                scales = {n.rsplit("/", 1)[-1]: n
                          for n, d in h5.datasets.items()
                          if d.attrs.get("CLASS") == "DIMENSION_SCALE"}
                yd = y_dim if y_dim in scales else "y"
                xd = x_dim if x_dim in scales else "x"
                want = [time_dim, yd, xd]
                rows = []
                for n, ds in h5.datasets.items():
                    short = n.rsplit("/", 1)[-1]
                    if _var_dims(ds) != want:
                        continue
                    if var_names is not None and short not in var_names:
                        continue
                    tp, h, w = ds.shape
                    if ds.layout == "chunked":
                        cshape = ds.chunk_shape
                        for coords, addr, nb, fmask in h5.chunks(ds):
                            if fmask:
                                raise ValueError(
                                    f"{path}:{short}: partial filter "
                                    "masks are not virtualizable")
                            rows.append((path, "chunk", short, *coords,
                                         addr, nb, None))
                        filters = ds.filters
                    else:
                        cshape = (1, h, w)
                        plane = h * w * ds.dtype.itemsize
                        for t in range(tp):
                            rows.append((path, "chunk", short, t, 0, 0,
                                         ds.data_addr + t * plane, plane,
                                         None))
                        filters = []
                    flt, comp = _zarr_codecs(filters)
                    rows.append((path, "meta", short, 0, 0, 0, 0, 0,
                                 json.dumps({
                                     "shape": list(ds.shape),
                                     "chunks": list(cshape),
                                     "dtype": ds.dtype.str,
                                     "filters": flt,
                                     "compressor": comp,
                                     "attrs": {
                                         k: v for k, v in ds.attrs.items()
                                         if k in ("_FillValue",
                                                  "missing_value",
                                                  "scale_factor",
                                                  "add_offset")},
                                 })))
                tvals, tattrs = read_h5_array(path, scales[time_dim])
                yvals, _ = read_h5_array(path, scales[yd])
                xvals, _ = read_h5_array(path, scales[xd])
                rows.append((path, "axes", "", 0, 0, 0, 0, 0, json.dumps({
                    "t": tvals.astype("float64").tolist(),
                    "y": yvals.astype("float64").tolist(),
                    "x": xvals.astype("float64").tolist(),
                    "t_units": tattrs.get("units",
                                          "seconds since 1970-01-01"),
                    "t_calendar": tattrs.get("calendar"),
                })))
                yield pd.DataFrame(
                    rows, columns=["path", "kind", "var", "t0", "y0",
                                   "x0", "addr", "nbytes", "info"])

    pdf = pd.DataFrame({"path": list(paths)})
    tasks = spark.createDataFrame(pdf).repartition(min(len(paths), 64))
    return tasks.mapInPandas(scan, _SCAN_SCHEMA)


def virtualize_netcdf4_mf(
    spark: SparkSession,
    paths: list[str],
    refs_path: str,
    var_names: list[str] | None = None,
    time_dim: str = "time",
    y_dim: str = "lat",
    x_dim: str = "lon",
) -> int:
    """Virtualize a set of netCDF-4 granules into ONE kerchunk refs
    document: a time-concatenated virtual Zarr v2 cube whose chunks are
    byte ranges into the original files.  Granules are ordered by
    their first time value; every granule must share the spatial axes,
    variable set and per-variable chunking/codec (asserted).  Returns
    the reference count; open with ``open_kerchunk_cube``."""
    rows = scan_netcdf4_granules(spark, paths, var_names,
                                 time_dim, y_dim, x_dim).collect()
    return assemble_refs(rows, refs_path)


def assemble_refs(rows, refs_path: str) -> int:
    """Build the combined kerchunk refs document from (already
    collected) scan rows — shared by the batch virtualizer and the
    streaming granule-ingest sink."""
    chunks: dict[str, list] = {}
    metas: dict[tuple[str, str], dict] = {}
    axes: dict[str, dict] = {}
    for r in rows:
        if r["kind"] == "chunk":
            chunks.setdefault(r["path"], []).append(r)
        elif r["kind"] == "meta":
            metas[(r["path"], r["var"])] = json.loads(r["info"])
        else:
            axes[r["path"]] = json.loads(r["info"])

    order = sorted(axes, key=lambda p: axes[p]["t"][0])
    if not order:
        raise ValueError("no granules scanned")
    first = axes[order[0]]
    for p in order[1:]:
        if (axes[p]["y"] != first["y"] or axes[p]["x"] != first["x"]
                or axes[p]["t_units"] != first["t_units"]):
            raise ValueError(f"granule {p} has a different grid/axes")
    var_meta: dict[str, dict] = {}
    for (p, v), m in metas.items():
        ref = var_meta.setdefault(v, m)
        if (m["chunks"] != ref["chunks"] or m["dtype"] != ref["dtype"]
                or m["filters"] != ref["filters"]
                or m["compressor"] != ref["compressor"]):
            raise ValueError(f"granule {p} chunking/codec differs for {v}")
    shapes = {tuple(m["chunks"]) for m in var_meta.values()}
    if len(shapes) != 1:
        raise ValueError(
            f"variables must share one chunk layout, got {shapes} "
            "(pass var_names to select a uniform subset)")

    t_offsets: dict[str, int] = {}
    total_t = 0
    for p in order:
        t_offsets[p] = total_t
        total_t += len(axes[p]["t"])
    ct = next(iter(shapes))[0]
    for p in order:
        if t_offsets[p] % ct or len(axes[p]["t"]) % ct:
            raise ValueError(
                f"granule {p}: time chunk {ct} does not tile the "
                "concatenation boundaries")

    h, w = len(first["y"]), len(first["x"])
    refs: dict[str, object] = {".zgroup": json.dumps({"zarr_format": 2})}

    def inline(name: str, vals: list, attrs: dict) -> None:
        arr = np.asarray(vals, "<f8")
        refs[f"{name}/.zarray"] = json.dumps({
            "zarr_format": 2, "shape": [len(vals)], "chunks": [len(vals)],
            "dtype": "<f8", "compressor": None, "filters": None,
            "fill_value": None, "order": "C"})
        refs[f"{name}/.zattrs"] = json.dumps(attrs)
        refs[f"{name}/0"] = "base64:" + base64.b64encode(
            arr.tobytes()).decode("ascii")

    all_t = [t for p in order for t in axes[p]["t"]]
    inline("time", all_t, {"_ARRAY_DIMENSIONS": ["time"],
                           "units": first["t_units"],
                           **({"calendar": first["t_calendar"]}
                              if first["t_calendar"] else {})})
    inline("y", first["y"], {"_ARRAY_DIMENSIONS": ["y"]})
    inline("x", first["x"], {"_ARRAY_DIMENSIONS": ["x"]})

    count = 0
    for v, m in var_meta.items():
        ct_, cy, cx = m["chunks"]
        refs[f"{v}/.zarray"] = json.dumps({
            "zarr_format": 2, "shape": [total_t, h, w],
            "chunks": m["chunks"], "dtype": m["dtype"],
            "compressor": m["compressor"], "filters": m["filters"],
            "fill_value": m["attrs"].get("_FillValue"), "order": "C"})
        refs[f"{v}/.zattrs"] = json.dumps(
            {"_ARRAY_DIMENSIONS": ["time", "y", "x"], **m["attrs"]})
        for p in order:
            off = t_offsets[p]
            for r in chunks.get(p, []):
                if r["var"] != v:
                    continue
                key = (f"{v}/{(off + r['t0']) // ct_}"
                       f".{r['y0'] // cy}.{r['x0'] // cx}")
                refs[key] = [f"file://{p}", int(r["addr"]),
                             int(r["nbytes"])]
                count += 1

    with open(refs_path, "w") as f:
        json.dump({"version": 1, "refs": refs}, f)
    return count
