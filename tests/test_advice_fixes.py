"""Regression tests for the round-2 ADVICE findings.

Each test pins one reported defect:
1. knn_bruteforce local prune must use the global (cosine desc, id asc)
   total order so exact-cosine ties at the k boundary are deterministic;
2. _rectify_fractional must not force-broadcast a target-plane-sized
   ij-lookup (cost-cap guard, like the nearest path);
3. write_zarr_cube mode='overwrite' must replace the store — a sparser
   rewrite must not read back stale chunk files;
4. GeoJSON FeatureCollection with members in any order must parse;
5. classic-NetCDF single-record-variable files use UNPADDED record
   slots (spec special rule).
"""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F


def test_knn_bruteforce_tie_break_deterministic(spark):
    """Duplicate embeddings produce exact cosine ties at the k
    boundary; the pruned plan must return the same smallest-id winners
    as the global (cosine desc, id asc) ranking."""
    from xcube_spark.pipeline.similarity import knn_bruteforce

    # ids 10..17 all share one vector (exact ties); ids 1-2 score lower
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(10, 18)]
    rows += [(1, [4.0, 3.0, 2.0, 1.0]), (2, [-1.0, -2.0, -3.0, -4.0])]
    # adversarial order: descending ids first, single partition so one
    # Arrow batch sees every tied row at once
    rows.sort(key=lambda r: -r[0])
    corpus = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>").coalesce(1)
    queries = spark.createDataFrame(
        [(100, [1.0, 2.0, 3.0, 4.0])], "query_id int, embedding array<double>")

    out = knn_bruteforce(corpus, queries, k=4).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [10, 11, 12, 13]
    assert all(r["cosine"] == pytest.approx(1.0) for r in out)


def test_rectify_fractional_no_forced_broadcast_on_large_grid(spark):
    """The fractional ij-lookup is target-plane-sized: a grid past the
    cost cap must NOT carry a forced broadcast hint (AQE may still pick
    one from runtime stats), while a small grid still does."""
    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.cube.new import new_cube
    from xcube_spark.operators.resampling.rectify import rectify_dataset

    def hint_count(df):
        return df._jdf.queryExecution().analyzed().toString().count(
            "ResolvedHint")

    src_grid = CubeGrid(width=6, height=4, time_periods=1, x_res=1.0,
                        y_res=1.0, x_start=0.0, y_start=0.0)
    swath = new_cube(spark, src_grid, {"V": 1.0}).withColumns(
        {"lon": F.col("x") + 0.25, "lat": F.col("y") + 0.25})

    small = rectify_dataset(swath, src_grid, var_names=["V"],
                            interpolation="bilinear")
    big_grid = CubeGrid(width=4000, height=4000, time_periods=1, x_res=1.0,
                        y_res=1.0, x_start=0.0, y_start=0.0)
    big = rectify_dataset(swath, big_grid, var_names=["V"],
                          interpolation="bilinear")
    # both plans broadcast the 1-row dims; only the small plan may
    # force-broadcast the lookup
    assert hint_count(small) == hint_count(big) + 1


def test_rectify_nearest_no_forced_broadcast_on_large_grid(spark):
    """Same guard on the nearest path's lookup broadcast."""
    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.cube.new import new_cube
    from xcube_spark.operators.resampling.rectify import rectify_dataset

    src_grid = CubeGrid(width=6, height=4, time_periods=1, x_res=1.0,
                        y_res=1.0, x_start=0.0, y_start=0.0)
    swath = new_cube(spark, src_grid, {"V": 1.0}).withColumns(
        {"lon": F.col("x"), "lat": F.col("y")})
    big_grid = CubeGrid(width=4000, height=4000, time_periods=1, x_res=1.0,
                        y_res=1.0, x_start=0.0, y_start=0.0)
    big = rectify_dataset(swath, big_grid, var_names=["V"])
    plan = big._jdf.queryExecution().analyzed().toString()
    # round 9 PINS the bounded mapped side to shuffle_hash past the
    # broadcast cap (leaving it to the optimizer flip-flopped between
    # SMJ and an erratic runtime broadcast); what must never appear on
    # a large grid is a FORCED BROADCAST of the plane-sized lookup
    assert "strategy=broadcast" not in plan


def test_zarr_overwrite_replaces_store(spark, tmp_path):
    """Overwriting with a SPARSER cube over the same chunk grid must
    not resurrect the previous write's chunk files as data."""
    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.cube.new import new_cube
    from xcube_spark.sources.zarrio import open_zarr_cube, write_zarr_cube

    grid = CubeGrid(width=6, height=4, time_periods=3, x_res=1.0,
                    y_res=1.0, x_start=0.0, y_start=0.0)
    path = str(tmp_path / "ow.zarr")
    full = new_cube(spark, grid, {"A": "CAST(t_i AS DOUBLE)"})
    write_zarr_cube(full, path, grid)
    sparse = full.where(F.col("t_i") == 0)
    write_zarr_cube(sparse, path, grid, mode="overwrite")

    back = open_zarr_cube(spark, path)
    stale = back.where((F.col("t_i") > 0) & F.col("A").isNotNull())
    assert stale.count() == 0
    assert back.where(F.col("A").isNotNull()).count() == grid.width * grid.height


def test_geojson_feature_collection_any_member_order(spark, tmp_path):
    """'features' before 'type' is valid GeoJSON and must parse via the
    FeatureCollection path (not crash in the NDJSON fallback)."""
    from xcube_spark.sources.features import open_geojson_features

    doc = {"features": [
        {"type": "Feature", "id": "a",
         "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
         "properties": {"name": "alpha"}},
        {"type": "Feature", "id": "b",
         "geometry": {"type": "Point", "coordinates": [3.0, 4.0]},
         "properties": {"name": "beta"}},
    ], "type": "FeatureCollection"}
    path = str(tmp_path / "reversed.geojson")
    with open(path, "w") as f:
        json.dump(doc, f)  # python dicts preserve insertion order

    feats = open_geojson_features(spark, path)
    rows = {r["feature_id"]: r["geometry"] for r in feats.collect()}
    assert rows == {"a": "POINT(1.0 2.0)", "b": "POINT(3.0 4.0)"}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def test_netcdf3_single_record_var_unpadded(spark, tmp_path):
    """Spec special rule: with exactly one record variable the record
    slots are NOT padded to 4 bytes.  An external CDF-1 file with one
    i2 (time, lat=1, lon=3) variable strides 6 bytes/record, not the
    padded vsize of 8."""
    from xcube_spark.sources.netcdf3 import (open_netcdf_cube,
                                             read_netcdf_header)

    def name(s: str) -> bytes:
        return struct.pack(">i", len(s)) + _pad4(s.encode())

    header = b"CDF\x01"
    header += struct.pack(">i", 2)  # numrecs
    header += struct.pack(">2i", 0x0A, 3)  # NC_DIMENSION, 3 dims
    header += name("time") + struct.pack(">i", 0)
    header += name("lat") + struct.pack(">i", 1)
    header += name("lon") + struct.pack(">i", 3)
    header += struct.pack(">2i", 0, 0)  # no global attrs
    header += struct.pack(">2i", 0x0B, 1)  # NC_VARIABLE, 1 var
    var = name("v")
    var += struct.pack(">i", 3) + struct.pack(">3i", 0, 1, 2)  # dims
    var += struct.pack(">2i", 0, 0)  # no var attrs
    var += struct.pack(">i", 3)  # NC_SHORT
    var += struct.pack(">i", 8)  # vsize: PADDED per spec
    begin = len(header) + len(var) + 4
    var += struct.pack(">i", begin)
    data = struct.pack(">6h", 1, 2, 3, 4, 5, 6)  # 2 records, unpadded

    path = str(tmp_path / "single_rec.nc")
    with open(path, "wb") as f:
        f.write(header + var + data)

    nc = read_netcdf_header(path)
    assert nc.recsize == 6  # NOT the padded 8
    cube = open_netcdf_cube(spark, path)
    vals = {(r["t_i"], r["x_i"]): r["v"] for r in cube.collect()}
    assert vals == {(0, 0): 1.0, (0, 1): 2.0, (0, 2): 3.0,
                    (1, 0): 4.0, (1, 1): 5.0, (1, 2): 6.0}
