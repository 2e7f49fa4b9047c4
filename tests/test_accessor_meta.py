"""SparkCube fluent accessor, metadata sidecar, and virtual chunk
store tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xcube_spark.cube.accessor import SparkCube
from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.metadata import (
    edit_metadata,
    read_meta,
    update_dataset_attrs,
)
from xcube_spark.sources.chunkstore import open_chunk_store

GRID = CubeGrid(width=8, height=4, time_periods=4, x_res=45.0, y_res=45.0,
                chunks=(2, 2, 4))
VARS = {"A": lambda ns: (ns["t_i"] * 100 + ns["y_i"] * 10 + ns["x_i"])
        .cast("double")}


def test_accessor_chain(spark):
    cube = SparkCube.new(spark, GRID, VARS)
    assert cube.var_names == ["A"]
    assert cube.verify() == []

    ts = (
        cube.select_subset(var_names=["A"], bbox=[-180, -90, 0, 0])
        .time_series(["A"], agg_methods=("mean", "count"))
    )
    rows = ts.collect()
    assert len(rows) == 4 and rows[0]["A_count"] == 8

    small = cube.subsample(2)
    assert small.grid.width == 4 and small.df.count() == 4 * 2 * 4

    lv = cube.levels(num=2)
    assert len(lv) == 2 and lv[1].grid.x_res == 90.0


def test_accessor_evaluate_compute(spark):
    cube = SparkCube.new(spark, GRID, VARS)
    ev = cube.evaluate({"B": "A * 2"})
    assert ev.df.where(F.col("B") != 2 * F.col("A")).count() == 0

    cp = cube.compute(lambda a, coords: a + 1.0, "C", input_var_names=["A"])
    assert cp.df.where(F.col("C") != F.col("A") + 1).count() == 0


def test_accessor_write_with_meta(spark, tmp_path):
    path = str(tmp_path / "cube.parquet")
    cube = SparkCube.new(spark, GRID, VARS).update_attrs()
    assert cube.attrs["geospatial_lon_min"] == -157.5
    assert cube.attrs["time_coverage_start"].startswith("2010-01-01")
    cube.write(path)
    assert read_meta(path)["Conventions"] == "CF-1.7"

    back = SparkCube.open(spark, path, GRID)
    assert back.attrs["geospatial_lat_max"] == 67.5
    assert back.df.count() == GRID.size


def test_edit_metadata(spark, tmp_path):
    path = str(tmp_path / "m.parquet")
    SparkCube.new(spark, GRID, VARS).write(path)
    attrs = edit_metadata(path, {"title": "test cube"}, delete=["nope"])
    assert attrs["title"] == "test cube"
    assert read_meta(path)["title"] == "test cube"
    edit_metadata(path, {}, delete=["title"])
    assert "title" not in read_meta(path)


def test_chunk_store(spark):
    calls = []

    def get_data(chunk_idx, bounds):
        calls.append(chunk_idx)
        t0, t1, y0, y1, x0, x1 = bounds
        tt, yy, xx = np.meshgrid(
            np.arange(t0, t1), np.arange(y0, y1), np.arange(x0, x1),
            indexing="ij")
        return {"V": tt * 100.0 + yy * 10.0 + xx}

    virt = open_chunk_store(spark, GRID, get_data, ["V"])
    assert virt.count() == GRID.size
    r = virt.where("t_i = 3 AND y_i = 2 AND x_i = 7").collect()[0]
    assert r["V"] == 327.0
    assert r["x"] == 157.5

    # the whole cube = 2*2*2 chunks; subset reads still compute all
    # requested cells correctly
    sub = virt.where("t_i = 0").agg(F.sum("V")).collect()[0][0]
    want = sum(0 * 100 + y * 10 + x for y in range(4) for x in range(8))
    assert sub == want
