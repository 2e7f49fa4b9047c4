"""Core model tests: new_cube synthesis, grid math, subsetting, timeseries.

Mirrors the reference's fixture-driven style (test/core/test_timeseries.py
builds 25x180x360 cubes via new_cube and asserts exact aggregates)."""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import new_cube
from xcube_spark.operators.select import (
    select_nearest_label,
    select_label_subset,
    select_spatial_subset,
    select_subset,
    select_temporal_subset,
    select_variables_subset,
)
from xcube_spark.operators.timeseries import get_time_series

GRID = CubeGrid(width=36, height=18, time_periods=4, x_res=10.0, y_res=10.0)


@pytest.fixture(scope="module")
def cube(spark):
    df = new_cube(spark, GRID).cache()
    df.count()
    yield df
    df.unpersist()


def test_new_cube_shape_and_coords(cube):
    assert cube.count() == 36 * 18 * 4
    row = cube.where("t_i=0 AND y_i=0 AND x_i=0").collect()[0]
    assert row["x"] == -175.0
    assert row["y"] == -85.0
    assert row["time"] == datetime(2010, 1, 1, 12, 0, 0)
    assert row["C"] == 0.5
    assert row["A"] == 0.0 + 0.1 * -85.0 + 0.01 * -175.0
    # flags bit0 set on the western half (x_i < 180 -> always here, W=36)
    assert row["flags"] & 1 == 1


def test_grid_index_roundtrip(spark):
    ax = GRID.x_axis(spark).withColumn("back", GRID.x_index_expr(F.col("x")))
    bad = ax.where("back IS NULL OR back <> x_i").count()
    assert bad == 0
    ay = GRID.y_axis(spark).withColumn("back", GRID.y_index_expr(F.col("y")))
    assert ay.where("back IS NULL OR back <> y_i").count() == 0
    at = GRID.time_axis(spark).withColumn("back", GRID.t_index_expr(F.col("time")))
    assert at.where("back IS NULL OR back <> t_i").count() == 0


def test_grid_inverse_y(spark):
    g = CubeGrid(width=4, height=4, time_periods=1, x_res=90.0, y_res=45.0, inverse_y=True)
    rows = g.y_axis(spark).orderBy("y_i").collect()
    assert rows[0]["y"] == 67.5  # top row first on inverted axis
    assert rows[-1]["y"] == -67.5
    df = new_cube(spark, g, variables={"v": 1.0})
    back = df.withColumn("b", g.y_index_expr(F.col("y")))
    assert back.where("b <> y_i").count() == 0


def test_select_variables(cube):
    out = select_variables_subset(cube, ["A"])
    assert set(out.columns) == {"t_i", "y_i", "x_i", "time", "y", "x", "A"}
    with pytest.raises(KeyError):
        select_variables_subset(cube, ["nope"])


def test_select_spatial_bbox(cube):
    out = select_spatial_subset(cube, bbox=[0.0, 0.0, 60.0, 40.0])
    # x centers 5,15,...,55 (6 cols), y centers 5,15,25,35 (4 rows), 4 times
    assert out.count() == 6 * 4 * 4
    out_ij = select_spatial_subset(cube, ij_bbox=[0, 0, 2, 1])
    assert out_ij.count() == 3 * 2 * 4


def test_select_temporal_end_widening(cube):
    # date-only end widens to midnight+1D (select.py:166-213): includes Jan 2 noon
    out = select_temporal_subset(cube, ("2010-01-01", "2010-01-02"))
    assert out.select("t_i").distinct().count() == 2


def test_select_subset_facade(cube):
    out = select_subset(
        cube, var_names=["A"], bbox=[0, 0, 60, 40], time_range=("2010-01-01", None)
    )
    assert out.count() == 6 * 4 * 4
    assert "B" not in out.columns


def test_select_label_subset(cube):
    # keep only times where A > threshold somewhere (any-semantics)
    out = select_label_subset(cube, "t_i", F.col("A") > 12.0, keep_if="any")
    kept = {r[0] for r in out.select("t_i").distinct().collect()}
    assert kept == {2, 3}  # max(A) = t + 10.25; > 12 only for t_i >= 2


def test_select_nearest_label(cube):
    out = select_nearest_label(cube, "x", 3.0)
    vals = out.select("x").distinct().collect()
    assert len(vals) == 1 and vals[0][0] == 5.0


def test_time_series_mean_count(cube):
    ts = get_time_series(
        cube, ["A", "C"], agg_methods=("mean", "min", "max", "count", "std", "median")
    ).collect()
    assert len(ts) == 4
    for i, row in enumerate(ts):
        # mean over all cells: mean(A) = t + 0.1*mean(y) + 0.01*mean(x) = t
        assert math.isclose(row["A_mean"], float(i), abs_tol=1e-9)
        assert row["C_mean"] == 0.5
        assert row["A_count"] == 36 * 18
        assert math.isclose(row["A_min"], i + 0.1 * -85 + 0.01 * -175, abs_tol=1e-9)
        assert math.isclose(row["A_max"], i + 0.1 * 85 + 0.01 * 175, abs_tol=1e-9)
        assert math.isclose(row["A_median"], float(i), abs_tol=1e-9)
        assert row["A_std"] > 0


def test_time_series_bbox_and_nulls(cube):
    ts = get_time_series(cube, ["B"], agg_methods=("count",), bbox=[0, 0, 60, 40])
    for row in ts.collect():
        assert row["B_count"] < 6 * 4  # ~30% NULLs are skipped


def test_select_subset_antimeridian_bbox(spark):
    """bbox with x1 > x2 crosses the anti-meridian: both sides of the
    dateline are selected (reference's split-bounds behavior), and the
    predicate stays a pushable OR of ranges."""
    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.cube.new import new_cube
    from xcube_spark.operators.select import select_spatial_subset

    grid = CubeGrid(width=36, height=4, time_periods=1, x_res=10.0,
                    y_res=45.0)
    cube = new_cube(spark, grid, {"v": 1.0})
    out = select_spatial_subset(cube, bbox=[160.0, -90.0, -160.0, 90.0])
    xs = sorted({r["x"] for r in out.collect()})
    assert xs == [-175.0, -165.0, 165.0, 175.0]
