"""Physical-plan audits (SURVEY §4): these tests pin the plan
properties the engine's scale story depends on — partition pruning,
parquet filter pushdown, column pruning, broadcast join selection, and
partial (map-side) aggregation.  A regression here is a performance
bug even when results stay correct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import new_cube

GRID = CubeGrid(width=64, height=32, time_periods=4, x_res=5.625,
                y_res=5.625)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def layout_path(spark, tmp_path_factory):
    """A cube laid out per SURVEY §1.8: partitioned by t_i."""
    path = str(tmp_path_factory.mktemp("plans") / "cube.parquet")
    new_cube(spark, GRID, {"v": 1.0, "w": 2.0}).write \
        .partitionBy("t_i").parquet(path)
    return path


def test_partition_pruning_and_pushdown(spark, layout_path):
    df = spark.read.parquet(layout_path)
    q = df.where((F.col("t_i") == 2) & (F.col("x") >= 0.0)
                 & (F.col("x") < 10.0))
    plan = _plan(q)
    # time filter prunes partitions before listing...
    assert "PartitionFilters" in plan and "t_i" in plan.split(
        "PartitionFilters", 1)[1][:200]
    # ...and the bbox predicate reaches the parquet reader
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "GreaterThanOrEqual(x" in pushed and "LessThan(x" in pushed


def test_column_pruning(spark, layout_path):
    q = spark.read.parquet(layout_path).select("t_i", "y_i", "x_i", "v")
    plan = _plan(q)
    schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "v:" in schema and "w:" not in schema  # w pruned at the scan


def test_select_subset_pushes_through_operator(spark, layout_path):
    from xcube_spark.operators.select import select_subset

    cube = spark.read.parquet(layout_path)
    q = select_subset(cube, var_names=["v"], bbox=[0.0, 0.0, 30.0, 30.0])
    plan = _plan(q)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1][:400]
    assert "x" in pushed and "y" in pushed
    schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "w:" not in schema


def test_affine_gather_broadcasts_target(spark):
    from xcube_spark.operators.resampling import affine_transform_dataset

    cube = new_cube(spark, GRID, {"v": 1.0})
    tgt = CubeGrid(width=16, height=8, time_periods=4, x_start=-90.0,
                   y_start=-45.0, x_res=5.625, y_res=5.625)
    plan = _plan(affine_transform_dataset(cube, GRID, tgt, spline_orders=0))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_timeseries_partial_aggregation(spark, layout_path):
    from xcube_spark.operators.timeseries import get_time_series

    cube = spark.read.parquet(layout_path)
    plan = _plan(get_time_series(cube, ["v"], agg_methods=("mean", "count")))
    # two HashAggregates around one exchange = map-side partial agg
    assert plan.count("HashAggregate") >= 2
    assert "partial_avg" in plan or "partial_average" in plan


def test_extract_join_is_equi_not_range(spark, layout_path):
    """Nearest-cell extraction must plan as an equi-join on computed
    indices (the extract.py:321 rewrite), never a range/cartesian join."""
    from xcube_spark.cube.new import gen_points
    from xcube_spark.operators.extract import get_cube_values_for_points

    cube = spark.read.parquet(layout_path)
    pts = gen_points(spark, GRID, 100)
    plan = _plan(get_cube_values_for_points(cube, GRID, pts))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
