"""Point extraction — the reference's "joins" (SURVEY §2.4).

Re-expresses xcube/core/extract.py: align a points table
(time, lat/y, lon/x + payload columns) with the cube grid and gather
cell values.

Spark mapping: for regular grids the index math
(``floor((p - origin) / res)``, extract.py:321-414) is pure Column
arithmetic, which turns the nearest-cell lookup into an **equi-join on
computed indices** — no range join, no UDF.

Scale design: N points is typically tiny next to a 100 TB cells table,
but points sit on the *preserved* side of the left join, where Spark
cannot broadcast the build (cube) side.  We therefore run an INNER join
with the points broadcast as build side — one streaming pass over the
cube, zero shuffle of the cube — and restore left-outer semantics by
unioning the unmatched points back with NULL values (cheap: anti-join
against the small matched result).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.grid import var_names as cube_var_names

INDEX_COLS = ("t_i", "y_i", "x_i")


def get_cube_point_indexes(
    points: DataFrame,
    grid: CubeGrid,
    time_name: str = "time",
    y_name: str = "lat",
    x_name: str = "lon",
) -> DataFrame:
    """Map point coordinates to integer cell indexes; out-of-coverage
    coordinates map to NULL (extract.py:261-318; invalid -> -1/NaN at
    extract.py:334-338, NULL in the relational model)."""
    return points.select(
        "*",
        grid.t_index_expr(F.col(time_name)).alias("t_i"),
        grid.y_index_expr(F.col(y_name)).alias("y_i"),
        grid.x_index_expr(F.col(x_name)).alias("x_i"),
    )


def get_cube_values_for_indexes(
    cube: DataFrame,
    indexed_points: DataFrame,
    var_names: Iterable[str] | None = None,
) -> DataFrame:
    """Gather cube values at integer indexes; rows with NULL/out-of-range
    indexes yield NULL values (extract.py:128-258).

    Physical plan: broadcast-inner-join over the cube + anti-join
    restore of unmatched points (see module docstring).
    """
    vars_ = list(var_names) if var_names is not None else cube_var_names(cube)
    cube_side = cube.select(*INDEX_COLS, *vars_)
    pts = indexed_points

    matched = cube_side.join(F.broadcast(pts), on=list(INDEX_COLS), how="inner")
    # restore points that found no cell (outer semantics of the reference)
    missing = pts.join(
        F.broadcast(matched.select(*INDEX_COLS).distinct()),
        on=list(INDEX_COLS),
        how="left_anti",
    )
    for v in vars_:
        missing = missing.withColumn(v, F.lit(None).cast(dict(cube_side.dtypes)[v]))
    return matched.select(*pts.columns, *vars_).unionByName(
        missing.select(*pts.columns, *vars_)
    )


def get_cube_values_for_points(
    cube: DataFrame,
    grid: CubeGrid,
    points: DataFrame,
    var_names: Iterable[str] | None = None,
    include_indexes: bool = False,
    time_name: str = "time",
    y_name: str = "lat",
    x_name: str = "lon",
) -> DataFrame:
    """Nearest-cell value extraction for a points table
    (extract.py:30-125; nearest-cell method — "linear" is
    NotImplementedError in the reference too, extract.py:166-167)."""
    pts = get_cube_point_indexes(
        points, grid, time_name=time_name, y_name=y_name, x_name=x_name
    )
    out = get_cube_values_for_indexes(cube, pts, var_names)
    if not include_indexes:
        out = out.drop(*INDEX_COLS)
    return out


def get_dataset_indexes_irregular(
    points: DataFrame,
    axis: DataFrame,
    coord_name: str,
    index_name: str,
) -> DataFrame:
    """Point coordinate -> cell index against an IRREGULAR axis — the
    bounds-interval lookup of get_dataset_indexes (extract.py:321-414)
    when the axis is not equidistant and the closed-form floor() math
    doesn't apply.

    ``axis`` is a bounds table ``(<index_name>, <coord>_lo, <coord>_hi)``
    (SURVEY §1.8 axis tables).  The lookup is a **range join**
    ``p.coord >= lo AND p.coord < hi`` with the axis broadcast: axis
    tables are metadata-sized (one row per label), so every executor
    resolves its points locally — no shuffle of the points, and out-of-
    range points keep a NULL index (the reference's -1/NaN contract).
    """
    lo, hi = f"{coord_name}_lo", f"{coord_name}_hi"
    # keep only (index, lo, hi) from the axis so a center column (e.g.
    # ``y`` in CubeGrid.y_axis) can't shadow the points' coordinate
    bounds = axis.select(index_name, lo, hi)
    cond = (F.col(coord_name) >= F.col(lo)) & (F.col(coord_name) < F.col(hi))
    joined = points.join(F.broadcast(bounds), on=cond, how="left")
    return joined.drop(lo, hi)


def get_cube_values_for_points_irregular(
    cube: DataFrame,
    points: DataFrame,
    y_axis: DataFrame,
    x_axis: DataFrame,
    t_axis: DataFrame,
    var_names: Iterable[str] | None = None,
    y_name: str = "lat",
    x_name: str = "lon",
    time_name: str = "time",
) -> DataFrame:
    """get_cube_values_for_points over irregular axes: three broadcast
    range joins resolve (t_i, y_i, x_i), then the same gather equi-join
    as the regular path.  Axis bounds tables use the coord names
    ``y``/``x``/``time`` with ``_lo``/``_hi`` suffixes."""
    vars_ = list(var_names) if var_names is not None else cube_var_names(cube)

    pts = points.withColumnRenamed(y_name, "y") if y_name != "y" else points
    pts = pts.withColumnRenamed(x_name, "x") if x_name != "x" else pts
    pts = get_dataset_indexes_irregular(pts, y_axis, "y", "y_i")
    pts = get_dataset_indexes_irregular(pts, x_axis, "x", "x_i")
    if time_name != "time":
        pts = pts.withColumnRenamed(time_name, "time")
    pts = get_dataset_indexes_irregular(pts, t_axis, "time", "t_i")

    gathered = pts.join(
        cube.select(*INDEX_COLS, *vars_),
        on=list(INDEX_COLS),
        how="left",
    )
    return gathered
