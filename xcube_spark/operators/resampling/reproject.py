"""CRS reprojection — xcube/core/resampling/reproject.py:27-507.

``reproject_dataset``: resample a regular-grid cube in CRS A onto a
regular grid in CRS B.  The reference transforms, per target block, the
target cell centers into the source CRS with pyproj, then gathers the
nearest source pixel (reproject.py:360-430).

Spark mapping: the same **target-driven gather join** as affine, with
the coordinate transform factored out as a pluggable function:

1. synthesize the target cell table (narrow ``spark.range`` projection);
2. transform target (x, y) -> source CRS — either
   - a *pure Column* transform (identity, lon/lat <-> scaled meters
     approximations) that stays inside whole-stage codegen, or
   - a **pandas_udf transform** (Arrow-batched) when real projection
     math is needed.  ``pyproj`` is not installed in this container, so
     the UDF path is gated behind an import-try and ships with
     deterministic pure-numpy transforms for the common cases
     (EPSG:4326 <-> EPSG:3857 Web-Mercator — closed-form math,
     no library needed);
3. compute source indices from the transformed coords (Column math) and
   equi-join the source cells — identical physical shape to affine, so
   the same layout/broadcast reasoning applies.

Scale: the transform is applied to the *target* table (bounded by the
requested output size, usually << source); the join shuffles on source
cell indices which are co-located with the cells-table layout.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid

#: (x, y) -> (x', y') as Column expressions
ColumnTransform = Callable[[Column, Column], tuple[Column, Column]]

_R = 6378137.0  # WGS84 spherical radius used by EPSG:3857


def _lonlat_to_mercator(x: Column, y: Column) -> tuple[Column, Column]:
    """EPSG:4326 -> EPSG:3857, closed-form (no pyproj needed)."""
    mx = x * F.lit(math.pi * _R / 180.0)
    lat = F.when(y > 89.9999, 89.9999).when(y < -89.9999, -89.9999).otherwise(y)
    my = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / 2)) * F.lit(_R)
    return mx, my


def _mercator_to_lonlat(x: Column, y: Column) -> tuple[Column, Column]:
    """EPSG:3857 -> EPSG:4326, closed-form inverse."""
    lon = x / F.lit(math.pi * _R / 180.0)
    lat = F.degrees(F.atan(F.sinh(y / F.lit(_R))))
    return lon, lat


def _identity(x: Column, y: Column) -> tuple[Column, Column]:
    return x, y


#: registry of pure-Column CRS transforms (target CRS -> source CRS)
COLUMN_TRANSFORMS: dict[tuple[str, str], ColumnTransform] = {
    ("EPSG:4326", "EPSG:4326"): _identity,
    ("EPSG:3857", "EPSG:3857"): _identity,
    ("EPSG:3857", "EPSG:4326"): _mercator_to_lonlat,
    ("EPSG:4326", "EPSG:3857"): _lonlat_to_mercator,
}


def get_transform(src_crs: str, dst_crs: str) -> ColumnTransform:
    """Transform from ``src_crs`` coords into ``dst_crs`` coords.

    Prefers the pure-Column registry; falls back to a pyproj-backed
    pandas_udf when the package is available (it is not baked into this
    container — the fallback raises with a clear message otherwise)."""
    key = (src_crs, dst_crs)
    if key in COLUMN_TRANSFORMS:
        return COLUMN_TRANSFORMS[key]
    try:  # pragma: no cover - pyproj absent in the build container
        import numpy as np  # noqa: F401
        import pandas as pd
        import pyproj
        from pyspark.sql.functions import pandas_udf

        tf = pyproj.Transformer.from_crs(src_crs, dst_crs, always_xy=True)

        @pandas_udf("struct<x: double, y: double>")
        def _proj(x: pd.Series, y: pd.Series) -> pd.DataFrame:
            xx, yy = tf.transform(x.to_numpy(), y.to_numpy())
            return pd.DataFrame({"x": xx, "y": yy})

        def transform(cx: Column, cy: Column) -> tuple[Column, Column]:
            s = _proj(cx, cy)
            return s.getField("x"), s.getField("y")

        return transform
    except ImportError as exc:
        raise NotImplementedError(
            f"no Column transform registered for {src_crs} -> {dst_crs} "
            "and pyproj is not installed; register one in "
            "COLUMN_TRANSFORMS or install pyproj"
        ) from exc


def reproject_dataset(
    cube: DataFrame,
    source: CubeGrid,
    target: CubeGrid,
    var_names: Iterable[str] | None = None,
) -> DataFrame:
    """Gather-join reprojection of ``cube`` (on grid ``source``, CRS
    ``source.crs``) onto ``target`` (CRS ``target.crs``), nearest mode
    (the reference's default gather, reproject.py:360-430)."""
    from xcube_spark.cube.grid import var_names as cube_vars

    spark: SparkSession = cube.sparkSession
    vars_ = list(var_names) if var_names is not None else cube_vars(cube)
    transform = get_transform(target.crs, source.crs)

    plane = target.width * target.height
    tgt = spark.range(target.size).select(
        (F.col("id") / plane).cast("int").alias("t_i"),
        ((F.col("id") % plane) / target.width).cast("int").alias("y_i"),
        (F.col("id") % target.width).cast("int").alias("x_i"),
    )
    tx = target.x_center_expr(F.col("x_i"))
    ty = target.y_center_expr(F.col("y_i"))
    sx, sy = transform(tx, ty)
    tgt = tgt.select(
        "t_i", "y_i", "x_i",
        target.time_center_expr(F.col("t_i")).alias("time"),
        ty.alias("y"),
        tx.alias("x"),
        source.x_index_expr(sx).alias("__sx"),
        source.y_index_expr(sy).alias("__sy"),
    )

    src_cells = cube.select(
        F.col("t_i").alias("__st"),
        F.col("y_i").alias("__ssy"),
        F.col("x_i").alias("__ssx"),
        *vars_,
    )
    # target table is bounded by the requested output size and has no
    # stats (spark.range) — broadcast it so the source never shuffles
    if target.size <= 4_000_000:
        tgt = F.broadcast(tgt)
    joined = tgt.join(
        src_cells,
        on=[
            F.col("t_i") == F.col("__st"),
            F.col("__sy") == F.col("__ssy"),
            F.col("__sx") == F.col("__ssx"),
        ],
        how="left",
    )
    return joined.select("t_i", "y_i", "x_i", "time", "y", "x", *vars_)
