"""Geometry operators — xcube/core/geom.py (SURVEY §2.3).

clip / mask / rasterize / places, on the cells-table model:

- ``clip_dataset_by_geometry`` (geom.py:445-529): bbox crop — a pure
  range predicate (parquet row-group pruning, no UDF, no shuffle).
- ``mask_dataset_by_geometry`` (geom.py:284-399): clip, then NULL-out
  cells outside the geometry.  Fast path: axis-aligned rectangles stay
  pure-Column.  General path: vectorized numpy ray-casting inside an
  Arrow-batched pandas UDF (the relational twin of the reference's
  blockwise ``geometry_mask`` under ``map_blocks``, geom.py:363-374).
- ``rasterize_features`` (geom.py:51-236): burn feature properties into
  new variables — broadcast the (small) feature table, test containment
  per candidate, last-feature-wins coalesce like the reference's
  sequential burn loop.
- ``find_places`` (webapi/places/controllers.py:25-108): filter a
  feature table by geometry intersection and/or a compiled expression.
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from xcube_spark.functions.expression import compile_expr
from xcube_spark.functions.wkt import (
    Geometry,
    geometries_intersect,
    geometry_bbox,
    is_rectangle,
    normalize_geometry,
    points_in_polygon,
)


def geometry_mask(
    geom: Any, x_name: str = "x", y_name: str = "y"
) -> Column:
    """Boolean Column: cell center inside geometry.

    Rectangles compile to a ``between`` predicate (pushdown-friendly);
    general polygons use a vectorized pandas UDF over the numpy
    ray-casting kernel.  The geometry travels to executors as a task
    closure constant — no join, no shuffle.
    """
    g = normalize_geometry(geom)
    rect = is_rectangle(g)
    if rect is not None:
        x1, y1, x2, y2 = rect
        return F.col(x_name).between(x1, x2) & F.col(y_name).between(y1, y2)
    if g["type"] == "Point":
        px, py = g["coordinates"]
        return (F.col(x_name) == px) & (F.col(y_name) == py)

    @F.pandas_udf(BooleanType())
    def _pip(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series(points_in_polygon(xs.values, ys.values, g))

    # cheap bbox pre-filter keeps the UDF off most rows (clip-before-
    # mask, geom.py:341-347) and remains pushdown-eligible
    x1, y1, x2, y2 = geometry_bbox(g)
    return (
        F.col(x_name).between(x1, x2)
        & F.col(y_name).between(y1, y2)
        & _pip(F.col(x_name), F.col(y_name))
    )


def clip_dataset_by_geometry(
    cube: DataFrame, geom: Any, x_name: str = "x", y_name: str = "y"
) -> DataFrame:
    """Crop to the geometry's bbox (geom.py:445-529) — pure predicate."""
    x1, y1, x2, y2 = geometry_bbox(normalize_geometry(geom))
    return cube.where(
        F.col(x_name).between(x1, x2) & F.col(y_name).between(y1, y2)
    )


def mask_dataset_by_geometry(
    cube: DataFrame,
    geom: Any,
    var_names: Iterable[str] | None = None,
    save_geometry_mask: str | None = None,
    x_name: str = "x",
    y_name: str = "y",
) -> DataFrame:
    """Clip to bbox, then NULL variables outside the geometry
    (geom.py:284-399; NaN-out -> NULL-out under the engine's missing-
    data policy).  ``save_geometry_mask`` keeps the boolean mask as a
    variable (the reference's option of the same name)."""
    from xcube_spark.cube.grid import var_names as cube_vars

    g = normalize_geometry(geom)
    out = clip_dataset_by_geometry(cube, g, x_name, y_name)
    mask = geometry_mask(g, x_name, y_name)
    vars_ = list(var_names) if var_names is not None else cube_vars(cube)
    # materialize the mask once per row, not once per variable
    out = out.withColumn("__mask", mask)
    for v in vars_:
        out = out.withColumn(v, F.when(F.col("__mask"), F.col(v)))
    if save_geometry_mask:
        out = out.withColumn(save_geometry_mask, F.col("__mask"))
    return out.drop("__mask")


def rasterize_features(
    cube: DataFrame,
    features: Sequence[dict[str, Any]],
    feature_props: Sequence[str],
    x_name: str = "x",
    y_name: str = "y",
) -> DataFrame:
    """Burn feature properties into new variables (geom.py:51-236).

    ``features``: [{"geometry": wkt/dict/bbox, <prop>: value, ...}].
    The reference burns features sequentially into the raster so later
    features overwrite earlier ones — reproduced here by evaluating a
    reverse-order ``coalesce(when(in_geom_N, v_N), ..., when(in_geom_0,
    v_0))`` chain.  Features are plan constants (broadcast-free); each
    non-rectangular geometry costs one vectorized UDF evaluation.
    """
    masks = [
        (geometry_mask(f["geometry"], x_name, y_name), f) for f in features
    ]
    out = cube
    for i, (m, _) in enumerate(masks):
        out = out.withColumn(f"__m{i}", m)
    for prop in feature_props:
        branches = [
            F.when(F.col(f"__m{i}"), F.lit(f.get(prop)))
            for i, (_, f) in reversed(list(enumerate(masks)))
        ]
        out = out.withColumn(prop, F.coalesce(*branches))
    return out.drop(*[f"__m{i}" for i in range(len(masks))])


def get_dataset_geometry(
    cube: DataFrame, x_name: str = "x", y_name: str = "y"
) -> Geometry:
    """Dataset bounds polygon (geom.py:657-717) from coordinate
    extremes (a tiny scalar aggregate)."""
    r = cube.agg(
        F.min(x_name), F.min(y_name), F.max(x_name), F.max(y_name)
    ).collect()[0]
    return normalize_geometry((r[0], r[1], r[2], r[3]))


def find_places(
    features: DataFrame,
    query_geometry: Any | None = None,
    query_expr: str | None = None,
    geometry_col: str = "geometry",
) -> DataFrame:
    """Filter a places/features table (WKT geometry column) by
    intersection with a query geometry and/or an attribute expression
    (webapi/places/controllers.py:25-108)."""
    out = features
    if query_expr is not None:
        out = out.where(compile_expr(query_expr))
    if query_geometry is not None:
        qg = normalize_geometry(query_geometry)

        @F.pandas_udf(BooleanType())
        def _intersects(wkts: pd.Series) -> pd.Series:
            return wkts.map(
                lambda w: geometries_intersect(normalize_geometry(w), qg)
                if w is not None
                else False
            )

        out = out.where(_intersects(F.col(geometry_col)))
    return out
