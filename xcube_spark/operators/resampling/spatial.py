"""Spatial resampling dispatcher — xcube/core/resampling/spatial.py:28-261.

``resample_in_space`` picks the physical strategy the same way the
reference does:

- identical grids -> **no-op elision** (spatial.py:150-155,
  affine.py:385-392): return the input unchanged — the cheap metadata
  check the reference hand-codes, free here because grids are value
  objects.
- same CRS, both regular -> **affine gather join**
  (affine_transform_dataset); if the target is coarser by an integer
  factor on both axes, **downscale-first** via block aggregation — the
  reference's coarsen/_SCALE_LIMIT heuristic (spatial.py:25,182-223)
  expressed as a planner rule: a partial-agg shuffle beats gathering
  k*k source rows per target cell.
- source has irregular 2-D coords -> **rectify** (ij-lookup gather).
- CRS differs -> **reproject** (transform + gather join).

This is the "planner function choosing one of the three physical
strategies" from SURVEY §2.6 — deliberately a plain Python function,
not a Catalyst rule: the decision depends only on grid metadata known
at plan-build time.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.operators.resampling.affine import (
    affine_transform_dataset,
    downscale_dataset,
)
from xcube_spark.operators.resampling.rectify import rectify_dataset
from xcube_spark.operators.resampling.reproject import reproject_dataset


def _integer_factor(source: CubeGrid, target: CubeGrid) -> int | None:
    """k if target is exactly a k x k block-aggregated source, else None."""
    if source.x_start != target.x_start or source.y_start != target.y_start:
        return None
    rx = target.x_res / source.x_res
    ry = target.y_res / source.y_res
    k = round(rx)
    if k < 2 or abs(rx - k) > 1e-9 or abs(ry - k) > 1e-9:
        return None
    if target.width != (source.width + k - 1) // k:
        return None
    if target.height != (source.height + k - 1) // k:
        return None
    return k


def resample_in_space(
    cube: DataFrame,
    source: CubeGrid,
    target: CubeGrid,
    var_names: Iterable[str] | None = None,
    irregular: bool = False,
) -> DataFrame:
    """Resample ``cube`` from ``source`` onto ``target``, choosing the
    physical strategy from grid metadata (spatial.py:28-261).

    ``irregular=True`` declares per-cell lon/lat columns (swath data):
    the rectify path.  The reference sniffs this from the coords' ndim
    (gridmapping/coords.py); in the cells-table model the caller states
    it, since a lon(y,x) column is schema-indistinguishable from a
    derived column.
    """
    if irregular:
        # regularity sniff (GridMapping.from_coords, gridmapping/
        # coords.py): a swath whose 2-D coords are secretly affine
        # takes the cheap regular path instead of rectify's geometry
        # reduction — two metadata-sized probe jobs buy a plan with no
        # ij-lookup build
        detected = detect_regular_grid(cube)
        if detected is not None and detected.crs == target.crs:
            regular = cube.drop("lon", "lat")
            return resample_in_space(
                regular, detected, target, var_names=var_names)
        return rectify_dataset(cube, target, var_names=var_names)

    if source.crs != target.crs:
        return reproject_dataset(cube, source, target, var_names=var_names)

    if (
        source.width == target.width
        and source.height == target.height
        and source.x_start == target.x_start
        and source.y_start == target.y_start
        and source.x_res == target.x_res
        and source.y_res == target.y_res
        and source.inverse_y == target.inverse_y
    ):
        return cube  # no-op elision

    k = _integer_factor(source, target)
    if k is not None:
        return downscale_dataset(cube, factor=k)

    return affine_transform_dataset(cube, source, target, var_names=var_names)


def detect_regular_grid(
    source: DataFrame,
    lon_name: str = "lon",
    lat_name: str = "lat",
    tol: float = 1e-9,
) -> CubeGrid | None:
    """Sniff whether per-cell 2-D coords are secretly REGULAR —
    ``GridMapping.from_coords``'s regularity detection (reference
    xcube/core/gridmapping/coords.py ``new_grid_mapping_from_coords``
    + ``GridMapping.is_regular``): if lon is affine in ``x_i`` alone
    and lat affine in ``y_i`` alone (within ``tol``), the swath is a
    plain grid and the cheap affine path applies instead of rectify's
    geometry reduction.

    Two metadata-sized aggregate jobs: one for the axis extremes, one
    for the max residual against the implied affine mapping — the
    corpus itself never moves.  Returns the detected
    :class:`CubeGrid` (handles decreasing-lat via ``inverse_y``) or
    ``None`` if the coords are genuinely curvilinear.
    """
    from pyspark.sql import functions as F

    need = {"x_i", "y_i", lon_name, lat_name}
    if not need <= set(source.columns):
        return None
    ext = source.agg(
        F.max("x_i").alias("nx"), F.max("y_i").alias("ny"),
        F.min_by(lon_name, "x_i").alias("lon0"),
        F.max_by(lon_name, "x_i").alias("lon1"),
        F.min_by(lat_name, "y_i").alias("lat0"),
        F.max_by(lat_name, "y_i").alias("lat1"),
    ).collect()[0]
    if ext["nx"] is None or ext["nx"] < 1 or ext["ny"] < 1:
        return None
    dx = (ext["lon1"] - ext["lon0"]) / ext["nx"]
    dy = (ext["lat1"] - ext["lat0"]) / ext["ny"]
    if dx <= 0 or dy == 0:
        return None
    # residuals against the implied affine mapping, one pass
    pred_lon = F.lit(ext["lon0"]) + F.col("x_i") * F.lit(dx)
    pred_lat = F.lit(ext["lat0"]) + F.col("y_i") * F.lit(dy)
    r = source.agg(
        F.max(F.abs(F.col(lon_name) - pred_lon)).alias("rx"),
        F.max(F.abs(F.col(lat_name) - pred_lat)).alias("ry"),
    ).collect()[0]
    if r["rx"] > tol or r["ry"] > tol:
        return None
    width, height = ext["nx"] + 1, ext["ny"] + 1
    inverse_y = dy < 0
    ady = abs(dy)
    y_min_center = min(ext["lat0"], ext["lat1"])
    return CubeGrid(
        width=width, height=height,
        x_start=ext["lon0"] - dx / 2,
        y_start=y_min_center - ady / 2,
        x_res=dx, y_res=ady,
        inverse_y=inverse_y,
    )
