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
