"""Volumes API — (time, y, x) brick extraction + NRRD encode.

Twin of the reference's volumes endpoint
(``/root/reference/xcube/webapi/volumes/routes.py:73-183``): subset a
3-D variable by bbox/time range, enforce the voxel-count cap, flip the
y axis when the grid's j axis points down, replace NaN with 0, cast to
float32, and (driver-side, fixture-scale only) serialize as NRRD with
the reference's exact header and ``raw``/``gz`` encodings.

Spark mapping: the voxel table IS the brick — ``extract_volume``
returns one row per voxel ``(t_i, j, x_i, value)`` where ``j`` is the
render row (0 at the TOP of the image, the reference's
``values[:, ::-1, :]`` flip for j-axis-down grids), built from pure
Column expressions over the cube: range predicates that push down to
the scan, an index flip projection, and ``coalesce`` for the NaN->0
rule.  No shuffle at all — the plan is scan -> filter -> project.

The voxel-count cap (reference ``DEFAULT_MAX_VOXEL_COUNT = 256**3``,
config.py:7) is pure grid metadata arithmetic — computed without
touching data, exactly like the reference computes it from the
subset shape before reading values.
"""

from __future__ import annotations

import gzip
import math
import struct
import sys
from datetime import datetime
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.operators.select import widen_end_date

#: reference webapi/volumes/config.py:7
DEFAULT_MAX_VOXEL_COUNT = 256 ** 3


def _index_range(start: float, res: float, n: int,
                 lo: float, hi: float) -> tuple[int, int]:
    """Inclusive index range of cells whose CENTER falls in [lo, hi]."""
    # center of cell i is start + (i + 0.5) * res
    i1 = max(0, int(math.ceil((lo - start) / res - 0.5)))
    i2 = min(n - 1, int(math.floor((hi - start) / res - 0.5)))
    return i1, i2


def _y_index_range(grid: CubeGrid, y1: float, y2: float) -> tuple[int, int]:
    """Inclusive y_i range for [y1, y2] on either axis orientation:
    inverse_y grids index downward from y_end (center of row j is
    y_end - (j + 0.5) * res)."""
    if not grid.inverse_y:
        return _index_range(grid.y_start, grid.y_res, grid.height, y1, y2)
    j1 = max(0, int(math.ceil((grid.y_end - y2) / grid.y_res - 0.5)))
    j2 = min(grid.height - 1,
             int(math.floor((grid.y_end - y1) / grid.y_res - 0.5)))
    return j1, j2


def volume_shape(
    grid: CubeGrid,
    bbox: Sequence[float] | None = None,
    time_range: tuple | None = None,
) -> tuple[int, int, int]:
    """(size_t, size_y, size_x) of the subset brick — metadata only."""
    if bbox is not None:
        x1, y1, x2, y2 = bbox
        i1, i2 = _index_range(grid.x_start, grid.x_res, grid.width, x1, x2)
        j1, j2 = _y_index_range(grid, y1, y2)
    else:
        i1, i2 = 0, grid.width - 1
        j1, j2 = 0, grid.height - 1
    nt = grid.time_periods
    if time_range is not None:
        start, end = time_range
        nt = sum(
            1 for t in range(grid.time_periods)
            if (start is None or grid.t_center(t) >= _as_dt(start))
            and (end is None or grid.t_center(t) < widen_end_date(end))
        )
    return nt, max(0, j2 - j1 + 1), max(0, i2 - i1 + 1)


def _as_dt(v) -> datetime:
    return datetime.fromisoformat(v) if isinstance(v, str) else v


def extract_volume(
    cube: DataFrame,
    grid: CubeGrid,
    var_name: str,
    bbox: Sequence[float] | None = None,
    time_range: tuple | None = None,
    max_voxel_count: int = DEFAULT_MAX_VOXEL_COUNT,
) -> DataFrame:
    """The volumes-endpoint brick as a voxel table.

    Returns ``(t_i, j, x_i, value float)`` — ``t_i``/``x_i`` are
    subset-relative indices, ``j`` counts render rows downward from the
    TOP of the brick (the reference flips ``values[:, ::-1, :]``
    because its grids are j-axis-down); ``value`` is the float32
    variable with NaN replaced by 0.0 (routes.py:142).

    Raises the reference's too-large error (routes.py:131-136) from
    grid metadata BEFORE any data is read.
    """
    nt, ny, nx = volume_shape(grid, bbox=bbox, time_range=time_range)
    voxel_count = nt * ny * nx
    if voxel_count > max_voxel_count:
        raise ValueError(
            f"Volume too large, please select a smaller dataset subset."
            f" Maximum is {max_voxel_count} voxels,"
            f" got {nt} x {ny} x {nx} = {voxel_count}."
        )

    out = cube
    if bbox is not None:
        x1, y1, x2, y2 = bbox
        i1, _ = _index_range(grid.x_start, grid.x_res, grid.width, x1, x2)
        j1, j2 = _y_index_range(grid, y1, y2)
        out = out.where(
            F.col("x").between(x1, x2) & F.col("y").between(y1, y2))
    else:
        i1, j1, j2 = 0, 0, grid.height - 1
    t_lo = 0
    if time_range is not None:
        start, end = time_range
        if start is not None:
            out = out.where(F.col("time") >= F.lit(_as_dt(start)))
            t_lo = sum(1 for t in range(grid.time_periods)
                       if grid.t_center(t) < _as_dt(start))
        if end is not None:
            out = out.where(F.col("time") < F.lit(widen_end_date(end)))
    # top render row = northernmost selected cell: the max y_i on an
    # ascending-y grid, the MIN y_i when the grid's j axis already
    # points down (inverse_y) — then no flip is needed
    j_expr = (F.col("y_i") - F.lit(j1)) if grid.inverse_y \
        else (F.lit(j2) - F.col("y_i"))
    return out.select(
        (F.col("t_i") - t_lo).cast("int").alias("t_i"),
        j_expr.cast("int").alias("j"),
        (F.col("x_i") - i1).cast("int").alias("x_i"),
        F.coalesce(F.col(var_name).cast("float"), F.lit(0.0)).alias("value"),
    )


def nrrd_header(shape: tuple[int, int, int], encoding: str = "gz") -> str:
    """The reference's NRRD header, byte-for-byte (routes.py:155-172)."""
    size_z, size_y, size_x = shape
    scale_x = scale_y = 100.0 / max(size_x, size_y)
    scale_z = 100.0 / size_z
    return (
        "NRRD0004\n"
        "# NRRD 4 Format\n"
        "# see http://teem.sourceforge.net/nrrd/format.html\n"
        "type: float\n"
        "dimension: 3\n"
        "sizes:"
        f" {size_x} {size_y} {size_z}\n"
        f"encoding:"
        f" {encoding}\n"
        "endian:"
        f" {sys.byteorder}\n"
        "space directions:"
        f" ({scale_x},0,0) (0,{scale_y},0) (0,0,{scale_z})\n"
        "space origin: (0,0,0)\n"
        "\n"
    )


def volume_nrrd_bytes(
    voxels: DataFrame,
    shape: tuple[int, int, int],
    encoding: str = "gz",
    max_voxel_count: int = DEFAULT_MAX_VOXEL_COUNT,
) -> bytes:
    """Serialize an ``extract_volume`` result as an NRRD blob
    (header + C-order float32 values, optionally gzipped).

    DRIVER-SIDE, capped at ``max_voxel_count`` voxels like the
    endpoint itself — the brick is a response payload, bounded by
    construction; bulk cube export goes through the distributed
    zarr/parquet writers.
    """
    if encoding not in ("gz", "raw"):
        raise ValueError('Encoding must be one of "gz" or "raw"')
    nt, ny, nx = shape
    if nt * ny * nx > max_voxel_count:
        raise ValueError(
            f"Volume too large for driver-side NRRD encode "
            f"(max {max_voxel_count} voxels); write zarr/parquet instead."
        )
    rows = (
        voxels.orderBy("t_i", "j", "x_i")
        .select("value")
        .collect()
    )
    if len(rows) != nt * ny * nx:
        raise ValueError(
            f"voxel table has {len(rows)} rows but the header shape "
            f"{shape} needs {nt * ny * nx}: the brick is sparse or "
            "mis-shaped; densify missing cells before NRRD encode")
    data = struct.pack(f"<{len(rows)}f", *(r.value for r in rows))
    if encoding == "gz":
        data = gzip.compress(data)
    return nrrd_header(shape, encoding).encode("utf-8") + data
