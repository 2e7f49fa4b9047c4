"""Tiling — xcube/core/tilingscheme.py:35-446 + core/tile.py:39-538.

``TilingScheme``: geographic / web-mercator tile pyramid math — pure
driver-side arithmetic (tile counts, per-level resolution, tile bbox),
like the reference's class.  ``compute_tiles``: the 11-step pipeline of
tile.py:39-74 reduced to its Spark shape (SURVEY §2.11):

1. pick the pyramid level whose resolution just covers the requested
   zoom (the LOD-selection rule, mldataset/abc.py:136);
2. bbox-filter the level's cells (partition/file pruning does the
   skipping on a laid-out table);
3. map cube cell indices to tile-local pixel rows with pure Column
   arithmetic.

``compute_rgba_tile`` (tile.py:355-538): value -> RGBA via a linear
4-stop colormap + vmin/vmax normalization, all Column expressions —
the PNG encode of the 256x256 result is a driver-side concern outside
the engine (like the reference's ``encode_image``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid


@dataclass(frozen=True)
class TilingScheme:
    """Tile pyramid over a geographic extent (tilingscheme.py:35-446).

    Level L has ``num_tiles_x0 * 2^L`` x ``num_tiles_y0 * 2^L`` tiles of
    ``tile_size`` px; GEOGRAPHIC = 2x1 tiles at level 0 over
    [-180, 180] x [-90, 90] (the reference's CRS84 scheme); WEB_MERCATOR
    = 1x1 over the square mercator extent.
    """

    num_tiles_x0: int = 2
    num_tiles_y0: int = 1
    x_min: float = -180.0
    y_min: float = -90.0
    x_max: float = 180.0
    y_max: float = 90.0
    tile_size: int = 256
    crs: str = "EPSG:4326"

    @classmethod
    def geographic(cls) -> "TilingScheme":
        return cls()

    @classmethod
    def web_mercator(cls) -> "TilingScheme":
        half = 20037508.342789244
        return cls(num_tiles_x0=1, num_tiles_y0=1, x_min=-half, y_min=-half,
                   x_max=half, y_max=half, crs="EPSG:3857")

    def num_tiles(self, level: int) -> tuple[int, int]:
        return (self.num_tiles_x0 << level, self.num_tiles_y0 << level)

    def resolution(self, level: int) -> float:
        """Map units per pixel at ``level`` (tilingscheme.py res ladder)."""
        nx, _ = self.num_tiles(level)
        return (self.x_max - self.x_min) / (nx * self.tile_size)

    def level_for_resolution(self, res: float) -> int:
        """Smallest level whose pixels are at least as fine as ``res``."""
        level = 0
        while self.resolution(level) > res * (1 + 1e-9):
            level += 1
        return level

    def tile_bbox(self, level: int, tx: int, ty: int) -> tuple[float, float, float, float]:
        """(x1, y1, x2, y2) of tile (tx, ty); ty counts from the TOP row
        like slippy-map/TMS-flipped schemes (tilingscheme.py j axis)."""
        nx, ny = self.num_tiles(level)
        w = (self.x_max - self.x_min) / nx
        h = (self.y_max - self.y_min) / ny
        x1 = self.x_min + tx * w
        y2 = self.y_max - ty * h
        return (x1, y2 - h, x1 + w, y2)


def select_tile_level(
    levels: list[tuple[CubeGrid, DataFrame]],
    scheme: TilingScheme,
    zoom: int,
) -> tuple[CubeGrid, DataFrame]:
    """LOD selection (abc.py:136): the coarsest stored level whose
    resolution is still <= the tile pyramid's resolution at ``zoom``."""
    want = scheme.resolution(zoom)
    best = levels[0]
    for grid, df in levels:
        if grid.x_res <= want * (1 + 1e-9):
            best = (grid, df)  # levels ordered fine -> coarse
    return best


def compute_tiles(
    cube: DataFrame,
    grid: CubeGrid,
    scheme: TilingScheme,
    level: int,
    tx: int,
    ty: int,
    var_names: list[str] | None = None,
    t_i: int | None = None,
) -> DataFrame:
    """Cells of tile (level, tx, ty) with tile-local pixel coordinates
    ``(px, py)`` (py from the top, image convention).  The bbox filter
    is a pure predicate on x/y -> partition-prunable; the pixel mapping
    is Column arithmetic at the *cube's* resolution (one cell may cover
    several tile pixels at coarse zoom — the gather join of the full
    renderer resamples; this operator returns the minimal cell set)."""
    from xcube_spark.cube.grid import var_names as cube_vars

    x1, y1, x2, y2 = scheme.tile_bbox(level, tx, ty)
    res = scheme.resolution(level)
    vars_ = var_names or cube_vars(cube)
    out = cube.where(
        (F.col("x") >= x1) & (F.col("x") < x2)
        & (F.col("y") >= y1) & (F.col("y") < y2)
    )
    if t_i is not None:
        out = out.where(F.col("t_i") == t_i)
    px = F.floor((F.col("x") - F.lit(x1)) / F.lit(res)).cast("int")
    py = F.floor((F.lit(y2) - F.col("y")) / F.lit(res)).cast("int")
    return out.select(
        "t_i", px.alias("px"), py.alias("py"), "x", "y", *vars_
    )


#: default 4-stop colormap (dark blue -> cyan -> yellow -> red)
DEFAULT_STOPS = [
    (0.0, (13, 8, 135)),
    (1 / 3, (126, 3, 168)),
    (2 / 3, (204, 71, 120)),
    (1.0, (248, 149, 64)),
]


def _channel_expr(norm: Column, channel: int) -> Column:
    """Piecewise-linear interpolation of one RGB channel over the stops."""
    expr = F.lit(float(DEFAULT_STOPS[0][1][channel]))
    for (p0, c0), (p1, c1) in zip(DEFAULT_STOPS, DEFAULT_STOPS[1:]):
        frac = (norm - F.lit(p0)) / F.lit(p1 - p0)
        seg = F.lit(float(c0[channel])) + frac * F.lit(float(c1[channel] - c0[channel]))
        expr = F.when(norm >= p0, seg).otherwise(expr)
    return F.round(expr).cast("int")


def compute_rgba_tile(
    tile_cells: DataFrame,
    var: str,
    vmin: float,
    vmax: float,
) -> DataFrame:
    """value -> RGBA columns (tile.py:355-538): clamp-normalize to
    [vmin, vmax] (the stretch range from compute_statistics /
    stretch_range), interpolate the colormap, NULL -> transparent."""
    return _rgba_select(tile_cells, var, F.lit(vmin), F.lit(vmax))


def compute_rgba_tile_auto(
    tile_cells: DataFrame,
    var: str,
    how: str = "2sigma",
    stats_df: DataFrame | None = None,
) -> DataFrame:
    """Like compute_rgba_tile but the stretch range is computed inside
    the plan (broadcast one-row crossJoin), so stretch + normalize +
    colormap is a single Spark action — no driver round-trip per tile
    request.  ``stats_df`` computes the range over a wider domain (e.g.
    the whole variable, not just this tile), matching the reference's
    dataset-level color ranges (tile.py:540-608)."""
    from xcube_spark.operators.statistics import with_stretch_range

    ranged = with_stretch_range(tile_cells, var, how, stats_df=stats_df)
    return _rgba_select(ranged, var, F.col("lo"), F.col("hi"))


def _rgba_select(cells: DataFrame, var: str, vmin: Column, vmax: Column) -> DataFrame:
    v = F.col(var)
    norm = (v - vmin) / (vmax - vmin)
    norm = F.least(F.greatest(norm, F.lit(0.0)), F.lit(1.0))
    return cells.select(
        "px", "py",
        _channel_expr(norm, 0).alias("r"),
        _channel_expr(norm, 1).alias("g"),
        _channel_expr(norm, 2).alias("b"),
        F.when(v.isNull(), 0).otherwise(255).alias("a"),
    )
