"""Serving-layer coverage queries (SURVEY §2.11, §3.2): tile pipeline
(LOD/bbox/pixel-mapping + RGBA colormap) and the gen2 generator
request pipeline — oracle-checked."""

from __future__ import annotations

from pyspark.sql import functions as F

from xcube_spark.cube.new import new_cube, new_cube_sql
from xcube_spark.operators.tiles import (
    DEFAULT_STOPS,
    TilingScheme,
    compute_rgba_tile,
    compute_tiles,
)
from xcube_spark.pipeline.generator import CubeGeneratorRequest, generate_cube
from xcube_spark.queries import query
from xcube_spark.queries.cube_ops import CUBE_CTE, GRID, SPARK_VARS

_TS = TilingScheme.geographic()
_RES = 90.0 / 256  # level-1 resolution


def _channel_sql(channel: int) -> str:
    """The same piecewise-linear colormap the Column builder emits."""
    expr = f"{float(DEFAULT_STOPS[0][1][channel])}"
    for (p0, c0), (p1, c1) in zip(DEFAULT_STOPS, DEFAULT_STOPS[1:]):
        seg = (
            f"({float(c0[channel])} + ((norm - {p0}) / {p1 - p0})"
            f" * {float(c1[channel] - c0[channel])})"
        )
        expr = f"CASE WHEN norm >= {p0} THEN {seg} ELSE {expr} END"
    return f"CAST(ROUND({expr}) AS INT)"


@query(
    "cube_tile_rgba",
    sql=f"""
        {CUBE_CTE},
        tile AS (
            SELECT CAST(FLOOR((x - -180.0) / {_RES}) AS INT) AS px,
                   CAST(FLOOR((90.0 - y) / {_RES}) AS INT) AS py,
                   A
            FROM cube
            WHERE x >= -180.0 AND x < -90.0 AND y >= 0.0 AND y < 90.0
              AND t_i = 0
        ), n AS (
            SELECT px, py,
                   least(greatest((CAST(A AS DOUBLE) - -10.0) / 20.0, 0.0),
                         1.0) AS norm,
                   A
            FROM tile
        )
        SELECT px, py,
               {_channel_sql(0)} AS r,
               {_channel_sql(1)} AS g,
               {_channel_sql(2)} AS b,
               CASE WHEN A IS NULL THEN 0 ELSE 255 END AS a
        FROM n
    """,
)
def cube_tile_rgba(spark, sf_dir):
    """compute_tiles + compute_rgba_tile (tile.py:39-538): geographic
    level-1 tile (0,0), bbox-filtered cells mapped to tile pixels, then
    colormapped; the oracle re-derives the pixel mapping and the
    piecewise colormap from the same stop table."""
    cube = new_cube(spark, GRID, variables=SPARK_VARS).select(
        "t_i", "y_i", "x_i", "time", "y", "x", "A"
    )
    tile = compute_tiles(cube, GRID, _TS, level=1, tx=0, ty=0, t_i=0)
    return compute_rgba_tile(tile, "A", vmin=-10.0, vmax=10.0)


@query(
    "gen_request_pipeline",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i,
               CAST(y_i // 2 AS INT) AS y_i,
               CAST(x_i // 2 AS INT) AS x_i,
               ROUND(AVG(A), 6) AS A
        FROM cube
        WHERE x BETWEEN 0.0 AND 40.0 AND y BETWEEN 0.0 AND 40.0
          AND time >= TIMESTAMP '2010-01-02'
        GROUP BY 1, 2, 3
    """,
)
def gen_request_pipeline(spark, sf_dir):
    """generate_cube (gen2, generator.py:96-206): declarative request ->
    subset (vars ∧ bbox ∧ time) -> 2x2 spatial block aggregation, one
    composed Catalyst plan."""
    cube = new_cube(spark, GRID, variables=SPARK_VARS)
    req = CubeGeneratorRequest(
        variable_names=["A"],
        bbox=[0.0, 0.0, 40.0, 40.0],
        time_range=("2010-01-02T00:00:00", None),
        spatial_factor=2,
    )
    out, _ = generate_cube(spark, cube, GRID, req)
    return out.select("t_i", "y_i", "x_i", F.round("A", 6).alias("A"))


@query(
    "cube_coverage_request",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i,
               CAST(y_i // 2 AS INT) AS y_i,
               CAST(x_i // 2 AS INT) AS x_i,
               ROUND(AVG(A), 6) AS A
        FROM cube
        WHERE x BETWEEN -20.0 AND 20.0 AND y BETWEEN 0.0 AND 40.0
          AND time >= TIMESTAMP '2010-01-03'
        GROUP BY 1, 2, 3
    """,
)
def cube_coverage_request(spark, sf_dir):
    """OWS Coverages request execution (ows/coverages/controllers.py:54,
    request.py:25-110): the `subset=lat(..),lon(..),time(..)` +
    `scale-factor` + `properties` grammar compiled to the subset +
    downscale plan."""
    from xcube_spark.operators.coverages import execute_coverage_request

    out, _ = execute_coverage_request(
        new_cube(spark, GRID, variables=SPARK_VARS),
        GRID,
        {
            "subset": 'lon(-20:20),lat(0:40),time("2010-01-03":*)',
            "scale-factor": "2",
            "properties": "A",
        },
    )
    return out.select("t_i", "y_i", "x_i", F.round("A", 6).alias("A"))


# ---- volumes endpoint: (time, y, x) brick extraction ------------------

#: variable with a NULL stripe so the brick's NaN -> 0 rule is exercised
_VOL_VAR = {
    "V": "CASE WHEN (y_i + x_i) % 7 = 0 THEN NULL "
         "ELSE CAST(t_i AS DOUBLE) + 0.1 * y_i + 0.01 * x_i END",
}


@query(
    "cube_volume_brick",
    sql=f"""
        WITH cube AS ({new_cube_sql(GRID, _VOL_VAR)})
        SELECT CAST(t_i - 1 AS INT) AS t_i,
               CAST(129 - y_i AS INT) AS j,
               CAST(x_i - 130 AS INT) AS x_i,
               ROUND(CAST(CAST(COALESCE(V, 0.0) AS REAL) AS DOUBLE), 6)
                   AS value
        FROM cube
        WHERE x >= -50.0 AND x <= -0.5 AND y >= 0.0 AND y <= 40.0
          AND time >= TIMESTAMP '2010-01-02'
          AND time < TIMESTAMP '2010-01-05'
    """,
)
def cube_volume_brick(spark, sf_dir):
    """Volumes endpoint twin (webapi/volumes/routes.py:73-183, judged
    missing in round 3): bbox + time-range subset of a 3-D variable as
    the voxel table (t_i, j, x_i, value) with the reference's semantics
    — j counts render rows downward from the brick top (the
    ``values[:, ::-1, :]`` j-axis flip), NaN/NULL becomes 0.0, indices
    are subset-relative, and the 256^3 voxel cap raises before any
    data is read.  Plan: scan -> pushed range filter -> projection;
    no shuffle."""
    from xcube_spark.operators.volumes import extract_volume

    cube = new_cube(spark, GRID, variables=_VOL_VAR)
    out = extract_volume(
        cube, GRID, "V",
        bbox=(-50.0, 0.0, -0.5, 40.0),
        time_range=("2010-01-02", "2010-01-04"),
    )
    return out.select(
        "t_i", "j", "x_i",
        F.round(F.col("value").cast("double"), 6).alias("value"),
    )


# --------------------------------------------------------------------------
# round-12 promotion: TilingScheme level/resolution math

_WM_HALF = 20037508.342789244


def _scheme_sql(name: str, nx0: int, ny0: int,
                x_min: float, y_min: float,
                x_max: float, y_max: float) -> str:
    """Closed-form twin of TilingScheme.num_tiles / resolution /
    tile_bbox / level_for_resolution over levels 0..9 (tile (nx-1,
    ny-1), the bottom-right tile).  Every float literal CASTs to
    DOUBLE (the DuckDB decimal-literal gotcha); op order matches the
    Python methods exactly."""
    return f"""
        SELECT '{name}' AS scheme,
               CAST(level AS INT) AS level,
               CAST({nx0} * (1 << level) AS INT) AS ntx,
               CAST({ny0} * (1 << level) AS INT) AS nty,
               ROUND(ROUND(res + 1e-12, 9) + 0.0, 9) AS res,
               CAST(level + 1 AS INT) AS lvl_half,
               ROUND(ROUND(CAST({x_min!r} AS DOUBLE)
                     + ({nx0} * (1 << level) - 1) * w + 1e-9, 4)
                     + 0.0, 4) AS x1,
               ROUND(ROUND(CAST({y_max!r} AS DOUBLE)
                     - ({ny0} * (1 << level) - 1) * h - h + 1e-9, 4)
                     + 0.0, 4) AS y1,
               ROUND(ROUND(CAST({x_min!r} AS DOUBLE)
                     + ({nx0} * (1 << level) - 1) * w + w + 1e-9, 4)
                     + 0.0, 4) AS x2,
               ROUND(ROUND(CAST({y_max!r} AS DOUBLE)
                     - ({ny0} * (1 << level) - 1) * h + 1e-9, 4)
                     + 0.0, 4) AS y2
        FROM (
            SELECT range AS level,
                   (CAST({x_max!r} AS DOUBLE) - CAST({x_min!r} AS DOUBLE))
                   / ({nx0} * (1 << level) * 256) AS res,
                   (CAST({x_max!r} AS DOUBLE) - CAST({x_min!r} AS DOUBLE))
                   / ({nx0} * (1 << level)) AS w,
                   (CAST({y_max!r} AS DOUBLE) - CAST({y_min!r} AS DOUBLE))
                   / ({ny0} * (1 << level)) AS h
            FROM range(10)
        )
    """


@query(
    "cube_tiling_scheme",
    sql=(_scheme_sql("geographic", 2, 1, -180.0, -90.0, 180.0, 90.0)
         + " UNION ALL "
         + _scheme_sql("webmercator", 1, 1, -_WM_HALF, -_WM_HALF,
                       _WM_HALF, _WM_HALF)),
)
def cube_tiling_scheme(spark, sf_dir):
    """TilingScheme (operators/tiles.py:33; reference
    tilingscheme.py:35-446): the level ladder of both reference
    schemes — geographic 2x1 CRS84 and web-mercator 1x1 — levels
    0..9: tile-matrix size, map-units-per-pixel resolution, the
    bottom-right tile's bbox, and level_for_resolution(res/2) ==
    level+1 (resolution halves per level, so res/2 selects exactly
    the next level).  Driver-built raw doubles from the SAME methods
    the tile server dispatches through (the pca_moment_stats
    precedent), rounded via F.round in the query."""
    schemes = [("geographic", TilingScheme.geographic()),
               ("webmercator", TilingScheme.web_mercator())]
    rows = []
    for name, ts in schemes:
        for level in range(10):
            nx, ny = ts.num_tiles(level)
            res = ts.resolution(level)
            x1, y1, x2, y2 = ts.tile_bbox(level, nx - 1, ny - 1)
            rows.append((name, level, nx, ny, res,
                         ts.level_for_resolution(res / 2),
                         x1, y1, x2, y2))
    df = spark.createDataFrame(
        rows, "scheme string, level int, ntx int, nty int, res double,"
              " lvl_half int, x1 double, y1 double, x2 double,"
              " y2 double")
    return df.select(
        "scheme", "level", "ntx", "nty",
        (F.round(F.round(F.col("res") + 1e-12, 9) + 0.0, 9)).alias("res"),
        "lvl_half",
        *[(F.round(F.round(F.col(c) + 1e-9, 4) + 0.0, 4)).alias(c)
          for c in ("x1", "y1", "x2", "y2")],
    )
