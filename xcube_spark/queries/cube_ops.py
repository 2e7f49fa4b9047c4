"""Cube-operator coverage queries, oracle-checked end to end.

Strategy: both engines *generate the identical deterministic cube* —
Spark via ``new_cube`` (one spark.range + column math), DuckDB via the
``new_cube_sql`` twin with bit-identical float operation order — then
apply the operator under test.  This makes genuinely cube-shaped
operators (subsetting, subsampling, pyramids, masksets, extraction
joins) verifiable through the driver's DuckDB hash gate even though the
driver's tables are relational.
"""

from __future__ import annotations

import weakref

from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import DEFAULT_VARIABLES, new_cube, new_cube_sql
from xcube_spark.operators.extract import get_cube_values_for_points
from xcube_spark.operators.select import select_subset
from xcube_spark.operators.subsampling import subsample_dataset
from xcube_spark.operators.timeseries import get_time_series
from xcube_spark.queries import query

#: the canonical fixture cube: 360 x 180 x 5 (new.py:13-41 defaults)
GRID = CubeGrid()
#: deterministic variables only (A, C, flags) — the seeded-random B is
#: exercised in pytest, not through the cross-engine oracle
SPARK_VARS = {k: v for k, v in DEFAULT_VARIABLES.items() if k != "B"}
CUBE_CTE = f"WITH cube AS ({new_cube_sql(GRID)})"


_CUBE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _cube(spark):
    """Memoized per session (weak-keyed, like ``tbl``'s cache): the
    synthesized fixture cube's plan is identical across queries, and
    rebuilding it costs ~0.3s of driver round-trips per call."""
    if spark not in _CUBE_CACHE:
        _CUBE_CACHE[spark] = new_cube(spark, GRID, variables=SPARK_VARS)
    return _CUBE_CACHE[spark]


@query(
    "cube_select_timeseries",
    sql=f"""
        {CUBE_CTE}
        SELECT time,
               ROUND(AVG(A), 6) AS A_mean,
               ROUND(MIN(A), 6) AS A_min,
               ROUND(MAX(A), 6) AS A_max,
               COUNT(A) AS A_count
        FROM cube
        WHERE x BETWEEN 10 AND 20 AND y BETWEEN 10 AND 20
          AND time >= TIMESTAMP '2010-01-02'
        GROUP BY time
    """,
)
def cube_select_timeseries(spark, sf_dir):
    """The flagship pipeline (SURVEY §7.1): select_subset (vars ∧ bbox ∧
    time, select.py:26-63) -> get_time_series (timeseries.py:50)."""
    cube = select_subset(
        _cube(spark),
        var_names=["A"],
        bbox=[10.0, 10.0, 20.0, 20.0],
        time_range=("2010-01-02T00:00:00", None),
    )
    return get_time_series(cube, ["A"], agg_methods=("mean", "min", "max", "count")) \
        .select("time",
                F.round("A_mean", 6).alias("A_mean"),
                F.round("A_min", 6).alias("A_min"),
                F.round("A_max", 6).alias("A_max"),
                "A_count")


@query(
    "cube_subsample_blocks",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i,
               CAST(y_i // 3 AS INT) AS y_i,
               CAST(x_i // 3 AS INT) AS x_i,
               ROUND(AVG(A), 6) AS A_mean,
               ROUND(MAX(A), 6) AS A_max,
               COUNT(*) AS n
        FROM cube
        GROUP BY 1, 2, 3
    """,
)
def cube_subsample_blocks(spark, sf_dir):
    """subsample_dataset k x k block aggregation (subsampling.py:17-264)."""
    out = subsample_dataset(
        _cube(spark).select("t_i", "y_i", "x_i", "A"),
        factor=3,
        agg_methods={"A": ("mean", "max")},
    )
    return out.select(
        "t_i", "y_i", "x_i",
        F.round("A_mean", 6).alias("A_mean"),
        F.round("A_max", 6).alias("A_max"),
        "n",
    )


@query(
    "cube_level_pyramid",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i, COUNT(*) AS n_cells,
               ROUND(SUM(A), 4) AS A_checksum
        FROM cube
        WHERE y_i % 4 = 0 AND x_i % 4 = 0
        GROUP BY t_i
    """,
)
def cube_level_pyramid(spark, sf_dir):
    """compute_levels decimation (level.py:31-137): level 2 keeps every
    4th row/col ([::2, ::2] twice, mldataset/abc.py:19-31); the filter
    is a pure predicate -> no shuffle before the tiny checksum agg."""
    lvl2 = _cube(spark).where((F.col("y_i") % 4 == 0) & (F.col("x_i") % 4 == 0))
    return lvl2.groupBy("t_i").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum("A"), 4).alias("A_checksum"),
    )


@query(
    "cube_maskset_flags",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i,
               COUNT(*) FILTER ((flags & 1) != 0 AND (flags & 2) = 0)
                   AS n_clear_land,
               ROUND(AVG(CASE WHEN (flags & 1) != 0 AND (flags & 2) = 0
                              THEN A END), 6) AS A_clear_land_mean
        FROM cube
        GROUP BY t_i
    """,
)
def cube_maskset_flags(spark, sf_dir):
    """MaskSet semantics (maskset.py:165-196): named boolean masks from
    CF flag attrs via bitwise ops — land AND NOT cloud here."""
    from xcube_spark.operators.maskset import MaskSet

    cube = _cube(spark)
    masks = MaskSet("flags", flag_masks=[1, 2, 4],
                    flag_meanings="land cloud invalid")
    clear_land = masks["land"] & ~masks["cloud"]
    return cube.groupBy("t_i").agg(
        F.count(F.when(clear_land, 1)).alias("n_clear_land"),
        F.round(F.avg(F.when(clear_land, F.col("A"))), 6).alias(
            "A_clear_land_mean"
        ),
    )


@query(
    "cube_vars_to_dim",
    sql=f"""
        {CUBE_CTE}
        SELECT var, ROUND(SUM(data), 4) AS total, COUNT(*) AS n
        FROM (
            SELECT 'A' AS var, A AS data FROM cube
            UNION ALL
            SELECT 'C' AS var, C AS data FROM cube
        )
        GROUP BY var
    """,
)
def cube_vars_to_dim(spark, sf_dir):
    """vars_to_dim (vars2dim.py:10-46): melt variables into a 'var'
    dimension — Spark's stack() unpivot, then a checksum aggregate."""
    from xcube_spark.operators.vars2dim import vars_to_dim

    long = vars_to_dim(_cube(spark), var_names=["A", "C"])
    return long.groupBy("var").agg(
        F.round(F.sum("data"), 4).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cube_evaluate_expr",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i,
               ROUND(SUM(CASE WHEN A > 2.5 THEN sqrt(A) * 2
                              ELSE C END), 4) AS D_sum,
               COUNT(CASE WHEN (flags & 1) != 0
                          THEN CASE WHEN A > 2.5 THEN sqrt(A) * 2
                                    ELSE C END END) AS D_valid_land
        FROM cube
        GROUP BY t_i
    """,
)
def cube_evaluate_expr(spark, sf_dir):
    """evaluate_dataset (evaluate.py:16-152) + expression compiler
    (util/expression.py transpile dialect): computed variable with
    where()/sqrt(), masked aggregate via MaskSet-style flag predicate —
    all compiled to Columns, zero Python in the executed plan."""
    from xcube_spark.operators.evaluate import evaluate_dataset

    cube = evaluate_dataset(
        _cube(spark),
        {"D": {"expression": "where(A > 2.5, sqrt(A) * 2, C)"}},
    )
    return cube.groupBy("t_i").agg(
        F.round(F.sum("D"), 4).alias("D_sum"),
        F.count(F.when(F.col("flags").bitwiseAND(1) != 0, F.col("D"))).alias(
            "D_valid_land"
        ),
    )


@query(
    "cube_resample_time_2d",
    sql=f"""
        {CUBE_CTE}
        SELECT to_timestamp(FLOOR(epoch(time) / 172800) * 172800)::TIMESTAMP
                   AS time,
               CAST(y_i // 30 AS INT) AS y_i,
               CAST(x_i // 30 AS INT) AS x_i,
               ROUND(AVG(A), 6) AS A_mean,
               ROUND(quantile_cont(A, 0.9), 6) AS A_percentile_90,
               ROUND(STDDEV_POP(A), 6) AS A_std,
               COUNT(A) AS A_count
        FROM cube
        GROUP BY 1, 2, 3
    """,
)
def cube_resample_time_2d(spark, sf_dir):
    """resample_in_time (resampling/temporal.py:17-161) at a 2-day
    frequency with mean/percentile_90/std/count, composed with spatial
    blocking — the epoch-anchored window key is pure column math, so
    the whole thing is one partial-aggregated shuffle."""
    from xcube_spark.operators.temporal import resample_in_time

    blocked = _cube(spark).select(
        "time",
        (F.col("y_i") / 30).cast("int").alias("y_i"),
        (F.col("x_i") / 30).cast("int").alias("x_i"),
        "A",
    )
    out = resample_in_time(
        blocked, "2D", methods=("mean", "percentile_90", "std", "count"),
        var_names=["A"],
    )
    return out.select(
        "time", "y_i", "x_i",
        F.round("A_mean", 6).alias("A_mean"),
        F.round("A_percentile_90", 6).alias("A_percentile_90"),
        F.round("A_std", 6).alias("A_std"),
        "A_count",
    )


@query(
    "cube_mask_geometry_timeseries",
    sql=f"""
        {CUBE_CTE}
        SELECT time,
               ROUND(AVG(CASE WHEN x >= 0 AND y >= 0 AND x + y < 40
                              THEN A END), 6) AS A_mean,
               COUNT(CASE WHEN x >= 0 AND y >= 0 AND x + y < 40
                          THEN A END) AS A_count
        FROM cube
        WHERE x BETWEEN 0 AND 40 AND y BETWEEN 0 AND 40
        GROUP BY time
    """,
)
def cube_mask_geometry_timeseries(spark, sf_dir):
    """mask_dataset_by_geometry (geom.py:284-399) + get_time_series:
    the Spark side masks with the generic ray-casting pandas UDF over a
    triangle polygon; the oracle states the triangle's analytic
    half-plane predicate — cross-engine agreement validates the
    point-in-polygon kernel itself, not just the aggregation."""
    from xcube_spark.operators.geom import mask_dataset_by_geometry
    from xcube_spark.operators.timeseries import get_time_series

    masked = mask_dataset_by_geometry(
        _cube(spark), "POLYGON((0 0, 40 0, 0 40, 0 0))", var_names=["A"]
    )
    ts = get_time_series(masked, ["A"], agg_methods=("mean", "count"))
    return ts.select(
        "time", F.round("A_mean", 6).alias("A_mean"), "A_count"
    )


@query(
    "cube_rasterize_features",
    sql=f"""
        {CUBE_CTE}
        SELECT CASE WHEN x BETWEEN 10 AND 20 AND y BETWEEN 10 AND 20 THEN 2
                    WHEN x >= 0 AND y >= 0 AND x + y < 40 THEN 1
               END AS class_id,
               COUNT(*) AS n_cells,
               ROUND(AVG(A), 6) AS A_mean
        FROM cube
        WHERE t_i = 0
        GROUP BY 1
    """,
)
def cube_rasterize_features(spark, sf_dir):
    """rasterize_features (geom.py:51-236): burn class_id from two
    overlapping features (triangle, then box — later feature wins, the
    reference's sequential-burn order), then aggregate per class."""
    from xcube_spark.operators.geom import rasterize_features

    feats = [
        {"geometry": "POLYGON((0 0, 40 0, 0 40, 0 0))", "class_id": 1},
        {"geometry": (10.0, 10.0, 20.0, 20.0), "class_id": 2},
    ]
    burned = rasterize_features(
        _cube(spark).where(F.col("t_i") == 0), feats, ["class_id"]
    )
    return burned.groupBy("class_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.avg("A"), 6).alias("A_mean"),
    )


_POINTS_SQL = """
    SELECT CAST(range AS BIGINT) AS id,
           to_timestamp({t0} + (range % 8) * 86400.0 + 21600.0)::TIMESTAMP
               AS time,
           (-95.0 + (range * 23 % 190) + 0.5) AS lat,
           (-190.0 + (range * 37 % 380) + 0.5) AS lon
    FROM range(400)
""".format(t0=GRID.t_start.timestamp())


@query(
    "cube_extract_points",
    sql=f"""
        {CUBE_CTE},
        points AS ({_POINTS_SQL}),
        indexed AS (
            SELECT id, time, lat, lon,
                   CASE WHEN lat >= -90 AND lat < 90
                        THEN CAST(FLOOR((lat - (-90.0)) / 1.0) AS INT) END AS y_i,
                   CASE WHEN lon >= -180 AND lon < 180
                        THEN CAST(FLOOR((lon - (-180.0)) / 1.0) AS INT) END AS x_i,
                   CASE WHEN (range % 8) < 5 THEN CAST(range % 8 AS INT) END AS t_i
            FROM (SELECT *, CAST(id AS BIGINT) AS range FROM points)
        )
        SELECT p.id, ROUND(c.A, 6) AS A, c.C AS C
        FROM indexed p LEFT JOIN cube c
          ON p.t_i = c.t_i AND p.y_i = c.y_i AND p.x_i = c.x_i
    """,
)
def cube_extract_points(spark, sf_dir):
    """get_cube_values_for_points (extract.py:30-125): nearest-cell
    gather as a broadcast equi-join on computed indices; out-of-coverage
    points (spatial or temporal) yield NULLs (extract.py:334-338)."""
    pts = spark.range(400).select(
        F.col("id"),
        F.timestamp_seconds(
            F.lit(GRID.t_start.timestamp())
            + (F.col("id") % 8) * 86400.0
            + 21600.0
        ).alias("time"),
        (F.lit(-95.0) + (F.col("id") * 23 % 190) + 0.5).alias("lat"),
        (F.lit(-190.0) + (F.col("id") * 37 % 380) + 0.5).alias("lon"),
    )
    out = get_cube_values_for_points(
        _cube(spark), GRID, pts, var_names=["A", "C"]
    )
    return out.select("id", F.round("A", 6).alias("A"), "C")


@query(
    "cube_label_subset",
    sql=f"""
        {CUBE_CTE},
        masked AS (
            SELECT t_i, y_i, x_i,
                   CASE WHEN t_i = 1 AND x_i < 300 THEN NULL ELSE A END AS A
            FROM cube
        ), keep AS (
            SELECT t_i
            FROM masked
            GROUP BY t_i
            HAVING AVG(CASE WHEN A IS NULL THEN 1.0 ELSE 0.0 END) <= 0.5
        )
        SELECT m.t_i, COUNT(*) AS n, COUNT(m.A) AS n_valid
        FROM masked m JOIN keep USING (t_i)
        GROUP BY m.t_i
    """,
)
def cube_label_subset(spark, sf_dir):
    """select_label_subset (select.py:221-347): drop time slices with
    > 50% NaN — slice t=1 is 5/6 NULL and must disappear; per-slice
    aggregate + broadcast semi join."""
    from xcube_spark.operators.select import select_label_subset

    masked = _cube(spark).select(
        "t_i", "y_i", "x_i",
        F.when((F.col("t_i") == 1) & (F.col("x_i") < 300), None)
        .otherwise(F.col("A")).alias("A"),
    )
    # keep slices where the NULL fraction <= 50%: count valid per slice
    counts = masked.groupBy("t_i").agg(
        (F.avg(F.col("A").isNull().cast("double")) <= 0.5).alias("__ok")
    )
    kept = select_label_subset(
        masked.join(F.broadcast(counts), "t_i"), "t_i",
        F.col("__ok"), keep_if="all",
    )
    return kept.groupBy("t_i").agg(
        F.count(F.lit(1)).alias("n"), F.count("A").alias("n_valid")
    )


@query(
    "cube_timeseries_max_valids",
    sql=f"""
        {CUBE_CTE},
        masked AS (
            SELECT time, CASE WHEN t_i >= 3 THEN NULL ELSE A END AS A
            FROM cube
            WHERE x BETWEEN 10 AND 20 AND y BETWEEN 10 AND 20
        ), series AS (
            SELECT time, ROUND(AVG(A), 6) AS A_mean, COUNT(A) AS A_count
            FROM masked GROUP BY time
        ), newest AS (
            SELECT * FROM series
            WHERE A_count > 0
            ORDER BY time DESC LIMIT 2
        )
        SELECT * FROM newest ORDER BY time
    """,
)
def cube_timeseries_max_valids(spark, sf_dir):
    """The max_valids trimming of the timeseries API
    (webapi/timeseries/controllers.py:268-333): drop all-null steps,
    keep the N newest valid entries scanning backwards, restore
    ascending order — sort+limit (TakeOrderedAndProject), no full sort."""
    from xcube_spark.operators.timeseries import get_time_series

    masked = _cube(spark).where(
        F.col("x").between(10, 20) & F.col("y").between(10, 20)
    ).select(
        "time",
        F.when(F.col("t_i") >= 3, None).otherwise(F.col("A")).alias("A"),
    )
    series = get_time_series(masked, ["A"], agg_methods=("mean", "count")) \
        .select("time", F.round("A_mean", 6).alias("A_mean"), "A_count")
    newest = series.where(F.col("A_count") > 0) \
        .orderBy(F.desc("time")).limit(2)
    return newest.orderBy("time")


@query(
    "cube_timeseries_multi_geom",
    sql=f"""
        {CUBE_CTE},
        geoms AS (
            SELECT * FROM (VALUES
                (0, 10.0, 10.0, 20.0, 20.0),
                (1, -60.0, -30.0, -40.0, -10.0),
                (2, 100.0, 40.0, 140.0, 70.0)
            ) AS g(geom_id, x1, y1, x2, y2)
        )
        SELECT g.geom_id, c.time,
               ROUND(AVG(c.A), 6) AS A_mean,
               COUNT(c.A) AS A_count
        FROM cube c JOIN geoms g
          ON c.x BETWEEN g.x1 AND g.x2 AND c.y BETWEEN g.y1 AND g.y2
        GROUP BY g.geom_id, c.time
    """,
)
def cube_timeseries_multi_geom(spark, sf_dir):
    """The timeseries web API's batch-over-geometries shape
    (webapi/timeseries/controllers.py:32-335): N region series in ONE
    pass — broadcast the geometry table, containment theta-join, single
    groupBy(geom, time) shuffle instead of N separate queries."""
    geoms = spark.createDataFrame(
        [(0, 10.0, 10.0, 20.0, 20.0),
         (1, -60.0, -30.0, -40.0, -10.0),
         (2, 100.0, 40.0, 140.0, 70.0)],
        "geom_id INT, x1 DOUBLE, y1 DOUBLE, x2 DOUBLE, y2 DOUBLE",
    )
    joined = _cube(spark).join(
        F.broadcast(geoms),
        F.col("x").between(F.col("x1"), F.col("x2"))
        & F.col("y").between(F.col("y1"), F.col("y2")),
    )
    return joined.groupBy("geom_id", "time").agg(
        F.round(F.avg("A"), 6).alias("A_mean"),
        F.count("A").alias("A_count"),
    )


@query(
    "events_set_ops",
    sql="""
        WITH heavy AS (
            SELECT DISTINCT user_id FROM events WHERE value > 150
        ), errors AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
        )
        SELECT 'both' AS grp, COUNT(*) AS n
        FROM (SELECT user_id FROM heavy INTERSECT SELECT user_id FROM errors)
        UNION ALL
        SELECT 'heavy_only' AS grp, COUNT(*) AS n
        FROM (SELECT user_id FROM heavy EXCEPT SELECT user_id FROM errors)
    """,
)
def events_set_ops(spark, sf_dir):
    """INTERSECT/EXCEPT (SURVEY §2.12 — absent in the reference, free
    in Spark SQL): high-value users vs error-affected users."""
    from xcube_spark.queries import tbl

    ev = tbl(spark, sf_dir, "events")
    heavy = ev.where(F.col("value") > 150).select("user_id").distinct()
    errors = ev.where(F.col("event_type") == "error") \
        .select("user_id").distinct()
    both = heavy.intersect(errors).agg(F.count(F.lit(1)).alias("n")) \
        .select(F.lit("both").alias("grp"), "n")
    only = heavy.exceptAll(errors).agg(F.count(F.lit(1)).alias("n")) \
        .select(F.lit("heavy_only").alias("grp"), "n")
    return both.unionByName(only)


@query(
    "cube_statistics_expression",
    sql=f"""
        {CUBE_CTE}
        SELECT COUNT(*) AS count,
               ROUND(MIN(A * 2.0 + C), 6) AS minimum,
               ROUND(MAX(A * 2.0 + C), 6) AS maximum,
               ROUND(AVG(A * 2.0 + C), 6) AS mean,
               ROUND(stddev_pop(A * 2.0 + C), 6) AS deviation
        FROM cube
        WHERE x BETWEEN -10.0 AND 30.0 AND y BETWEEN -10.0 AND 30.0
    """,
)
def cube_statistics_expression(spark, sf_dir):
    """compute_statistics over a compiled EXPRESSION x geometry
    (webapi/statistics/controllers.py:30-141): the server's
    var-or-expression surface — the expression compiles to a Column,
    the bbox mask prunes before one aggregate pass."""
    from xcube_spark.operators.statistics import compute_statistics

    stats = compute_statistics(
        _cube(spark),
        "A * 2 + C",
        mask=F.col("x").between(-10.0, 30.0) & F.col("y").between(-10.0, 30.0),
    )
    return stats.select(
        "count",
        F.round("minimum", 6).alias("minimum"),
        F.round("maximum", 6).alias("maximum"),
        F.round("mean", 6).alias("mean"),
        F.round("deviation", 6).alias("deviation"),
    )


@query(
    "cube_extract_irregular",
    sql=f"""
        {CUBE_CTE},
        pts AS (
            SELECT CAST(range AS BIGINT) AS point_id,
                   (-180.0 + ((range * 37) % 360) + 0.5) AS lon,
                   (-90.0 + ((range * 53) % 180) + 0.5) AS lat,
                   to_timestamp(1262304000.0 + ((range % 5) * 86400.0)
                                + 43200.0)::TIMESTAMP AS time
            FROM range(200)
        )
        SELECT p.point_id, ROUND(c.A, 6) AS A
        FROM pts p LEFT JOIN cube c
          ON c.t_i = CAST(FLOOR(((epoch(p.time) - 1262304000.0) / 86400.0)
                                / 1.0) AS INT)
         AND c.y_i = CAST(FLOOR((p.lat - -90.0) / 1.0) AS INT)
         AND c.x_i = CAST(FLOOR((p.lon - -180.0) / 1.0) AS INT)
    """,
)
def cube_extract_irregular(spark, sf_dir):
    """Irregular-axis extraction (extract.py:321-414 bounds-interval
    path): broadcast range joins against the grid's bounds tables.  The
    fixture grid IS regular, so the oracle resolves the same points
    with the closed-form floor() math — the range-join implementation
    must agree with the index arithmetic it generalizes."""
    from xcube_spark.operators.extract import (
        get_cube_values_for_points_irregular,
    )

    pts = spark.range(200).select(
        F.col("id").alias("point_id"),
        (F.lit(-180.0) + (F.col("id") * 37) % 360 + 0.5).alias("lon"),
        (F.lit(-90.0) + (F.col("id") * 53) % 180 + 0.5).alias("lat"),
        F.timestamp_seconds(
            F.lit(1262304000.0) + (F.col("id") % 5) * 86400.0 + 43200.0
        ).alias("time"),
    )
    out = get_cube_values_for_points_irregular(
        _cube(spark), pts, GRID.y_axis(spark), GRID.x_axis(spark),
        GRID.time_axis(spark), var_names=["A"],
    )
    return out.select("point_id", F.round("A", 6).alias("A"))


@query(
    "cube_histogram_stretch",
    sql=f"""
        {CUBE_CTE},
        stats AS (
            SELECT AVG(A) AS mu, stddev_pop(A) AS sigma FROM cube
        ), rng AS (
            SELECT mu - 2 * sigma AS lo, mu + 2 * sigma AS hi FROM stats
        )
        SELECT CAST(LEAST(FLOOR((A - lo) / ((hi - lo) / 20.0)), 19) AS INT)
                   AS bucket,
               COUNT(*) AS n
        FROM cube, rng
        WHERE A >= lo AND A <= hi
        GROUP BY 1
    """,
)
def cube_histogram_stretch(spark, sf_dir):
    """Color-mapping histogram + 2-sigma stretch (tile.py:540-608): the
    stretch range rides along as a broadcast one-row crossJoin (the
    scalar-subquery shape), so stretch + histogram is ONE Spark action —
    no driver round-trip between the stats pass and the bucket agg."""
    from xcube_spark.operators.statistics import with_stretch_range

    ranged = with_stretch_range(_cube(spark), "A", "2sigma")
    width = (F.col("hi") - F.col("lo")) / 20.0
    bucket = F.least(F.floor((F.col("A") - F.col("lo")) / width),
                     F.lit(19)).cast("int")
    return (
        ranged.where((F.col("A") >= F.col("lo")) & (F.col("A") <= F.col("hi")))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


from xcube_spark.operators.focal import focal_mean, focal_mean_sql  # noqa: E402


@query(
    "cube_focal_mean",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i, y_i, x_i,
               ROUND(ROUND(A_focal + 1e-9, 6) + 0.0, 6) AS A_focal
        FROM ({focal_mean_sql("A", time_col="t_i", y_col="y_i",
                              x_col="x_i")})
        WHERE x_i < 40 AND y_i < 40
    """,
)
def cube_focal_mean(spark, sf_dir):
    """focal_mean (operators/focal.py): 3x3 neighborhood mean of A —
    classic map-algebra smoothing, run as TWO separable 1-D window
    passes (x then y) instead of a 9x explode + re-aggregate: two
    exchanges the size of the grid, zero row fan-out.  Each 3-term
    sum is unrolled lag/current/lead in a fixed left-associated shape
    (bit-identical cross-engine); neighbor counts are exact integers;
    boundary cells use the shrinking-kernel rule.  Output subset to a
    40x40 index band AFTER the kernel so edge rows stay covered."""
    out = focal_mean(_cube(spark), "A", time_col="t_i",
                     y_col="y_i", x_col="x_i")
    return (
        out.where((F.col("x_i") < 40) & (F.col("y_i") < 40))
        .select(
            "t_i", "y_i", "x_i",
            F.round(F.round(F.col("A_focal") + 1e-9, 6) + 0.0, 6)
            .alias("A_focal"))
    )


from xcube_spark.operators.focal import hillshade, hillshade_sql  # noqa: E402


@query(
    "cube_hillshade",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i, y_i, x_i,
               ROUND(ROUND(A_hillshade + 1e-6, 4) + 0.0, 4)
                   AS A_hillshade
        FROM ({hillshade_sql("A", time_col="t_i", y_col="y_i",
                             x_col="x_i", z_factor=20.0)})
        WHERE x_i < 40 AND y_i < 40
    """,
)
def cube_hillshade(spark, sf_dir):
    """hillshade (operators/focal.py): Horn slope/aspect shading with
    the standard 315/45 sun — the terrain-derivative raster op, built
    as TWO chained 1-D window passes (the separable-stencil trick:
    lag/lead over x, then lag/lead of those over y) — two exchanges,
    no 9x explode, no join.  Sun angles are module-constant doubles
    shared by both engines; per-row trig differs by at most an ulp or
    two, absorbed by the 1e-6-nudged 4-decimal round.  Interior cells
    only; z_factor exaggerates the fixture's gentle field so shading
    spans the full range."""
    out = hillshade(_cube(spark), "A", time_col="t_i",
                    y_col="y_i", x_col="x_i", z_factor=20.0)
    return (
        out.where((F.col("x_i") < 40) & (F.col("y_i") < 40)
                  & F.col("A_hillshade").isNotNull())
        .select(
            "t_i", "y_i", "x_i",
            F.round(F.round(F.col("A_hillshade") + 1e-6, 4) + 0.0, 4)
            .alias("A_hillshade"))
    )


from xcube_spark.operators.focal import slope_aspect, slope_aspect_sql  # noqa: E402

_ASPECT_CLS_SQL = (
    "CASE WHEN aspect_deg = -1.0 THEN 'FLAT' "
    + " ".join(
        f"WHEN CAST(floor(((aspect_deg + 22.5) % 360.0) / 45.0) AS INT)"
        f" = {i} THEN '{c}'"
        for i, c in enumerate(
            ("N", "NE", "E", "SE", "S", "SW", "W", "NW")))
    + " END")


@query(
    "cube_slope_aspect",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i, y_i, x_i, slope_deg, aspect_deg,
               {_ASPECT_CLS_SQL} AS aspect_class
        FROM (
            SELECT t_i, y_i, x_i,
                   ROUND(ROUND(A_slope_deg + 1e-6, 4) + 0.0, 4)
                       AS slope_deg,
                   ROUND(ROUND(A_aspect_deg + 1e-6, 4) + 0.0, 4)
                       AS aspect_deg
            FROM ({slope_aspect_sql("A", time_col="t_i", y_col="y_i",
                                    x_col="x_i", z_factor=20.0)})
            WHERE x_i < 40 AND y_i < 40
        )
    """,
)
def cube_slope_aspect(spark, sf_dir):
    """slope_aspect (operators/focal.py): Horn slope and compass
    aspect — the raw terrain derivatives under cube_hillshade,
    emitted as degrees plus the 8-way sector class (N/NE/.../FLAT).
    Same separable 3x3 stencil (two 1-D window passes, two exchanges,
    no explode); the branch-free compass form
    ((90 - deg) % 360 + 360) % 360 avoids cross-engine branch
    boundaries, exact-zero gradients (integer-exact both engines)
    classify FLAT, and the sector class derives from the
    NUDGE-ROUNDED aspect so both engines bucket identically."""
    from xcube_spark.operators.focal import ASPECT_CLASSES

    out = slope_aspect(_cube(spark), "A", time_col="t_i",
                       y_col="y_i", x_col="x_i", z_factor=20.0)
    r4 = lambda c: F.round(F.round(c + 1e-6, 4) + 0.0, 4)  # noqa: E731
    out = (
        out.where((F.col("x_i") < 40) & (F.col("y_i") < 40)
                  & F.col("A_slope_deg").isNotNull())
        .select("t_i", "y_i", "x_i",
                r4(F.col("A_slope_deg")).alias("slope_deg"),
                r4(F.col("A_aspect_deg")).alias("aspect_deg"))
    )
    idx = F.floor(((F.col("aspect_deg") + F.lit(22.5)) % F.lit(360.0))
                  / F.lit(45.0)).cast("int")
    cls = F.lit(None).cast("string")
    for i, c in enumerate(ASPECT_CLASSES):
        cls = F.when(idx == i, F.lit(c)).otherwise(cls) \
            if i else F.when(idx == 0, F.lit(c)).otherwise(cls)
    cls = F.when(F.col("aspect_deg") == -1.0, F.lit("FLAT")) \
        .otherwise(cls)
    return out.withColumn("aspect_class", cls)


from xcube_spark.operators.focal import distance_transform, distance_transform_sql  # noqa: E402


@query(
    "cube_distance_transform",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i, y_i, x_i, dist
        FROM ({distance_transform_sql("A > 12.0", time_col="t_i",
                                      y_col="y_i", x_col="x_i")})
        WHERE x_i < 60 AND y_i < 60
    """,
)
def cube_distance_transform(spark, sf_dir):
    """distance_transform (operators/focal.py): Manhattan distance to
    the nearest cell with A > 12 — the EO masking derivative
    (distance-to-cloud / distance-to-coast buffers).  The L1
    transform is separable and each 1-D pass is a min-plus
    convolution that windows express EXACTLY (ascending + descending
    running mins over one sort): two exchanges for the whole grid, no
    explode, no join, and with costs 0/2^40 ALL arithmetic is exact
    BIGINT — integer-identical across engines, no float boundary
    anywhere.  Output subset to a 60x60 index band AFTER the
    transform so distances see the full grid."""
    out = distance_transform(
        _cube(spark), F.col("A") > 12.0,
        time_col="t_i", y_col="y_i", x_col="x_i")
    return (
        out.where((F.col("x_i") < 60) & (F.col("y_i") < 60))
        .select("t_i", "y_i", "x_i", "dist")
    )


from xcube_spark.operators.focal import integral_image, integral_image_sql  # noqa: E402


@query(
    "cube_integral_image",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i, y_i, x_i,
               ROUND(ROUND(A_integral + 1e-6, 4) + 0.0, 4)
                   AS A_integral
        FROM ({integral_image_sql("A", time_col="t_i", y_col="y_i",
                                  x_col="x_i")})
        WHERE x_i < 40 AND y_i < 40
    """,
)
def cube_integral_image(spark, sf_dir):
    """integral_image (operators/focal.py): summed-area table — after
    one preprocessing pass any axis-aligned box sum is four lookups,
    the standard trick behind multi-scale box filters / ROI stats at
    scale.  Two separable cumulative window passes (running sum over
    x, then over y): two exchanges, no fan-out; running sums
    accumulate in the same coordinate order on both engines so the
    nudged 4-decimal round absorbs sub-ulp noise.  Output subset to a
    40x40 index band (prefix sums there cover rows/cols 0..39)."""
    out = integral_image(_cube(spark), "A", time_col="t_i",
                         y_col="y_i", x_col="x_i")
    return (
        out.where((F.col("x_i") < 40) & (F.col("y_i") < 40))
        .select(
            "t_i", "y_i", "x_i",
            F.round(F.round(F.col("A_integral") + 1e-6, 4) + 0.0, 4)
            .alias("A_integral"))
    )


# ---- round-11 additions: pytest-only §2 rows promoted to gates ---------

from xcube_spark.queries import tbl  # noqa: E402


@query(
    "cube_nearest_label",
    sql=f"""
        {CUBE_CTE},
        tgt AS (
            SELECT y FROM (SELECT DISTINCT y FROM cube)
            ORDER BY abs(y - 33.3), y LIMIT 1
        )
        SELECT t_i, COUNT(*) AS n,
               ROUND(ROUND(AVG(A) + 1e-9, 6) + 0.0, 6) AS a_mean
        FROM cube JOIN tgt USING (y)
        GROUP BY t_i
    """,
)
def cube_nearest_label(spark, sf_dir):
    """select_nearest_label (operators/select.py): slice at the label
    nearest to a value along a dim — sel(method="nearest")
    (reference core/select.py via timeseries.py:148).  The nearest
    label (33.5 for target 33.3 on the 0.5-centered grid) resolves
    with a tiny distinct + TakeOrderedAndProject at plan build, then
    the slice filter pushes down; the oracle re-derives it with the
    same abs-distance order.  Output: per-time count + nudge-rounded
    mean over the selected zonal slice."""
    from xcube_spark.operators.select import select_nearest_label

    sel = select_nearest_label(_cube(spark), "y", 33.3)
    return sel.groupBy("t_i").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.round(F.avg("A") + F.lit(1e-9), 6) + F.lit(0.0), 6)
        .alias("a_mean"))


@query(
    "cube_clip_geometry",
    sql=f"""
        {CUBE_CTE}
        SELECT t_i, COUNT(*) AS n,
               ROUND(ROUND(AVG(A) + 1e-9, 6) + 0.0, 6) AS a_mean,
               MIN(x_i) AS x_min, MAX(x_i) AS x_max,
               MIN(y_i) AS y_min, MAX(y_i) AS y_max
        FROM cube
        WHERE x BETWEEN 10.25 AND 30.25 AND y BETWEEN 20.25 AND 40.25
        GROUP BY t_i
    """,
)
def cube_clip_geometry(spark, sf_dir):
    """clip_dataset_by_geometry (operators/geom.py; reference
    core/geom.py:445-529): crop to a WKT polygon's bbox — a pure
    pushdown-eligible predicate (the bbox is a plan constant derived
    from the parsed geometry).  Bbox bounds sit at .25 offsets so no
    cell center lands on the boundary; the oracle applies the same
    closed interval.  Output: per-time count, mean, and the index
    extent of the cropped window."""
    from xcube_spark.operators.geom import clip_dataset_by_geometry

    wkt = ("POLYGON ((10.25 20.25, 30.25 20.25, 30.25 40.25, "
           "10.25 40.25, 10.25 20.25))")
    out = clip_dataset_by_geometry(_cube(spark), wkt)
    return out.groupBy("t_i").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.round(F.avg("A") + F.lit(1e-9), 6) + F.lit(0.0), 6)
        .alias("a_mean"),
        F.min("x_i").alias("x_min"), F.max("x_i").alias("x_max"),
        F.min("y_i").alias("y_min"), F.max("y_i").alias("y_max"))


@query(
    "cube_zonal_to_grid",
    sql=f"""
        {CUBE_CTE},
        zonal AS (
            SELECT t_i, y_i, ROUND(A + 1e-9, 6) AS zm
            FROM cube WHERE x_i = 0 AND y_i < 4
        )
        SELECT z.t_i, z.y_i, CAST(u.i AS INT) AS x_i,
               ROUND(ROUND(z.zm, 6) + 0.0, 6) AS zm
        FROM zonal z, unnest(range(360)) AS u(i)
    """,
)
def cube_zonal_to_grid(spark, sf_dir):
    """normalize_zonal_to_grid (operators/maintenance.py; reference
    core/normalize.py:236 _normalize_zonal_lat_lon): a latitude-only
    zonal dataset broadcasts each value across the full longitude
    axis — a narrow W-times fan-out via crossJoin with the tiny
    broadcast x-axis, no shuffle of the zonal data.  The zonal input
    is the x_i = 0 column of the fixture (exact values, no float
    reduction); output is the 4-latitude x 360-longitude grid,
    row-level."""
    from xcube_spark.operators.maintenance import normalize_zonal_to_grid

    zonal = (
        _cube(spark)
        .where((F.col("x_i") == 0) & (F.col("y_i") < 4))
        .select("t_i", "y_i", "time", "y",
                F.round(F.col("A") + F.lit(1e-9), 6).alias("zm")))
    out, _ = normalize_zonal_to_grid(zonal, GRID)
    return out.select(
        "t_i", "y_i", "x_i",
        F.round(F.round(F.col("zm"), 6) + F.lit(0.0), 6).alias("zm"))


@query(
    "cube_find_places",
    sql="""
        WITH feats AS (
            SELECT event_id,
                   CAST(event_id % 360 AS INT) - 180 AS ix,
                   CAST(user_id % 180 AS INT) - 90 AS iy,
                   value
            FROM events
        )
        SELECT event_id, ix, iy FROM feats
        WHERE value > 100.0
          AND ix > -49.5 AND ix < 40.5 AND iy > -19.5 AND iy < 30.5
    """,
)
def cube_find_places(spark, sf_dir):
    """find_places (operators/geom.py; reference
    webapi/places/controllers.py:25-108): filter a WKT-geometry
    feature table by intersection with a query polygon AND an
    attribute expression.  Features are POINT WKTs synthesized from
    integer event coordinates; the query rectangle's .5-offset edges
    guarantee no point sits on a boundary, so the vectorized
    point-in-polygon UDF and the oracle's coordinate comparison agree
    exactly.  The attribute filter runs through the safe expression
    compiler (functions/expression.py)."""
    from xcube_spark.operators.geom import find_places

    ev = tbl(spark, sf_dir, "events")
    feats = ev.select(
        "event_id",
        ((F.col("event_id") % 360).cast("int") - 180).alias("ix"),
        ((F.col("user_id") % 180).cast("int") - 90).alias("iy"),
        "value",
    ).withColumn(
        "geometry",
        F.concat(F.lit("POINT ("), F.col("ix").cast("string"),
                 F.lit(" "), F.col("iy").cast("string"), F.lit(")")))
    rect = ("POLYGON ((-49.5 -19.5, 40.5 -19.5, 40.5 30.5, "
            "-49.5 30.5, -49.5 -19.5))")
    out = find_places(feats, query_geometry=rect,
                      query_expr="value > 100.0")
    return out.select("event_id", "ix", "iy")


# --------------------------------------------------------------------------
# round-12 promotion: genpts (deterministic hash mode)

_GP_T0 = GRID.t_start.timestamp()
_GP_SPAN = GRID.time_periods * GRID.t_freq_days * 86400.0
_GP_FRAC = 0.1
_GP_PAD_X = (GRID.x_end - GRID.x_start) * _GP_FRAC
_GP_PAD_Y = (GRID.y_end - GRID.y_start) * _GP_FRAC

#: hash-mode uniform for salt k: ((id + k) * 2654435761 % 2^32) / 2^32
#: — pure int64 arithmetic and a power-of-two divisor, exact dyadic
#: doubles on both engines
_GP_U = ("((range + {salt}) * 2654435761) % 4294967296"
         " / CAST(4294967296 AS DOUBLE)")


@query(
    "cube_genpts",
    sql=f"""
        SELECT range AS point_id,
               CAST(FLOOR(CAST({_GP_T0!r} AS DOUBLE)
                    + {_GP_U.format(salt=42)}
                      * CAST({_GP_SPAN * (1 + _GP_FRAC)!r} AS DOUBLE))
                    AS BIGINT) AS t_s,
               ROUND(ROUND(
                   CAST({GRID.y_start - _GP_PAD_Y!r} AS DOUBLE)
                   + {_GP_U.format(salt=43)}
                     * CAST({GRID.y_end - GRID.y_start
                             + 2 * _GP_PAD_Y!r} AS DOUBLE)
                   + 1e-9, 6) + 0.0, 6) AS lat,
               ROUND(ROUND(
                   CAST({GRID.x_start - _GP_PAD_X!r} AS DOUBLE)
                   + {_GP_U.format(salt=44)}
                     * CAST({GRID.x_end - GRID.x_start
                             + 2 * _GP_PAD_X!r} AS DOUBLE)
                   + 1e-9, 6) + 0.0, 6) AS lon
        FROM range(500)
    """,
)
def cube_genpts(spark, sf_dir):
    """gen_points / xcube genpts (cube/new.py:157; reference
    cli/genpts.py:28-88) in the oracle-stateable hash mode: 500
    seeded-uniform points over the grid bbox padded by frac_outside =
    0.1 (so ~17%% fall off-grid, the reference's out-of-range fixture
    knob).  Time compares as FLOOR of the epoch seconds — engines
    disagree on sub-second micros conversion (Spark truncates,
    DuckDB rounds) but the whole-second floor of the identical double
    is seam-free."""
    from xcube_spark.cube.new import gen_points

    pts = gen_points(spark, GRID, 500, seed=42,
                     frac_outside=_GP_FRAC, method="hash")
    return pts.select(
        "point_id",
        F.floor(F.col("time").cast("double")).cast("long").alias("t_s"),
        (F.round(F.round(F.col("lat") + 1e-9, 6) + 0.0, 6)).alias("lat"),
        (F.round(F.round(F.col("lon") + 1e-9, 6) + 0.0, 6)).alias("lon"),
    )
