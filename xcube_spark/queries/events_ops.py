"""Aggregation-operator coverage on the driver's ``events`` table.

Each query is the relational face of a SURVEY §2.5 operator applied to
the events stream table (event-time ``ts``, value ``value``): time
series extraction, temporal resampling (down + up), statistics with
histogram, sessionization (the batch shape of the streaming session
window), and distinct/dedup.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xcube_spark.queries import query, tbl

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "events_timeseries_daily",
    sql="""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS time,
               ROUND(AVG(value), 6) AS value_mean,
               ROUND(MEDIAN(value), 6) AS value_median,
               ROUND(STDDEV_POP(value), 6) AS value_std,
               ROUND(MIN(value), 6) AS value_min,
               ROUND(MAX(value), 6) AS value_max,
               COUNT(value) AS value_count
        FROM events
        GROUP BY 1
    """,
)
def events_timeseries_daily(spark, sf_dir):
    """get_time_series (timeseries.py:50-205) on events: one hash-agg
    shuffle keyed by day; exact distributed median via percentile."""
    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("time")).agg(
        F.round(F.avg("value"), 6).alias("value_mean"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("value_median"),
        F.round(F.stddev_pop("value"), 6).alias("value_std"),
        F.round(F.min("value"), 6).alias("value_min"),
        F.round(F.max("value"), 6).alias("value_max"),
        F.count("value").alias("value_count"),
    )


@query(
    "events_resample_weekly",
    sql="""
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS time,
               ROUND(SUM(value), 4) AS value_sum,
               ROUND(AVG(value), 6) AS value_mean,
               ROUND(arg_min(value, event_id), 6) AS value_first,
               ROUND(arg_max(value, event_id), 6) AS value_last,
               COUNT(*) AS value_count
        FROM events
        GROUP BY 1
    """,
)
def events_resample_weekly(spark, sf_dir):
    """resample_in_time downsampling (resampling/temporal.py:17-161) to
    weekly frequency with methods sum/mean/first/last/count; first/last
    are order-aware -> min_by/max_by on the unique append key."""
    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("week", "ts").alias("time")).agg(
        F.round(F.sum("value"), 4).alias("value_sum"),
        F.round(F.avg("value"), 6).alias("value_mean"),
        F.round(F.min_by("value", "event_id"), 6).alias("value_first"),
        F.round(F.max_by("value", "event_id"), 6).alias("value_last"),
        F.count(F.lit(1)).alias("value_count"),
    )


@query(
    "events_statistics",
    sql="""
        SELECT event_type,
               COUNT(value) AS count,
               ROUND(MIN(value), 6) AS minimum,
               ROUND(MAX(value), 6) AS maximum,
               ROUND(AVG(value), 6) AS mean,
               ROUND(STDDEV_POP(value), 6) AS deviation
        FROM events
        GROUP BY event_type
    """,
)
def events_statistics(spark, sf_dir):
    """compute_statistics (webapi/statistics/controllers.py:30-141):
    count/min/max/mean/deviation per group."""
    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("value").alias("count"),
        F.round(F.min("value"), 6).alias("minimum"),
        F.round(F.max("value"), 6).alias("maximum"),
        F.round(F.avg("value"), 6).alias("mean"),
        F.round(F.stddev_pop("value"), 6).alias("deviation"),
    )


@query(
    "events_histogram",
    sql="""
        WITH rng AS (
            SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
        )
        SELECT LEAST(CAST(FLOOR((value - lo) / (hi - lo) * 100) AS INT), 99)
                   AS bucket,
               COUNT(*) AS frequency
        FROM events, rng
        GROUP BY 1
    """,
)
def events_histogram(spark, sf_dir):
    """The statistics API's 100-bin density histogram
    (webapi/statistics/controllers.py:100-141).  The global [lo, hi]
    range is a scalar agg broadcast into the bucketing expression —
    two scans, no wide shuffle (bucket cardinality <= 100)."""
    ev = tbl(spark, sf_dir, "events")
    rng = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bucket = F.least(
        F.floor((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 100)
        .cast("int"),
        F.lit(99),
    )
    return (
        ev.crossJoin(F.broadcast(rng))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("frequency"))
    )


@query(
    "events_sessionization",
    sql="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts, value,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS session_value,
               CAST(MIN(ts) AS TIMESTAMP) AS session_start
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark, sf_dir):
    """Batch sessionization with a 30-min inactivity gap — the batch
    twin of the streaming session window (SURVEY §2.14).  One shuffle on
    user_id serves both window functions and the final aggregate."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                # ts may arrive as TIMESTAMP_NTZ (micros parquet) or
                # TIMESTAMP (nanos-as-long normalization); NTZ has no
                # direct long cast, so hop via ltz — lossless under the
                # session's UTC timezone
                F.col("ts").cast("timestamp_ltz").cast("long")
                - F.lag("ts").over(w).cast("timestamp_ltz").cast("long")
                > 30 * 60
            ),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
        F.min("ts").alias("session_start"),
    )


@query(
    "events_dedup_latest",
    sql="""
        SELECT user_id, event_type,
               arg_max(value, event_id) AS value,
               CAST(arg_max(ts, event_id) AS TIMESTAMP) AS ts
        FROM events
        GROUP BY user_id, event_type
    """,
)
def events_dedup_latest(spark, sf_dir):
    """Keyed dedup keeping the latest record (streaming dropDuplicates
    analog, SURVEY §2.12 'Distinct'): one hash-agg, no window sort."""
    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.max_by("value", "event_id").alias("value"),
        F.max_by("ts", "event_id").alias("ts"),
    )


@query(
    "events_pivot_vars",
    sql="""
        SELECT user_id,
               ROUND(COALESCE(SUM(value) FILTER (event_type = 'click'), 0), 4) AS click,
               ROUND(COALESCE(SUM(value) FILTER (event_type = 'error'), 0), 4) AS error,
               ROUND(COALESCE(SUM(value) FILTER (event_type = 'purchase'), 0), 4) AS purchase,
               ROUND(COALESCE(SUM(value) FILTER (event_type = 'signup'), 0), 4) AS signup,
               ROUND(COALESCE(SUM(value) FILTER (event_type = 'view'), 0), 4) AS view
        FROM events
        GROUP BY user_id
    """,
)
def events_pivot_vars(spark, sf_dir):
    """vars_to_dim inverse (vars2dim.py:10-46): pivot the 'var' dim back
    into one column per variable.  Explicit pivot values -> single-pass
    pivot, no extra distinct job."""
    ev = tbl(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 4))
    )
    for t in _EVENT_TYPES:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0.0)))
    return out


@query(
    "events_upsample_ffill",
    sql="""
        WITH bounds AS (
            SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
                   CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
            FROM events
        ), grid AS (
            SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS time
            FROM bounds
        ), hourly AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS time,
                   -- 1e-9 nudge: moves the 6-decimal rounding boundary
                   -- off 1-ulp cross-engine summation differences
                   ROUND(AVG(value) + 1e-9, 6) AS value_mean
            FROM events GROUP BY 1
        )
        SELECT g.time,
               last_value(h.value_mean IGNORE NULLS)
                   OVER (ORDER BY g.time ROWS UNBOUNDED PRECEDING) AS value_ffill
        FROM grid g LEFT JOIN hourly h ON g.time = h.time
    """,
)
def events_upsample_ffill(spark, sf_dir):
    """resample_in_time upsampling with forward-fill (cli/resample.py:18-32
    'ffill'): dense time grid left-joined to sparse aggregates, gaps
    filled by last non-null over an ordered window.  The grid is tiny
    (one row per hour) so the join broadcasts."""
    ev = tbl(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("time")
    )
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("time")).agg(
        F.round(F.avg("value") + F.lit(1e-9), 6).alias("value_mean")
    )
    w = Window.orderBy("time").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(hourly, on="time", how="left")
        .withColumn("value_ffill", F.last("value_mean", ignorenulls=True).over(w))
        .select("time", "value_ffill")
    )


@query(
    "events_upsample_interp",
    sql="""
        WITH bounds AS (
            SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
                   CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
            FROM events
        ), grid AS (
            SELECT UNNEST(generate_series(lo, hi, INTERVAL 30 MINUTE))
                AS time
            FROM bounds
        ), hourly AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS time,
                   -- 1e-9 nudge: see events_upsample_ffill
                   ROUND(AVG(value) + 1e-9, 6) AS v
            FROM events GROUP BY 1
        ), joined AS (
            SELECT g.time, h.v,
                   last_value(h.v IGNORE NULLS) OVER wp AS pv,
                   first_value(h.v IGNORE NULLS) OVER wn AS nv,
                   last_value(CASE WHEN h.v IS NOT NULL THEN g.time END
                              IGNORE NULLS) OVER wp AS pt,
                   first_value(CASE WHEN h.v IS NOT NULL THEN g.time END
                               IGNORE NULLS) OVER wn AS nt
            FROM grid g LEFT JOIN hourly h ON g.time = h.time
            WINDOW wp AS (ORDER BY g.time ROWS UNBOUNDED PRECEDING),
                   wn AS (ORDER BY g.time
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT time,
               ROUND(CASE WHEN v IS NOT NULL THEN v
                          WHEN pt IS NULL THEN nv
                          WHEN nt IS NULL THEN pv
                          ELSE pv + (nv - pv)
                               * (epoch(time) - epoch(pt))
                               / (epoch(nt) - epoch(pt))
                     END + 1e-9, 4) AS value_interp
        FROM joined
    """,
)
def events_upsample_interp(spark, sf_dir):
    """resample_in_time upsampling with linear interpolation
    (cli/resample.py:18-32 'interpolate'): a 30-minute dense grid over
    hourly means; gap values blend the previous/next valid samples by
    time fraction — two ordered windows, no self-join."""
    from xcube_spark.operators.temporal import upsample_in_time

    ev = tbl(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("time")).agg(
        F.round(F.avg("value") + F.lit(1e-9), 6).alias("v")
    )
    out = upsample_in_time(hourly, "30min", method="interpolate")
    # 4 decimals with a 1e-9 nudge: half-gap midpoints of 6-decimal
    # inputs land exactly on .00005 half boundaries where the engines'
    # rounding of the *same* double can disagree; the nudge moves the
    # boundary away from those cluster points on both sides
    return out.select(
        "time", F.round(F.col("v") + F.lit(1e-9), 4).alias("value_interp")
    )


@query(
    "events_upsample_bfill_nearest",
    sql="""
        WITH bounds AS (
            SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
                   CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
            FROM events
        ), grid AS (
            SELECT UNNEST(generate_series(lo, hi, INTERVAL 30 MINUTE))
                AS time
            FROM bounds
        ), hourly AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS time,
                   -- 1e-9 nudge: see events_upsample_ffill
                   ROUND(AVG(value) + 1e-9, 6) AS v
            FROM events GROUP BY 1
        ), joined AS (
            SELECT g.time, h.v,
                   last_value(h.v IGNORE NULLS) OVER wp AS pv,
                   first_value(h.v IGNORE NULLS) OVER wn AS nv,
                   last_value(CASE WHEN h.v IS NOT NULL THEN g.time END
                              IGNORE NULLS) OVER wp AS pt,
                   first_value(CASE WHEN h.v IS NOT NULL THEN g.time END
                               IGNORE NULLS) OVER wn AS nt
            FROM grid g LEFT JOIN hourly h ON g.time = h.time
            WINDOW wp AS (ORDER BY g.time ROWS UNBOUNDED PRECEDING),
                   wn AS (ORDER BY g.time
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT time,
               nv AS value_bfill,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN nt IS NULL THEN pv
                    WHEN pt IS NOT NULL
                         AND (epoch(time) - epoch(pt))
                             <= (epoch(nt) - epoch(time)) THEN pv
                    ELSE nv
               END AS value_nearest
        FROM joined
    """,
)
def events_upsample_bfill_nearest(spark, sf_dir):
    """resample_in_time upsampling, bfill + nearest methods
    (cli/resample.py:18-32): backward fill takes the next valid sample,
    nearest picks the time-closer of the neighbors (ties -> previous,
    matching the reference's left-biased rule)."""
    from xcube_spark.operators.temporal import upsample_in_time

    ev = tbl(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("time")).agg(
        F.round(F.avg("value") + F.lit(1e-9), 6).alias("v")
    )
    bf = upsample_in_time(hourly, "30min", method="bfill") \
        .withColumnRenamed("v", "value_bfill")
    nr = upsample_in_time(hourly, "30min", method="nearest") \
        .withColumnRenamed("v", "value_nearest")
    return bf.join(nr, "time")


@query(
    "events_grouping_sets",
    sql="""
        SELECT COALESCE(event_type, '<all>') AS event_type,
               COALESCE(CAST(CAST(date_trunc('day', ts) AS TIMESTAMP)
                             AS VARCHAR), '<all>') AS day,
               COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY GROUPING SETS ((event_type, date_trunc('day', ts)),
                                (event_type), ())
    """,
)
def events_grouping_sets(spark, sf_dir):
    """GROUPING SETS rollup — absent in the reference (SURVEY §2.5:
    'come free in Spark when we expose SQL'): per (type, day), per type,
    and grand-total aggregates with exact distinct users in one pass."""
    ev = tbl(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__events_gs")
    return spark.sql("""
        SELECT COALESCE(event_type, '<all>') AS event_type,
               COALESCE(CAST(date_trunc('day', ts) AS STRING), '<all>')
                   AS day,
               COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users
        FROM __events_gs
        GROUP BY GROUPING SETS ((event_type, date_trunc('day', ts)),
                                (event_type), ())
    """)


@query(
    "events_asof_value",
    sql="""
        WITH l AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'click'
        ), r AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT l.event_id, l.user_id, l.ts,
               ROUND(l.value, 6) AS value,
               r.ts AS ts_right,
               r.event_id AS event_id_right,
               ROUND(r.value, 6) AS value_right
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def events_asof_value(spark, sf_dir):
    """asof_join (operators/asof.py): every click gets the latest
    at-or-before purchase of the same user — the point-in-time lookup
    of feature-store pipelines.  Spark runs the union-window form (one
    shuffle, no candidate pairs); the oracle is DuckDB's NATIVE
    ``ASOF LEFT JOIN``, a fully independent restatement of the
    semantics.

    Tie semantics pinned by the test: DuckDB ASOF uses l.ts >= r.ts
    (inclusive), matched by ordering right rows before left rows at
    equal timestamps."""
    from xcube_spark.operators.asof import asof_join

    ev = tbl(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(clicks, purchases, on="ts", by=["user_id"])
    return out.select(
        "event_id", "user_id", "ts",
        F.round("value", 6).alias("value"),
        "ts_right", "event_id_right",
        F.round("value_right", 6).alias("value_right"),
    )


@query(
    "events_rolling_1h",
    sql="""
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               ROUND(AVG(value) OVER w, 6) AS value_mean_1h,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
    """,
)
def events_rolling_1h(spark, sf_dir):
    """Rolling event-time aggregate: per user, the mean/count over the
    trailing hour at every event — the feature-engineering window shape
    ('activity in the last N minutes').  One shuffle on user_id; the
    RANGE frame is a per-partition sorted scan with an O(1) sliding
    accumulator in both engines."""
    ev = tbl(spark, sf_dir, "events")
    # order by epoch MICROseconds: the driver's timestamps carry
    # sub-second precision, and DuckDB's RANGE INTERVAL frame compares
    # at full precision — a seconds-truncated ordering key silently
    # shifts events sitting within 1s of the trailing-hour boundary
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp_ltz")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id", "ts",
        F.round(F.avg("value").over(w), 6).alias("value_mean_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@query(
    "events_stratified_sample",
    sql="""
        SELECT event_id, event_type, sample_rank
        FROM (
            SELECT event_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
                       AS sample_rank
            FROM events
        )
        WHERE sample_rank <= 100
    """,
)
def events_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: exactly 100 rows per stratum,
    chosen by ranking on a hash of the id (pseudo-random but
    reproducible and engine-portable — no RNG, re-runs and oracles
    agree).  One shuffle on the stratum key; for corpus-scale strata
    the rank window is the standard top-k-per-group shape with
    partial top-k pushdown (WindowGroupLimit)."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.select("event_id", "event_type",
                  F.row_number().over(w).alias("sample_rank"))
        .where(F.col("sample_rank") <= 100)
    )


@query(
    "events_funnel",
    sql="""
        WITH stages AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CASE WHEN t_signup IS NULL THEN 0
                    WHEN t_click IS NULL OR t_click < t_signup THEN 1
                    WHEN t_purchase IS NULL OR t_purchase < t_click THEN 2
                    ELSE 3 END AS funnel_stage
        FROM stages
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered funnel analysis (signup -> click -> purchase): how far
    each user progresses through the sequence IN ORDER, from the
    first-occurrence timestamp of each step.  One conditional-min
    aggregation on user_id (map-side combinable) + a pure projection —
    the standard one-shuffle funnel shape at any scale."""
    ev = tbl(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(*[
        F.min(F.when(F.col("event_type") == s, F.col("ts")))
        .alias(f"t_{s}")
        for s in ("signup", "click", "purchase")
    ])
    stage = (
        F.when(F.col("t_signup").isNull(), 0)
        .when(F.col("t_click").isNull()
              | (F.col("t_click") < F.col("t_signup")), 1)
        .when(F.col("t_purchase").isNull()
              | (F.col("t_purchase") < F.col("t_click")), 2)
        .otherwise(3)
    )
    return stages.select("user_id", stage.alias("funnel_stage"))


@query(
    "events_cohort_retention",
    sql="""
        WITH firsts AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS TIMESTAMP)
                       AS cohort_week
            FROM events GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT e.user_id, f.cohort_week,
                   CAST(floor(date_diff('day', f.cohort_week,
                                        CAST(date_trunc('week', e.ts)
                                             AS TIMESTAMP)) / 7.0)
                        AS INT) AS week_offset
            FROM events e JOIN firsts f USING (user_id)
        )
        SELECT cohort_week, week_offset,
               COUNT(*) AS n_active_users
        FROM activity GROUP BY cohort_week, week_offset
    """,
)
def events_cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-activity week, counted
    per week-offset of subsequent activity — the product-analytics
    staple.  Two shuffles (first-event agg on user_id; the final
    cohort x offset agg is tiny); the distinct dedupes multiple events
    in the same (user, week) to one activity row."""
    ev = tbl(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id", "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")),
                           F.col("cohort_week")) / 7.0
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@query(
    "events_quantiles",
    sql="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(quantile_cont(value, 0.5) + 1e-9, 6) AS p50,
               ROUND(quantile_cont(value, 0.9) + 1e-9, 6) AS p90,
               ROUND(quantile_cont(value, 0.99) + 1e-9, 6) AS p99
        FROM events GROUP BY event_type
    """,
)
def events_quantiles(spark, sf_dir):
    """Exact interpolated percentiles per event type: Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear-
    interpolation definition, so the values hash-match (with the
    1e-9 pre-ROUND nudge for boundary-of-6-decimals safety).

    Scale note: exact percentiles sort each group — the right default
    up to group sizes that fit an executor's spill budget; beyond
    that, swap ``percentile`` for ``approx_percentile`` (t-digest,
    partial-aggregatable, no sort) and accept bounded error.  The
    plan keeps one partial-agg shuffle on the 5-value event_type key.
    """
    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.round(F.expr(f"percentile(value, {p})") + F.lit(1e-9), 6)
            .alias(f"p{int(p * 100)}")
            for p in (0.5, 0.9, 0.99)
        ],
    )


@query(
    "events_json_props",
    sql="""
        SELECT event_type,
               CAST(COUNT(k) AS BIGINT) AS n_with_k,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(MIN(k) AS BIGINT) AS min_k,
               CAST(MAX(k) AS BIGINT) AS max_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        GROUP BY event_type
    """,
)
def events_json_props(spark, sf_dir):
    """Semi-structured props: JSON path extraction inside the scan
    projection (``get_json_object`` — JVM-side Jackson, no UDF), then
    integer-exact per-type stats.  At scale the JSON parse rides the
    scan (one pass, no shuffle beyond the 5-key partial agg); for hot
    paths you'd materialize the extracted column into the layout, but
    the extraction operator itself is shuffle-free."""
    ev = tbl(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long").alias("k")
    return ev.select("event_type", k).groupBy("event_type").agg(
        F.count("k").cast("long").alias("n_with_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"))


@query(
    "events_interval_join",
    sql="""
        WITH wins AS (
            SELECT event_id AS window_id,
                   ts AS w_start,
                   ts + INTERVAL 10 MINUTE AS w_end
            FROM events WHERE event_type = 'error'
        ), pts AS (
            SELECT ts, value FROM events
            WHERE event_type IN ('click', 'view')
        )
        SELECT w.window_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(p.value) + 0.0, 6) AS sum_value
        FROM wins w JOIN pts p
          ON p.ts >= w.w_start AND p.ts < w.w_end
        GROUP BY w.window_id
    """,
)
def events_interval_join(spark, sf_dir):
    """interval_join (operators/interval.py): the binned batch range
    join — every error event opens a 10-minute window; count and sum
    the click/view activity inside each.  The interval side explodes
    into time buckets (~2 per window at the default 2x-mean width),
    the point side maps to its single bucket, and Catalyst plans a
    plain bucket equi-join + range refine — never the
    BroadcastNestedLoopJoin a raw BETWEEN predicate degenerates to.
    The oracle IS the raw BETWEEN join (DuckDB plans it as its own
    range join), so passing proves the binning loses and duplicates
    nothing."""
    from xcube_spark.operators.interval import interval_join

    ev = tbl(spark, sf_dir, "events")
    wins = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    pts = ev.where(F.col("event_type").isin("click", "view")).select(
        "ts", "value")
    joined = interval_join(pts, wins, ts_col="ts",
                           start_col="w_start", end_col="w_end",
                           bucket_seconds=600.0)
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value") + F.lit(0.0), 6).alias("sum_value"),
    )


from xcube_spark.pipeline.sketches import sample_quantiles_sql


@query(
    "events_quantile_sketch",
    sql=sample_quantiles_sql("event_id", "value", "events", k=2048),
)
def events_quantile_sketch(spark, sf_dir):
    """sample_state/sample_quantiles (pipeline/sketches.py): mergeable
    order statistics from a bottom-k coordinated sample — the k rows
    with the smallest md5(id) hashes are a deterministic uniform
    sample (TakeOrderedAndProject: per-partition top-k, k-row driver
    merge, no global sort), and interpolated quantiles over the
    sample approximate the corpus quantiles at ~1/sqrt(k) rank error.
    Spark's approx_percentile is the engine-private fast path; this
    sketch's kept set is fully specified, so the oracle re-derives
    the identical sample and identical quantile interpolation
    (percentile == quantile_cont)."""
    from xcube_spark.pipeline.sketches import (sample_quantiles,
                                               sample_state)

    ev = tbl(spark, sf_dir, "events")
    return sample_quantiles(sample_state(ev, "event_id", "value",
                                         k=2048))


def _ema_sql(alpha: float = 0.25, window: int = 16) -> str:
    """SQL twin of operators.temporal.ema_smooth: identical unrolled
    left-associated fold with exactly-representable 0.75^i weights."""
    num, den = [], []
    for i in range(window):
        wt = repr((1.0 - alpha) ** i)
        x = "value" if i == 0 else f"LAG(value, {i}) OVER w"
        num.append(f"CASE WHEN {x} IS NOT NULL"
                   f" THEN {wt} * ({x}) ELSE 0.0 END")
        den.append(f"CASE WHEN {x} IS NOT NULL"
                   f" THEN {wt} ELSE 0.0 END")
    ns = num[0]
    for t in num[1:]:
        ns = f"({ns} + {t})"
    ds = den[0]
    for t in den[1:]:
        ds = f"({ds} + {t})"
    return f"""
        SELECT event_id, user_id,
               ROUND(ROUND(({ns}) / ({ds}) + 1e-9, 6) + 0.0, 6)
                   AS ema
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@query("events_ema", sql=_ema_sql())
def events_ema(spark, sf_dir):
    """ema_smooth (operators/temporal.py): per-user exponential
    moving average over the last 16 events — the exponential-kernel
    twin of events_rolling_1h's trailing-range mean (temporal
    smoothing, reference resample surface).  The 16 lag terms ride
    ONE sorted frame (single shuffle on user_id, one per-partition
    pass); weights 0.75^i are exactly representable (3^i / 4^i,
    3^15 < 2^53) and the fold is a fixed left-associated shape, so
    the quotient is bit-identical cross-engine before the nudged
    6-decimal round."""
    from xcube_spark.operators.temporal import ema_smooth

    ev = tbl(spark, sf_dir, "events")
    ema = ema_smooth(
        ev, "value", "user_id",
        ["unix_micros(CAST(ts AS timestamp_ltz))", "event_id"],
        alpha=0.25, window=16)
    return ev.select(
        "event_id", "user_id",
        F.round(F.round(ema + 1e-9, 6) + 0.0, 6).alias("ema"))


@query(
    "events_cusum_drift",
    sql="""
        WITH c AS (
            SELECT event_id, user_id, ts,
                   SUM(value - 55.0) OVER w AS c
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
        ), s AS (
            SELECT event_id, user_id,
                   ROUND(ROUND(c - LEAST(0.0, MIN(c) OVER w2)
                               + 1e-9, 4) + 0.0, 4)
                       AS cusum
            FROM c
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)
        )
        SELECT event_id, user_id, cusum,
               CAST(CASE WHEN cusum > 100.0 THEN 1 ELSE 0 END AS INT)
                   AS drift
        FROM s
    """,
)
def events_cusum_drift(spark, sf_dir):
    """cusum_drift (operators/temporal.py): one-sided CUSUM
    changepoint detection per user — S_t = C_t - min_{i<=t} C_i with
    C the running sum of (value - 55), the closed form of the
    textbook max(0, S+x-k) recursion; rows with S above h=100 flag
    sustained upward drift (the data-quality monitoring primitive for
    ingest streams).  Both window passes ride ONE exchange + sort;
    running sums accumulate in the same (ts, event_id) order on both
    engines so cross-engine noise is sub-ulp, absorbed by the nudged
    4-decimal round; the drift flag derives from the ROUNDED
    statistic for lockstep."""
    from xcube_spark.operators.temporal import cusum_drift

    ev = tbl(spark, sf_dir, "events")
    out = cusum_drift(
        ev, "value", "user_id",
        [F.unix_micros(F.col("ts").cast("timestamp_ltz")), "event_id"],
        k=55.0)
    cus = F.round(F.round(F.col("cusum") + 1e-9, 4) + 0.0, 4)
    return out.select(
        "event_id", "user_id", cus.alias("cusum"),
        F.when(cus > 100.0, F.lit(1)).otherwise(F.lit(0))
        .cast("int").alias("drift"))


@query(
    "events_mad_outliers",
    sql="""
        WITH med AS (
            SELECT event_type,
                   quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ), dev AS (
            SELECT e.event_id, e.event_type, e.value, m.med,
                   abs(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ), mad AS (
            SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY event_type
        ), z AS (
            SELECT d.event_id, d.event_type,
                   ROUND(ROUND((d.value - d.med)
                               / (1.4826 * m.mad) + 1e-9, 4)
                         + 0.0, 4) AS robust_z
            FROM dev d JOIN mad m USING (event_type)
            WHERE m.mad > 0
        )
        SELECT event_id, event_type, robust_z,
               CAST(CASE WHEN abs(robust_z) > 3.0 THEN 1 ELSE 0 END
                    AS INT) AS outlier
        FROM z
    """,
)
def events_mad_outliers(spark, sf_dir):
    """Robust outlier detection: per event type, the median/MAD
    z-score (consistency constant 1.4826) and a |z| > 3 flag — the
    heavy-tail-safe alternative to mean/stddev gating for data-quality
    monitoring.  Medians are interpolated percentiles (Spark
    percentile == DuckDB quantile_cont); the flag derives from the
    nudge-rounded statistic so both engines bucket identically.
    Scale: two partial-agg shuffles on the 5-value event_type key +
    one broadcast join back; no sort of the full stream."""
    ev = tbl(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med")))
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad"))
    z = F.round(F.round((F.col("value") - F.col("med"))
                        / (F.lit(1.4826) * F.col("mad")) + 1e-9, 4)
                + 0.0, 4)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("mad") > 0)
        .select("event_id", "event_type", z.alias("robust_z"),
                F.when(F.abs(z) > 3.0, F.lit(1)).otherwise(F.lit(0))
                .cast("int").alias("outlier"))
    )


@query(
    "events_transition_matrix",
    sql="""
        WITH p AS (
            SELECT event_type AS f,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS t
            FROM events
        ), c AS (
            SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
            FROM p WHERE t IS NOT NULL GROUP BY f, t
        )
        SELECT f AS from_type, t AS to_type, n,
               ROUND(ROUND(CAST(n AS DOUBLE)
                           / SUM(n) OVER (PARTITION BY f)
                           + 1e-9, 6) + 0.0, 6) AS prob
        FROM c
    """,
)
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    streams: P(next event type | current type) from adjacent pairs in
    (ts, event_id) order — the behavioral-model primitive under
    funnel and sessionization analysis (detects impossible/bot
    transition profiles).  One exchange + sort for the LEAD pairing,
    a 25-key partial-agg reduce, and row-normalization as a window
    over the tiny count table; counts are exact BIGINTs and each
    probability is ONE deterministic IEEE division, nudge-rounded."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts").cast("timestamp_ltz")), "event_id")
    pairs = (
        ev.select(F.col("event_type").alias("from_type"),
                  F.lead("event_type").over(w).alias("to_type"))
        .where(F.col("to_type").isNotNull())
    )
    c = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    wt = Window.partitionBy("from_type")
    return c.select(
        "from_type", "to_type", "n",
        F.round(F.round(F.col("n").cast("double")
                        / F.sum("n").over(wt) + 1e-9, 6) + 0.0, 6)
        .alias("prob"))


def _zscore_sql(window: int = 32) -> str:
    """SQL twin of operators.temporal.rolling_zscore — identical
    unrolled moment folds, identical variance shape and clamp."""
    n = window
    s1 = None
    s2 = None
    for i in range(n):
        x = "value" if i == 0 else f"LAG(value, {i}) OVER w"
        s1 = f"({x})" if s1 is None else f"({s1} + {x})"
        xx = f"(({x}) * ({x}))"
        s2 = xx if s2 is None else f"({s2} + {xx})"
    mean = f"({s1} / {float(n)!r})"
    var = (f"greatest(({s2} - ({s1} * {s1}) / {float(n)!r})"
           f" / {float(n - 1)!r}, 0.0)")
    return f"""
        WITH m AS (
            SELECT event_id, user_id, value,
                   CASE WHEN ROW_NUMBER() OVER w >= {n}
                        THEN {mean} END AS mu,
                   CASE WHEN ROW_NUMBER() OVER w >= {n}
                        THEN sqrt({var}) END AS sd
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), z AS (
            SELECT event_id, user_id, mu, sd,
                   CASE WHEN sd > 0.0 THEN (value - mu) / sd
                   END AS zr
            FROM m
        )
        SELECT event_id, user_id,
               ROUND(ROUND(mu + 1e-6, 4) + 0.0, 4) AS roll_mean,
               ROUND(ROUND(sd + 1e-6, 4) + 0.0, 4) AS roll_sd,
               ROUND(ROUND(zr + 1e-6, 4) + 0.0, 4) AS zscore,
               CAST(CASE WHEN zr IS NULL THEN NULL
                         WHEN abs(ROUND(ROUND(zr + 1e-6, 4)
                                        + 0.0, 4)) > 2.0 THEN 1
                         ELSE 0 END AS INT) AS breakout
        FROM z
    """


@query("events_rolling_zscore", sql=_zscore_sql())
def events_rolling_zscore(spark, sf_dir):
    """rolling_zscore (operators/temporal.py): per-user rolling mean /
    sample stddev / z-score over the trailing 32 events with a
    Bollinger-style |z| > 2 breakout flag — the rolling second-moment
    companion of events_rolling_trend.  Both moments are unrolled
    fixed-order lag folds (NO engine-private Welford ordering); the
    variance subtraction is an FMA-contraction site so outputs take
    the 1e-6-nudged 4-decimal round, and the breakout flag derives
    from the ROUNDED z for cross-engine lockstep.  One exchange +
    sort; NULL until the window fills."""
    from xcube_spark.operators.temporal import rolling_zscore

    ev = tbl(spark, sf_dir, "events")
    out = rolling_zscore(
        ev, "value", "user_id",
        [F.unix_micros(F.col("ts").cast("timestamp_ltz")), "event_id"],
        window=32)
    r4 = lambda c: F.round(F.round(c + 1e-6, 4) + 0.0, 4)  # noqa: E731
    z = r4(F.col("zscore"))
    return out.select(
        "event_id", "user_id",
        r4(F.col("roll_mean")).alias("roll_mean"),
        r4(F.col("roll_sd")).alias("roll_sd"),
        z.alias("zscore"),
        F.when(F.col("zscore").isNull(),
               F.lit(None).cast("int"))
        .otherwise(F.when(F.abs(z) > 2.0, F.lit(1))
                   .otherwise(F.lit(0)).cast("int"))
        .alias("breakout"))


def _hampel_sql(window: int = 15, n_sigmas: float = 3.0) -> str:
    """SQL twin of operators.temporal.hampel_filter — identical
    unrolled lags, identical sorted-array median/MAD elements,
    identical three-op z-score."""
    n = window
    mid = n // 2 + 1
    lags = ["value"] + [f"LAG(value, {i}) OVER w" for i in range(1, n)]
    lag_cols = ", ".join(f"{x} AS l{i}" for i, x in enumerate(lags))
    arr = "[" + ", ".join(f"l{i}" for i in range(n)) + "]"
    adev = "[" + ", ".join(f"abs(l{i} - med)" for i in range(n)) + "]"
    return f"""
        WITH b AS (
            SELECT event_id, user_id, value, {lag_cols},
                   CASE WHEN ROW_NUMBER() OVER w >= {n} THEN 1 END
                       AS full_w
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), m AS (
            SELECT *, CASE WHEN full_w = 1
                           THEN list_sort({arr})[{mid}] END AS med
            FROM b
        ), d AS (
            SELECT *, CASE WHEN full_w = 1
                           THEN list_sort({adev})[{mid}] END AS mad
            FROM m
        ), z AS (
            SELECT event_id, user_id, value, full_w, med, mad,
                   CASE WHEN mad > CAST(0.0 AS DOUBLE)
                        THEN (value - med)
                             / (CAST(1.4826 AS DOUBLE) * mad)
                   END AS rz
            FROM d
        )
        SELECT event_id, user_id,
               ROUND(ROUND(med + 1e-9, 6) + 0.0, 6) AS roll_med,
               ROUND(ROUND(mad + 1e-9, 6) + 0.0, 6) AS roll_mad,
               ROUND(ROUND(rz + 1e-9, 4) + 0.0, 4) AS robust_z,
               CAST(CASE WHEN full_w IS NULL THEN NULL
                         WHEN mad > CAST(0.0 AS DOUBLE)
                              AND abs(rz) > CAST({n_sigmas!r} AS DOUBLE)
                              THEN 1
                         WHEN mad = CAST(0.0 AS DOUBLE)
                              AND value != med THEN 1
                         ELSE 0 END AS INT) AS outlier,
               ROUND(ROUND(CASE
                   WHEN full_w IS NULL THEN NULL
                   WHEN (mad > CAST(0.0 AS DOUBLE)
                         AND abs(rz) > CAST({n_sigmas!r} AS DOUBLE))
                     OR (mad = CAST(0.0 AS DOUBLE) AND value != med)
                       THEN med ELSE value END + 1e-9, 6) + 0.0, 6)
                   AS hampel_value
        FROM z
    """


@query("events_hampel_filter", sql=_hampel_sql())
def events_hampel_filter(spark, sf_dir):
    """hampel_filter (operators/temporal.py): per-user Hampel filter —
    rolling median/MAD outlier detection and repair over the trailing
    15 events, the rolling companion of events_mad_outliers' global
    gate (robust filtering that survives level shifts).  The 15 lags
    gather into ONE sorted array per row: with an odd window the
    median and MAD are exact ELEMENTS (no interpolation), identical
    cross-engine, and the z-score is three IEEE ops on identical
    doubles.  One exchange + sort; NULLs until the window fills."""
    from xcube_spark.operators.temporal import hampel_filter

    ev = tbl(spark, sf_dir, "events")
    out = hampel_filter(
        ev, "value", "user_id",
        [F.unix_micros(F.col("ts").cast("timestamp_ltz")), "event_id"],
        window=15, n_sigmas=3.0)
    r6 = lambda c: F.round(F.round(c + 1e-9, 6) + 0.0, 6)  # noqa: E731
    return out.select(
        "event_id", "user_id",
        r6(F.col("roll_med")).alias("roll_med"),
        r6(F.col("roll_mad")).alias("roll_mad"),
        F.round(F.round(F.col("robust_z") + 1e-9, 4) + 0.0, 4)
        .alias("robust_z"),
        F.col("outlier").cast("int").alias("outlier"),
        r6(F.col("hampel_value")).alias("hampel_value"))


def _trend_sql(window: int = 32) -> str:
    """SQL twin of operators.temporal.rolling_trend — the same
    unrolled integer-weighted fold over the same frame."""
    n = window
    si = n * (n - 1) // 2
    si2 = (n - 1) * n * (2 * n - 1) // 6
    denom = float(n * si2 - si * si)
    sy = None
    siy = None
    for i in range(n):
        x = "value" if i == 0 else f"LAG(value, {i}) OVER w"
        sy = x if sy is None else f"({sy} + {x})"
        term = f"({float(i)!r} * {x})"
        siy = term if siy is None else f"({siy} + {term})"
    slope = (f"-(({float(n)!r} * {siy}) - ({float(si)!r} * {sy}))"
             f" / {denom!r}")
    return f"""
        SELECT event_id, user_id,
               ROUND(ROUND(CASE WHEN ROW_NUMBER() OVER w >= {n}
                                THEN {slope} END + 1e-9, 6) + 0.0, 6)
                   AS trend
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@query("events_rolling_trend", sql=_trend_sql())
def events_rolling_trend(spark, sf_dir):
    """rolling_trend (operators/temporal.py): per-user rolling OLS
    slope over the trailing 32 events (age regressor, positive =
    rising) — the linear trend detector beside cusum_drift's step
    detector.  With age as regressor the design moments are exact
    integer constants, so the slope is a fixed integer-weighted
    left-associated fold over 32 unrolled lags: bit-identical
    cross-engine, one exchange + sort, NULL until the window fills."""
    from xcube_spark.operators.temporal import rolling_trend

    ev = tbl(spark, sf_dir, "events")
    out = rolling_trend(
        ev, "value", "user_id",
        [F.unix_micros(F.col("ts").cast("timestamp_ltz")), "event_id"],
        window=32)
    return out.select(
        "event_id", "user_id",
        F.round(F.round(F.col("trend") + 1e-9, 6) + 0.0, 6)
        .alias("trend"))


def _holt_sql(alpha: float = 0.5, beta: float = 0.25,
              window: int = 12) -> str:
    """SQL twin of operators.temporal.holt_smooth — the identical
    unrolled taps (same Python-double literals) over the same frame."""
    from xcube_spark.operators.temporal import holt_coefficients

    li, bi = holt_coefficients(alpha, beta, window)
    lev = None
    tre = None
    for i in range(window):
        x = "value" if i == 0 else f"LAG(value, {i}) OVER w"
        lt = f"({li[i]!r} * {x})"
        bt = f"({bi[i]!r} * {x})"
        lev = lt if lev is None else f"({lev} + {lt})"
        tre = bt if tre is None else f"({tre} + {bt})"
    n = window
    return f"""
        WITH s AS (
            SELECT event_id, user_id,
                   CASE WHEN ROW_NUMBER() OVER w >= {n}
                        THEN {lev} END AS lev,
                   CASE WHEN ROW_NUMBER() OVER w >= {n}
                        THEN {tre} END AS tre
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id,
               ROUND(ROUND(lev + 1e-9, 6) + 0.0, 6) AS holt_level,
               ROUND(ROUND(tre + 1e-9, 6) + 0.0, 6) AS holt_trend,
               ROUND(ROUND(lev + tre + 1e-9, 6) + 0.0, 6)
                   AS holt_forecast
        FROM s
    """


@query("events_holt_trend", sql=_holt_sql())
def events_holt_trend(spark, sf_dir):
    """holt_smooth (operators/temporal.py): per-user Holt linear
    (double exponential) smoothing — level, trend, and one-step
    forecast over the trailing 12 events.  Holt's coupled recursion
    is a linear time-invariant system, so the truncated form is a
    fixed 12-tap FIR filter whose taps (A^i g, computed once in
    Python) are embedded as IDENTICAL literals in both engines; the
    folds are left-associated over 12 unrolled lags riding ONE
    exchange + sort, NULL until the window fills (the rolling_trend
    contract), nudge-rounded to 6 decimals."""
    from xcube_spark.operators.temporal import holt_smooth

    ev = tbl(spark, sf_dir, "events")
    out = holt_smooth(
        ev, "value", "user_id",
        ["unix_micros(CAST(ts AS timestamp_ltz))", "event_id"],
        alpha=0.5, beta=0.25, window=12)
    r6 = lambda c: F.round(F.round(c + 1e-9, 6) + 0.0, 6)  # noqa: E731
    return out.select(
        "event_id", "user_id",
        r6(F.col("holt_level")).alias("holt_level"),
        r6(F.col("holt_trend")).alias("holt_trend"),
        r6(F.col("holt_level") + F.col("holt_trend"))
        .alias("holt_forecast"))


@query(
    "events_seasonal_residual",
    sql="""
        WITH prof AS (
            SELECT event_type,
                   CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
                   ROUND(AVG(value) + 1e-9, 6) AS hod_mean,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events
            GROUP BY event_type, EXTRACT(hour FROM ts)
        )
        SELECT e.event_id, e.event_type,
               CAST(EXTRACT(hour FROM e.ts) AS INT) AS hod,
               p.hod_mean,
               ROUND(ROUND(e.value - p.hod_mean + 1e-9, 4) + 0.0, 4)
                   AS residual
        FROM events e
        JOIN prof p ON p.event_type = e.event_type
         AND p.hod = CAST(EXTRACT(hour FROM e.ts) AS INT)
    """,
)
def events_seasonal_residual(spark, sf_dir):
    """Seasonal-naive decomposition: the hour-of-day x event-type
    profile (the seasonal component) and each event's residual
    against it — the detrending step before anomaly scoring on
    periodic traffic.  The profile is a 120-key partial-agg reduce
    broadcast back; residuals subtract the GRID-ROUNDED profile mean
    so both engines difference identical doubles.  One corpus scan +
    one broadcast join — nothing corpus-sized shuffles."""
    ev = tbl(spark, sf_dir, "events")
    hod = F.hour(F.col("ts")).cast("int")
    prof = ev.groupBy("event_type", hod.alias("hod")).agg(
        F.round(F.avg("value") + F.lit(1e-9), 6).alias("hod_mean"),
        F.count("*").cast("long").alias("n"))
    return (
        ev.select("event_id", "event_type", hod.alias("hod"), "value")
        .join(F.broadcast(prof), ["event_type", "hod"])
        .select("event_id", "event_type", "hod", "hod_mean",
                F.round(F.round(F.col("value") - F.col("hod_mean")
                                + 1e-9, 4) + 0.0, 4).alias("residual"))
    )


@query(
    "events_daily_leaderboard",
    sql="""
        WITH day AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   user_id,
                   ROUND(SUM(value) + 1e-9, 4) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT day, rank, user_id, total, n_events
        FROM (
            SELECT day, user_id, total, n_events,
                   ROW_NUMBER() OVER (PARTITION BY day
                                      ORDER BY total DESC, user_id)
                       AS rank
            FROM day
        ) WHERE rank <= 3
    """,
)
def events_daily_leaderboard(spark, sf_dir):
    """Grouped top-k: the per-day top-3 users by total value — the
    leaderboard/top-N-per-group shape (rank window over a pre-reduced
    aggregate, NOT a global sort).  Totals round to the grid BEFORE
    ranking so the (total DESC, user_id) tie-break is identical
    cross-engine.  Scale: one (day, user) partial-agg reduce, then a
    rank window over day partitions of group-count size — the full
    stream never sorts."""
    ev = tbl(spark, sf_dir, "events")
    day = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).agg(F.round(F.sum("value") + F.lit(1e-9), 4).alias("total"),
          F.count("*").cast("long").alias("n_events"))
    w = Window.partitionBy("day").orderBy(
        F.desc("total"), F.asc("user_id"))
    return (
        day.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("day", "rank", "user_id", "total", "n_events")
    )


# --------------------------------------------------------------------------
# round-12: the un-gated corners of the reference resample method grid
# (cli/resample.py:18-32) — multi-day epoch-anchored windows with
# min/max/median/std/var/prod downsampling, and the asfreq upsample


@query(
    "events_resample_methods",
    sql="""
        SELECT CAST(FLOOR(epoch(ts)) AS BIGINT)
               - (CAST(FLOOR(epoch(ts)) AS BIGINT) % 172800) AS t_s,
               ROUND(MIN(value), 6) AS v_min,
               ROUND(MAX(value), 6) AS v_max,
               ROUND(quantile_cont(value, 0.5) + 1e-9, 6) AS v_median,
               ROUND(stddev_samp(value) + 1e-9, 6) AS v_std,
               ROUND(var_samp(value) + 1e-9, 4) AS v_var,
               ROUND(product(CASE WHEN event_id % 97 = 0
                                  THEN 1.0 + value
                                       / CAST(1000000 AS DOUBLE)
                                  ELSE CAST(1 AS DOUBLE) END)
                     + 1e-9, 6) AS v_prod
        FROM events
        GROUP BY 1
    """,
)
def events_resample_methods(spark, sf_dir):
    """resample_in_time's remaining downsampling methods
    (cli/resample.py:19-31: min/max/median/std/var/prod) over 2-DAY
    windows — gating the multi-frequency epoch-anchored window key
    (temporal.py:115-119 secs path) the 1-unit date_trunc gates never
    exercise.  The window start ships as the exact epoch-seconds
    BIGINT (integer-exact; the cube-grid index-column lesson).
    median is interpolated-percentile parity (Spark percentile ==
    DuckDB quantile_cont, r8); std/var ride the events_statistics
    native-aggregate precedent with nudged rounds; prod samples
    event_id % 97 with identity-1 terms near 1 so the product stays
    in a float-noise-safe magnitude at every sf."""
    ev = tbl(spark, sf_dir, "events")
    e = F.col("ts").cast("timestamp_ltz").cast("long")
    term = F.lit(1.0) + F.col("value") / F.lit(1000000.0)
    return ev.groupBy(
        (e - F.pmod(e, F.lit(172800))).alias("t_s")
    ).agg(
        F.round(F.min("value"), 6).alias("v_min"),
        F.round(F.max("value"), 6).alias("v_max"),
        F.round(F.expr("percentile(value, 0.5)") + F.lit(1e-9), 6)
        .alias("v_median"),
        F.round(F.stddev_samp("value") + F.lit(1e-9), 6).alias("v_std"),
        F.round(F.var_samp("value") + F.lit(1e-9), 4).alias("v_var"),
        F.round(
            F.product(F.when(F.col("event_id") % 97 == 0, term)
                      .otherwise(F.lit(1.0))) + F.lit(1e-9), 6)
        .alias("v_prod"),
    )


@query(
    "events_upsample_asfreq",
    sql="""
        WITH bounds AS (
            SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
                   CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
            FROM events
        ), grid AS (
            SELECT UNNEST(generate_series(lo, hi, INTERVAL 30 MINUTE))
                AS time
            FROM bounds
        ), hourly AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS time,
                   ROUND(AVG(value) + 1e-9, 6) AS v
            FROM events GROUP BY 1
        )
        SELECT g.time, h.v AS value_asfreq
        FROM grid g LEFT JOIN hourly h ON g.time = h.time
    """,
)
def events_upsample_asfreq(spark, sf_dir):
    """upsample_in_time with method='asfreq' (cli/resample.py:18 —
    re-index on the finer grid, introduce NULL gaps, fill nothing):
    the last un-gated upsampling method.  Same dense-grid broadcast
    join as the fill variants, no window at all."""
    from xcube_spark.operators.temporal import upsample_in_time

    ev = tbl(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("time")).agg(
        F.round(F.avg("value") + F.lit(1e-9), 6).alias("v")
    )
    out = upsample_in_time(hourly, "30min", method="asfreq")
    return out.select("time", F.col("v").alias("value_asfreq"))
