"""Streaming coverage queries (SURVEY §2.14) — oracle-checked.

Each query builds a Structured Streaming pipeline over the events
parquet, drains it with ``Trigger.AvailableNow`` into a memory sink,
and returns the materialized batch result.  Correctness leans on
Spark's exactly-once guarantee: a finite stream processed to
completion must equal the equivalent batch query, which DuckDB states
independently.

Output modes per operator class:
- tumbling/sliding/session window aggs -> ``complete`` (all windows;
  session windows reject update mode);
- custom state (applyInPandasWithState) -> ``update`` (the finite
  stream is one micro-batch, so every key emits exactly its final
  state);
- stateful dedup -> ``append`` (first-seen rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xcube_spark.queries import query
from xcube_spark.streaming.events import (
    read_events_stream,
    run_stream_to_table,
    session_window_stats,
    sliding_window_stats,
    streaming_dedup,
    windowed_stats,
)
from xcube_spark.streaming.stateful import running_user_totals


@query(
    "stream_windowed_daily",
    sql="""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
               event_type,
               COUNT(*) AS n,
               ROUND(AVG(value), 6) AS value_mean,
               ROUND(SUM(value), 4) AS value_sum
        FROM events
        GROUP BY 1, 2
    """,
)
def stream_windowed_daily(spark, sf_dir):
    """Tumbling 1-day event-time windows with a 1-hour watermark."""
    stream = windowed_stats(read_events_stream(spark, sf_dir),
                            window="1 day", watermark="1 hour")
    return run_stream_to_table(stream, output_mode="complete")


@query(
    "stream_sliding_12h",
    sql="""
        WITH b AS (
            SELECT time_bucket(INTERVAL '12 hours', ts) AS window_start,
                   value
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '12 hours', ts)
                     - INTERVAL '12 hours' AS window_start,
                   value
            FROM events
        )
        SELECT CAST(window_start AS TIMESTAMP) AS window_start,
               COUNT(*) AS n,
               ROUND(AVG(value) + 1e-9, 4) AS value_mean
        FROM b
        GROUP BY 1
    """,
)
def stream_sliding_12h(spark, sf_dir):
    """Sliding 1-day windows every 12 hours: each event lands in two
    windows; the oracle re-derives the two covering window starts."""
    stream = sliding_window_stats(read_events_stream(spark, sf_dir),
                                  window="1 day", slide="12 hours")
    return run_stream_to_table(stream, output_mode="complete")


@query(
    "stream_session_per_user",
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
        SELECT user_id,
               CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS value_sum
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def stream_session_per_user(spark, sf_dir):
    """Gap-merged session windows (F.session_window, 30-min gap); the
    oracle rebuilds identical sessions with the lag/cumsum idiom."""
    stream = session_window_stats(read_events_stream(spark, sf_dir),
                                  gap="30 minutes")
    return run_stream_to_table(stream, output_mode="complete")


@query(
    "stream_dedup_first",
    sql="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_first(spark, sf_dir):
    """Stateful drop-duplicates on (user_id, event_type): the appended
    first-seen rows project to exactly the distinct key set."""
    stream = streaming_dedup(read_events_stream(spark, sf_dir),
                             keys=["user_id", "event_type"],
                             watermark=None)
    out = run_stream_to_table(stream, output_mode="append")
    return out.select("user_id", "event_type")


@query(
    "stream_stateful_user_totals",
    sql="""
        SELECT user_id,
               COUNT(*) AS n_events,
               ROUND(SUM(COALESCE(value, 0.0)), 4) AS value_sum
        FROM events
        GROUP BY user_id
    """,
)
def stream_stateful_user_totals(spark, sf_dir):
    """Custom per-key state machine via applyInPandasWithState: running
    per-user totals whose final emission equals the batch groupBy."""
    stream = running_user_totals(read_events_stream(spark, sf_dir))
    out = run_stream_to_table(stream, output_mode="update")
    return out.select(
        "user_id", "n_events", F.round("value_sum", 4).alias("value_sum")
    )


@query(
    "stream_click_purchase_join",
    sql="""
        SELECT c.event_id, c.user_id,
               CAST(c.ts AS TIMESTAMP) AS ts,
               p.event_id AS event_id_r,
               CAST(p.ts AS TIMESTAMP) AS ts_r,
               ROUND(p.value, 6) AS value_r
        FROM events c
        JOIN events p
          ON c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.user_id = c.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_click_purchase_join(spark, sf_dir):
    """Watermarked stream-stream interval join (streaming/events.py
    stream_stream_interval_join): clicks pair with same-user purchases
    within the next hour; both sides watermarked so buffered state is
    evictable (O(rate x window)).  Drained with AvailableNow the finite
    stream must equal the batch interval join the oracle states."""
    from xcube_spark.streaming.events import (
        read_events_stream, stream_stream_interval_join)

    ev = read_events_stream(spark, sf_dir)
    out = stream_stream_interval_join(ev)
    return run_stream_to_table(
        out.select("event_id", "user_id", "ts", "event_id_r", "ts_r",
                   F.round("value_r", 6).alias("value_r")),
        output_mode="append",
    )


@query(
    "stream_cusum_drift",
    sql="""
        WITH c AS (
            SELECT event_id, user_id, ts,
                   SUM(value - 55.0) OVER w AS c
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
        )
        SELECT event_id, user_id,
               ROUND(ROUND(c - LEAST(0.0, MIN(c) OVER w2)
                           + 1e-9, 4) + 0.0, 4)
                   AS cusum
        FROM c
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
    """,
)
def stream_cusum_drift(spark, sf_dir):
    """running_cusum (streaming/stateful.py): per-user CUSUM drift as
    an ORDER-SENSITIVE applyInPandasWithState state machine — state
    carries (running C, prefix-min C), each event emits the drift
    statistic; the batch window operator (events_cusum_drift) is the
    oracle, so passing proves the drained in-order stream is
    value-identical to batch (the same add-by-add IEEE sequence)."""
    from xcube_spark.streaming.stateful import running_cusum

    stream = running_cusum(read_events_stream(spark, sf_dir), k=55.0)
    out = run_stream_to_table(stream, output_mode="append")
    return out.select(
        "event_id", "user_id",
        F.round(F.round(F.col("cusum") + 1e-9, 4) + 0.0, 4)
        .alias("cusum"))


from xcube_spark.queries.events_ops import _ema_sql  # noqa: E402


@query("stream_ema", sql=_ema_sql())
def stream_ema(spark, sf_dir):
    """running_ema (streaming/stateful.py): per-user streaming EMA as
    an order-sensitive applyInPandasWithState ring buffer (last 15
    values per key); each event emits the weighted mean with
    (1-alpha)^age weights in the SAME fold order as the batch
    operator's unrolled lags, so the drained in-order stream is
    value-identical to batch — the shared batch SQL twin IS the
    oracle."""
    from xcube_spark.streaming.stateful import running_ema

    stream = running_ema(read_events_stream(spark, sf_dir),
                         alpha=0.25, window=16)
    out = run_stream_to_table(stream, output_mode="append")
    return out.select(
        "event_id", "user_id",
        F.round(F.round(F.col("ema") + 1e-9, 6) + 0.0, 6)
        .alias("ema"))


from xcube_spark.queries.events_ops import _holt_sql  # noqa: E402


@query("stream_holt_trend", sql=_holt_sql())
def stream_holt_trend(spark, sf_dir):
    """running_holt (streaming/stateful.py): per-user Holt
    linear-trend smoothing as an order-sensitive
    applyInPandasWithState ring buffer (last 11 values per key); each
    event emits level/trend/forecast with the SAME FIR taps and fold
    order as the batch operator's unrolled lags, NULL until the
    window fills — the shared batch SQL twin IS the oracle, so
    passing proves the drained in-order stream is value-identical to
    batch."""
    from xcube_spark.streaming.stateful import running_holt

    stream = running_holt(read_events_stream(spark, sf_dir),
                          alpha=0.5, beta=0.25, window=12)
    out = run_stream_to_table(stream, output_mode="append")
    r6 = lambda c: F.round(F.round(c + 1e-9, 6) + 0.0, 6)  # noqa: E731
    return out.select(
        "event_id", "user_id",
        r6(F.col("holt_level")).alias("holt_level"),
        r6(F.col("holt_trend")).alias("holt_trend"),
        r6(F.col("holt_forecast")).alias("holt_forecast"))
