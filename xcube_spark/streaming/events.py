"""Structured Streaming over the events table — SURVEY §2.14.

The reference has no streaming engine; its closest analog is the
incremental time-slice append (xcube/core/timeslice.py:62-131) and the
server's dataset auto-reload.  This module is the additive Spark-native
surface the driver's north star asks for:

- ``read_events_stream``: file-source stream over the events parquet
  (micro-batched via ``maxFilesPerTrigger``; at scale this is a Kafka /
  object-store listing source — the transformations are source-agnostic).
- event-time **tumbling / sliding windows** with watermark-based
  late-data handling (``F.window`` + ``withWatermark``);
- **session windows** (``F.session_window``, dynamic gap-merged);
- **stateful dedup** (``dropDuplicates`` / ``dropDuplicatesWithinWatermark``
  — the watermark bounds the dedup state so it cannot grow unboundedly);
- ``run_stream_to_table``: drive any of the above with
  ``Trigger.AvailableNow`` into a memory sink and hand back the batch
  result — which is how the oracle gate checks streaming semantics:
  a finite stream processed to completion must agree with the batch
  query over the same data (exactly-once).

Scale notes: every aggregation here keys state by (window x group key),
so state size is bounded by watermark horizon x key cardinality, not by
stream length; shuffle partitioning is by group key — the same
layout/skew reasoning as the batch aggs.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: events table schema (TESTDATA.md); file streams require an explicit
#: schema — there is no inference pass at stream start.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) reads as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming scan of the events parquet with a proper event-time
    ``ts`` column, identical to the batch ``tbl()`` normalization.

    File streams require an explicit schema, but the driver's testdata
    has shipped ``ts`` both as TIMESTAMP(NANOS) (reads as long under
    the legacy conf) and as TIMESTAMP(MICROS) — so probe the parquet
    footer once with a batch reader and match its physical type.

    The legacy ``nanosAsLong`` conf is only needed on Spark 3.x; like
    the batch reader (`queries/__init__.py`), try the native read
    first and scope the conf with try/finally on the fallback — a
    session-wide legacy conf left set is a side effect a library must
    not leak.  (On the 3.x fallback the conf must stay set for the
    stream's lifetime — the scan re-reads it when the query starts —
    so there it is re-applied after the probe, documented here.)
    """
    # the file stream source lists a *directory*; a single-file layout
    # streams via a glob filter over its parent
    nanos_conf = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        # Spark >= 4: native TIMESTAMP(NANOS) read — no conf touched
        footer = (
            spark.read.option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .schema
        )
    except Exception:
        prev = spark.conf.get(nanos_conf, None)
        spark.conf.set(nanos_conf, "true")
        try:
            footer = (
                spark.read.option("pathGlobFilter", "events.parquet")
                .parquet(sf_dir)
                .schema
            )
        finally:
            if prev is None:
                spark.conf.unset(nanos_conf)
            else:
                spark.conf.set(nanos_conf, prev)
        if isinstance(footer["ts"].dataType, T.LongType):
            # 3.x + nanos parquet: the streaming scan itself needs the
            # conf when the query starts — keep it set, by necessity
            spark.conf.set(nanos_conf, "true")
    ts_is_long = isinstance(footer["ts"].dataType, T.LongType)
    if ts_is_long:
        schema = EVENTS_SCHEMA
    else:
        # watermarks demand TIMESTAMP (with local tz); the parquet's
        # NTZ micros read as identical instants under the UTC session tz
        schema = T.StructType(
            [
                T.StructField("ts", T.TimestampType())
                if f.name == "ts"
                else f
                for f in footer.fields
            ]
        )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_is_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def _ntz(df: DataFrame, *cols: str) -> DataFrame:
    """Cast timestamp columns back to TIMESTAMP_NTZ so streaming results
    compare bit-for-bit with the batch twins (which read the parquet's
    NTZ micros directly); the UTC session tz makes the cast lossless."""
    for c in cols:
        df = df.withColumn(c, F.col(c).cast(T.TimestampNTZType()))
    return df


def windowed_stats(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time window aggregation with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(value_col), 6).alias("value_mean"),
            F.round(F.sum(value_col), 4).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n", "value_mean", "value_sum")
        .transform(_ntz, "window_start")
    )


def sliding_window_stats(
    events: DataFrame,
    window: str = "1 day",
    slide: str = "12 hours",
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Sliding (overlapping) event-time windows — each event lands in
    window/slide windows; state is still bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # 4 decimals with a 1e-9 nudge: window means can land exactly
            # on a .00005 half boundary, where cross-engine float noise
            # (~1e-12) flips the rounded digit; the nudge moves the
            # boundary away from those cluster points on both sides
            F.round(F.avg(value_col) + F.lit(1e-9), 4).alias("value_mean"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "value_mean")
        .transform(_ntz, "window_start")
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session windows: events closer than ``gap`` merge into
    one session (F.session_window — gap-merged dynamic windows, the
    streaming analog of the batch lag/cumsum sessionization)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            "n_events",
            "value_sum",
        )
        .transform(_ntz, "session_start")
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Stateful drop-duplicates on ``keys``.  With a watermark the state
    is pruned as event time advances (dropDuplicatesWithinWatermark);
    without one the state grows with key cardinality — only safe for
    bounded key domains."""
    keys = keys or ["event_id"]
    if watermark is not None:
        return _ntz(
            events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys),
            "ts",
        )
    return _ntz(events.dropDuplicates(keys), "ts")


def run_stream_to_table(
    stream_df: DataFrame,
    output_mode: str = "complete",
) -> DataFrame:
    """Execute a streaming DataFrame to completion (Trigger.AvailableNow)
    into a memory sink; return the materialized batch result.

    This is the oracle bridge: a finite stream drained with AvailableNow
    must produce exactly the batch answer — Spark's exactly-once
    guarantee, checked against DuckDB by the driver gate."""
    name = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)


def stream_stream_interval_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    join_window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: every left event pairs
    with the same user's right events inside [ts, ts + join_window].

    The canonical Structured Streaming two-stream pattern: BOTH sides
    carry a watermark and the join condition bounds event-time skew,
    so each side's buffered state is evictable once the other side's
    watermark passes the interval — state is O(rate x window), not
    O(stream).  Shuffle keys on user_id (equi part of the condition);
    the time bound prunes within partitions.
    """
    l = (
        events.where(F.col("event_type") == left_type)
        .select(F.col("event_id"), F.col("user_id"), F.col("ts"),
                F.col("value"))
        .withWatermark("ts", watermark)
    )
    r = (
        events.where(F.col("event_type") == right_type)
        .select(F.col("event_id").alias("event_id_r"),
                F.col("user_id").alias("user_id_r"),
                F.col("ts").alias("ts_r"),
                F.col("value").alias("value_r"))
        .withWatermark("ts_r", watermark)
    )
    joined = l.join(
        r,
        (F.col("user_id") == F.col("user_id_r"))
        & (F.col("ts_r") >= F.col("ts"))
        & (F.col("ts_r") <= F.col("ts") + F.expr(f"INTERVAL {join_window}")),
    ).select("event_id", "user_id", "ts", "event_id_r", "ts_r", "value_r")
    return _ntz(joined, "ts", "ts_r")
