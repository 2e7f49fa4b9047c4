"""Regression tests for the round-8 ADVICE findings (ADVICE.md r8)
plus the round-8 verdict's nanosAsLong conf-scoping task."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_hll_estimate_empty_input_is_zero_not_null(spark):
    """ADVICE r8 #1: hll over an empty input must estimate 0, not
    NULL (SUM over zero rows is NULL; the coalesced accumulator puts
    the raw estimate at alpha*m and the linear-counting branch — all
    m registers zero — takes it to exactly 0)."""
    from xcube_spark.pipeline.sketches import hll_estimate, hll_state

    empty = spark.createDataFrame([], "doc_id long, text string")
    row = hll_estimate(hll_state(empty, "text")).first()
    assert row.estimate == 0.0
    assert row.raw_estimate is not None
    assert row.n_zero_registers == row.m


def test_hll_sql_empty_input_matches_spark(spark):
    """The DuckDB twin must take the same branch on zero rows."""
    import duckdb

    from xcube_spark.pipeline.sketches import hll_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x VARCHAR)")
    m, nz, raw, est = con.execute(
        "SELECT * FROM (" + hll_sql("x", "t") + ")").fetchone()
    assert est == 0.0
    assert raw is not None
    assert nz == m


def test_weighted_sample_rejects_nonpositive_weight(spark):
    """ADVICE r8 #2: weight <= 0 must raise, not silently exclude
    (w=0 -> priority 0) or dominate (w<0 -> priority > 1)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from xcube_spark.pipeline.sketches import weighted_sample

    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, 1.0)], "doc_id long, w double")
    with pytest.raises((SparkRuntimeException, Py4JJavaError),
                       match="weight must be > 0"):
        weighted_sample(df, F.col("w"), k=2).collect()


def test_weighted_sample_positive_weights_still_sample(spark):
    from xcube_spark.pipeline.sketches import weighted_sample

    df = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(20)], "doc_id long, w double")
    out = weighted_sample(df, F.col("w"), k=5).collect()
    assert len(out) == 5
    assert all(0.0 < r.priority <= 1.0 for r in out)


def test_normalize_text_strips_c1_controls(spark):
    """ADVICE r8 #3: the docstring promises C0/C1 stripping; C1
    (U+0080-U+009F) must actually be removed, not just C0+DEL."""
    from xcube_spark.pipeline.curation import normalize_text

    df = spark.createDataFrame(
        [(1, "ab c \x07d \x7fe  F")], "doc_id long, text string")
    row = normalize_text(df).first()
    assert row.text_norm == "ab c d e f"
    assert row.n_chars_norm == len("ab c d e f")


def test_interval_join_auto_width_survives_long_tail_interval(spark):
    """ADVICE r8 #4: one long-tail interval must not explode into a
    sequence() overflow — the auto width is floored at
    max_len/_MAX_FANOUT, so the worst row fans out <= ~1025 buckets."""
    from xcube_spark.operators.interval import _MAX_FANOUT, interval_join

    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30"), (2, "2024-03-01 12:00:00")],
        "pid long, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    # 9999 one-minute intervals + ONE year-long outlier: mean ~ 1 min,
    # so the old 2x-mean width would fan the outlier into ~263k rows
    wins = spark.range(9999).select(
        F.col("id").alias("wid"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=F.lit(0))).alias("w_start"),
        (F.lit("2024-01-01 00:01:00").cast("timestamp")).alias("w_end"),
    ).unionByName(spark.createDataFrame(
        [(99999, "2024-01-01 00:00:00", "2025-01-01 00:00:00")],
        "wid long, w_start string, w_end string",
    ).select("wid", F.col("w_start").cast("timestamp").alias("w_start"),
             F.col("w_end").cast("timestamp").alias("w_end")))
    out = interval_join(pts, wins)
    # point 1 hits all 10k intervals; point 2 only the outlier
    counts = {r.pid: r.cnt for r in
              out.groupBy("pid").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {1: 10000, 2: 1}
    # and the fan-out bound held: the exploded interval side is small
    year_us = 366 * 86400 * 1_000_000
    assert _MAX_FANOUT == 1024
    exploded_rows = out.count()  # sanity: executed without overflow
    assert exploded_rows == 10001


def test_interval_join_explicit_width_overflow_raises_upfront(spark):
    """An explicit bucket width that would blow Spark's sequence
    limit on the widest interval must fail fast with a named cause."""
    from xcube_spark.operators.interval import interval_join

    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30")], "pid long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    wins = spark.createDataFrame(
        [(1, "1924-01-01 00:00:00", "2124-01-01 00:00:00")],
        "wid long, w_start string, w_end string",
    ).select("wid", F.col("w_start").cast("timestamp").alias("w_start"),
             F.col("w_end").cast("timestamp").alias("w_end"))
    with pytest.raises(ValueError, match="sequence limit"):
        interval_join(pts, wins, bucket_seconds=1e-6)


def test_events_load_does_not_leak_nanos_conf(spark, sf_dir):
    """Verdict r8 #7: loading the events table must not leave
    spark.sql.legacy.parquet.nanosAsLong set session-wide."""
    from xcube_spark.queries import _NANOS_CONF, _TBL_CACHE, tbl

    _TBL_CACHE.pop(spark, None)  # force a real (uncached) load
    before = spark.conf.get(_NANOS_CONF, None)
    df = tbl(spark, sf_dir, "events")
    assert df.limit(1).count() >= 0
    assert spark.conf.get(_NANOS_CONF, None) == before
    assert dict(df.dtypes)["ts"].startswith("timestamp")
