"""Pins for the round-9 verdict / advice fixes (applied in round 10).

Each test locks one fix so it cannot silently regress:
- verdict #3: read_events_stream must not leak the legacy nanos conf
- advice: knn_recall forwards column names to the approximate side
- advice: igh (Goode) inverse clamps out-of-domain y instead of NaN-ing
- advice: bm25/dsir release their persisted intermediates
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_read_events_stream_does_not_leak_nanos_conf(spark, sf_dir):
    """Verdict r9 #3: the streaming footer probe set
    spark.sql.legacy.parquet.nanosAsLong session-wide with no restore
    (the batch path got the scoped fix in r8); on Spark 4 the native
    nanos read needs no conf at all."""
    from xcube_spark.streaming.events import read_events_stream

    conf = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(conf, None)
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    assert spark.conf.get(conf, None) == before


def test_knn_recall_forwards_column_names(spark):
    """Advice r9: knn_recall forwarded id/vec column kwargs to the
    exact ground truth but called approx(corpus, queries, k) bare, so
    non-default column names failed or mis-joined on the approx side."""
    from xcube_spark.pipeline.similarity import knn_bruteforce, knn_recall

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "my_id long, my_vec array<float>")
    queries = spark.createDataFrame(
        [(100, [3.0, 1.0])], "my_qid long, my_vec array<float>")
    rec = knn_recall(
        corpus, queries, k=3, approx=knn_bruteforce,
        id_col="my_id", vec_col="my_vec", query_id_col="my_qid",
    ).collect()
    # approx == exact here, so recall is exactly 1.0 for the query
    assert len(rec) == 1
    assert rec[0].recall == pytest.approx(1.0)


def test_goode_inverse_clamps_out_of_domain(spark):
    """Advice r9: the interrupted-Goode inverse computed
    asin((|y|/R + dy)/sqrt(2)) which NaNs for |y| beyond the native
    range; out-of-domain pixels must now be explicitly NULL (both
    engines), not silent NaN."""
    from xcube_spark.operators.resampling.reproject import (
        _igh_to_lonlat_fn, igh_inverse_sql)

    inv = _igh_to_lonlat_fn("PROJ:IGH")
    r = 6378137.0
    pts = spark.createDataFrame(
        [(0.0, 0.0),               # in-domain: origin
         (0.0, r * 1.6),           # above the map (native |y| max ~1.36*R)
         (0.0, -r * 1.6)],         # below the map
        "x double, y double")
    lon_c, lat_c = inv(F.col("x"), F.col("y"))
    rows = pts.select(lon_c.alias("lon"), lat_c.alias("lat")).collect()
    assert rows[0].lon == pytest.approx(0.0, abs=1e-6)
    assert rows[0].lat == pytest.approx(0.0, abs=1e-6)
    for row in rows[1:]:
        # NULL, not NaN: deterministic on both Spark and DuckDB
        assert row.lat is None, row
        assert row.lon is None, row
    # the SQL twin nulls the same rows (checked on Spark SQL here; the
    # expression is engine-portable ANSI)
    lon_s, lat_s = igh_inverse_sql("x", "y", "PROJ:IGH")
    rows_sql = pts.selectExpr(f"{lon_s} AS lon", f"{lat_s} AS lat").collect()
    for c_row, s_row in zip(rows, rows_sql):
        assert (c_row.lat is None) == (s_row.lat is None)
        if c_row.lat is not None:
            assert c_row.lat == pytest.approx(s_row.lat, abs=1e-9)


def test_bm25_and_dsir_release_persisted_intermediates(spark, sf_dir):
    """Advice r9 (re-pinned for the r12 optimization round): repeated
    invocations of bm25/dsir must not accumulate persisted RDDs in a
    long-lived session.  bm25_topk's one-scan candidate persist and
    any dsir within-invocation persist are released by the weakref
    finalizer (tie_cache_lifetime) when the caller drops the result —
    so after dropping results and collecting garbage, the
    persisted-RDD set returns to its starting level."""
    import gc

    from xcube_spark.queries import load_all

    sc = spark.sparkContext
    qs = load_all()

    def cached_rdd_count():
        return sc._jsc.getPersistentRDDs().size()

    gc.collect()
    start = cached_rdd_count()
    for name in ("doc_bm25_topk", "doc_dsir_weights"):
        for _ in range(3):
            qs[name].fn(spark, sf_dir).collect()
        # results are not retained: every within-invocation persist
        # must be released once its result is garbage-collected
        gc.collect()
        assert cached_rdd_count() <= start, (
            f"{name} grew the persisted-RDD set on repeat invocation")
