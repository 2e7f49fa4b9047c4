"""Regression tests for the round-3 ADVICE.md items (fixed round 4).

1. dedup_sink batch replay no longer double-counts (exactly-once guard).
2. asof_join breaks equal-timestamp right-row ties deterministically.
3. q18 filters the RAW quantity sum, not the rounded one.
4. doc_audio_features oracle decodes SIGNED int16 like the Spark side.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def test_dedup_sink_replayed_batches_do_not_double_count(spark, tmp_path):
    """Replaying the whole stream against an already-published state
    (the crash-between-publish-and-checkpoint-commit scenario, forced
    here by wiping the checkpoint) must leave group sizes unchanged —
    the batch-id guard skips batches already folded into the state."""
    from xcube_spark.streaming.dedup_sink import (
        read_dedup_state,
        run_incremental_dedup_stream,
    )

    rows = [(i, f"text {i % 5}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "src")
    docs.where("doc_id < 20").coalesce(1).write.parquet(src + "/part=a")
    docs.where("doc_id >= 20").coalesce(1).write.parquet(src + "/part=b")

    def stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    run_incremental_dedup_stream(stream(), state_dir, ckpt)
    first = {r.digest: (r.canonical_id, r.group_size)
             for r in read_dedup_state(spark, state_dir).collect()}
    assert len(first) == 5
    assert all(size == 8 for _, size in first.values())

    # wipe the checkpoint: Spark replays every batch from scratch with
    # the same restarting batch ids — without the guard this doubles
    # every group_size
    shutil.rmtree(ckpt)
    run_incremental_dedup_stream(stream(), state_dir, str(tmp_path / "ckpt2"))
    second = {r.digest: (r.canonical_id, r.group_size)
              for r in read_dedup_state(spark, state_dir).collect()}
    assert second == first


def test_asof_join_equal_ts_right_rows_tie_break_deterministic(spark):
    """Multiple right rows sharing (by, ts): the join must pick the
    same one on every run/partitioning — the documented rule is
    pick-max over the right payload struct."""
    from xcube_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u1", 100), ("u2", 100)], "user string, ts long")
    # three right rows per user at the SAME timestamp, distinct payloads
    right_rows = [("u1", 50, v, f"p{v}") for v in (3, 1, 2)] + [
        ("u2", 50, v, f"p{v}") for v in (7, 9, 8)]
    for n_parts in (1, 3, 7):
        right = spark.createDataFrame(
            right_rows, "user string, ts long, val long, tag string"
        ).repartition(n_parts)
        out = {r.user: (r.val, r.tag)
               for r in asof_join(left, right, on="ts", by=["user"]).collect()}
        # pick-max struct: (__rts, val, tag) maximal -> highest val
        assert out == {"u1": (3, "p3"), "u2": (9, "p9")}, n_parts


def test_q18_filters_raw_sum_not_rounded(spark, tmp_path):
    """A per-order quantity sum of 150.004 (> 150 raw, == 150.00
    rounded) must pass the filter, mirroring the oracle's
    HAVING SUM(l_quantity) > 150."""
    from xcube_spark.queries.relational import q18_large_orders

    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, 150.004), (2, 149.0)],
        "l_orderkey long, l_quantity double",
    ).write.parquet(sf + "/lineitem.parquet")
    spark.createDataFrame(
        [(1, 10, "1997-01-01", 1000.0), (2, 20, "1997-01-02", 2000.0)],
        "o_orderkey long, o_custkey long, o_orderdate string, "
        "o_totalprice double",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")) \
        .write.parquet(sf + "/orders.parquet")
    spark.createDataFrame(
        [(10, "alice"), (20, "bob")], "c_custkey long, c_name string"
    ).write.parquet(sf + "/customer.parquet")

    rows = q18_large_orders(spark, sf).collect()
    assert [(r.o_orderkey, r.total_qty) for r in rows] == [(1, 150.0)]


def test_audio_oracle_signed_int16_matches_spark_decode(spark):
    """A payload byte pair with high byte >= 0x80 decodes to a NEGATIVE
    sample on the Spark side ('<i2'); the fixed oracle SQL applies the
    same wrap, so peak/sum_sq agree beyond pure-ASCII payloads."""
    import duckdb

    from xcube_spark.pipeline.multimodal import audio_features
    from xcube_spark.queries import load_all

    # Sample pair (0x10, 0x90) = unsigned 36880 -> signed -28656.
    # Spark decodes the raw binary literal; DuckDB addresses the
    # latin-1-decoded text per character (codepoint == byte < 256).
    payload = bytes([0x10, 0x90, 0x40, 0x00])  # samples: -28656, 64
    mm = spark.createDataFrame(
        [(1,)], "doc_id long").withColumn(
        "payload", F.lit(payload)).withColumn(
        "meta", F.struct(F.lit(len(payload)).alias("byte_len"),
                         F.lit("audio/pcm").alias("mime"),
                         F.md5(F.col("payload")).alias("digest")))
    got = audio_features(mm, frame=64).collect()[0]
    assert got.peak == 28656
    assert got.sum_sq == 28656 ** 2 + 64 ** 2
    assert got.n_clipped == 0

    # oracle twin on the same bytes, expressed as a 1-row documents view
    sql = load_all()["doc_audio_features"].sql
    con = duckdb.connect()
    text = payload.decode("latin-1")
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?)", [text])
    row = con.execute(sql).fetchone()
    # columns: doc_id, n_samples, n_frames, peak, sum_sq, n_clipped
    assert row[3] == got.peak
    assert row[4] == got.sum_sq
    assert row[5] == got.n_clipped
