"""Streaming sketch maintenance: HyperLogLog registers and count-min
counters as foreachBatch state sinks.

Same architecture as :mod:`xcube_spark.streaming.dedup_sink` (atomic
versioned publish + replay guard), but the state here is strictly
sketch-sized — m registers / d*w counters — so a stream can summarize
an unbounded corpus with kilobytes of state and O(batch) work per
micro-batch.  Register max-merge is idempotent and counter add-merge
is guarded by the batch-id pointer, so both sinks are exactly-once.

Merging is value-exact, not approximate-exact: the published sketch
after any sequence of micro-batches is bit-identical to the sketch of
the concatenated stream (max/+ are associative and commutative and the
hashing is md5-deterministic) — pinned by the batching-invariance
tests and by the incremental gate queries whose oracle is the
single-pass recompute.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from xcube_spark.pipeline.sketches import (
    cms_build,
    cms_merge,
    hll_merge,
    hll_state,
)

HLL_STATE_SCHEMA = "reg BIGINT, rho INT"
CMS_STATE_SCHEMA = "row INT, pos BIGINT, cnt BIGINT"


def _pointer(state_dir: str) -> str:
    return os.path.join(state_dir, "_CURRENT")


def _current_version(state_dir: str) -> int | None:
    ptr = _pointer(state_dir)
    if os.path.exists(ptr):
        with open(ptr) as f:
            return int(f.read().strip().lstrip("v"))
    return None


def _read_state(spark: SparkSession, state_dir: str,
                schema: str) -> DataFrame:
    version = _current_version(state_dir)
    if version is not None:
        return spark.read.parquet(os.path.join(state_dir, f"v{version}"))
    return spark.createDataFrame([], schema)


def _publish(state: DataFrame, state_dir: str, batch_id: int) -> None:
    version = f"v{batch_id}"
    state.write.mode("overwrite").parquet(
        os.path.join(state_dir, version))
    tmp = _pointer(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, _pointer(state_dir))


def run_incremental_hll_stream(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    col: str = "text",
    p: int = 8,
) -> DataFrame:
    """Drain a streaming DataFrame into an HLL register state with
    ``Trigger.AvailableNow``; returns the final register table.
    Replayed batches are skipped via the published-version guard
    (max-merge is idempotent anyway, but the guard keeps the
    version history linear)."""
    os.makedirs(state_dir, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = _current_version(state_dir)
        if applied is not None and applied >= batch_id:
            return
        state = _read_state(spark, state_dir, HLL_STATE_SCHEMA)
        _publish(hll_merge(state, batch_df, col, p), state_dir,
                 batch_id)

    q = (
        doc_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_state(doc_stream.sparkSession, state_dir,
                       HLL_STATE_SCHEMA)


def run_incremental_cms_stream(
    gram_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    gram_col: str = "ngram",
    d: int = 4,
    w: int = 1 << 10,
) -> DataFrame:
    """Drain a streaming DataFrame of gram occurrences into a CMS
    counter state.  Counter addition is NOT idempotent, so the
    version guard is load-bearing here: a replayed batch must not
    double-count (the dedup-sink exactly-once argument)."""
    os.makedirs(state_dir, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = _current_version(state_dir)
        if applied is not None and applied >= batch_id:
            return
        state = _read_state(spark, state_dir, CMS_STATE_SCHEMA)
        _publish(cms_merge(state, batch_df, gram_col, d=d, w=w),
                 state_dir, batch_id)

    q = (
        gram_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_state(gram_stream.sparkSession, state_dir,
                       CMS_STATE_SCHEMA)


KMV_STATE_SCHEMA = "w BIGINT"


def run_incremental_kmv_stream(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    col: str = "text",
    k: int = 128,
) -> DataFrame:
    """Drain a streaming DataFrame into a KMV k-minimum-values state
    with ``Trigger.AvailableNow``; returns the final ``w`` table
    (<= k rows).  The k-smallest-set merge is idempotent, so replays
    are harmless; the published-version guard keeps the version
    history linear anyway."""
    from xcube_spark.pipeline.sketches import kmv_merge

    os.makedirs(state_dir, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = _current_version(state_dir)
        if applied is not None and applied >= batch_id:
            return
        state = _read_state(spark, state_dir, KMV_STATE_SCHEMA)
        _publish(kmv_merge(state, batch_df, col, k), state_dir,
                 batch_id)

    q = (
        doc_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_state(doc_stream.sparkSession, state_dir,
                       KMV_STATE_SCHEMA)


PROBE_STATE_SCHEMA = ("n BIGINT, s1 BIGINT, s2 BIGINT, s11 BIGINT, "
                      "s12 BIGINT, s22 BIGINT, sy BIGINT, s1y BIGINT, "
                      "s2y BIGINT")


def run_incremental_probe_stream(
    feat_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    y_col: str = "y",
    x1_col: str = "x1",
    x2_col: str = "x2",
) -> DataFrame:
    """Drain a streaming DataFrame of (y, x1, x2) feature rows into
    the OLS probe's one-row moment state (pipeline/curation.py
    probe_moments/probe_merge) — streaming MODEL TRAINING with
    kilobytes of state: the model after any sequence of micro-batches
    is bit-identical to training on the concatenated stream (integer
    moment sums are associative/commutative).  Moment addition is NOT
    idempotent, so the published-version guard is load-bearing
    (the CMS exactly-once argument)."""
    from xcube_spark.pipeline.curation import probe_merge

    os.makedirs(state_dir, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = _current_version(state_dir)
        if applied is not None and applied >= batch_id:
            return
        state = _read_state(spark, state_dir, PROBE_STATE_SCHEMA)
        _publish(probe_merge(state, batch_df, y_col, x1_col, x2_col),
                 state_dir, batch_id)

    q = (
        feat_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_state(feat_stream.sparkSession, state_dir,
                       PROBE_STATE_SCHEMA)


PCA_STATE_SCHEMA = "n BIGINT, s ARRAY<DOUBLE>, g ARRAY<DOUBLE>"


def run_pca_moments_stream(
    emb_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Drain a streaming DataFrame of embedding rows into the PCA
    sufficient-statistics state (pipeline/similarity.py pca_moments /
    pca_moments_merge) — streaming covariance/PCA maintenance with
    O(d^2) state: each micro-batch contributes one moment triple and
    the merged state finalizes to the same per-dimension statistics
    (and the same eigenbasis) as batch training on everything seen.
    Moment addition is NOT idempotent, so the published-version guard
    is load-bearing (the CMS exactly-once argument).  The
    drift-monitoring shape: re-fit the rotation from kilobytes of
    state at any watermark, never rescan the corpus."""
    from xcube_spark.pipeline.similarity import (pca_moments,
                                                 pca_moments_merge)

    os.makedirs(state_dir, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = _current_version(state_dir)
        if applied is not None and applied >= batch_id:
            return
        if batch_df.isEmpty():
            m = None
        else:
            m = pca_moments(batch_df, vec_col)
        prev = _read_state(spark, state_dir, PCA_STATE_SCHEMA).collect()
        if prev:
            import numpy as np

            row = prev[0]
            d = len(row.s)
            pm = (int(row.n), np.asarray(row.s),
                  np.asarray(row.g).reshape(d, d))
            m = pm if m is None else pca_moments_merge(pm, m)
        if m is None:
            return
        n, s, g = m
        state = spark.createDataFrame(
            [(int(n), [float(x) for x in s],
              [float(x) for x in g.reshape(-1)])], PCA_STATE_SCHEMA)
        _publish(state, state_dir, batch_id)

    q = (
        emb_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_state(emb_stream.sparkSession, state_dir,
                       PCA_STATE_SCHEMA)


def run_nb_counts_stream(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    label_col: str = "lang",
    n_buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Drain a streaming DataFrame of labeled documents into the
    Naive Bayes count state (pipeline/classify.py nb_count_state /
    nb_merge) — streaming CLASSIFIER training with <= L*(B+1) rows of
    state: the model after any sequence of micro-batches is
    value-identical to training on the concatenated stream (integer
    count sums are associative/commutative), so
    ``nb_classify_from_state`` over the published state reproduces
    the batch classifier exactly.  Count addition is NOT idempotent,
    so the published-version guard is load-bearing (the CMS
    exactly-once argument)."""
    from xcube_spark.pipeline.classify import (NB_STATE_SCHEMA,
                                               nb_merge)

    os.makedirs(state_dir, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = _current_version(state_dir)
        if applied is not None and applied >= batch_id:
            return
        state = _read_state(spark, state_dir, NB_STATE_SCHEMA)
        _publish(nb_merge(state, batch_df, label_col=label_col,
                          n_buckets=n_buckets, text_col=text_col),
                 state_dir, batch_id)

    q = (
        doc_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_state(doc_stream.sparkSession, state_dir,
                       NB_STATE_SCHEMA)


BLOOM_STATE_SCHEMA = "bloom ARRAY<BIGINT>"


def run_bloom_filter_stream(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Drain a streaming DataFrame of benchmark documents into ONE
    Bloom bitmap row (pipeline/sketches.py bloom_filter_build /
    bloom_merge) — the streaming decontamination-filter maintenance
    shape: eval suites arrive over time, the published bitmap is
    always the filter of everything seen, and corpus shards probe it
    broadcast (bloom_decontaminate(bloom=...)).  Bit-OR merge is
    idempotent, so replays are harmless even without the version
    guard — the guard stays for uniformity with the other sinks."""
    from xcube_spark.pipeline.curation import ngrams_narrow
    from xcube_spark.pipeline.sketches import (bloom_filter_build,
                                               bloom_merge)

    os.makedirs(state_dir, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = _current_version(state_dir)
        if applied is not None and applied >= batch_id:
            return
        fresh = bloom_filter_build(
            ngrams_narrow(batch_df, text_col, n), "ngram",
            m_bits=m_bits, k=k)
        state = _read_state(spark, state_dir, BLOOM_STATE_SCHEMA)
        merged = fresh if state.isEmpty() else bloom_merge(state, fresh)
        _publish(merged, state_dir, batch_id)

    q = (
        doc_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_state(doc_stream.sparkSession, state_dir,
                       BLOOM_STATE_SCHEMA)
