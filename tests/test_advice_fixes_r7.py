"""Regression tests for the round-7 ADVICE findings (ADVICE.md r7).

The two crsparse items (PROJ:-key epsg_code fallthrough, +a-with-+ellps
flattening) live in tests/test_crsparse.py next to their subject."""
from __future__ import annotations

import pyspark.sql.functions as F


def test_embedding_near_dup_pairs_duplicate_ids_no_self_pairs(spark):
    """Duplicate id values in the corpus must not produce id_a == id_b
    rows (the oracle's a.vec_id < b.vec_id predicate excludes them);
    distinct-id near-dup pairs are still emitted."""
    from xcube_spark.pipeline.similarity import embedding_near_dup_pairs

    base = [float(i) for i in range(64)]
    near = [v + (0.001 if i == 0 else 0.0) for i, v in enumerate(base)]
    far = [float(63 - i) for i in range(64)]
    rows = [(1, base), (1, near),   # same id, near-identical vectors
            (2, near), (3, far)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_near_dup_pairs(df, threshold=0.9).collect()
    assert all(r.id_a != r.id_b for r in out)
    assert any({r.id_a, r.id_b} == {1, 2} for r in out)


def test_embedding_near_dup_pairs_cosine_is_dot_over_norms(spark):
    """Emitted cosine must equal dot/(|a||b|) computed dot-first (the
    oracle's op shape), not the pre-normalized-rows rounding."""
    import numpy as np

    from xcube_spark.pipeline.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(7)
    # tight cluster: same LSH bucket, high pairwise cosines
    vecs = rng.normal(size=(6, 64)) * 0.01 + 3.0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_near_dup_pairs(df, threshold=0.5).collect()
    assert out
    for r in out:
        a, b = vecs[r.id_a], vecs[r.id_b]
        expect = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        # gemm vs 1-D-dot accumulation still differ in the last ulp;
        # the op SHAPE (dot first, divide once) is the contract and
        # the 6-decimal oracle rounding absorbs the remainder
        assert abs(r.cosine - expect) < 1e-12, (r.id_a, r.id_b)


def test_knn_ivf_probe_selection_matches_assignment_kernel(spark):
    """Probe selection and cell assignment must use the SAME distance
    op order (_np_pair_d2): with n_probe=1 every query's own nearest
    centroid (per _np_pair_d2) must be the probed cell, so a corpus
    vector equal to the query is always found."""
    import numpy as np

    from xcube_spark.pipeline.similarity import knn_ivf

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 16))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(c, [float(x) for x in vecs[c * 10]]) for c in range(4)],
        "vec_id long, embedding array<double>")
    # query vectors sit exactly ON corpus vectors (not the centroids)
    queries = spark.createDataFrame(
        [(100 + i, [float(x) for x in vecs[i * 7 + 1]]) for i in range(5)],
        "query_id long, embedding array<double>")
    out = knn_ivf(corpus, queries, cents, k=1, n_probe=1).collect()
    got = {r.query_id: r.vec_id for r in out}
    assert got == {100 + i: i * 7 + 1 for i in range(5)}


def test_near_dup_state_store_replay_after_partial_append(spark):
    """Crash between the sig append and the bands append, then replay
    the same batch in a fresh store instance (fresh process): the
    batch_id-tagged merge must complete the partial append without
    duplicating state rows (ADVICE r7 exactly-once)."""
    from pyspark.sql import types as T

    from xcube_spark.pipeline.dedup import (NearDupStateStore,
                                            incremental_near_dedup)
    from tests.test_streaming import _near_dup_corpus

    docs = _near_dup_corpus(spark)
    b0 = docs.where("doc_id < 20")
    b1 = docs.where("doc_id >= 20")
    store = NearDupStateStore(spark, "t_ndstore_replay")
    store.drop()
    try:
        store.merge_batch(b0, batch_id=0)

        crashed = NearDupStateStore(spark, "t_ndstore_replay")
        orig_append = NearDupStateStore._append

        def boom(self, df, table, bucket_col):
            if table == self.bands_table:
                raise RuntimeError("simulated crash before bands append")
            orig_append(self, df, table, bucket_col)

        NearDupStateStore._append = boom
        try:
            import pytest
            with pytest.raises(RuntimeError):
                crashed.merge_batch(b1, batch_id=1)
        finally:
            NearDupStateStore._append = orig_append
        # sig rows for batch 1 are in; bands rows are not

        replay = NearDupStateStore(spark, "t_ndstore_replay")
        replay.merge_batch(b1, batch_id=1)

        sig = spark.table(replay.sig_table)
        n_docs = docs.count()
        assert sig.count() == n_docs  # no doubled signature rows
        assert sig.select("doc_id").distinct().count() == n_docs
        bands = spark.table(replay.bands_table)
        assert bands.count() == bands.distinct().count()
        assert (bands.where("__batch = 1").select("doc_id")
                .distinct().count() == b1.count())

        schema = T.StructType(
            [T.StructField("doc_id", T.LongType())]
            + [T.StructField(f"h{j}", T.StringType()) for j in range(8)]
            + [T.StructField("is_dup", T.BooleanType())])
        want = incremental_near_dedup(
            spark.createDataFrame([], schema), docs)
        assert ({(r.doc_id, r.is_dup) for r in replay.flags().collect()}
                == {(r.doc_id, r.is_dup) for r in want.collect()})
    finally:
        store.drop()


def test_near_dup_state_store_compact(spark):
    """compact() merges the per-batch file accumulation into one file
    per bucket, leaves rows (incl. __batch tags) unchanged, and keeps
    the candidate join bucket-local (no state-side exchange)."""
    import glob
    import os
    from urllib.parse import urlparse

    from xcube_spark.pipeline.dedup import (NearDupStateStore,
                                            minhash_sig_state)
    from tests.test_streaming import _near_dup_corpus

    docs = _near_dup_corpus(spark)
    store = NearDupStateStore(spark, "t_ndstore_compact", n_buckets=4)
    store.drop()
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for b, (lo, hi) in enumerate(((0, 10), (10, 20), (20, 30),
                                      (30, 40))):
            store.merge_batch(
                docs.where(f"doc_id >= {lo} AND doc_id < {hi}"),
                batch_id=b)
        before = sorted((r.doc_id, r.is_dup, r["__batch"])
                        for r in spark.table(store.sig_table).collect())
        wh = urlparse(
            spark.conf.get("spark.sql.warehouse.dir", "")).path
        sig_dir = os.path.join(wh, store.sig_table.lower())
        n_before = len(glob.glob(os.path.join(sig_dir, "part-*")))
        assert n_before > 4  # one file set per batch accumulated

        store.compact()

        n_after = len(glob.glob(os.path.join(sig_dir, "part-*")))
        assert n_after <= 4 < n_before
        after = sorted((r.doc_id, r.is_dup, r["__batch"])
                       for r in spark.table(store.sig_table).collect())
        assert after == before

        # the candidate join over the compacted state is still a
        # bucketed in-place scan: no exchange on the state side
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch_sig = minhash_sig_state(
            docs.where("doc_id >= 35")).drop("is_dup")
        cand = store._old_candidates(store._bkey_bands(batch_sig))
        plan = cand._jdf.queryExecution().executedPlan().toString()
        state_side = plan[plan.rindex("Sort [bkey"):]
        assert "Bucketed: true" in state_side
        assert "Exchange" not in state_side
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        store.drop()
