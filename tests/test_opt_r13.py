"""Round-13 optimization internals.

1. bm25_topk's query-vocabulary filter is CAPPED: small query sets
   render a literal IN-list, large ones fall back to a broadcast
   membership join — both branches produce identical rows (the
   broadcast-small-queries contract, enforced instead of assumed).
"""
import pytest
from pyspark.sql import Row


def _corpus(spark):
    rows = [
        Row(doc_id=1, text="spark window agg fast stream"),
        Row(doc_id=2, text="customer query fast vector merge"),
        Row(doc_id=3, text="window window agg customer"),
        Row(doc_id=4, text="vector stream merge merge spark"),
        Row(doc_id=5, text="unrelated words entirely here"),
    ]
    return spark.createDataFrame(rows)


def _queries(spark):
    return spark.createDataFrame(
        [Row(query_id=1, query_text="spark window agg"),
         Row(query_id=2, query_text="customer query fast")])


def test_bm25_inset_cap_branches_identical(spark, monkeypatch):
    import xcube_spark.pipeline.text as tx

    docs, qs = _corpus(spark), _queries(spark)

    def run():
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
            for r in tx.bm25_topk(docs, qs, k=3).collect())

    monkeypatch.setattr(tx, "_BM25_INSET_CAP", 1024)
    literal_branch = run()
    assert literal_branch  # the fixture must produce hits

    # force the join branch: cap below the vocabulary size
    monkeypatch.setattr(tx, "_BM25_INSET_CAP", 0)
    join_branch = run()
    assert join_branch == literal_branch


def test_cftime_staged_decode_bit_identical(spark):
    """decode_cf_time_staged == decode_cf_time for every calendar over
    the gate fixture's value range (same expressions, different plan
    staging — values must be bit-identical)."""
    from pyspark.sql import functions as F

    from xcube_spark.functions.cftime import (decode_cf_time,
                                              decode_cf_time_staged)

    vals = spark.range(200).select(
        F.col("id").alias("i"),
        (F.col("id") * F.lit(37.25) + F.lit(11.0)).alias("v"))
    cals = [("noleap", "days since 2000-01-01"),
            ("360_day", "days since 2000-01-01"),
            ("all_leap", "days since 2000-01-01"),
            ("julian", "days since 1890-01-01"),
            ("standard", "days since 2000-01-01")]
    for cal, units in cals:
        col_api = sorted(
            (r["i"], r["ts"])
            for r in vals.select(
                "i", decode_cf_time(F.col("v"), units, cal).alias("ts")
            ).collect())
        staged = sorted(
            (r["i"], r["ts"])
            for r in decode_cf_time_staged(vals, "v", "ts", units, cal)
            .select("i", "ts").collect())
        assert staged == col_api, f"calendar {cal} diverged"


def test_scalar_folds_bnlj_free(spark):
    """class_rebalance (min-class cap via window over the per-label
    count table + broadcast equi-join) and tfidf_keywords (driver-
    folded corpus count) plan WITHOUT BroadcastNestedLoopJoin, and
    class_rebalance still keeps exactly min-class docs per label."""
    from pyspark.sql import Row

    from xcube_spark.pipeline.curation import class_rebalance
    from xcube_spark.pipeline.text import tfidf_keywords

    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 3 else "de",
             text=f"tok{i % 4} tok{i % 7} common") for i in range(30)])

    reb = class_rebalance(docs, label_col="lang")
    plan = reb._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    kept = [(r["label"], r["kept"]) for r in reb.collect()]
    n_min = min(sum(1 for l, _ in kept if l == lab) for lab in {"en", "de"})
    for lab in ("en", "de"):
        assert sum(1 for l, k in kept if l == lab and k) == n_min

    tfi = tfidf_keywords(docs, k=2)
    plan = tfi._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert tfi.count() > 0


def test_probe_fold_bnlj_free(spark):
    """probe_fit_predict's driver-side Cramer solve plans without a
    BNLJ and matches the column-math coefficients on a known fit."""
    from pyspark.sql import Row

    from xcube_spark.pipeline.curation import linear_probe

    rows = [Row(doc_id=i, y=float(2 + 3 * (i % 5) - 1 * (i % 7)),
                x1=float(i % 5), x2=float(i % 7)) for i in range(40)]
    df = spark.createDataFrame(rows)
    out = linear_probe(df, "y", "x1", "x2")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    res = out.collect()
    assert len(res) == 40
    # exact linear data -> residuals vanish (fit is closed-form exact
    # up to float roundoff)
    assert all(abs(r["resid"]) < 1e-9 for r in res)


def test_bm25_inset_cap_plan_shapes(spark, monkeypatch):
    """The literal branch carries the IN-list in the plan; the join
    branch carries a broadcast join and NO giant literal."""
    import xcube_spark.pipeline.text as tx

    docs, qs = _corpus(spark), _queries(spark)

    monkeypatch.setattr(tx, "_BM25_INSET_CAP", 1024)
    lit_plan = tx.bm25_topk(docs, qs, k=3, materialize=False)._jdf \
        .queryExecution().executedPlan().toString()
    assert "spark" in lit_plan and " IN " in lit_plan.replace("\n", " ")

    monkeypatch.setattr(tx, "_BM25_INSET_CAP", 0)
    join_plan = tx.bm25_topk(docs, qs, k=3, materialize=False)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in join_plan
