"""Round-12 optimization internals:

1. minhash_near_dup_pairs' shingle persist is SIZE-ADAPTIVE (guide §5):
   tiny corpora recompute (persist overhead > one saved recompute),
   mid-size corpora cache, and estimates past the heap-derived budget
   recompute again (the 100 TB shape).  Results identical either way.
2. compute_ij_lookup k=1 uses one min(struct(d2, src)) aggregate; the
   argmin and d2 match the old min_by + min(d2) pair, and ties break
   deterministically by (src_y_i, src_x_i).
"""
import pytest
from pyspark.sql import Row, functions as F


def _docs(spark, n=6):
    # three near-dup pairs plus singletons
    rows = []
    for i in range(n):
        base = f"alpha beta gamma delta epsilon zeta eta theta doc{i // 2}"
        rows.append(Row(doc_id=i, text=base + (" extra" if i % 2 else "")))
    return spark.createDataFrame(rows)


def test_minhash_persist_decision_is_size_adaptive(spark, monkeypatch):
    import xcube_spark.pipeline.dedup as dd

    docs = _docs(spark)
    baseline = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in dd.minhash_near_dup_pairs(docs, threshold=0.0).collect())
    assert baseline  # the fixture must produce candidate pairs

    # force the persist branch ON (floor below any estimate) and OFF
    # (floor above any estimate): values must not change
    monkeypatch.setattr(dd, "_SHINGLE_PERSIST_FLOOR", 0)
    with_persist = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in dd.minhash_near_dup_pairs(docs, threshold=0.0).collect())
    monkeypatch.setattr(dd, "_SHINGLE_PERSIST_FLOOR", 1 << 60)
    without_persist = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in dd.minhash_near_dup_pairs(docs, threshold=0.0).collect())
    assert with_persist == baseline
    assert without_persist == baseline


def test_minhash_budget_caps_persist(spark):
    from xcube_spark.pipeline.dedup import _shingle_cache_budget

    budget = _shingle_cache_budget(spark)
    # a quarter of the configured heap, and always finite/positive —
    # a 100 TB shingle estimate must exceed it
    assert 0 < budget < 100 * (1 << 40)


def test_ij_lookup_min_struct_matches_min_by(spark):
    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.operators.resampling.rectify import compute_ij_lookup

    grid = CubeGrid(width=4, height=4, time_periods=1,
                    x_start=0.0, y_start=0.0, x_res=1.0, y_res=1.0)
    # two source pixels land in target cell (1, 1); (5, 5) is closer
    # to the center (1.5, 1.5); (7, 7) ties with (8, 8) in cell (2, 2)
    # at symmetric offsets -> deterministic winner = min (src_y, src_x)
    src = spark.createDataFrame([
        Row(y_i=5, x_i=5, lon=1.4, lat=1.4),
        Row(y_i=6, x_i=6, lon=1.9, lat=1.9),
        Row(y_i=7, x_i=7, lon=2.4, lat=2.4),
        Row(y_i=8, x_i=8, lon=2.6, lat=2.6),
    ])
    out = {(r["y_i"], r["x_i"]): (r["src_y_i"], r["src_x_i"], r["d2"])
           for r in compute_ij_lookup(src, grid).collect()}
    assert out[(1, 1)][:2] == (5, 5)
    assert out[(1, 1)][2] == pytest.approx(0.02)
    assert out[(2, 2)][:2] == (7, 7)  # tie -> smaller (src_y, src_x)


def test_rectify_inverse_gather_matches_generic(spark):
    """complete_source=True (r12 inverse map-side gather) returns the
    SAME rows as the generic outer-gather plan on a complete source —
    covered cells gathered, uncovered border cells NULL — including
    output_ij, and its physical plan has no shuffle join (both
    plane-sized gather exchanges are gone)."""
    from pyspark.sql import functions as F

    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.operators.resampling.rectify import rectify_dataset

    grid = CubeGrid(width=4, height=4, time_periods=2,
                    x_start=0.0, y_start=0.0, x_res=1.0, y_res=1.0)
    # complete 2-time source: every (t, pixel) pair has one value row;
    # lon/lat shift (+0.6, -1.1) maps pixel (y, x) -> cell (y-2, x)
    # within bounds, leaving border cells uncovered (NULL)
    src = spark.range(2 * 4 * 4).select(
        (F.col("id") / 16).cast("int").alias("t_i"),
        ((F.col("id") % 16) / 4).cast("int").alias("y_i"),
        (F.col("id") % 4).cast("int").alias("x_i"),
        (F.col("id") * 1.5).alias("V"),
    ).withColumns({
        "lon": F.col("x_i") + 0.5 + 0.1,
        "lat": F.col("y_i") + 0.5 - 1.6,
    })

    def rows(flag, output_ij=False):
        out = rectify_dataset(src, grid, var_names=["V"],
                              time_values=[0, 1], output_ij=output_ij,
                              complete_source=flag)
        return sorted(tuple(r) for r in out.collect())

    assert rows(True) == rows(False)
    assert rows(True, output_ij=True) == rows(False, output_ij=True)
    # NULL border cells really are present (lat shift uncovers 2 rows
    # per plane at the top)
    n_null = sum(1 for r in rows(True) if r[-1] is None)
    assert n_null == 2 * 2 * 4
    # plan pin: the inverse gather is broadcast-only — no shuffle join
    plan = rectify_dataset(
        src, grid, var_names=["V"], time_values=[0, 1],
        complete_source=True,
    )._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" not in plan and "SortMergeJoin" not in plan
