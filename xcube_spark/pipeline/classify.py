"""Supervised classification over the document / embedding tables.

Training-data pipelines routinely attach *learned* labels to every
document: a language or domain classifier gates what enters the mix, a
quality classifier (fastText-style) scores candidate pretraining text,
and a nearest-neighbor vote transfers labels from a curated seed set to
the raw corpus.  The reference engine has no classifier surface (this
is additive, like the dedup/sketch families); the shapes here are the
Spark-first versions of the two standard approaches:

- ``nb_classify``: multinomial Naive Bayes over hashed unigram
  features, trained and applied in the SAME two corpus scans that the
  DSIR selector uses (``pipeline/curation.py`` —
  ``dsir_importance_weights``).  The model is a dense
  (labels x buckets) log-likelihood table — model-sized, broadcast —
  so training is one bounded-key aggregate and scoring is one
  broadcast join + per-doc sum.  No driver-side math, no iteration.
- ``knn_classify``: k-nearest-neighbor majority vote on the embedding
  column — the label-transfer / eval primitive.  Neighbor search is
  the fused one-scan ``knn_bruteforce`` kernel
  (``pipeline/similarity.py``); the vote itself is integer counting.

Float discipline (round-4 rule): per-(doc, label) score sums ride on
doubles, so ranking uses the 1e-9-nudged 6-decimal rounding with a
deterministic label tie-break — the same boundary treatment the BM25
and DSIR gates use.  Everything after ranking is integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    text_col: str = "text",
):
    """Train a multinomial Naive Bayes model on hashed unigrams.

    Returns ``(priors, loglik)``:

    - ``priors``: one row per label — ``(label, n_docs, log_prior)``
      where ``log_prior = ln(n_docs / N)``.
    - ``loglik``: the DENSE ``labels x n_buckets`` table
      ``(label, f, ll)`` with ``ll = ln((c_{l,f} + alpha) /
      (t_l + alpha * n_buckets))`` — densified so scoring never needs
      an outer join for unseen (label, bucket) pairs.

    Feature hashing is the DSIR bucket scheme (first 3 md5 nibbles mod
    ``n_buckets``, so ``n_buckets`` must be <= 4096) — replayable
    nibble-for-nibble in any md5-capable engine.  ``alpha`` should be
    an exact binary fraction (default 0.5, so ``alpha * 4096 = 2048``)
    to keep both engines dividing identical doubles.

    Scale shape: ONE tokenize+hash scan reduced to <= L*B keys
    (map-side combine; L = #labels is small by contract), then pure
    model-sized algebra.  At 100 TB the only corpus-wide cost is that
    single aggregate scan.
    """
    if n_buckets > 4096:
        raise ValueError("n_buckets must be <= 4096 (3 md5 nibbles)")

    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    feats = toks.select(
        "label",
        (F.conv(F.substring(F.md5(F.col("token")), 1, 3), 16, 10)
         .cast("int") % n_buckets).alias("f"))
    cf = feats.groupBy("label", "f").agg(F.count("*").alias("c"))
    ct = cf.groupBy("label").agg(F.sum("c").alias("t"))

    buckets = docs.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("f"))
    loglik = (
        ct.crossJoin(buckets)
        .join(cf, ["label", "f"], "left")
        .select(
            "label", "f",
            F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                  / (F.col("t") + F.lit(alpha * n_buckets))).alias("ll"))
    )

    n_l = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs"))
    n_total = docs.agg(F.count("*").alias("__N"))
    priors = n_l.crossJoin(F.broadcast(n_total)).select(
        "label", "n_docs",
        F.log(F.col("n_docs") / F.col("__N")).alias("log_prior"))
    return priors, loglik


def _nb_features(docs: DataFrame, id_col: str, label_col: str | None,
                 text_col: str, n_buckets: int) -> DataFrame:
    """Per-(doc[, label], bucket) token counts — the document feature
    vectors.  One tokenize + md5-bucket pass (the DSIR hash)."""
    cols = [F.col(id_col)]
    if label_col is not None:
        cols.append(F.col(label_col).alias("label"))
    toks = docs.select(
        *cols,
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    keys = [id_col] + (["label"] if label_col is not None else [])
    return toks.select(
        *keys,
        (F.conv(F.substring(F.md5(F.col("token")), 1, 3), 16, 10)
         .cast("int") % n_buckets).alias("f"),
    ).groupBy(*keys, "f").agg(F.count("*").alias("c"))


def _nb_model(cf: DataFrame, n_l: DataFrame, spark,
              n_buckets: int, alpha: float):
    """Dense pivoted NB model built DRIVER-SIDE from the integer count
    tables ``cf`` (cand, f, cc) and ``n_l`` (cand, n_docs).

    The model is L labels x n_buckets doubles — kilobytes — so the
    counts collect at plan build (the PQ-codebook precedent) and the
    log algebra runs in Python: ``ll = ln((cc + alpha) / (t_l + alpha
    * B))``, ``log_prior = ln(n_l / N)``.  The old cluster-side build
    (range crossJoin + dense left join + prior join + pivot) spent 7+
    exchanges and 2 BroadcastNestedLoopJoins on model-sized algebra; a
    local relation spends zero.  Cross-engine float parity: libm and
    JVM ``log`` agree to <= 1 ulp, absorbed by the score nudge-round
    (and batch and from-state paths share THIS code, so merge ==
    recompute stays bit-identical).

    Returns ``(mp, labels, prior)``: ``mp`` a one-row-per-bucket local
    DataFrame ``(f, __l0 .. __l{L-1})``, ``prior`` label -> log prior.
    """
    import math

    cf_rows = cf.collect()
    nl_rows = n_l.collect()
    labels = sorted(r["cand"] for r in nl_rows)
    idx = {lbl: i for i, lbl in enumerate(labels)}
    n_total = sum(r["n_docs"] for r in nl_rows)
    prior = {r["cand"]: math.log(r["n_docs"] / n_total) for r in nl_rows}
    t = [0] * len(labels)
    dense = [[0] * n_buckets for _ in labels]
    for r in cf_rows:
        i = idx[r["cand"]]
        dense[i][r["f"]] += r["cc"]
        t[i] += r["cc"]
    denom = [tl + alpha * n_buckets for tl in t]
    rows = [
        tuple([f] + [math.log((dense[i][f] + alpha) / denom[i])
                     for i in range(len(labels))])
        for f in range(n_buckets)
    ]
    schema = "f INT, " + ", ".join(
        f"__l{i} DOUBLE" for i in range(len(labels)))
    mp = cf.sparkSession.createDataFrame(rows, schema)
    return mp, labels, prior


def _nb_score(pre: DataFrame, mp: DataFrame, labels, prior,
              id_col: str) -> DataFrame:
    """Score per-doc feature counts against the broadcast dense model
    and take the nudge-rounded argmax (label tie-break).

    The model is PIVOTED to one row per bucket with L log-likelihood
    columns (built driver-side in ``_nb_model``), so the scoring join
    is 1:1 instead of fanning every feature row out L times, and the
    per-doc reduce carries ONE row of L partial sums per document
    through the shuffle rather than L rows — at 100 TB that is 1/L of
    the score-stage shuffle bytes.  The argmax is then pure Column
    math: ``array_min`` over (negated score, label) structs — the
    deterministic cross-engine argmin idiom.  Scores are strictly
    negative (sums of log-probabilities), so negation never produces
    IEEE -0.0."""
    carry = [c for c in pre.columns if c not in (id_col, "f", "c")]
    scored = (
        pre.join(F.broadcast(mp), "f")
        .groupBy(id_col, *carry)
        .agg(*[F.sum(F.col("c") * F.col(f"__l{i}")).alias(f"__s{i}")
               for i in range(len(labels))])
    )
    cands = F.array(*[
        F.struct(
            (-F.round(F.col(f"__s{i}") + F.lit(prior[lbl]) + F.lit(1e-9),
                      6)).alias("k"),
            F.lit(lbl).alias("cand"))
        for i, lbl in enumerate(labels)])
    best = F.array_min(cands)
    return scored.select(
        id_col, *carry, best["cand"].alias("pred"),
        (-best["k"]).alias("score"))


def nb_classify(
    docs: DataFrame,
    label_col: str = "lang",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train-and-apply multinomial Naive Bayes self-classification.

    Trains on ``label_col`` over the full input (the standard
    "label the corpus with its own metadata, then learn a text model
    that can label NEW text" recipe — applied here to the training
    rows themselves so the result is exactly checkable), then scores
    every document against every label and returns the argmax:

        ``(id, label, pred, score)``

    with ``score = ln p(label') + sum_f c_f(x) * ll(label', f)``
    maximized over labels ``label'`` (6-decimal nudge-rounded, label
    tie-break), ``label`` the document's true label.

    Scale shape: the per-(doc, bucket) count table ``pre`` is built
    ONCE (persisted — it feeds the model-build broadcast job AND the
    scoring join, like DSIR's feature table); scoring joins it to the
    broadcast dense model (L*B rows) and reduces L rows per document.
    The only corpus-wide shuffles are the ``pre`` aggregate and the
    per-doc score reduce — no vocabulary table, no driver round-trip.
    """
    if n_buckets > 4096:
        raise ValueError("n_buckets must be <= 4096 (3 md5 nibbles)")
    from xcube_spark.util import spread_small_input, tie_cache_lifetime

    # keyed spread: the per-(doc[, label], bucket) feature aggregate
    # and the per-doc score reduce cluster by the id (r12)
    docs = spread_small_input(docs, key=id_col)
    # per-(doc, label, bucket) counts — the document feature vectors;
    # persisted because they feed BOTH the model-build broadcast jobs
    # and the scoring join
    pre = _nb_features(docs, id_col, label_col, text_col,
                       n_buckets).persist()

    # model from the SAME feature table (no re-tokenize): class-feature
    # counts are a <= L*B-key aggregate of pre
    cf = pre.groupBy(F.col("label").alias("cand"), "f").agg(
        F.sum("c").alias("cc"))
    n_l = docs.groupBy(F.col(label_col).alias("cand")).agg(
        F.count("*").alias("n_docs"))
    mp, labels, prior = _nb_model(cf, n_l, docs.sparkSession,
                                  n_buckets, alpha)
    result = _nb_score(pre, mp, labels, prior, id_col)
    tie_cache_lifetime(result, pre)
    return result


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 15,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    label_col: str = "label",
) -> DataFrame:
    """k-nearest-neighbor majority-vote label transfer.

    ``corpus`` carries ``(id, vec, label)``; ``queries`` carries
    ``(query_id, vec)``.  Each query takes the label that the most of
    its ``k`` exact-cosine nearest corpus vectors carry, ties broken
    by the smaller label — the label-transfer / classifier-eval
    primitive (kNN accuracy is the standard embedding-quality probe).

    Returns ``(query_id, pred_label, votes)``.

    Scale shape: neighbor search is the fused single-scan
    ``knn_bruteforce`` kernel (|Q| x k output); the |Q|*k neighbor set
    is broadcast against the corpus label projection (big side
    streams, never shuffles), and the vote is an integer count over
    |Q|*k rows.  Everything after the ranked neighbor list is exact
    integer arithmetic — no float boundary in the vote.
    """
    from xcube_spark.pipeline.similarity import knn_bruteforce

    nbrs = knn_bruteforce(
        corpus.select(id_col, vec_col), queries, k=k,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col)
    labels = corpus.select(F.col(id_col), F.col(label_col).alias("__lbl"))
    votes = (
        labels.join(F.broadcast(nbrs.select(query_id_col, id_col)), id_col)
        .groupBy(query_id_col, "__lbl")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("votes"), F.asc("__lbl"))
    return (
        votes.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(query_id_col, F.col("__lbl").alias("pred_label"), "votes")
    )


# ---- incremental / streaming model maintenance -------------------------

#: (label, f, c): f in [0, n_buckets) are feature counts; the f = -1
#: row per label carries the label's DOCUMENT count (the prior)
NB_STATE_SCHEMA = "label STRING, f INT, c BIGINT"


def nb_count_state(
    docs: DataFrame,
    label_col: str = "lang",
    n_buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """The Naive Bayes model's MERGEABLE sufficient statistics: sparse
    (label, bucket) token counts plus per-label document counts
    (encoded as the reserved bucket ``f = -1``).  All integers, so
    states from disjoint batches merge by addition into exactly the
    single-pass state — incremental training over a growing corpus
    never re-reads old data and is value-identical to retraining
    (the probe/sketch-family contract).

    Scale shape: one tokenize+hash scan reduced map-side to <= L *
    (n_buckets + 1) rows — kilobytes of state for any corpus size.
    """
    if n_buckets > 4096:
        raise ValueError("n_buckets must be <= 4096 (3 md5 nibbles)")
    # feature counts keyed by label only (no doc id)
    toks = docs.select(
        F.col(label_col).cast("string").alias("label"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    fc = toks.select(
        "label",
        (F.conv(F.substring(F.md5(F.col("token")), 1, 3), 16, 10)
         .cast("int") % n_buckets).alias("f"),
    ).groupBy("label", "f").agg(F.count("*").alias("c"))
    dc = docs.groupBy(F.col(label_col).cast("string").alias("label")).agg(
        F.count("*").alias("c")).select(
            "label", F.lit(-1).cast("int").alias("f"), "c")
    return fc.select("label", "f", "c").unionByName(dc)


def nb_merge(state: DataFrame, batch: DataFrame,
             label_col: str = "lang", n_buckets: int = 4096,
             text_col: str = "text") -> DataFrame:
    """Fold a new document batch into an existing count state:
    O(batch) work, value-identical to rebuilding the state over the
    concatenated corpus (integer addition is associative and
    commutative)."""
    fresh = nb_count_state(batch, label_col=label_col,
                           n_buckets=n_buckets, text_col=text_col)
    return (
        state.unionByName(fresh)
        .groupBy("label", "f")
        .agg(F.sum("c").alias("c"))
    )


def nb_classify_from_state(
    state: DataFrame,
    docs: DataFrame,
    label_col: str = "lang",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained (possibly incrementally merged) count state to
    a document set — same output contract as ``nb_classify``
    (id, label, pred, score), and BIT-IDENTICAL scores when the state
    covers exactly the classified corpus (shared ``_nb_model`` /
    ``_nb_score`` op order), which is what the incremental gate pins:
    merge == recompute, exact."""
    from xcube_spark.util import spread_small_input, tie_cache_lifetime

    # keyed spread: the per-(doc[, label], bucket) feature aggregate
    # and the per-doc score reduce cluster by the id (r12)
    docs = spread_small_input(docs, key=id_col)
    cf = state.where(F.col("f") >= 0).select(
        F.col("label").alias("cand"), "f", F.col("c").alias("cc"))
    n_l = state.where(F.col("f") == -1).select(
        F.col("label").alias("cand"), F.col("c").alias("n_docs"))
    mp, labels, prior = _nb_model(cf, n_l, docs.sparkSession,
                                  n_buckets, alpha)
    pre = _nb_features(docs, id_col, label_col, text_col,
                       n_buckets).persist()
    result = _nb_score(pre, mp, labels, prior, id_col)
    tie_cache_lifetime(result, pre)
    return result


def centroid_classify(
    train: DataFrame,
    queries: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Rocchio nearest-class-mean classification on the embedding
    column: per-label centroid = mean vector over ``train``, each
    query vector assigned to the nearest centroid by L2
    (``similarity.ivf_assign``'s broadcast ``min(struct(d2, label))``
    argmin — one scan, zero corpus shuffle, exact-distance ties to the
    lowest label).

    Returns ``(id, pred_label)``.  Pass integer-valued vectors (e.g.
    int8-quantized codes) for cross-engine exactness: integer partial
    sums make every centroid mean bit-identical, and the fixed-order
    d2 fold then compares identical doubles (the ``emb_kmeans``
    discipline).

    Scale shape: the centroid build is one partial-agg mean per
    (label, dimension) — L*d reduce keys; assignment is the broadcast
    argmin scan.  Label transfer over 100 TB costs one pass.
    """
    from xcube_spark.pipeline.similarity import ivf_assign

    dims = train.select(
        F.col(label_col).alias("__lbl"),
        F.posexplode(vec_col).alias("__d", "__v"))
    cent = (
        dims.groupBy("__lbl", "__d").agg(F.avg("__v").alias("__m"))
        .groupBy("__lbl")
        .agg(F.array_sort(F.collect_list(
            F.struct("__d", "__m"))).alias("__dm"))
        .select(F.col("__lbl").alias(id_col),
                F.transform("__dm", lambda s: s["__m"]).alias(vec_col))
    )
    assigned = ivf_assign(queries.select(id_col, vec_col), cent,
                          id_col=id_col, vec_col=vec_col, dim=dim)
    return assigned.select(id_col, F.col("cell").alias("pred_label"))


# ---- iterative probes ---------------------------------------------------


def logistic_probe_train(
    feats: DataFrame,
    y_col: str,
    x_cols,
    lr: float = 0.5,
    steps: int = 6,
    round_dec: int = 7,
) -> list:
    """Train a logistic-regression probe by full-batch gradient
    descent: ``steps`` fixed iterations, each ONE map-side-combined
    aggregate over the persisted feature projection.

    The model is ``1 + len(x_cols)`` floats held on the driver —
    model-sized state, the same contract as the BPE argmax collect —
    so 100 TB training cost is exactly ``steps`` corpus scans with
    zero corpus shuffles and zero corpus-sized driver traffic.  This
    is the learned-quality-gate shape one tier up from the closed-form
    OLS probe (``curation.linear_probe``): fastText-style binary
    quality/language classifiers for pretraining-data selection are
    logistic models trained exactly like this.

    Cross-engine determinism: each gradient average and each weight
    update is nudge-rounded (``+1e-10``, ``round_dec`` decimals,
    HALF_UP — the Spark/DuckDB parity pair) INSIDE the one-row
    aggregate plan, so both engines walk the same rounded weight
    trajectory no matter how partial sums were ordered; per-row
    sigmoid terms are plain IEEE ops in a fixed left-associated shape.
    ``lr`` must be an exact binary fraction (default 0.5) so the
    update multiply is exact.

    Returns the weight list ``[b, w1, ..., wk]`` (floats on the
    rounded grid).
    """
    x_cols = list(x_cols)
    pinned = feats.select(
        F.col(y_col).cast("double").alias("_y"),
        *[F.col(c).cast("double").alias(f"_x{i}")
          for i, c in enumerate(x_cols)],
    ).persist()
    try:
        w = [0.0] * (1 + len(x_cols))
        for _ in range(steps):
            z = F.lit(w[0])
            for i in range(len(x_cols)):
                z = z + F.lit(w[i + 1]) * F.col(f"_x{i}")
            err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("_y")
            grads = [F.round(F.avg(err) + F.lit(1e-10),
                             round_dec).alias("g0")]
            grads += [
                F.round(F.avg(err * F.col(f"_x{i}")) + F.lit(1e-10),
                        round_dec).alias(f"g{i + 1}")
                for i in range(len(x_cols))
            ]
            # the update nudge is load-bearing: w is on the 1e-7 grid
            # and lr*g on the 5e-8 half-grid, so w - lr*g lands on
            # EXACT round-half midpoints systematically — and Spark's
            # BigDecimal-exact HALF_UP disagrees with DuckDB's
            # multiply-based round there.  +1e-10 moves every update
            # off the midpoint identically on both engines.
            upd = pinned.agg(*grads).select(*[
                F.round(F.lit(w[i]) - F.lit(lr) * F.col(f"g{i}")
                        + F.lit(1e-10), round_dec).alias(f"w{i}")
                for i in range(len(w))
            ])
            row = upd.first()
            w = [float(row[f"w{i}"]) for i in range(len(w))]
    finally:
        pinned.unpersist()
    return w


def logistic_probe(
    feats: DataFrame,
    y_col: str,
    x_cols,
    id_col: str = "doc_id",
    lr: float = 0.5,
    steps: int = 6,
    round_dec: int = 7,
) -> DataFrame:
    """Train (``logistic_probe_train``) and apply a logistic probe.

    Returns ``(id, y, p, pred)`` with RAW double ``p`` (round in the
    caller with the nudged-6-decimal idiom); ``pred`` is the 0.5
    threshold as an exact integer.  Scoring is one broadcast-literal
    scan — the trained weights ride into the plan as literals, so the
    apply pass is pure per-row Column math (whole-stage codegen, no
    join, no shuffle).
    """
    x_cols = list(x_cols)
    w = logistic_probe_train(feats, y_col, x_cols, lr=lr, steps=steps,
                             round_dec=round_dec)
    z = F.lit(w[0])
    for i, c in enumerate(x_cols):
        z = z + F.lit(w[i + 1]) * F.col(c).cast("double")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        F.col(id_col),
        F.col(y_col).cast("long").alias("y"),
        p.alias("p"),
        F.when(p >= F.lit(0.5), F.lit(1)).otherwise(F.lit(0))
        .cast("int").alias("pred"),
    )
