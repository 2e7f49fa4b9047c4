"""Gate queries: supervised classification + JL projection + LSH
recall evaluation (round-10 additions, driver-brief pipeline family).

The DuckDB oracles replay each pipeline exactly — md5 feature buckets
nibble-for-nibble, the same smoothing constants (exact binary
fractions), the same nudge-rounded ranking — so the value-hash compare
is strict.  Everything after ranking is integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xcube_spark.queries import query, tbl
from xcube_spark.queries.text_pipeline import _DSIR_F, _MINHASH_CTES


#: the full NB train+apply oracle — shared by the batch gate and the
#: incremental gate (whose Spark side must be value-identical:
#: merge == recompute, exact)
_NB_SQL = rf"""
        WITH toks AS (
            SELECT doc_id, lang,
                   UNNEST(regexp_split_to_array(trim(text), '\s+'))
                       AS token
            FROM documents
        ), feats AS (
            SELECT doc_id, lang, {_DSIR_F} AS f
            FROM toks WHERE token != ''
        ), pre AS (
            SELECT doc_id, lang, f, CAST(COUNT(*) AS BIGINT) AS c
            FROM feats GROUP BY doc_id, lang, f
        ), cf AS (
            SELECT lang AS cand, f, CAST(SUM(c) AS BIGINT) AS cc
            FROM pre GROUP BY lang, f
        ), ct AS (
            SELECT cand, CAST(SUM(cc) AS BIGINT) AS t FROM cf GROUP BY cand
        ), grid AS (
            SELECT ct.cand, CAST(g.f AS INT) AS f, ct.t
            FROM ct CROSS JOIN unnest(range(4096)) AS g(f)
        ), ll AS (
            SELECT grid.cand, grid.f,
                   ln((COALESCE(cf.cc, 0) + 0.5) / (grid.t + 2048.0)) AS ll
            FROM grid LEFT JOIN cf
              ON cf.cand = grid.cand AND cf.f = grid.f
        ), priors AS (
            SELECT lang AS cand,
                   ln(COUNT(*) / (SELECT COUNT(*) FROM documents))
                       AS log_prior
            FROM documents GROUP BY lang
        ), scored AS (
            SELECT pre.doc_id, pre.lang, ll.cand,
                   ROUND(SUM(pre.c * ll.ll) + p.log_prior + 1e-9, 6)
                       AS score
            FROM pre JOIN ll ON pre.f = ll.f
            JOIN priors p ON p.cand = ll.cand
            GROUP BY pre.doc_id, pre.lang, ll.cand, p.log_prior
        ), ranked AS (
            SELECT doc_id, lang, cand, score,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, cand) AS rk
            FROM scored
        )
        SELECT doc_id, lang, cand AS pred, score FROM ranked WHERE rk = 1
    """


@query("doc_nb_classify", sql=_NB_SQL)
def doc_nb_classify(spark, sf_dir):
    """nb_classify (pipeline/classify.py): multinomial Naive Bayes
    language classifier trained on the corpus's own ``lang`` labels
    and applied back to every document — the learned-gate primitive a
    training-data pipeline uses for language/domain/quality routing
    (additive surface; no reference counterpart).  One tokenize+hash
    scan builds the per-(doc, bucket) table that feeds BOTH the dense
    broadcast model (labels x 4096 buckets, DSIR md5 nibbles) and the
    per-doc score reduce; argmax rides the nudge-rounded 6-decimal
    score with a label tie-break.  Every invocation trains from the
    parquet input (no cross-invocation memo — r12 optimization-round
    contract: results are never cached across bench/oracle runs)."""
    from xcube_spark.pipeline.classify import nb_classify

    return nb_classify(tbl(spark, sf_dir, "documents"),
                       label_col="lang").select(
        "doc_id", F.col("label").alias("lang"), "pred", "score")


@query(
    "emb_knn_classify",
    sql="""
        WITH c AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 20
        ), scored AS (
            SELECT q.query_id, c.vec_id, c.label,
                   list_dot_product(c.v, q.qv)
                   / (sqrt(list_dot_product(c.v, c.v))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS cos
            FROM c, q WHERE c.vec_id >= 20
        ), ranked AS (
            SELECT query_id, label,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, vec_id) AS rank
            FROM scored
        ), votes AS (
            SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS votes
            FROM ranked WHERE rank <= 15
            GROUP BY query_id, label
        ), best AS (
            SELECT query_id, label, votes,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY votes DESC, label) AS rk
            FROM votes
        )
        SELECT query_id, label AS pred_label, votes FROM best WHERE rk = 1
    """,
)
def emb_knn_classify(spark, sf_dir):
    """knn_classify (pipeline/classify.py): 15-NN majority-vote label
    transfer from the vec_id >= 20 corpus to the first 20 vectors —
    the embedding-quality / label-propagation eval primitive.
    Neighbor search is the fused one-scan knn_bruteforce kernel; the
    |Q|*k neighbor set joins the corpus label projection broadcast
    (big side streams); the vote is integer counting with a
    (votes DESC, label ASC) tie-break."""
    from xcube_spark.pipeline.classify import knn_classify

    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("embedding"))
    corpus = emb.where(F.col("vec_id") >= 20)
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return knn_classify(corpus, queries, k=15)


@query(
    "emb_random_projection",
    sql="""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ), s AS (
            SELECT vec_id, e,
                   list_max(list_transform(e, x -> abs(x))) / 127.0
                       AS scale
            FROM v
        ), c AS (
            SELECT vec_id,
                   list_transform(e, x -> CAST(round(x / scale)
                                               AS BIGINT)) AS codes
            FROM s
        ), signs AS (
            SELECT CAST(a.j AS INT) AS j, CAST(b.d AS INT) AS d,
                   CASE WHEN (strpos('0123456789abcdef',
                                     substr(md5(CAST(a.j AS VARCHAR)
                                                || '_'
                                                || CAST(b.d AS VARCHAR)),
                                            1, 1)) - 1) % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM unnest(range(16)) AS a(j), unnest(range(64)) AS b(d)
        )
        SELECT c.vec_id, signs.j,
               CAST(SUM(signs.sgn * c.codes[signs.d + 1]) AS BIGINT)
                   AS proj
        FROM c, signs
        GROUP BY c.vec_id, signs.j
    """,
)
def emb_random_projection(spark, sf_dir):
    """random_projection_int8 (pipeline/similarity.py): +-1 Rademacher
    Johnson-Lindenstrauss sketch (64 -> 16 dims) on int8-quantized
    vectors — integer-exact end to end, so the hash compare rides no
    float summation order.  Spark evaluates the projection as literal
    sign arrays in whole-stage codegen (map-only, zero shuffle); the
    oracle replays the md5-parity sign matrix and the emb_quantize_int8
    quantization algebra."""
    from xcube_spark.pipeline.similarity import random_projection_int8

    emb = tbl(spark, sf_dir, "embeddings")
    return random_projection_int8(emb, out_dim=16, dim=64)


#: the minhash CTE chain restricted to the deterministic 25% eval
#: sample (doc_id % 4 == 0) — exact all-pairs truth is quadratic in
#: the duplicate-group size, so the recall gate evaluates a holdout
#: sample exactly like the library's sample_mod path
_MINHASH_CTES_SAMPLED = _MINHASH_CTES.replace(
    "FROM documents",
    "FROM (SELECT * FROM documents WHERE doc_id % 4 = 0)")


@query(
    "doc_lsh_recall",
    sql=f"""
        WITH {_MINHASH_CTES_SAMPLED},
        truth_c AS (
            SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS c
            FROM sh x JOIN sh y
              ON x.shingle = y.shingle AND x.doc_id < y.doc_id
            GROUP BY 1, 2
        ), tpairs AS (
            SELECT t.id_a, t.id_b
            FROM truth_c t
            JOIN sizes sa ON sa.doc_id = t.id_a
            JOIN sizes sb ON sb.doc_id = t.id_b
            WHERE t.c / (sa.n + sb.n - t.c) >= 0.8
        ), hit AS (
            SELECT tp.id_a, tp.id_b FROM tpairs tp
            WHERE EXISTS (SELECT 1 FROM cands c
                          WHERE c.id_a = tp.id_a AND c.id_b = tp.id_b)
        )
        SELECT CAST((SELECT COUNT(*) FROM tpairs) AS BIGINT) AS n_truth,
               CAST((SELECT COUNT(*) FROM cands) AS BIGINT)
                   AS n_candidates,
               CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit,
               ROUND(CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
                     / (SELECT COUNT(*) FROM tpairs) + 1e-9, 6)
                   AS recall
    """,
)
def doc_lsh_recall(spark, sf_dir):
    """lsh_recall_stats (pipeline/dedup.py): measured catch rate of
    the banded-LSH candidate stage against exact shingle-Jaccard truth
    (threshold 0.8) — the dedup analog of emb_knn_recall, what a
    pipeline owner tunes (k, hashes, bands) against.  Evaluated on the
    deterministic doc_id % 4 == 0 holdout sample (corpus-wide exact
    truth is quadratic in duplicate-group size — never affordable at
    scale; the estimator is the production shape).  The shingle table
    is built once and feeds both the signature chain and the
    shared-shingle exact-truth join; output is one row of exact counts
    plus the rounded recall ratio."""
    from xcube_spark.pipeline.dedup import lsh_recall_stats

    return lsh_recall_stats(tbl(spark, sf_dir, "documents"),
                            sample_mod=4)


@query("doc_incremental_nb", sql=_NB_SQL)
def doc_incremental_nb(spark, sf_dir):
    """Incrementally-trained Naive Bayes (pipeline/classify.py
    nb_count_state/nb_merge/nb_classify_from_state): the count state
    is built over the 'already processed' corpus (doc_id % 3 == 0), the
    rest is folded in with an O(batch) merge (integer count addition),
    and classification runs from the merged state.  The oracle is the
    SINGLE-PASS classifier over everything: passing means incremental
    training is value-identical to retraining — exact, because counts
    are associative/commutative integer sums and the from-state path
    shares the batch path's model/score op order (bit parity).  The
    streaming twin (streaming/sketch_sink.py run_nb_counts_stream)
    publishes the same state from micro-batches."""
    from xcube_spark.pipeline.classify import (nb_classify_from_state,
                                               nb_count_state, nb_merge)

    docs = tbl(spark, sf_dir, "documents")
    state = nb_count_state(docs.where(F.col("doc_id") % 3 == 0),
                           label_col="lang")
    merged = nb_merge(state, docs.where(F.col("doc_id") % 3 != 0),
                      label_col="lang")
    out = nb_classify_from_state(merged, docs, label_col="lang")
    return out.select("doc_id", F.col("label").alias("lang"),
                      "pred", "score")


def _rocchio_d2_sql(x: str, c: str, dim: int = 64) -> str:
    # the fixed left-to-right IEEE op sequence of ivf_assign's fold
    # (acc starts 0.0) — the emb_kmeans d2 idiom
    terms = [f"({x}[{i}] - {c}[{i}]) * ({x}[{i}] - {c}[{i}])"
             for i in range(1, dim + 1)]
    expr = "(0.0 + " + terms[0] + ")"
    for t in terms[1:]:
        expr = f"({expr} + {t})"
    return expr


_ROCCHIO_D2 = _rocchio_d2_sql("v.codes", "cent.cent")


@query(
    "emb_centroid_classify",
    sql=f"""
        WITH e AS MATERIALIZED (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ), v AS MATERIALIZED (
            SELECT vec_id, label,
                   list_transform(
                       emb, x -> round(
                           x / (list_max(list_transform(
                                    emb, y -> abs(y))) / 127.0)))
                       AS codes
            FROM e
        ), cent AS MATERIALIZED (
            SELECT label AS cid, list(m ORDER BY i) AS cent
            FROM (
                SELECT label, s.i, avg(codes[s.i]) AS m
                FROM v, generate_series(1, 64) s(i)
                WHERE vec_id >= 20
                GROUP BY label, s.i
            )
            GROUP BY label
        ), a AS (
            SELECT v.vec_id, v.label,
                   min(struct_pack(d := {_ROCCHIO_D2},
                                   cid := cent.cid)).cid AS pred
            FROM v, cent
            GROUP BY v.vec_id, v.label
        )
        SELECT label, pred AS pred_label,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM a GROUP BY label, pred
    """,
)
def emb_centroid_classify(spark, sf_dir):
    """centroid_classify (pipeline/classify.py): Rocchio nearest-
    class-mean classification — per-label centroids trained on the
    vec_id >= 20 corpus, EVERY vector assigned to its nearest
    centroid, reported as the confusion matrix (label, pred_label, n).
    Vectors are int8-quantized first so the centroid means are exact
    identical doubles cross-engine, and d2 is the same left-to-right
    fold (unrolled in the oracle) — the emb_kmeans exactness
    discipline.  One partial-agg centroid build (L x d reduce keys) +
    one broadcast argmin scan; confusion counts are exact integers."""
    from xcube_spark.pipeline.classify import centroid_classify

    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("e"))
    codes = emb.select(
        "vec_id", "label",
        F.transform(
            "e",
            lambda x: F.round(
                x / (F.array_max(F.transform("e", lambda y: F.abs(y)))
                     / F.lit(127.0)))).alias("codes"))
    train = codes.where(F.col("vec_id") >= 20)
    pred = centroid_classify(train, codes, label_col="label",
                             id_col="vec_id", vec_col="codes", dim=64)
    return (
        codes.select("vec_id", "label")
        .join(pred, "vec_id")
        .groupBy("label", "pred_label")
        .agg(F.count("*").alias("n"))
    )


def _logreg_sql(steps: int = 6, lr: float = 0.5, dec: int = 7) -> str:
    """Unrolled gradient-descent twin of ``classify.logistic_probe``:
    one CTE pair (gradient aggregate, weight update) per step, every
    float expression in the SAME left-associated shape and on the same
    nudge-rounded grid as the Spark plan."""
    ctes = [
        r"""f AS (
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                   CAST(len(regexp_split_to_array(trim(text), '\s+'))
                        AS DOUBLE) * 0.01 AS x1,
                   CAST(length(text) - length(replace(text, 'a', ''))
                        AS DOUBLE) * 0.01 AS x2
            FROM documents
        )""",
        "w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2)",
    ]
    for s in range(steps):
        z = f"((w{s}.b + (w{s}.w1 * f.x1)) + (w{s}.w2 * f.x2))"
        p = f"(1.0 / (1.0 + exp(-{z})))"
        ctes.append(
            f"""g{s} AS (
            SELECT round(avg(({p} - f.y)) + 1e-10, {dec}) AS g0,
                   round(avg((({p} - f.y) * f.x1)) + 1e-10, {dec}) AS g1,
                   round(avg((({p} - f.y) * f.x2)) + 1e-10, {dec}) AS g2
            FROM f, w{s}
        )""")
        ctes.append(
            f"""w{s + 1} AS (
            SELECT round(w{s}.b - ({lr!r} * g{s}.g0) + 1e-10, {dec})
                       AS b,
                   round(w{s}.w1 - ({lr!r} * g{s}.g1) + 1e-10, {dec})
                       AS w1,
                   round(w{s}.w2 - ({lr!r} * g{s}.g2) + 1e-10, {dec})
                       AS w2
            FROM w{s}, g{s}
        )""")
    zf = (f"((w{steps}.b + (w{steps}.w1 * f.x1))"
          f" + (w{steps}.w2 * f.x2))")
    pf = f"(1.0 / (1.0 + exp(-{zf})))"
    return (
        "WITH " + ",\n        ".join(ctes) + f"""
        SELECT f.doc_id,
               CAST(f.y AS BIGINT) AS y,
               round(round({pf} + 1e-9, 6) + 0.0, 6) AS p,
               CAST(CASE WHEN {pf} >= 0.5 THEN 1 ELSE 0 END AS INT)
                   AS pred
        FROM f, w{steps}
    """)


@query("doc_logreg_probe", sql=_logreg_sql())
def doc_logreg_probe(spark, sf_dir):
    """logistic_probe (pipeline/classify.py): a fastText-style binary
    quality/language gate trained by full-batch gradient descent — 6
    fixed steps, each ONE map-side-combined aggregate over the
    persisted feature projection, model = 3 driver floats (the
    model-sized-collect contract), scoring = one literal-broadcast
    codegen scan.  This is the iterative tier above the closed-form
    OLS probe: the "train a classifier over 100 TB in k scans" shape
    (additive surface; no reference counterpart).  Label: lang = 'en';
    features: token count and 'a'-count, scaled by 0.01.  The oracle
    unrolls the identical 6-step trajectory in chained CTEs; every
    gradient average and weight update is nudge-rounded to 7 decimals
    on both engines, so the weight path is grid-locked and the final
    per-row sigmoid differs only in sub-nudge ulps.  Every invocation
    re-runs the 6 training actions from the parquet input (no
    cross-invocation memo — r12 optimization-round contract)."""
    from xcube_spark.pipeline.classify import logistic_probe

    docs = tbl(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(1.0))
        .otherwise(F.lit(0.0)).alias("y"),
        (F.size(F.split(F.trim(F.col("text")), r"\s+"))
         .cast("double") * F.lit(0.01)).alias("x1"),
        ((F.length("text")
          - F.length(F.expr("replace(text, 'a', '')")))
         .cast("double") * F.lit(0.01)).alias("x2"),
    )
    out = logistic_probe(feats, "y", ["x1", "x2"], lr=0.5, steps=6)
    return out.select(
        "doc_id", "y",
        F.round(F.round(F.col("p") + 1e-9, 6) + 0.0, 6).alias("p"),
        "pred")


def _dot_sql(a: str, b: str, dim: int = 64) -> str:
    """Unrolled left-associated dot product — the SQL twin of
    similarity._dot_unrolled."""
    expr = f"({a}[1] * {b}[1])"
    for i in range(2, dim + 1):
        expr = f"({expr} + ({a}[{i}] * {b}[{i}]))"
    return expr


_COH_COS = (f"{_dot_sql('v.codes', 'cent.cent')} / "
            f"(sqrt({_dot_sql('v.codes', 'v.codes')})"
            f" * sqrt({_dot_sql('cent.cent', 'cent.cent')}))")


@query(
    "emb_label_cohesion",
    sql=f"""
        WITH e AS MATERIALIZED (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ), v AS MATERIALIZED (
            SELECT vec_id, label,
                   list_transform(
                       emb, x -> round(
                           x / (list_max(list_transform(
                                    emb, y -> abs(y))) / 127.0)))
                       AS codes
            FROM e
        ), cent AS MATERIALIZED (
            SELECT label AS clbl, list(m ORDER BY i) AS cent
            FROM (
                SELECT label, s.i, avg(codes[s.i]) AS m
                FROM v, generate_series(1, 64) s(i)
                GROUP BY label, s.i
            )
            GROUP BY label
        )
        SELECT v.label,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(ROUND(AVG({_COH_COS}) + 1e-9, 6) + 0.0, 6)
                   AS cohesion
        FROM v JOIN cent ON cent.clbl = v.label
        GROUP BY v.label
    """,
)
def emb_label_cohesion(spark, sf_dir):
    """label_cohesion (pipeline/similarity.py): per-label mean cosine
    of members to their own label centroid — the cohesion half of a
    silhouette score, the "are these labels separable in embedding
    space?" health check before training on them.  Vectors
    int8-quantize first so centroid means are exact integer sums
    divided once; each cosine is the unrolled fixed-order fold shared
    bit-for-bit with the oracle; only the per-label mean is an
    order-free float sum (nudge-rounded to 6).  Scale: one (label,
    dim) reduce + broadcast centroids + an L-key mean — corpus
    touched twice, nothing corpus-sized shuffles."""
    from xcube_spark.pipeline.similarity import label_cohesion

    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("e"))
    codes = emb.select(
        "vec_id", "label",
        F.transform(
            "e",
            lambda x: F.round(
                x / (F.array_max(F.transform("e", lambda y: F.abs(y)))
                     / F.lit(127.0)))).alias("codes"))
    out = label_cohesion(codes, label_col="label", id_col="vec_id",
                         vec_col="codes", dim=64)
    return out.select(
        "label", "n",
        F.round(F.round(F.col("cohesion") + 1e-9, 6) + 0.0, 6)
        .alias("cohesion"))
