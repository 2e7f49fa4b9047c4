"""Sketch-based corpus statistics: HyperLogLog cardinality, Bloom
decontamination, weighted reservoir sampling (SURVEY LLM-pipeline
family; the reference's curation analogues live in its dataset tooling
rather than the cube core, so these are additive scale operators).

At 100 TB, exact answers to "how many distinct documents", "does this
n-gram appear in the eval suites", and "draw k docs proportional to
quality" are either a full shuffle (COUNT DISTINCT), a join against
every corpus row (decontamination), or a global sort (sampling).  The
sketch forms here replace them with one scan + model-sized state:

- :func:`hll_cardinality` — a HyperLogLog whose registers are an
  ordinary ``groupBy(register).max(rho)`` (m rows of state, partial
  aggregation map-side, ONE tiny shuffle of <= m rows per partition);
- :func:`bloom_filter_build` / :func:`bloom_decontaminate` — the
  benchmark side collapses to an m-bit bitmap (kilobytes) broadcast to
  every executor, so the corpus is filtered map-side with NO shuffle
  and NO join (the exact :func:`~xcube_spark.pipeline.curation.
  decontaminate` keeps a gram join; the bloom form is what survives
  when the corpus is 100 TB and the eval suites are fixed);
- :func:`weighted_sample` — Efraimidis–Spirakis A-ES priorities
  (``u^(1/w)``) + ``ORDER BY ... LIMIT k``, which Spark executes as
  TakeOrderedAndProject: a per-partition top-k then a k-row driver
  merge — never a global sort.

Determinism contract (same as pipeline/dedup.py): all randomness is
md5-derived, so every register, bit position, and priority is
reproducible bit-for-bit in any engine with md5 — the DuckDB oracles
state the identical arithmetic.  Floating aggregation is avoided
entirely in the HLL sum (the harmonic denominator is accumulated as an
INTEGER: each register contributes 2^(53-rho), exact in int64 for
m <= 2^20), so partial-aggregation order cannot perturb the estimate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "hll_cardinality",
    "bloom_filter_build",
    "bloom_decontaminate",
    "weighted_sample",
    "cms_build",
    "cms_merge",
    "cms_top_k",
    "ngram_occurrences",
    "cms_heavy_hitters",
    "hll_state",
    "hll_merge",
    "hll_estimate",
    "hll_overlap",
    "kmv_state",
    "kmv_merge",
    "kmv_estimate",
    "kmv_set_ops",
    "kmv_sql",
    "kmv_set_ops_sql",
    "sample_state",
    "sample_merge",
    "sample_quantiles",
    "sample_quantiles_sql",
]

#: rho window width in bits: 13 hex chars of the md5 after the
#: register prefix (fits signed int64; rho in 1..53)
_HLL_W_BITS = 52


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _rho_sql(w: str) -> str:
    """rho(w) = leading zeros of the 52-bit window + 1, stated as 52
    exact integer comparisons (w < 2^j is true exactly when
    bit_length(w) <= j, so the count of true terms IS 53 -
    bit_length(w) = rho; w = 0 gives 52, fixed up to 53).  Pure
    integer CASE arithmetic — no log2/float anywhere, identical text
    on both engines."""
    terms = " + ".join(
        f"(CASE WHEN {w} < {1 << j} THEN 1 ELSE 0 END)"
        for j in range(1, _HLL_W_BITS + 1)
    )
    return f"(CASE WHEN {w} = 0 THEN 53 ELSE {terms} END)"


def hll_cardinality(
    df: DataFrame,
    col: str,
    p: int = 8,
) -> DataFrame:
    """HyperLogLog distinct-count estimate of ``col`` (Flajolet et al.
    2007), md5-deterministic, returned as ONE row:

    ``(m, n_zero_registers, raw_estimate, estimate)``

    ``p`` must be a multiple of 4 (the register index is the first
    p/4 hex chars of the md5, the 52-bit rho window the next 13).
    ``estimate`` applies the standard small-range linear-counting
    correction (``m ln(m/V)`` when raw <= 2.5 m and V > 0).

    Scale shape: ``groupBy(register).agg(max(rho))`` — partial
    aggregation reduces every task to <= m rows before the only
    shuffle; the final reduction is integer-exact (see module
    docstring), so the estimate is independent of partitioning.

    Spark's own ``approx_count_distinct`` is the production fast path;
    this operator exists because its HLL++ registers are
    engine-private — here every bit is specified, so the DuckDB twin
    reproduces the estimate exactly (the correctness gate needs
    value-identical output, not just statistically-similar output).
    """
    return hll_estimate(hll_state(df, col, p), p)


def _hll_rows(df: DataFrame, col: str, p: int) -> DataFrame:
    """Pre-aggregate HLL rows ``(reg, rho)`` — one per input row; the
    register state is their per-reg max."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    nhex = p // 4
    h = F.md5(F.col(col).cast("string"))
    idx = F.conv(F.substring(h, 1, nhex), 16, 10).cast("long")
    w = F.conv(F.substring(h, nhex + 1, 13), 16, 10).cast("long")
    return (
        df.select(idx.alias("reg"), w.alias("w"))
        .withColumn("rho", F.expr(_rho_sql("w")))
        .select("reg", "rho")
    )


def hll_state(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """The HLL register table ``(reg, rho)`` for one input — the
    sketch STATE.  Registers merge by ``max(rho)``, which is
    associative, commutative and idempotent, so incremental
    maintenance (:func:`hll_merge`) is exactly equivalent to a
    single-pass recompute — not just statistically, value-for-value."""
    return (
        _hll_rows(df, col, p)
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(state: DataFrame, df: DataFrame, col: str,
              p: int = 8) -> DataFrame:
    """Fold a new batch into an HLL register state: union + max.
    Cost is one batch-sized scan plus a <= m-row merge — independent
    of how much corpus the state already summarizes."""
    return (
        state.unionByName(hll_state(df, col, p))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, p: int = 8) -> DataFrame:
    """Finalize a register state into the one-row estimate (see
    :func:`hll_cardinality` for the output columns)."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    m = 1 << p
    alpha_m2 = _hll_alpha(m) * m * m  # one python-float literal
    # integer harmonic accumulator: each register adds 2^(53 - rho)
    # COALESCE(s, 0): SUM over zero rows is NULL, which would leak a
    # NULL raw_estimate/estimate for an empty input.  With s = 0 the
    # raw estimate falls to alpha*m and the linear-counting branch
    # (v = m zero registers) yields the correct estimate of 0.
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.coalesce(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - rho)")),
            F.lit(0).cast("long"),
        ).alias("s"),
    )
    two53 = float(1 << 53)
    out = agg.select(
        F.lit(m).cast("int").alias("m"),
        (F.lit(m) - F.col("n_regs")).cast("long")
        .alias("n_zero_registers"),
        (F.lit(alpha_m2) * F.lit(two53)
         / (F.col("s") + (F.lit(m).cast("long") - F.col("n_regs"))
            * F.lit(1 << 53).cast("long")).cast("double"))
        .alias("raw_estimate"),
    )
    v = F.col("n_zero_registers")
    raw = F.col("raw_estimate")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return out.select(
        "m", "n_zero_registers",
        F.round(raw, 4).alias("raw_estimate"),
        F.round(est, 4).alias("estimate"),
    )


def hll_sql(col: str, src: str, p: int = 8) -> str:
    """The SAME HyperLogLog as a DuckDB CTE chain over ``src`` —
    identical hashing, identical integer accumulation, identical
    correction branch (op-order parity with :func:`hll_cardinality`).
    Emits a complete SELECT (one row)."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    m = 1 << p
    nhex = p // 4
    alpha_m2 = _hll_alpha(m) * m * m
    two53 = float(1 << 53)
    nib = "strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1"
    idx = " + ".join(
        f"(({nib.format(pos=i + 1)}) * {16 ** (nhex - 1 - i)})"
        for i in range(nhex)
    )
    wexpr = " + ".join(
        f"(CAST(({nib.format(pos=nhex + 1 + i)}) AS BIGINT)"
        f" * {16 ** (13 - 1 - i)})"
        for i in range(13)
    )
    return f"""
        WITH hashed AS (
            SELECT md5(CAST({col} AS VARCHAR)) AS h FROM {src}
        ), rw AS (
            SELECT ({idx}) AS reg, ({wexpr}) AS w FROM hashed
        ), regs AS (
            SELECT reg, MAX({_rho_sql('w')}) AS rho
            FROM rw GROUP BY reg
        ), agg AS (
            SELECT COUNT(*) AS n_regs,
                   COALESCE(SUM(CAST(1 AS BIGINT) << (53 - rho)),
                            CAST(0 AS BIGINT)) AS s
            FROM regs
        ), o AS (
            SELECT CAST({m} AS INT) AS m,
                   CAST({m} - n_regs AS BIGINT) AS n_zero_registers,
                   (CAST({alpha_m2!r} AS DOUBLE)
                    * CAST({two53!r} AS DOUBLE)
                    / CAST(s + ({m} - n_regs) * (CAST(1 AS BIGINT) << 53)
                           AS DOUBLE)) AS raw_estimate
            FROM agg
        )
        SELECT m, n_zero_registers,
               ROUND(raw_estimate, 4) AS raw_estimate,
               ROUND(CASE WHEN raw_estimate <= CAST({2.5 * m!r} AS DOUBLE)
                           AND n_zero_registers > 0
                          THEN CAST({float(m)!r} AS DOUBLE)
                               * ln(CAST({float(m)!r} AS DOUBLE)
                                    / CAST(n_zero_registers AS DOUBLE))
                          ELSE raw_estimate END, 4) AS estimate
        FROM o
    """


# ---------------------------------------------------------------------------
# Bloom-filter decontamination


def _bloom_pos(gram: Column, i: int, m_bits: int) -> Column:
    """i-th bit position of a gram: 60 md5 bits mod m_bits (m_bits a
    power of two keeps the modulo a mask — exact on both engines)."""
    h = F.md5(F.concat(gram, F.lit(f"#bloom{i}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") \
        % F.lit(m_bits).cast("long")


def _bloom_pos_sql_spark(gram_col: str, i: int, m_bits: int) -> str:
    """The same position as a Spark-SQL string (for shiftleft, whose
    python wrapper only takes literal shift counts)."""
    return (f"(CAST(conv(substring(md5(concat({gram_col}, "
            f"'#bloom{i}')), 1, 15), 16, 10) AS BIGINT) % {m_bits})")


def bloom_filter_build(
    grams: DataFrame,
    gram_col: str = "ngram",
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Aggregate a gram set into an m_bits Bloom bitmap: ONE row with
    an ``array<long>`` of ``m_bits/64`` words (bit_or per word).

    Two stages total: one partial-agg shuffle keyed by word index
    (<= m_bits/64 rows reach the reduce side) and one single-row agg
    that densifies the sparse words with ``map_from_entries`` +
    ``transform(sequence(...))`` — absent words coalesce to 0.  No
    ``distinct`` (bit_or is idempotent, duplicate grams set the same
    bits) and no zero-fill join: both were measurable job-floor cost
    at small scale and pure overhead at large scale."""
    if m_bits % 64 != 0 or m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two >= 64")
    n_words = m_bits // 64
    # all expressions as parsed SQL strings: the Column-API form of
    # this chain cost hundreds of py4j round trips per plan build
    # (guide §1 measure-first, r12 — same trees, one parse each)
    allpos = grams.selectExpr(
        "explode(array("
        + ", ".join(_bloom_pos_sql_spark(gram_col, i, m_bits)
                    for i in range(k))
        + ")) AS pos"
    )
    words = allpos.selectExpr(
        "CAST(pos / 64 AS BIGINT) AS word_idx",
        "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS mask",
    ).groupBy("word_idx").agg(F.expr("bit_or(mask)").alias("word"))
    sparse = words.agg(F.expr(
        "map_from_entries(collect_list(struct(word_idx, word)))"
    ).alias("__m"))
    return sparse.selectExpr(
        f"transform(sequence(CAST(0 AS BIGINT), "
        f"CAST({n_words - 1} AS BIGINT)), "
        f"i -> coalesce(element_at(__m, i), 0)) AS bloom"
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 16,
    k: int = 3,
    max_hits: int = 0,
    bloom: DataFrame | None = None,
) -> DataFrame:
    """Benchmark-overlap decontamination through a broadcast Bloom
    filter — the shuffle-free twin of :func:`~xcube_spark.pipeline.
    curation.decontaminate`.

    The benchmark's distinct n-grams collapse into an ``m_bits``
    bitmap (ONE row, kilobytes); the corpus side computes each gram's
    k bit positions and tests them against the broadcast bitmap
    map-side — the corpus is never shuffled and never joined on gram
    strings.  ``n_hits`` counts the doc's distinct grams whose k bits
    are ALL set, so it is an upper bound on the exact overlap (Bloom
    false positives are possible, never false negatives; the rate is
    ``(1 - e^(-k g / m))^k`` for g benchmark grams).  Returns
    ``(doc_id, n_hits, contaminated)`` for every corpus doc.

    The answer is exactly reproducible (md5 bit positions, fixed k),
    so the DuckDB oracle re-derives the identical bitmap and flags —
    the gate checks the bloom SEMANTICS, not just statistics.

    Pass a prebuilt ``bloom`` (one row from :func:`bloom_filter_build`,
    ideally ``.persist()``-ed) to amortize the bitmap across calls —
    the production shape: a decontamination filter is built once per
    benchmark suite and probed by every corpus shard, so rebuilding
    its 4-job chain per batch is pure scheduling overhead.
    """
    from xcube_spark.pipeline.curation import ngrams, ngrams_narrow

    if bloom is None:
        if benchmark is None:
            raise ValueError("pass either benchmark or a prebuilt bloom")
        # benchmark side: narrow (no window/distinct) gram form — the
        # set is small by definition and bit_or is duplicate-proof, so
        # the two shuffles the windowed form needs are job-floor cost
        bench = ngrams_narrow(benchmark, text_col, n)
        bloom = bloom_filter_build(bench, "ngram", m_bits=m_bits, k=k)

    grams = ngrams(corpus, text_col, n)
    probe = grams.crossJoin(F.broadcast(bloom)).withColumns({
        # materialize each md5 position ONCE per gram (the word lookup
        # and the mask both need it; recomputing doubles the md5 cost
        # on the corpus-sized side).  Parsed SQL strings, not Column
        # calls — same trees, a fraction of the py4j round trips (r12)
        f"__p{i}": F.expr(_bloom_pos_sql_spark("ngram", i, m_bits))
        for i in range(k)
    })
    hit_sql = " AND ".join(
        f"((element_at(bloom, (CAST(__p{i} / 64 AS INT) + 1))"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 64 AS INT)))"
        f" != 0)"
        for i in range(k))
    hits = (
        probe.where(F.expr(hit_sql))
        .groupBy("doc_id")
        .agg(F.expr("count(1)").alias("n_hits"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "coalesce(n_hits, 0) AS n_hits",
            f"(coalesce(n_hits, 0) > {max_hits}) AS contaminated",
        )
    )


# ---------------------------------------------------------------------------
# weighted sampling


def weighted_sample(
    df: DataFrame,
    weight: Column,
    k: int,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES, 2006): every row gets priority ``u^(1/w)`` with ``u`` a
    deterministic md5-uniform in (0, 1); the k largest priorities ARE
    a weighted sample without replacement.

    ``ORDER BY priority DESC LIMIT k`` lowers to
    TakeOrderedAndProject: each task keeps its local top-k and the
    driver merges k-row heaps — one pass, no global sort, no shuffle
    of the corpus.  That is the 100 TB shape for "give me 10k docs
    proportional to quality".

    Weights must be strictly positive, and this IS enforced: a
    weight <= 0 raises at execution time (silently, weight 0 would
    give priority u^inf = 0 and exclude the row; a negative weight
    would give priority > 1 and dominate the sample).  Returns
    ``(id_col, weight, priority)`` with priority rounded to 6
    decimals for cross-engine hashing (u is (h52 + 1) / (2^52 + 2),
    never exactly 0 or 1; 52 bits so the int -> double hop is exact).
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"),
                       F.lit(f"#{seed}")))
    h52 = F.conv(F.substring(h, 1, 13), 16, 10).cast("double")
    u = (h52 + F.lit(1.0)) / F.lit(float((1 << 52) + 2))
    w = weight.cast("double")
    wchk = F.when(w > 0, w).otherwise(F.raise_error(F.concat(
        F.lit("weighted_sample: weight must be > 0, got "),
        w.cast("string"))))
    pri = F.pow(u, F.lit(1.0) / wchk)
    return (
        df.select(
            F.col(id_col),
            weight.cast("double").alias("weight"),
            pri.alias("__pri"),
        )
        .orderBy(F.col("__pri").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("weight", 6).alias("weight"),
                F.round("__pri", 6).alias("priority"))
    )


# ---------------------------------------------------------------------------
# count-min sketch heavy hitters


def _cms_pos_sql(gram_col: str, i: int, w: int) -> str:
    """Counter index of gram in CMS row i: low bits of 60 md5 bits
    (w a power of two), as a Spark-SQL string."""
    return (f"(CAST(conv(substring(md5(concat({gram_col}, "
            f"'#cms{i}')), 1, 15), 16, 10) AS BIGINT) % {w})")


def cms_build(
    grams: DataFrame,
    gram_col: str = "ngram",
    d: int = 4,
    w: int = 1 << 10,
) -> DataFrame:
    """Count-min sketch of a gram stream: ``d`` independent md5 hash
    rows of ``w`` counters each, returned as (row, pos, cnt) —
    at most ``d * w`` rows of state regardless of corpus size.

    Scale shape: the only shuffle keys on (row, pos), a key space of
    d*w (thousands) — partial aggregation collapses every task to
    <= d*w rows before the exchange, so sketch construction is ONE
    scan + a kilobyte-scale shuffle even over 100 TB of text.  (An
    exact heavy-hitter count would shuffle every distinct gram.)
    """
    if w & (w - 1) or w < 2:
        raise ValueError("w must be a power of two >= 2")
    pairs = grams.select(
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                F.expr(_cms_pos_sql(gram_col, i, w)).alias("pos"),
            )
            for i in range(d)
        ])).alias("rp")
    )
    return (
        pairs.select("rp.row", "rp.pos")
        .groupBy("row", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(
    corpus: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 20,
    d: int = 4,
    w: int = 1 << 10,
    candidate_mod: int = 11,
) -> DataFrame:
    """Top-k most frequent word n-grams, estimated from a count-min
    sketch (Cormode & Muthukrishnan 2005) probed with a deterministic
    candidate sample.

    Two scans, both bounded-state: (1) every gram OCCURRENCE updates
    the d x w sketch (see :func:`cms_build`); (2) candidate grams —
    the distinct grams of docs with ``doc_id % candidate_mod == 0`` —
    probe the broadcast sketch and take ``min`` over the d rows (the
    CMS upper bound, exact for true heavy hitters with high
    probability).  A truly frequent gram appears in the sample with
    overwhelming probability, so the candidate set misses only
    near-threshold tails; nothing corpus-sized is grouped, joined, or
    sorted.  Returns ``(ngram, est_count)``, the k largest estimates
    (ties broken by gram string — integer counts, no float
    boundary).
    """
    from xcube_spark.pipeline.curation import ngrams

    sketch = cms_build(
        ngram_occurrences(corpus, text_col, n), "ngram", d=d, w=w)
    cands = (
        ngrams(corpus.where(F.col("doc_id") % candidate_mod == 0),
               text_col, n)
        .select("ngram").distinct()
    )
    return cms_top_k(sketch, cands, k=k, d=d, w=w)


def ngram_occurrences(corpus: DataFrame, text_col: str = "text",
                      n: int = 2) -> DataFrame:
    """Every word n-gram OCCURRENCE per doc (the stream a CMS counts;
    :func:`~xcube_spark.pipeline.curation.ngrams` dedups per doc —
    this reuses its codegen posexplode+lead shape without the
    distinct)."""
    from pyspark.sql import Window as W

    pos_toks = corpus.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+"))
        .alias("pos", "__tok"),
    )
    wspec = W.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("__tok")] + [
        F.lead("__tok", j).over(wspec) for j in range(1, n)
    ]
    return (
        pos_toks.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("ngram"),
            F.lead("__tok", n - 1).over(wspec).alias("__full"),
        )
        .where(F.col("__full").isNotNull())
        .select("doc_id", "ngram")
    )


def cms_top_k(sketch: DataFrame, candidates: DataFrame, k: int = 20,
              d: int = 4, w: int = 1 << 10) -> DataFrame:
    """Probe a CMS state with candidate grams (min over the d rows —
    the CMS upper bound) and return the k largest estimates, gram
    tie-break."""
    probes = candidates.select(
        "ngram",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                F.expr(_cms_pos_sql("ngram", i, w)).alias("pos"),
            )
            for i in range(d)
        ])).alias("rp"),
    ).select("ngram", "rp.row", "rp.pos")
    est = (
        probes.join(F.broadcast(sketch), ["row", "pos"])
        .groupBy("ngram")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.orderBy(F.col("est_count").desc(), F.col("ngram"))
        .limit(k)
        .select("ngram", "est_count")
    )


def cms_merge(state: DataFrame, grams: DataFrame,
              gram_col: str = "ngram", d: int = 4,
              w: int = 1 << 10) -> DataFrame:
    """Fold a new gram batch into a CMS state: union + sum.  Counter
    addition is associative and commutative, so the merged sketch is
    value-identical to rebuilding over the full stream."""
    return (
        state.unionByName(cms_build(grams, gram_col, d=d, w=w))
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hll_overlap(df_a: DataFrame, df_b: DataFrame, col: str,
                p: int = 8) -> DataFrame:
    """Set-algebra estimates from HLL registers: ``est_a``, ``est_b``,
    ``est_union`` (the registers' max-merge IS the union sketch —
    exact HLL semantics, not an approximation of an approximation),
    and ``est_intersection`` by inclusion–exclusion (a + b - union,
    the standard HLL intersection estimator; its error grows as the
    true overlap shrinks relative to the union).  One row, all values
    rounded to 4.

    Plan shape (r13): ONE side-tagged register merge + ONE scalar
    aggregate carrying all three (n_regs, harmonic-sum) pairs — the
    former three ``hll_estimate`` branches chained two
    BroadcastNestedLoopJoins and re-aggregated the a/b subtrees for
    the union.  Per-register maxima, the integer harmonic sums and
    the estimator arithmetic are value-identical (same expressions
    over the same exact integers)."""
    m = 1 << p
    alpha_m2 = _hll_alpha(m) * m * m
    two53 = float(1 << 53)
    rows = (
        _hll_rows(df_a, col, p).select(
            "reg", "rho", F.lit(0).alias("__side"))
        .unionByName(_hll_rows(df_b, col, p).select(
            "reg", "rho", F.lit(1).alias("__side")))
    )
    memb = rows.groupBy("reg").agg(
        F.max(F.when(F.col("__side") == 0, F.col("rho"))).alias("rho_a"),
        F.max(F.when(F.col("__side") == 1, F.col("rho"))).alias("rho_b"),
    ).withColumn("rho_u", F.greatest("rho_a", "rho_b"))

    def _ns(rho_col: str, tag: str) -> list:
        # per-sketch (n_regs, integer harmonic sum) — NULL rhos are
        # registers the sketch does not hold; COALESCE matches
        # hll_estimate's empty-input contract
        return [
            F.count(F.col(rho_col)).alias(f"n_{tag}"),
            F.coalesce(
                F.sum(F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), 53 - {rho_col})")),
                F.lit(0).cast("long")).alias(f"s_{tag}"),
        ]

    agg = memb.agg(*(_ns("rho_a", "a") + _ns("rho_b", "b")
                     + _ns("rho_u", "u")))

    def _est(tag: str) -> Column:
        # the exact hll_estimate arithmetic (raw + linear-counting
        # branch) inlined per sketch
        v = (F.lit(m) - F.col(f"n_{tag}")).cast("long")
        raw = (F.lit(alpha_m2) * F.lit(two53)
               / (F.col(f"s_{tag}")
                  + v * F.lit(1 << 53).cast("long")).cast("double"))
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
        ).otherwise(raw)
        return F.round(est, 4)

    return agg.select(
        _est("a").alias("est_a"),
        _est("b").alias("est_b"),
        _est("u").alias("est_union"),
        F.round(_est("a") + _est("b") - _est("u"), 4)
        .alias("est_intersection"),
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch: distinct counts with DIRECT intersection + Jaccard


#: KMV hash domain: the first 13 md5 hex chars as a 52-bit integer
#: (exact in int64 AND in a double, so theta arithmetic is lossless)
_KMV_DOMAIN = 1 << 52


def _kmv_w(col: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 13), 16, 10
    ).cast("long")


def kmv_state(df: DataFrame, col: str, k: int = 128) -> DataFrame:
    """The KMV (k-minimum-values) sketch state of ``col``: the ``k``
    smallest DISTINCT 52-bit md5 hash values, one ``w`` column
    (Bar-Yossef et al. 2002; the theta sketch's kept set).

    Scale shape: the distinct is a partial-aggregated groupBy (every
    task reduces to its own candidates first) and the k-smallest is
    ``ORDER BY w LIMIT k`` — Spark executes TakeOrderedAndProject, a
    per-partition top-k then a k-row driver merge, never a global
    sort.  State is <= k rows no matter the corpus size, and merging
    (:func:`kmv_merge`) is associative/commutative/idempotent, so
    incremental maintenance equals a single-pass recompute
    value-for-value."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.select(_kmv_w(col).alias("w"))
        .distinct()
        .orderBy("w")
        .limit(k)
    )


def kmv_merge(state: DataFrame, df: DataFrame, col: str,
              k: int = 128) -> DataFrame:
    """Fold a new batch into a KMV state: union, distinct, keep the
    k smallest.  Cost: one batch scan + a <= 2k-row merge."""
    return (
        state.unionByName(df.select(_kmv_w(col).alias("w")))
        .distinct()
        .orderBy("w")
        .limit(k)
    )


def kmv_estimate(state: DataFrame, k: int = 128) -> DataFrame:
    """Finalize a KMV state into one row ``(n_vals, theta_w,
    estimate)``.  Below saturation the state IS the distinct hash set
    (estimate = exact count); at saturation the classic unbiased
    estimator (k-1)/u_k with u_k = w_k / 2^52 — stated as one literal
    over the k-th smallest hash so both engines divide identically."""
    c_sat = float((k - 1) * _KMV_DOMAIN)  # exact: k-1 has few bits
    agg = state.agg(F.count("w").alias("n_vals"),
                    F.max("w").alias("wk"))
    return agg.select(
        F.col("n_vals").cast("long").alias("n_vals"),
        F.when(F.col("n_vals") < k, F.lit(_KMV_DOMAIN).cast("long"))
        .otherwise(F.col("wk")).alias("theta_w"),
        F.round(
            F.when(F.col("n_vals") < k,
                   F.col("n_vals").cast("double"))
            .otherwise(F.lit(c_sat) / F.col("wk").cast("double")),
            4,
        ).alias("estimate"),
    )


def kmv_set_ops(df_a: DataFrame, df_b: DataFrame, col: str,
                k: int = 128) -> DataFrame:
    """Theta-sketch set algebra over two KMV states (Dasgupta et al.,
    the DataSketches theta sketch): theta = the union sketch's k-th
    smallest hash (2^52 below saturation), every count restricted to
    ``w < theta``, every estimate ``count * 2^52 / theta``.  One row:

    ``(theta_w, est_a, est_b, est_union, est_intersection,
    est_jaccard)``

    Unlike HLL inclusion-exclusion (:func:`hll_overlap`), the
    intersection here is estimated DIRECTLY — hashes below theta form
    a uniform coordinated sample of each set, so the relative error
    tracks the intersection itself, not the union.  est_jaccard is
    the sampled Jaccard ``|A n B < theta| / |A u B < theta|``.

    Every A-hash below theta is guaranteed present in A's k-smallest
    state (theta <= A's own k-th minimum), so the restricted counts
    are exact set intersections of k-row tables.  All four restricted
    counts come from ONE membership-tagged union of the three k-row
    states (groupBy w, then conditional sums under w < theta), and
    theta itself rides a single-partition window over that membership
    table (r13) — ZERO nested-loop joins, where the r9 per-count
    crossJoin chain counted 8 BNLJ / 16 exchanges and the r12 shape
    still carried two."""
    a = kmv_state(df_a, col, k)
    b = kmv_state(df_b, col, k)
    u = kmv_merge(a, df_b, col, k)
    dom = float(_KMV_DOMAIN)

    def tag(state: DataFrame, flag: str) -> DataFrame:
        cols = [F.lit(1 if f == flag else 0).alias(f)
                for f in ("in_a", "in_b", "in_u")]
        return state.select("w", *cols)

    membership = (
        tag(a, "in_a").unionByName(tag(b, "in_b"))
        .unionByName(tag(u, "in_u"))
        .groupBy("w")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"),
             F.max("in_u").alias("in_u"))
    )
    # theta rides a single-partition window over the <= 3k-row
    # membership table (r13): same value as the former separate
    # u-aggregate (|u| and u's max hash read off the in_u tags), but
    # the scalar needs no broadcast and the final assembly no second
    # crossJoin — both BroadcastNestedLoopJoins gone.
    w0 = Window.partitionBy()
    theta = F.when(
        F.sum("in_u").over(w0) < k, F.lit(_KMV_DOMAIN).cast("long")
    ).otherwise(F.max(F.when(F.col("in_u") == 1, F.col("w"))).over(w0))
    counts = (
        membership.withColumn("theta_w", theta)
        .where(F.col("w") < F.col("theta_w"))
        .agg(F.coalesce(F.sum("in_a"), F.lit(0)).cast("long")
             .alias("n_a"),
             F.coalesce(F.sum("in_b"), F.lit(0)).cast("long")
             .alias("n_b"),
             F.coalesce(F.sum("in_u"), F.lit(0)).cast("long")
             .alias("n_un"),
             F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0))
             .cast("long").alias("n_ab"),
             # the same scalar on every surviving row; COALESCE covers
             # the empty-input case (no rows -> the old u-aggregate
             # still reported theta = the unsaturated domain)
             F.coalesce(F.max("theta_w"),
                        F.lit(_KMV_DOMAIN).cast("long")).alias("theta_w"))
    )

    def est(n: str) -> Column:
        return F.round(
            F.col(n).cast("double") * F.lit(dom)
            / F.col("theta_w").cast("double"), 4)

    return counts.select(
        "theta_w",
        est("n_a").alias("est_a"),
        est("n_b").alias("est_b"),
        est("n_un").alias("est_union"),
        est("n_ab").alias("est_intersection"),
        F.round(
            F.when(F.col("n_un") == 0, F.lit(0.0)).otherwise(
                F.col("n_ab").cast("double")
                / F.col("n_un").cast("double")), 4)
        .alias("est_jaccard"),
    )


def _kmv_w_sql(col: str) -> str:
    """The SAME 52-bit hash as DuckDB SQL (md5 nibbles, no conv)."""
    nib = ("strpos('0123456789abcdef', "
           "substr(md5(CAST({c} AS VARCHAR)), {pos}, 1)) - 1")
    return "(" + " + ".join(
        f"(CAST(({nib.format(c=col, pos=i + 1)}) AS BIGINT)"
        f" * {16 ** (13 - 1 - i)})"
        for i in range(13)
    ) + ")"


def kmv_sql(col: str, src: str, k: int = 128) -> str:
    """The SAME KMV estimate as a DuckDB CTE chain over ``src`` (op
    order parity with :func:`kmv_estimate`).  Emits a complete SELECT
    (one row)."""
    c_sat = float((k - 1) * _KMV_DOMAIN)
    return f"""
        WITH kmv AS (
            SELECT DISTINCT {_kmv_w_sql(col)} AS w FROM {src}
            ORDER BY w LIMIT {k}
        ), agg AS (
            SELECT COUNT(*) AS n_vals, MAX(w) AS wk FROM kmv
        )
        SELECT CAST(n_vals AS BIGINT) AS n_vals,
               CAST(CASE WHEN n_vals < {k} THEN {_KMV_DOMAIN}
                         ELSE wk END AS BIGINT) AS theta_w,
               ROUND(CASE WHEN n_vals < {k}
                          THEN CAST(n_vals AS DOUBLE)
                          ELSE CAST({c_sat!r} AS DOUBLE)
                               / CAST(wk AS DOUBLE) END, 4) AS estimate
        FROM agg
    """


def kmv_set_ops_sql(col: str, src_a: str, src_b: str,
                    k: int = 128) -> str:
    """The SAME theta-sketch set algebra as a DuckDB CTE chain (op
    order parity with :func:`kmv_set_ops`).  Emits a complete SELECT
    (one row)."""
    dom = float(_KMV_DOMAIN)
    return f"""
        WITH a AS (
            SELECT DISTINCT {_kmv_w_sql(col)} AS w FROM {src_a}
            ORDER BY w LIMIT {k}
        ), b AS (
            SELECT DISTINCT {_kmv_w_sql(col)} AS w FROM {src_b}
            ORDER BY w LIMIT {k}
        ), u AS (
            SELECT DISTINCT w
            FROM (SELECT w FROM a UNION ALL SELECT w FROM b)
            ORDER BY w LIMIT {k}
        ), th AS (
            SELECT CAST(CASE WHEN COUNT(*) < {k} THEN {_KMV_DOMAIN}
                             ELSE MAX(w) END AS BIGINT) AS theta_w
            FROM u
        ), counts AS (
            SELECT th.theta_w,
                   (SELECT COUNT(*) FROM a, th t
                    WHERE a.w < t.theta_w) AS n_a,
                   (SELECT COUNT(*) FROM b, th t
                    WHERE b.w < t.theta_w) AS n_b,
                   (SELECT COUNT(*) FROM u, th t
                    WHERE u.w < t.theta_w) AS n_un,
                   (SELECT COUNT(*) FROM a JOIN b USING (w), th t
                    WHERE a.w < t.theta_w) AS n_ab
            FROM th
        )
        SELECT theta_w,
               ROUND(CAST(n_a AS DOUBLE) * CAST({dom!r} AS DOUBLE)
                     / CAST(theta_w AS DOUBLE), 4) AS est_a,
               ROUND(CAST(n_b AS DOUBLE) * CAST({dom!r} AS DOUBLE)
                     / CAST(theta_w AS DOUBLE), 4) AS est_b,
               ROUND(CAST(n_un AS DOUBLE) * CAST({dom!r} AS DOUBLE)
                     / CAST(theta_w AS DOUBLE), 4) AS est_union,
               ROUND(CAST(n_ab AS DOUBLE) * CAST({dom!r} AS DOUBLE)
                     / CAST(theta_w AS DOUBLE), 4) AS est_intersection,
               ROUND(CASE WHEN n_un = 0 THEN 0.0
                          ELSE CAST(n_ab AS DOUBLE)
                               / CAST(n_un AS DOUBLE) END, 4)
                   AS est_jaccard
        FROM counts
    """


# ---------------------------------------------------------------------------
# bottom-k coordinated sample: mergeable order statistics


def sample_state(df: DataFrame, id_col: str, value_col: str,
                 k: int = 1024, seed: str = "s0") -> DataFrame:
    """Bottom-k coordinated sample state ``(w, value)``: the k rows
    with the smallest 52-bit md5(id#seed) hash, carrying ``value_col``
    — a deterministic uniform sample WITHOUT replacement (the
    equal-weight limit of A-ES, keyed like KMV, Cohen & Kaplan 2007).

    This is the mergeable quantile/mean sketch: Spark's own
    ``approx_percentile`` (GK) is the production fast path, but its
    state is engine-private — here the kept set is fully specified,
    so incremental maintenance and the DuckDB twin are value-exact.

    Scale shape: ``ORDER BY w LIMIT k`` lowers to
    TakeOrderedAndProject (per-partition top-k + a k-row driver
    merge, no global sort); state is <= k rows; the merge
    (:func:`sample_merge`) is associative/commutative/idempotent, so
    any batching equals the single-pass sample row-for-row."""
    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.md5(F.concat(F.col(id_col).cast("string"),
                       F.lit(f"#{seed}")))
    w = F.conv(F.substring(h, 1, 13), 16, 10).cast("long")
    return (
        df.select(w.alias("w"),
                  F.col(value_col).cast("double").alias("value"))
        .distinct()
        .orderBy("w")
        .limit(k)
    )


def sample_merge(state: DataFrame, df: DataFrame, id_col: str,
                 value_col: str, k: int = 1024,
                 seed: str = "s0") -> DataFrame:
    """Fold a new batch into a bottom-k sample state: union, distinct,
    keep the k smallest hashes.  O(batch) scan + a <= 2k-row merge."""
    return (
        state.unionByName(
            sample_state(df, id_col, value_col, k=k, seed=seed))
        .distinct()
        .orderBy("w")
        .limit(k)
    )


def sample_quantiles(state: DataFrame,
                     qs: tuple = (0.25, 0.5, 0.9, 0.99)) -> DataFrame:
    """Finalize a bottom-k sample into one row of order statistics:
    ``n_sample``, ``mean``, and ``p{q}`` per requested quantile
    (linear-interpolated — Spark ``percentile`` == DuckDB
    ``quantile_cont`` value-for-value).  Standard sample-quantile
    error: ~1/sqrt(k) in rank."""
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.round(F.avg("value") + F.lit(1e-9), 6).alias("mean"),
    ]
    for q in qs:
        aggs.append(
            F.round(F.expr(f"percentile(value, {q!r})") + F.lit(1e-9), 6)
            .alias(f"p{int(round(q * 100)):02d}"))
    return state.agg(*aggs)


def sample_quantiles_sql(id_col: str, value_col: str, src: str,
                         k: int = 1024, seed: str = "s0",
                         qs: tuple = (0.25, 0.5, 0.9, 0.99)) -> str:
    """The SAME bottom-k sample quantiles as a DuckDB CTE chain (op
    order parity with :func:`sample_state` + :func:`sample_quantiles`).
    Emits a complete SELECT (one row)."""
    nib = ("strpos('0123456789abcdef', "
           "substr(md5(CAST({c} AS VARCHAR) || '#" + seed +
           "'), {pos}, 1)) - 1")
    w = "(" + " + ".join(
        f"(CAST(({nib.format(c=id_col, pos=i + 1)}) AS BIGINT)"
        f" * {16 ** (13 - 1 - i)})"
        for i in range(13)
    ) + ")"
    qcols = ",\n               ".join(
        f"ROUND(quantile_cont(value, {q!r}) + 1e-9, 6)"
        f" AS p{int(round(q * 100)):02d}"
        for q in qs
    )
    return f"""
        WITH smp AS (
            SELECT DISTINCT {w} AS w,
                   CAST({value_col} AS DOUBLE) AS value
            FROM {src}
            ORDER BY w LIMIT {k}
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
               ROUND(AVG(value) + 1e-9, 6) AS mean,
               {qcols}
        FROM smp
    """


def bloom_merge(state: DataFrame, fresh: DataFrame) -> DataFrame:
    """OR-merge two one-row Bloom bitmaps (same m_bits/k by contract):
    word-wise ``bit_or`` via ``zip_with``.  OR is idempotent AND
    associative/commutative, so any merge order — including replayed
    micro-batches — produces the bitmap of the union gram set, bit
    for bit (the strongest of the sketch-family merge contracts)."""
    return (
        state.crossJoin(fresh.select(F.col("bloom").alias("__b2")))
        .select(F.zip_with("bloom", "__b2",
                           lambda a, b: a.bitwiseOR(b)).alias("bloom"))
    )


# ---- Misra-Gries-style mergeable heavy hitters ---------------------------


def mg_summaries(
    tokens: DataFrame,
    token_col: str = "token",
    bucket_col: str = "bucket",
    k: int = 8,
) -> DataFrame:
    """Per-bucket deterministic Misra-Gries summaries.

    Each bucket (= stream shard / partition in a real deployment)
    compresses its exact token counts to at most ``k`` survivors via
    the clamped-residual rule: with ``T_b`` = the ``(k+1)``-th largest
    count in the bucket (0 if fewer than ``k+1`` distinct tokens),
    each survivor carries ``s = c - T_b`` (rows where ``s <= 0``
    drop).  This is a canonical deterministic member of the MG
    summary family: ``c - total_b/(k+1) <= s <= c`` holds because
    ``k+1`` tokens have count >= ``T_b`` so ``T_b <= total_b/(k+1)``
    — the classic MG error bound, but independent of arrival order
    (plain streaming MG's counter values are order-dependent, which
    would make a cross-engine value hash meaningless).

    Returns ``(bucket, token, s, t)`` where ``t`` repeats the
    bucket's threshold ``T_b`` (the bucket's contribution to the
    global error bound).

    Scale shape: ``groupBy(bucket, token)`` is map-side combined, the
    rank window partitions by bucket (state per bucket = k rows), and
    everything downstream is summary-sized.  At 100 TB the bucket
    column is the shard key — summaries merge by addition, so shards
    never exchange raw tokens.
    """
    ranked = _mg_ranked(tokens, token_col, bucket_col, k)
    return (
        ranked.withColumn("s", F.col("c") - F.col("t"))
        .where((F.col("rk") <= k) & (F.col("s") > 0))
        .select(bucket_col, token_col, "s", "t")
    )


def _mg_ranked(
    tokens: DataFrame, token_col: str, bucket_col: str, k: int
) -> DataFrame:
    """Per-bucket ranked counts with the MG threshold attached —
    BEFORE the survivor filter: ``(bucket, token, c, rk, t)`` where
    ``t`` is the bucket's (k+1)-th largest count (0 if fewer).  Both
    the summary rows and the global error bound derive from this, so
    the bound can see buckets whose survivors all clamp to zero."""
    counts = tokens.groupBy(bucket_col, token_col).agg(
        F.count("*").alias("c"))
    w = Window.partitionBy(bucket_col).orderBy(
        F.desc("c"), F.asc(token_col))
    ranked = counts.withColumn("rk", F.row_number().over(w))
    wb = Window.partitionBy(bucket_col)
    thr = F.coalesce(
        F.max(F.when(F.col("rk") == k + 1, F.col("c"))).over(wb),
        F.lit(0))
    return ranked.withColumn("t", thr)


def mg_heavy_hitters(
    tokens: DataFrame,
    token_col: str = "token",
    bucket_col: str = "bucket",
    k: int = 8,
    top: int = 10,
) -> DataFrame:
    """Merged Misra-Gries heavy hitters: sum the per-bucket summaries
    (``mg_summaries``) and report the ``top`` tokens by merged
    estimate with the deterministic ``(est DESC, token)`` tie-break.

    Returns ``(token, est, ub)`` — ``est <= true count <= ub`` where
    ``ub = est + sum_b T_b`` (each bucket's threshold bounds what it
    may have clamped away).  ``T_b`` sums over ALL buckets, computed
    BEFORE the survivor filter: a bucket whose top-k counts all equal
    its (k+1)-th count contributes no summary rows, yet a token may
    hold up to ``T_b`` there — dropping its threshold would make the
    certificate unsound.  All integer arithmetic: no float boundary
    anywhere.

    Scale shape: the merge reduces <= buckets * k summary rows; the
    global bound rides a single-partition window over the summary-
    sized pruned table (model-sized by construction).
    This is the counter-based dual of the count-min sketch already in
    this module — deterministic underestimates with a certificate,
    vs randomized overestimates.
    """
    # prune to the top k+1 rows per bucket (summary-sized: <= buckets
    # * (k+1) rows).  The bound is the sum of the rk == k+1 counts:
    # buckets with fewer than k+1 distinct tokens have T_b = 0 and
    # simply contribute no row.  The bound rides a single-partition
    # window over the summary-sized pruned table (r13): the former
    # persist + two branches + scalar crossJoin paid a
    # BroadcastNestedLoopJoin and a second pruned scan for the same
    # exact integer.
    pruned = (
        _mg_ranked(tokens, token_col, bucket_col, k)
        .where(F.col("rk") <= k + 1)
    )
    w0 = Window.partitionBy()
    bounded = pruned.withColumn(
        "__bound",
        F.coalesce(
            F.sum(F.when(F.col("rk") == k + 1, F.col("c"))).over(w0),
            F.lit(0)))
    return (
        bounded.withColumn("s", F.col("c") - F.col("t"))
        .where((F.col("rk") <= k) & (F.col("s") > 0))
        .groupBy(token_col)
        .agg(F.sum("s").alias("est"), F.max("__bound").alias("__bound"))
        .select(token_col, "est",
                (F.col("est") + F.col("__bound")).alias("ub"))
        .orderBy(F.desc("est"), F.asc(token_col))
        .limit(top)
    )
