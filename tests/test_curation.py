"""Corpus-curation operators (pipeline/curation.py).

Semantics pinned on tiny hand-computed fixtures; the sf-scale
hash-match against DuckDB lives in queries/curation_ops.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xcube_spark.pipeline.curation import (
    assign_split,
    decontaminate,
    det_hash,
    domain_mix,
    ngrams,
    pack_sequences,
    pii_redact,
    repetition_stats,
)


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngrams_distinct_and_short_docs(spark):
    df = docs(spark, [(1, "a b c a b c"), (2, "x y"), (3, "solo")])
    got = {
        (r.doc_id, r.ngram)
        for r in ngrams(df, n=3).collect()
    }
    # doc 1: 4 positional trigrams but only 3 distinct; docs 2/3 too short
    assert got == {
        (1, "a b c"), (1, "b c a"), (1, "c a b"),
    }


def test_decontaminate_counts_distinct_gram_hits(spark):
    corpus = docs(spark, [
        (1, "the quick brown fox jumps"),   # shares 'the quick brown'
        (2, "entirely different words here"),
    ])
    bench = docs(spark, [(100, "the quick brown cat")])
    out = {r.doc_id: (r.n_hits, r.contaminated)
           for r in decontaminate(corpus, bench, n=3).collect()}
    assert out == {1: (1, True), 2: (0, False)}


def test_repetition_stats_hand_computed(spark):
    # "a b a b": words 4 distinct 2 -> dup_word 0.5
    # bigrams [a b, b a, a b]: top 'a b' x2 of 3 -> 2/3
    # trigrams [a b a, b a b]: distinct 2 of 2 -> dup_tri 0.0
    df = docs(spark, [(1, "a b a b")])
    r = repetition_stats(df).collect()[0]
    assert r.dup_word_frac == pytest.approx(0.5)
    assert r.top_bigram_frac == pytest.approx(2 / 3)
    assert r.dup_trigram_frac == pytest.approx(0.0)


def test_repetition_stats_degenerate_docs(spark):
    df = docs(spark, [(1, "word"), (2, "x x")])
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].top_bigram_frac == 0.0  # no bigrams
    assert rows[1].dup_trigram_frac == 0.0
    assert rows[2].dup_word_frac == pytest.approx(0.5)
    assert rows[2].top_bigram_frac == pytest.approx(1.0)  # 'x x' x1 of 1


def test_pii_redact_cascade(spark):
    df = docs(spark, [
        (1, "mail bob@corp.io or 10.0.0.1 acct 123456789012 end"),
        (2, "clean text"),
    ])
    rows = {r.doc_id: r for r in pii_redact(df).collect()}
    r = rows[1]
    assert (r.n_emails, r.n_ipv4, r.n_long_digits) == (1, 1, 1)
    assert r.text_redacted == "mail <EMAIL> or <IP> acct <NUM> end"
    r2 = rows[2]
    assert (r2.n_emails, r2.n_ipv4, r2.n_long_digits) == (0, 0, 0)
    assert r2.text_redacted == "clean text"


def test_assign_split_stable_under_growth(spark):
    small = docs(spark, [(i, "t") for i in range(50)])
    big = docs(spark, [(i, "t") for i in range(200)])
    s_small = {r.doc_id: r.split for r in assign_split(small).collect()}
    s_big = {r.doc_id: r.split for r in assign_split(big).collect()}
    # growing the corpus never reassigns an existing doc
    assert all(s_big[k] == v for k, v in s_small.items())
    assert set(s_big.values()) <= {"train", "val", "test"}


def test_domain_mix_deterministic_rates(spark):
    rows = [(i, "t", "keep_half" if i % 2 else "keep_all")
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = domain_mix(df, {"keep_half": 0.5}, default_rate=1.0)
    out = kept.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in out}
    assert counts["keep_all"] == 200          # default rate keeps all
    assert 60 <= counts.get("keep_half", 0) <= 140  # ~0.5 of 200
    # idempotent: same ids survive a re-run
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in domain_mix(df, {"keep_half": 0.5}).collect()
    )


def test_pack_sequences_budget_and_offsets(spark):
    df = docs(spark, [(i, " ".join(["w"] * 10)) for i in range(100)])
    out = pack_sequences(df, max_tokens=32, n_shards=4).collect()
    assert len(out) == 100
    by_seq: dict = {}
    for r in out:
        by_seq.setdefault((r.shard, r.seq_id), []).append(r)
    for (shard, seq), members in by_seq.items():
        # fluid next-fit: sequence starts below budget, may overflow
        # by at most the last doc
        members.sort(key=lambda r: r.offset)
        assert members[0].offset < 32
        for a, b in zip(members, members[1:]):
            assert b.offset == a.offset + a.n_tokens
    # shard assignment is the deterministic hash
    for r in out:
        assert r.shard == (r.doc_id * 2654435761) % (2**32) % 4


def test_det_hash_matches_python(spark):
    df = spark.range(0, 1000).select(
        "id", det_hash(F.col("id")).alias("h")
    )
    for r in df.collect():
        assert r.h == (r.id * 2654435761) % (2**32)


# ---- product quantization (pipeline/similarity.py) ---------------------


def test_pq_encode_shapes_and_determinism(spark, sf_dir):
    from xcube_spark.pipeline.similarity import pq_codebook, pq_encode
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    cb = pq_codebook(emb, m=4, dsub=16, ksub=16)
    assert cb.count() == 4 * 16
    enc = pq_encode(emb, cb, m=4, dsub=16)
    rows = enc.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r.codes) == 4
        assert all(0 <= c < 16 for c in r.codes)
    # codebook members encode to themselves (distance 0 to own entry)
    own = {r.vec_id: r.codes for r in rows if r.vec_id < 16}
    for vid, codes in own.items():
        assert codes == [vid] * 4


def test_pq_knn_beats_random_recall(spark, sf_dir):
    from xcube_spark.pipeline.similarity import knn_bruteforce, knn_pq
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = knn_bruteforce(emb, queries, k=10)
    approx = knn_pq(emb, queries, k=10)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    n = emb.count()
    recall = len(e & a) / len(e)
    # PQ with a sampled codebook is crude but must far exceed the
    # random-baseline expectation of k/n
    assert recall > 5 * (10 / n)


def test_train_pq_codebooks_reduces_error(spark, sf_dir):
    from xcube_spark.pipeline.similarity import (
        pq_codebook, pq_encode, train_pq_codebooks)
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).limit(200)

    def qerror(cb):
        # mean squared distance of each subvector to its chosen code
        sv = F.slice(F.col("embedding"), F.col("sub") * 16 + 1, 16)
        d2 = (
            F.aggregate(F.zip_with(sv, F.col("cvec"),
                                   lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0), lambda acc, v: acc + v))
        scored = emb.join(F.broadcast(cb)).groupBy("vec_id", "sub").agg(
            F.min(d2).alias("best"))
        return scored.agg(F.avg("best")).collect()[0][0]

    seed_err = qerror(pq_codebook(emb, m=4, dsub=16, ksub=16))
    trained = train_pq_codebooks(emb, m=4, dsub=16, ksub=16, iterations=2)
    assert trained.count() == 64
    assert qerror(trained) <= seed_err + 1e-12


def test_substring_dedup_flags_copied_spans(spark):
    from xcube_spark.pipeline.curation import substring_dedup_stats

    span = " ".join(f"w{i}" for i in range(10))
    df = docs(spark, [
        (1, span + " tail1 tail2"),          # original
        (2, "lead " + span),                 # copies the span
        (3, "all fresh words here nothing repeated at all ok fine"),
        (4, "short doc"),                    # < window tokens
    ])
    rows = {r.doc_id: r for r in
            substring_dedup_stats(df, window=10).collect()}
    assert rows[1].n_windows == 3 and rows[1].n_dup == 0  # first occurrence
    assert rows[2].n_dup >= 1                             # copied span
    assert rows[3].n_dup == 0
    assert rows[4].n_windows == 0 and rows[4].dup_frac == 0.0


def test_incremental_dedup_equals_batch(spark):
    from xcube_spark.pipeline.dedup import (
        exact_dedup_state, incremental_exact_dedup)

    all_docs = docs(spark, [
        (1, "alpha beta"), (2, "alpha  beta "),   # same after normalize
        (3, "gamma"), (4, "delta"), (5, "GAMMA"), (6, "unique new"),
    ])
    old = all_docs.where(F.col("doc_id") <= 3)
    new = all_docs.where(F.col("doc_id") > 3)
    merged = incremental_exact_dedup(exact_dedup_state(old), new)
    batch = exact_dedup_state(all_docs)
    m = {r.digest: (r.canonical_id, r.group_size) for r in merged.collect()}
    b = {r.digest: (r.canonical_id, r.group_size) for r in batch.collect()}
    assert m == b
    # digest-only batches merge too (batch with an existing dup)
    again = incremental_exact_dedup(
        merged, docs(spark, [(7, "alpha beta")]))
    assert {r.canonical_id: r.group_size for r in again.collect()}[1] == 3


def test_lsh_multiprobe_recall_not_worse(spark, sf_dir):
    from xcube_spark.pipeline.similarity import knn_bruteforce, knn_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.vec_id)
             for r in knn_bruteforce(emb, queries, k=10).collect()}
    single = {(r.query_id, r.vec_id)
              for r in knn_lsh(emb, queries, k=10).collect()}
    multi = {(r.query_id, r.vec_id)
             for r in knn_lsh(emb, queries, k=10,
                              probe_radius=1).collect()}
    # multi-probe widens the candidate set, so recall vs the exact
    # answer can only improve (same planes, superset of buckets)
    assert len(multi & exact) >= len(single & exact)


def test_luhn_card_detection(spark):
    from xcube_spark.pipeline.curation import detect_card_numbers

    df = docs(spark, [
        (1, "pay with 4539578763621486 now"),        # valid Luhn
        (2, "fake number 4539578763621487 here"),    # checksum off by 1
        (3, "short 12345678 run"),                   # < 13 digits
        (4, "two cards 4539578763621486 and 6011000990139424"),
    ])
    rows = {r.doc_id: r for r in detect_card_numbers(df).collect()}
    assert rows[1].has_card and rows[1].n_card_numbers == 1
    assert not rows[2].has_card and rows[2].n_digit_runs == 1
    assert not rows[3].has_card and rows[3].n_digit_runs == 0
    assert rows[4].n_card_numbers == 2


def test_substring_dedup_clean_removes_copied_span(spark):
    from xcube_spark.pipeline.curation import substring_dedup_clean

    span = " ".join(f"w{i}" for i in range(10))
    df = docs(spark, [
        (1, span + " tail1 tail2"),
        (2, "lead " + span + " after"),   # copies the span
        (3, "short doc"),
    ])
    rows = {r.doc_id: r for r in
            substring_dedup_clean(df, window=10).collect()}
    # first occurrence untouched
    assert rows[1].text_clean == span + " tail1 tail2"
    # the copied 10-token span is excised; untouched neighbors survive
    assert rows[2].text_clean == "lead after"
    assert rows[2].n_tokens_kept == 2
    # sub-window docs pass through whole
    assert rows[3].text_clean == "short doc"


def test_ivfpq_recall_and_shape(spark, sf_dir):
    from xcube_spark.pipeline.similarity import knn_bruteforce, knn_ivfpq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.vec_id)
             for r in knn_bruteforce(emb, queries, k=10).collect()}
    approx = knn_ivfpq(emb, queries, k=10).collect()
    a = {(r.query_id, r.vec_id) for r in approx}
    n = emb.count()
    # beats random by a wide margin; per-query ranks are dense 1..k
    assert len(a & exact) / len(exact) > 5 * (10 / n)
    by_q: dict = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_semdedup_keep_rule(spark):
    """SemDeDup drops the higher-centroid-similarity member of each
    within-cell near-dup pair and never compares across cells."""
    from pyspark.sql import functions as F

    from xcube_spark.pipeline.similarity import semdedup

    # two well-separated cells; in cell 0, b ~ c (near-dups) with c
    # closer to the centroid -> c dropped, b kept; d is its own cell
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # centroid cell 0
        (1, [0.0, 1.0, 0.0, 0.0]),        # centroid cell 1
        (10, [0.9, 0.1, 0.0, 0.0]),       # b: cell 0, off-center
        (11, [0.95, 0.05, 0.0, 0.0]),     # c: cell 0, near-dup of b,
                                          #    closer to centroid
        (12, [0.1, 0.9, 0.0, 0.0]),       # d: cell 1 twin of b -- a
                                          #    near-dup only cross-cell
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = emb.where(F.col("vec_id") < 2)
    out = {r["vec_id"]: r for r in
           semdedup(emb, cents, threshold=0.97).collect()}
    assert out[10]["cell"] == 0 and out[12]["cell"] == 1
    # the centroids themselves near-dup their cell twins at 0.97? no:
    # cos(centroid, b) ~ 0.993 -> centroid/b/c all mutually near-dup;
    # kept = lowest cent_sim = b (vec_id 10)
    assert not out[10]["is_dup"]
    assert out[11]["is_dup"]
    # cross-cell twin untouched despite cos(b, d) < threshold anyway
    assert not out[12]["is_dup"]


def test_semdedup_cell_size_cap(spark):
    """The hard cell-size cap bounds the within-cell pair join: one
    mega-cell (all members mutual near-dups) is deterministically
    sliced into (cent_sim, id)-ranked sub-buckets of max_cell_size, so
    the join fans out O(cells/cap * cap^2) pairs and each slice keeps
    its own most-marginal exemplar — ceil(n/cap) keepers instead of 1,
    never an O(n^2) explosion."""
    from pyspark.sql import functions as F

    from xcube_spark.pipeline.similarity import semdedup

    n, cap = 40, 10
    emb = spark.createDataFrame(
        [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(n)],
        "vec_id long, embedding array<double>")
    cents = emb.where(F.col("vec_id") == 0)

    exact = semdedup(emb, cents, threshold=0.9, max_cell_size=None)
    assert exact.where(~F.col("is_dup")).count() == 1

    capped = semdedup(emb, cents, threshold=0.9, max_cell_size=cap)
    assert capped.where(~F.col("is_dup")).count() == n // cap
    assert capped.count() == n  # every member still present
    # the pair join is keyed on (cell, sub), not cell alone
    opt = capped._jdf.queryExecution().optimizedPlan().toString()
    assert "__sub" in opt


def test_bpe_train_merges_hand_computed(spark):
    from xcube_spark.pipeline.text import bpe_train_merges

    # corpus: 'ab ab abc' -> words {ab: 2, abc: 1}
    # step 1: pairs (a,b)x3 -> merge 'ab' (count 3)
    # step 2: pairs (ab,c)x1 -> merge 'abc' (count 1)
    docs = spark.createDataFrame(
        [(1, "ab ab abc")], "doc_id int, text string")
    out = bpe_train_merges(docs, steps=2).collect()
    assert [(r.step, r.merge_left, r.merge_right, r.pair_count)
            for r in out] == [(1, "a", "b", 3), (2, "ab", "c", 1)]


def test_bpe_merges_tie_break_and_greedy_overlap(spark):
    from xcube_spark.pipeline.text import bpe_train_merges

    # 'aaa': pairs (a,a) twice (overlapping count), merge left-to-right
    # non-overlapping -> 'aa a'; next best pair is (aa, a)
    docs = spark.createDataFrame([(1, "aaa")], "doc_id int, text string")
    out = bpe_train_merges(docs, steps=2).collect()
    assert (out[0].merge_left, out[0].merge_right,
            out[0].pair_count) == ("a", "a", 2)
    assert (out[1].merge_left, out[1].merge_right,
            out[1].pair_count) == ("aa", "a", 1)


def test_trigram_lm_known_values(spark):
    import math

    from xcube_spark.pipeline.text import trigram_lm_score

    # corpus trigrams: 'abcd' -> abc, bcd; 'abce' -> abc, bce
    # model: abc:2, bcd:1, bce:1, total 4
    docs = spark.createDataFrame(
        [(1, "abcd"), (2, "abce"), (3, "x")],  # 'x' too short -> dropped
        "doc_id int, text string")
    out = {r.doc_id: r for r in trigram_lm_score(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_trigrams == 2
    expected = round((-math.log(2 / 4) - math.log(1 / 4)) / 2 + 1e-9, 6)
    assert out[1].avg_nll == expected
    assert out[2].avg_nll == expected


def test_bpe_tokenize_counts(spark):
    from xcube_spark.pipeline.text import bpe_tokenize

    # 'ab ab abc': merges learned = (a,b) then (ab,c)
    # after both: 'ab' -> 1 symbol, 'abc' -> 1 symbol
    docs = spark.createDataFrame(
        [(1, "ab ab abc")], "doc_id int, text string")
    r = bpe_tokenize(docs, steps=2).collect()[0]
    assert (r.n_words, r.n_chars_tokens, r.n_bpe_tokens) == (3, 7, 3)
    # with only one merge, 'abc' is 'ab c' = 2 symbols
    r1 = bpe_tokenize(docs, steps=1).collect()[0]
    assert r1.n_bpe_tokens == 4


def _ref_bpe(word_freq, steps):
    """Pure-Python reference BPE (Sennrich-style): per step, count
    adjacent pairs weighted by frequency, take (count desc, pair asc)
    argmax, fuse greedy left-to-right.  Independent of the Spark fold."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for step in range(1, steps + 1):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + f)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((step, l, r, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


def test_bpe_adjacent_repeats_merge_every_pair(spark):
    """Round-5 ADVICE bug: ' a a a a ' must fold to [aa, aa], not
    [aa, a, a] — the string-replace form consumed the shared delimiter
    and skipped adjacent repeated pairs."""
    from xcube_spark.pipeline.text import bpe_tokenize, bpe_train_merges

    docs = spark.createDataFrame([(1, "aaaa")], "doc_id int, text string")
    out = bpe_train_merges(docs, steps=2).collect()
    # step 1: (a,a) count 3 -> fuse greedy: [aa, aa]
    # step 2: (aa,aa) count 1
    assert [(r.merge_left, r.merge_right, r.pair_count) for r in out] \
        == [("a", "a", 3), ("aa", "aa", 1)]
    r = bpe_tokenize(docs, steps=1).collect()[0]
    assert r.n_bpe_tokens == 2  # [aa, aa], not 3


def test_bpe_depth_matches_pure_python_reference(spark):
    """Self-consistency at depth: steps=12 over a corpus with ties,
    odd runs, punctuation and cross-word structure must match an
    independent pure-Python BPE exactly (merges AND tokenized symbol
    counts), exercising checkpoint_every re-persists."""
    from collections import Counter

    from xcube_spark.pipeline.text import bpe_tokenize, bpe_train_merges

    texts = [
        "the cat sat on the mat",
        "aaaaa bbbb aaaaa",
        "banana bandana banana",
        "low lower lowest low low",
        "a.b a.b a.b! c,d c,d",
        "mississippi mississippi miss",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    wf = Counter(w for t in texts for w in t.split())
    ref_merges, ref_vocab = _ref_bpe(dict(wf), steps=12)

    out = bpe_train_merges(docs, steps=12, checkpoint_every=4).collect()
    got = [(r.step, r.merge_left, r.merge_right, r.pair_count)
           for r in out]
    assert got == ref_merges

    # tokenize totals: per-word symbol counts under the final vocab
    # (ref_vocab keys are symbol tuples whose concatenation is the word)
    n_sym = {"".join(syms): len(syms) for syms in ref_vocab}
    exp = {}
    for i, t in enumerate(texts):
        ws = t.split()
        exp[i] = (len(ws), sum(len(w) for w in ws),
                  sum(n_sym[w] for w in ws))
    got_tok = {r.doc_id: (r.n_words, r.n_chars_tokens, r.n_bpe_tokens)
               for r in bpe_tokenize(docs, steps=12,
                                     checkpoint_every=4).collect()}
    assert got_tok == exp


def test_bpe_driver_trainer_matches_reference_and_distributed(spark):
    """bpe_train_merges_driver (vocab-to-driver, incremental pair
    deltas + lazy heap) must produce byte-identical merges to both the
    pure-Python reference and the fully-distributed trainer."""
    from collections import Counter

    from xcube_spark.pipeline.text import (bpe_train_merges,
                                           bpe_train_merges_driver)

    texts = [
        "the cat sat on the mat",
        "aaaaa bbbb aaaaa",
        "banana bandana banana",
        "low lower lowest low low",
        "a.b a.b a.b! c,d c,d",
        "mississippi mississippi miss",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    wf = Counter(w for t in texts for w in t.split())
    ref_merges, _ = _ref_bpe(dict(wf), steps=20)

    got = [(r.step, r.merge_left, r.merge_right, r.pair_count)
           for r in bpe_train_merges_driver(docs, steps=20).collect()]
    assert got == ref_merges

    dist = [(r.step, r.merge_left, r.merge_right, r.pair_count)
            for r in bpe_train_merges(docs, steps=8,
                                      checkpoint_every=3).collect()]
    assert got[:len(dist)] == dist


def test_bpe_driver_trainer_depth_feasible(spark):
    """steps=300 over the sf0.001 documents vocabulary completes in
    driver-CPU seconds (the 32k-merge scale story: one shuffle, then
    in-memory incremental training)."""
    import time

    from xcube_spark.pipeline.text import bpe_train_merges_driver

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t0 = time.time()
    out = bpe_train_merges_driver(docs, steps=300).collect()
    assert time.time() - t0 < 60
    assert 1 <= len(out) <= 300
    # counts are the true frequency-weighted pair counts: positive and
    # the first merge dominates any later one... no — counts can rise
    # after merges create popular new symbols; just assert validity
    assert all(r.pair_count >= 1 for r in out)
    steps = [r.step for r in out]
    assert steps == list(range(1, len(out) + 1))


def test_bpe_driver_trainer_vocab_cap(spark):
    from xcube_spark.pipeline.text import bpe_train_merges_driver

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id int, text string")
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train_merges_driver(docs, steps=2, max_vocab_rows=3)


def test_bpe_apply_merge_randomized_equivalence(spark):
    """bpe_apply_merge (the Column fold) equals the Python greedy
    left-to-right fusion on 200 random symbol sequences, including
    overlapping runs and multi-char symbols — one Spark job for all
    cases."""
    import random

    from pyspark.sql import functions as F

    from xcube_spark.pipeline.text import bpe_apply_merge

    rng = random.Random(20260814)
    alphabet = ["a", "b", "ab", "ba", "aa", "c"]
    cases = []
    for i in range(200):
        syms = [rng.choice(alphabet)
                for _ in range(rng.randint(1, 12))]
        l, r = rng.choice(alphabet), rng.choice(alphabet)
        cases.append((i, " " + " ".join(syms) + " ", l, r))

    def py_fuse(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    # group cases by (l, r) so each merge rule is one Column expression
    by_rule: dict = {}
    for i, sym, l, r in cases:
        by_rule.setdefault((l, r), []).append((i, sym))
    expect = {i: " " + " ".join(py_fuse(sym.split(), l, r)) + " "
              for (l, r), grp in by_rule.items() for i, sym in grp}
    got = {}
    for (l, r), grp in by_rule.items():
        df = spark.createDataFrame(grp, "i int, sym string")
        rows = df.select(
            "i", bpe_apply_merge(F.col("sym"), l, r).alias("m")).collect()
        got.update({r_.i: r_.m for r_ in rows})
    assert got == expect


def test_normalize_text(spark):
    from xcube_spark.pipeline.curation import normalize_text

    docs = spark.createDataFrame(
        [(1, "\tHello   WORLD\x07 "),
         (2, "already clean"),
         (3, "tabs\tand\nnewlines  collapse")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in normalize_text(docs).collect()}
    assert rows[1].text_norm == "hello world"
    assert rows[1].n_chars_raw == len("\tHello   WORLD\x07 ")
    assert rows[1].n_chars_norm == len("hello world")
    assert rows[2].text_norm == "already clean"
    assert rows[3].text_norm == "tabs and newlines collapse"


def test_c4_line_filter(spark):
    from xcube_spark.pipeline.curation import c4_line_filter

    docs = spark.createDataFrame(
        [(1, "one two three four five.\nshort.\nno terminal punct here\n"
             'quoted line with five words!"\nsix proper words end here?'),
         (2, "everything here fails the filter\ntiny.")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in c4_line_filter(docs).collect()}
    assert rows[1].n_lines == 5
    assert rows[1].n_kept == 3
    assert rows[1].text_clean == (
        "one two three four five.\n"
        'quoted line with five words!"\n'
        "six proper words end here?")
    assert rows[2].n_kept == 0 and rows[2].text_clean == ""


# ---- round-9 verdict item 6: substring-dedup boundary property test ----


@pytest.mark.parametrize("delta", [-1, 0, 1])
@pytest.mark.parametrize("placement", ["start", "middle", "end"])
def test_substring_dedup_boundary_spans(spark, delta, placement):
    """The W-window relaxation's contract at the boundary: a span
    shared by two documents is detected iff its length >= W, for
    lengths W-1, W, W+1, regardless of where in the document it sits
    (start / middle / end) and with the two documents forced into
    DIFFERENT Spark partitions (the first-occurrence shuffle must
    unify spans across shards).  Driver-mandated operator (Lee et al.
    2021 relaxation) — no reference twin."""
    from pyspark.sql import functions as F

    from xcube_spark.pipeline.curation import substring_dedup_stats

    W = 10
    span_len = W + delta
    shared = [f"s{j}" for j in range(span_len)]

    def doc(doc_id, n_fill=25):
        fill = [f"u{doc_id}_{i}" for i in range(n_fill)]
        if placement == "start":
            toks = shared + fill
        elif placement == "end":
            toks = fill + shared
        else:
            toks = fill[:12] + shared + fill[12:]
        return (doc_id, " ".join(toks))

    df = (
        spark.createDataFrame([doc(1), doc(2)], "doc_id long, text string")
        # separate shards: the span hash shuffle, not co-location,
        # must find the cross-doc duplicate
        .repartition(8, "doc_id")
    )
    stats = {r.doc_id: r for r in
             substring_dedup_stats(df, window=W).collect()}
    # exactly one of the two docs carries the duplicate (the one whose
    # (doc_id, pos) sorts later); the other is the first occurrence
    dups = sorted(stats[i].n_dup for i in (1, 2))
    if span_len >= W:
        assert dups[0] == 0
        assert dups[1] == span_len - W + 1, (
            f"span of {span_len} tokens must contribute "
            f"{span_len - W + 1} duplicate windows, got {dups[1]}")
    else:
        assert dups == [0, 0], (
            f"span of {span_len} < W={W} tokens must NOT be flagged")


def test_substring_dedup_boundary_spans_property(spark):
    """Randomized version (seeded): random filler lengths and span
    placements, three docs sharing the same span — every doc after
    the first occurrence reports exactly (L - W + 1) duplicate
    windows when L >= W, zero otherwise."""
    import random

    from xcube_spark.pipeline.curation import substring_dedup_stats

    rng = random.Random(0xC0FFEE)
    W = 8
    for trial in range(6):
        L = rng.choice([W - 1, W, W + 1, W + 3])
        shared = [f"s{trial}_{j}" for j in range(L)]
        rows = []
        for d in range(3):
            n_fill = rng.randint(L + 1, 40)
            fill = [f"u{trial}_{d}_{i}" for i in range(n_fill)]
            cut = rng.randint(0, n_fill)
            rows.append((d, " ".join(fill[:cut] + shared + fill[cut:])))
        df = spark.createDataFrame(
            rows, "doc_id long, text string").repartition(5, "doc_id")
        stats = {r.doc_id: r.n_dup for r in
                 substring_dedup_stats(df, window=W).collect()}
        dups = sorted(stats.values())
        if L >= W:
            assert dups == [0, L - W + 1, L - W + 1], (trial, L, stats)
        else:
            assert dups == [0, 0, 0], (trial, L, stats)


def test_bm25_topk_hand_scores_and_semi_filter_plan(spark):
    """bm25_topk matches hand-computed Okapi BM25 on a tiny corpus
    (k1=1.2, b=0.75), ranks deterministically, and the plan filters
    the corpus tokens with a literal IN predicate on the query
    vocabulary BEFORE the tf aggregate (at 100 TB the df/idf and
    score stages must only ever see candidate rows).  The corpus is
    tokenized ONCE per invocation (r12): the vocabulary candidates
    plus one pos-0 sentinel row per doc land in an eagerly
    localCheckpoint-ed table that feeds the stats collect and the
    scoring job — no LEFT-SEMI vocab join, no cached
    InMemoryTableScan, no broadcast build of corpus-derived data."""
    import math as m

    from xcube_spark.pipeline.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark window agg window"),
         (2, "spark table scan"),
         (3, "window window window agg"),
         (4, "customer value row")],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "window agg")], "query_id int, query_text string")
    out = bm25_topk(docs, queries, k=2).collect()

    # hand BM25: N=4, avgdl=(4+3+4+3)/4=3.5; window: df=2, agg: df=2
    def s(tf, dl, df, n=4, avgdl=3.5, k1=1.2, b=0.75):
        idf = m.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp = {1: round(s(2, 4, 2) + s(1, 4, 2) + 1e-9, 6),   # doc 1
           3: round(s(3, 4, 2) + s(1, 4, 2) + 1e-9, 6)}   # doc 3
    got = {r.doc_id: r.score for r in out}
    assert set(got) == {1, 3}
    for d in exp:
        assert abs(got[d] - exp[d]) < 2e-6
    # doc 3 (tf=3 on window) outranks doc 1
    ranks = {r.doc_id: r.rank for r in out}
    assert ranks[3] == 1 and ranks[1] == 2

    # the default plan reads the persisted candidate table (corpus
    # tokenized exactly once per invocation; cache released via
    # tie_cache_lifetime when the result is dropped — hold the result
    # in a variable or the finalizer unpersists mid-expression)
    res = bm25_topk(docs, queries, k=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan and "LeftSemi" not in plan
    del res
    # materialize=False exposes the candidate lineage: the vocabulary
    # filter is a literal IN over the exploded tokens, never a join
    lazy = bm25_topk(docs, queries, k=2, materialize=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "token" in lazy and " IN (" in lazy
    assert "LeftSemi" not in lazy and "InMemoryTableScan" not in lazy


def test_dsir_weights_favor_target_vocabulary(spark):
    """dsir_importance_weights scores documents made of target-domain
    vocabulary above documents of off-domain vocabulary (the DSIR
    resampling contract), is deterministic, and never touches a
    corpus-sized join (the llr table is a broadcast over at most
    n_buckets rows)."""
    from xcube_spark.pipeline.curation import dsir_importance_weights

    rows = []
    # target docs speak 'alpha beta', raw-only docs speak 'gamma delta'
    for i in range(10):
        rows.append((i, "alpha beta alpha beta alpha", "good"))
    for i in range(10, 30):
        rows.append((i, "gamma delta gamma delta gamma", "crawl"))
    # one held-out doc per vocabulary, both from the raw pool
    rows.append((30, "alpha beta alpha beta alpha", "crawl"))
    rows.append((31, "gamma delta gamma delta gamma", "crawl"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")

    out = dsir_importance_weights(
        docs, F.col("src") == "good", n_buckets=64)
    got = {r.doc_id: r.log_weight for r in out.collect()}
    assert len(got) == 32
    # target-vocabulary docs outrank off-domain docs regardless of src
    assert got[30] > got[31]
    assert got[0] > got[10]
    # same text => same weight (pure function of content)
    assert got[30] == got[0]

    plan = dsir_importance_weights(
        docs, F.col("src") == "good")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_linear_probe_recovers_exact_relation(spark):
    """linear_probe recovers an exactly-linear integer relation
    (y = 3 + 2*x1 + 5*x2): zero residuals, exact predictions — and
    (r13) the coefficients are driver-folded literals, so the
    prediction pass is a pure projection with NO join of any kind."""
    from xcube_spark.pipeline.curation import linear_probe

    rows = [(i, i % 7 + 1, (i * 3) % 5 + 1) for i in range(50)]
    docs = spark.createDataFrame(
        [(i, x1, x2, 3 + 2 * x1 + 5 * x2) for i, x1, x2 in rows],
        "doc_id long, x1 long, x2 long, y long")
    out = linear_probe(docs, "y", "x1", "x2").collect()
    assert len(out) == 50
    for r in out:
        assert abs(r.resid) < 1e-9
        assert abs(r.y_hat - r.y) < 1e-9

    plan = linear_probe(docs, "y", "x1", "x2")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan  # prediction pass is a pure projection


def test_chunk_split_window_arithmetic_and_coverage(spark):
    """chunk_split: every token lands in >= 1 window, consecutive
    windows overlap by exactly `overlap`, the tail window may be
    short, and the plan has no exchange (pure projection + explode)."""
    from xcube_spark.pipeline.curation import chunk_split

    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, text), (2, "a b c")], "doc_id long, text string")
    out = chunk_split(docs, chunk_tokens=8, overlap=2).collect()
    d1 = sorted((r.chunk_idx, r.start_token, r.n_tokens, r.chunk_text)
                for r in out if r.doc_id == 1)
    # stride 6: ceil(100/6) -> floor(99/6)+1 = 17 windows
    assert len(d1) == 17
    assert d1[0][1] == 0 and d1[0][2] == 8
    assert d1[1][1] == 6  # overlap = 2
    assert d1[0][3].split()[6:] == d1[1][3].split()[:2]
    # tail: start 96, tokens 96..99 -> 4 tokens
    assert d1[-1] == (16, 96, 4, "t96 t97 t98 t99")
    # full coverage
    seen = set()
    for _, s, n, _t in d1:
        seen.update(range(s, s + n))
    assert seen == set(range(100))
    # short doc: one window of 3
    d2 = [r for r in out if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].n_tokens == 3

    plan = chunk_split(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        chunk_split(docs, chunk_tokens=8, overlap=8)


def test_probe_moments_merge_equals_recompute_bitwise(spark):
    """probe_merge over arbitrary batch splits equals the single-pass
    moments BIT-FOR-BIT (integer sums), so incremental training is
    value-identical to retraining."""
    from xcube_spark.pipeline.curation import probe_merge, probe_moments

    docs = spark.createDataFrame(
        [(i, i % 7 + 1, (i * 3) % 5 + 1, 10 + 3 * i % 11)
         for i in range(40)],
        "doc_id long, x1 long, x2 long, y long")
    full = probe_moments(docs, "y", "x1", "x2").collect()[0]
    st = probe_moments(docs.where(F.col("doc_id") < 15), "y", "x1", "x2")
    st = probe_merge(st, docs.where((F.col("doc_id") >= 15)
                                    & (F.col("doc_id") < 30)),
                     "y", "x1", "x2")
    st = probe_merge(st, docs.where(F.col("doc_id") >= 30),
                     "y", "x1", "x2")
    merged = st.collect()[0]
    assert merged.asDict() == full.asDict()


def test_contamination_matrix_detects_cross_split_dup(spark):
    """A doc duplicated across two splits must light up both ordered
    cells of the matrix; disjoint-content splits stay zero."""
    from pyspark.sql import Row

    from xcube_spark.pipeline.curation import contamination_matrix

    docs = spark.createDataFrame([
        Row(doc_id=0, text="the quick brown fox jumps high"),
        Row(doc_id=1, text="the quick brown fox jumps high"),  # dup of 0
        Row(doc_id=2, text="entirely different tokens here now ok"),
    ])
    split_df = spark.createDataFrame([
        Row(doc_id=0, split="train"),
        Row(doc_id=1, split="test"),
        Row(doc_id=2, split="val"),
    ])
    out = {(r["split_a"], r["split_b"]): r
           for r in contamination_matrix(docs, split_df).collect()}
    assert len(out) == 6  # full ordered 3x3 grid minus diagonal
    # 6 tokens -> 4 distinct trigrams shared between train and test
    assert out[("train", "test")]["n_shared_grams"] == 4
    assert out[("test", "train")]["n_shared_grams"] == 4
    assert out[("train", "test")]["n_docs_hit"] == 1
    assert out[("test", "train")]["n_docs_hit"] == 1
    # val shares nothing with anyone
    for a, b in out:
        if "val" in (a, b):
            assert out[(a, b)]["n_shared_grams"] == 0
            assert out[(a, b)]["n_docs_hit"] == 0


def test_class_rebalance_balances_and_is_stable(spark):
    from pyspark.sql import Row

    from xcube_spark.pipeline.curation import class_rebalance

    rows = ([Row(doc_id=i, lang="big") for i in range(20)]
            + [Row(doc_id=100 + i, lang="small") for i in range(5)])
    docs = spark.createDataFrame([Row(doc_id=r.doc_id, lang=r.lang,
                                      text="x") for r in rows])
    out = class_rebalance(docs, label_col="lang").collect()
    kept = {r["label"]: sum(1 for x in out
                            if x["label"] == r["label"] and x["kept"])
            for r in out}
    assert kept == {"big": 5, "small": 5}  # balanced to min class
    assert len(out) == 25  # every doc reported

    # stability: adding docs never drops a previously kept doc's rank
    grown = docs.union(spark.createDataFrame(
        [Row(doc_id=200 + i, lang="small", text="x") for i in range(5)]))
    before = {r["doc_id"] for r in out if r["kept"] and r["label"] == "big"}
    after_rows = class_rebalance(grown, label_col="lang",
                                 per_class=5).collect()
    after = {r["doc_id"] for r in after_rows
             if r["kept"] and r["label"] == "big"}
    assert before == after  # big class picks unchanged by small growth

    # explicit per_class cap
    capped = class_rebalance(docs, label_col="lang", per_class=3).collect()
    assert sum(1 for r in capped if r["kept"]) == 3 + 3


# ---- n-gram novelty (round-10 third-session addition) --------------------


def test_ngram_novelty_first_doc_wins(spark):
    from pyspark.sql import Row
    from xcube_spark.pipeline.curation import ngram_novelty

    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e"),          # all shingles new
        Row(doc_id=2, text="a b c d e"),          # exact dup: nothing new
        Row(doc_id=3, text="a b c x y z"),        # mixes old and new
    ])
    out = {r["doc_id"]: r for r in ngram_novelty(docs, k=3).collect()}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0
    # doc 3: shingles {a b c, b c x, c x y, x y z}; only 'a b c' is old
    assert out[3]["n_shingles"] == 4
    assert out[3]["n_novel"] == 3
    assert out[3]["novelty"] == 0.75


# ---- TextRank keywords (round-10 third-session addition) -----------------


def test_textrank_hub_token_ranks_first(spark):
    from pyspark.sql import Row
    from xcube_spark.pipeline.text import textrank_keywords

    # 'hub' is adjacent to every other token; spokes only touch hub
    docs = spark.createDataFrame([
        Row(doc_id=1, text="hub aa hub bb hub cc"),
        Row(doc_id=2, text="hub dd hub ee hub ff"),
        Row(doc_id=3, text="gg hub"),
    ])
    out = textrank_keywords(docs, iters=4, top=10).collect()
    assert out[0]["tok"] == "hub"
    assert out[0]["rank"] > out[1]["rank"]
    # ranks live on the 1e-7 grid
    for r in out:
        assert abs(r["rank"] * 1e7 - round(r["rank"] * 1e7)) < 1e-3


def test_textrank_deterministic_across_partitioning(spark):
    from pyspark.sql import Row
    from xcube_spark.pipeline.text import textrank_keywords

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 7}")
         for i in range(40)])
    a = [(r["tok"], r["rank"]) for r in
         textrank_keywords(docs, iters=3, top=8).collect()]
    b = [(r["tok"], r["rank"]) for r in
         textrank_keywords(docs.repartition(13), iters=3,
                           top=8).collect()]
    assert a == b


def test_textrank_driver_matches_distributed(spark):
    """The driver-fit variant must walk the identical nudge-rounded
    trajectory as the distributed iterations (and fall back cleanly
    when the edge table exceeds the driver cap)."""
    from pyspark.sql import Row
    from xcube_spark.pipeline.text import (textrank_keywords,
                                           textrank_keywords_driver)

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 7}")
         for i in range(40)] + [Row(doc_id=99, text="hub w0 hub w1")])
    a = [(r["tok"], r["rank"]) for r in
         textrank_keywords(docs, iters=4, top=10).collect()]
    b = [(r["tok"], r["rank"]) for r in
         textrank_keywords_driver(docs, iters=4, top=10).collect()]
    assert a == b
    # cap exceeded -> falls back to the distributed variant
    c = [(r["tok"], r["rank"]) for r in
         textrank_keywords_driver(docs, iters=4, top=10,
                                  max_edges=2).collect()]
    assert c == a


def test_block_dedup_attribution_and_edges(spark):
    """First-occurrence attribution: a block repeated later in the
    SAME doc and a block repeated in a LATER doc both count as dups;
    the first occurrence never does.  Short docs form one tail
    block."""
    from pyspark.sql import Row
    from xcube_spark.pipeline.dedup import block_dedup_stats

    blk_a = " ".join(f"a{i}" for i in range(16))
    blk_b = " ".join(f"b{i}" for i in range(16))
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{blk_a} {blk_b} {blk_a}"),  # 3rd dup of 1st
        Row(doc_id=2, text=blk_a),                        # dup of doc 1
        Row(doc_id=3, text="tiny tail"),                  # 1 short block
    ])
    out = {r["doc_id"]: r for r in
           block_dedup_stats(docs, block_tokens=16).collect()}
    assert out[1]["n_blocks"] == 3 and out[1]["n_dup_blocks"] == 1
    assert out[2]["n_blocks"] == 1 and out[2]["n_dup_blocks"] == 1
    assert out[3]["n_blocks"] == 1 and out[3]["n_dup_blocks"] == 0
    assert out[2]["dup_fraction"] == 1.0


def test_ccnet_buckets_tercile_split(spark):
    from pyspark.sql import Row
    from xcube_spark.pipeline.text import ccnet_buckets

    # 9 docs: 3 fluent (repeated common trigrams), 3 mid, 3 garbage
    rows = []
    for i in range(3):
        rows.append(Row(doc_id=i, text="the cat sat on the mat " * 6))
    for i in range(3, 6):
        rows.append(Row(doc_id=i, text="the cat zqx jkw on mat " * 6))
    for i in range(6, 9):
        rows.append(Row(doc_id=i, text=f"zz{i}qv jj{i}xw kk{i}yz " * 6))
    out = ccnet_buckets(spark.createDataFrame(rows)).collect()
    by_id = {r["doc_id"]: r["bucket"] for r in out}
    assert all(by_id[i] == "head" for i in range(3))
    assert all(by_id[i] == "tail" for i in range(6, 9))
    # buckets are roughly balanced thirds
    from collections import Counter
    c = Counter(by_id.values())
    assert set(c) == {"head", "middle", "tail"}
    assert max(c.values()) - min(c.values()) <= 1


def test_char_entropy_extremes(spark):
    import math
    from pyspark.sql import Row
    from xcube_spark.pipeline.text import char_entropy

    docs = spark.createDataFrame([
        Row(doc_id=1, text="aaaaaaaa"),          # zero entropy
        Row(doc_id=2, text="abcdefgh"),          # ln(8): uniform
        Row(doc_id=3, text="aabb"),              # ln(2)
    ])
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert abs(out[1]["entropy"]) < 1e-12
    assert abs(out[2]["entropy"] - math.log(8)) < 1e-12
    assert abs(out[3]["entropy"] - math.log(2)) < 1e-12
    assert out[2]["n_distinct"] == 8 and out[2]["n_chars"] == 8


def test_winnowing_shared_substring_guarantee(spark):
    """Docs sharing a substring of length >= k+w-1 (8) must share a
    fingerprint; identical docs share the digest."""
    from pyspark.sql import Row
    from xcube_spark.pipeline.dedup import winnowing_fingerprints

    common = "plagiarized passage here"
    docs = spark.createDataFrame([
        Row(doc_id=1, text="aaa " + common + " zzz"),
        Row(doc_id=2, text="qqq completely other " + common),
        Row(doc_id=3, text="nothing in common with those"),
        Row(doc_id=4, text="aaa " + common + " zzz"),
    ])
    out = winnowing_fingerprints(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["fp_digest"] == rows[4]["fp_digest"]
    assert rows[1]["fp_digest"] != rows[3]["fp_digest"]
    # overlap check via the raw selected sets: recompute per doc pair
    from pyspark.sql import functions as F
    sel = winnowing_fingerprints(docs).select("doc_id", "fp_digest")
    # docs 1 and 2 share the common passage -> their fingerprint SETS
    # must intersect; verify via the library's gram machinery
    g1 = winnowing_fingerprints(docs.where(F.col("doc_id") == 1))
    g2 = winnowing_fingerprints(docs.where(F.col("doc_id") == 2))
    # digests differ (different docs) but that's fine; the theorem is
    # about set intersection, checked by re-deriving sets here
    import hashlib
    def fps(text, k=5, w=4):
        grams = [hashlib.md5(text[i:i+k].encode()).hexdigest()
                 for i in range(len(text) - k + 1)]
        return {min(grams[i:i+w]) for i in range(len(grams) - w + 1)}
    assert fps("aaa " + common + " zzz") & fps(
        "qqq completely other " + common)


def test_winnowing_and_shingles_short_doc_edges(spark):
    """Regression (r10 advice): docs shorter than k+w-1 chars emit no
    winnowing row (and no bogus grams from a descending sequence);
    docs with fewer than k tokens emit no word shingles — matching
    the pos-join SQL twins."""
    from pyspark.sql import Row
    from xcube_spark.pipeline.dedup import shingles, winnowing_fingerprints

    docs = spark.createDataFrame([
        Row(doc_id=1, text="ab"),            # < k chars, < k tokens
        Row(doc_id=2, text="abcdefg"),       # 7 chars < k+w-1 = 8
        Row(doc_id=3, text="abcdefgh"),      # exactly k+w-1: 1 window
        Row(doc_id=4, text="one two"),       # 2 tokens < k = 3
        Row(doc_id=5, text="one two three"), # exactly k tokens
    ])
    wf = {r["doc_id"]: r for r in winnowing_fingerprints(docs).collect()}
    assert 1 not in wf and 2 not in wf
    assert wf[3]["n_grams"] == 4 and wf[3]["n_fingerprints"] == 1
    sh = shingles(docs, k=3).collect()
    by_id = {}
    for r in sh:
        by_id.setdefault(r["doc_id"], []).append(r["shingle"])
    assert 1 not in by_id and 2 not in by_id and 4 not in by_id
    assert by_id[5] == ["one two three"]


def test_zipf_slope_recovers_synthetic_power_law(spark):
    """A corpus built with freq(rank) ~ rank^-1 must fit slope ~ -1."""
    from pyspark.sql import Row
    from xcube_spark.pipeline.text import zipf_slope

    words = []
    for r in range(1, 41):
        words += [f"w{r:02d}"] * max(1, 400 // r)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(words[i::10])) for i in range(10)])
    row = zipf_slope(docs, top=40).collect()[0]
    assert row["n_tokens"] == 40
    assert -1.15 < row["slope"] < -0.85


def test_cdc_spans_tile_each_document(spark):
    """CDC chunk spans partition the document exactly: contiguous,
    non-overlapping, covering [1, len]."""
    from pyspark.sql import Row
    from xcube_spark.pipeline.dedup import cdc_chunk_spans

    texts = [
        "the quick brown fox jumps over the lazy dog " * 4,
        "short",  # shorter than the hash window -> one chunk
        "a" * 200,  # constant run: hash constant after warmup
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t) for i, t in enumerate(texts)])
    spans = cdc_chunk_spans(docs, hash_window=16, divisor=64)
    rows = sorted(((r["doc_id"], r["chunk_no"], r["chunk_start"],
                    r["chunk_end"], r["chunk_len"])
                   for r in spans.collect()))
    by_doc = {}
    for d, n, s, e, l in rows:
        by_doc.setdefault(d, []).append((n, s, e, l))
    for i, t in enumerate(texts):
        ch = by_doc[i]
        assert ch[0][1] == 1                      # starts at 1
        assert ch[-1][2] == len(t)                # ends at len
        for (n1, s1, e1, l1), (n2, s2, e2, _) in zip(ch, ch[1:]):
            assert n2 == n1 + 1 and s2 == e1 + 1  # contiguous
        assert all(l == e - s + 1 for _, s, e, l in ch)
    assert len(by_doc[1]) == 1  # sub-window doc is one whole chunk


def test_cdc_boundaries_realign_after_insertion(spark):
    """The CDC property: prepending text shifts every fixed-size
    block, but content-defined boundaries downstream of the edit
    re-align — the two documents share most chunk hashes."""
    from pyspark.sql import Row
    from xcube_spark.pipeline.dedup import cdc_chunk_spans

    base = ("data pipelines dedup shared boilerplate across the "
            "crawl while unique content stays put " * 8)
    edited = "INSERTED PREFIX >>> " + base
    docs = spark.createDataFrame(
        [Row(doc_id=0, source="s", text=base),
         Row(doc_id=1, source="s", text=edited)])
    spans = cdc_chunk_spans(docs, hash_window=16, divisor=64)
    hashes = {0: set(), 1: set()}
    for r in spans.collect():
        hashes[r["doc_id"]].add(r["chunk_hash"])
    shared = hashes[0] & hashes[1]
    # all but the first chunk(s) around the edit must re-align
    assert len(shared) >= max(1, len(hashes[0]) - 2), (
        len(shared), len(hashes[0]), len(hashes[1]))


def test_cdc_dedup_stats_counts_duplicate_chunks(spark):
    from pyspark.sql import Row
    from xcube_spark.pipeline.dedup import cdc_dedup_stats

    t = "common shared boilerplate text that repeats verbatim " * 6
    docs = spark.createDataFrame(
        [Row(doc_id=0, source="s", text=t),
         Row(doc_id=1, source="s", text=t)])  # exact twin
    out = cdc_dedup_stats(docs, group_col="source").collect()
    assert len(out) == 1
    r = out[0]
    # twin docs: every chunk appears at least twice
    assert r["n_unique_chunks"] * 2 <= r["n_chunks"]
    assert r["chars_unique"] * 2 <= r["chars_total"]
    assert r["dedup_ratio"] >= 0.5


def test_pmi_collocations_detects_fixed_phrase(spark):
    """A bigram that ALWAYS co-occurs ("new york") must out-score
    bigrams of independently-shuffled fillers, and its PMI must match
    the closed form from exact counts."""
    import math
    from pyspark.sql import Row
    from xcube_spark.pipeline.text import pmi_cooccurrence

    fillers = ["a", "b", "c", "d", "e", "f"]
    docs = []
    for i in range(30):
        toks = [fillers[(i * 7 + j * 5) % 6] for j in range(8)]
        toks[3:3] = ["new", "york"]  # the phrase, always adjacent
        docs.append(Row(doc_id=i, text=" ".join(toks)))
    out = {(r["a"], r["b"]): (r["rank"], r["c_ab"], r["pmi"])
           for r in pmi_cooccurrence(
               spark.createDataFrame(docs), top=50,
               min_count=5).collect()}
    assert ("new", "york") in out
    rank, c_ab, pmi = out[("new", "york")]
    assert rank == 1                       # the phrase tops the list
    assert c_ab == 30
    n_tok = 30 * 10
    n_pairs = 30 * 9
    want = math.log((30 / n_pairs) / ((30 / n_tok) * (30 / n_tok)))
    assert abs(pmi - want) < 1e-5
