"""Utility layer: extension registry + plugin discovery."""

import weakref


def _parse_byte_size(s: str) -> int:
    """Parse a Spark byte-size conf value ('128m', '134217728b',
    '1g', plain digits)."""
    s = s.strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("tb", 1 << 40), ("k", 1 << 10), ("m", 1 << 20),
                      ("g", 1 << 30), ("t", 1 << 40), ("b", 1)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(float(s)) * mult


def spread_small_input(df, min_ratio: int = 1,
                       num_partitions: int | None = None,
                       key: str | None = None):
    """Repartition ``df`` to the cluster's default parallelism ONLY
    when its estimated scan-split count is below it.

    ``key``: spread by HASH of this column instead of round-robin.
    Callers whose downstream aggregate/window is clustered by a key
    set that CONTAINS this column (per-doc verdicts, per-doc token
    windows) should pass it: hash partitioning by a subset of the
    clustering keys satisfies the downstream distribution, so the
    spread exchange does double duty and the aggregate's own shuffle
    wave disappears (r12 optimization round, guide §2.4 "two
    operations keyed the same way can share one exchange").  It also
    skips round-robin's determinism sort.  Balance caveat (r13, per
    ADVICE r12): uniformly distributed ids balance like round-robin
    only when rows >> target partitions; when the row count is close
    to the core count, balls-in-bins hashing leaves ~1/e of the
    partitions empty and others with 2-4 rows — acceptable for the
    corpus tables this helper spreads (hundreds of rows at the
    smallest SF), but do not key-spread an input of ~cores rows, and
    never pass a skewed column.

    For per-row-heavy stages (interpreted higher-order array exprs,
    explode fan-outs), input-byte-based file splitting underestimates
    the work: a single-file table scans as ~2 splits and serializes a
    32-core host onto 2 tasks.  At real scale files outnumber cores
    and this is a no-op — the corpus is never shuffled when the scan
    already spreads.

    The split count is ESTIMATED driver-side from the optimizer's
    size statistics and the file list — ``df.rdd.getNumPartitions()``
    would be exact but forces a full plan-to-RDD conversion per call,
    a non-trivial analysis pass on wide plans (verdict r9).  Callers
    that know their partition count can pass ``num_partitions``.
    Estimation errs toward NOT shuffling: any failure to estimate,
    or a large byte size, skips the repartition.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    target = sc.defaultParallelism * min_ratio
    if num_partitions is None:
        try:
            size = int(df._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes())
            max_bytes = _parse_byte_size(
                spark.conf.get("spark.sql.files.maxPartitionBytes",
                               "128m"))
            est_splits = max(1, size // max(1, max_bytes))
            num_partitions = max(len(df.inputFiles()), est_splits)
        except Exception:
            return df
    if num_partitions < target:
        if key is not None:
            from pyspark.sql import functions as F

            return df.repartition(target, F.col(key))
        return df.repartition(target)
    return df


def tie_cache_lifetime(result, cached) -> None:
    """Release ``cached``'s persisted blocks when the Python ``result``
    DataFrame is garbage-collected.

    Builder functions that persist an intermediate feeding both an
    eager broadcast-build job and the returned lazy plan (bm25, dsir)
    cannot unpersist before the caller materializes the result — but
    leaving the persist in place accumulates cached partitions across
    invocations in a long-lived session (advice r9).  Tying the
    unpersist to the result's lifetime releases the cache exactly
    when no plan that could reuse it remains reachable.  (A plan
    DERIVED from the result stays correct after release — unpersist
    never invalidates a plan — it just recomputes.)
    """
    def _release(jdf=cached._jdf):
        try:
            jdf.unpersist(False)
        except Exception:
            pass  # session already stopped

    weakref.finalize(result, _release)
