"""Utility layer: extension registry + plugin discovery."""


def spread_small_input(df, min_ratio: int = 1):
    """Repartition ``df`` to the cluster's default parallelism ONLY
    when its current partition count is below it.

    For per-row-heavy stages (interpreted higher-order array exprs,
    explode fan-outs), input-byte-based file splitting underestimates
    the work: a single-file table scans as ~2 splits and serializes a
    32-core host onto 2 tasks.  At real scale files outnumber cores
    and this is a no-op — the corpus is never shuffled when the scan
    already spreads.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_ratio
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
