"""Benchmark harness: runs the registry's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints one JSON
line with per-query wall-clock seconds.

Timing = full query wall time: plan + execute + materialize the full
result on the driver as an Arrow table (``df.toArrow()``), mirrored by
``scripts/bench_duckdb.py``'s ``fetch_arrow_table()`` — each engine's
native columnar export.  (Python-object rows — Spark ``collect()`` /
DuckDB ``fetchall()`` — were dropped in round 6: Spark's row pickling
cost ~4 s for a 200k-row result the engine computes in 0.3 s, charging
the engine for a Python artifact neither side needs at scale.)
A warmup pass primes the JVM/session; reported numbers are the median
of N runs.

Load-aware (round 12): rows whose min/max spread exceeds
``BENCH_SPREAD_TOL`` (default 1.5x, with a 0.3 s absolute floor so
sub-second scheduling jitter doesn't trigger it) are re-measured once
and the tighter-spread set wins; retried rows are listed under
``retried``.  The r11 sf1 record was taken at load 9.4 and overstated
half its rows ~3x — a number taken under external load must be
re-taken, not annotated.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from xcube_spark.queries import load_all
    from xcube_spark.session import get_session

    from xcube_spark.queries import BENCH_SET

    registry = load_all()
    # iterate in the FROZEN BENCH_SET tuple order, not registry order:
    # PRIORITY_ORDER reshuffles the registry every round, which used to
    # move the first-query cold-start penalty between rows and break
    # round-over-round comparability (r11 bench hygiene)
    bench_set = {n: registry[n] for n in BENCH_SET if n in registry}
    # capture BEFORE the session spins up: warmup itself drives the
    # 1-min average, so a post-warmup read always looks "loaded"
    load_start = round(os.getloadavg()[0], 2)
    spark = get_session(app_name="xcube_spark-bench")

    # warm the session (JVM JIT, parquet footer cache)
    spark.range(1000).selectExpr("sum(id)").collect()

    spread_tol = float(os.environ.get("BENCH_SPREAD_TOL", "1.5"))

    def measure(q) -> list[float]:
        # drop the previous query's persisted intermediates so cached
        # partitions and GC pressure don't leak across measurements
        spark.catalog.clearCache()
        # full GC between rows: 20+ heavy queries in one JVM leave
        # old-gen garbage that taxes later rows ~2x vs a fresh JVM
        # (r12: in-sweep bm25 2.7 s vs 1.4 s solo) — charging row N
        # for rows 1..N-1's garbage measures the sweep, not the query
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        times = []
        q.fn(spark, sf_dir).toArrow()  # warmup run (not timed)
        for _ in range(repeats):
            t0 = time.time()
            q.fn(spark, sf_dir).toArrow()
            times.append(time.time() - t0)
        return times

    results: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    retried: list[str] = []
    for name, q in bench_set.items():
        times = measure(q)
        # load guard: a wide max/min gap means external host load hit
        # this row — re-measure once and keep the tighter-spread set
        # (the polluted set's max is noise, not the query)
        if (max(times) > spread_tol * min(times)
                and max(times) - min(times) > 0.3):
            retry = measure(q)
            retried.append(name)
            if max(retry) - min(retry) < max(times) - min(times):
                times = retry
        results[name] = round(statistics.median(times), 4)
        # run spread: detects external host load polluting a round's
        # numbers (a wide max/min gap means re-measure, don't bisect)
        spread[name] = [round(min(times), 4), round(max(times), 4)]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "median_query_seconds",
                "value": round(sum(results.values()), 4),
                "unit": "sec",
                "queries": results,
                "min_max": spread,
                "retried": retried,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # host-noise context (round 8 bench hygiene): a 1-min
                # load average far above the run's own footprint means
                # the numbers are polluted — re-measure, don't bisect
                "load_avg_1m": round(os.getloadavg()[0], 2),
                "load_avg_start": load_start,
                "engine": f"spark-{spark.version}",
            }
        )
    )


if __name__ == "__main__":
    main()
