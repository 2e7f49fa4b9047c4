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
    spark = get_session(app_name="xcube_spark-bench")

    # warm the session (JVM JIT, parquet footer cache)
    spark.range(1000).selectExpr("sum(id)").collect()

    results: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, q in bench_set.items():
        # drop the previous query's persisted intermediates so cached
        # partitions and GC pressure don't leak across measurements
        spark.catalog.clearCache()
        times = []
        q.fn(spark, sf_dir).toArrow()  # warmup run (not timed)
        for _ in range(repeats):
            t0 = time.time()
            q.fn(spark, sf_dir).toArrow()
            times.append(time.time() - t0)
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
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # host-noise context (round 8 bench hygiene): a 1-min
                # load average far above the run's own footprint means
                # the numbers are polluted — re-measure, don't bisect
                "load_avg_1m": round(os.getloadavg()[0], 2),
                "engine": f"spark-{spark.version}",
            }
        )
    )


if __name__ == "__main__":
    main()
