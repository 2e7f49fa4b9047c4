"""bench.py's exact measurement loop on a subset of queries.

Usage: python scripts/bench_subset.py [--noop] name [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), BENCH_REPEATS.

--noop times the computation through the noop sink (guide §1.4)
instead of the official toArrow() materialization.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    noop = "--noop" in args
    names = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))

    from xcube_spark.queries import load_all
    from xcube_spark.session import get_session

    registry = load_all()
    spark = get_session(app_name="bench-subset")
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(q):
        df = q.fn(spark, sf_dir)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.toArrow()

    results = {}
    for name in names:
        q = registry[name]
        spark.catalog.clearCache()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        run(q)  # warmup
        times = []
        for _ in range(repeats):
            t0 = time.time()
            run(q)
            times.append(time.time() - t0)
        results[name] = {
            "median": round(statistics.median(times), 4),
            "min": round(min(times), 4),
            "max": round(max(times), 4),
        }
    print(json.dumps({"sf_dir": sf_dir, "noop": noop,
                      "load_avg_1m": round(os.getloadavg()[0], 2),
                      "queries": results}))


if __name__ == "__main__":
    main()
