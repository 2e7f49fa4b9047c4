"""Decompose a bench row's wall time into phases (guide §1):

  build    — Python-side DataFrame/Column-tree construction (q.fn)
  analyze  — analysis + optimization (`df.schema` forces analysis;
             explain cost approximates optimize+physical planning)
  noop     — execution via the noop sink (compute only, no driver
             materialization)
  arrow    — full toArrow() (what bench.py times), separate invocation

Each phase is measured on a FRESH invocation of q.fn so nothing is
amortized, median of `repeats`.

Usage: python scripts/probe_phases.py QUERY [QUERY...] [--sf DIR]
       [--repeats N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    repeats = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    from xcube_spark.queries import load_all
    from xcube_spark.session import get_session

    registry = load_all()
    spark = get_session(app_name="xcube_spark-probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    for name in names:
        q = registry[name]
        spark.catalog.clearCache()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        # warmup (codegen caches, parquet footers)
        q.fn(spark, sf_dir).toArrow()

        build, analyze, noop, arrow = [], [], [], []
        for _ in range(repeats):
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            t1 = time.time()
            df.schema  # force analysis
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            build.append(t1 - t0)
            analyze.append(t2 - t1)
            noop.append(t3 - t2)
            t4 = time.time()
            q.fn(spark, sf_dir).toArrow()
            arrow.append(time.time() - t4)
        med = lambda xs: round(statistics.median(xs), 3)
        print(f"{name}: build={med(build)} analyze={med(analyze)} "
              f"noop={med(noop)} total_arrow={med(arrow)}")


if __name__ == "__main__":
    main()
