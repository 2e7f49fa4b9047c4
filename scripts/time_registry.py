"""Spark-side-only timing sweep: every registry query once (fn +
toArrow, no oracle), one JSON line per query to stdout.

Usage: python scripts/time_registry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from xcube_spark.queries import load_all
    from xcube_spark.session import get_session

    registry = load_all()
    spark = get_session(app_name="time-registry")
    spark.range(1000).selectExpr("sum(id)").collect()
    for name, q in registry.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            n = q.fn(spark, sf_dir).toArrow().num_rows
            err = None
        except Exception as e:  # noqa: BLE001
            n, err = -1, str(e)[:200]
        print(json.dumps({"q": name, "s": round(time.time() - t0, 2),
                          "rows": n, **({"err": err} if err else {})}),
              flush=True)


if __name__ == "__main__":
    main()
