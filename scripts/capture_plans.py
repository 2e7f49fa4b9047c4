"""Capture .explain("formatted") for named queries to plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [name ...]
       (no names = the frozen BENCH_SET)

Writes plans/<tag>/<query>_<suffix>.txt.  Plan capture only builds the
plan (no execution), so it is safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xcube_spark.queries import BENCH_SET, load_all
from xcube_spark.session import get_session


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(BENCH_SET)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    spark = get_session(app_name="capture-plans")
    for name in names:
        q = registry[name]
        df = q.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
