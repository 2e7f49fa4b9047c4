"""Repo-wide physical-plan audit: build EVERY registry query's plan
and flag the scale anti-patterns the 100 TB review looks for.

For each query (at the given sf dir, default sf0.001 — plans only,
nothing executes beyond model-sized plan-build collects like PQ
codebooks):

- ``CartesianProduct``      — unconditional fail (nothing in this
  repo should cross-join two data-sized sides);
- ``BroadcastNestedLoopJoin`` — allowed ONLY when one side is a
  one-row/model-sized aggregate (the scalar-broadcast idiom used by
  statistics/bloom/probe); the auditor counts them so a new
  data-sized BNLJ shows up as a diff;
- ``BatchEvalPython``       — row-at-a-time Python UDF: fail;
- ``ArrowEvalPython`` / ``MapInArrow`` / ``FlatMapGroupsInPandas`` —
  vectorized Python paths: reported (expected for the fused kNN
  kernels and compute_cube), not failed;
- exchange count            — reported, so shuffle regressions diff.

Writes one JSON line per query to stdout and a summary at the end.
Usage: python scripts/audit_plans.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def strip_initial_plans(plan: str) -> str:
    """Drop every ``== Initial Plan ==`` section from an executed-plan
    string so counts reflect the FINAL plan only.

    When a query's plan references cached relations that an earlier
    query in the same session already executed, their embedded
    AdaptiveSparkPlan(isFinalPlan=true) blocks print BOTH the final
    and the initial plan — double-counting every exchange (the r10
    minhash "41 -> 98" scare was exactly this artifact).  A section
    starts at a ``+- == Initial Plan ==`` marker and covers the
    following lines that are purely space-indented deeper than the
    marker (tree rails ``:`` at a shallower column mean the outer
    tree resumed)."""
    out = []
    skip_col = None  # column of the active Initial Plan marker
    for line in plan.split("\n"):
        content = line.lstrip(" :")
        col = len(line) - len(content)
        if skip_col is not None:
            rails_before = line[:skip_col]
            if col > skip_col and rails_before.strip(" ") == "":
                continue  # still inside the section
            skip_col = None
        if content.startswith("+- == Initial Plan ==") or content.startswith(
            "== Initial Plan =="
        ):
            skip_col = col
            continue
        out.append(line)
    return "\n".join(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from xcube_spark.queries import load_all
    from xcube_spark.session import get_session

    spark = get_session()
    reg = load_all()
    bad = 0
    rows = []
    for name, q in reg.items():
        if only and name not in only:
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = strip_initial_plans(
                df._jdf.queryExecution().executedPlan().toString())
        except Exception as exc:  # plan build failed
            print(json.dumps({"query": name, "error": str(exc)[:200]}))
            bad += 1
            continue
        rec = {
            "query": name,
            "cartesian": plan.count("CartesianProduct"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "py_udf": plan.count("BatchEvalPython"),
            "arrow_py": (plan.count("ArrowEvalPython")
                         + plan.count("MapInArrow")
                         + plan.count("FlatMapGroupsInPandas")
                         + plan.count("MapInPandas")),
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
        }
        if rec["cartesian"] or rec["py_udf"]:
            rec["FAIL"] = True
            bad += 1
        rows.append(rec)
        print(json.dumps(rec))
    n_bnlj = sum(r.get("bnlj", 0) for r in rows)
    print(json.dumps({
        "summary": True, "queries": len(rows), "fails": bad,
        "total_bnlj": n_bnlj,
        "total_exchanges": sum(r.get("exchanges", 0) for r in rows),
    }))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
