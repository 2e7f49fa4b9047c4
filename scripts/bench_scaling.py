"""Scaling sweep: the 8 data-dependent heavy rows at sf0.1 / sf1 /
sf10 (r12 verdict task 3 — ground the 100 TB plan-shape claims with a
measured decade of scaling).

Prints one JSON line: per-query median seconds at each sf plus the
fitted per-decade scaling exponent alpha where t ~ sf^alpha
(alpha = log10(t_sf10 / t_sf1)); alpha ~ 1 is linear scaling, < 1 is
floor-dominated, > 1 super-linear (a red flag for the 100x story).

Usage: python scripts/bench_scaling.py [repeats]
(testdata_sf10 comes from `python scripts/gen_sf1.py
/root/repo/testdata_sf10 100` — same generator, 100 replicas.)
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "doc_exact_dedup",
    "doc_minhash_near_dups",
    "doc_simhash_pairs",
    "doc_substring_dedup",
    "doc_bloom_decontaminate",
    "doc_bm25_topk",
    "emb_knn_pq",
    "events_asof_value",
)

SF_DIRS = {
    "0.1": "/root/testdata/sf0.1",
    "1": "/root/repo/testdata_sf1",
    "10": "/root/repo/testdata_sf10",
}


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from xcube_spark.queries import load_all
    from xcube_spark.session import get_session

    registry = load_all()
    spark = get_session(app_name="xcube_spark-scaling")
    spark.range(1000).selectExpr("sum(id)").collect()
    load_start = round(os.getloadavg()[0], 2)

    out: dict[str, dict[str, float]] = {n: {} for n in QUERIES}
    for sf, sf_dir in SF_DIRS.items():
        if not os.path.isdir(sf_dir):
            continue
        for name in QUERIES:
            q = registry[name]
            spark.catalog.clearCache()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            q.fn(spark, sf_dir).toArrow()  # warmup / state build
            times = []
            for _ in range(repeats):
                t0 = time.time()
                q.fn(spark, sf_dir).toArrow()
                times.append(time.time() - t0)
            out[name][sf] = round(statistics.median(times), 4)

    alphas = {}
    for name, per_sf in out.items():
        if "1" in per_sf and "10" in per_sf and per_sf["1"] > 0:
            alphas[name] = round(
                math.log10(per_sf["10"] / per_sf["1"]), 3)
    print(json.dumps({
        "metric": "scaling_sweep_seconds",
        "queries": out,
        "alpha_sf1_to_sf10": alphas,
        "repeats": repeats,
        "load_avg_start": load_start,
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "engine": f"spark-{spark.version}",
    }))


if __name__ == "__main__":
    main()
