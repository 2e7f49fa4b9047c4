"""DuckDB baseline timing for the bench set (BASELINE.md methodology):
runs each bench query's oracle SQL over the given sf dir's parquet,
median of N repeats, prints one JSON line mirroring bench.py.

Result materialization is ``fetch_arrow_table()`` — DuckDB's native
columnar export — matching bench.py's ``df.toArrow()`` (round-6
methodology; Python-object rows charged both engines for an artifact
neither needs).

Usage: python scripts/bench_duckdb.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xcube_spark.queries import TABLES, load_all  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    registry = load_all()
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    # bound memory + allow spill (round 8 — VERDICT r7 item 7): the
    # sf1 substring-dedup oracle previously grew to 130 GB RSS and got
    # OOM-killed on repeat runs; a fixed limit with a temp directory
    # makes the baseline reproducible (DuckDB spills instead of dying)
    con.execute("SET memory_limit = '48GB'")
    con.execute(f"SET temp_directory = "
                f"'{os.path.join(os.getcwd(), '.duckdb_tmp')}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    results = {}
    for name, q in registry.items():
        if not q.bench or not q.sql:
            continue
        con.execute(q.sql).fetch_arrow_table()  # warmup
        times = []
        for _ in range(repeats):
            t0 = time.time()
            con.execute(q.sql).fetch_arrow_table()
            times.append(time.time() - t0)
        results[name] = round(statistics.median(times), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1].lstrip("_")
    print(json.dumps({"metric": "duckdb_median_query_seconds",
                      "value": round(sum(results.values()), 4),
                      "unit": "sec", "queries": results, "sf": sf,
                      "load_avg_1m": round(os.getloadavg()[0], 2),
                      "engine": f"duckdb-{duckdb.__version__}"}))


if __name__ == "__main__":
    main()
