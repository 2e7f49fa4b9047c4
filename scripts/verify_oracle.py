"""Local replica of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle at the given
sf dir, then compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted by their string repr —
the driver's documented comparison shape).

Usage: python scripts/verify_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from xcube_spark.queries import TABLES, load_all
from xcube_spark.session import get_session


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.6f}"  # post-ROUND formatting guard
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = get_session(app_name="verify-oracle")
    con = duckdb.connect()
    # cap + spill like bench_duckdb: the sf1 substring/cluster oracles
    # otherwise exhaust RAM next to the Spark JVM (OOM-killed sweep)
    con.execute("SET memory_limit = '48GB'")
    con.execute("SET temp_directory = '/tmp/duckdb_verify_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, q in registry.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.sql is None:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(q.sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sn = normalize([tuple(r) for r in srows], scols)
            on = normalize(orows, ocols)
            if sn != on:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sn, on)) if a != b), None
                )
                problems.append(
                    f"values differ (first diff row {diff}):\n"
                    f"  spark : {sn[diff][:200] if diff is not None else ''}\n"
                    f"  oracle: {on[diff][:200] if diff is not None else ''}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
