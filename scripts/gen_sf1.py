"""Generate sf1 bench data by deterministic 10x replication of the
driver's sf0.1 tables (the driver provides sf0.001/0.01/0.1 only; the
judge's round-2 gate asks for an sf1 bench row so Spark's fixed
per-query floor stops dominating the ratios).

Replication preserves the statistical structure instead of inflating
it: keys are offset per replica so join fan-outs and group sizes scale
linearly, document text gets a per-replica suffix token so near-dup
cluster sizes stay at their sf0.1 values (a naive copy would square
the candidate-pair counts), and user ids are offset so sessions grow
in number, not in length.  Dimension tables (region, nation) are
shared, as in TPC-H.

Usage: python scripts/gen_sf1.py [out_dir] [replicas]
       (defaults /root/repo/testdata_sf1, 10; replicas=100 builds an
       sf10 directory for the scaling sweep — key offsets are
       per-replica steps, so any replica count keeps foreign keys
       aligned and near-dup cluster sizes at their sf0.1 values)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

#: parquet row-group sizing: a single giant row group is unsplittable
#: for any engine's parallel scan (Spark splits at row-group
#:  boundaries; DuckDB parallelizes per row group), so cap rows per
#: group to give both engines ~32-way scan parallelism
ROW_GROUP_ROWS = {
    "documents": 2_000, "embeddings": 1_000, "events": 50_000,
    "lineitem": 200_000, "orders": 100_000, "customer": 10_000,
    "part": 20_000, "supplier": 2_000,
}

#: per-table (key offsets, extra column rewrites); offsets must keep
#: foreign keys aligned across replicas
TABLES: dict[str, dict] = {
    "region": {},
    "nation": {},
    "customer": {"offsets": {"c_custkey": 10_000_000}},
    "supplier": {"offsets": {"s_suppkey": 10_000_000}},
    "part": {"offsets": {"p_partkey": 10_000_000}},
    "orders": {"offsets": {"o_orderkey": 100_000_000,
                           "o_custkey": 10_000_000}},
    "lineitem": {"offsets": {"l_orderkey": 100_000_000,
                             "l_partkey": 10_000_000,
                             "l_suppkey": 10_000_000}},
    "events": {"offsets": {"event_id": 100_000_000,
                           "user_id": 1_000_000}},
    "documents": {"offsets": {"doc_id": 10_000_000},
                  "rewrites": {"text": "CASE WHEN {i} = 0 THEN text "
                                       "ELSE text || ' repl{i}' END"}},
    "embeddings": {"offsets": {"vec_id": 10_000_000}},
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else REPLICAS
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for table, spec in TABLES.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{out_dir}/{table}.parquet"
        if not spec:  # shared dimension
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' "
                        f"(FORMAT PARQUET)")
            print(f"{table}: copied")
            continue
        cols = [c[0] for c in
                con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        parts = []
        for i in range(replicas):
            sel = []
            for c in cols:
                if c in spec.get("offsets", {}):
                    sel.append(f"{c} + {i * spec['offsets'][c]} AS {c}")
                elif c in spec.get("rewrites", {}):
                    sel.append(spec["rewrites"][c].format(i=i) + f" AS {c}")
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM '{src}'")
        union = " UNION ALL ".join(parts)
        rg = ROW_GROUP_ROWS.get(table, 100_000)
        con.execute(f"COPY ({union}) TO '{dst}' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})")
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
