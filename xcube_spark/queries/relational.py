"""Relational coverage queries on the driver's TPC-H-ish star schema.

These exercise the engine's join/aggregate/sort surface (SURVEY §2.12:
sorts/limits/set-ops are free in Spark; joins appear in the reference
only as point-extraction alignment, §2.4).  Plans are deliberately
broadcast-aware: dimension tables (region/nation/supplier/part at these
scales) broadcast; only fact-fact joins shuffle on their keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xcube_spark.queries import query, tbl


@query(
    "q1_pricing_summary",
    sql="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy groupBy agg; map-side partial agg makes
    the shuffle carry only |flag x status| groups."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    sql="""
        SELECT l.l_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> broadcast join -> top-k
    (TakeOrderedAndProject, no global sort materialization)."""
    c = tbl(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    l = tbl(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        l.join(F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    sql="""
        SELECT n.n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: star join; every dimension side broadcasts, so the
    only shuffle is the final small groupBy."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    l = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "top_customers_by_revenue",
    sql="""
        SELECT c.c_custkey, c.c_name,
               ROUND(SUM(o.o_totalprice), 4) AS total_spent,
               COUNT(*) AS n_orders
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY total_spent DESC, c_custkey
        LIMIT 20
    """,
)
def top_customers_by_revenue(spark, sf_dir):
    """max_valids-style top-k trimming (webapi/timeseries/controllers.py:268):
    ORDER BY ... LIMIT N -> TakeOrderedAndProject."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "merge_union_concat",
    sql="""
        SELECT o_orderkey AS key, 'order' AS kind, o_totalprice AS amount
        FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT l_orderkey AS key, 'line' AS kind,
               l_extendedprice AS amount
        FROM lineitem WHERE l_extendedprice > 90000
    """,
)
def merge_union_concat(spark, sf_dir):
    """xr.concat analog — UNION ALL along a discriminator dim
    (SURVEY §2.12, vars2dim.py:42 / dsio.py:342)."""
    o = tbl(spark, sf_dir, "orders").where("o_totalprice > 400000").select(
        F.col("o_orderkey").alias("key"),
        F.lit("order").alias("kind"),
        F.col("o_totalprice").alias("amount"),
    )
    l = tbl(spark, sf_dir, "lineitem").where("l_extendedprice > 90000").select(
        F.col("l_orderkey").alias("key"),
        F.lit("line").alias("kind"),
        F.col("l_extendedprice").alias("amount"),
    )
    return o.unionByName(l)


@query(
    "q6_forecast_revenue",
    sql="""
        SELECT ROUND(CAST(SUM(l_extendedprice * l_discount) AS DOUBLE), 4)
                   AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the pure filter+aggregate scan — every
    predicate (date range, discount band, quantity cap) must reach the
    parquet reader as a PushedFilter, making this the pushdown
    benchmark: at 100 TB it reads only row groups whose min/max stats
    intersect the band."""
    li = tbl(spark, sf_dir, "lineitem")
    f = li.where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q18_large_orders",
    sql="""
        WITH big AS (
            SELECT l_orderkey, ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2)
                       AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 150
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
               ROUND(o.o_totalprice, 2) AS o_totalprice,
               b.total_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume orders): aggregate-then-join — the
    HAVING filter shrinks lineitem to the rare big orders BEFORE any
    join, so both joins see a filtered build side AQE can broadcast;
    the anti-pattern (join first, aggregate after) would shuffle the
    full fact table twice."""
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    # filter on the RAW sum (mirrors the oracle's HAVING SUM(...) > 150),
    # then round for output — filtering the rounded value would diverge
    # for per-order sums in (150, 150.005)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__raw_qty"))
        .where(F.col("__raw_qty") > 150)
        .select(
            "l_orderkey",
            F.round(F.col("__raw_qty").cast("double"), 2).alias("total_qty"),
        )
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "q4_order_priority",
    sql="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): EXISTS decorrelates
    to a LEFT SEMI join — Catalyst plans a semi hash join keyed on
    l_orderkey, so the lineitem side carries only the join key + ship
    date through the shuffle and duplicate matches never multiply
    rows.  The commit/receipt columns of canonical Q4 aren't in the
    driver's lineitem; 'shipped after order date' keeps the same
    correlated-EXISTS plan shape."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    sel = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    matched = sel.join(
        li,
        (sel["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > sel["o_orderdate"]),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count"))


@query(
    "q14_promo_revenue",
    sql="""
        SELECT ROUND(
                 100.00 * SUM(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0.0 END)
                 / SUM(l_extendedprice * (1 - l_discount))
                 + 1e-9, 4) AS promo_revenue_pct,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (promotion effect): month-filtered lineitem joins the
    part dimension — small enough to BROADCAST at any lineitem scale,
    so the only shuffle is the final single-group aggregate's 1-row
    exchange.  The ship-date filter pushes to the parquet scan."""
    li = tbl(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return j.agg(
        F.round(F.lit(100.00) * F.sum(promo) / F.sum(rev) + F.lit(1e-9),
                4).alias("promo_revenue_pct"),
        F.count(F.lit(1)).cast("long").alias("n_items"))


@query(
    "q10_returned_items",
    sql="""
        SELECT c_custkey, c_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 2)
                   AS revenue,
               ROUND(MAX(c_acctbal) + 1e-9, 2) AS acctbal
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): the canonical star-join —
    lineitem filters on the return flag at the scan, orders prunes the
    quarter, then the fact side joins broadcast customer+nation dims
    and a top-20 takes the result.  At 100 TB only the
    (custkey-grouped) partial aggregate shuffles; TakeOrderedAndProject
    keeps the sort at the 20-row limit, never a full order-by."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp")))
    li = tbl(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = tbl(spark, sf_dir, "nation")
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
         .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
         .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev) + F.lit(1e-9), 2).alias("revenue"),
             F.round(F.max("c_acctbal") + F.lit(1e-9), 2).alias("acctbal"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


#: Q2/Q16/Q21 run through spark.sql over temp views on purpose: the
#: point of these three is the Catalyst DECORRELATION machinery —
#: correlated scalar subquery -> aggregate+join, NOT IN -> null-aware
#: anti join, correlated EXISTS/NOT EXISTS -> left-semi/left-anti —
#: which the DataFrame-API queries never touch.  The SQL text is
#: dialect-shared: the DuckDB oracle runs the identical statement.

_Q2_SQL = """
    SELECT DISTINCT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, p_name, ROUND(l_extendedprice, 2) AS min_price
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE' AND p.p_size = 15
      AND l.l_extendedprice = (
          SELECT MIN(l2.l_extendedprice)
          FROM lineitem l2
          JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
"""

_Q16_SQL = """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
"""

_Q21_SQL = """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
"""


def _run_tpch_sql(spark, sf_dir, sql, tables):
    for t in tables:
        tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@query("q2_min_cost_supplier", sql=_Q2_SQL)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier; the driver schema has no
    partsupp, so lineitem is the part-supplier link): a CORRELATED
    SCALAR subquery — min European price per part — that Catalyst
    decorrelates into an aggregate joined back on the correlation key
    (no per-row re-execution).  The region/nation dims broadcast; the
    only corpus shuffles are the two partkey aggregations."""
    return _run_tpch_sql(
        spark, sf_dir, _Q2_SQL,
        ["part", "lineitem", "supplier", "nation", "region"])


@query("q16_supplier_part_cnt", sql=_Q16_SQL)
def q16_supplier_part_cnt(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): DISTINCT
    aggregation under a NOT IN subquery — Catalyst plans a null-aware
    LEFT ANTI join against the excluded-supplier set (tiny,
    broadcast), then a two-phase distinct aggregate on the
    (brand, type, size) key."""
    return _run_tpch_sql(
        spark, sf_dir, _Q16_SQL, ["lineitem", "part", "supplier"])


@query("q21_waiting_supplier", sql=_Q21_SQL)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept waiting; lateness =
    shipped >90 days after order date, the schema's stand-in for
    receipt>commit): DOUBLE-correlated EXISTS + NOT EXISTS over the
    same fact table — Catalyst turns them into a left-semi and a
    left-anti join keyed on l_orderkey, each pruning lineitem to the
    join key + predicate columns.  No candidate-pair blowup: both
    existence joins are linear in lineitem."""
    return _run_tpch_sql(
        spark, sf_dir, _Q21_SQL, ["supplier", "lineitem", "orders"])


# ---- round-8 additions: the remaining partsupp-free TPC-H shapes -------
#
# Shared-dialect SQL: the text IS the oracle (both engines run it
# verbatim), so correctness pins Catalyst's decorrelation / join
# planning against DuckDB's.  Canonical predicates are adapted to the
# driver schema (no partsupp/shipmode/comment columns; synthetic
# NATION_x / widget-noun dimension values).

_Q7_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
           OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", sql=_Q7_SQL)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping between two nations): a 6-way
    join where BOTH nation legs broadcast and the symmetric
    two-nation predicate prunes before the orders join; the only
    corpus shuffles are lineitem->orders->customer on their keys."""
    return _run_tpch_sql(
        spark, sf_dir, _Q7_SQL,
        ["supplier", "lineitem", "orders", "customer", "nation"])


_Q8_SQL = """
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                          ELSE CAST(0 AS DOUBLE) END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
"""


@query("q8_market_share", sql=_Q8_SQL)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): the deepest join tree
    in the suite — part/supplier/nation/region all broadcast, the
    lineitem->orders->customer chain shuffles once per key, and the
    share is a conditional-over-total aggregate (two sums, one
    pass).  Ratio rounded to 6: each sum's cross-engine order noise
    is ~1e-16 relative, far below the boundary."""
    return _run_tpch_sql(
        spark, sf_dir, _Q8_SQL,
        ["part", "lineitem", "supplier", "orders", "customer",
         "nation", "region"])


_Q9_SQL = """
    SELECT nation, o_year,
           ROUND(SUM(amount), 0) + 0.0 AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - CAST(0.6 AS DOUBLE) * p.p_retailprice * l.l_quantity
                   AS amount
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
"""


@query("q9_product_profit", sql=_Q9_SQL)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (product type profit; the schema has no
    partsupp, so supply cost is restated from p_retailprice): LIKE
    pushdown on the part dim before it broadcasts, profit as one
    projection, group by (nation, year).  Profit rounds to WHOLE
    units: the sf1 groups sum ~1.3e8 over ~6e5 rows, accumulating
    ~1e-2 of summation-order noise — past the cent boundary (caught
    by the sf1 sweep); the unit boundary has 50x margin."""
    return _run_tpch_sql(
        spark, sf_dir, _Q9_SQL,
        ["part", "lineitem", "supplier", "orders", "nation"])


_Q13_SQL = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
"""


@query("q13_customer_distribution", sql=_Q13_SQL)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer order distribution): LEFT OUTER join
    with an ON-clause filter (customers with zero matching orders
    must survive with c_count = 0), then a histogram of counts — two
    aggregations, the second over a key space of |distinct counts|."""
    return _run_tpch_sql(spark, sf_dir, _Q13_SQL,
                         ["customer", "orders"])


_Q15_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("q15_top_supplier", sql=_Q15_SQL)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): the revenue CTE is referenced
    twice — once joined, once under MAX — and Catalyst plans the
    scalar subquery as its own aggregate with the equality applied as
    a post-join filter (no per-row re-execution).  Revenue is ROUNDed
    INSIDE the CTE so the max-equality compares identical values on
    both engines — sf1's replicated suppliers tie the max exactly,
    and raw-float equality picked up 1-ulp summation-order noise
    (3 rows vs 1 at the sf1 sweep); per-supplier sums are ~1e6 with
    ~2e-7 order noise, far from the cent boundary."""
    return _run_tpch_sql(spark, sf_dir, _Q15_SQL,
                         ["lineitem", "supplier"])


_Q17_SQL = """
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_size < 10
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
"""


@query("q17_small_quantity", sql=_Q17_SQL)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): a correlated
    scalar AVG per part, decorrelated into a partkey aggregate joined
    back — the lineitem table is read twice but shuffled on the same
    key both times.  The 0.2*AVG threshold is a single deterministic
    float expression on both engines (integer quantities, exact
    sums), so the comparison cannot flake."""
    return _run_tpch_sql(spark, sf_dir, _Q17_SQL,
                         ["lineitem", "part"])


_Q19_SQL = """
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@query("q19_discounted_revenue", sql=_Q19_SQL)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue): the OR-of-ANDs predicate
    spanning both join sides — Catalyst extracts the common
    join-key equality and pushes the disjunction's single-side
    conjuncts (brand/size to the part scan, quantity to lineitem) so
    neither side scans full before the join."""
    return _run_tpch_sql(spark, sf_dir, _Q19_SQL,
                         ["lineitem", "part"])


_Q22_SQL = """
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM (
        SELECT CAST(c.c_nationkey % 7 AS INT) AS cntrycode, c.c_acctbal
        FROM customer c
        WHERE c.c_acctbal > (
                  SELECT AVG(c2.c_acctbal) FROM customer c2
                  WHERE c2.c_acctbal > CAST(0.0 AS DOUBLE))
          AND NOT EXISTS (
                  SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    ) custsale
    GROUP BY cntrycode
"""


@query("q22_global_sales_opportunity", sql=_Q22_SQL)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity; country code =
    nationkey mod 7, the schema's stand-in for phone prefixes): an
    uncorrelated scalar AVG threshold plus NOT EXISTS -> LEFT ANTI
    join against orders — customers with no RECENT orders (the dense
    synthetic order history leaves no orderless customers) and
    above-average balances, grouped over 7 codes."""
    return _run_tpch_sql(spark, sf_dir, _Q22_SQL,
                         ["customer", "orders"])


# ---- round-9 additions: q11/q12/q20 complete the 22-query set ----------
#
# Same shared-dialect discipline as the rounds 6-8 batches: the SQL
# text IS the oracle.  Canonical predicates adapted to the driver
# schema: no partsupp (lineitem is the part-supplier link, the Q2
# precedent), no shipmode/commit/receipt dates (returnflag classes and
# shipdate-vs-orderdate lateness stand in, the Q21 precedent).

_Q11_SQL = """
    SELECT l_partkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
               AS part_value
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING SUM(l_extendedprice * (1 - l_discount)) > (
        SELECT 0.001 * SUM(l2.l_extendedprice * (1 - l2.l_discount))
        FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        WHERE n2.n_name = 'NATION_3')
"""


@query("q11_important_stock", sql=_Q11_SQL)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification; part value =
    discounted revenue, the schema's partsupp-free stand-in for
    supplycost*availqty): a grouped aggregate filtered by an
    UNCORRELATED SCALAR aggregate over the same join — Catalyst plans
    the threshold as a one-row broadcast cross join into the HAVING
    filter, so the fact table is scanned twice but shuffled only on
    l_partkey; the nation filter prunes both scans at the supplier
    broadcast."""
    return _run_tpch_sql(spark, sf_dir, _Q11_SQL,
                         ["lineitem", "supplier", "nation"])


_Q12_SQL = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
"""


@query("q12_shipping_priority_class", sql=_Q12_SQL)
def q12_shipping_priority_class(spark, sf_dir):
    """TPC-H Q12 shape (shipping modes and order priority; returnflag
    classes + shipdate-vs-orderdate lateness stand in for shipmode +
    commit/receipt dates): the two-sided date predicate pushes the
    year bounds to the lineitem SCAN while the cross-table lateness
    comparison evaluates post-join; the CASE pivots aggregate
    map-side into 3 groups."""
    return _run_tpch_sql(spark, sf_dir, _Q12_SQL, ["orders", "lineitem"])


_Q20_SQL = """
    SELECT s_name, s_acctbal
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          WHERE l.l_partkey IN (
                    SELECT p_partkey FROM part
                    WHERE p_name LIKE 'red%')
            AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING SUM(l.l_quantity) > (
              SELECT 0.5 * AVG(l3.l_quantity) FROM lineitem l3
              WHERE l3.l_partkey = l.l_partkey))
"""


@query("q20_potential_promotion", sql=_Q20_SQL)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion; shipped-quantity
    share stands in for partsupp availqty): NESTED IN subqueries with
    a CORRELATED scalar aggregate inside the inner HAVING — Catalyst
    decorrelates the per-part average into an aggregate joined back
    on l_partkey, the part-name IN becomes a broadcast semi join, and
    the outer IN a left-semi on s_suppkey.  Every join is keyed;
    nothing quadratic."""
    return _run_tpch_sql(spark, sf_dir, _Q20_SQL,
                         ["supplier", "nation", "lineitem", "part"])
