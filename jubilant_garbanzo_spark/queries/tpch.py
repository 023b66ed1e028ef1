"""TPC-H-adapted headline queries over the star schema.

These are the multi-operator "real workload" queries the bench times at
sf0.1 (BASELINE.md). Adapted where the fixture schema lacks a TPC-H
column (no o_shippriority / l_shipmode / c_address — FIXTURES.md).

Scale strategy per query is noted in each docstring; the common themes:
dimension joins broadcast (region/nation/supplier are O(10²) rows at
any sf), fact-fact joins shuffle on the join key with AQE handling
skew, aggregates are two-phase hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jubilant_garbanzo_spark.catalog import load_table
from jubilant_garbanzo_spark.functions.money import exact_sum, exact_sum_sql
from jubilant_garbanzo_spark.queries import register


_REVENUE = "l_extendedprice * (1 - l_discount)"

_Q1_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           {exact_sum_sql("l_quantity")}                          AS sum_qty,
           {exact_sum_sql("l_extendedprice")}                     AS sum_base_price,
           {exact_sum_sql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
           {exact_sum_sql(
               "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
           {exact_sum_sql("l_quantity")} / count(*)               AS avg_qty,
           {exact_sum_sql("l_extendedprice")} / count(*)          AS avg_price,
           {exact_sum_sql("l_discount", 4)} / count(*)            AS avg_disc,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", oracle=_Q1_ORACLE, tags=("tpch", "agg"))
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary: scan-heavy two-phase hash aggregate.

    At 100 TB this is the pure-scan benchmark: predicate pushed to
    parquet row-groups, 4-column ReadSchema, partial aggregation on
    every input partition, tiny shuffle (|groups| = 6). Money sums use
    the exact-cents discipline (functions/money.py) so results are
    identical no matter how many partial aggregates combine them.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count("*")
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            exact_sum(disc_price, 4).alias("sum_disc_price"),
            exact_sum(charge, 6).alias("sum_charge"),
            (exact_sum(F.col("l_quantity")) / cnt).alias("avg_qty"),
            (exact_sum(F.col("l_extendedprice")) / cnt).alias("avg_price"),
            (exact_sum(F.col("l_discount"), 4) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey,
               {exact_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
               CAST(o.o_orderdate AS DATE) AS order_date
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey ASC
        LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3 (adapted: no o_shippriority column): top-10 unshipped
    orders by revenue for one market segment.

    Scale shape: customer filter first (selectivity ~1/5), then two
    hash joins; customer side broadcasts under AQE at bench scale. The
    final top-10 is TakeOrderedAndProject, never a global sort.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(exact_sum(revenue, 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
        SELECT n.n_name AS nation,
               {exact_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND c.c_nationkey = s.s_nationkey
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5: local-supplier revenue per nation in one region.

    Six-table join; supplier/nation/region broadcast (BROADCAST_DIMS),
    the customer⋈orders⋈lineitem chain shuffles on its keys. The
    c_nationkey = s_nationkey "local" predicate is applied post-join
    (it correlates the two broadcast sides).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(exact_sum(revenue, 4).alias("revenue"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT {exact_sum_sql("l_extendedprice * l_discount", 4)} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tags=("tpch", "filter", "agg"),
)
def tpch_q6(spark, sf_dir):
    """TPC-H Q6: pure filter+aggregate — the predicate-pushdown
    benchmark. All four predicates reach the parquet scan
    (PushedFilters); zero joins; the aggregate is a single scalar so
    the shuffle carries one row per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               {exact_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
               n.n_name AS nation
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10: top-20 customers by returned-item revenue."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(exact_sum(revenue, 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(round(l_quantity * 100.0) AS BIGINT)) > 150 * 100
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS order_date,
               o.o_totalprice,
               {exact_sum_sql("l.l_quantity")} AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
        GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18: customers with any order totalling > 150 units.

    The IN-subquery becomes a left-semi join on the pre-aggregated
    order keys — the aggregate runs once, and only qualifying orderkeys
    (a tiny set) flow into the semi join; at scale that set broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100.0).cast("bigint")).alias("q"))
        .filter(F.col("q") > 150 * 100)
        .select("l_orderkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(exact_sum(F.col("l_quantity")).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """,
    tags=("tpch", "semi", "agg"),
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 (adapted: commitdate→orderdate comparison): priority
    counts for orders with at least one late-shipping line. The
    correlated EXISTS is a left-semi join with a non-equi conjunct."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q7_nation_volume",
    oracle=f"""
        SELECT ns.n_name AS supp_nation,
               nc.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               {exact_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey  = l.l_suppkey
        JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey  = o.o_custkey
        JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
        WHERE ns.n_nationkey < 3 AND nc.n_nationkey < 3
          AND ns.n_nationkey <> nc.n_nationkey
        GROUP BY 1, 2, 3
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping, adapted): cross-border revenue per
    (supplier nation, customer nation, ship year).

    Scale shape: the two fact joins (lineitem⋈orders) shuffle on order
    key; every dimension hop (supplier, nation×2, customer) broadcasts.
    The nation inequality prunes BEFORE aggregation, map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (F.col("s_nk") < 3)
            & (F.col("c_nk") < 3)
            & (F.col("s_nk") != F.col("c_nk"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(exact_sum(revenue, 4).alias("revenue"))
    )


@register(
    "tpch_q12_priority_shipping",
    oracle="""
        SELECT o.o_orderpriority,
               sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count,
               count(*) AS n_lines
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "join", "conditional"),
)
def tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping priority classes, adapted to order priority
    — the fixture has no l_shipmode): conditional aggregation after a
    date-pruned fact join. The ship-date range is pushed to the
    lineitem scan; orders arrives via shuffle join on order key."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
        SELECT round(
            100.0 * {exact_sum_sql(
                "CASE WHEN p.p_type = 'PROMO' "
                "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 4)}
            / {exact_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)},
            6) AS promo_revenue_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    tags=("tpch", "join", "conditional"),
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): promo share of one month's
    revenue. One month of a date-partitioned fact = a handful of
    partitions after pruning; part is dimension-sized → broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
        )
        .agg(
            F.round(
                100.0 * exact_sum(promo, 4) / exact_sum(revenue, 4), 6
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q19_disjunctive",
    oracle=f"""
        SELECT {exact_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join", "filter"),
)
def tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    OR'd brand/size/quantity envelopes. Catalyst extracts the common
    l_quantity bounds for scan-level pushdown and evaluates the
    disjunction post-broadcast-join — the classic OR-predicate
    planning test."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(exact_sum(revenue, 4).alias("revenue"))
    )
