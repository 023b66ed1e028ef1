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
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
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


@register(
    "tpch_q8_market_share",
    oracle=f"""
        WITH flat AS (
            SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS rev,
                   sn.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o    ON l.l_orderkey = o.o_orderkey
            JOIN customer c  ON o.o_custkey  = c.c_custkey
            JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
            JOIN region r    ON cn.n_regionkey = r.r_regionkey
            JOIN part p      ON l.l_partkey  = p.p_partkey
            JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
            JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
            WHERE r.r_name = 'ASIA'
              AND p.p_type = 'ECONOMY'
              AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                                    AND TIMESTAMP '1996-12-31 00:00:00'
        )
        SELECT o_year,
               {exact_sum_sql("CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END", 4)}
                   / {exact_sum_sql("rev", 4)} AS mkt_share
        FROM flat
        GROUP BY o_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share, adapted to fixture values:
    region ASIA, type ECONOMY, supplier nation NATION_3): the widest
    join tree in the set — 7 joins, 5 of them broadcast dims. The
    share is a ratio of two exact-cents sums, so the division is
    engine- and partitioning-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1996-12-31 00:00:00").cast("timestamp_ntz"),
        )
    )
    c = load_table(spark, sf_dir, "customer")
    cn = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flat = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == cn["n_nationkey"])
        .join(F.broadcast(r), cn["n_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev"),
            "supp_nation",
        )
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", F.col("rev")).otherwise(
        F.lit(0.0)
    )
    return flat.groupBy("o_year").agg(
        (exact_sum(nation_rev, 4) / exact_sum(F.col("rev"), 4)).alias("mkt_share")
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution; the priority
    filter stands in for the original's comment NOT LIKE): LEFT join
    with a filter ON THE JOIN (not a WHERE — that would drop
    order-less customers), two stacked aggregations."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o["o_custkey"] == c["c_custkey"])
            & (o["o_orderpriority"] != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey,
                   {exact_sum_sql("l_extendedprice * (1 - l_discount)", 4)}
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier by quarterly revenue): the revenue CTE
    replaces the original's CREATE VIEW; the max is a broadcast scalar.
    Because revenues are exact-cents sums, the max-equality filter is
    deterministic — no float-tie flakiness between engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(rev, s["s_suppkey"] == rev["l_suppkey"])
        .join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
        WITH pavg AS (
            SELECT l_partkey,
                   sum(l_quantity) / count(*) AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT {exact_sum_sql("l.l_extendedprice")} / 7.0 AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
        JOIN pavg  ON pavg.l_partkey = l.l_partkey
        WHERE l.l_quantity < 0.2 * pavg.avg_qty
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): the correlated
    per-part average is decorrelated into a groupBy + join — the plan
    Catalyst produces for the subquery form anyway, written explicitly
    so both engines share it. sum/count (not avg()) keeps the average
    bit-exact: quantities are integral doubles, so the sum is exact
    regardless of partial-agg order."""
    li = load_table(spark, sf_dir, "lineitem")
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum("l_quantity") / F.count("*")).alias("avg_qty")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(pavg, li["l_partkey"] == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (exact_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
        )
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
        WITH pos AS (
            SELECT (CAST(sum(CAST(round(c_acctbal * 100.0) AS BIGINT))
                         AS BIGINT) / 100.0) / count(*) AS avg_bal
            FROM customer
            WHERE c_acctbal > 0.0 AND c_nationkey BETWEEN 1 AND 7
        )
        SELECT c.c_nationkey AS cntrycode,
               count(*) AS numcust,
               (CAST(sum(CAST(round(c.c_acctbal * 100.0) AS BIGINT))
                     AS BIGINT) / 100.0) AS totacctbal
        FROM customer c, pos
        WHERE c.c_nationkey BETWEEN 1 AND 7
          AND c.c_acctbal > pos.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >=
                                TIMESTAMP '2001-01-01 00:00:00')
        GROUP BY c.c_nationkey
    """,
    tags=("tpch", "join", "anti", "subquery"),
)
def tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity, adapted: nationkey stands
    in for the fixture's missing phone country code, and "no orders"
    becomes "no orders since 2001-01-01" — every fixture customer has
    ≥1 lifetime order, which made the literal form vacuously empty at
    every SF; the dormant-customer variant keeps the NOT EXISTS
    anti-join shape AND produces rows, so the driver hash actually
    exercises the query body). Anti-join for NOT EXISTS; the average
    is a broadcast scalar over exact-cents sums."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").between(1, 7)
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (exact_sum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
        )
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            exact_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
