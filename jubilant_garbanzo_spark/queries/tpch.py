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
