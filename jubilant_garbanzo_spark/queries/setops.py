"""Sort / limit / set operations (SURVEY.md §2b "Sort / limit / set ops").

R7 (global descending sort, ``main.scala:49``) and R8 (top-10 take,
``main.scala:52``) re-expressed the Catalyst way: ``orderBy().limit()``
fuses into TakeOrderedAndProject — each partition keeps a local top-K
heap and only K rows per partition reach the driver, vs the reference's
full range-partitioned sort followed by ``take(10)``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from jubilant_garbanzo_spark.catalog import load_table
from jubilant_garbanzo_spark.queries import register


@register(
    "sort_multikey_nulls",
    oracle="""
        SELECT c_custkey, c_acctbal,
               nullif(c_mktsegment, 'BUILDING') AS seg_or_null
        FROM customer
        ORDER BY seg_or_null ASC NULLS FIRST,
                 c_acctbal DESC,
                 c_custkey ASC
        LIMIT 40
    """,
    tags=("sort",),
)
def sort_multikey_nulls(spark, sf_dir):
    """Multi-key sort with explicit NULLS FIRST + unique tie-break
    (limit queries must be totally ordered to be deterministic)."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        c.select("c_custkey", "c_acctbal", seg.alias("seg_or_null"))
        .orderBy(
            F.col("seg_or_null").asc_nulls_first(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey").asc(),
        )
        .limit(40)
    )


@register(
    "limit_topk",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 10
    """,
    tags=("sort", "topk"),
)
def limit_topk(spark, sf_dir):
    """R8's top-10 as TakeOrderedAndProject (verify via .explain: no
    global Sort node, no full shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_extendedprice").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    ).limit(10)


@register(
    "set_union_all",
    oracle="""
        SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
    tags=("setop",),
)
def set_union_all(spark, sf_dir):
    """UNION ALL — pure concatenation, no shuffle at all."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@register(
    "set_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union_distinct(spark, sf_dir):
    """UNION DISTINCT = union + dedup shuffle."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect(spark, sf_dir):
    """INTERSECT (distinct): nations with both debt customers and
    suppliers."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0).select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_except(spark, sf_dir):
    """EXCEPT (distinct): nations with customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.distinct().subtract(s.distinct())


@register(
    "set_except_all",
    oracle="""
        SELECT o_orderstatus AS status FROM orders WHERE o_custkey < 50
        EXCEPT ALL
        SELECT o_orderstatus AS status FROM orders WHERE o_custkey < 25
    """,
    tags=("setop",),
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL: multiset difference (keeps surplus duplicates)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_custkey") < 50).select(
        F.col("o_orderstatus").alias("status")
    )
    b = o.filter(F.col("o_custkey") < 25).select(
        F.col("o_orderstatus").alias("status")
    )
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle="""
        SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity > 40
        INTERSECT ALL
        SELECT l_returnflag AS flag FROM lineitem WHERE l_discount > 0.05
    """,
    tags=("setop",),
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL: multiset intersection."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 40).select(
        F.col("l_returnflag").alias("flag")
    )
    b = li.filter(F.col("l_discount") > 0.05).select(
        F.col("l_returnflag").alias("flag")
    )
    return a.intersectAll(b)


@register(
    "set_union_missing_columns",
    oracle="""
        SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal
        FROM customer
        UNION ALL BY NAME
        SELECT s_suppkey + 1000000 AS id, s_name AS name, s_nationkey
        FROM supplier
    """,
    tags=("setop", "union", "schema-evolution"),
)
def set_union_missing_columns(spark, sf_dir):
    """Schema-evolution union: ``unionByName(allowMissingColumns=True)``
    over two entity projections with disjoint extra columns (customers
    carry acctbal, suppliers carry nationkey) — each side's missing
    column fills with NULL, the append pattern every long-lived table
    with added columns needs. DuckDB twin: ``UNION ALL BY NAME``.

    Scale shape: pure narrow union — no shuffle at all; the column
    reconciliation is a metadata operation."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + 1000000).alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("s_nationkey"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "ids_global_row_number",
    oracle="""
        WITH numbered AS (
            SELECT o_orderkey,
                   CAST(o_orderkey % 64 AS BIGINT) AS bucket,
                   row_number() OVER (
                       ORDER BY o_orderkey % 64, o_orderkey
                   ) AS global_rn
            FROM orders
        )
        SELECT o_orderkey, bucket, CAST(global_rn AS BIGINT) AS global_rn
        FROM numbered
        WHERE global_rn % 100 = 1 OR global_rn = (SELECT count(*) FROM orders)
    """,
    tags=("sort", "scale", "row-number"),
)
def ids_global_row_number(spark, sf_dir):
    """Dense global row numbering WITHOUT a global single-partition
    window — the scalable replacement for ``row_number() OVER (ORDER BY ...)``,
    whose empty PARTITION BY funnels the entire table through one task.

    Two-phase (the classic distributed offset pattern):

    1. bucket every row by a key prefix (``o_orderkey % 64``) and
       count rows per bucket — a 64-row map-side-combinable aggregate;
    2. turn counts into bucket start offsets with a window over the
       64-ROW COUNTS TABLE (the only "global" window touches 64 rows,
       never the data);
    3. within-bucket ``row_number`` (shuffle partitioned BY bucket,
       each task sorts only its bucket) + broadcast the offsets back.

    global_rn = offset(bucket) + rn equals exactly
    ``row_number() OVER (ORDER BY bucket, key)`` — the oracle computes
    THAT directly with DuckDB's global window, proving the
    decomposition. Emitted every-100th row (plus the last) to keep
    the compare set small while still covering every bucket boundary.

    At 100 TB: phase 1 is one reduce over 64 cells; phase 3's sort is
    per-bucket (raise the bucket count to keep buckets
    executor-sized); nothing ever single-tasks the table. Same reason
    ``monotonically_increasing_id`` is NOT used: its values depend on
    physical partitioning, which is neither stable nor
    oracle-checkable.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    bucketed = o.select(
        "o_orderkey", (F.col("o_orderkey") % 64).cast("bigint").alias("bucket")
    )
    counts = bucketed.groupBy("bucket").agg(F.count("*").alias("n"))
    w_off = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        F.col("bucket").alias("obucket"),
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset"),
    )
    w_in = Window.partitionBy("bucket").orderBy("o_orderkey")
    total = o.agg(F.count("*").alias("total"))
    return (
        bucketed.withColumn("rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), F.col("bucket") == F.col("obucket"))
        .select(
            "o_orderkey",
            "bucket",
            (F.col("offset") + F.col("rn")).cast("bigint").alias("global_rn"),
        )
        .crossJoin(F.broadcast(total))
        .filter(
            ((F.col("global_rn") % 100) == 1)
            | (F.col("global_rn") == F.col("total"))
        )
        .select("o_orderkey", "bucket", "global_rn")
    )
