"""Bucketed tables: shuffle-free co-located joins (SURVEY §4.2).

At 100 TB the single most expensive plan node is the pair of Exchanges
feeding a fact⋈fact sort-merge join. Bucketing both tables by the join
key into the same bucket count moves that shuffle to WRITE time, once,
and every subsequent join on that key is Exchange-free: Spark matches
bucket i of the left to bucket i of the right directly.

Locally the bucket count is small (8); on a cluster it is sized so one
bucket of the largest table fits an executor core's working set
(e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket file set).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from jubilant_garbanzo_spark.sources.formats import EXPORT_ROOT, _sf_tag


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> str:
    """Persist ``df`` as an external parquet table bucketed (and
    sorted) by ``bucket_key``. Bucket metadata lives in the session
    catalog; ``saveAsTable`` is required — a bare ``parquet(path)``
    write discards bucket spec."""
    spark = df.sparkSession
    if path is None:
        path = os.path.join(EXPORT_ROOT, "bucketed", table_name)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table_name)
    )
    return table_name


def bucketed_fixture_pair(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[DataFrame, DataFrame]:
    """(lineitem, orders) both bucketed by order key — built once per
    (sf, process) and reused; the write cost is the amortized shuffle."""
    tag = _sf_tag(sf_dir).replace(".", "_")
    li_name, o_name = f"li_bucketed_{tag}", f"orders_bucketed_{tag}"
    if not spark.catalog.tableExists(li_name):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
        )
        write_bucketed(li, li_name, "l_orderkey", n_buckets)
    if not spark.catalog.tableExists(o_name):
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderpriority", "o_orderdate"
        )
        write_bucketed(o, o_name, "o_orderkey", n_buckets)
    return spark.table(li_name), spark.table(o_name)
