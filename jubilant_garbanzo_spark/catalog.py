"""Catalog: schema'd views over the driver's parquet tables.

The reference is schemaless — fields are method calls on twitter4j
objects (``main.scala:42,45``) and there is no catalog at all
(SURVEY.md §1.1). Here every table is a typed DataFrame and registered
as a temp view so the DataFrame and SQL entry points are interchangeable
(SURVEY.md §3.2–3.3).

Scale note: at 100 TB these would be partitioned/bucketed external
tables (partition by date for ``events``/``orders``, bucket fact tables
by join key). Locally they are single parquet files; the read path is
identical either way (``spark.read.parquet``), and all downstream code
depends only on the view names.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jubilant_garbanzo_spark.session import configure_runtime

#: All driver-provided tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at EVERY scale factor —
#: region (5), nation (25), supplier (10 per sf unit) stay tiny even at
#: 100 TB fact scale; joins against them must be broadcast-hash joins.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table with schema normalization.

    ``events.ts`` is ns-precision parquet (FIXTURES.md): with
    ``nanosAsLong`` it arrives as a long; ``ts DIV 1000`` is the exact
    integer truncation to µs (matching DuckDB's ns→µs read), then
    ``timestamp_micros`` rebuilds a timestamp. Cast to TIMESTAMP_NTZ so
    all engine timestamps are naive-UTC like the other tables
    (``o_orderdate``/``l_shipdate`` already read as TIMESTAMP_NTZ).
    """
    configure_runtime(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table; keys are table names."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (idempotent) and return them."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
