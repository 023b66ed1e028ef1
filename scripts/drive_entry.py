"""Simulate the external driver: vanilla SparkSession, import contract, run."""
import importlib.util
import sys

from pyspark.sql import SparkSession

# Vanilla session — deliberately NONE of the engine's configs.
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

df = mod.entry(spark)
rows = df.collect()
print("ENTRY ROWS:", len(rows))
print("SCHEMA:", df.schema.simpleString())
for r in rows[:3]:
    print("  ", tuple(r))

q = mod.queries()
o = mod.oracle_sql()
print("N_QUERIES:", len(q), "N_ORACLE:", len(o))

# Run one oracle pair the driver's way at sf0.01
import duckdb
name = "trending_topk"
sdf = q[name](spark, "/root/testdata/sf0.01")
srows = sorted(tuple(r) for r in sdf.collect())
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")
drows = sorted(tuple(r) for r in con.execute(o[name]).fetchall())
print("MATCH:", srows == drows, "| spark rows:", len(srows), "| duck rows:", len(drows))
print("SAMPLE:", srows[0] if srows else None)
spark.stop()
