"""Stage-level profile of dedup_ngram_jaccard at sf0.1 (guide §1):
time each pipeline prefix with the noop sink, and measure prefix-bucket
skew (candidate mass per shingle bucket) to decide whether VERDICT r15
#4's skew accounting applies.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from jubilant_garbanzo_spark.catalog import fan_out_scan, load_table  # noqa: E402
from jubilant_garbanzo_spark.operators import dedup as D  # noqa: E402
from jubilant_garbanzo_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def t(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    spark = get_spark("probe-ngram")
    d = fan_out_scan(
        spark, load_table(spark, SF, "documents"), SF, "documents"
    )
    sh, cand = D.ngram_prefix_candidates(d, "doc_id", "text", 3, 0.5)
    full = D.ngram_jaccard_pairs(d, "doc_id", "text", 3, 0.5)

    # Warm-up.
    t(full)
    out = {}
    for _ in range(2):
        out.setdefault("sh_only", []).append(t(sh))
        out.setdefault("cand_only", []).append(t(cand))
        out.setdefault("full", []).append(t(full))

    # Bucket skew: per prefix-shingle candidate mass (pairs before the
    # positional filter = nA*nB cross within the bucket ~ n*(n-1)/2).
    hashed = sh.select(
        "id",
        F.size("sh").alias("sz"),
        F.array_distinct(
            F.transform("sh", lambda s: F.xxhash64(s))
        ).alias("hs"),
    )
    ex = hashed.select(
        "id", "sz", F.size("hs").alias("szh"), F.explode("hs").alias("s")
    )
    freq = ex.groupBy("s").agg(F.count("*").alias("df"))
    from fractions import Fraction

    frac = Fraction(0.5).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator
    ceil_t_sz = F.expr(
        f"CAST((CAST(sz AS BIGINT) * {num} + {den} - 1) DIV {den} AS INT)"
    )
    prefix_len = F.when(F.col("szh") < F.col("sz"), F.col("szh")).otherwise(
        F.col("sz") - ceil_t_sz + 1
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.asc("df"), F.asc("s"))
    prefix = (
        ex.join(freq, "s")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("id", "s")
    )
    bucket = prefix.groupBy("s").agg(F.count("*").alias("n"))
    stats = bucket.agg(
        F.count("*").alias("n_buckets"),
        F.sum("n").alias("postings"),
        F.max("n").alias("max_bucket"),
        F.expr("percentile_approx(n, 0.5)").alias("med_bucket"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pair_mass"),
    ).first()
    top = [r["n"] for r in bucket.orderBy(F.desc("n")).limit(10).collect()]
    top_mass = sum(n * (n - 1) // 2 for n in top)
    out["bucket_stats"] = {
        "n_buckets": stats["n_buckets"],
        "postings": stats["postings"],
        "max_bucket": stats["max_bucket"],
        "med_bucket": stats["med_bucket"],
        "pair_mass": stats["pair_mass"],
        "top10_buckets": top,
        "top10_pair_mass": top_mass,
    }
    out["n_candidates"] = cand.count()
    print(json.dumps(out, indent=1, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
