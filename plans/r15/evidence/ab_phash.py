"""Interleaved A/B: old multimodal_phash_dedup body (no checkpoint, no
fan-out) vs the new registered one."""
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from jubilant_garbanzo_spark.catalog import load_table
from jubilant_garbanzo_spark.operators import dedup as D
from jubilant_garbanzo_spark.operators import multimodal as M
from jubilant_garbanzo_spark.queries import load_all
from jubilant_garbanzo_spark.queries.llm import _PH_BANDS, _PH_BITS, _PH_HAMMING_MAX
from jubilant_garbanzo_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def old_body(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    fps = M.dhash_fingerprints(payloads).filter(F.col("dhash").isNotNull())
    bands = fps.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{b}_"),
                        F.substring("dhash", 1 + _PH_BITS * b, _PH_BITS),
                    )
                    for b in range(_PH_BANDS)
                ]
            )
        ).alias("band"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), "band")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )
    a = fps.select(F.col("doc_id").alias("id_a"), F.col("dhash").alias("ha"))
    b = fps.select(F.col("doc_id").alias("id_b"), F.col("dhash").alias("hb"))
    hd = D.hamming_distance_bitstrings(F.col("ha"), F.col("hb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", hd.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= _PH_HAMMING_MAX)
    )


def main():
    specs = load_all()
    spark = get_spark("ab-phash")
    new_fn = specs["multimodal_phash_dedup"].fn
    old_fn = lambda s, d: old_body(s, d)  # noqa: E731
    old_fn(spark, SF).write.format("noop").mode("overwrite").save()

    walls = {"old": [], "new": []}
    for _ in range(4):
        for label, fn in (("old", old_fn), ("new", new_fn)):
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            walls[label].append(round(time.perf_counter() - t0, 3))

    def dg(fn):
        rows = fn(spark, SF).collect()
        canon = sorted(tuple(str(v) for v in r) for r in rows)
        return hashlib.md5(repr(canon).encode()).hexdigest()[:12], len(rows)

    d0, d1 = dg(old_fn), dg(new_fn)
    med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
    print("old", walls["old"], med["old"])
    print("new", walls["new"], med["new"])
    print("speedup", round(med["old"] / med["new"], 3), "identical", d0 == d1)


if __name__ == "__main__":
    main()
