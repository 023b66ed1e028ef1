"""Embedding similarity search (SURVEY §2b LLM-pipeline ops).

Vectors are plain ``array<float>`` columns; all arithmetic is Catalyst
higher-order functions (``zip_with`` + ``aggregate``) — JVM-side,
codegen'd, no UDFs — after casting to double for stable accumulation.

Scale story:
- brute-force top-k: one scan, per-partition top-k via
  TakeOrderedAndProject — the correctness baseline and still the right
  answer when the query set is small;
- IVF-style ANN: coarse-quantize vectors into buckets (here: nearest
  per-``label`` centroid), search only the probed bucket(s). The
  centroid table is tiny → broadcast; the bucket assignment is a
  narrow map; candidate scan touches ~1/n_buckets of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``embeddings`` against a 1-row ``query``
    DataFrame (columns: ``q_id``, ``q_vec``). The query side is
    broadcast; ordering is total (cosine desc, id asc)."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )
    q = F.broadcast(query.select("q_id", as_double(F.col("q_vec")).alias("qv")))
    return (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def similarity_join(
    embeddings: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs with cosine ≥ threshold inside a blocking key — the
    candidate-bounded form of a similarity self-join (blocking plays
    the role LSH bucketing plays in dedup.minhash_lsh_pairs)."""
    e = embeddings.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    a = e.select("blk", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = e.select("blk", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "blk",
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: centroids = per-bucket mean vector;
    probe the ``n_probe`` centroids nearest the query; exact cosine
    only within probed buckets. Recall vs brute force is unit-tested
    (tests/test_llm_ops.py); rows-only at the driver (approximate by
    construction)."""
    e = embeddings.select(
        F.col(bucket_col).alias("bkt"),
        F.col(id_col).alias("vec_id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    # Dimension-agnostic per-bucket mean: posexplode → avg per (bucket,
    # dim) → reassemble ordered by position. Two small shuffles over
    # |buckets|×dim rows — negligible next to the vector scan.
    centroids = (
        e.select("bkt", F.posexplode("v").alias("pos", "x"))
        .groupBy("bkt", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("bkt")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.getField("m"),
            ).alias("centroid")
        )
    )
    q = F.broadcast(query.select("q_id", as_double(F.col("q_vec")).alias("qv")))
    probed = F.broadcast(
        centroids.crossJoin(q)
        .select(
            "bkt", cosine(F.col("centroid"), F.col("qv")).alias("c_sim")
        )
        .orderBy(F.desc("c_sim"), F.asc("bkt"))
        .limit(n_probe)
        .select("bkt")
    )
    return (
        e.join(probed, "bkt", "left_semi")
        .crossJoin(q)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )
