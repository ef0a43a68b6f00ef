"""Similarity search over the ``embeddings`` table
(vec_id, embedding float[64], label).

- ``ann_cosine_topk`` — brute-force cosine top-k (the correctness
  baseline): broadcast the query set, JVM-side dot products via
  ``F.zip_with`` + ``F.aggregate`` (no Python), window top-k. Output is
  rank-based (no raw floats) so the DuckDB oracle hashes identically.
- ``ann_lsh_topk`` — the scale path: random-hyperplane LSH bucketing
  (deterministic planes from xxhash64), candidates restricted to the
  query's bucket ring, then exact re-rank. At 10^12 rows the bucket
  join replaces the full cross product; here it is rows-only checked
  (approximate by construction).
- ``embedding_cosine_pairs`` — near-duplicate embedding pairs ≥
  threshold (embedding-cosine near-dup for the dedup suite).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TOPK = 10
N_QUERIES = 5
PAIR_THRESHOLD_BP = 9500
LSH_PLANES = 6  # 64 buckets — sized so buckets hold ~n/64 vectors; at
# 10^12 rows you would raise this (bucket count ≈ n / desired_bucket)


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors for query vectors vec_id < 5 (excluding
    self). Output (query_id, rank, neighbor_id); ties broken by
    neighbor_id so the result is deterministic and float-free."""
    emb = _embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    joined = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", _cosine(F.col("embedding").cast("array<double>"),
                                   F.col("qv").cast("array<double>")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"))
    )


def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs (a<b) with cosine ≥ 0.95 — embedding near-dup
    detection. Basis-point jaccard-style integer output."""
    emb = _embeddings(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _cosine(F.col("va").cast("array<double>"),
                                   F.col("vb").cast("array<double>")))
        .filter(F.col("cos") * 10000 >= PAIR_THRESHOLD_BP)
        .select("id_a", "id_b")
    )


def _plane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (public splitmix-style
    mix, same as corpus.py)."""
    rng = np.random.default_rng(seed + 12345)
    v = rng.standard_normal(dim)
    return [float(x) for x in v]


def ann_lsh_topk(spark: SparkSession, sf_dir: str, dim: int = 64) -> DataFrame:
    """LSH-bucketed ANN: sign bits of `LSH_PLANES` fixed hyperplanes
    form the bucket key; queries search only their bucket (plus exact
    re-rank). Approximate — verified rows-only by the driver."""
    emb = _embeddings(spark, sf_dir)
    planes = [_plane(i, dim) for i in range(LSH_PLANES)]
    sig = None
    v = F.col("embedding").cast("array<double>")
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in p]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** i)
        sig = bit if sig is None else sig + bit
    bucketed = emb.withColumn("bucket", sig)
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cand = (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", _cosine(F.col("embedding").cast("array<double>"),
                                   F.col("qv").cast("array<double>")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"))
    )
