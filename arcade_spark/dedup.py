"""Deduplication operators over the ``documents`` table: exact
(hash-groupBy), n-gram Jaccard pairs, MinHash+LSH near-dup, SimHash.
Spark-first: shingling/hashing/banding are all built-in functions
(explode / xxhash64 / groupBy-min) — Python never touches row data.

Scale notes (100 TB posture): the shingle self-join is the classic
quadratic trap; MinHash+LSH replaces it with a band-bucket join whose
fan-out is bounded by bucket size. The LSH candidate set is verified
with exact Jaccard, so with b=32, r=4 bands (128 hashes) recall at
j≥0.8 is 1-(1-0.8⁴)³² ≈ 0.99998 and the output matches the exact-pair
oracle. Popular-bucket skew is capped via a bucket-size guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

SHINGLE_K = 3
MINHASH_N = 128
LSH_BANDS = 32
LSH_ROWS = 4
JACCARD_THRESHOLD = 0.8
MAX_BUCKET = 64  # skew guard: ignore degenerate buckets (all-same boilerplate)


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: md5(text) → group size + kept doc_id."""
    d = _documents(spark, sf_dir)
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id"))
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct word-3-gram shingles; docs with fewer
    than 3 words are excluded (same rule in the oracle SQL). The source
    is one small parquet file → one input split; repartition so the
    shingle explosion parallelizes."""
    d = _documents(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    words = F.split(norm, " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(words) - SHINGLE_K),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, SHINGLE_K)),
    )
    return (
        d.select("doc_id", words.alias("w"), sh.alias("sh"))
        .filter(F.size("w") >= SHINGLE_K)
        .select("doc_id", F.explode(F.array_distinct("sh")).alias("shingle"))
    )


def _pairs_with_jaccard(shingles: DataFrame) -> DataFrame:
    counts = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(F.broadcast(counts.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("n_sh", "sh_a")), "id_a")
        .join(F.broadcast(counts.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("n_sh", "sh_b")), "id_b")
        .withColumn(
            "jacc_bp",
            F.floor(
                F.lit(10000) * F.col("n_inter")
                / (F.col("sh_a") + F.col("sh_b") - F.col("n_inter"))
            ).cast("long"),
        )
        .filter(F.col("jacc_bp") >= int(JACCARD_THRESHOLD * 10000))
        .select("id_a", "id_b", "jacc_bp")
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs: Jaccard over 3-word shingles ≥ 0.8
    (jaccard reported in integer basis points for oracle-stable
    hashing)."""
    return _pairs_with_jaccard(_shingles(spark, sf_dir))


def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, shingle_storage: str = "memory"
) -> DataFrame:
    """MinHash(128) + LSH(32 bands × 4 rows) candidates, verified with
    exact Jaccard — the scale path for near-dup at 10^12 docs. Output
    schema identical to dedup_ngram_jaccard.

    ``shingle_storage`` picks how the shingle set (reused by the minhash
    pass and the exact-verify join) is held across its two consumers:
    "memory" (default — fine up to executor-cache scale), "disk"
    (persist(DISK_ONLY): at 100 TB the exploded shingle set dwarfs
    cluster RAM; spilling it once beats recomputing the normalize+
    explode lineage for the verify join), or "recompute" (no persist —
    cheapest memory, pays the lineage twice; right when the verify-join
    candidate count is tiny and shingling is cheap)."""
    from pyspark import StorageLevel

    shingles = _shingles(spark, sf_dir)
    if shingle_storage == "memory":
        shingles = shingles.cache()
    elif shingle_storage == "disk":
        shingles = shingles.persist(StorageLevel.DISK_ONLY)
    elif shingle_storage != "recompute":
        raise ValueError(f"unknown shingle_storage: {shingle_storage!r}")
    hashes = shingles.select(
        "doc_id",
        *[
            F.xxhash64(F.lit(i), F.col("shingle")).alias(f"h{i}")
            for i in range(MINHASH_N)
        ],
    )
    sigs = hashes.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(MINHASH_N)]
    ).cache()  # reused by every band path below — without this the
    # 128-column aggregation recomputes once per downstream branch
    band_cols = [
        F.xxhash64(F.lit(band), *[F.col(f"m{band * LSH_ROWS + r}") for r in range(LSH_ROWS)]).alias(
            f"b{band}"
        )
        for band in range(LSH_BANDS)
    ]
    banded = sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("band_hash")).cache()
    bucket_sizes = banded.groupBy("band_hash").agg(F.count("*").alias("bsz"))
    banded = banded.join(
        F.broadcast(bucket_sizes.filter(F.col("bsz").between(2, MAX_BUCKET))), "band_hash"
    )
    x = banded.alias("x")
    y = banded.alias("y")
    candidates = (
        x.join(y, "band_hash")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
        .cache()
    )
    # exact verification of the candidate set
    counts = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shingles.select(F.col("doc_id").alias("id_a"), "shingle")
    b = shingles.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(F.broadcast(counts.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("n_sh", "sh_a")), "id_a")
        .join(F.broadcast(counts.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("n_sh", "sh_b")), "id_b")
        .withColumn(
            "jacc_bp",
            F.floor(
                F.lit(10000) * F.col("n_inter")
                / (F.col("sh_a") + F.col("sh_b") - F.col("n_inter"))
            ).cast("long"),
        )
        .filter(F.col("jacc_bp") >= int(JACCARD_THRESHOLD * 10000))
        .select("id_a", "id_b", "jacc_bp")
    )


SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit lane in both engines


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(60-bit) per document over word multiset. Word hash =
    first 15 hex chars of md5 (portable to the DuckDB oracle); bit b of
    the signature is the sign of Σ_words (±1 per occurrence)."""
    d = _documents(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    words = d.select("doc_id", F.explode(F.split(norm, " ")).alias("w"))
    hashed = words.select(
        "doc_id", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long").alias("h")
    )
    bits = hashed.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b")
    ).select(
        "doc_id",
        "b",
        F.when(F.expr("shiftright(h, cast(b as int)) & 1") == 1, 1)
        .otherwise(-1)
        .alias("v"),
    )
    return (
        bits.groupBy("doc_id", "b")
        .agg(F.sum("v").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), cast(b as int))"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )
