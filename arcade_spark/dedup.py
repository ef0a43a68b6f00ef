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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

SHINGLE_K = 3
MINHASH_N = 128
LSH_BANDS = 32
LSH_ROWS = 4
JACCARD_THRESHOLD = 0.8
MAX_BUCKET = 64  # skew guard: ignore degenerate buckets (all-same boilerplate)
_OPH_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)  # empty-bin sentinel
_LOG2_N = MINHASH_N.bit_length() - 1  # 128 bins = top 7 hash bits


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a public-domain 64-bit mixer (full-period
    bijection); used to derive band seeds and densification values."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


_BAND_SEEDS = _mix64(np.arange(10_001, 10_001 + LSH_BANDS, dtype=np.uint64))


def _oph_signatures(doc_idx: np.ndarray, base: np.ndarray, n_docs: int) -> np.ndarray:
    """One-Permutation-Hashing MinHash (Li/Owen/Zhang 2012; rotation
    densification per Shrivastava/Li 2014): hash each shingle ONCE,
    route it to bin = top log2(MINHASH_N) bits, keep the min per
    (doc, bin), then fill empty bins from the nearest filled bin to the
    circular right, mixing in the borrow distance. O(n log n) total vs
    the classic k-permutation scheme's O(n·MINHASH_N) — the difference
    between touching 8 B and 1 KB of memory per shingle, which is what
    parallel workers contend on. Returns (n_docs, MINHASH_N) uint64;
    rows of shingle-less docs stay at the empty sentinel."""
    bins = base >> np.uint64(64 - _LOG2_N)
    key = doc_idx.astype(np.uint64) * np.uint64(MINHASH_N) + bins
    order = np.lexsort((base, key))
    ks, hs = key[order], base[order]
    first = np.ones(len(ks), dtype=bool)
    first[1:] = ks[1:] != ks[:-1]
    flat = np.full(n_docs * MINHASH_N, _OPH_EMPTY, dtype=np.uint64)
    flat[ks[first].astype(np.int64)] = hs[first]
    S = flat.reshape(n_docs, MINHASH_N)
    sparse = S.copy()  # borrow from ORIGINAL bins only (stable scheme)
    empty = S == _OPH_EMPTY
    k = 1
    while empty.any() and k < MINHASH_N:
        src = np.roll(sparse, -k, axis=1)
        fill = empty & (src != _OPH_EMPTY)
        if fill.any():
            S[fill] = _mix64(src[fill] + np.uint64(k))
            empty &= ~fill
        k += 1
    return S


def _band_rows(doc_ids: np.ndarray, offsets: np.ndarray, base: np.ndarray):
    """(doc_id, band_hash) rows for one Arrow batch: OPH signatures,
    then LSH_ROWS consecutive signature slots fold into each band's
    64-bit bucket id. Docs with no shingles are skipped."""
    n_docs = len(doc_ids)
    lens = np.diff(offsets)
    keep = lens > 0
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    S = _oph_signatures(doc_idx, base, n_docs)
    mr = S.reshape(n_docs, LSH_BANDS, LSH_ROWS)  # consecutive slots per band
    h = np.broadcast_to(_BAND_SEEDS, (n_docs, LSH_BANDS)).copy()
    for r in range(LSH_ROWS):
        h = _mix64(h ^ mr[:, :, r])
    ids = np.repeat(doc_ids[keep], LSH_BANDS)
    return ids, h.view(np.int64)[keep].reshape(-1)


def _banded(shingle_arrays: DataFrame) -> DataFrame:
    """(doc_id, band_hash) — MinHash signatures + LSH banding in ONE
    pass over (doc_id, sh: array<string>): the per-shingle base hash is
    a single JVM-side ``xxhash64`` inside the shingle array (no
    explode, no per-permutation Catalyst expressions), and a mapInArrow
    kernel consumes the list column's flat int64 buffer ZERO-COPY (no
    Python string/int objects) to build OPH signatures and emit band
    buckets. This removes the round-2 plan's 128 xxhash64 expressions
    over the exploded shingle table AND the 128-column signature
    shuffle (bucket join fan-out unchanged, candidates still
    exact-verified)."""
    import pyarrow as pa

    arrays = shingle_arrays.select(
        "doc_id",
        F.transform("sh", lambda s: F.xxhash64(s)).alias("hs"),
    )

    def kernel(batches):
        for batch in batches:
            yield _band_batch(batch)

    return arrays.mapInArrow(kernel, schema="doc_id long, band_hash long")


def _band_batch(batch) -> "pa.RecordBatch":
    """One Arrow batch (doc_id, hs: list<int64>) → (doc_id, band_hash)
    rows; offset-robust (handles sliced list arrays and untrimmed child
    buffers)."""
    import pyarrow as pa

    ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    hs = batch.column(1)
    if isinstance(hs, pa.ChunkedArray):
        hs = hs.combine_chunks()
    offs = np.frombuffer(hs.buffers()[1], dtype=np.int32)[
        hs.offset: hs.offset + len(hs) + 1
    ].astype(np.int64)
    flat = hs.values.to_numpy(zero_copy_only=False).astype(np.int64)
    # `.values` is the UN-sliced child array: normalize so a sliced
    # batch (non-zero list offset / untrimmed child buffer) can't
    # misalign doc_idx against the value run
    flat = flat[offs[0]: offs[-1]]
    offs = offs - offs[0]
    base = flat.view(np.uint64)
    out_ids, out_bands = _band_rows(ids, offs, base)
    return pa.RecordBatch.from_arrays(
        [pa.array(out_ids, type=pa.int64()),
         pa.array(out_bands, type=pa.int64())],
        names=["doc_id", "band_hash"],
    )


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: md5(text) → group size + kept doc_id."""
    d = _documents(spark, sf_dir)
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id"))
    )


def _shingle_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh: array<string>) distinct word-3-gram shingles per
    doc; docs with fewer than 3 words are excluded (same rule in the
    oracle SQL). The source is one small parquet file → one input
    split; repartition so the shingle work parallelizes."""
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
        .select("doc_id", F.array_distinct("sh").alias("sh"))
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) exploded distinct shingles — the exact-verify
    join side."""
    return _shingle_arrays(spark, sf_dir).select(
        "doc_id", F.explode("sh").alias("shingle")
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

    # cache the COMPACT per-doc shingle arrays (not the exploded view):
    # both the banding kernel and the exact-verify join derive from it,
    # so the normalize+shingle string work runs once
    arrays = _shingle_arrays(spark, sf_dir)
    if shingle_storage == "memory":
        arrays = arrays.cache()
    elif shingle_storage == "disk":
        arrays = arrays.persist(StorageLevel.DISK_ONLY)
    elif shingle_storage != "recompute":
        raise ValueError(f"unknown shingle_storage: {shingle_storage!r}")
    shingles = arrays.select("doc_id", F.explode("sh").alias("shingle"))
    # signatures + band buckets in ONE Arrow-batched kernel over the
    # un-exploded shingle arrays (round-3 rewrite, see _banded); banded
    # is reused by the bucket-size guard and both join sides
    banded = _banded(arrays).cache()
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


_CC_MAX_ROUNDS = 20
# below this many (deduped, symmetric) edges the components resolve
# with one collect + driver union-find: the distributed loop costs
# several shuffle rounds of fixed latency that dwarf tiny pair sets,
# and 4M edges is ~64 MB on the driver — the same ceiling class as
# the semijoin broadcast cap
_CC_DRIVER_MAX_EDGES = 4_000_000


def dedup_cluster(
    spark: SparkSession,
    sf_dir: str,
    pairs: DataFrame | None = None,
    max_rounds: int = _CC_MAX_ROUNDS,
    driver_max_edges: int = _CC_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Near-dup CLUSTERING — connected components over the verified
    near-dup pairs, plus canonical-document selection: the last stage
    of a dedup pipeline (pairs alone don't say which docs to drop when
    duplicates chain A~B~C). Output: one row per document —
    (doc_id, cluster, keep) with ``cluster`` = the smallest doc_id in
    the component and ``keep`` = (doc_id == cluster); documents in no
    pair are singleton clusters.

    Scale design: the edge set is the VERIFIED candidate-pair output
    (tiny relative to the corpus — LSH banding already collapsed it),
    symmetric-closed once. Components resolve by min-label propagation
    with POINTER JUMPING (label(v) ← min over neighbors' labels, then
    label ← label(label)): the jump halves the label-chain depth every
    round, so convergence is O(log diameter) rounds of O(|E|)
    shuffles — the alternating-star contraction family of CC
    algorithms. The driver-side convergence probe per round counts
    changed labels (one aggregate over the label frame, O(nodes in
    pairs) — never the corpus); ``max_rounds`` bounds the loop and a
    non-converged graph raises rather than returning partial labels.
    Pair sets under ``driver_max_edges`` short-circuit to one collect
    plus driver union-find instead — the distributed loop's fixed
    per-round shuffle latency dwarfs a tiny (by design: these are
    VERIFIED near-dup pairs) edge set."""
    docs = _documents(spark, sf_dir).select("doc_id")
    if pairs is None:
        pairs = dedup_minhash_lsh(spark, sf_dir)
    e = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    edges = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .cache()
    )
    # full count, not limit(n+1).count(): CollectLimit executes the
    # plan partition-batch by partition-batch, re-running the whole
    # (expensive) pair pipeline several times; one parallel count
    # materializes the cache in a single pass and costs O(1) to read
    n_edges = edges.count()
    if n_edges <= driver_max_edges:
        # Arrow toPandas into two primitive int64 arrays, NOT collect():
        # 4M PySpark Row objects cost hundreds of bytes each (multi-GB
        # of Python heap near the cap), while two int64 columns are
        # ~64 MB (round-8, ADVICE r7)
        pdf = edges.toPandas()
        us = pdf["u"].to_numpy(dtype="int64")
        vs = pdf["v"].to_numpy(dtype="int64")
        edges.unpersist()
        parent: dict[int, int] = {}

        def _find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for ru, rv in zip(us.tolist(), vs.tolist()):
            ra, rb = _find(ru), _find(rv)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        lab = [(x, _find(x)) for x in parent]
        if lab:
            lab_df = F.broadcast(
                spark.createDataFrame(lab, "doc_id long, cluster long")
            )
            out = docs.join(lab_df, "doc_id", "left")
        else:
            out = docs.withColumn("cluster", F.lit(None).cast("long"))
        return (
            out.select(
                "doc_id",
                F.coalesce(F.col("cluster"), F.col("doc_id")).alias("cluster"),
            )
            .withColumn("keep", F.col("doc_id") == F.col("cluster"))
        )
    labels = (
        edges.select(F.col("u").alias("id")).distinct()
        .withColumn("lbl", F.col("id"))
        .cache()
    )
    converged = False
    for _ in range(max_rounds):
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("u"),
                              F.col("lbl").alias("ulbl")),
                "u",
            )
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("ulbl").alias("nlbl"))
        )
        prop = labels.join(nbr, "id", "left").select(
            "id",
            F.least(
                F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
            ).alias("lbl"),
        )
        # pointer jumping: lbl ← lbl(lbl) (labels are always node ids,
        # so the self-join resolves; left join keeps fixed points)
        jump = prop.select(
            F.col("id").alias("jid"), F.col("lbl").alias("jlbl")
        )
        new = (
            prop.join(jump, prop["lbl"] == jump["jid"], "left")
            .select(
                prop["id"],
                F.coalesce(F.col("jlbl"), prop["lbl"]).alias("lbl"),
            )
            .cache()
        )
        changed = (
            new.select(F.col("id"), F.col("lbl").alias("nl"))
            .join(labels, "id")
            .filter(F.col("nl") != F.col("lbl"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} "
            "rounds — raise max_rounds (component diameter is "
            "pathological for a near-dup graph)"
        )
    out = (
        docs.join(
            labels.select(F.col("id").alias("doc_id"),
                          F.col("lbl").alias("cluster")),
            "doc_id", "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("cluster"), F.col("doc_id")).alias("cluster"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster"))
    )
    edges.unpersist()
    return out
