"""Structured Streaming ingestion: continuously encode arriving corpus
files into the same encoded-blocks + manifest layout.

The reference is batch-only (distributed/streaming features are
unchecked roadmap items — README.md:132-138); this is our Spark-native
extension: a file-source ``readStream`` feeding ``foreachBatch``, where
each micro-batch runs the same deterministic encode used in batch mode.
Partition ids are allocated per (stream, micro-batch) from a reserved
range so streamed partitions never collide with batch ones, and the
manifest commit protocol (manifest.py) makes every micro-batch
checkpointable and idempotent — a replayed batch re-encodes the same
rows into the same partition ids and byte-identical blocks, then
overwrites the same files via tmp+rename.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from arcade_spark import BLOCK_ROWS

STREAM_PART_BASE = 1_000_000  # streamed part ids: BASE + batch_id * stride


class _pinned_state_partitions:
    """Pin ``spark.sql.shuffle.partitions`` (= the stateful operator's
    state-partition count, captured when the streaming query starts)
    for the duration of a ``writer.start()`` call, then restore.

    Why (guide §2.2/§9): every state partition pays a per-trigger
    state-store open/commit plus one task, so state partitions should
    be sized to KEY CARDINALITY, not to scan parallelism — a 32-core
    session running an 8-bucket dedup otherwise spends most of each
    micro-batch committing 24 empty state stores (measured on the
    session-window op in round 7: 40 s → ~10 s). StreamExecution
    clones the session conf synchronously inside ``start()``, so
    restoring right after start() is race-free; a replayed checkpoint
    keeps the partition count it was created with."""

    def __init__(self, spark: SparkSession, n: int | None):
        self.spark = spark
        self.n = n

    def __enter__(self):
        if self.n is not None:
            self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set("spark.sql.shuffle.partitions", str(int(self.n)))
        return self

    def __exit__(self, *exc):
        if self.n is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def encode_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    parts_per_batch: int = 8,
    block_rows: int = BLOCK_ROWS,
    trigger_available_now: bool = True,
):
    """Start (and return) a streaming query that encodes every file
    arriving under ``input_dir``. With ``trigger_available_now`` the
    query drains the currently-available input and stops — the pattern
    for incremental backfills; without it, it runs continuously."""
    from arcade_spark.encode import encode_job

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        base = STREAM_PART_BASE + int(batch_id) * parts_per_batch
        # deterministic per-batch partition range: replays re-encode the
        # same ids (manifest markers make the second write a no-op skip)
        encode_job(
            spark,
            batch_df,
            out_dir,
            num_parts=parts_per_batch,
            block_rows=block_rows,
            resume=True,
            part_id_offset=base,
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    buckets: int = 64,
    trigger_available_now: bool = True,
    max_files_per_trigger: int = 1,
    state_partitions: int | None = None,
):
    """Streaming exact dedup with CROSS-MICRO-BATCH state
    (``applyInPandasWithState`` — the custom-stateful-operator path the
    build mandate names): documents whose text fingerprint was already
    seen in ANY earlier micro-batch are dropped; first occurrences pass
    through to a parquet sink.

    State layout: one group per fingerprint hash bucket (``buckets``
    controls state-shuffle fan-out and per-group state size), each
    holding the bucket's seen-fingerprint list. On a real cluster the
    state lives in the checkpointed state store (RocksDB-backed when
    configured) — exactly how Spark intends unbounded keyed state to
    scale; for a bounded-memory variant at 10^12 docs you would swap
    the exact set for a per-bucket Bloom filter in the same state slot.

    Returns the started StreamingQuery; output rows: (doc_id, fp)."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    keyed = (
        stream.withColumn("fp", F.md5(F.col("text")))
        .withColumn("bucket", F.pmod(F.xxhash64(F.col("fp")), F.lit(buckets)))
        .select("bucket", "doc_id", "fp")
    )

    def dedup_fn(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            keep = []
            for doc_id, fp in zip(pdf["doc_id"], pdf["fp"]):
                if fp not in seen:
                    seen.add(fp)
                    keep.append((int(doc_id), fp))
            if keep:
                yield pd.DataFrame(keep, columns=["doc_id", "fp"])
        state.update((sorted(seen),))

    result = keyed.groupBy("bucket").applyInPandasWithState(
        dedup_fn,
        outputStructType="doc_id long, fp string",
        stateStructType="fps array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    # state partitions sized to key cardinality: there are exactly
    # ``buckets`` distinct state groups, so more state partitions than
    # buckets only add empty per-trigger store commits (guide §2.2).
    # The row set emitted is identical under any partition count.
    if state_partitions is None:
        cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        state_partitions = max(1, min(buckets, cur))
    with _pinned_state_partitions(spark, state_partitions):
        return writer.start()


def session_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    trigger_available_now: bool = True,
    max_files_per_trigger: int = 1,
    state_partitions: int | None = None,
):
    """Event-time SESSION windows with a watermark (round-6): Spark's
    built-in ``session_window`` — a session extends while successive
    events arrive AT MOST ``gap`` apart (measured: two events exactly
    ``gap`` apart merge into one session), merging across micro-batches
    in the state store. Boundary-identical to the batch ``sessionize``
    operator (readops.py), which also starts a new session only when
    the delta EXCEEDS the gap — so the two surfaces agree row-for-row
    on (key, session membership).

    Append mode emits a session exactly once, when the watermark passes
    its end (last event + gap); state eviction bounds memory at
    10^12-row streams. Finite replays should end with a far-future
    sentinel batch so every real session closes.

    Output rows: (session_start, session_end, <key_col>, n_events) —
    ``session_end`` is last event time + gap (Spark's window end)."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    # optional state-partition sizing (see _pinned_state_partitions):
    # session-window state should be sized to key cardinality; None
    # keeps the session default (callers may pin externally).
    with _pinned_state_partitions(spark, state_partitions):
        return writer.start()


def window_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    trigger_available_now: bool = True,
    max_files_per_trigger: int = 1,
    state_partitions: int | None = None,
):
    """Event-time WINDOWED aggregation with a WATERMARK (round-5 — the
    late-data pattern the build mandate names): tumbling epoch-aligned
    windows over ``ts_col``, counts per (window, key), append-mode
    parquet sink. A window's row is emitted exactly once, when the
    watermark (max event time seen minus ``watermark``) passes the
    window end — late rows inside the allowance still count; rows
    later than that are dropped by Spark's state eviction, which is
    what bounds state at 10^12-row streams.

    Finite-replay note: append mode only emits CLOSED windows, so a
    bounded replay should end with a far-future sentinel batch that
    pushes the watermark past every real window (the sentinel's own
    window never closes and is never emitted).

    Output rows: (window_start timestamp, <key_col>, cnt long)."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), key_col, "cnt")
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    with _pinned_state_partitions(spark, state_partitions):
        return writer.start()
