"""Distributed encode job: source DataFrame → encoded-blocks table +
manifest (the Spark-first re-expression of ``ArcadeWriter::compress``,
writer.cpp:379-496 — SURVEY.md §3a).

Plan shape:

    source scan (Catalyst: column pruning, filter pushdown)
      → part_id = pmod(xxhash64(salt_keys...), P)   [explicit skew salting]
      → repartition(P, part_id)                     [the one shuffle]
      → sortWithinPartitions(part_id, order_key)    [deterministic blocks]
      → mapInPandas(encode_kernel)                  [Arrow-batched, no per-row Python]
      → write blocks parquet (partitioned by part_id, dynamic overwrite)
      → write manifest (commit barrier — a partition exists in the
        manifest iff all its blocks are durably written)

Partitioning & skew: the default partition key is (host(url), salt)
where salt = xxhash64(url) % salt_buckets — pages of one host co-locate
(better dictionary locality) while Zipf-heavy hosts split across
``salt_buckets`` partitions, bounding the largest partition (the north
rule's explicit skew handling). Deterministic: every retry of a task
sees the same rows in the same order (sortWithinPartitions by url), so
differential-dictionary state and block contents are reproducible —
required for resume and for Spark speculative re-execution.

Resume: completed part_ids are read from the manifest and anti-joined
out of the input (FIXTURES.md §4); re-running a partially-failed job
re-encodes only missing partitions, and dynamic partition overwrite
makes per-partition block writes idempotent.
"""

from __future__ import annotations

import json
import time
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from arcade_spark import BLOCK_ROWS
from arcade_spark.blocks import IntBlock, StrBlock
from arcade_spark.convert import series_to_block
from arcade_spark.core import encode_int_block, encode_str_block
from arcade_spark.gdict import GlobalDict
from arcade_spark.schema import BLOCKS_DDL, MANIFEST_DDL, spark_vtype

_PART_COL = "__arcade_part"


def with_part_id(
    df: DataFrame,
    num_parts: int,
    salt_col: str = "url",
    host_col: str | None = "url",
    salt_buckets: int = 8,
) -> DataFrame:
    """Assign the deterministic encode partition id.

    Key = (host, xxhash64(full row key) % salt_buckets): host locality
    for dictionary sharing, salted so one Zipf-heavy host spreads over
    ``salt_buckets`` partitions instead of serializing the job.
    """
    if host_col is not None and host_col in df.columns:
        host = F.regexp_extract(F.col(host_col), r"^[a-z]+://([^/]+)", 1)
    else:
        host = F.lit("")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_buckets))
    part = F.pmod(F.xxhash64(host, salt), F.lit(num_parts)).cast("int")
    return df.withColumn(_PART_COL, part)


def make_encode_kernel(columns: list[tuple[str, str]], block_rows: int = BLOCK_ROWS):
    """Build the mapInPandas kernel closure. ``columns`` is
    [(name, vtype)] in output order. State per task: one GlobalDict per
    (part_id, string column) — the reference's per-file running
    dictionary scope (writer.cpp:167-253) mapped to per-partition."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_part: int | None = None
        buffer: list[pd.DataFrame] = []
        buffered = 0
        gdicts: dict[str, GlobalDict] = {}
        block_id = 0
        row_start = 0

        def encode_block_rows(pdf: pd.DataFrame) -> pd.DataFrame:
            nonlocal block_id, row_start
            out_rows = []
            n = len(pdf)
            for name, vtype in columns:
                t0 = time.monotonic()
                block = series_to_block(pdf[name], vtype)
                if isinstance(block, StrBlock):
                    gd = gdicts.setdefault(name, GlobalDict())
                    blob, meta = encode_str_block(block, gd)
                else:
                    blob, meta = encode_int_block(block)
                meta["kernel_ms"] = (time.monotonic() - t0) * 1000.0
                meta.update(
                    part_id=cur_part,
                    block_id=block_id,
                    column=name,
                    vtype=vtype,
                    row_start=row_start,
                    blob=blob,
                )
                out_rows.append(meta)
            block_id += 1
            row_start += n
            return pd.DataFrame(out_rows)

        def flush_part() -> Iterator[pd.DataFrame]:
            nonlocal buffer, buffered, block_id, row_start, gdicts
            while buffer:
                head = pd.concat(buffer, ignore_index=True) if len(buffer) > 1 else buffer[0]
                buffer, buffered = [], 0
                for s in range(0, len(head), block_rows):
                    chunk = head.iloc[s : s + block_rows]
                    if len(chunk) == block_rows or s + block_rows >= len(head):
                        if len(chunk):
                            yield encode_block_rows(chunk.reset_index(drop=True))
            gdicts = {}
            block_id = 0
            row_start = 0

        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = pdf[_PART_COL].to_numpy()
            bounds = np.nonzero(parts[1:] != parts[:-1])[0] + 1
            segments = np.split(np.arange(len(pdf)), bounds)
            for seg in segments:
                pid = int(parts[seg[0]])
                sub = pdf.iloc[seg[0] : seg[-1] + 1]
                if cur_part is not None and pid != cur_part:
                    yield from flush_part()
                cur_part = pid
                buffer.append(sub)
                buffered += len(sub)
                while buffered >= block_rows:
                    head = pd.concat(buffer, ignore_index=True) if len(buffer) > 1 else buffer[0]
                    full = (len(head) // block_rows) * block_rows
                    for s in range(0, full, block_rows):
                        yield encode_block_rows(
                            head.iloc[s : s + block_rows].reset_index(drop=True)
                        )
                    rest = head.iloc[full:]
                    buffer = [rest] if len(rest) else []
                    buffered = len(rest)
        if cur_part is not None:
            yield from flush_part()

    return kernel


def encode_job(
    spark: SparkSession,
    source: DataFrame,
    out_dir: str,
    num_parts: int = 32,
    order_col: str = "url",
    salt_buckets: int = 8,
    block_rows: int = BLOCK_ROWS,
    resume: bool = True,
) -> dict:
    """Run the full encode pipeline; returns job metrics."""
    columns = [(f.name, spark_vtype(f.dataType)) for f in source.schema.fields]
    df = with_part_id(source, num_parts, salt_col=order_col, host_col=order_col,
                      salt_buckets=salt_buckets)

    done: set[int] = set()
    manifest_path = f"{out_dir}/manifest"
    blocks_path = f"{out_dir}/blocks"
    if resume:
        try:
            done = {
                r.part_id
                for r in spark.read.parquet(manifest_path)
                .filter(F.col("status") == "done")
                .select("part_id")
                .collect()
            }
        except Exception:
            done = set()
    if done:
        df = df.filter(~F.col(_PART_COL).isin(*done))

    t0 = time.time()
    kernel = make_encode_kernel(columns, block_rows)
    encoded = (
        df.repartition(num_parts, F.col(_PART_COL))
        .sortWithinPartitions(_PART_COL, order_col)
        .mapInPandas(kernel, schema=BLOCKS_DDL)
    )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        encoded.write.mode("overwrite" if done else "overwrite")
        .partitionBy("part_id")
        .parquet(blocks_path)
    )
    encode_seconds = time.time() - t0

    # ---- manifest commit barrier: derive from what actually landed ----
    run_id = uuid.uuid4().hex[:12]
    blocks = spark.read.parquet(blocks_path)
    n_cols = len(columns)
    manifest = (
        blocks.groupBy("part_id")
        .agg(
            (F.countDistinct("block_id")).cast("int").alias("n_blocks"),
            (F.sum(F.col("n_values").cast("long")) / n_cols).cast("long").alias("n_rows"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("encoded_bytes").alias("encoded_bytes"),
            (F.sum("kernel_ms") / 1000.0).alias("encode_seconds"),
        )
        .withColumn(
            "throughput_mbps",
            F.col("raw_bytes") / F.greatest(F.col("encode_seconds"), F.lit(1e-9)) / F.lit(1e6),
        )
        .withColumn("codec_counts", F.lit("{}"))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("status", F.lit("done"))
    )
    codec_counts = (
        blocks.groupBy("part_id", "codec").count().groupBy("part_id")
        .agg(F.map_from_arrays(F.collect_list("codec"), F.collect_list("count")).alias("cc"))
        .select("part_id", F.to_json("cc").alias("codec_counts_json"))
    )
    manifest = (
        manifest.join(codec_counts, "part_id", "left")
        .drop("codec_counts")
        .withColumnRenamed("codec_counts_json", "codec_counts")
        .select(*[f.name for f in spark.createDataFrame([], MANIFEST_DDL).schema.fields])
    )
    manifest.write.mode("overwrite").parquet(manifest_path)

    totals = (
        spark.read.parquet(manifest_path)
        .agg(
            F.sum("n_rows").alias("rows"),
            F.sum("raw_bytes").alias("raw"),
            F.sum("encoded_bytes").alias("enc"),
        )
        .collect()[0]
    )
    return {
        "rows": totals["rows"],
        "raw_bytes": totals["raw"],
        "encoded_bytes": totals["enc"],
        "ratio": (totals["enc"] / totals["raw"]) if totals["raw"] else None,
        "encode_seconds": encode_seconds,
        "throughput_mbps": (totals["raw"] or 0) / max(encode_seconds, 1e-9) / 1e6,
        "skipped_parts": len(done),
        "run_id": run_id,
    }
