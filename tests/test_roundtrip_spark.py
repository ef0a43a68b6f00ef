"""End-to-end Spark round-trip: corpus → encode_job → scan → every
column byte-identical per url (the north-rule correctness gate,
BASELINE.json input_hint)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arcade_spark.decode import scan
from arcade_spark.encode import encode_job

BLOCK_ROWS_TEST = 512  # small blocks → many blocks per partition, all dict paths
N_PARTS = 6


@pytest.fixture(scope="session")
def encoded_dir(spark, corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("encoded") / "corpus")
    source = spark.read.parquet(corpus_path)
    metrics = encode_job(
        spark, source, out, num_parts=N_PARTS, block_rows=BLOCK_ROWS_TEST
    )
    assert metrics["rows"] == 6000
    assert metrics["encoded_bytes"] > 0
    return out


def test_compression_beats_raw(spark, encoded_dir):
    m = spark.read.parquet(f"{encoded_dir}/manifest")
    row = m.agg(
        F.sum("raw_bytes").alias("raw"), F.sum("encoded_bytes").alias("enc")
    ).collect()[0]
    assert row["enc"] < row["raw"], "encoded must be smaller than raw overall"


def test_manifest_lineage(spark, encoded_dir):
    m = spark.read.parquet(f"{encoded_dir}/manifest").collect()
    assert len(m) == N_PARTS
    assert all(r.status == "done" for r in m)
    assert all(r.n_rows > 0 and r.encode_seconds > 0 for r in m)
    assert sum(r.n_rows for r in m) == 6000


def test_blocks_table_shape(spark, encoded_dir):
    b = spark.read.parquet(f"{encoded_dir}/blocks")
    cols_per_block = (
        b.groupBy("part_id", "block_id").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in cols_per_block] == [5]
    # short-value string chunks carry zone maps (long high-cardinality
    # payloads legitimately skip them — stats.py shortcut)
    zc = b.filter(F.col("column").isin("url", "lang")).filter(
        F.col("min_bin").isNull()
    ).count()
    assert zc == 0


def test_full_roundtrip_bit_identical(spark, corpus_path, encoded_dir):
    source = spark.read.parquet(corpus_path)
    decoded = scan(spark, encoded_dir)
    assert decoded.count() == 6000
    # byte-identical per url across every column (north-rule invariant)
    j = source.alias("s").join(decoded.alias("d"), "url", "full_outer")
    mismatches = j.filter(
        ~(
            (F.col("s.text") == F.col("d.text"))
            & (F.col("s.lang") == F.col("d.lang"))
            & (F.col("s.html") == F.col("d.html"))
            & (F.col("s.warc_ts") == F.col("d.warc_ts"))
        )
    ).count()
    assert mismatches == 0


def test_projected_scan(spark, corpus_path, encoded_dir):
    decoded = scan(spark, encoded_dir, columns=["url", "lang"])
    assert decoded.columns == ["url", "lang"]
    source = spark.read.parquet(corpus_path).select("url", "lang")
    assert decoded.exceptAll(source).count() == 0
    assert source.exceptAll(decoded).count() == 0


def test_codec_diversity(spark, encoded_dir):
    """The corpus regimes must actually exercise multiple codecs."""
    b = spark.read.parquet(f"{encoded_dir}/blocks")
    by_col = {
        (r.column, r.codec): r["count"]
        for r in b.groupBy("column", "codec").count().collect()
    }
    codecs_used = {c for (_, c) in by_col}
    assert len(codecs_used) >= 3, by_col
    # lang is low-cardinality → dict/rle family, never plain
    lang_codecs = {c for (col, c) in by_col if col == "lang"}
    assert lang_codecs <= {"dict_local", "dict_global", "rle_str"}, by_col


def test_resume_skips_done_partitions(spark, corpus_path, encoded_dir):
    source = spark.read.parquet(corpus_path)
    metrics = encode_job(
        spark, source, encoded_dir, num_parts=N_PARTS, block_rows=BLOCK_ROWS_TEST
    )
    assert metrics["skipped_parts"] == N_PARTS  # everything already done
    decoded = scan(spark, encoded_dir)
    assert decoded.count() == 6000
