"""Structured Streaming encode: drain a directory of corpus files with
availableNow, then verify the encoded table round-trips; a second run
with the same checkpoint is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from arcade_spark.corpus import CORPUS_SPARK_SCHEMA, write_corpus_files
from arcade_spark.decode import scan
from arcade_spark.manifest import completed_parts
from arcade_spark.streaming import encode_stream


def test_stream_encode_roundtrip(spark, tmp_path_factory):
    src_dir = str(tmp_path_factory.mktemp("stream") / "in")
    write_corpus_files(src_dir, 3000, 3, seed=5)
    out = str(tmp_path_factory.mktemp("stream") / "enc")
    ckpt = str(tmp_path_factory.mktemp("stream") / "ckpt")

    q = encode_stream(spark, src_dir, out, ckpt, CORPUS_SPARK_SCHEMA,
                      parts_per_batch=4, block_rows=512)
    q.awaitTermination(240)
    assert completed_parts(out), "no partitions committed by the stream"

    src = spark.read.parquet(src_dir)
    dec = scan(spark, out)
    assert dec.count() == 3000
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0

    # restart with same checkpoint: nothing new to process
    before = completed_parts(out)
    q2 = encode_stream(spark, src_dir, out, ckpt, CORPUS_SPARK_SCHEMA,
                       parts_per_batch=4, block_rows=512)
    q2.awaitTermination(120)
    assert completed_parts(out) == before
