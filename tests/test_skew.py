"""Skew handling evidence (FIXTURES.md §4): the corpus is Zipf-skewed
(host 0 owns ~24% of rows); salted host partitioning must bound the
largest partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from arcade_spark.corpus import write_corpus
from arcade_spark.encode import _PART_COL, with_part_id


def test_salting_bounds_partition_skew(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skew") / "c.parquet")
    write_corpus(path, 20000, seed=3)
    src = spark.read.parquet(path).withColumn(
        "bytes", F.length("html") + F.length("text") + F.length("url")
    )

    def max_mean(df):
        per = df.groupBy(_PART_COL).agg(F.sum("bytes").alias("b")).collect()
        sizes = [r.b for r in per]
        return max(sizes) / (sum(sizes) / len(sizes))

    unsalted = max_mean(with_part_id(src, 16, salt_buckets=1))
    salted = max_mean(with_part_id(src, 16, salt_buckets=8))
    # host 0 (~24% of bytes) serializes one partition without salting
    assert unsalted > 2.0
    assert salted < 1.8
    assert salted < unsalted
