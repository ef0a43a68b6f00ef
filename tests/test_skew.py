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


def test_join_skew_aqe_split(spark, tmp_path_factory):
    """Round-5 (VERDICT finding #3): a Zipfian join key (one key owns
    ~25% of fact rows) must trigger AQE's skew-join split on the
    narrow (key, rowid) stream — asserted on the executed plan, with
    the skew thresholds scaled to the test's data volume (the
    mechanism under test is the split, not the production byte
    threshold)."""
    from arcade_spark.encode import encode_job
    from arcade_spark.readops import join_encoded

    n = 60_000
    fact = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 4 == 0, F.lit(0)).otherwise(
            F.pmod(F.xxhash64("id"), F.lit(499)) + 1).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(500).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("label-"), F.col("id")).alias("label"),
    )
    of = str(tmp_path_factory.mktemp("jskew") / "fact")
    od = str(tmp_path_factory.mktemp("jskew") / "dim")
    encode_job(spark, fact, of, num_parts=8, order_col="row_id")
    encode_job(spark, dim, od, num_parts=1, order_col="dk")

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        # force sort-merge (the 100-TB shape — broadcast would hide the
        # mechanism) and scale skew thresholds to the test volume
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # pin the shuffle width: at the conftest session's 4 partitions
        # the uniform median is so large the hot partition misses the
        # factor bar (the mechanism needs hot >> median, not hot >> 0)
        conf.set("spark.sql.shuffle.partitions", "8")
        # broadcast=None: this test exercises AQE's skew split on the
        # SORT-MERGE path — the round-7 auto-broadcast hint would turn
        # this small dim into a BroadcastHashJoin and skip it entirely
        # (that behavior has its own test in test_join_encoded.py)
        df = join_encoded(spark, of, od, "k", "dk",
                          project_a=["v"], project_b=["label"],
                          broadcast=None)
        # execute THROUGH this Dataset (count() builds a separate
        # query execution and would leave this plan un-finalized)
        assert len(df.collect()) == n
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
