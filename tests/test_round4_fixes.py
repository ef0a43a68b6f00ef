"""Round-4 ADVICE regressions: minmax string-tie exactness demotion,
CLI date/bool literal coercion, offset-robust _banded kernel, and the
empty-key semijoin count contract."""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pytest

from arcade_spark.encode import encode_job


def test_minmax_string_tie_with_inexact_max(spark, tmp_path_factory):
    """ADVICE r3 (partread.py:1585): an inexact max_bin that TIES an
    earlier exact winner must demote exactness so the decode fallback
    reports the true (longer) max — repro: block0 max 'z'*128 exact,
    block1 max 'z'*128+'x' truncating to the same prefix."""
    from arcade_spark.readops import column_minmax
    from arcade_spark.stats import ZONE_MAX_LEN

    exact = "z" * ZONE_MAX_LEN
    longer = "z" * ZONE_MAX_LEN + "x"
    # order_col="url" pins block order: block0 (a*, b*) holds the exact
    # winner, block1 (c*, d*) the truncated longer value
    rows = [("a0", "mmm"), ("b0", exact), ("c0", "nnn"), ("d0", longer)]
    src = spark.createDataFrame(rows, "url string, s string")
    out = str(tmp_path_factory.mktemp("mmtie") / "enc")
    encode_job(spark, src, out, num_parts=1, block_rows=2)
    row = column_minmax(spark, out, "s").collect()[0]
    assert (row["min_v"], row["max_v"], row["cnt"]) == ("mmm", longer, 4)


def test_query_job_coerce_date_and_bool(spark, tmp_path_factory):
    """ADVICE r3 (query_job.py:80): CLI literals on date/bool columns
    must reach the engine's existing typed-literal support."""
    import argparse

    import arcade_spark.jobs.query_job as qj

    d0 = datetime.date(2024, 6, 1)
    src = spark.createDataFrame(
        [(f"u{i:02d}", d0 + datetime.timedelta(days=i % 3), i % 2 == 0)
         for i in range(30)],
        "url string, d date, flag boolean",
    )
    out = str(tmp_path_factory.mktemp("qjdb") / "enc")
    encode_job(spark, src, out, num_parts=1, block_rows=16)

    def ns(**kw):
        for k in ("value", "lo", "hi", "in_list", "prefix", "contains",
                  "suffix", "like", "sample"):
            kw.setdefault(k, None)
        return argparse.Namespace(**kw)

    df = qj.build_query(spark, ns(cmd="filter", encoded=out, column="d",
                                  value="2024-06-01", project="url",
                                  count_only=False))
    assert df.count() == 10
    df = qj.build_query(spark, ns(cmd="filter", encoded=out, column="flag",
                                  value="true", project="url",
                                  count_only=False))
    assert df.count() == 15
    df = qj.build_query(spark, ns(cmd="filter", encoded=out, column="d",
                                  lo="2024-06-02", hi="2024-06-03",
                                  project="url", count_only=False))
    assert df.count() == 20


def test_band_batch_offset_robust():
    """ADVICE r3 (dedup.py:119): a sliced list batch (non-zero array
    offset, untrimmed child buffer) must band identically to the same
    rows in an unsliced batch."""
    from arcade_spark.dedup import _band_batch

    rng = np.random.default_rng(7)
    lists = [rng.integers(0, 2**63, size=rng.integers(3, 9)).tolist()
             for _ in range(12)]
    ids = list(range(100, 112))
    full = pa.record_batch(
        [pa.array(ids, type=pa.int64()), pa.array(lists, type=pa.list_(pa.int64()))],
        names=["doc_id", "hs"],
    )
    sliced = full.slice(4, 6)
    assert sliced.column(1).offset == 4  # the regression precondition
    want = _band_batch(
        pa.record_batch(
            [pa.array(ids[4:10], type=pa.int64()),
             pa.array(lists[4:10], type=pa.list_(pa.int64()))],
            names=["doc_id", "hs"],
        )
    )
    got = _band_batch(sliced)
    assert got.equals(want)


def test_filter_semijoin_empty_keys_count_contract(spark, tmp_path_factory):
    """ADVICE r3 (readops.py:1632): an empty semi-join key set with
    count_only=True must still fold to cnt=0, not NULL — and must not
    count rows that collide with the typed dummy key."""
    from pyspark.sql import functions as F

    from arcade_spark.readops import filter_semijoin

    # include "" and 0 values so a dummy-key collision would be caught
    src = spark.createDataFrame(
        [("", 0), ("a", 1), ("b", 2)], "s string, x long"
    )
    out = str(tmp_path_factory.mktemp("sjempty") / "enc")
    encode_job(spark, src, out, num_parts=1, block_rows=4, order_col="s")
    empty_keys = spark.createDataFrame([], "k string")
    per_block = filter_semijoin(spark, out, "s", empty_keys, count_only=True)
    row = per_block.agg(F.sum("matches").alias("cnt")).collect()[0]
    assert row["cnt"] == 0
    empty_keys_int = spark.createDataFrame([], "k long")
    per_block = filter_semijoin(spark, out, "x", empty_keys_int, count_only=True)
    row = per_block.agg(F.sum("matches").alias("cnt")).collect()[0]
    assert row["cnt"] == 0
    # row-returning path still yields zero rows
    assert filter_semijoin(spark, out, "s", empty_keys).count() == 0
