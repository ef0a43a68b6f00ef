"""Round-5 operators: grouped COUNT(DISTINCT) and MIN/MAX over
ts/date/bool aggregate columns."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from arcade_spark.encode import encode_job

UTC = datetime.timezone.utc


@pytest.fixture(scope="module")
def r5_table(spark, tmp_path_factory):
    rng = np.random.default_rng(7)
    d0 = datetime.datetime(2024, 1, 1, tzinfo=UTC)
    rows = []
    for i in range(300):
        src = f"host{int(rng.integers(0, 5))}" if i % 41 else None
        lang = ["en", "de", "fr", "es", None][int(rng.integers(0, 5))]
        ts = d0 + datetime.timedelta(minutes=int(rng.integers(0, 50000)))
        d = (d0 + datetime.timedelta(days=int(rng.integers(0, 400)))).date()
        rows.append((f"u{i:04d}", src, lang, ts, d, bool(i % 3), int(i % 7)))
    src_df = spark.createDataFrame(
        rows,
        "url string, source string, lang string, ts timestamp, "
        "d date, flag boolean, x long",
    )
    out = str(tmp_path_factory.mktemp("r5") / "enc")
    encode_job(spark, src_df, out, num_parts=3, block_rows=32)
    return out, src_df.toPandas()


def test_group_count_distinct(spark, r5_table):
    from arcade_spark.readops import group_count_distinct

    out, pdf = r5_table
    got = {
        r["source"]: r["n_distinct"]
        for r in group_count_distinct(spark, out, ["source"], "lang").collect()
    }
    sub = pdf.dropna(subset=["source", "lang"])
    want = sub.groupby("source")["lang"].nunique().to_dict()
    assert got == want


def test_group_count_distinct_multi_group_with_preds(spark, r5_table):
    from arcade_spark.readops import group_count_distinct

    out, pdf = r5_table
    got = {
        (r["source"], r["flag"]): r["n_distinct"]
        for r in group_count_distinct(
            spark, out, ["source", "flag"], "x",
            preds=[("range", "x", 0, 5)],
        ).collect()
    }
    sub = pdf.dropna(subset=["source"])
    sub = sub[(sub["x"] >= 0) & (sub["x"] <= 5)]
    want = sub.groupby(["source", "flag"])["x"].nunique().to_dict()
    assert got == want


def test_group_minmax_ts_date_bool(spark, r5_table):
    """MIN/MAX over ts/date/bool agg columns ride the int64 lane and
    come back in their logical types."""
    from arcade_spark.readops import filter_group_by_multi

    out, pdf = r5_table
    got = (
        filter_group_by_multi(
            spark, out, [("range", "x", 0, 6)], ["lang"],
            [("first_ts", "min", "ts"), ("last_ts", "max", "ts"),
             ("min_d", "min", "d"), ("max_d", "max", "d"),
             ("any_flag", "max", "flag"), ("all_flag", "min", "flag"),
             ("cnt", "count", None)],
        )
        .toPandas().sort_values("lang").reset_index(drop=True)
    )
    assert str(got.dtypes["first_ts"]).startswith("datetime64")
    assert got.dtypes["any_flag"] == bool or str(got.dtypes["any_flag"]) == "object"
    sub = pdf.dropna(subset=["lang"])
    want = (
        sub.groupby("lang")
        .agg(first_ts=("ts", "min"), last_ts=("ts", "max"),
             min_d=("d", "min"), max_d=("d", "max"),
             any_flag=("flag", "max"), all_flag=("flag", "min"),
             cnt=("x", "size"))
        .reset_index().sort_values("lang").reset_index(drop=True)
    )
    assert list(got["lang"]) == list(want["lang"])
    # both sides come through toPandas in the same UTC session — same
    # tz-naive representation
    for c in ("first_ts", "last_ts"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all()
    for c in ("min_d", "max_d", "any_flag", "all_flag", "cnt"):
        assert list(got[c]) == list(want[c])


def test_sum_over_ts_still_rejected(spark, r5_table):
    from arcade_spark.readops import filter_group_by_multi

    out, _ = r5_table
    with pytest.raises(Exception, match="aggregates accept"):
        filter_group_by_multi(
            spark, out, [], ["lang"], [("s", "sum", "ts")]
        ).collect()
