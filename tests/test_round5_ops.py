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


def test_group_count_distinct_composite_values(spark, r5_table):
    """COUNT(DISTINCT lang, flag) per source — composite distinct
    tuples via the same code-tuple kernel."""
    from arcade_spark.readops import group_count_distinct

    out, pdf = r5_table
    got = {
        r["source"]: r["n_distinct"]
        for r in group_count_distinct(
            spark, out, ["source"], ["lang", "flag"]
        ).collect()
    }
    sub = pdf.dropna(subset=["source", "lang", "flag"])
    want = (
        sub.groupby("source")[["lang", "flag"]]
        .apply(lambda g: len(g.drop_duplicates()))
        .to_dict()
    )
    assert got == want


def test_column_agg_ieee_mode(spark, tmp_path_factory):
    """mode='ieee': arbitrary doubles the fixed-point contract rejects
    (1e20 magnitudes) sum correctly within float64 tolerance, with a
    PINNED deterministic order (two runs byte-identical), exact
    min/max, and IEEE inf propagation."""
    from arcade_spark.encode import encode_job
    from arcade_spark.readops import column_agg

    rng = np.random.default_rng(11)
    vals = [float(x) for x in (rng.random(5000) - 0.5) * 1e20]
    vals[17] = None
    src = spark.createDataFrame(
        [(f"u{i:04d}", v) for i, v in enumerate(vals)],
        "url string, v double",
    )
    out = str(tmp_path_factory.mktemp("ieee") / "enc")
    encode_job(spark, src, out, num_parts=3, block_rows=256, order_col="url")

    # fixed-point contract rightly refuses these magnitudes
    with pytest.raises(Exception, match="overflow"):
        column_agg(spark, out, "v").collect()

    r1 = column_agg(spark, out, "v", mode="ieee").collect()[0]
    r2 = column_agg(spark, out, "v", mode="ieee").collect()[0]
    good = np.array([v for v in vals if v is not None], dtype=np.float64)
    import math
    assert math.isclose(r1["sum_v"], math.fsum(good), rel_tol=1e-13)
    assert r1["sum_v"] == r2["sum_v"]  # pinned order → bit-identical
    assert r1["min_v"] == good.min() and r1["max_v"] == good.max()
    assert r1["cnt_all"] == 5000 and r1["cnt_col"] == 4999
    assert r1["avg_v"] == r1["sum_v"] / 4999.0

    # non-double columns reject ieee mode (str via the general agg
    # guard, ints via the explicit ieee check)
    with pytest.raises(Exception, match="ieee|aggregates accept"):
        column_agg(spark, out, "url", mode="ieee")


def test_column_agg_ieee_inf_propagates(spark, tmp_path_factory):
    from arcade_spark.encode import encode_job
    from arcade_spark.readops import column_agg

    src = spark.createDataFrame(
        [("a", 1.5), ("b", float("inf")), ("c", -2.5)],
        "url string, v double",
    )
    out = str(tmp_path_factory.mktemp("ieeeinf") / "enc")
    encode_job(spark, src, out, num_parts=1, block_rows=2)
    r = column_agg(spark, out, "v", mode="ieee").collect()[0]
    assert r["sum_v"] == float("inf") and r["max_v"] == float("inf")


def test_distinct_count_approx(spark, tmp_path_factory):
    """HLL over the per-part distinct streams: within rsd of the exact
    count for a 20k-distinct column."""
    from arcade_spark.encode import encode_job
    from arcade_spark.readops import distinct_count, distinct_count_approx

    n = 40000
    src = spark.createDataFrame(
        [(f"u{i:05d}", f"val-{i % 20000:05d}", i % 97) for i in range(n)],
        "url string, s string, x long",
    )
    out = str(tmp_path_factory.mktemp("hll") / "enc")
    encode_job(spark, src, out, num_parts=4, block_rows=1024, order_col="url")
    exact = distinct_count(spark, out, "s").collect()[0][0]
    assert exact == 20000
    approx = distinct_count_approx(spark, out, "s", rsd=0.02).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06
    ax = distinct_count_approx(spark, out, "x", rsd=0.02).collect()[0][0]
    assert abs(ax - 97) / 97 < 0.06
