"""Round-5 ADVICE regressions: fused group-by must quantize only
predicate-matched rows (partread.py:1530/1791), and the multi-agg
sumprod guard must catch products that wrap past ±2^63
(partread.py:1805)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from arcade_spark.encode import encode_job


@pytest.fixture(scope="module")
def badrow_table(spark, tmp_path_factory):
    """40 rows; rows with x >= 100 carry a non-finite double v — valid
    stored values that any aggregate over them must reject, but that a
    predicate excluding them must tolerate."""
    rows = []
    for i in range(40):
        x = i if i % 4 else 100 + i
        v = math.inf if x >= 100 else round(0.25 * i, 2)
        rows.append((f"u{i:03d}", x, v, "en" if i % 3 else "de"))
    src = spark.createDataFrame(rows, "url string, x long, v double, lang string")
    out = str(tmp_path_factory.mktemp("badrow") / "enc")
    encode_job(spark, src, out, num_parts=2, block_rows=8)
    pdf = src.toPandas()
    return out, pdf


def test_filter_group_by_skips_excluded_nonfinite(spark, badrow_table):
    """ADVICE r4 (partread.py:1530): single-agg fused group-by used to
    quantize the WHOLE block before indexing [pos], so an inf in an
    excluded row raised — filter_agg on the same query succeeded."""
    from arcade_spark.readops import filter_group_by

    out, pdf = badrow_table
    got = {
        (r["lang"]): (r["sum_v"], r["cnt"])
        for r in filter_group_by(
            spark, out, [("range", "x", 0, 99)], ["lang"], "v"
        ).collect()
    }
    sub = pdf[(pdf["x"] >= 0) & (pdf["x"] <= 99)]
    q = np.floor(sub["v"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    want = {}
    for lang in sub["lang"].unique():
        m = (sub["lang"] == lang).to_numpy()
        want[lang] = (float(q[m].sum()) / 100.0, int(m.sum()))
    assert got == want


def test_filter_group_by_multi_skips_excluded_nonfinite(spark, badrow_table):
    """ADVICE r4 (partread.py:1791): the multi-agg qcache had the same
    whole-block quantize bug."""
    from arcade_spark.readops import filter_group_by_multi

    out, pdf = badrow_table
    got = (
        filter_group_by_multi(
            spark, out, [("range", "x", 0, 99)], ["lang"],
            [("sum_v", "sum", "v"), ("cnt", "count", None)],
        )
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    sub = pdf[(pdf["x"] >= 0) & (pdf["x"] <= 99)]
    q = np.floor(sub["v"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    want = (
        sub.assign(q=q).groupby("lang")
        .agg(qs=("q", "sum"), cnt=("q", "size")).reset_index()
        .sort_values("lang").reset_index(drop=True)
    )
    assert list(got["lang"]) == list(want["lang"])
    assert (got["sum_v"].to_numpy()
            == want["qs"].to_numpy().astype(np.float64) / 100.0).all()
    assert (got["cnt"].to_numpy() == want["cnt"].to_numpy()).all()


def test_filter_group_by_multi_agg_over_nonfinite_still_raises(spark, badrow_table):
    """The finiteness contract itself is unchanged: aggregating a block
    where a MATCHED row is non-finite raises."""
    from arcade_spark.readops import filter_group_by_multi

    out, _ = badrow_table
    with pytest.raises(Exception, match="overflow/non-finite"):
        filter_group_by_multi(
            spark, out, [], ["lang"], [("sum_v", "sum", "v")]
        ).collect()


@pytest.fixture(scope="module")
def wrap_table(spark, tmp_path_factory):
    """Doubles of ~4.3e7 quantize to ~2^32 at scale 100: each term
    passes the per-column 2^62 bar, but their int64 product wraps past
    ±2^63 (2^32·2^32 = 2^64 ≡ 0)."""
    big = 42949672.96  # q = floor(big*100+0.5) = 2^32
    rows = [(f"u{i:02d}", i, big, 0.5) for i in range(16)]
    src = spark.createDataFrame(rows, "url string, x long, a double, b double")
    out = str(tmp_path_factory.mktemp("wrap") / "enc")
    encode_job(spark, src, out, num_parts=1, block_rows=8)
    return out


def test_sumprod_wrap_past_int64_raises(spark, wrap_table):
    """ADVICE r5 (medium, partread.py:1805): the old guard checked the
    already-wrapped int64 product (2^32·2^32 ≡ 0 passed and summed to
    a silently wrong 0.0). The float64 pre-multiply check must raise."""
    from arcade_spark.readops import filter_group_by_multi

    with pytest.raises(Exception, match="overflows int64"):
        filter_group_by_multi(
            spark, wrap_table, [], ["x"],
            [("p", "sumprod", [("a", 1, 0), ("a", 1, 0)])],
        ).collect()


def test_sumprod_affine_wrap_raises(spark, wrap_table):
    """A large multiplier can wrap the affine term a + m·q itself."""
    from arcade_spark.readops import filter_group_by_multi

    with pytest.raises(Exception, match="affine term overflows"):
        filter_group_by_multi(
            spark, wrap_table, [], ["x"],
            [("p", "sumprod", [("a", 2 ** 31, 0)])],
        ).collect()


def test_sumprod_safe_product_unaffected(spark, wrap_table):
    """A product safely under 2^62 still computes exactly: a·b with
    q(b)=50 → 2^32·50 ≈ 2^37.6 per row."""
    from arcade_spark.readops import filter_group_by_multi

    got = filter_group_by_multi(
        spark, wrap_table, [("range", "x", 0, 3)], ["b"],
        [("p", "sumprod", [("a", 1, 0), ("b", 1, 0)]),
         ("cnt", "count", None)],
    ).collect()
    assert len(got) == 1
    # 4 rows · (2^32 · 50) / (100·100)
    assert got[0]["p"] == float(4 * (2 ** 32) * 50) / 10000.0
    assert got[0]["cnt"] == 4


def test_orderby_negative_sign_nan_sorts_last(spark, tmp_path_factory):
    """Review finding (round-5): a SIGN-BIT NaN (copysign(nan, -1))
    must sort with the other NaNs above +inf, not below -inf — NaN
    payloads canonicalize before the order-key map."""
    from arcade_spark.readops import orderby_export

    vals = [1.5, float("-inf"), math.copysign(math.nan, -1.0),
            -2.5, float("inf"), math.nan, 0.0]
    src = spark.createDataFrame(
        [(f"u{i}", v) for i, v in enumerate(vals)], "url string, v double"
    )
    out = str(tmp_path_factory.mktemp("nans") / "enc")
    encode_job(spark, src, out, num_parts=1, block_rows=4)
    got = (
        orderby_export(spark, out, ["v", "url"], ["url", "v"], buckets=3)
        .toPandas().sort_values("pos").reset_index(drop=True)
    )
    vs = got["v"].to_numpy()
    # order: -inf, -2.5, 0.0, 1.5, +inf, then BOTH NaNs last
    assert vs[0] == float("-inf") and vs[4] == float("inf")
    assert np.isnan(vs[5]) and np.isnan(vs[6])


def test_ieee_agg_nan_extrema_layout_independent(spark, tmp_path_factory):
    """Review finding (round-5): NaN in one partition must give the
    same min/max regardless of which partition holds it — Spark's
    NaN-greatest contract (max=NaN when any NaN; min over non-NaN)."""
    from arcade_spark.readops import column_agg

    for flip in (False, True):
        rows = [(f"u{i}", float(i)) for i in range(10)]
        nan_at = 0 if flip else 9
        rows[nan_at] = (rows[nan_at][0], math.nan)
        src = spark.createDataFrame(rows, "url string, v double")
        out = str(tmp_path_factory.mktemp(f"inan{flip}") / "enc")
        # order_col pins NaN into the first or last partition
        encode_job(spark, src, out, num_parts=2, block_rows=2,
                   order_col="url")
        r = column_agg(spark, out, "v", mode="ieee").collect()[0]
        assert math.isnan(r["max_v"]), flip
        good = [float(i) for i in range(10) if i != nan_at]
        assert r["min_v"] == min(good), flip
        assert math.isnan(r["sum_v"])  # IEEE: NaN poisons the sum
