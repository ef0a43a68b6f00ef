"""Round-6 operators: per-group MIN/MAX over STRING columns (binary
value lane through the multi-agg partials — global dict codes are not
order-preserving, so the kernel ranks used dictionary entries by VALUE
per block and the merge is a lexicographic binary min/max)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from arcade_spark.encode import encode_job
from arcade_spark.readops import filter_group_by_multi, group_by_multi


@pytest.fixture(scope="module")
def str_agg_table(spark, tmp_path_factory):
    rng = np.random.default_rng(66)
    n = 5000
    langs = np.array([f"l{j:02d}" for j in range(12)])
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": langs[rng.integers(0, 12, n)],
            "url": [f"https://h{rng.integers(0, 40):02d}.ex/"
                    f"{rng.integers(0, 10**8):08d}" for _ in range(n)],
            "n_chars": rng.integers(0, 5000, n).astype(np.int64),
        }
    )
    # nulls in the agg column + one group that is ALL null
    pdf.loc[rng.random(n) < 0.05, "url"] = None
    pdf.loc[pdf["lang"] == "l11", "url"] = None
    src = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("sagg") / "enc")
    # small blocks + several parts: multi-block dict replay on both the
    # group column and the string agg column
    encode_job(spark, src, out, num_parts=4, block_rows=256, order_col="doc_id")
    return out, pdf


def _expected_minmax(pdf, filt=None):
    sub = pdf if filt is None else pdf[filt]
    g = sub.dropna(subset=["url"]).groupby("lang")["url"]
    return (
        g.min().to_dict(), g.max().to_dict(),
        sub.groupby("lang").size().to_dict(),
    )


def test_group_minmax_str(spark, str_agg_table):
    out, pdf = str_agg_table
    got = group_by_multi(
        spark, out, ["lang"],
        [("min_url", "min", "url"), ("max_url", "max", "url"),
         ("cnt", "count", None)],
    ).toPandas().set_index("lang").sort_index()
    mn, mx, cnt = _expected_minmax(pdf)
    assert set(got.index) == set(cnt)
    for lang in got.index:
        assert got.loc[lang, "cnt"] == cnt[lang]
        if lang not in mn:  # all-null group (l11)
            assert got.loc[lang, "min_url"] is None
            assert got.loc[lang, "max_url"] is None
        else:
            assert got.loc[lang, "min_url"] == mn[lang], lang
            assert got.loc[lang, "max_url"] == mx[lang], lang


def test_group_minmax_str_with_preds_and_numeric(spark, str_agg_table):
    """Mixed spec list: binary min/max + int sum + count, under a
    predicate — one fused pass."""
    out, pdf = str_agg_table
    got = filter_group_by_multi(
        spark, out, [("range", "n_chars", 100, 2000)], ["lang"],
        [("min_url", "min", "url"), ("sum_chars", "sum", "n_chars"),
         ("cnt", "count", None)],
    ).toPandas().set_index("lang").sort_index()
    filt = (pdf["n_chars"] >= 100) & (pdf["n_chars"] <= 2000)
    mn, _mx, cnt = _expected_minmax(pdf, filt)
    sums = pdf[filt].groupby("lang")["n_chars"].sum().to_dict()
    for lang in got.index:
        assert got.loc[lang, "cnt"] == cnt[lang]
        assert got.loc[lang, "sum_chars"] == sums[lang]
        if lang not in mn:
            assert got.loc[lang, "min_url"] is None
        else:
            assert got.loc[lang, "min_url"] == mn[lang], lang


def test_group_minmax_str_on_group_column(spark, str_agg_table):
    """The agg column IS a group column: the kernel must reuse the
    group decode (dict replay once) — min(lang) per lang == lang."""
    out, pdf = str_agg_table
    got = group_by_multi(
        spark, out, ["lang"],
        [("min_lang", "min", "lang"), ("cnt", "count", None)],
    ).toPandas()
    assert (got["min_lang"] == got["lang"]).all()


def test_minmax_str_sum_still_rejected(spark, str_agg_table):
    out, _ = str_agg_table
    with pytest.raises(Exception):
        group_by_multi(
            spark, out, ["lang"], [("s", "sum", "url")],
        ).collect()


# ---------------------------------------------------------------------------
# group_rank_values: per-group exact quantiles without per-group sorts
# ---------------------------------------------------------------------------


def _pd_group_ranks(pdf, gcol, vcol, quantiles, filt=None):
    sub = pdf if filt is None else pdf[filt]
    sub = sub.dropna(subset=[gcol, vcol])
    want = {}
    for g, grp in sub.groupby(gcol):
        vs = np.sort(grp[vcol].to_numpy())
        n = len(vs)
        for q in quantiles:
            r = int(q * (n - 1))
            want[(g, r)] = vs[r]
    return want


def test_group_rank_values_int(spark, str_agg_table):
    from arcade_spark.readops import group_rank_values

    out, pdf = str_agg_table
    got = group_rank_values(
        spark, out, ["lang"], "n_chars", quantiles=[0.25, 0.5, 0.99],
    ).toPandas()
    want = _pd_group_ranks(pdf, "lang", "n_chars", [0.25, 0.5, 0.99])
    got_d = {(r.lang, r.pos): r.v for r in got.itertuples()}
    assert got_d == want


def test_group_rank_values_preds_and_ranks(spark, str_agg_table):
    """Absolute per-group ranks under a predicate; rank 0 = group min.
    Oversized ranks simply don't emit."""
    from arcade_spark.readops import group_rank_values

    out, pdf = str_agg_table
    got = group_rank_values(
        spark, out, ["lang"], "n_chars", ranks=[0, 100000],
        preds=[("range", "n_chars", 500, 4000)],
    ).toPandas()
    filt = (pdf["n_chars"] >= 500) & (pdf["n_chars"] <= 4000)
    mins = pdf[filt].groupby("lang")["n_chars"].min().to_dict()
    got_d = {(r.lang, r.pos): r.v for r in got.itertuples()}
    assert got_d == {(g, 0): v for g, v in mins.items()}


def test_group_rank_values_double(spark, tmp_path_factory):
    """Double value column rides the float order-key lane; values
    invert exactly back to IEEE bits."""
    from arcade_spark.readops import group_rank_values

    rng = np.random.default_rng(15)
    n = 2000
    pdf = pd.DataFrame(
        {
            "g": np.array(["a", "b", "c"])[rng.integers(0, 3, n)],
            "v": np.round(rng.normal(0, 50, n), 3),
            "i": np.arange(n, dtype=np.int64),
        }
    )
    src = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("grv") / "enc")
    encode_job(spark, src, out, num_parts=2, block_rows=256, order_col="i")
    got = group_rank_values(
        spark, out, ["g"], "v", quantiles=[0.5],
    ).toPandas()
    want = _pd_group_ranks(pdf, "g", "v", [0.5])
    got_d = {(r.g, r.pos): r.v for r in got.itertuples()}
    assert got_d == want
