"""Randomized cross-check of the whole filter algebra (eq / range / in /
and) against brute-force evaluation on the decoded source: random small
tables with nulls, negatives, duplicate-heavy and unique-ish columns,
random predicates — every operator must agree with pandas exactly.
Deterministic seeds (no flaky sampling)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from arcade_spark.encode import encode_job
from arcade_spark.readops import (
    equi_filter,
    filter_and,
    filter_contains,
    filter_in,
    filter_prefix,
    filter_range,
    filter_suffix,
)


def _table(rng: np.random.Generator, n: int) -> pd.DataFrame:
    langs = np.array(["en", "de", "fr", "es", "el", "sv", "zz"])
    return pd.DataFrame(
        {
            "url": [f"https://h{int(i)}.ex/{j}" for j, i in
                    enumerate(rng.integers(0, 5, n))],
            "lang": langs[rng.integers(0, len(langs), n)],
            "x": rng.integers(-50, 50, n).astype(np.int64),
            "v": np.round(rng.normal(0, 10, n), 2),
        }
    )


@pytest.fixture(scope="module")
def rand_tables(spark, tmp_path_factory):
    out_dirs = []
    for seed in (101, 202):
        rng = np.random.default_rng(seed)
        pdf = _table(rng, 1500)
        src = spark.createDataFrame(pdf)
        out = str(tmp_path_factory.mktemp("xck") / f"enc{seed}")
        encode_job(spark, src, out, num_parts=2, block_rows=200, order_col="url")
        out_dirs.append((out, pdf))
    return out_dirs


def test_crosscheck_eq_range_in_and(spark, rand_tables):
    rng = np.random.default_rng(7)
    for out, pdf in rand_tables:
        for _ in range(4):
            lang = str(rng.choice(pdf["lang"].unique()))
            lo, hi = sorted(rng.integers(-60, 60, 2).tolist())

            got = equi_filter(spark, out, "lang", lang, project=["url"]).toPandas()
            want = pdf.loc[pdf["lang"] == lang, "url"]
            assert sorted(got["url"]) == sorted(want)

            got = filter_range(spark, out, "x", int(lo), int(hi), project=["url"]).toPandas()
            want = pdf.loc[(pdf["x"] >= lo) & (pdf["x"] <= hi), "url"]
            assert sorted(got["url"]) == sorted(want)

            vals = [float(v) for v in rng.choice(pdf["v"].unique(), 3)]
            got = filter_in(spark, out, "v", vals, project=["url"]).toPandas()
            want = pdf.loc[pdf["v"].isin(vals), "url"]
            assert sorted(got["url"]) == sorted(want), vals

            got = filter_and(
                spark, out,
                [("eq", "lang", lang), ("range", "x", int(lo), int(hi))],
                project=["url"],
            ).toPandas()
            want = pdf.loc[
                (pdf["lang"] == lang) & (pdf["x"] >= lo) & (pdf["x"] <= hi), "url"
            ]
            assert sorted(got["url"]) == sorted(want)


def test_crosscheck_match_kinds(spark, rand_tables):
    """prefix / contains / suffix with randomized patterns drawn from
    actual substrings of the data (so matches are non-vacuous), on both
    the dict column (lang) and the high-cardinality column (url)."""
    rng = np.random.default_rng(11)
    for out, pdf in rand_tables:
        for col in ("lang", "url"):
            vals = pdf[col].unique()
            for _ in range(3):
                v = str(rng.choice(vals))
                a = rng.integers(0, max(len(v) - 1, 1) + 1)
                b = rng.integers(int(a) + 1, len(v) + 1)
                pat = v[int(a): int(b)]

                got = filter_prefix(spark, out, col, v[: int(b)],
                                    project=["url"]).toPandas()
                want = pdf.loc[pdf[col].str.startswith(v[: int(b)]), "url"]
                assert sorted(got["url"]) == sorted(want), (col, v[: int(b)])

                got = filter_contains(spark, out, col, pat,
                                      project=["url"]).toPandas()
                want = pdf.loc[pdf[col].str.contains(pat, regex=False), "url"]
                assert sorted(got["url"]) == sorted(want), (col, pat)

                got = filter_suffix(spark, out, col, v[int(a):],
                                    project=["url"]).toPandas()
                want = pdf.loc[pdf[col].str.endswith(v[int(a):]), "url"]
                assert sorted(got["url"]) == sorted(want), (col, v[int(a):])
