"""Randomized DNF-tree fuzz over the FULL predicate algebra: random
OR-of-AND trees mixing eq/range/in/prefix/contains/suffix/like and
their negations across str/int/float columns, evaluated by the files-
mode kernel and cross-checked against pandas brute force with SQL null
semantics (nulls satisfy neither a predicate nor its negation).
Deterministic seeds — no flaky sampling."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from arcade_spark.encode import encode_job
from arcade_spark.readops import filter_dnf


@pytest.fixture(scope="module")
def fuzz_table(spark, tmp_path_factory):
    rng = np.random.default_rng(404)
    langs = np.array(["en", "en-GB", "de", "fr", "es", "el", "sv", "zz"])
    n = 2200
    pdf = pd.DataFrame(
        {
            "url": [
                f"https://h{int(i)}.ex/p/{j}"
                for j, i in enumerate(rng.integers(0, 6, n))
            ],
            "lang": langs[rng.integers(0, len(langs), n)],
            "x": rng.integers(-40, 40, n).astype(np.int64),
            "v": np.round(rng.normal(0, 5, n), 1),
        }
    )
    pdf.loc[rng.random(n) < 0.07, "lang"] = None
    src = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("fuzz") / "enc")
    encode_job(spark, src, out, num_parts=2, block_rows=250, order_col="url")
    return out, pdf


def _like_re(pat: str) -> str:
    return "^" + "".join(
        ".*" if c == "%" else "." if c == "_" else re.escape(c) for c in pat
    ) + "$"


def _rand_pred(rng, pdf):
    """One random (spec_tuple, pandas_mask) pair. The mask is the
    POSITIVE predicate over non-null values; negation is applied by the
    caller within the non-null domain."""
    col = rng.choice(["lang", "x", "v", "url"])
    s = pdf[col]
    nn = s.notna()
    if col in ("x", "v"):
        kind = rng.choice(["eq", "range", "in"])
        vals = s.dropna().unique()
        if kind == "eq":
            t = vals[rng.integers(0, len(vals))]
            t = int(t) if col == "x" else float(t)
            return ("eq", col, t), nn & (s == t)
        if kind == "in":
            pick = [v for v in rng.choice(vals, 3)]
            pick = [int(v) if col == "x" else float(v) for v in pick]
            return ("in", col, pick), nn & s.isin(pick)
        lo, hi = sorted(
            [float(x) for x in rng.normal(0, 20, 2)]
            if col == "v" else [int(x) for x in rng.integers(-50, 50, 2)]
        )
        return ("range", col, lo, hi), nn & (s >= lo) & (s <= hi)
    kind = rng.choice(["eq", "range", "in", "prefix", "contains", "suffix", "like"])
    vals = s.dropna().unique()
    v = str(vals[rng.integers(0, len(vals))])
    sf = s.fillna("")
    if kind == "eq":
        return ("eq", col, v), nn & (s == v)
    if kind == "in":
        pick = [str(x) for x in rng.choice(vals, 2)]
        return ("in", col, pick), nn & s.isin(pick)
    if kind == "range":
        lo, hi = sorted([v, str(vals[rng.integers(0, len(vals))])])
        return ("range", col, lo, hi), nn & (sf >= lo) & (sf <= hi)
    a = int(rng.integers(0, len(v)))
    b = int(rng.integers(a + 1, len(v) + 1))
    if kind == "prefix":
        return ("prefix", col, v[:b]), nn & sf.str.startswith(v[:b])
    if kind == "contains":
        return ("contains", col, v[a:b]), nn & sf.str.contains(v[a:b], regex=False)
    if kind == "suffix":
        return ("suffix", col, v[a:]), nn & sf.str.endswith(v[a:])
    # like: splice a wildcard into a real value
    w = "%" if rng.random() < 0.5 else "_"
    pat = v[:a] + w + v[b:] if a < b else v + "%"
    return ("like", col, pat), nn & sf.str.match(_like_re(pat))


def test_random_dnf_trees(spark, fuzz_table):
    out, pdf = fuzz_table
    rng = np.random.default_rng(77)
    for trial in range(12):
        conjuncts, masks = [], []
        for _ in range(int(rng.integers(1, 4))):
            cols_used: set[str] = set()
            conj, cmask = [], pd.Series(True, index=pdf.index)
            for _ in range(int(rng.integers(1, 4))):
                spec, mask = _rand_pred(rng, pdf)
                if spec[1] in cols_used:
                    continue
                cols_used.add(spec[1])
                if rng.random() < 0.3:  # negate within the non-null domain
                    spec = ("not_" + spec[0].replace("eq", "eq"), *spec[1:])
                    spec = (
                        {"not_eq": "neq"}.get(spec[0], spec[0]),
                        *spec[1:],
                    )
                    mask = pdf[spec[1]].notna() & ~mask
                conj.append(spec)
                cmask &= mask
            conjuncts.append(conj)
            masks.append(cmask)
        want_mask = masks[0]
        for m in masks[1:]:
            want_mask = want_mask | m
        got = filter_dnf(spark, out, conjuncts, project=["url"]).toPandas()
        want = pdf.loc[want_mask, "url"]
        assert sorted(got["url"]) == sorted(want), (trial, conjuncts)
