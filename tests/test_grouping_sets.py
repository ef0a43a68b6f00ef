"""GROUPING SETS / ROLLUP / CUBE (round-7): one fused kernel pass,
every grouping set re-folds the same finest-grain partials. Checked
against DuckDB's native ROLLUP/CUBE/GROUPING SETS with GROUPING() ids,
including null group values (distinguishable from rolled-up nulls only
via grouping_id) and exact fixed-point double aggregates."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from arcade_spark.encode import encode_job
from arcade_spark.readops import filter_group_by_sets, release_key_caches


@pytest.fixture(scope="module")
def gs_table(spark, tmp_path_factory):
    rng = np.random.default_rng(73)
    n = 1200
    df = pd.DataFrame({
        "url": [f"u{i:04d}" for i in range(n)],
        "flag": np.array(["A", "N", "R"])[rng.integers(0, 3, n)],
        "status": np.array(["O", "F"])[rng.integers(0, 2, n)],
        "qty": pd.array(rng.integers(1, 50, n).astype(np.int64),
                        dtype="Int64"),
        "price": np.round(rng.integers(100, 9999, n) / 100.0, 2),
    })
    # null group values: must stay distinct from rolled-up nulls
    df.loc[rng.random(n) < 0.05, "flag"] = None
    df.loc[rng.random(n) < 0.2, "qty"] = pd.NA
    out = str(tmp_path_factory.mktemp("gs") / "enc")
    encode_job(spark, spark.createDataFrame(df), out,
               num_parts=3, block_rows=128, order_col="url")
    con = duckdb.connect()
    con.register("t", df)
    return out, con


AGGS = [
    ("sum_qty", "sum", "qty"),
    ("cnt", "count", None),
    ("min_q", "min", "qty"),
    ("max_q", "max", "qty"),
    ("avg_q", "avg", "qty"),
    ("rev", "sumprod", [("price", 1, 0)]),
]

ORACLE_AGGS = """
       sum(qty) AS sum_qty, count(*) AS cnt,
       min(qty) AS min_q, max(qty) AS max_q,
       CAST(sum(qty) AS DOUBLE)/count(CASE WHEN qty IS NOT NULL
                                      THEN 1 END) AS avg_q,
       CAST(sum(CAST(floor(price*100 + 0.5) AS BIGINT)) AS DOUBLE)/100
         AS rev"""


def _key(rows):
    return sorted(rows, key=lambda r: tuple((v is None, str(v)) for v in r))


def _rows(df):
    out = _key([tuple(r) for r in df.collect()])
    release_key_caches()
    return out


def _sql(con, q):
    return _key([tuple(r) for r in con.execute(q).fetchall()])


def _approx_eq(got, exp):
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert len(g) == len(e)
        for gv, ev in zip(g, e):
            if isinstance(gv, float) and isinstance(ev, float):
                assert gv == pytest.approx(ev, rel=1e-12), (g, e)
            else:
                assert gv == ev, (g, e)


def test_rollup_matches_duckdb(spark, gs_table):
    out, con = gs_table
    got = _rows(filter_group_by_sets(
        spark, out, [], ["flag", "status"], AGGS, sets="rollup"))
    exp = _sql(con, f"""
        SELECT flag, status, GROUPING(flag, status) AS grouping_id,
               {ORACLE_AGGS}
        FROM t GROUP BY ROLLUP (flag, status)""")
    _approx_eq(got, exp)
    # null flag groups and rolled-up-flag groups both exist, and only
    # grouping_id separates them
    gids = {r[2] for r in got}
    assert gids == {0, 1, 3}
    assert any(r[0] is None and r[2] == 0 for r in got)   # real null
    assert any(r[0] is None and r[2] & 2 for r in got)    # rolled up


def test_cube_matches_duckdb(spark, gs_table):
    out, con = gs_table
    got = _rows(filter_group_by_sets(
        spark, out, [], ["flag", "status"],
        [("sum_qty", "sum", "qty"), ("cnt", "count", None)],
        sets="cube"))
    exp = _sql(con, """
        SELECT flag, status, GROUPING(flag, status) AS grouping_id,
               sum(qty) AS sum_qty, count(*) AS cnt
        FROM t GROUP BY CUBE (flag, status)""")
    _approx_eq(got, exp)
    assert {r[2] for r in got} == {0, 1, 2, 3}


def test_custom_grouping_sets_with_preds(spark, gs_table):
    out, con = gs_table
    got = _rows(filter_group_by_sets(
        spark, out, [("range", "qty", 5, 40)], ["flag", "status"],
        [("cnt", "count", None), ("sum_qty", "sum", "qty")],
        sets=[["flag"], []]))
    # DuckDB rejects GROUPING(status) when status is never grouped;
    # status is rolled up (NULL, gid bit set) in both sets
    exp = _sql(con, """
        SELECT flag, NULL AS status,
               CASE WHEN GROUPING(flag) = 1 THEN 3 ELSE 1 END
                 AS grouping_id,
               count(*) AS cnt, sum(qty) AS sum_qty
        FROM t WHERE qty BETWEEN 5 AND 40
        GROUP BY GROUPING SETS ((flag), ())""")
    _approx_eq(got, exp)


def test_grand_total_on_empty_match(spark, gs_table):
    """SQL contract: the () set emits one row even when no row matches
    — COUNT 0, SUM NULL."""
    out, con = gs_table
    got = _rows(filter_group_by_sets(
        spark, out, [("range", "qty", 10**6, 10**7)], ["flag"],
        [("cnt", "count", None), ("sum_qty", "sum", "qty")],
        sets=[[]]))
    assert got == [(None, 1, 0, None)]


def test_sets_validation(spark, gs_table):
    out, _ = gs_table
    with pytest.raises(ValueError):
        filter_group_by_sets(spark, out, [], [], [("c", "count", None)])
    with pytest.raises(ValueError):
        filter_group_by_sets(spark, out, [], ["flag"],
                             [("c", "count", None)], sets="bogus")
    with pytest.raises(ValueError):
        filter_group_by_sets(spark, out, [], ["flag"],
                             [("c", "count", None)], sets=[["status"]])
