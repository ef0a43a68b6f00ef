"""join_band (round-6): many-to-many bounded-range join — bucketed
band replication, no cartesian — checked against DuckDB inequality
joins."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from arcade_spark.encode import encode_job
from arcade_spark.readops import join_band


@pytest.fixture(scope="module")
def band_tables(spark, tmp_path_factory):
    rng = np.random.default_rng(64)
    na, nb = 2500, 900
    A = pd.DataFrame(
        {
            "uid": pd.array(
                rng.integers(0, 80, na).astype(np.int64), dtype="Int64"
            ),
            "t": pd.array(
                rng.integers(-5000, 45000, na).astype(np.int64),
                dtype="Int64",
            ),
            "ev": [f"e{i:05d}" for i in range(na)],
        }
    )
    A.loc[rng.random(na) < 0.03, "uid"] = pd.NA
    A.loc[rng.random(na) < 0.03, "t"] = pd.NA
    B = pd.DataFrame(
        {
            "uid": pd.array(
                rng.integers(0, 90, nb).astype(np.int64), dtype="Int64"
            ),
            "s": pd.array(
                rng.integers(-5000, 45000, nb).astype(np.int64),
                dtype="Int64",
            ),
            "w": rng.integers(0, 1000, nb).astype(np.int64),
        }
    )
    B.loc[rng.random(nb) < 0.03, "uid"] = pd.NA
    B.loc[rng.random(nb) < 0.03, "s"] = pd.NA
    oa = str(tmp_path_factory.mktemp("band") / "enc_a")
    ob = str(tmp_path_factory.mktemp("band") / "enc_b")
    encode_job(spark, spark.createDataFrame(A), oa,
               num_parts=3, block_rows=256, order_col="ev")
    encode_job(spark, spark.createDataFrame(B), ob,
               num_parts=2, block_rows=128, order_col="w")
    con = duckdb.connect()
    con.register("a", A)
    con.register("b", B)
    return oa, ob, con


def _key(rows):
    return sorted(rows, key=lambda r: tuple((v is None, v) for v in r))


def _rows(df):
    return _key([tuple(r) for r in df.collect()])


def _sql(con, q):
    return _key([tuple(r) for r in con.execute(q).fetchall()])


def test_band_inner_by_key(spark, band_tables):
    oa, ob, con = band_tables
    got = _rows(join_band(
        spark, oa, ob, "t", "s", lo=0, hi=500, by="uid",
        project_a=["ev"], project_b=["w"]))
    exp = _sql(con, """
        SELECT a.uid, a.t, b.s, a.ev, b.w
        FROM a JOIN b ON a.uid = b.uid
        AND a.t BETWEEN b.s AND b.s + 500""")
    assert got == exp
    assert len(got) > 0


def test_band_negative_lo_no_key(spark, band_tables):
    """Band around the point (lo negative), NO equality key — pure
    range join; bucketing alone prevents the cartesian."""
    oa, ob, con = band_tables
    got = _rows(join_band(
        spark, oa, ob, "t", "s", lo=-40, hi=40,
        preds_a=[("range", "t", 0, 2000)],
        preds_b=[("range", "w", 0, 100)]))
    exp = _sql(con, """
        SELECT a.t, b.s
        FROM (SELECT * FROM a WHERE t BETWEEN 0 AND 2000) a
        JOIN (SELECT * FROM b WHERE w BETWEEN 0 AND 100) b
        ON a.t BETWEEN b.s - 40 AND b.s + 40""")
    assert got == exp
    assert len(got) > 0


def test_band_left_outer(spark, band_tables):
    oa, ob, con = band_tables
    got = _rows(join_band(
        spark, oa, ob, "t", "s", lo=0, hi=200, by="uid",
        project_b=["w"], how="left"))
    exp = _sql(con, """
        SELECT a.uid, a.t, b.s, b.w
        FROM a LEFT JOIN b ON a.uid = b.uid
        AND a.t BETWEEN b.s AND b.s + 200""")
    assert got == exp
    # null-key A rows preserved
    assert any(r[0] is None for r in got)


def test_band_no_nested_loop_in_plan(spark, band_tables):
    """The executed plan must be an equi-join on (key, bucket) — no
    BroadcastNestedLoopJoin / CartesianProduct anywhere."""
    oa, ob, _ = band_tables
    df = join_band(spark, oa, ob, "t", "s", lo=0, hi=500, by="uid")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_band_point_band_zero_width(spark, band_tables):
    """lo == hi == 0 degenerates to an equality join on (uid, t)."""
    oa, ob, con = band_tables
    got = _rows(join_band(spark, oa, ob, "t", "s", lo=0, hi=0, by="uid"))
    exp = _sql(con, """
        SELECT a.uid, a.t, b.s FROM a JOIN b
        ON a.uid = b.uid AND a.t = b.s""")
    assert got == exp


def test_band_validation(spark, band_tables):
    oa, ob, _ = band_tables
    with pytest.raises(ValueError):
        join_band(spark, oa, ob, "t", "s", lo=10, hi=5)
    with pytest.raises(ValueError):
        join_band(spark, oa, ob, "t", "s", how="full")
    with pytest.raises(NotImplementedError):
        join_band(spark, oa, ob, "ev", "s")  # string on column
