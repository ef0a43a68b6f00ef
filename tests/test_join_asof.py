"""join_asof (round-6): encoded-to-encoded AS-OF join — backward/
forward, inclusive/strict, tolerance, composite and string by-keys,
null semantics — checked against DuckDB's native ASOF JOIN (and a
window-SQL twin where ASOF can't express the variant)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from arcade_spark.encode import encode_job
from arcade_spark.readops import join_asof


@pytest.fixture(scope="module")
def asof_tables(spark, tmp_path_factory):
    rng = np.random.default_rng(61)
    na, nb = 3000, 1200
    A = pd.DataFrame(
        {
            "uid": pd.array(
                rng.integers(0, 100, na).astype(np.int64), dtype="Int64"
            ),
            "grp": np.array(["g0", "g1", "g2"])[rng.integers(0, 3, na)],
            "t": pd.array(
                rng.integers(0, 50000, na).astype(np.int64), dtype="Int64"
            ),
            "ev": [f"e{i:05d}" for i in range(na)],
        }
    )
    A.loc[rng.random(na) < 0.03, "uid"] = pd.NA
    A.loc[rng.random(na) < 0.03, "t"] = pd.NA
    B = pd.DataFrame(
        {
            "uid": pd.array(
                rng.integers(0, 110, nb).astype(np.int64), dtype="Int64"
            ),
            "grp": np.array(["g0", "g1", "g2"])[rng.integers(0, 3, nb)],
            "t": pd.array(
                rng.integers(0, 50000, nb).astype(np.int64), dtype="Int64"
            ),
            "w": rng.integers(0, 1000, nb).astype(np.int64),
        }
    )
    B.loc[rng.random(nb) < 0.03, "uid"] = pd.NA
    B.loc[rng.random(nb) < 0.03, "t"] = pd.NA
    # keep the oracle deterministic: no duplicate (uid, grp, t) on the
    # right (tie-break across engines is otherwise arbitrary)
    B = B.drop_duplicates(["uid", "grp", "t"]).reset_index(drop=True)
    oa = str(tmp_path_factory.mktemp("asof") / "enc_a")
    ob = str(tmp_path_factory.mktemp("asof") / "enc_b")
    encode_job(spark, spark.createDataFrame(A), oa,
               num_parts=3, block_rows=256, order_col="ev")
    encode_job(spark, spark.createDataFrame(B), ob,
               num_parts=2, block_rows=128, order_col="w")
    con = duckdb.connect()
    con.register("a", A)
    con.register("b", B)
    return oa, ob, con


def _rows(df):
    return _key([
        tuple(None if v is None else v for v in r) for r in df.collect()
    ])


def _key(rows):
    return sorted(
        rows, key=lambda r: tuple((v is None, v) for v in r)
    )


def _sql(con, q):
    return _key([tuple(r) for r in con.execute(q).fetchall()])


def test_inner_backward(spark, asof_tables):
    oa, ob, con = asof_tables
    got = _rows(join_asof(
        spark, oa, ob, "t", "uid", project_a=["ev"], project_b=["w"]))
    exp = _sql(con, """
        SELECT a.uid, a.t, b.t, a.ev, b.w
        FROM (SELECT * FROM a WHERE t IS NOT NULL) a
        ASOF JOIN b ON a.uid = b.uid AND a.t >= b.t""")
    assert got == exp


def test_left_backward_keeps_unmatched_and_nulls(spark, asof_tables):
    oa, ob, con = asof_tables
    got = _rows(join_asof(
        spark, oa, ob, "t", "uid",
        project_a=["ev"], project_b=["w"], how="left"))
    exp = _sql(con, """
        SELECT a.uid, a.t, b.t, a.ev, b.w
        FROM (SELECT * FROM a WHERE t IS NOT NULL) a
        ASOF LEFT JOIN b ON a.uid = b.uid AND a.t >= b.t
        UNION ALL
        SELECT uid, t, NULL, ev, NULL FROM a WHERE t IS NULL""")
    assert got == exp
    # every left row survives, including null uid/t ones
    assert len(got) == con.execute("SELECT count(*) FROM a").fetchone()[0]


def test_forward(spark, asof_tables):
    oa, ob, con = asof_tables
    got = _rows(join_asof(
        spark, oa, ob, "t", "uid", project_b=["w"], direction="forward"))
    exp = _sql(con, """
        SELECT a.uid, a.t, b.t, b.w
        FROM (SELECT * FROM a WHERE t IS NOT NULL) a
        ASOF JOIN b ON a.uid = b.uid AND a.t <= b.t""")
    assert got == exp


def test_strict(spark, asof_tables):
    oa, ob, con = asof_tables
    got = _rows(join_asof(
        spark, oa, ob, "t", "uid", project_b=["w"], allow_exact=False))
    exp = _sql(con, """
        SELECT a.uid, a.t, b.t, b.w
        FROM (SELECT * FROM a WHERE t IS NOT NULL) a
        ASOF JOIN b ON a.uid = b.uid AND a.t > b.t""")
    assert got == exp


def test_tolerance(spark, asof_tables):
    oa, ob, con = asof_tables
    got = _rows(join_asof(
        spark, oa, ob, "t", "uid", project_b=["w"], tolerance=800))
    exp = _sql(con, """
        SELECT uid, t, bt, w FROM (
          SELECT a.uid, a.t, b.t AS bt, b.w,
                 row_number() OVER (
                   PARTITION BY a.uid, a.t, a.ev ORDER BY b.t DESC) rn
          FROM a JOIN b ON a.uid = b.uid
               AND a.t >= b.t AND a.t - b.t <= 800) WHERE rn = 1""")
    assert got == exp


def test_composite_by_with_string_lane(spark, asof_tables):
    oa, ob, con = asof_tables
    got = _rows(join_asof(
        spark, oa, ob, "t", ["uid", "grp"],
        project_a=["ev"], project_b=["w"], how="left"))
    exp = _sql(con, """
        SELECT a.uid, a.grp, a.t, b.t, a.ev, b.w
        FROM (SELECT * FROM a WHERE t IS NOT NULL) a
        ASOF LEFT JOIN b
        ON a.uid = b.uid AND a.grp = b.grp AND a.t >= b.t
        UNION ALL
        SELECT uid, grp, t, NULL, ev, NULL FROM a WHERE t IS NULL""")
    assert got == exp


def test_preds_pushdown(spark, asof_tables):
    oa, ob, con = asof_tables
    got = _rows(join_asof(
        spark, oa, ob, "t", "uid", project_b=["w"],
        preds_a=[("range", "t", 10000, 40000)],
        preds_b=[("range", "w", 0, 500)]))
    exp = _sql(con, """
        SELECT a.uid, a.t, b.t, b.w
        -- engine range predicates are inclusive BETWEEN; null t
        -- excluded by the range itself
        FROM (SELECT * FROM a WHERE t BETWEEN 10000 AND 40000) a
        ASOF JOIN (SELECT * FROM b WHERE w BETWEEN 0 AND 500) b
        ON a.uid = b.uid AND a.t >= b.t""")
    assert got == exp


def test_right_tie_break_deterministic(spark, tmp_path_factory):
    """Ties on (by, on) on the right are broken by greatest rowid:
    with order_col pinning the encode order, the winner is the row
    that sorts LAST by the order column."""
    A = pd.DataFrame({"uid": [1, 1], "t": [10, 20], "ev": ["x", "y"]})
    B = pd.DataFrame(
        {"uid": [1, 1, 1], "t": [10, 10, 5],
         "w": [111, 222, 333], "ord": ["a", "b", "c"]}
    )
    oa = str(tmp_path_factory.mktemp("tie") / "a")
    ob = str(tmp_path_factory.mktemp("tie") / "b")
    encode_job(spark, spark.createDataFrame(A), oa,
               num_parts=1, block_rows=64, order_col="ev")
    encode_job(spark, spark.createDataFrame(B), ob,
               num_parts=1, block_rows=64, order_col="ord")
    got = _rows(join_asof(spark, oa, ob, "t", "uid", project_b=["w"]))
    # t=10: both (111,'a') and (222,'b') tie at b.t=10 — max rid is
    # 'b' (encode order a,b,c) => w=222; t=20 matches the same row
    assert got == [(1, 10, 10, 222), (1, 20, 10, 222)]
    # stable across executions
    assert got == _rows(join_asof(spark, oa, ob, "t", "uid", project_b=["w"]))


def test_timestamp_on_column(spark, tmp_path_factory):
    import datetime as dt

    utc = dt.timezone.utc
    base = dt.datetime(2024, 1, 1, tzinfo=utc)
    A = pd.DataFrame({
        "uid": np.array([1, 1, 2, 2], dtype=np.int64),
        "ts": [base + dt.timedelta(minutes=m) for m in (5, 90, 30, 2)],
        "ev": ["a", "b", "c", "d"],
    })
    B = pd.DataFrame({
        "uid": np.array([1, 1, 2], dtype=np.int64),
        "ts": [base + dt.timedelta(minutes=m) for m in (0, 60, 10)],
        "w": np.array([7, 8, 9], dtype=np.int64),
    })
    A["ts"] = A["ts"].astype("datetime64[us, UTC]")
    B["ts"] = B["ts"].astype("datetime64[us, UTC]")
    oa = str(tmp_path_factory.mktemp("tsasof") / "a")
    ob = str(tmp_path_factory.mktemp("tsasof") / "b")
    encode_job(spark, spark.createDataFrame(A), oa,
               num_parts=1, block_rows=64, order_col="ev")
    encode_job(spark, spark.createDataFrame(B), ob,
               num_parts=1, block_rows=64, order_col="w")
    got = join_asof(
        spark, oa, ob, "ts", "uid", project_a=["ev"], project_b=["w"],
        how="left", tolerance=45 * 60 * 1_000_000)  # 45 min in micros
    rows = {r["ev"]: (r["w"], r["ts_b"]) for r in got.collect()}
    assert rows["a"][0] == 7          # 5min after t0
    assert rows["b"][0] == 8          # 30min after t60
    assert rows["c"][0] == 9          # 20min after t10
    assert rows["d"] == (None, None)  # t2 precedes every right ts
    assert got.schema["ts"].dataType.typeName() == "timestamp"
    assert got.schema["ts_b"].dataType.typeName() == "timestamp"


def test_validation_errors(spark, asof_tables):
    oa, ob, _ = asof_tables
    with pytest.raises(ValueError):
        join_asof(spark, oa, ob, "t", "uid", how="full")
    with pytest.raises(ValueError):
        join_asof(spark, oa, ob, "t", "uid", direction="sideways")
    with pytest.raises(ValueError):
        join_asof(spark, oa, ob, "t", [])
    with pytest.raises(ValueError):
        join_asof(spark, oa, ob, "t", "uid", tolerance=-1)
    with pytest.raises(NotImplementedError):
        join_asof(spark, oa, ob, "ev", "uid")  # string on column


def test_nearest(spark, asof_tables):
    """direction='nearest': whichever of the backward / forward
    candidates is closest in absolute distance; equal distances prefer
    the backward match. Oracle: pick-closer over the two candidate
    CTEs (forward strict — an exact tie IS the backward candidate)."""
    oa, ob, con = asof_tables
    got = _rows(join_asof(
        spark, oa, ob, "t", "uid", project_b=["w"],
        direction="nearest", how="left"))
    exp = _sql(con, """
        WITH lv AS (SELECT row_number() OVER () AS rn, uid, t
                    FROM a WHERE uid IS NOT NULL AND t IS NOT NULL),
        bb AS (SELECT lv.rn, max(b.t) AS tb FROM lv JOIN b
               ON lv.uid = b.uid AND b.t <= lv.t GROUP BY lv.rn),
        ff AS (SELECT lv.rn, min(b.t) AS tf FROM lv JOIN b
               ON lv.uid = b.uid AND b.t > lv.t GROUP BY lv.rn),
        pick AS (SELECT lv.rn, lv.uid, lv.t,
                 CASE WHEN tb IS NULL THEN tf
                      WHEN tf IS NULL THEN tb
                      WHEN lv.t - tb <= tf - lv.t THEN tb
                      ELSE tf END AS tm
                 FROM lv LEFT JOIN bb USING (rn) LEFT JOIN ff USING (rn))
        SELECT p.uid, p.t, p.tm, b.w
        FROM pick p LEFT JOIN b ON p.uid = b.uid AND p.tm = b.t
        UNION ALL
        SELECT uid, t, NULL, NULL FROM a
        WHERE uid IS NULL OR t IS NULL""")
    assert got == exp


def test_nearest_tolerance(spark, asof_tables):
    oa, ob, con = asof_tables
    got = _rows(join_asof(
        spark, oa, ob, "t", "uid", project_b=["w"],
        direction="nearest", tolerance=15))
    exp = _sql(con, """
        WITH lv AS (SELECT row_number() OVER () AS rn, uid, t
                    FROM a WHERE uid IS NOT NULL AND t IS NOT NULL),
        bb AS (SELECT lv.rn, max(b.t) AS tb FROM lv JOIN b
               ON lv.uid = b.uid AND b.t <= lv.t GROUP BY lv.rn),
        ff AS (SELECT lv.rn, min(b.t) AS tf FROM lv JOIN b
               ON lv.uid = b.uid AND b.t > lv.t GROUP BY lv.rn),
        pick AS (SELECT lv.rn, lv.uid, lv.t,
                 CASE WHEN tb IS NULL THEN tf
                      WHEN tf IS NULL THEN tb
                      WHEN lv.t - tb <= tf - lv.t THEN tb
                      ELSE tf END AS tm
                 FROM lv LEFT JOIN bb USING (rn) LEFT JOIN ff USING (rn))
        SELECT p.uid, p.t, p.tm, b.w
        FROM pick p JOIN b ON p.uid = b.uid AND p.tm = b.t
        WHERE abs(p.t - p.tm) <= 15""")
    assert got == exp
