"""top_per_key + sessionize (round-6): per-key window ops — top-N per
group with NULLS LAST + rowid tie-break, and gap-based sessionization
(rows + per-session aggregate) — checked against DuckDB window SQL."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from arcade_spark.encode import encode_job
from arcade_spark.readops import sessionize, top_per_key


@pytest.fixture(scope="module")
def win_table(spark, tmp_path_factory):
    rng = np.random.default_rng(62)
    n = 4000
    df = pd.DataFrame(
        {
            "uid": pd.array(
                rng.integers(0, 60, n).astype(np.int64), dtype="Int64"
            ),
            "grp": pd.array(
                np.array(["g0", "g1", "g2", "g3"])[rng.integers(0, 4, n)]
            ),
            "score": pd.array(
                rng.integers(0, 500, n).astype(np.int64), dtype="Int64"
            ),
            "val": np.round(rng.random(n) * 100, 2),
            "tb": [f"t{i:05d}" for i in range(n)],  # unique tie-break
        }
    )
    df.loc[rng.random(n) < 0.04, "uid"] = pd.NA
    df.loc[rng.random(n) < 0.04, "score"] = pd.NA
    df.loc[rng.random(n) < 0.04, "grp"] = None
    out = str(tmp_path_factory.mktemp("win") / "enc")
    # order_col pins rowid order to tb, so the engine's rowid
    # tie-break == ORDER BY tb ASC in the oracle
    encode_job(spark, spark.createDataFrame(df), out,
               num_parts=3, block_rows=256, order_col="tb")
    con = duckdb.connect()
    con.register("t", df)
    return out, con


def _key(rows):
    return sorted(rows, key=lambda r: tuple((v is None, str(v)) for v in r))


def _rows(df):
    return _key([tuple(r) for r in df.collect()])


def _sql(con, q):
    return _key([tuple(r) for r in con.execute(q).fetchall()])


def test_top3_desc_int(spark, win_table):
    out, con = win_table
    got = _rows(top_per_key(
        spark, out, "uid", ["score", "tb"], 3, project=["tb"],
        desc=[True, False]))
    exp = _sql(con, """
        SELECT uid, rn, tb FROM (
          SELECT uid, tb, row_number() OVER (
            PARTITION BY uid
            ORDER BY score DESC NULLS LAST, tb ASC NULLS LAST) AS rn
          FROM t) WHERE rn <= 3""")
    assert got == exp


def test_top1_string_group_asc(spark, win_table):
    out, con = win_table
    got = _rows(top_per_key(
        spark, out, "grp", ["score", "tb"], 1, project=["tb", "val"]))
    exp = _sql(con, """
        SELECT grp, rn, tb, val FROM (
          SELECT grp, tb, val, row_number() OVER (
            PARTITION BY grp
            ORDER BY score ASC NULLS LAST, tb ASC NULLS LAST) AS rn
          FROM t) WHERE rn <= 1""")
    assert got == exp


def test_top2_composite_group_mixed_dirs(spark, win_table):
    out, con = win_table
    got = _rows(top_per_key(
        spark, out, ["grp", "uid"], ["score", "tb"], 2,
        project=["tb"], desc=[True, False]))
    exp = _sql(con, """
        SELECT grp, uid, rn, tb FROM (
          SELECT grp, uid, tb, row_number() OVER (
            PARTITION BY grp, uid
            ORDER BY score DESC NULLS LAST, tb ASC NULLS LAST) AS rn
          FROM t) WHERE rn <= 2""")
    assert got == exp


def test_topn_double_order_lane(spark, win_table):
    out, con = win_table
    got = _rows(top_per_key(
        spark, out, "uid", ["val", "tb"], 2, project=["tb"],
        desc=[True, False]))
    exp = _sql(con, """
        SELECT uid, rn, tb FROM (
          SELECT uid, tb, row_number() OVER (
            PARTITION BY uid
            ORDER BY val DESC NULLS LAST, tb ASC NULLS LAST) AS rn
          FROM t) WHERE rn <= 2""")
    assert got == exp


def test_topn_with_preds(spark, win_table):
    out, con = win_table
    got = _rows(top_per_key(
        spark, out, "uid", ["score", "tb"], 2, project=["tb"],
        preds=[("range", "score", 100, 400)]))
    exp = _sql(con, """
        SELECT uid, rn, tb FROM (
          SELECT uid, tb, row_number() OVER (
            PARTITION BY uid ORDER BY score ASC, tb) AS rn
          FROM t WHERE score BETWEEN 100 AND 400) WHERE rn <= 2""")
    assert got == exp


def test_topn_exceeds_group_size(spark, win_table):
    out, con = win_table
    got = _rows(top_per_key(spark, out, "grp", ["score", "tb"],
                            10**6, project=["tb"]))
    exp = _sql(con, """
        SELECT grp, row_number() OVER (
          PARTITION BY grp ORDER BY score ASC NULLS LAST, tb) AS rn, tb
        FROM t""")
    assert got == exp


def test_topn_validation(spark, win_table):
    out, _ = win_table
    with pytest.raises(ValueError):
        top_per_key(spark, out, "uid", "score", 0)
    with pytest.raises(ValueError):
        top_per_key(spark, out, "uid", "score", 1, project=["uid"])
    with pytest.raises(NotImplementedError):
        top_per_key(spark, out, "val", "score", 1)  # float group col
    with pytest.raises(ValueError):
        top_per_key(spark, out, "uid", ["score", "tb"], 1, desc=[True])


@pytest.fixture(scope="module")
def sess_table(spark, tmp_path_factory):
    rng = np.random.default_rng(63)
    n = 5000
    df = pd.DataFrame(
        {
            "uid": pd.array(
                rng.integers(0, 40, n).astype(np.int64), dtype="Int64"
            ),
            "site": pd.array(
                np.array(["a.com", "b.org"])[rng.integers(0, 2, n)]
            ),
            "t": pd.array(
                np.sort(rng.integers(0, 200000, n)).astype(np.int64),
                dtype="Int64",
            ),
            "ev": [f"e{i:05d}" for i in range(n)],
            "amt": pd.array(
                rng.integers(-50, 200, n).astype(np.int64), dtype="Int64"
            ),
        }
    )
    df.loc[rng.random(n) < 0.03, "uid"] = pd.NA
    df.loc[rng.random(n) < 0.03, "t"] = pd.NA
    df.loc[rng.random(n) < 0.03, "amt"] = pd.NA
    out = str(tmp_path_factory.mktemp("sess") / "enc")
    encode_job(spark, spark.createDataFrame(df), out,
               num_parts=3, block_rows=512, order_col="ev")
    con = duckdb.connect()
    con.register("t", df)
    return out, con


_SESS_ROWS_SQL = """
    WITH lagged AS (
      SELECT uid, t, lag(t) OVER (PARTITION BY uid ORDER BY t) AS prev
      FROM t WHERE uid IS NOT NULL AND t IS NOT NULL {extra}
    )
    SELECT uid, t, SUM(CASE WHEN prev IS NULL OR t - prev > {gap}
                       THEN 1 ELSE 0 END)
           OVER (PARTITION BY uid ORDER BY t
                 ROWS UNBOUNDED PRECEDING) - 1 AS session
    FROM lagged"""


def test_sessionize_rows(spark, sess_table):
    out, con = sess_table
    got = _rows(sessionize(spark, out, "uid", "t", gap=500))
    exp = _sql(con, _SESS_ROWS_SQL.format(gap=500, extra=""))
    assert got == exp


def test_sessionize_rows_with_preds(spark, sess_table):
    out, con = sess_table
    got = _rows(sessionize(spark, out, "uid", "t", gap=300,
                           preds=[("eq", "site", "a.com")]))
    exp = _sql(con, _SESS_ROWS_SQL.format(
        gap=300, extra="AND site = 'a.com'"))
    assert got == exp


def test_sessionize_sessions_agg(spark, sess_table):
    out, con = sess_table
    got = _rows(sessionize(spark, out, "uid", "t", gap=500,
                           emit="sessions"))
    exp = _sql(con, f"""
        WITH sess AS ({_SESS_ROWS_SQL.format(gap=500, extra="")})
        SELECT uid, session, count(*) AS n_events,
               min(t) AS t_start, max(t) AS t_end
        FROM sess GROUP BY uid, session""")
    assert got == exp


def test_sessionize_composite_key_with_string(spark, sess_table):
    out, con = sess_table
    got = _rows(sessionize(spark, out, ["site", "uid"], "t", gap=1000))
    exp = _sql(con, """
        WITH lagged AS (
          SELECT site, uid, t,
                 lag(t) OVER (PARTITION BY site, uid ORDER BY t) AS prev
          FROM t WHERE uid IS NOT NULL AND t IS NOT NULL
                   AND site IS NOT NULL
        )
        SELECT site, uid, t,
               SUM(CASE WHEN prev IS NULL OR t - prev > 1000
                   THEN 1 ELSE 0 END)
               OVER (PARTITION BY site, uid ORDER BY t
                     ROWS UNBOUNDED PRECEDING) - 1 AS session
        FROM lagged""")
    assert got == exp


def test_sessionize_single_session_per_key(spark, sess_table):
    """gap larger than the whole time range → exactly one session per
    key, n_events == per-key row count."""
    out, con = sess_table
    got = sessionize(spark, out, "uid", "t", gap=10**9,
                     emit="sessions").collect()
    assert all(r["session"] == 0 for r in got)
    exp = dict(con.execute(
        "SELECT uid, count(*) FROM t WHERE uid IS NOT NULL "
        "AND t IS NOT NULL GROUP BY uid").fetchall())
    assert {r["uid"]: r["n_events"] for r in got} == exp


def test_sessionize_validation(spark, sess_table):
    out, _ = sess_table
    with pytest.raises(ValueError):
        sessionize(spark, out, "uid", "t", gap=0)
    with pytest.raises(ValueError):
        sessionize(spark, out, "uid", "t", gap=5, emit="bogus")
    with pytest.raises(NotImplementedError):
        sessionize(spark, out, "uid", "ev", gap=5)  # string ts col


# ---------------------------------------------------------- rolling_agg

def test_rolling_count(spark, sess_table):
    from arcade_spark.readops import rolling_agg

    out, con = sess_table
    got = _rows(rolling_agg(spark, out, "uid", "t", window=500))
    exp = _sql(con, """
        SELECT uid, t, count(*) OVER (
          PARTITION BY uid ORDER BY t
          RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS w_count
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL""")
    assert got == exp


def test_rolling_sum_avg(spark, sess_table):
    from arcade_spark.readops import rolling_agg

    out, con = sess_table
    got = _rows(rolling_agg(
        spark, out, "uid", "t", window=800, agg_col="amt",
        aggs=("count", "sum", "avg")))
    # engine drops rows with ANY null lane (uid/t/amt) from frames
    exp = _sql(con, """
        SELECT uid, t,
               count(*) OVER w AS w_count,
               sum(amt) OVER w AS w_sum,
               CAST(sum(amt) OVER w AS DOUBLE)
                 / count(*) OVER w AS w_avg
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL
                 AND amt IS NOT NULL
        WINDOW w AS (PARTITION BY uid ORDER BY t
                     RANGE BETWEEN 800 PRECEDING AND CURRENT ROW)""")
    assert got == exp


def test_rolling_composite_key_with_preds(spark, sess_table):
    from arcade_spark.readops import rolling_agg

    out, con = sess_table
    got = _rows(rolling_agg(
        spark, out, ["site", "uid"], "t", window=2000, agg_col="amt",
        aggs=("sum",), preds=[("range", "amt", 0, 100)]))
    exp = _sql(con, """
        SELECT site, uid, t, sum(amt) OVER (
          PARTITION BY site, uid ORDER BY t
          RANGE BETWEEN 2000 PRECEDING AND CURRENT ROW) AS w_sum
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL
                 AND site IS NOT NULL AND amt BETWEEN 0 AND 100""")
    assert got == exp


def test_rolling_window_covers_all(spark, sess_table):
    """window wider than the whole span → every row's frame is its
    key's full prefix-with-peers (cumulative count)."""
    from arcade_spark.readops import rolling_agg

    out, con = sess_table
    got = _rows(rolling_agg(spark, out, "uid", "t", window=10**9))
    exp = _sql(con, """
        SELECT uid, t, count(*) OVER (
          PARTITION BY uid ORDER BY t
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w_count
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL""")
    assert got == exp


def test_rolling_min_max(spark, sess_table):
    from arcade_spark.readops import rolling_agg

    out, con = sess_table
    got = _rows(rolling_agg(
        spark, out, "uid", "t", window=800, agg_col="amt",
        aggs=("min", "max")))
    exp = _sql(con, """
        SELECT uid, t,
               min(amt) OVER w AS w_min,
               max(amt) OVER w AS w_max
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL
                 AND amt IS NOT NULL
        WINDOW w AS (PARTITION BY uid ORDER BY t
                     RANGE BETWEEN 800 PRECEDING AND CURRENT ROW)""")
    assert got == exp


def test_rolling_min_max_narrow_and_full_windows(spark, sess_table):
    """window=1 (frames of near-peers only) and window spanning
    everything (cumulative min/max) both hit the sparse table's edge
    levels."""
    from arcade_spark.readops import rolling_agg

    out, con = sess_table
    for win, frame in ((1, "RANGE BETWEEN 1 PRECEDING AND CURRENT ROW"),
                       (10**9, "RANGE BETWEEN UNBOUNDED PRECEDING "
                               "AND CURRENT ROW")):
        got = _rows(rolling_agg(
            spark, out, "uid", "t", window=win, agg_col="amt",
            aggs=("min", "max", "count")))
        exp = _sql(con, f"""
            SELECT uid, t, count(*) OVER w AS w_count,
                   min(amt) OVER w AS w_min, max(amt) OVER w AS w_max
            FROM t WHERE uid IS NOT NULL AND t IS NOT NULL
                     AND amt IS NOT NULL
            WINDOW w AS (PARTITION BY uid ORDER BY t {frame})""")
        assert got == exp


def test_rolling_min_max_ts_agg_restores_type(spark, sess_table):
    """min/max over an int64-lane column commute with the lane mapping;
    a rolling max of t itself equals t (frames end at the current
    row's peers)."""
    from arcade_spark.readops import rolling_agg

    out, _ = sess_table
    got = rolling_agg(spark, out, "uid", "t", window=500,
                      agg_col="t", aggs=("max",)).collect()
    assert got and all(r["w_max"] == r["t"] for r in got)


def test_rolling_validation(spark, sess_table):
    from arcade_spark.readops import rolling_agg

    out, _ = sess_table
    with pytest.raises(ValueError):
        rolling_agg(spark, out, "uid", "t", window=0)
    with pytest.raises(ValueError):
        rolling_agg(spark, out, "uid", "t", window=5, aggs=("sum",))
    with pytest.raises(ValueError):
        rolling_agg(spark, out, "uid", "t", window=5, aggs=("min",))
    with pytest.raises(ValueError):
        rolling_agg(spark, out, "uid", "t", window=5, aggs=("median",))
    with pytest.raises(NotImplementedError):
        rolling_agg(spark, out, "uid", "ev", window=5)  # string ts
    with pytest.raises(NotImplementedError):
        rolling_agg(spark, out, "uid", "t", window=5,
                    agg_col="ev", aggs=("sum",))  # string agg col


def test_top_rank_mode_ties_kept(spark, win_table):
    """mode='rank': all rows tied into the top n are kept (a key may
    emit more than n rows), ranks have gaps after ties."""
    out, con = win_table
    got = _rows(top_per_key(
        spark, out, "uid", "score", 3, project=["tb"],
        desc=True, mode="rank"))
    exp = _sql(con, """
        SELECT uid, rn, tb FROM (
          SELECT uid, tb, rank() OVER (
            PARTITION BY uid ORDER BY score DESC NULLS LAST) AS rn
          FROM t) WHERE rn <= 3""")
    assert got == exp


def test_top_dense_rank_mode(spark, win_table):
    out, con = win_table
    got = _rows(top_per_key(
        spark, out, "grp", "score", 2, project=["tb"],
        mode="dense_rank"))
    exp = _sql(con, """
        SELECT grp, rn, tb FROM (
          SELECT grp, tb, dense_rank() OVER (
            PARTITION BY grp ORDER BY score ASC NULLS LAST) AS rn
          FROM t) WHERE rn <= 2""")
    assert got == exp


def test_top_rank_mode_validation(spark, win_table):
    out, _ = win_table
    with pytest.raises(ValueError):
        top_per_key(spark, out, "uid", "score", 1, mode="ntile")


# --------------------------------------------------------- window_shift

def test_window_shift_lag_int(spark, sess_table):
    from arcade_spark.readops import window_shift

    out, con = sess_table
    got = _rows(window_shift(spark, out, "uid", ["t", "ev"], "amt"))
    # rowid order was pinned to ev at encode, so the engine's (t, rid)
    # tie-break == ORDER BY t, ev; null-amt rows are kept (LAG
    # propagates null source values), null uid/t rows drop
    exp = _sql(con, """
        SELECT uid, t, ev, amt, lag(amt) OVER (
          PARTITION BY uid ORDER BY t, ev) AS shifted
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL""")
    assert got == exp


def test_window_shift_lead_offset2(spark, sess_table):
    from arcade_spark.readops import window_shift

    out, con = sess_table
    got = _rows(window_shift(spark, out, "uid", ["t", "ev"], "amt",
                             offset=2, direction="lead"))
    exp = _sql(con, """
        SELECT uid, t, ev, amt, lead(amt, 2) OVER (
          PARTITION BY uid ORDER BY t, ev) AS shifted
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL""")
    assert got == exp


def test_window_shift_string_val(spark, sess_table):
    from arcade_spark.readops import window_shift

    out, con = sess_table
    got = _rows(window_shift(spark, out, "uid", ["t", "ev"], "site"))
    exp = _sql(con, """
        SELECT uid, t, ev, site, lag(site) OVER (
          PARTITION BY uid ORDER BY t, ev) AS shifted
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL""")
    assert got == exp


def test_window_shift_composite_key_preds(spark, sess_table):
    from arcade_spark.readops import window_shift

    out, con = sess_table
    got = _rows(window_shift(
        spark, out, ["site", "uid"], ["t", "ev"], "amt",
        preds=[("range", "amt", 0, 150)]))
    exp = _sql(con, """
        SELECT site, uid, t, ev, amt, lag(amt) OVER (
          PARTITION BY site, uid ORDER BY t, ev) AS shifted
        FROM t WHERE uid IS NOT NULL AND site IS NOT NULL
                 AND t IS NOT NULL AND amt BETWEEN 0 AND 150""")
    assert got == exp


def test_window_shift_float_val(spark, win_table):
    from arcade_spark.readops import window_shift

    out, con = win_table
    got = _rows(window_shift(spark, out, "uid", ["score", "tb"], "val"))
    # rowid order pinned to tb at encode → tie-break ORDER BY score, tb
    exp = _sql(con, """
        SELECT uid, score, tb, val, lag(val) OVER (
          PARTITION BY uid ORDER BY score, tb) AS shifted
        FROM t WHERE uid IS NOT NULL AND score IS NOT NULL""")
    assert got == exp


def test_window_shift_validation(spark, sess_table):
    from arcade_spark.readops import window_shift

    out, _ = sess_table
    with pytest.raises(ValueError):
        window_shift(spark, out, "uid", "t", "amt", offset=0)
    with pytest.raises(ValueError):
        window_shift(spark, out, "uid", "t", "amt", direction="shuffle")
    with pytest.raises(ValueError):
        window_shift(spark, out, "uid", [], "amt")  # no order cols


def test_cumulative_full_grammar(spark, sess_table):
    """window=None: running aggregates over SQL's DEFAULT frame (RANGE
    UNBOUNDED PRECEDING — peers of the current ts included)."""
    from arcade_spark.readops import rolling_agg

    out, con = sess_table
    got = _rows(rolling_agg(
        spark, out, "uid", "t", window=None, agg_col="amt",
        aggs=("count", "sum", "avg", "min", "max")))
    exp = _sql(con, """
        SELECT uid, t,
               count(*) OVER w AS w_count,
               sum(amt) OVER w AS w_sum,
               CAST(sum(amt) OVER w AS DOUBLE)
                 / count(*) OVER w AS w_avg,
               min(amt) OVER w AS w_min,
               max(amt) OVER w AS w_max
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL
                 AND amt IS NOT NULL
        WINDOW w AS (PARTITION BY uid ORDER BY t)""")
    assert got == exp


def test_cumulative_count_only(spark, sess_table):
    from arcade_spark.readops import rolling_agg

    out, con = sess_table
    got = _rows(rolling_agg(spark, out, "uid", "t", window=None))
    exp = _sql(con, """
        SELECT uid, t, count(*) OVER (PARTITION BY uid ORDER BY t)
               AS w_count
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL""")
    assert got == exp


def test_rolling_two_sided_frame(spark, sess_table):
    """window_after: RANGE BETWEEN N PRECEDING AND M FOLLOWING."""
    from arcade_spark.readops import rolling_agg

    out, con = sess_table
    got = _rows(rolling_agg(
        spark, out, "uid", "t", window=600, agg_col="amt",
        aggs=("count", "sum", "min", "max"), window_after=300))
    exp = _sql(con, """
        SELECT uid, t, count(*) OVER w AS w_count,
               sum(amt) OVER w AS w_sum,
               min(amt) OVER w AS w_min, max(amt) OVER w AS w_max
        FROM t WHERE uid IS NOT NULL AND t IS NOT NULL
                 AND amt IS NOT NULL
        WINDOW w AS (PARTITION BY uid ORDER BY t
                     RANGE BETWEEN 600 PRECEDING AND 300 FOLLOWING)""")
    assert got == exp


def test_rolling_two_sided_validation(spark, sess_table):
    from arcade_spark.readops import rolling_agg

    out, _ = sess_table
    import pytest as _pt
    with _pt.raises(ValueError):
        rolling_agg(spark, out, "uid", "t", window=10, window_after=-1)
    with _pt.raises(NotImplementedError):
        rolling_agg(spark, out, "uid", "t", window=None, window_after=5)
