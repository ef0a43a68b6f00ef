"""Three-table fused join chain (round-7): the TPC-H Q5 shape
``A ⋈ B ⋈ C GROUP BY c.g`` with aggregation pushed below BOTH joins —
no joined row ever materializes. Checked against DuckDB running the
plain three-way join with the identical fixed-point arithmetic, under
duplicate bridge keys, duplicate dim keys (multiplicity at both hops),
null keys at every hop, and predicates on all three sides."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from arcade_spark.encode import encode_job


@pytest.fixture(scope="module")
def chain_tables(spark, tmp_path_factory):
    """fact: 900 rows keyed to the bridge; bridge: 140 rows with
    DUPLICATED fact-side keys and a dim-side key; dim: 50 rows with
    DUPLICATED keys (multiplicity at hop 2) and a 3-value group col.
    Null keys on every hop; some keys missing at each hop."""
    rng = np.random.default_rng(1007)
    n = 900
    fk = rng.integers(0, 80, n).astype(object)
    fk[::83] = None
    fact_rows = [
        (
            f"f{i:04d}",
            None if fk[i] is None else int(fk[i]),
            round(float(rng.integers(100, 99999)) / 100.0, 2),  # price
            round(float(rng.integers(0, 10)) / 100.0, 2),       # disc
            int(rng.integers(1, 50)),                           # qty
        )
        for i in range(n)
    ]
    fact = spark.createDataFrame(
        fact_rows, "url string, k long, price double, disc double, qty long"
    )
    bridge_rows = []
    for i in range(140):
        ka = i % 70  # keys 70..79 exist only in fact; 0..69 duplicated
        kc = (i * 7) % 22  # dim keys 22..24 exist only in dim
        bridge_rows.append((
            f"b{i:04d}",
            None if i % 23 == 11 else ka,
            None if i % 29 == 17 else kc,
            ["OPEN", "HOLD", "DONE"][i % 3],
        ))
    bridge = spark.createDataFrame(
        bridge_rows, "url string, ka long, kc long, status string"
    )
    dim_rows = []
    for i in range(50):
        kc = i % 25  # every dim key appears twice -> nc = 2 per group
        dim_rows.append((
            f"c{i:04d}",
            None if i % 31 == 30 else kc,
            ["AUTO", "BLDG", "MACH"][kc % 3],
            int(kc % 5),
        ))
    dim = spark.createDataFrame(
        dim_rows, "url string, kc long, seg string, region long"
    )
    out_a = str(tmp_path_factory.mktemp("cha") / "enc")
    out_b = str(tmp_path_factory.mktemp("chb") / "enc")
    out_c = str(tmp_path_factory.mktemp("chc") / "enc")
    encode_job(spark, fact, out_a, num_parts=3, block_rows=64)
    encode_job(spark, bridge, out_b, num_parts=2, block_rows=32)
    encode_job(spark, dim, out_c, num_parts=2, block_rows=16)
    con = duckdb.connect()
    con.register("fact", fact.toPandas())
    con.register("bridge", bridge.toPandas())
    con.register("dim", dim.toPandas())
    return out_a, out_b, out_c, con


def _rows(df, keys):
    pdf = df.toPandas().sort_values(keys).reset_index(drop=True)
    return [tuple(r) for r in pdf.itertuples(index=False)]


def _sql(con, q):
    return [tuple(r) for r in con.execute(q).fetchall()]


def test_q5_shape_full_grammar(spark, chain_tables):
    """revenue sumprod + sum + count + min + max + avg per dim group,
    predicates on all three sides — exact vs the DuckDB replay."""
    from arcade_spark.readops import join_group_by_chain

    out_a, out_b, out_c, con = chain_tables
    got = _rows(
        join_group_by_chain(
            spark, out_a, out_b, out_c,
            key_a="k", key_b_a="ka", key_b_c="kc", key_c="kc",
            aggs=[
                ("revenue", "sumprod",
                 [("price", 1, 0), ("disc", -1, 100)]),
                ("sum_qty", "sum", "qty"),
                ("cnt", "count", None),
                ("min_p", "min", "price"),
                ("max_p", "max", "price"),
                ("avg_qty", "avg", "qty"),
            ],
            group_c=["seg"],
            preds_a=[("range", "qty", 1, 45)],
            preds_b=[("in", "status", ["OPEN", "DONE"])],
            preds_c=[("range", "region", 0, 3)],
        ),
        ["seg"],
    )
    exp = _sql(con, """
        SELECT seg,
               CAST(sum(CAST(floor(price*100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(disc*100 + 0.5) AS BIGINT)))
                    AS DOUBLE)/10000 AS revenue,
               sum(qty) AS sum_qty,
               count(*) AS cnt,
               min(price) AS min_p,
               max(price) AS max_p,
               CAST(sum(qty) AS DOUBLE)/count(*) AS avg_qty
        FROM fact JOIN bridge ON k = ka JOIN dim ON bridge.kc = dim.kc
        WHERE qty BETWEEN 1 AND 45 AND status IN ('OPEN', 'DONE')
              AND region BETWEEN 0 AND 3
        GROUP BY seg ORDER BY seg""")
    assert len(got) == len(exp) == 3
    for g, e in zip(got, exp):
        assert g[0] == e[0]
        assert g[1] == pytest.approx(e[1], abs=1e-9)   # exact int fold
        assert g[2] == e[2] and g[3] == e[3]
        assert g[4] == pytest.approx(e[4], abs=1e-9)
        assert g[5] == pytest.approx(e[5], abs=1e-9)
        assert g[6] == pytest.approx(e[6], rel=1e-12)


def test_chain_no_group_global_agg(spark, chain_tables):
    """Empty group_c: one global row over the fully-joined set."""
    from arcade_spark.readops import join_group_by_chain

    out_a, out_b, out_c, con = chain_tables
    got = _rows(
        join_group_by_chain(
            spark, out_a, out_b, out_c,
            key_a="k", key_b_a="ka", key_b_c="kc", key_c="kc",
            aggs=[("cnt", "count", None), ("sum_qty", "sum", "qty")],
        ),
        ["cnt"],
    )
    exp = _sql(con, """
        SELECT count(*) AS cnt, sum(qty) AS sum_qty
        FROM fact JOIN bridge ON k = ka JOIN dim ON bridge.kc = dim.kc""")
    assert got == exp


def test_chain_null_keys_drop_everywhere(spark, chain_tables):
    """Inner semantics: a null key at ANY hop removes the row — the
    count must equal DuckDB's, which drops them by definition."""
    from arcade_spark.readops import join_group_by_chain

    out_a, out_b, out_c, con = chain_tables
    got = _rows(
        join_group_by_chain(
            spark, out_a, out_b, out_c,
            key_a="k", key_b_a="ka", key_b_c="kc", key_c="kc",
            aggs=[("cnt", "count", None)],
            group_c=["region"],
        ),
        ["region"],
    )
    exp = _sql(con, """
        SELECT region, count(*) AS cnt
        FROM fact JOIN bridge ON k = ka JOIN dim ON bridge.kc = dim.kc
        GROUP BY region ORDER BY region""")
    assert got == exp


def test_chain_rejects_b_side_aggs(spark, chain_tables):
    from arcade_spark.readops import join_group_by_chain

    out_a, out_b, out_c, _ = chain_tables
    with pytest.raises(ValueError, match="side A"):
        join_group_by_chain(
            spark, out_a, out_b, out_c,
            key_a="k", key_b_a="ka", key_b_c="kc", key_c="kc",
            aggs=[("s", "sum", "qty", "b")],
        )
