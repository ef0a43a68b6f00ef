"""Query CLI (arcade_spark/jobs/query_job.py) — the read-side
spark-submit surface (the reference's runner CLI analogue)."""

from __future__ import annotations

import argparse

from arcade_spark.encode import encode_job


def _ns(**kw):
    if kw.get("cmd") == "filter":
        for k in ("value", "lo", "hi", "in_list", "prefix", "contains",
                  "suffix", "like", "sample"):
            kw.setdefault(k, None)
    return argparse.Namespace(**kw)


def test_query_job_subcommands(spark, tmp_path_factory):
    import arcade_spark.jobs.query_job as qj

    src = spark.createDataFrame(
        [(f"u{i:03d}", ["en", "de", "fr"][i % 3], i) for i in range(90)],
        "url string, lang string, x long",
    )
    out = str(tmp_path_factory.mktemp("qj") / "enc")
    encode_job(spark, src, out, num_parts=2, block_rows=16)

    df = qj.build_query(spark, _ns(cmd="scan", encoded=out, columns="url,lang"))
    assert df.count() == 90 and df.columns == ["url", "lang"]

    df = qj.build_query(spark, _ns(cmd="filter", encoded=out, column="lang",
                                   value="de", lo=None, hi=None, in_list=None,
                                   project="url", count_only=False))
    assert df.count() == 30

    # CLI literals coerce to the column's type (x is long)
    df = qj.build_query(spark, _ns(cmd="filter", encoded=out, column="x",
                                   value=None, lo="10", hi="19", in_list=None,
                                   project="url", count_only=False))
    assert df.count() == 10

    df = qj.build_query(spark, _ns(cmd="random-access", encoded=out,
                                   ids="0,5,89", project="url"))
    assert sorted(r["row_id"] for r in df.collect()) == [0, 5, 89]

    df = qj.build_query(spark, _ns(cmd="group-count", encoded=out, column="lang"))
    assert {r["lang"]: r["cnt"] for r in df.collect()} == {"en": 30, "de": 30, "fr": 30}

    df = qj.build_query(spark, _ns(cmd="minmax", encoded=out, column="x"))
    row = df.collect()[0]
    assert (row["min_v"], row["max_v"], row["cnt"]) == (0, 89, 90)

    df = qj.build_query(spark, _ns(cmd="topk", encoded=out, column="x", k=3, asc=False))
    assert sorted(r["v"] for r in df.collect()) == [87, 88, 89]

    df = qj.build_query(spark, _ns(cmd="agg", encoded=out, column="x"))
    row = df.collect()[0]
    assert (row["sum_v"], row["cnt_all"]) == (sum(range(90)), 90)

    df = qj.build_query(spark, _ns(cmd="filter", encoded=out, column="url",
                                   prefix="u00", project="url", count_only=False))
    assert df.count() == 10

    df = qj.build_query(spark, _ns(cmd="filter", encoded=out, column="url",
                                   contains="08", project="url", count_only=False))
    assert df.count() == 11  # u008 + u080..u089

    df = qj.build_query(spark, _ns(cmd="filter", encoded=out, column="url",
                                   suffix="7", project="url", count_only=False))
    assert df.count() == 9

    df = qj.build_query(spark, _ns(cmd="filter", encoded=out, column="url",
                                   like="u_1%", project="url", count_only=False))
    assert df.count() == 10  # u010..u019

    df = qj.build_query(spark, _ns(cmd="group-sum", encoded=out,
                                   column="lang", agg_column="x"))
    got = {r["lang"]: (r["sum_v"], r["cnt"]) for r in df.collect()}
    assert got["en"] == (sum(range(0, 90, 3)), 30)

    df = qj.build_query(spark, _ns(cmd="distinct", encoded=out,
                                   column="lang", count=False))
    assert sorted(r["lang"] for r in df.collect()) == ["de", "en", "fr"]

    df = qj.build_query(spark, _ns(cmd="distinct", encoded=out,
                                   column="lang", count=True))
    assert df.collect()[0]["n_distinct"] == 3

    df = qj.build_query(spark, _ns(cmd="group-by", encoded=out,
                                   columns="lang,url", agg_column="x"))
    assert df.count() == 90
    assert df.columns == ["lang", "url", "sum_v", "min_v", "max_v", "cnt"]


def test_query_job_main_out(spark, tmp_path_factory):
    import arcade_spark.jobs.query_job as qj

    src = spark.createDataFrame(
        [(f"u{i}", i) for i in range(20)], "url string, x long"
    )
    out = str(tmp_path_factory.mktemp("qjm") / "enc")
    encode_job(spark, src, out, num_parts=1, block_rows=8)
    res = str(tmp_path_factory.mktemp("qjm") / "res")
    rc = qj.main(["--encoded", out, "--out", res, "topk", "--column", "x", "-k", "5"])
    assert rc == 0
    assert sorted(r["v"] for r in spark.read.parquet(res).collect()) == [15, 16, 17, 18, 19]


def test_query_job_round5_subcommands(spark, tmp_path_factory):
    """orderby / group-distinct / quantiles / join --how CLI paths."""
    import arcade_spark.jobs.query_job as qj

    src = spark.createDataFrame(
        [(f"u{i:03d}", ["en", "de", "fr"][i % 3], i % 10, i) for i in range(60)],
        "url string, lang string, g long, x long",
    )
    out = str(tmp_path_factory.mktemp("qj5") / "enc")
    encode_job(spark, src, out, num_parts=2, block_rows=16)

    df = qj.build_query(spark, argparse.Namespace(
        cmd="orderby", encoded=out, columns="x", project="url,x", desc=False))
    rows = sorted((r["pos"], r["x"]) for r in df.collect())
    assert rows[0] == (0, 0) and rows[-1] == (59, 59)

    df = qj.build_query(spark, argparse.Namespace(
        cmd="group-distinct", encoded=out, columns="lang",
        distinct_column="g"))
    got = {r["lang"]: r["n_distinct"] for r in df.collect()}
    assert got == {"en": 10, "de": 10, "fr": 10}

    df = qj.build_query(spark, argparse.Namespace(
        cmd="quantiles", encoded=out, column="x", q="0.5", ranks=None))
    assert df.collect()[0]["v"] == 29  # floor(0.5*59)

    df = qj.build_query(spark, argparse.Namespace(
        cmd="quantiles", encoded=out, column="x", q=None, ranks="0,59"))
    assert sorted(r["v"] for r in df.collect()) == [0, 59]

    out2 = str(tmp_path_factory.mktemp("qj5") / "enc2")
    encode_job(spark, spark.createDataFrame(
        [(f"d{i}", i, f"L{i}") for i in range(5)],
        "url2 string, k long, label string"),
        out2, num_parts=1, block_rows=8, order_col="url2")
    df = qj.build_query(spark, argparse.Namespace(
        cmd="join", encoded=out, right=out2, key="g", right_key="k",
        project="url", right_project="label", how="left"))
    assert df.count() == 60
    assert df.filter("label IS NULL").count() == 30  # g in 5..9 unmatched


def test_query_job_round6_subcommands(spark, tmp_path_factory):
    """asof / topn / sessionize / rolling CLI paths."""
    import arcade_spark.jobs.query_job as qj

    src = spark.createDataFrame(
        [(f"e{i:03d}", i % 5, i * 10, i % 7) for i in range(60)],
        "ev string, uid long, t long, v long",
    )
    out = str(tmp_path_factory.mktemp("qj6") / "enc")
    encode_job(spark, src, out, num_parts=2, block_rows=16, order_col="ev")

    # asof: self-join, every left row matches itself (exact allowed)
    df = qj.build_query(spark, argparse.Namespace(
        cmd="asof", encoded=out, right=out, on="t", right_on=None,
        by="uid", project=None, right_project="v", how="inner",
        direction="backward", strict=False, tolerance=None))
    rows = df.collect()
    assert len(rows) == 60
    assert all(r["t_b"] == r["t"] for r in rows)

    # topn: 2 smallest t per uid
    df = qj.build_query(spark, argparse.Namespace(
        cmd="topn", encoded=out, by="uid", order="t", n=2,
        project="ev", desc=False, directions=None))
    got = sorted((r["uid"], r["rn"], r["ev"]) for r in df.collect())
    assert len(got) == 10
    assert got[0] == (0, 1, "e000") and got[1] == (0, 2, "e005")

    # sessionize: consecutive events per uid are 50 apart -> gap 49
    # splits every event into its own session
    df = qj.build_query(spark, argparse.Namespace(
        cmd="sessionize", encoded=out, by="uid", ts="t", gap=49,
        emit="sessions"))
    assert df.count() == 60
    df = qj.build_query(spark, argparse.Namespace(
        cmd="sessionize", encoded=out, by="uid", ts="t", gap=50,
        emit="sessions"))
    assert df.count() == 5  # one session per uid

    # rolling: window covers the previous event of the same uid
    df = qj.build_query(spark, argparse.Namespace(
        cmd="rolling", encoded=out, by="uid", ts="t", window=50,
        agg_column="v", aggs="count,sum"))
    rows = {(r["uid"], r["t"]): (r["w_count"], r["w_sum"])
            for r in df.collect()}
    assert len(rows) == 60
    assert rows[(0, 0)] == (1, 0)          # e000: v=0
    assert rows[(0, 50)][0] == 2           # e005 sees e000


def test_query_job_round7_subcommands(spark, tmp_path_factory):
    """lag / rollup / cumulative rolling / nearest asof CLI paths."""
    import arcade_spark.jobs.query_job as qj

    src = spark.createDataFrame(
        [(f"e{i:03d}", i % 5, i * 10, i % 7) for i in range(60)],
        "ev string, uid long, t long, v long",
    )
    out = str(tmp_path_factory.mktemp("qj7") / "enc")
    encode_job(spark, src, out, num_parts=2, block_rows=16, order_col="ev")

    # lag: previous v within uid ordered by t
    df = qj.build_query(spark, argparse.Namespace(
        cmd="lag", encoded=out, by="uid", order="t", value="v",
        offset=1, lead=False))
    rows = {(r["uid"], r["t"]): r["shifted"] for r in df.collect()}
    assert rows[(0, 0)] is None
    assert rows[(0, 50)] == 0  # e005 lags to e000's v

    # rollup: grand total + per-uid counts
    df = qj.build_query(spark, argparse.Namespace(
        cmd="rollup", encoded=out, columns="uid", sum="v",
        sets="rollup", where=None))
    got = {(r["uid"], r["grouping_id"]): (r["cnt"], r["sum_v"])
           for r in df.collect()}
    assert got[(None, 1)] == (60, sum(i % 7 for i in range(60)))
    assert got[(0, 0)][0] == 12
    from arcade_spark.readops import release_key_caches

    release_key_caches()

    # cumulative rolling (window omitted)
    df = qj.build_query(spark, argparse.Namespace(
        cmd="rolling", encoded=out, by="uid", ts="t", window=None,
        agg_column="v", aggs="count,max"))
    rows = {(r["uid"], r["t"]): (r["w_count"], r["w_max"])
            for r in df.collect()}
    assert rows[(0, 550)][0] == 12  # last event sees all 12

    # nearest asof: self-join matches itself at distance 0
    df = qj.build_query(spark, argparse.Namespace(
        cmd="asof", encoded=out, right=out, on="t", right_on=None,
        by="uid", project=None, right_project=None, how="inner",
        direction="nearest", strict=False, tolerance=None))
    assert all(r["t_b"] == r["t"] for r in df.collect())


def test_query_job_pivot(spark, tmp_path_factory):
    import arcade_spark.jobs.query_job as qj

    src = spark.createDataFrame(
        [(f"e{i:03d}", ["a", "b"][i % 2], ["x", "y", "z"][i % 3], i)
         for i in range(60)],
        "ev string, g string, p string, v long",
    )
    out = str(tmp_path_factory.mktemp("qjp") / "enc")
    encode_job(spark, src, out, num_parts=2, block_rows=16, order_col="ev")
    df = qj.build_query(spark, argparse.Namespace(
        cmd="pivot", encoded=out, columns="g", pivot="p",
        values=None, sum="v"))
    rows = {r["g"]: r for r in df.collect()}
    exp = {(g, p): (0, 0) for g in "ab" for p in "xyz"}
    for i in range(60):
        g, p = "ab"[i % 2], "xyz"[i % 3]
        c, s = exp[(g, p)]
        exp[(g, p)] = (c + 1, s + i)
    for g in "ab":
        for p in "xyz":
            assert rows[g][f"{p}_cnt"] == exp[(g, p)][0]
            assert rows[g][f"{p}_sum_v"] == exp[(g, p)][1]
    from arcade_spark.readops import release_key_caches

    release_key_caches()
