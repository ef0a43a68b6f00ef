"""Capture .explain('formatted') for every round-8-touched query into
plans/r08/<query>_<tag>.txt.

    python tools/capture_plans_r08.py <tag> [outdir]

Run with tag=before from a worktree at the round-start commit and
tag=after from HEAD. Uses the encoded tables bench.py leaves under
/tmp (run bench.py once first). Building a DataFrame may run the
driver-side stats/carry actions of the split paths — that is part of
the plan being documented.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r08",
    )
    os.makedirs(outdir, exist_ok=True)

    from arcade_spark.manifest import FORMAT_REV
    from arcade_spark.session import get_spark

    spark = get_spark(app="plans-r08", cores="32")
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode

    def enc(table: str) -> str:
        n = 8 if table == "customer" else 32
        return os.path.join(
            tempfile.gettempdir(), f"arcade_bench_{table}_v{FORMAT_REV}_0.1_{n}"
        )

    skew = os.path.join(
        tempfile.gettempdir(), f"arcade_bench_skew_v{FORMAT_REV}_0.1_32"
    )

    def dump(name: str, df_fn) -> None:
        try:
            df = df_fn() if callable(df_fn) else df_fn
        except TypeError as e:
            # e.g. the before-tree lacks window_shift's hot_key_threshold
            print(f"skip {name}: {e}")
            return
        plan = df._jdf.queryExecution().explainString(
            jvm_mode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('MapInArrow')} MapInArrow)")
        from arcade_spark.readops import release_key_caches

        release_key_caches()

    from arcade_spark.readops import (
        equi_filter,
        join_asof,
        join_encoded,
        orderby_export,
        pivot_table,
        rolling_agg,
        sessionize,
        top_per_key,
        window_shift,
    )

    li, orr, ev = enc("lineitem"), enc("orders"), enc("events")
    zipf, unif = os.path.join(skew, "zipf"), os.path.join(skew, "unif")

    dump("orderby_lineitem", orderby_export(
        spark, li, ["l_shipdate", "l_orderkey", "l_linenumber"],
        ["l_orderkey", "l_linenumber", "l_shipdate"]))
    dump("orderby_mixed_3key", orderby_export(
        spark, li, ["l_shipdate", "l_orderkey", "l_linenumber"],
        ["l_orderkey", "l_linenumber", "l_shipdate"],
        desc=[True, False, True]))
    dump("join_li_orders", join_encoded(
        spark, li, orr, "l_orderkey", "o_orderkey",
        project_a=["l_linenumber", "l_quantity"],
        project_b=["o_orderpriority"],
        preds_b=[("eq", "o_orderpriority", "1-URGENT")]))
    import datetime as dt

    cut = (dt.datetime(1990, 1, 1, tzinfo=dt.timezone.utc),
           dt.datetime(1997, 6, 1, tzinfo=dt.timezone.utc))
    dump("join_semi_orders", join_encoded(
        spark, orr, li, "o_orderkey", "l_orderkey",
        project_a=["o_orderpriority"],
        preds_b=[("range", "l_shipdate", cut[0], cut[1])], how="semi"))
    dump("topn_per_user", top_per_key(
        spark, ev, "user_id", ["value", "event_id"], 3,
        project=["event_id", "event_type"], desc=[True, False]))
    dump("window_lag_value", window_shift(
        spark, ev, "user_id", ["ts", "event_id"], "value"))
    dump("window_lag_skew_split", lambda: window_shift(
        spark, zipf, "k", ["row_id"], "v", hot_key_threshold=20_000))
    dump("asof_skew_split", join_asof(
        spark, zipf, unif, "row_id", "k", project_b=["v"],
        hot_key_threshold=20_000))
    dump("sessionize_skew_split", sessionize(
        spark, zipf, "k", "row_id", gap=10, emit="sessions",
        hot_key_threshold=20_000))
    dump("rolling_skew_split", rolling_agg(
        spark, zipf, "k", "row_id", window=1000, agg_col="v",
        aggs=("count", "sum"), hot_key_threshold=20_000))
    dump("pivot_q1_status", pivot_table(
        spark, li, ["l_returnflag"], "l_linestatus",
        [("cnt", "count", None), ("sum_qty", "sum", "l_quantity")],
        pivot_values=["F", "O"]))
    xenc = os.path.join(tempfile.gettempdir(), "arcade_x_enc_0.1_32")
    if os.path.isdir(xenc):
        dump("filter_lang", equi_filter(
            spark, xenc, "lang", "el", project=["url"]))


if __name__ == "__main__":
    main()
