"""Round-8 isolation benchmarks (guide §1.4): time individual operators
outside the frozen ``bench.py``, with noop-sink isolation where the
operator returns a DataFrame, so optimization work can be measured
query by query without re-running the full harness.

Usage:  python bench_extra.py <probe> [reps]

Probes reuse the same cached inputs bench.py builds (corpus files,
encoded testdata tables, streaming batch dirs), so run bench.py once
first. Results print one line per rep plus a min line.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    from arcade_spark.session import get_spark

    return get_spark(app="arcade-bench-extra", cores=CPUS)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _sf_tag() -> tuple[str, int]:
    sf = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    n_cores = int(CPUS) if str(CPUS).isdigit() else (os.cpu_count() or 8)
    return sf, n_cores


def _enc(table: str) -> str:
    """Path of the encoded testdata table bench.py builds (must exist)."""
    from arcade_spark.manifest import FORMAT_REV

    sf, n_cores = _sf_tag()
    p = os.path.join(
        tempfile.gettempdir(), f"arcade_bench_{table}_v{FORMAT_REV}_{sf}_{n_cores}"
    )
    if not os.path.isdir(p):
        raise SystemExit(f"{p} missing - run bench.py once first")
    return p


def probe_dedup_stream(spark, which: str = ""):
    """Replicates bench.dedup_stream_rep (4 triggers, buckets=8)."""
    from arcade_spark.manifest import FORMAT_REV
    from arcade_spark.streaming import dedup_stream

    sf, _ = _sf_tag()
    tag = "dstream4x" if which == "4x" else "dstream"
    ds_in = os.path.join(
        tempfile.gettempdir(), f"arcade_bench_{tag}_v{FORMAT_REV}_{sf}", "in"
    )
    if not os.path.isdir(ds_in):
        raise SystemExit(f"{ds_in} missing - run bench.py once first")
    run_base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    run = os.path.join(run_base, f"arcade_x_dstream_{uuid.uuid4().hex[:8]}")
    q = dedup_stream(
        spark, ds_in, os.path.join(run, "out"), os.path.join(run, "ckpt"),
        "doc_id long, text string", buckets=8,
    )
    q.awaitTermination()
    n = spark.read.parquet(os.path.join(run, "out")).count()
    shutil.rmtree(run, ignore_errors=True)
    return n


def probe_session_stream(spark):
    """Replicates bench.session_stream_rep (external 8-partition pin)."""
    from arcade_spark.manifest import FORMAT_REV
    from arcade_spark.streaming import session_counts

    sf, _ = _sf_tag()
    ss_in = os.path.join(
        tempfile.gettempdir(), f"arcade_bench_sstream_v{FORMAT_REV}_{sf}", "in"
    )
    if not os.path.isdir(ss_in):
        raise SystemExit(f"{ss_in} missing - run bench.py once first")
    run_base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    run = os.path.join(run_base, f"arcade_x_sstream_{uuid.uuid4().hex[:8]}")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = session_counts(
            spark, ss_in, os.path.join(run, "out"), os.path.join(run, "ckpt"),
            "ts timestamp, user_id long", ts_col="ts", key_col="user_id",
            gap="30 minutes", watermark="2 hours",
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    n = spark.read.parquet(os.path.join(run, "out")).count()
    shutil.rmtree(run, ignore_errors=True)
    return n


def probe_orderby(spark, mixed: bool = False):
    from arcade_spark.readops import orderby_export

    li = _enc("lineitem")
    df = orderby_export(
        spark, li, ["l_shipdate", "l_orderkey", "l_linenumber"],
        ["l_orderkey", "l_linenumber", "l_shipdate"],
        desc=[True, False, True] if mixed else False,
    )
    n = df.count()
    cache = getattr(df, "_arcade_key_cache", None)
    if cache is not None:
        cache.unpersist()
    return n


def probe_join_li_orders(spark):
    from arcade_spark.readops import join_encoded

    return join_encoded(
        spark, _enc("lineitem"), _enc("orders"), "l_orderkey", "o_orderkey",
        project_a=["l_linenumber", "l_quantity"],
        project_b=["o_orderpriority"],
        preds_b=[("eq", "o_orderpriority", "1-URGENT")]).count()


def probe_asof_skew_split(spark):
    import datetime as _dt  # noqa: F401
    from arcade_spark.manifest import FORMAT_REV
    from arcade_spark.readops import join_asof

    sf, n_cores = _sf_tag()
    skew_base = os.path.join(
        tempfile.gettempdir(), f"arcade_bench_skew_v{FORMAT_REV}_{sf}_{n_cores}"
    )
    return join_asof(
        spark, os.path.join(skew_base, "zipf"), os.path.join(skew_base, "unif"),
        "row_id", "k", project_b=["v"], hot_key_threshold=20_000).count()


def probe_sessionize_skew_split(spark):
    from arcade_spark.manifest import FORMAT_REV
    from arcade_spark.readops import sessionize

    sf, n_cores = _sf_tag()
    skew_base = os.path.join(
        tempfile.gettempdir(), f"arcade_bench_skew_v{FORMAT_REV}_{sf}_{n_cores}"
    )
    return sessionize(
        spark, os.path.join(skew_base, "zipf"), "k", "row_id",
        gap=10, emit="sessions", hot_key_threshold=20_000).count()


def probe_window_lag_skew_split(spark):
    """LAG over the 25%-hot zipf key with the split forced (round-8:
    window_shift's hot-key escape hatch, the r7 verdict perf-weak
    item) — comparable to the other *_skew_split probes."""
    from arcade_spark.manifest import FORMAT_REV
    from arcade_spark.readops import window_shift

    sf, n_cores = _sf_tag()
    skew_base = os.path.join(
        tempfile.gettempdir(), f"arcade_bench_skew_v{FORMAT_REV}_{sf}_{n_cores}"
    )
    return window_shift(
        spark, os.path.join(skew_base, "zipf"), "k", ["row_id"], "v",
        hot_key_threshold=20_000).count()


def probe_filter_lang(spark):
    from arcade_spark.readops import equi_filter

    sf, n_cores = _sf_tag()
    corpus_rows = max(int(2_000_000 * float(sf)), 5000)
    # re-encode into a scratch dir once (bench deletes its enc dir)
    enc = os.path.join(tempfile.gettempdir(), f"arcade_x_enc_{sf}_{n_cores}")
    if not os.path.isdir(enc):
        from arcade_spark.corpus import write_corpus_files
        from arcade_spark.encode import encode_files_job

        corpus = os.path.join(
            tempfile.gettempdir(),
            f"arcade_corpus_files_{corpus_rows}_{2 * n_cores}",
        )
        write_corpus_files(corpus, corpus_rows, 2 * n_cores)
        encode_files_job(spark, corpus, enc, resume=False)
    return equi_filter(spark, enc, "lang", "el", project=["url"]).count()


PROBES = {
    "dedup_stream": lambda s: probe_dedup_stream(s),
    "dedup_stream_4x": lambda s: probe_dedup_stream(s, "4x"),
    "session_stream": probe_session_stream,
    "orderby": lambda s: probe_orderby(s),
    "orderby_mixed": lambda s: probe_orderby(s, mixed=True),
    "join_li_orders": probe_join_li_orders,
    "asof_skew_split": probe_asof_skew_split,
    "sessionize_skew_split": probe_sessionize_skew_split,
    "window_lag_skew_split": probe_window_lag_skew_split,
    "filter_lang": probe_filter_lang,
}


def main():
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = _spark()
    fn = PROBES[name]
    fn(spark)  # warm (page cache, JVM, python workers)
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(spark)
        walls.append(time.time() - t0)
        print(f"{name}: {walls[-1]:.3f}s  (result={out})", flush=True)
    print(f"{name}: min={min(walls):.3f}s over {reps} reps")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
