"""Structured Streaming encode: drain a directory of corpus files with
availableNow, then verify the encoded table round-trips; a second run
with the same checkpoint is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from arcade_spark.corpus import CORPUS_SPARK_SCHEMA, write_corpus_files
from arcade_spark.decode import scan
from arcade_spark.manifest import completed_parts
from arcade_spark.streaming import encode_stream


def test_stream_encode_roundtrip(spark, tmp_path_factory):
    src_dir = str(tmp_path_factory.mktemp("stream") / "in")
    write_corpus_files(src_dir, 3000, 3, seed=5)
    out = str(tmp_path_factory.mktemp("stream") / "enc")
    ckpt = str(tmp_path_factory.mktemp("stream") / "ckpt")

    q = encode_stream(spark, src_dir, out, ckpt, CORPUS_SPARK_SCHEMA,
                      parts_per_batch=4, block_rows=512)
    assert q.awaitTermination(600), "stream did not terminate in 600s"
    assert completed_parts(out), "no partitions committed by the stream"

    src = spark.read.parquet(src_dir)
    dec = scan(spark, out)
    assert dec.count() == 3000
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0

    # restart with same checkpoint: nothing new to process
    before = completed_parts(out)
    q2 = encode_stream(spark, src_dir, out, ckpt, CORPUS_SPARK_SCHEMA,
                       parts_per_batch=4, block_rows=512)
    assert q2.awaitTermination(600), "restarted stream did not terminate in 600s"
    assert completed_parts(out) == before


def test_dedup_stream_cross_batch_state(spark, tmp_path_factory):
    """applyInPandasWithState dedup: duplicates arriving in LATER
    micro-batches (maxFilesPerTrigger=1 → one batch per file) are
    dropped by the carried state; first occurrences survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from arcade_spark.streaming import dedup_stream

    src_dir = str(tmp_path_factory.mktemp("dstream") / "in")
    import os

    os.makedirs(src_dir)
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    # file 1: docs 0-9 (text t0..t9); file 2: docs 10-14 repeat t0-t4,
    # docs 15-17 are new
    pq.write_table(
        pa.table({"doc_id": list(range(10)),
                  "text": [f"t{i}" for i in range(10)]}, schema=schema),
        f"{src_dir}/f1.parquet",
    )
    pq.write_table(
        pa.table({"doc_id": list(range(10, 18)),
                  "text": [f"t{i % 5}" for i in range(5)] + ["t15", "t16", "t17"]},
                 schema=schema),
        f"{src_dir}/f2.parquet",
    )
    # the file source orders micro-batches by modification time; pin
    # mtimes so f1 ALWAYS precedes f2 (a tie under suite load flips the
    # batch order and different rows survive the dedup)
    import time as _time

    now = _time.time()
    os.utime(f"{src_dir}/f1.parquet", (now - 60, now - 60))
    os.utime(f"{src_dir}/f2.parquet", (now, now))
    out = str(tmp_path_factory.mktemp("dstream") / "out")
    ckpt = str(tmp_path_factory.mktemp("dstream") / "ckpt")
    q = dedup_stream(spark, src_dir, out, ckpt,
                     "doc_id long, text string", buckets=8)
    # availableNow terminates on its own; assert it actually did (a
    # silent timeout under suite load reads partial output otherwise)
    assert q.awaitTermination(600), "stream did not terminate in 600s"
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == set(range(10)) | {15, 16, 17}

    # restart on the same checkpoint: no new input, no new rows
    q2 = dedup_stream(spark, src_dir, out, ckpt,
                      "doc_id long, text string", buckets=8)
    assert q2.awaitTermination(600), "restarted stream did not terminate in 600s"
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == got


def test_window_counts_watermark(spark, tmp_path_factory):
    """Windowed streaming counts (round-5): tumbling 1h windows, 2h
    watermark, time-ordered replay + sentinel. A LATE row (arrives one
    batch after its window, but inside the allowance) must still
    count; every real window is emitted exactly once."""
    import datetime as dt
    import os

    import pandas as pd

    from arcade_spark.streaming import window_counts

    base = tmp_path_factory.mktemp("wc")
    inp, outp, ckpt = (str(base / d) for d in ("in", "out", "ckpt"))
    os.makedirs(inp)
    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)

    def rows(specs):
        return pd.DataFrame(
            {"ts": [t0 + dt.timedelta(minutes=m) for m, _ in specs],
             "event_type": [e for _, e in specs]}
        )

    # batch 0: window 10:00 (3 rows), window 11:00 (1 row)
    b0 = rows([(0, "a"), (10, "a"), (40, "b"), (70, "a")])
    # batch 1: later events + ONE LATE row for window 10:00 (ts 10:50,
    # watermark after b0 = 11:10 - 2h = 9:10 < 10:50 → counted)
    b1 = rows([(130, "b"), (150, "a"), (50, "a")])
    # sentinel closes everything
    b2 = rows([(60 * 24 * 30, "__sentinel")])
    for k, b in enumerate((b0, b1, b2)):
        f = os.path.join(inp, f"batch{k:02d}.parquet")
        b["ts"] = b["ts"].astype("datetime64[us]")  # Spark reads µs
        b.to_parquet(f, index=False)
        os.utime(f, (1_600_000_000 + k, 1_600_000_000 + k))

    q = window_counts(spark, inp, outp, ckpt,
                      "ts timestamp, event_type string",
                      ts_col="ts", key_col="event_type")
    q.awaitTermination()
    got = {
        (r["window_start"].strftime("%H:%M"), r["event_type"]): r["cnt"]
        for r in spark.read.parquet(outp).collect()
    }
    assert got == {
        ("10:00", "a"): 3,  # includes the late 10:50 row from batch 1
        ("10:00", "b"): 1,
        ("11:00", "a"): 1,
        ("12:00", "b"): 1,
        ("12:00", "a"): 1,
    }


def test_session_counts_cross_batch_merge(spark, tmp_path_factory):
    """Session windows (round-6): a session that SPANS a micro-batch
    boundary merges in the state store; an event exactly gap-apart
    still merges (closed-interval contract, same as batch sessionize);
    watermark + sentinel close every real session exactly once."""
    import datetime as dt
    import os

    import pandas as pd

    from arcade_spark.streaming import session_counts

    base = tmp_path_factory.mktemp("sc")
    inp, outp, ckpt = (str(base / d) for d in ("in", "out", "ckpt"))
    os.makedirs(inp)
    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)

    def rows(specs):
        return pd.DataFrame(
            {"ts": [t0 + dt.timedelta(minutes=m) for m, _ in specs],
             "uid": [u for _, u in specs]}
        )

    # gap = 10 min. u1: events at 0, 10 (exactly gap → same session),
    # 25 (15 min later → session crosses INTO batch 1 via state merge?
    # no — 25-10=15 > 10 → new session); u1's second session continues
    # in batch 1 at 30 (25→30 = 5 ≤ gap: cross-batch merge).
    b0 = rows([(0, "u1"), (10, "u1"), (25, "u1"), (0, "u2")])
    b1 = rows([(30, "u1"), (60, "u2")])
    b2 = rows([(60 * 24 * 30, "__sentinel")])
    for k, b in enumerate((b0, b1, b2)):
        f = os.path.join(inp, f"batch{k:02d}.parquet")
        b["ts"] = b["ts"].astype("datetime64[us]")
        b.to_parquet(f, index=False)
        os.utime(f, (1_600_000_000 + k, 1_600_000_000 + k))

    q = session_counts(spark, inp, outp, ckpt,
                       "ts timestamp, uid string",
                       ts_col="ts", key_col="uid",
                       gap="10 minutes", watermark="2 hours")
    q.awaitTermination()
    got = {
        (r["uid"], r["session_start"].strftime("%H:%M")):
            (r["session_end"].strftime("%H:%M"), r["n_events"])
        for r in spark.read.parquet(outp).collect()
    }
    assert got == {
        ("u1", "10:00"): ("10:20", 2),  # 0 + 10 merge (exactly gap)
        ("u1", "10:25"): ("10:40", 2),  # 25 + 30 merge ACROSS batches
        ("u2", "10:00"): ("10:10", 1),
        ("u2", "11:00"): ("11:10", 1),
    }
