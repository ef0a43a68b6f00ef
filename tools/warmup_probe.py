"""One-off probe: does warming PYTHON workers (not just the JVM) before
the timed encode close the local[1] vs local[4] scaling gap?

Usage: python tools/warmup_probe.py [warm|cold] [cores] [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def py_warmup(spark, cores: int) -> float:
    """Spawn + warm `cores` python workers: one tiny mapInArrow task per
    core whose kernel imports the encode-path modules."""
    import pyarrow as pa

    def k(batches):
        import numpy  # noqa: F401

        from arcade_spark import convert, encode  # noqa: F401
        from arcade_spark.codecs import intcodecs, strcodecs  # noqa: F401

        for b in batches:
            yield pa.RecordBatch.from_pylist([{"x": 1}], schema=pa.schema([("x", pa.int64())]))

    t0 = time.time()
    rdd = spark.sparkContext.parallelize([(i,) for i in range(cores * 2)], cores * 2)
    spark.createDataFrame(rdd, "x long").mapInArrow(k, schema="x long").count()
    return time.time() - t0


def main() -> None:
    warm = sys.argv[1] == "warm"
    cores = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    corpus = "/tmp/arcade_corpus_files_4000000_32"

    from arcade_spark.encode import encode_files_job
    from arcade_spark.session import get_spark

    spark = get_spark(app=f"probe-{cores}", cores=cores)
    src_files = corpus
    spark.read.parquet(corpus).limit(1000).count()
    if warm:
        wt = py_warmup(spark, cores)
        print(f"py_warmup took {wt:.2f}s", flush=True)
    for i in range(reps):
        out = os.path.join("/dev/shm", f"probe_{uuid.uuid4().hex[:8]}")
        t0 = time.time()
        m = encode_files_job(spark, src_files, out, resume=False, files_per_task=4)
        wall = time.time() - t0
        shutil.rmtree(out, ignore_errors=True)
        print(f"cores={cores} warm={warm} rep={i} wall={wall:.2f} "
              f"gbps={m['raw_bytes']/wall/1e9:.4f} kernel={m['kernel_seconds']:.2f}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
