"""Two-parallelism scaling for the READ path (decode scan + filter),
companion to tools/bench_scaling.py's encode evidence: same encoded
table, local[N] vs local[4N], A/B-interleaved reps, per-level best/
median decode GB/s and the efficiency throughput(4N)/(4·throughput(N)).

Usage: python tools/bench_read_scaling.py [corpus_rows] [n_small] [n_large] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(cores: int, enc: str, raw_bytes: int) -> dict:
    from arcade_spark.readops import equi_filter
    from arcade_spark.decode import scan
    from arcade_spark.session import get_spark

    spark = get_spark(app=f"read-scaling-{cores}", cores=cores)
    try:
        spark.range(1000).count()  # warm
        t0 = time.time()
        n = scan(spark, enc).count()
        scan_s = time.time() - t0
        t0 = time.time()
        f = equi_filter(spark, enc, "lang", "el", project=["url"]).count()
        filt_s = time.time() - t0
    finally:
        spark.stop()
    return {
        "cores": cores, "scan_seconds": round(scan_s, 2),
        "scan_gbps": round(raw_bytes / scan_s / 1e9, 4),
        "filter_seconds": round(filt_s, 2), "scan_rows": n, "filter_rows": f,
    }


def main() -> None:
    from arcade_spark.corpus import write_corpus_files
    from arcade_spark.encode import encode_files_job
    from arcade_spark.session import get_spark

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 6

    corpus = os.path.join("/tmp", f"arcade_corpus_files_{rows}_32")
    write_corpus_files(corpus, rows, 32)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    enc = os.path.join(base, f"arcade_read_scaling_{rows}")
    spark = get_spark(app="read-scaling-encode", cores=8)
    m = encode_files_job(spark, corpus, enc, files_per_task=4)
    spark.stop()
    raw = m["raw_bytes"]

    runs: list[dict] = []
    for i in range(reps):
        for cores in (n_small, n_large):
            r = run_once(cores, enc, raw)
            runs.append(r)
            print(f"rep {i + 1}/{reps}:", json.dumps(r), flush=True)

    def level(cores):
        return sorted(r["scan_gbps"] for r in runs if r["cores"] == cores)

    s, l = level(n_small), level(n_large)
    factor = n_large / n_small
    out = {
        "corpus_rows": rows,
        "small_best_gbps": s[-1], "large_best_gbps": l[-1],
        "small_median_gbps": s[len(s) // 2], "large_median_gbps": l[len(l) // 2],
        "efficiency_best": round(min(l[-1] / (factor * s[-1]), 1.0), 3),
        "efficiency_median": round(
            min(l[len(l) // 2] / (factor * s[len(s) // 2]), 1.0), 3
        ),
        "runs": runs,
    }
    with open("BENCH/read_scaling.json", "w") as f:
        f.write(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}))


if __name__ == "__main__":
    main()
