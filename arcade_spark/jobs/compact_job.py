"""spark-submit entry point for zero-decode compaction:

    spark-submit --py-files arcade_spark.zip arcade_spark/jobs/compact_job.py \
        --src /data/encoded --dest /data/encoded_compact --group-size 16

Merges ~group-size encode partitions into each output partition without
decoding or re-encoding any payload bytes (see arcade_spark.compact).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="arcade-spark compact job")
    p.add_argument("--src", required=True, help="encoded table to compact")
    p.add_argument("--dest", required=True, help="output dir (fresh)")
    p.add_argument("--group-size", type=int, default=8)
    p.add_argument("--columns", default=None,
                   help="comma-separated subset to keep (drops the rest)")
    p.add_argument("--cores", default=None)
    args = p.parse_args(argv)

    from arcade_spark.compact import compact_job
    from arcade_spark.session import get_spark

    spark = get_spark(app="arcade-compact", cores=args.cores)
    cols = args.columns.split(",") if args.columns else None
    stats = compact_job(spark, args.src, args.dest,
                        group_size=args.group_size, columns=cols)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
