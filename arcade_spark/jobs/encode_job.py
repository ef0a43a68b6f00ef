"""spark-submit entry point for the encode pipeline.

    spark-submit --py-files arcade_spark.zip arcade_spark/jobs/encode_job.py \
        --input /data/corpus --out /data/encoded --mode files

(locally, plain `python arcade_spark/jobs/encode_job.py ...` works too —
get_spark ships the package to workers.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="arcade-spark encode job")
    p.add_argument("--input", required=True, help="source parquet dir/file or csv")
    p.add_argument("--out", required=True, help="encode out_dir (blocks/ + manifest/)")
    p.add_argument("--mode", choices=["files", "shuffle"], default="files")
    p.add_argument("--num-parts", type=int, default=32, help="shuffle mode partitions")
    p.add_argument("--order-col", default="url")
    p.add_argument("--salt-buckets", type=int, default=8)
    p.add_argument("--block-rows", type=int, default=None)
    p.add_argument("--cores", default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--csv", action="store_true", help="input is CSV with header")
    p.add_argument("--json", dest="json_in", action="store_true",
                   help="input is line-delimited JSON")
    args = p.parse_args(argv)

    from arcade_spark import BLOCK_ROWS
    from arcade_spark.encode import encode_files_job, encode_job
    from arcade_spark.session import get_spark

    spark = get_spark(app="arcade-encode", cores=args.cores)
    block_rows = args.block_rows or BLOCK_ROWS
    if args.csv and args.json_in:
        raise SystemExit("--csv and --json are mutually exclusive")
    if args.mode == "files" and not (args.csv or args.json_in):
        metrics = encode_files_job(
            spark, args.input, args.out, block_rows=block_rows,
            resume=not args.no_resume,
        )
    else:
        if args.csv:
            src = spark.read.csv(args.input, header=True, inferSchema=True, escape='"')
        elif args.json_in:
            src = spark.read.json(args.input)
        else:
            src = spark.read.parquet(args.input)
        metrics = encode_job(
            spark, src, args.out, num_parts=args.num_parts,
            order_col=args.order_col, salt_buckets=args.salt_buckets,
            block_rows=block_rows, resume=not args.no_resume,
        )
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
