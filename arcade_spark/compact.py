"""Zero-decode compaction: merge many small encoded partitions into
fewer large ones WITHOUT re-encoding any payload bytes.

The small-files problem is the dominant operational cost of a
partitioned format at 10^12 rows (millions of encode partitions from
streaming micro-batches or per-file tasks → per-task overhead and
metadata pressure on every read). Because this format keeps all
cross-block state in the chunk metadata (dictionary resets/seeds,
``row_start`` offsets), a merged partition is just the CONCATENATION of
its sources' chunk rows with three metadata adjustments:

- ``block_id`` renumbered sequentially across the group;
- ``row_start`` shifted by the cumulative row count of preceding parts;
- ``gdict_reset`` forced TRUE on each appended part's first chunk, so
  the replayed dictionary state starts fresh exactly where the original
  partition's encoder did — decoders already handle resets, so every
  reader works on compacted output unchanged.

Payload ``blob``/``seg`` bytes are copied verbatim (parquet column
reads — no decode, no re-compression), so compaction runs at IO speed
and the decoded table is bit-identical by construction.

Reference parity note: ARCADE has one file per run (no compaction
surface); this operator exists for the Spark-scale layout where
partition count is an independent knob (README.md:115-131 scope).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import SparkSession

from arcade_spark.manifest import (
    BLOCKS_ARROW_SCHEMA,
    FORMAT_REV,
    MANIFEST_ARROW_SCHEMA,
    blocks_path,
    manifest_path,
)


def _compact_group(
    src_dir: str,
    dest_dir: str,
    new_pid: int,
    src_pids: list[int],
    columns: list[tuple[str, str]],
    run_id: str,
) -> dict:
    """Merge one group of source partitions into dest partition
    ``new_pid``. Runs inside a task; commits blocks files then the
    manifest marker (same atomic protocol as PartWriter)."""
    os.makedirs(os.path.join(dest_dir, "blocks"), exist_ok=True)
    os.makedirs(os.path.join(dest_dir, "manifest"), exist_ok=True)

    n_rows_total = 0
    n_blocks_total = -1
    raw_bytes = 0
    encoded_bytes = 0
    codec_counts: dict[str, int] = {}
    tmps: list[tuple[str, str]] = []

    try:
        for col, _vt in columns:
            pieces = []
            blk_off = 0
            row_off = 0
            for i, spid in enumerate(src_pids):
                t = pq.read_table(blocks_path(src_dir, spid, col))
                n = t.num_rows
                bid = t.column("block_id").to_numpy(zero_copy_only=False)
                if n > 1 and not bool(np.all(np.diff(bid) > 0)):
                    raise ValueError(f"part {spid} col {col}: not in block order")
                t = t.set_column(
                    t.schema.get_field_index("part_id"), "part_id",
                    pa.array(np.full(n, new_pid, dtype=np.int32)),
                )
                t = t.set_column(
                    t.schema.get_field_index("block_id"), "block_id",
                    pa.array((bid + blk_off).astype(np.int32)),
                )
                rs = t.column("row_start").to_numpy(zero_copy_only=False)
                t = t.set_column(
                    t.schema.get_field_index("row_start"), "row_start",
                    pa.array((rs + row_off).astype(np.int64)),
                )
                if i > 0 and n > 0:
                    # appended part: its first chunk must reset the
                    # replayed dictionary to the fresh state its encoder
                    # actually started from
                    gr = t.column("gdict_reset").to_numpy(zero_copy_only=False).copy()
                    gr[0] = True
                    t = t.set_column(
                        t.schema.get_field_index("gdict_reset"), "gdict_reset",
                        pa.array(gr.astype(bool)),
                    )
                pieces.append(t)
                blk_off += n
                part_rows = int(
                    np.sum(t.column("n_values").to_numpy(zero_copy_only=False))
                )
                row_off += part_rows
            merged = pa.concat_tables(pieces).cast(BLOCKS_ARROW_SCHEMA)
            tmp = os.path.join(
                dest_dir, "blocks",
                f".tmp-{new_pid:05d}-{col}-{uuid.uuid4().hex[:8]}.parquet",
            )
            w = pq.ParquetWriter(
                tmp, BLOCKS_ARROW_SCHEMA,
                compression={"blob": "none", "seg": "zstd"},
            )
            # mirror PartWriter's 16-chunk row groups so payload fetches
            # stay row-group-prunable
            for start in range(0, merged.num_rows, 16):
                w.write_table(merged.slice(start, 16))
            w.close()
            tmps.append((tmp, blocks_path(dest_dir, new_pid, col)))
            if n_blocks_total not in (-1, merged.num_rows):
                raise ValueError(
                    f"column {col!r}: block count {merged.num_rows} != "
                    f"{n_blocks_total} of earlier columns — corrupt source"
                )
            n_blocks_total = merged.num_rows
            if n_rows_total not in (0, row_off):
                raise ValueError(
                    f"column {col!r}: row count {row_off} != {n_rows_total} "
                    f"of earlier columns — corrupt source"
                )
            n_rows_total = row_off
            raw_bytes += int(np.sum(merged.column("raw_bytes").to_numpy(zero_copy_only=False)))
            encoded_bytes += int(np.sum(merged.column("encoded_bytes").to_numpy(zero_copy_only=False)))
            for c in merged.column("codec").to_pylist():
                codec_counts[c] = codec_counts.get(c, 0) + 1
        for tmp, final in tmps:
            os.replace(tmp, final)
    except Exception:
        for tmp, _ in tmps:
            if os.path.exists(tmp):
                os.remove(tmp)
        raise

    row = {
        "part_id": new_pid,
        "n_blocks": n_blocks_total,
        "n_cols": len(columns),
        "n_rows": n_rows_total,
        "raw_bytes": raw_bytes,
        "encoded_bytes": encoded_bytes,
        "encode_seconds": 0.0,
        "throughput_mbps": 0.0,
        "codec_counts": json.dumps(codec_counts, sort_keys=True),
        "columns": json.dumps([list(c) for c in columns]),
        "run_id": run_id,
        "status": "done",
        "format_rev": FORMAT_REV,
        "mode": "compact",
        "num_parts": 0,
        "salt_buckets": 0,
        "order_col": "",
        "source": json.dumps(src_pids),
    }
    mtmp = os.path.join(
        dest_dir, "manifest", f".tmp-{new_pid:05d}-{uuid.uuid4().hex[:8]}.parquet"
    )
    pq.write_table(pa.Table.from_pylist([row], schema=MANIFEST_ARROW_SCHEMA), mtmp)
    os.replace(mtmp, manifest_path(dest_dir, new_pid))
    return {"part_id": new_pid, "n_rows": n_rows_total, "n_blocks": n_blocks_total}


def compact_job(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    group_size: int = 8,
    columns: list[str] | None = None,
) -> dict:
    """Compact ``src_dir`` (any completed encode output) into
    ``dest_dir`` with ~``group_size``× fewer partitions. One task per
    OUTPUT partition; consecutive source parts merge in part-id order,
    so global row order (and therefore ``random_access`` row ids) is
    preserved exactly. Idempotent under retries (deterministic bytes +
    atomic marker commit).

    ``columns`` projects the output table to a subset — the cheap way
    to DROP heavy columns after they've served their purpose (e.g. raw
    html once text is extracted): untouched columns' files never open."""
    from arcade_spark.partread import load_manifest

    if group_size < 1:
        raise ValueError("group_size must be >= 1")
    mdir = os.path.join(dest_dir, "manifest")
    if os.path.isdir(mdir) and os.listdir(mdir):
        raise ValueError(
            f"{dest_dir}: manifest dir is not empty — compaction writes a "
            f"fresh table; mixing groups from different runs would corrupt "
            f"row ids (use a new dest_dir)"
        )
    all_columns, parts = load_manifest(src_dir)
    if columns is None:
        columns = all_columns
    else:
        by_name = dict(all_columns)
        missing = [c for c in columns if c not in by_name]
        if missing:
            raise KeyError(f"no such column(s): {missing}")
        # keep source order
        keep = set(columns)
        columns = [(n, v) for n, v in all_columns if n in keep]
    pids = [p for p, _ in parts]
    groups = [pids[i: i + group_size] for i in range(0, len(pids), group_size)]
    run_id = uuid.uuid4().hex
    items = list(enumerate(groups))
    rdd = spark.sparkContext.parallelize(items, max(1, len(items)))
    results = rdd.map(
        lambda it: _compact_group(src_dir, dest_dir, it[0], it[1], columns, run_id)
    ).collect()
    return {
        "parts_in": len(pids),
        "parts_out": len(results),
        "n_rows": sum(r["n_rows"] for r in results),
    }
