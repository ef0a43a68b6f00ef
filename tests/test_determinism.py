"""Determinism: the encode kernel must produce byte-identical blocks
regardless of how Arrow batches happen to be chunked (Spark batch
boundaries vary with config/retries; resume, speculative execution, and
the scaling bench's byte-identical-output claim all rest on this)."""

from __future__ import annotations

import pyarrow as pa

from arcade_spark.corpus import corpus_pandas


def _run_kernel(tables, out_dir, block_rows=512):
    from arcade_spark.encode import _PART_COL, make_encode_kernel

    columns = [("url", "str"), ("warc_ts", "ts"), ("html", "binary"),
               ("text", "str"), ("lang", "str")]
    kernel = make_encode_kernel(columns, str(out_dir), "det", block_rows=block_rows)
    batches = []
    for t in tables:
        t = t.append_column(_PART_COL, pa.array([0] * t.num_rows, type=pa.int32()))
        batches.extend(t.to_batches())
    return list(kernel(iter(batches)))


def test_blocks_identical_across_batch_chunking(tmp_path):
    import pyarrow.parquet as pq

    df = corpus_pandas(3000, seed=21).sort_values("url").reset_index(drop=True)
    table = pa.Table.from_pandas(df, preserve_index=False)

    outs = []
    for name, slices in [
        ("one", [(0, 3000)]),
        ("many", [(0, 700), (700, 301), (1001, 999), (2000, 1000)]),
    ]:
        out = tmp_path / name
        _run_kernel([table.slice(s, ln) for s, ln in slices], out)
        t = pq.read_table(str(out / "blocks"))
        outs.append(
            sorted(
                zip(
                    t.column("block_id").to_pylist(),
                    t.column("column").to_pylist(),
                    t.column("blob").to_pylist(),
                )
            )
        )
    assert outs[0] == outs[1], "blocks differ across batch chunkings"
