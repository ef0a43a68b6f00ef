"""Files-mode read path: per-partition tasks reading their own encoded
column files with pyarrow IN-PROCESS — the read-side mirror of
``encode_files_job`` (the 100 TB fast path).

Why this exists (and is the default): the encoded table is one parquet
file per (partition, column) (manifest.PartWriter), so every read
operator can be expressed as "each task owns one partition's files":

    driver: manifest read (tiny) → assignment list [(part_id,)]
      → sc.parallelize(items, len(items))      [1:1, no balls-in-bins]
      → mapInArrow(part kernel)                [pyarrow reads, numpy prune]

vs the plan-mode pipeline (kept as ``mode="plan"`` in readops/decode):

    JVM parquet scan → zone filter → repartition shuffle → Arrow IPC
    → python kernel

Measured on this class of workload, the JVM→Python Arrow IPC alone
costs ~13 ns/byte/core — 3× the decode kernels — and plan mode adds a
shuffle of the blob bytes plus (for filters) a second metadata scan +
broadcast join for the per-block verdict. Files mode removes all three:

- **zero shuffle** for scan / filter / random_access (group_count keeps
  one O(distinct) partial-merge shuffle);
- **zone pruning in numpy** on the chunk-metadata columns (a few KB per
  partition — parquet column pruning reads no payload bytes);
- **match-level late materialization**: projection blobs are fetched
  (by parquet row group) only for blocks with actual filter MATCHES —
  strictly tighter than the plan-mode zone-level verdict;
- dictionary replay still ships segments only (seg column reads).

At cluster scale the same shape holds: Spark distributes part ids with
retries/locality, tasks read their own files from shared storage
(pyarrow.fs handles s3://..., hdfs://...), and no row data ever crosses
the JVM.

Reference parity: the per-part kernel IS ArcadeReader's single-file
loop (reader.cpp:7-195) — zone prune (process.cpp:256-273), previndex
segment replay (process.cpp:88-123), late materialization
(process.cpp:4-180) — distributed by partition.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

from arcade_spark.manifest import FORMAT_REV, blocks_path

# chunk-metadata columns (everything but blob/seg): reading these per
# column file touches KB, not payload bytes
_META_COLS = [
    "block_id", "codec", "post", "n_values", "row_start", "code_width",
    "global_start", "gdict_reset", "gdict_seed", "min_bin", "max_bin",
    "min_exact", "max_exact", "min_int", "max_int", "n_nulls",
]


# aggregate-column lanes ------------------------------------------------
#
# Integer-family columns aggregate natively (int64 partial sums are
# exact in any order — the original cross-engine contract). double/
# float agg columns aggregate in a FIXED-POINT domain: each value maps
# to q(x) = floor(x·scale + 0.5) (one IEEE multiply, one add, one floor
# — bit-identical in Spark, numpy, and DuckDB), q sums/mins/maxes
# exactly as int64 (q is monotone, so min/max commute with it), and the
# single output division q/scale is one correctly-rounded IEEE op. For
# fixed-decimal data (money at scale=100 — the TPC-H Q1 shape) this IS
# the exact DECIMAL answer; data with more precision than the scale is
# aggregated at scale precision BY CONTRACT. Non-finite values or
# |x·scale| ≥ 2^62 raise rather than overflow silently.
AGG_SCALE = 100
_AGG_VTS = ("int", "i32", "i16", "i8", "double", "float")
_AGG_GUARD = (
    "aggregates accept integer-family and double/float columns only "
    "(doubles use the fixed-point contract, see partread.AGG_SCALE; "
    "ts/date/bool sums are meaningless)"
)


def quantized_agg_lane(
    values: np.ndarray, validity: np.ndarray | None, avt: str,
    scale: int = AGG_SCALE,
) -> np.ndarray:
    """int64 aggregate lane for one decoded block: identity for the
    integer family; fixed-point floor(x·scale + 0.5) for double/float.
    Invalid slots are zeroed first so masked-out junk can't poison the
    finiteness check."""
    if avt not in ("double", "float"):
        return values
    f = values.view(np.float64)
    if validity is not None:
        f = f.copy()
        f[~validity] = 0.0
    qf = np.floor(f * float(scale) + 0.5)
    if not np.isfinite(qf).all() or (np.abs(qf) >= 2.0 ** 62).any():
        raise ValueError(
            f"double aggregate overflow/non-finite at scale {scale}: the "
            "fixed-point contract requires finite values with |x*scale| < 2^62"
        )
    return qf.astype(np.int64)


def load_manifest(out_dir: str) -> tuple[list[tuple[str, str]], list[tuple[int, int]]]:
    """((name, vtype) list, [(part_id, n_rows)] sorted) from the manifest
    directory — driver-side pyarrow, no Spark job. Validates FORMAT_REV
    exactly like decode._manifest_meta."""
    mdir = os.path.join(out_dir, "manifest")
    t = pq.read_table(mdir, columns=["part_id", "n_rows", "columns", "format_rev"])
    revs = set(t.column("format_rev").to_pylist())
    bad = revs - {FORMAT_REV}
    if bad or not revs:
        raise ValueError(
            f"{out_dir}: manifest format_rev {sorted(bad)} != reader "
            f"FORMAT_REV {FORMAT_REV} — re-encode the table"
        )
    cols = [tuple(c) for c in json.loads(t.column("columns")[0].as_py())]
    # zero-row partitions commit a manifest marker but no column files
    # (an empty source file in files mode) — they carry no data and no
    # dictionary state, so every reader skips them
    parts = sorted(
        (p, n)
        for p, n in zip(t.column("part_id").to_pylist(), t.column("n_rows").to_pylist())
        if n > 0
    )
    return cols, parts


def _assign_df(spark: SparkSession, part_ids: list[int]) -> DataFrame:
    """Deterministic part→task assignment via parallelize slicing (never
    hash-repartition — balls-in-bins leaves slots empty). Slice count
    (round-8, guide §2.2/§6 "fewer, larger tasks"): each Python task
    costs a measurable constant (~5 ms dispatch + Arrow handshake on
    this box — a bare 64-task python job is 0.47 s while the same
    kernel work in-process is 0.05 s), so tasks get ≥2 parts whenever
    that still fills the cluster; with many parts the old cap of 4×
    parallelism keeps contiguous runs per task (straggler balance),
    and with fewer parts than cores it stays 1:1. All three regimes
    derive from defaultParallelism, never a constant."""
    items = [(int(p),) for p in part_ids]
    par = spark.sparkContext.defaultParallelism
    slices = max(1, min(len(items), max(par, min(len(items) // 2, 4 * par))))
    rdd = spark.sparkContext.parallelize(items, slices)
    return spark.createDataFrame(rdd, "part_id int")


class _ColMeta:
    """Numpy view over one column file's chunk-metadata rows (one row
    per block, in block order)."""

    def __init__(self, tbl: pa.Table):
        import pyarrow.compute as pc

        self.n = tbl.num_rows
        self.block_id = tbl.column("block_id").to_numpy(zero_copy_only=False)
        if self.n > 1 and not bool(np.all(np.diff(self.block_id) > 0)):
            raise ValueError("column file rows not in block order")
        self.codec = tbl.column("codec").to_pylist()
        self.post = tbl.column("post").to_pylist()
        self.n_values = tbl.column("n_values").to_numpy(zero_copy_only=False).astype(np.int64)
        self.row_start = tbl.column("row_start").to_numpy(zero_copy_only=False).astype(np.int64)
        self.code_width = tbl.column("code_width").to_numpy(zero_copy_only=False)
        self.global_start = tbl.column("global_start").to_numpy(zero_copy_only=False)
        self.gdict_reset = tbl.column("gdict_reset").to_numpy(zero_copy_only=False).astype(bool)
        self.gdict_seed = tbl.column("gdict_seed").to_numpy(zero_copy_only=False).astype(bool)
        self.n_nulls = tbl.column("n_nulls").to_numpy(zero_copy_only=False).astype(np.int64)
        mi, ma = tbl.column("min_int"), tbl.column("max_int")
        self.has_zone = (
            pc.and_(pc.is_valid(mi), pc.is_valid(ma)).to_numpy(zero_copy_only=False)
        ).astype(bool)
        self.min_int = mi.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        self.max_int = ma.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        self.min_bin = tbl.column("min_bin").to_pylist()
        self.max_bin = tbl.column("max_bin").to_pylist()
        self.min_exact = tbl.column("min_exact").to_numpy(zero_copy_only=False).astype(bool)
        self.max_exact = tbl.column("max_exact").to_numpy(zero_copy_only=False).astype(bool)
        self.stateful = np.array(
            [c == "dict_global" for c in self.codec], dtype=bool
        ) | self.gdict_seed

    def meta_dict(self, i: int, seg=b"") -> dict:
        return {
            "codec": self.codec[i],
            "post": self.post[i],
            "n_values": int(self.n_values[i]),
            "code_width": int(self.code_width[i]),
            "global_start": int(self.global_start[i]),
            "gdict_reset": bool(self.gdict_reset[i]),
            "gdict_seed": bool(self.gdict_seed[i]),
            "seg": seg,
        }


class _ColFile:
    """One (part, column) parquet file: tiny metadata read + row-group-
    pruned payload fetches (the parquet analogue of ARCADE's per-chunk
    offsets — reader seeks only touched chunks, reader.cpp:113-143)."""

    def __init__(self, out_dir: str, part_id: int, column: str):
        self.path = blocks_path(out_dir, part_id, column)
        self.pf = pq.ParquetFile(self.path)
        md = self.pf.metadata
        rg_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        self.rg_off = np.concatenate([[0], np.cumsum(rg_rows)]).astype(np.int64)

    def meta(self) -> _ColMeta:
        return _ColMeta(self.pf.read(columns=_META_COLS))

    def _take_rows(self, idx: np.ndarray, columns: list[str]) -> pa.Table:
        """Rows ``idx`` (sorted ascending) of ``columns``, reading only
        the row groups that contain them."""
        which = np.searchsorted(self.rg_off, idx, side="right") - 1
        rgs = np.unique(which)
        tbl = self.pf.read_row_groups([int(r) for r in rgs], columns=columns)
        sel_sizes = self.rg_off[rgs + 1] - self.rg_off[rgs]
        sel_start = np.concatenate([[0], np.cumsum(sel_sizes)])
        pos = sel_start[np.searchsorted(rgs, which)] + (idx - self.rg_off[which])
        return tbl.take(pa.array(pos, type=pa.int64()))

    def payloads(self, idx: np.ndarray, column: str) -> dict[int, memoryview]:
        """{block_row_index: payload memoryview} for the given rows of
        ``blob`` or ``seg`` — zero-copy views into the fetched buffer."""
        from arcade_spark.decode import _binary_views

        idx = np.asarray(idx, dtype=np.int64)
        if len(idx) == 0:
            return {}
        tbl = self._take_rows(idx, [column])
        arr = tbl.column(column).combine_chunks()
        off, mv = _binary_views(arr)
        return {int(r): mv[off[j]: off[j + 1]] for j, r in enumerate(idx)}


def _zone_keep_np(pred, cm: _ColMeta) -> np.ndarray:
    """Per-block zone verdict for one compiled predicate (numpy twin of
    readops._Pred.zone_keep_expr). Missing zone info ⇒ keep (pruning is
    an optimization, never a correctness gate).

    Negated predicates prune only when the zone PROVES every valid row
    matches the inner predicate (complement = empty): a single-key zone
    equal to an eq/IN target, or a zone contained in the inner range.
    Zones exclude nulls (FORMAT_REV 8), and nulls never satisfy a
    negation either, so the proof covers exactly the candidate rows."""
    if pred.kind in ("contains", "suffix", "sample") or (
        pred.negated and pred.kind in ("prefix", "like")
    ):
        # contains/suffix/sample: any value can match regardless of
        # zone bounds; negated prefix/like: the all-match proof over
        # truncated prefixes is subtle — never prune
        return np.ones(cm.n, dtype=bool)
    if pred.kind == "like" and pred.lob is None:
        # pattern starts with a wildcard: no literal prefix to prune on
        return np.ones(cm.n, dtype=bool)
    if pred.kind in ("prefix", "like"):
        keep = np.ones(cm.n, dtype=bool)
        for i in range(cm.n):
            mb, xb = cm.min_bin[i], cm.max_bin[i]
            # hib = exclusive upper bound of the prefix range (None for
            # an all-0xFF pattern: unbounded above)
            if pred.hib is not None and mb is not None and pred.hib < mb:
                keep[i] = False
            elif xb is not None and cm.max_exact[i] and pred.lob > xb:
                keep[i] = False
        return keep
    if pred.negated:
        if pred.is_str:
            keep = np.ones(cm.n, dtype=bool)
            for i in range(cm.n):
                mb, xb = cm.min_bin[i], cm.max_bin[i]
                if mb is None or xb is None:
                    continue
                if pred.kind in ("eq", "in"):
                    targets = (
                        [pred.lob] if pred.kind == "eq" else pred.in_vals
                    )
                    if (cm.min_exact[i] and cm.max_exact[i]
                            and mb == xb and mb in targets):
                        keep[i] = False
                else:  # range containment: true min ≥ lo even when the
                    # min prefix is truncated (prefix ≤ true min); the
                    # max side needs exactness
                    if mb >= pred.lob and cm.max_exact[i] and xb <= pred.hib:
                        keep[i] = False
            return keep
        if pred.kind in ("eq", "in"):
            keys = np.array(pred.target_keys(), dtype=np.int64)
            prune = (cm.min_int == cm.max_int) & np.isin(cm.min_int, keys)
        else:
            prune = (cm.min_int >= pred.zone_lo) & (cm.max_int <= pred.zone_hi)
        return ~(prune & cm.has_zone)
    if pred.is_str:
        keep = np.ones(cm.n, dtype=bool)
        for i in range(cm.n):
            mb, xb = cm.min_bin[i], cm.max_bin[i]
            if mb is not None and pred.hib < mb:
                keep[i] = False
            elif xb is not None and cm.max_exact[i] and pred.lob > xb:
                keep[i] = False
        return keep
    prune = (pred.zone_hi < cm.min_int) | (pred.zone_lo > cm.max_int)
    return ~(prune & cm.has_zone)


def _out_schema(proj_items: list[tuple[str, str]], lead: list[pa.Field] | None = None) -> pa.Schema:
    from arcade_spark.decode import _out_arrow_type

    return pa.schema(
        (lead or []) + [pa.field(n, _out_arrow_type(v)) for n, v in proj_items]
    )


_EMPTY = np.empty(0, dtype=np.int64)


def _filter_part_batches(
    out_dir: str,
    pid: int,
    conjuncts: list[list],
    proj_items: list[tuple[str, str]],
    count_only: bool,
    agg_item: tuple[str, str] | None = None,
) -> Iterator[pa.RecordBatch]:
    """Run the whole filter for ONE partition: predicate pass (zone
    prune → kernel match on kept blocks, dict replay on the rest) then
    match-level projection decode. All IO is row-group-pruned pyarrow.

    The predicate tree is DISJUNCTIVE NORMAL FORM: ``conjuncts`` is an
    OR of AND-lists of compiled _Pred objects (a plain conjunction is
    one conjunct; a flat disjunction is singleton conjuncts). Per
    block: a conjunct is ALIVE iff every one of its predicates' zones
    admits the block; a block is scanned for a column iff any alive
    conjunct has a predicate on it; match positions intersect within a
    conjunct and union across conjuncts. Each predicate occurrence owns
    an independent dictionary-replay state, so repeated columns across
    conjuncts are fine."""
    from arcade_spark.convert import block_to_arrow
    from arcade_spark.core import (
        decode_int_block,
        decode_str_positions,
        replay_str_block,
    )
    from arcade_spark.decode import _out_arrow_type
    from arcade_spark.gdict import GlobalDictDecoder

    pos_of, nb, blk, cfs, cms = _part_match_positions(out_dir, pid, conjuncts)

    if count_only:
        zskip = ~blk
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.full(nb, pid, dtype=np.int32)),
                pa.array(cms[next(iter(cms))].block_id.astype(np.int32)),
                pa.array(np.array([len(p) for p in pos_of], dtype=np.int64)),
                pa.array(zskip.astype(np.int32)),
            ],
            schema=pa.schema(
                [pa.field("part_id", pa.int32()), pa.field("block_id", pa.int32()),
                 pa.field("matches", pa.int64()), pa.field("zone_skipped", pa.int32())]
            ),
        )
        return

    matched = [b for b in range(nb) if len(pos_of[b])]

    if agg_item is not None:
        # fused filter+aggregate: decode ONLY the agg column, ONLY at
        # matched positions, and emit one integer partial per part —
        # matched rows never materialize
        name, avt, agg_scale = agg_item
        acf = cfs.get(name) or _ColFile(out_dir, pid, name)
        acm = cms.get(name) or acf.meta()
        if acm.n != nb:
            raise ValueError(f"column {name!r}: block count mismatch in part {pid}")
        blobs = acf.payloads(np.asarray(matched, dtype=np.int64), "blob")
        s = 0
        mn = mx = None
        cv = 0
        cr = 0
        for b in matched:
            ib = decode_int_block(blobs[b], acm.meta_dict(b))
            pos = pos_of[b]
            cr += len(pos)
            v = ib.values[pos]
            if ib.validity is not None:
                v = v[ib.validity[pos]]
            v = quantized_agg_lane(v, None, avt, agg_scale)
            if len(v):
                s += int(v.sum())
                bmn, bmx = int(v.min()), int(v.max())
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
                cv += len(v)
        yield pa.RecordBatch.from_arrays(
            [pa.array([s], type=pa.int64()),
             pa.array([mn], type=pa.int64()),
             pa.array([mx], type=pa.int64()),
             pa.array([cv], type=pa.int64()),
             pa.array([cr], type=pa.int64())],
            names=["s", "mn", "mx", "cv", "cr"],
        )
        return

    if not matched or not proj_items:
        return
    last_m = matched[-1]
    matched_mask = np.zeros(nb, dtype=bool)
    matched_mask[matched] = True

    # ---- projection pass: decode matched positions only ----
    schema = _out_schema(proj_items)
    col_arrays: dict[str, dict[int, pa.Array]] = {}
    for name, vt in proj_items:
        cf = cfs.get(name) or _ColFile(out_dir, pid, name)
        cm = cms.get(name) or cf.meta()
        if cm.n != nb:
            raise ValueError(f"column {name!r}: block count mismatch in part {pid}")
        out: dict[int, pa.Array] = {}
        if vt in ("str", "binary"):
            rng = np.arange(nb)
            seg_rows = np.nonzero((cm.stateful | matched_mask) & (rng <= last_m))[0]
            segs = cf.payloads(seg_rows, "seg")
            blobs = cf.payloads(np.asarray(matched, dtype=np.int64), "blob")
            gdec = GlobalDictDecoder()
            for b in range(last_m + 1):
                meta = cm.meta_dict(b, segs.get(b, b""))
                if matched_mask[b]:
                    blkd = decode_str_positions(blobs[b], meta, pos_of[b], gdec)
                    out[b] = block_to_arrow(blkd, vt).cast(_out_arrow_type(vt))
                else:
                    replay_str_block(meta, gdec)
        else:
            blobs = cf.payloads(np.asarray(matched, dtype=np.int64), "blob")
            for b in matched:
                iblock = decode_int_block(blobs[b], cm.meta_dict(b))
                pos = pos_of[b]
                from arcade_spark.blocks import IntBlock

                sub = IntBlock(
                    values=iblock.values[pos],
                    validity=None if iblock.validity is None else iblock.validity[pos],
                )
                out[b] = block_to_arrow(sub, vt).cast(_out_arrow_type(vt))
        col_arrays[name] = out

    for b in matched:
        yield pa.RecordBatch.from_arrays(
            [col_arrays[n][b] for n, _ in proj_items], schema=schema
        )


def _part_match_positions(
    out_dir: str, pid: int, conjuncts: list[list]
) -> tuple[list[np.ndarray], int, np.ndarray, dict, dict]:
    """The DNF predicate pass for ONE partition: returns (per-block
    match positions, block count, per-block zone-alive mask, open
    _ColFile handles, their _ColMeta) so filter / fused-aggregate /
    fused-group-by kernels share one implementation."""
    from arcade_spark.core import decode_int_block

    # ---- group predicate OCCURRENCES by column, zone verdicts ----
    occs: list[tuple[int, object]] = [
        (j, p) for j, conj in enumerate(conjuncts) for p in conj
    ]
    col_occs: dict[str, list[tuple[int, object]]] = {}
    for j, p in occs:
        col_occs.setdefault(p.column, []).append((j, p))
    cfs: dict[str, _ColFile] = {}
    cms: dict[str, _ColMeta] = {}
    zk: dict[int, np.ndarray] = {}
    nb = None
    for c, plist in col_occs.items():
        cfs[c] = _ColFile(out_dir, pid, c)
        cms[c] = cfs[c].meta()
        if nb is None:
            nb = cms[c].n
        elif cms[c].n != nb:
            raise ValueError(f"column {c!r}: block count mismatch in part {pid}")
        for _, p in plist:
            if id(p) not in zk:
                zk[id(p)] = _zone_keep_np(p, cms[c])
    assert nb is not None
    # conjunct alive per block = AND of its predicates' zone verdicts
    alive = np.ones((len(conjuncts), nb), dtype=bool)
    for j, conj in enumerate(conjuncts):
        for p in conj:
            alive[j] &= zk[id(p)]
    blk = alive.any(axis=0)

    # ---- predicate pass: per-(conjunct, block) position intersections ----
    acc: list[list[np.ndarray | None]] = [
        [None] * nb for _ in conjuncts
    ]  # None = no pred folded yet

    def fold(j: int, b: int, pos_c: np.ndarray) -> None:
        cur = acc[j][b]
        if cur is None:
            acc[j][b] = pos_c
        else:
            acc[j][b] = (
                np.intersect1d(cur, pos_c, assume_unique=True)
                if len(cur) and len(pos_c)
                else _EMPTY
            )

    for c, plist in col_occs.items():
        cm, cf = cms[c], cfs[c]
        # scan a block for this column iff any conjunct with a pred on
        # it is alive there
        scan = np.zeros(nb, dtype=bool)
        for j, _p in plist:
            scan |= alive[j]
        idxs = np.nonzero(scan)[0]
        last = int(idxs[-1]) if len(idxs) else -1
        is_str = plist[0][1].is_str
        if is_str:
            rng = np.arange(nb)
            seg_rows = np.nonzero((cm.stateful | scan) & (rng <= last))[0]
            blobs = cf.payloads(idxs, "blob")
            segs = cf.payloads(seg_rows, "seg")
            states = [(j, p, p.new_state()) for j, p in plist]
            from arcade_spark.readops import _complement_positions

            for b in range(last + 1):
                meta = cm.meta_dict(b, segs.get(b, b""))
                blob = blobs.get(b)
                for j, p, st in states:
                    # each state owns an independent replay decoder, so
                    # every occurrence consumes every block exactly once
                    if alive[j][b] and blob is not None:
                        pos_c = st.match_positions(blob, meta)
                        if p.negated:
                            pos_c = _complement_positions(
                                pos_c, blob, meta["n_values"]
                            )
                    else:
                        st.replay(meta)
                        pos_c = _EMPTY
                    fold(j, b, pos_c)
        else:
            blobs = cf.payloads(idxs, "blob")
            for b in idxs:
                iblock = decode_int_block(blobs[int(b)], cm.meta_dict(int(b)))
                for j, p in plist:
                    if alive[j][int(b)]:
                        fold(j, int(b), p.int_positions(iblock))
                    else:
                        fold(j, int(b), _EMPTY)
        # dead-conjunct blocks contribute empty for this column
        for j, _p in plist:
            for b in np.nonzero(~alive[j])[0]:
                fold(j, int(b), _EMPTY)

    # union across conjuncts per block
    pos_of: list[np.ndarray] = []
    for b in range(nb):
        parts_b = [a[b] for a in acc if a[b] is not None and len(a[b])]
        if not parts_b:
            pos_of.append(_EMPTY)
        elif len(parts_b) == 1:
            pos_of.append(parts_b[0])
        else:
            pos_of.append(np.unique(np.concatenate(parts_b)))

    return pos_of, nb, blk, cfs, cms


def filter_parts(
    spark: SparkSession,
    out_dir: str,
    preds_spec: list[tuple[str, tuple]] | None = None,
    project: list[str] | None = None,
    count_only: bool = False,
    combine: str = "and",
    dnf_spec: list[list[tuple[str, tuple]]] | None = None,
    agg_col: str | None = None,
    agg_scale: int = AGG_SCALE,
) -> DataFrame:
    """Files-mode filter driver. Predicate forms:

    - ``preds_spec`` + ``combine="and"``: conjunction (at most one
      predicate per column);
    - ``preds_spec`` + ``combine="or"``: flat disjunction (repeats
      allowed);
    - ``dnf_spec``: full disjunctive normal form — OR of AND-lists
      (each inner list is a conjunction; columns may repeat anywhere).

    All three lower to the same DNF kernel."""
    from arcade_spark.readops import _Pred
    from arcade_spark.schema import spark_type_for

    if (preds_spec is None) == (dnf_spec is None):
        raise ValueError("pass exactly one of preds_spec / dnf_spec")
    if combine not in ("and", "or"):
        raise ValueError(f"combine must be 'and' or 'or': {combine!r}")
    columns, parts = load_manifest(out_dir)
    all_cols = dict(columns)

    if dnf_spec is not None:
        raw_conjs = dnf_spec
    elif combine == "and":
        raw_conjs = [preds_spec]
    else:
        raw_conjs = [[pc] for pc in preds_spec]

    seen: set[str] = set()
    conjuncts: list[list[_Pred]] = []
    for conj in raw_conjs:
        if not conj:
            raise ValueError("empty conjunct")
        conj_cols: set[str] = set()
        compiled = []
        for column, pred in conj:
            if column not in all_cols:
                raise KeyError(f"no such column: {column}")
            if column in conj_cols:
                raise ValueError(
                    f"multiple predicates on {column!r} within one conjunct "
                    "not supported"
                )
            conj_cols.add(column)
            seen.add(column)
            compiled.append(_Pred(column, all_cols[column], pred))
        conjuncts.append(compiled)

    agg_item: tuple[str, str] | None = None
    if agg_col is not None:
        if count_only:
            raise ValueError("agg_col and count_only are mutually exclusive")
        avt = all_cols.get(agg_col)
        if avt is None:
            raise KeyError(f"no such column: {agg_col}")
        if avt not in _AGG_VTS:
            raise NotImplementedError(f"filter_agg {_AGG_GUARD}")
        agg_item = (agg_col, avt, agg_scale)

    if count_only or agg_item is not None:
        proj_items: list[tuple[str, str]] = []
    else:
        names = project if project is not None else [
            c for c, _ in columns if c not in seen
        ]
        proj_items = [(c, all_cols[c]) for c in names]

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                yield from _filter_part_batches(
                    out_dir, int(pid), conjuncts, proj_items, count_only,
                    agg_item=agg_item,
                )

    if count_only:
        ddl = "part_id int, block_id int, matches long, zone_skipped int"
    elif agg_item is not None:
        ddl = "s long, mn long, mx long, cv long, cr long"
    else:
        ddl = ", ".join(f"{n} {spark_type_for(v)}" for n, v in proj_items)
    return _assign_df(spark, [p for p, _ in parts]).mapInArrow(kernel, schema=ddl)


def scan_parts(
    spark: SparkSession,
    out_dir: str,
    columns: list[str] | None = None,
    emit_meta: bool = False,
) -> DataFrame:
    """Files-mode full scan: each task decodes its partition's column
    files in block order, streaming one RecordBatch per block (the
    reference's coroutine paging — generator.h:44-60)."""
    from arcade_spark.schema import spark_type_for

    all_cols, parts = load_manifest(out_dir)
    sel = [(n, v) for n, v in all_cols if columns is None or n in columns]

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                yield from _scan_part_batches(out_dir, int(pid), sel, emit_meta)

    ddl = ", ".join(
        (["part_id int", "block_id int", "pos long"] if emit_meta else [])
        + [f"{n} {spark_type_for(v)}" for n, v in sel]
    )
    return _assign_df(spark, [p for p, _ in parts]).mapInArrow(kernel, schema=ddl)


def _scan_part_batches(
    out_dir: str, pid: int, sel: list[tuple[str, str]], emit_meta: bool
) -> Iterator[pa.RecordBatch]:
    from arcade_spark.convert import block_to_arrow
    from arcade_spark.core import decode_int_block, decode_str_block
    from arcade_spark.decode import _binary_views, _out_arrow_type
    from arcade_spark.gdict import GlobalDictDecoder

    cfs = [(n, v, _ColFile(out_dir, pid, n)) for n, v in sel]
    n_rgs = {cf.pf.metadata.num_row_groups for _, _, cf in cfs}
    if len(n_rgs) != 1:
        raise ValueError(f"part {pid}: row-group count differs across columns")
    meta_fields = (
        [pa.field("part_id", pa.int32()), pa.field("block_id", pa.int32()),
         pa.field("pos", pa.int64())] if emit_meta else []
    )
    schema = _out_schema(sel, lead=meta_fields)
    gdecs: dict[str, GlobalDictDecoder] = {}
    for rg in range(next(iter(n_rgs))):
        views = []
        rows = None
        for n, v, cf in cfs:
            tbl = cf.pf.read_row_group(rg, columns=_META_COLS + ["blob", "seg"])
            cm = _ColMeta(tbl)
            b_off, b_mv = _binary_views(tbl.column("blob").combine_chunks())
            s_off, s_mv = _binary_views(tbl.column("seg").combine_chunks())
            views.append((n, v, cm, b_off, b_mv, s_off, s_mv))
            rows = cm.n
        for i in range(rows):
            arrays = []
            nvals = None
            bid = None
            for n, v, cm, b_off, b_mv, s_off, s_mv in views:
                meta = cm.meta_dict(i, s_mv[s_off[i]: s_off[i + 1]])
                blob = b_mv[b_off[i]: b_off[i + 1]]
                if v in ("str", "binary"):
                    gdec = gdecs.setdefault(n, GlobalDictDecoder())
                    blk = decode_str_block(blob, meta, gdec)
                else:
                    blk = decode_int_block(blob, meta)
                arr = block_to_arrow(blk, v).cast(_out_arrow_type(v))
                arrays.append(arr)
                nvals = len(arr)
                bid = int(cm.block_id[i])
            if emit_meta:
                arrays = [
                    pa.array(np.full(nvals, pid, dtype=np.int32)),
                    pa.array(np.full(nvals, bid, dtype=np.int32)),
                    pa.array(np.arange(nvals, dtype=np.int64)),
                ] + arrays
            yield pa.RecordBatch.from_arrays(arrays, schema=schema)


def random_access_parts(
    spark: SparkSession,
    out_dir: str,
    row_ids: list[int],
    project: list[str] | None = None,
) -> DataFrame:
    """Files-mode point lookup: tasks launch ONLY for touched
    partitions, read metadata, then fetch exactly the touched blocks'
    blobs (+ stateful segs before them) — reader.cpp:69-143."""
    from arcade_spark.readops import _random_access_targets
    from arcade_spark.schema import spark_type_for

    all_cols, _parts = load_manifest(out_dir)
    if project is not None:
        all_cols = [(n, v) for n, v in all_cols if n in project]
    targets = _random_access_targets(out_dir, row_ids)
    touched = sorted(targets)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                yield from _ra_part_batches(
                    out_dir, int(pid), targets[int(pid)], all_cols
                )

    ddl = "row_id long, " + ", ".join(
        f"{n} {spark_type_for(v)}" for n, v in all_cols
    )
    return _assign_df(spark, touched).mapInArrow(kernel, schema=ddl)


def _ra_part_batches(
    out_dir: str, pid: int, local, all_cols: list[tuple[str, str]]
) -> Iterator[pa.RecordBatch]:
    """``local``: (lps, rids) int64 arrays or a list of (lp, rid)
    pairs. Rows are emitted grouped by block in ascending local-
    position order (round-8: fully vectorized — the previous per-row
    Python grouping loop dominated large materializations, measured
    1.7 s of a 2.2 s 200k-row attach join)."""
    from arcade_spark.blocks import IntBlock
    from arcade_spark.convert import block_to_arrow
    from arcade_spark.core import (
        decode_int_block,
        decode_str_positions,
        replay_str_block,
    )
    from arcade_spark.decode import _out_arrow_type
    from arcade_spark.gdict import GlobalDictDecoder

    if isinstance(local, tuple):
        lps_in, rids_in = local
        lps_in = np.asarray(lps_in, dtype=np.int64)
        rids_in = np.asarray(rids_in, dtype=np.int64)
    else:
        lps_in = np.array([p for p, _ in local], dtype=np.int64)
        rids_in = np.array([r for _, r in local], dtype=np.int64)
    if len(lps_in) == 0:
        return

    first = _ColFile(out_dir, pid, all_cols[0][0])
    cm0 = first.meta()
    nb = cm0.n
    ends = cm0.row_start + cm0.n_values
    # sort by local position: block index is monotone in lp, so the
    # sorted stream is grouped by block with in-block positions
    # ascending (what the decode kernels require) — one argsort, no
    # per-row Python
    order = np.argsort(lps_in, kind="stable")
    lps = lps_in[order]
    rids = rids_in[order]
    blocks = np.searchsorted(ends, lps, side="right").astype(np.int64)
    starts = np.concatenate([[0], np.nonzero(np.diff(blocks))[0] + 1])
    stops = np.concatenate([starts[1:], [len(blocks)]])
    target_blocks = blocks[starts]
    pos_all = lps - cm0.row_start[blocks]
    last_t = int(target_blocks[-1])
    tmask = np.zeros(nb, dtype=bool)
    tmask[target_blocks] = True
    span = {int(b): (int(s), int(e))
            for b, s, e in zip(target_blocks, starts, stops)}

    schema = _out_schema(all_cols, lead=[pa.field("row_id", pa.int64())])
    decoded: dict[str, dict[int, pa.Array]] = {}
    for name, vt in all_cols:
        cf = first if name == all_cols[0][0] else _ColFile(out_dir, pid, name)
        cm = cm0 if name == all_cols[0][0] else cf.meta()
        out: dict[int, pa.Array] = {}
        blobs = cf.payloads(target_blocks, "blob")
        if vt in ("str", "binary"):
            rng = np.arange(nb)
            seg_rows = np.nonzero((cm.stateful | tmask) & (rng <= last_t))[0]
            segs = cf.payloads(seg_rows, "seg")
            gdec = GlobalDictDecoder()
            for b in range(last_t + 1):
                meta = cm.meta_dict(b, segs.get(b, b""))
                if not tmask[b]:
                    replay_str_block(meta, gdec)
                    continue
                s0, e0 = span[b]
                blkd = decode_str_positions(blobs[b], meta, pos_all[s0:e0], gdec)
                out[b] = block_to_arrow(blkd, vt).cast(_out_arrow_type(vt))
        else:
            for b in (int(x) for x in target_blocks):
                s0, e0 = span[b]
                pos = pos_all[s0:e0]
                iblock = decode_int_block(blobs[b], cm.meta_dict(b))
                sub = IntBlock(
                    values=iblock.values[pos],
                    validity=None if iblock.validity is None else iblock.validity[pos],
                )
                out[b] = block_to_arrow(sub, vt).cast(_out_arrow_type(vt))
        decoded[name] = out

    for b in (int(x) for x in target_blocks):
        s0, e0 = span[b]
        yield pa.RecordBatch.from_arrays(
            [pa.array(rids[s0:e0], type=pa.int64())]
            + [decoded[n][b] for n, _ in all_cols], schema=schema
        )


def key_rowid_parts(
    spark: SparkSession,
    out_dir: str,
    key_col: str | list[str],
    preds_spec: list[tuple[str, tuple]] | None = None,
    keep_null_keys: bool = False,
    float_order_lane: bool = False,
) -> tuple[DataFrame, list[str]]:
    """(key..., global row id) tuples for every [predicate-matched] row
    with a fully-non-null key — the probe side of the encoded-to-encoded
    shuffle join. The kernel decodes ONLY the key column(s) (positions
    from the shared DNF predicate pass when ``preds_spec`` is given;
    zone-pruned blocks replay segments only), and each emitted row is
    (key lanes, rowid) — tens of bytes — so the join shuffle never
    carries payload columns. Global rowids come from the manifest
    prefix sums (the blocksizes index, reader.cpp:113-115) + per-block
    row_start.

    ``key_col`` may be one column or a LIST (composite join keys —
    round-5): each key column gets its own output lane ``k0..kn``
    (binary for str/binary, long otherwise). A row's key is null if
    ANY component is null (SQL composite equi-join: a null component
    makes the conjunct unknown). Integer-family and str/binary keys
    only (double keys need canonicalization the join contract doesn't
    define) — unless ``float_order_lane`` is set, which emits
    double/float columns as their ORDER-PRESERVING int64 key
    (bits.float_order_keys) instead of raising: valid for ORDER BY /
    range semantics, NOT for equality joins (-0.0 and 0.0 get distinct
    keys). ``keep_null_keys`` emits null-key rows too — they never
    equi-match but outer joins must preserve them.

    Returns (df with columns ``k0..kn, rid``, list of key vtypes)."""
    from arcade_spark.readops import _Pred

    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
    if not key_cols:
        raise ValueError("key_col must name at least one column")
    all_cols, parts = load_manifest(out_dir)
    cols = dict(all_cols)
    kvts = []
    for kc in key_cols:
        kvt = cols.get(kc)
        if kvt is None:
            raise KeyError(f"no such column: {kc}")
        if kvt in ("double", "float") and not float_order_lane:
            raise NotImplementedError(
                "join/rowid extraction on float keys is not supported "
                "(float equality is not a sane join contract)"
            )
        kvts.append(kvt)
    conjuncts = None
    if preds_spec:
        seen: set[str] = set()
        compiled = []
        for column, pred in preds_spec:
            if column not in cols:
                raise KeyError(f"no such column: {column}")
            if column in seen:
                raise ValueError(
                    f"multiple predicates on {column!r} within one "
                    "conjunct not supported"
                )
            seen.add(column)
            compiled.append(_Pred(column, cols[column], pred))
        conjuncts = [compiled]
    offsets: dict[int, int] = {}
    lo = 0
    for pid, n in parts:
        offsets[pid] = lo
        lo += n
    str_flags = [vt in ("str", "binary") for vt in kvts]

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from arcade_spark.core import (
            decode_int_block,
            decode_str_positions,
            replay_str_block,
        )
        from arcade_spark.gdict import GlobalDictDecoder

        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                pid = int(pid)
                base = offsets[pid]
                cfs = {kc: _ColFile(out_dir, pid, kc) for kc in key_cols}
                cms = {kc: cfs[kc].meta() for kc in key_cols}
                nb = cms[key_cols[0]].n
                for kc in key_cols[1:]:
                    if cms[kc].n != nb:
                        raise ValueError(
                            f"column {kc!r}: block count mismatch in part {pid}"
                        )
                if conjuncts is not None:
                    pos_of, pnb, _blk, _cfs, _cms = _part_match_positions(
                        out_dir, pid, conjuncts
                    )
                    if pnb != nb:
                        raise ValueError(
                            f"part {pid}: block count mismatch "
                            f"({key_cols} vs predicate columns)"
                        )
                else:
                    cm0 = cms[key_cols[0]]
                    pos_of = [
                        np.arange(int(cm0.n_values[b]), dtype=np.int64)
                        for b in range(nb)
                    ]
                matched = [b for b in range(nb) if len(pos_of[b])]
                if not matched:
                    continue
                last_m = matched[-1]
                midx = np.asarray(matched, dtype=np.int64)
                mmask = np.zeros(nb, dtype=bool)
                mmask[midx] = True
                rng = np.arange(nb)
                blobs = {kc: cfs[kc].payloads(midx, "blob") for kc in key_cols}
                segs, gdecs = {}, {}
                for kc, is_str in zip(key_cols, str_flags):
                    if is_str:
                        seg_rows = np.nonzero(
                            (cms[kc].stateful | mmask) & (rng <= last_m)
                        )[0]
                        segs[kc] = cfs[kc].payloads(seg_rows, "seg")
                        gdecs[kc] = GlobalDictDecoder()
                for b in range(last_m + 1):
                    if not len(pos_of[b]):
                        for kc, is_str in zip(key_cols, str_flags):
                            if is_str:
                                replay_str_block(
                                    cms[kc].meta_dict(b, segs[kc].get(b, b"")),
                                    gdecs[kc],
                                )
                        continue
                    pos = pos_of[b]
                    rids = base + int(cms[key_cols[0]].row_start[b]) + pos
                    arrays = []
                    null_any = None
                    for kc, is_str in zip(key_cols, str_flags):
                        if is_str:
                            meta = cms[kc].meta_dict(b, segs[kc].get(b, b""))
                            blkd = decode_str_positions(
                                blobs[kc][b], meta, pos, gdecs[kc]
                            )
                            arrays.append(blkd.to_arrow(binary=True))
                            valid = blkd.validity
                        else:
                            ib = decode_int_block(
                                blobs[kc][b], cms[kc].meta_dict(b)
                            )
                            valid = (None if ib.validity is None
                                     else ib.validity[pos])
                            vvals = ib.values[pos]
                            if cols[kc] in ("double", "float"):
                                from arcade_spark.bits import float_order_keys

                                # canonicalize NaN payloads FIRST: a
                                # sign-bit NaN (0xFFF8...) would map
                                # below -inf; the contract is NaN
                                # above +inf, one NaN class
                                f = vvals.view(np.float64)
                                if np.isnan(f).any():
                                    vvals = np.where(
                                        np.isnan(f),
                                        np.int64(0x7FF8000000000000),
                                        vvals,
                                    )
                                vvals = float_order_keys(vvals)
                            arrays.append(pa.array(
                                vvals, type=pa.int64(),
                                mask=None if valid is None else ~valid,
                            ))
                        if valid is not None:
                            nv = ~valid
                            null_any = nv if null_any is None else (null_any | nv)
                    if null_any is not None and not keep_null_keys:
                        keep = ~null_any
                        if not keep.any():
                            continue
                        kmask = pa.array(keep)
                        arrays = [a.filter(kmask) for a in arrays]
                        rids = rids[keep]
                    yield pa.RecordBatch.from_arrays(
                        arrays + [pa.array(rids, type=pa.int64())],
                        names=[f"k{i}" for i in range(len(key_cols))] + ["rid"],
                    )

    ddl = ", ".join(
        f"k{i} {'binary' if s else 'long'}" for i, s in enumerate(str_flags)
    ) + ", rid long"
    df = _assign_df(spark, [p for p, _ in parts]).mapInArrow(kernel, schema=ddl)
    return df, kvts


_MAT_SPLIT_ROWS = 1 << 18  # late-materialization task cap (rows per split)


def materialize_rowids_parts(
    spark: SparkSession, out_dir: str, rids: DataFrame, project: list[str],
    carry: list[str] | None = None,
) -> DataFrame:
    """Distributed late materialization: decode ``project`` columns at
    a DataFrame of global row ids (column ``rid``, assumed distinct) —
    the random-access kernel (_ra_part_batches: touched blocks' blobs
    only, seg-only replay before them) run per partition via
    applyInArrow, so no row-id set ever collects to the driver. The
    only shuffle moves (part_id, lp, rid) triples.

    ``carry`` (round-8, guide §2.4): names of extra INT64 columns of
    ``rids`` to ride the same narrow shuffle and re-attach to the
    decoded rows inside the kernel (vectorized rid→row match). A
    caller that would otherwise join the materialized rows back to its
    rid stream (two more exchanges + a sort-merge join, plus a second
    execution of the rid-producing subtree) gets the attachment for
    the cost of one extra int64 lane. Output columns: row_id,
    *carry, *project."""
    from arcade_spark.schema import spark_type_for
    from pyspark.sql import functions as F

    carry = list(carry or [])
    all_cols, parts = load_manifest(out_dir)
    missing = [c for c in project if c not in dict(all_cols)]
    if missing:
        raise KeyError(f"no such column(s): {missing}")
    cols = [(n, v) for n, v in all_cols if n in project]
    # rid → (part, local position) is a binary search over the manifest
    # prefix sums — one vectorized searchsorted per Arrow batch, NOT a
    # range join (a broadcast nested-loop would compare every rid
    # against every partition's bounds)
    pids = np.array([p for p, _ in parts], dtype=np.int32)
    offs = np.concatenate(
        [[0], np.cumsum([n for _, n in parts])]
    ).astype(np.int64)

    # secondary split key (round-5, VERDICT r4 latent finding #4): a
    # join matching most of a hot partition must not serialize its
    # whole late-materialization into one task — local positions split
    # into contiguous ranges of ≤ _MAT_SPLIT_ROWS, so task size is
    # capped and each split still touches a contiguous block range
    # (the dictionary-replay prefix it repeats is bounded by its start)
    SPLIT_ROWS = _MAT_SPLIT_ROWS

    def tag(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            r = batch.column("rid").to_numpy(zero_copy_only=False).astype(np.int64)
            if len(r) == 0:
                continue
            pi = np.searchsorted(offs, r, side="right") - 1
            if (pi < 0).any() or (pi >= len(pids)).any() or (r >= offs[pi + 1]).any():
                raise IndexError("row id out of range")
            lp = r - offs[pi]
            yield pa.RecordBatch.from_arrays(
                [pa.array(pids[pi], type=pa.int32()),
                 pa.array((lp // SPLIT_ROWS).astype(np.int32), type=pa.int32()),
                 pa.array(lp, type=pa.int64()),
                 pa.array(r, type=pa.int64())]
                + [batch.column(c).cast(pa.int64()) for c in carry],
                names=["part_id", "split", "lp", "rid"] + carry,
            )

    tagged = rids.select(["rid"] + carry).mapInArrow(
        tag,
        schema="part_id int, split int, lp long, rid long"
        + "".join(f", {c} long" for c in carry),
    )
    carry_fields = [pa.field(c, pa.int64()) for c in carry]
    out_schema = _out_schema(cols, lead=[pa.field("row_id", pa.int64())])
    full_schema = _out_schema(
        cols, lead=[pa.field("row_id", pa.int64())] + carry_fields
    )

    def fn(key: tuple, tbl: pa.Table) -> pa.Table:
        pid = int(key[0].as_py() if hasattr(key[0], "as_py") else key[0])
        lps = tbl.column("lp").to_numpy(zero_copy_only=False).astype(np.int64)
        rr = tbl.column("rid").to_numpy(zero_copy_only=False).astype(np.int64)
        batches = list(_ra_part_batches(out_dir, pid, (lps, rr), cols))
        out = pa.Table.from_batches(batches, schema=out_schema)
        if not carry:
            return out
        # re-attach carried lanes: rids are distinct, so a sorted
        # searchsorted maps each output row_id back to its input row
        order = np.argsort(rr, kind="stable")
        out_rid = out.column("row_id").to_numpy(zero_copy_only=False)
        idx = order[np.searchsorted(rr[order], out_rid)]
        take_idx = pa.array(idx, type=pa.int64())
        arrays = [out.column("row_id")]
        for c in carry:
            # Arrow take, not a numpy round-trip: carried lanes may be
            # nullable (anti-join null keys) and to_numpy would mangle
            # nulls into NaN-cast garbage
            arrays.append(tbl.column(c).combine_chunks().take(take_idx))
        arrays += [out.column(n) for n, _ in cols]
        return pa.Table.from_arrays(arrays, schema=full_schema)

    ddl = ("row_id long, "
           + "".join(f"{c} long, " for c in carry)
           + ", ".join(f"{n} {spark_type_for(v)}" for n, v in cols))
    return tagged.groupBy("part_id", "split").applyInArrow(fn, schema=ddl)


def group_count_partials(
    spark: SparkSession, out_dir: str, column: str
) -> tuple[DataFrame, str]:
    """Files-mode per-block partial counts for ``group_count``: each
    task bincounts its partition's codes (dictionary/RLE paths never
    materialize payloads) and emits tiny (value, cnt) partials; the
    caller merges with one O(distinct) groupBy. Returns (partials_df,
    vtype)."""
    all_cols, parts = load_manifest(out_dir)
    vt = dict(all_cols).get(column)
    if vt is None:
        raise KeyError(f"no such column: {column}")
    is_str = vt in ("str", "binary")
    is_float = vt in ("double", "float")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from arcade_spark.decode import _binary_views
        from arcade_spark.gdict import GlobalDictDecoder
        from arcade_spark.readops import _int_chunk_counts, _str_chunk_counts

        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                cf = _ColFile(out_dir, int(pid), column)
                gdec = GlobalDictDecoder()
                for rg in range(cf.pf.metadata.num_row_groups):
                    tbl = cf.pf.read_row_group(rg, columns=_META_COLS + ["blob", "seg"])
                    cm = _ColMeta(tbl)
                    b_off, b_mv = _binary_views(tbl.column("blob").combine_chunks())
                    s_off, s_mv = _binary_views(tbl.column("seg").combine_chunks())
                    for i in range(cm.n):
                        meta = cm.meta_dict(i, s_mv[s_off[i]: s_off[i + 1]])
                        blob = b_mv[b_off[i]: b_off[i + 1]]
                        if is_str:
                            out = _str_chunk_counts(gdec, blob, meta)
                            if out is None:
                                continue
                            vals, cnts = out
                            yield pa.RecordBatch.from_arrays(
                                [pa.array(list(vals), type=pa.binary()),
                                 pa.array(cnts.astype(np.int64))],
                                names=["value_bin", "cnt"],
                            )
                        else:
                            out = _int_chunk_counts(blob, meta, is_float)
                            if out is None:
                                continue
                            vals, cnts = out
                            yield pa.RecordBatch.from_arrays(
                                [pa.array(vals), pa.array(cnts.astype(np.int64))],
                                names=["value_dbl" if is_float else "value_int", "cnt"],
                            )

    if is_str:
        ddl = "value_bin binary, cnt long"
    elif is_float:
        ddl = "value_dbl double, cnt long"
    else:
        ddl = "value_int long, cnt long"
    return _assign_df(spark, [p for p, _ in parts]).mapInArrow(kernel, schema=ddl), vt


def group_sum_partials(
    spark: SparkSession, out_dir: str, group_col: str, agg_col: str,
    agg_scale: int = AGG_SCALE,
) -> tuple[DataFrame, str]:
    """Files-mode partials for ``GROUP BY group_col: SUM(agg_col),
    COUNT(*)``: per chunk the GROUP column contributes its bit-packed
    codes (no string materialization on dict/rle paths) and the agg
    column decodes to its int64 lane; sums/counts accumulate per code
    (np.add.at — one pass), and only the few USED codes resolve through
    the dictionary. Partials are O(distinct per chunk); the caller's
    merge keeps the only shuffle at O(distinct), not O(rows).

    Exactness contract (same as column_agg): integer agg columns only —
    int64 partial sums are exact in any order, so the DuckDB oracle
    hash-matches. Null group values form no group (group_count's
    documented contract); null agg values are excluded from the sum but
    rows still count (SQL SUM/COUNT semantics)."""
    all_cols, parts = load_manifest(out_dir)
    cols = dict(all_cols)
    gvt = cols.get(group_col)
    avt = cols.get(agg_col)
    if gvt is None:
        raise KeyError(f"no such column: {group_col}")
    if avt is None:
        raise KeyError(f"no such column: {agg_col}")
    if avt not in _AGG_VTS:
        raise NotImplementedError(f"group_sum {_AGG_GUARD}")
    g_str = gvt in ("str", "binary")
    g_float = gvt in ("double", "float")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from arcade_spark.core import decode_int_block
        from arcade_spark.gdict import GlobalDictDecoder
        from arcade_spark.readops import _str_chunk_codes

        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                gcf = _ColFile(out_dir, int(pid), group_col)
                acf = _ColFile(out_dir, int(pid), agg_col)
                gcm, acm = gcf.meta(), acf.meta()
                if gcm.n != acm.n:
                    raise ValueError(
                        f"part {pid}: block count mismatch "
                        f"({group_col} {gcm.n} vs {agg_col} {acm.n})"
                    )
                nb = gcm.n
                rows = np.arange(nb, dtype=np.int64)
                gblobs = gcf.payloads(rows, "blob")
                ablobs = acf.payloads(rows, "blob")
                gsegs = gcf.payloads(rows, "seg") if g_str else {}
                gdec = GlobalDictDecoder()
                for b in range(nb):
                    gmeta = gcm.meta_dict(b, gsegs.get(b, b""))
                    if g_str:
                        codes, gvalid, resolve = _str_chunk_codes(
                            gdec, gblobs[b], gmeta
                        )
                    else:
                        giblock = decode_int_block(gblobs[b], gmeta)
                        gv = giblock.values
                        if g_float:
                            gv = gv.copy()
                            f = gv.view(np.float64)
                            gv[f == 0.0] = 0  # both ±0.0
                            gv[np.isnan(f)] = np.int64(0x7FF8000000000000)
                        uniq, codes = np.unique(gv, return_inverse=True)
                        gvalid = giblock.validity
                        resolve = lambda used, u=uniq: u[used]  # noqa: E731
                    aiblock = decode_int_block(ablobs[b], acm.meta_dict(b))
                    avalid = aiblock.validity
                    av = quantized_agg_lane(aiblock.values, avalid, avt, agg_scale)
                    n = len(codes)
                    cmask = (
                        np.ones(n, dtype=bool) if gvalid is None else gvalid
                    )
                    smask = cmask if avalid is None else (cmask & avalid)
                    if not cmask.any():
                        continue
                    width = int(codes[cmask].max()) + 1
                    cnt = np.bincount(codes[cmask], minlength=width)
                    sums = np.zeros(width, dtype=np.int64)
                    np.add.at(sums, codes[smask], av[smask])
                    acnt = np.bincount(codes[smask], minlength=width)
                    used = np.nonzero(cnt)[0]
                    vals = resolve(used)
                    # SQL SUM over zero valid values is NULL — null-mask
                    # chunk partials so the merge's sum skips them
                    s_mask = acnt[used] == 0
                    if g_str:
                        key = pa.array(list(vals), type=pa.binary())
                        names = ["value_bin", "s", "c"]
                    elif g_float:
                        key = pa.array(vals.view(np.float64), type=pa.float64())
                        names = ["value_dbl", "s", "c"]
                    else:
                        key = pa.array(vals.astype(np.int64), type=pa.int64())
                        names = ["value_int", "s", "c"]
                    yield pa.RecordBatch.from_arrays(
                        [key,
                         pa.array(sums[used].astype(np.int64), mask=s_mask),
                         pa.array(cnt[used].astype(np.int64))],
                        names=names,
                    )

    if g_str:
        ddl = "value_bin binary, s long, c long"
    elif g_float:
        ddl = "value_dbl double, s long, c long"
    else:
        ddl = "value_int long, s long, c long"
    return _assign_df(spark, [p for p, _ in parts]).mapInArrow(kernel, schema=ddl), gvt


def group_by_partials(
    spark: SparkSession, out_dir: str, group_cols: list[str],
    agg_col: str | None = None, agg_scale: int = AGG_SCALE,
) -> tuple[DataFrame, list[str]]:
    """Files-mode partials for MULTI-COLUMN ``GROUP BY g1, g2, ...
    [SUM(agg)], COUNT(*)``: per chunk every group column contributes a
    per-row code array (bit-packed codes on dict/rle paths — no string
    materialization; int lanes factorize), the composite key is the
    code TUPLE (np.unique over the stacked code matrix), and counts /
    integer sums accumulate per composite key. Only USED per-column
    codes resolve through their dictionaries. Partials and the merge
    shuffle are O(distinct tuples), never O(rows).

    Returns (partials_df, vtypes) where partials_df has columns
    k0..k{n-1} (binary for str lanes, double for canonicalized float
    keys, long otherwise), plus ``s``/``mn``/``mx`` (int64 sum/min/max,
    null mn/mx when a group has no valid agg values in the chunk) and
    ``c`` (count). Null semantics: a row joins a group iff EVERY group
    column is non-null (the group_count contract applied tuple-wise);
    null agg values are excluded from sum/min/max."""
    all_cols, parts = load_manifest(out_dir)
    cols = dict(all_cols)
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if len(set(group_cols)) != len(group_cols):
        raise ValueError("duplicate group columns")
    vts = []
    for g in group_cols:
        if g not in cols:
            raise KeyError(f"no such column: {g}")
        vts.append(cols[g])
    if agg_col is not None:
        avt = cols.get(agg_col)
        if avt is None:
            raise KeyError(f"no such column: {agg_col}")
        if avt not in _AGG_VTS:
            raise NotImplementedError(f"group_by {_AGG_GUARD}")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from arcade_spark.core import decode_int_block
        from arcade_spark.gdict import GlobalDictDecoder
        from arcade_spark.readops import _str_chunk_codes

        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                cfs = {g: _ColFile(out_dir, int(pid), g) for g in group_cols}
                cms = {g: cfs[g].meta() for g in group_cols}
                nb = cms[group_cols[0]].n
                if any(cms[g].n != nb for g in group_cols):
                    raise ValueError(f"part {pid}: block count mismatch")
                rows = np.arange(nb, dtype=np.int64)
                blobs = {g: cfs[g].payloads(rows, "blob") for g in group_cols}
                segs = {
                    g: (cfs[g].payloads(rows, "seg")
                        if cols[g] in ("str", "binary") else {})
                    for g in group_cols
                }
                if agg_col is not None:
                    acf = _ColFile(out_dir, int(pid), agg_col)
                    acm = acf.meta()
                    if acm.n != nb:
                        raise ValueError(f"part {pid}: block count mismatch")
                    ablobs = acf.payloads(rows, "blob")
                gdecs = {g: GlobalDictDecoder() for g in group_cols}
                for b in range(nb):
                    key_codes, resolvers = [], []
                    cmask = None
                    for g, vt in zip(group_cols, vts):
                        meta = cms[g].meta_dict(b, segs[g].get(b, b""))
                        if vt in ("str", "binary"):
                            codes, gvalid, resolve = _str_chunk_codes(
                                gdecs[g], blobs[g][b], meta
                            )
                        else:
                            ib = decode_int_block(blobs[g][b], meta)
                            gv = ib.values
                            if vt in ("double", "float"):
                                gv = gv.copy()
                                f = gv.view(np.float64)
                                gv[f == 0.0] = 0
                                gv[np.isnan(f)] = np.int64(0x7FF8000000000000)
                            uniq, codes = np.unique(gv, return_inverse=True)
                            gvalid = ib.validity
                            resolve = (lambda used, u=uniq: u[used])
                        key_codes.append(codes.astype(np.int64))
                        resolvers.append(resolve)
                        if gvalid is not None:
                            cmask = gvalid if cmask is None else (cmask & gvalid)
                    n = len(key_codes[0])
                    if cmask is None:
                        cmask = np.ones(n, dtype=bool)
                    if not cmask.any():
                        continue
                    stack = np.stack(key_codes)  # (k, n)
                    tuples, inv = np.unique(stack, axis=1, return_inverse=True)
                    width = tuples.shape[1]
                    cnt = np.bincount(inv[cmask], minlength=width)
                    sums = np.zeros(width, dtype=np.int64)
                    mins = np.full(width, np.iinfo(np.int64).max, dtype=np.int64)
                    maxs = np.full(width, np.iinfo(np.int64).min, dtype=np.int64)
                    acnt = np.zeros(width, dtype=np.int64)
                    if agg_col is not None:
                        aib = decode_int_block(ablobs[b], acm.meta_dict(b))
                        qv = quantized_agg_lane(
                            aib.values, aib.validity, avt, agg_scale
                        )
                        smask = (
                            cmask if aib.validity is None
                            else (cmask & aib.validity)
                        )
                        np.add.at(sums, inv[smask], qv[smask])
                        np.minimum.at(mins, inv[smask], qv[smask])
                        np.maximum.at(maxs, inv[smask], qv[smask])
                        acnt = np.bincount(inv[smask], minlength=width)
                    used = np.nonzero(cnt)[0]
                    arrays = []
                    for i, vt in enumerate(vts):
                        vals = resolvers[i](tuples[i, used])
                        if vt in ("str", "binary"):
                            arrays.append(pa.array(list(vals), type=pa.binary()))
                        elif vt in ("double", "float"):
                            arrays.append(pa.array(
                                vals.view(np.float64), type=pa.float64()))
                        else:
                            arrays.append(pa.array(
                                vals.astype(np.int64), type=pa.int64()))
                    has_agg = acnt[used] > 0
                    arrays += [
                        pa.array(sums[used].astype(np.int64)),
                        pa.array(mins[used].astype(np.int64), mask=~has_agg),
                        pa.array(maxs[used].astype(np.int64), mask=~has_agg),
                        pa.array(cnt[used].astype(np.int64)),
                    ]
                    yield pa.RecordBatch.from_arrays(
                        arrays,
                        names=[f"k{i}" for i in range(len(group_cols))]
                        + ["s", "mn", "mx", "c"],
                    )

    def lane(vt: str) -> str:
        if vt in ("str", "binary"):
            return "binary"
        if vt in ("double", "float"):
            return "double"
        return "long"

    ddl = ", ".join(
        [f"k{i} {lane(vt)}" for i, vt in enumerate(vts)]
        + ["s long", "mn long", "mx long", "c long"]
    )
    return _assign_df(spark, [p for p, _ in parts]).mapInArrow(kernel, schema=ddl), vts


def filter_group_by_partials(
    spark: SparkSession,
    out_dir: str,
    preds_spec: list[tuple[str, tuple]],
    group_cols: list[str],
    agg_col: str | None = None,
    agg_scale: int = AGG_SCALE,
) -> tuple[DataFrame, list[str]]:
    """Fused ``WHERE <conjunction> GROUP BY g1, g2 [SUM/MIN/MAX(agg)]``
    in one pass per partition: the predicate kernel produces match
    positions, group columns contribute codes gathered AT those
    positions (dict/rle paths never materialize strings; unmatched
    blocks replay segments only), the agg column decodes matched
    positions, and per-chunk code-tuple accumulators emit O(distinct)
    partials — the classic warehouse query shape (TPC-H Q1) without
    materializing a single matched row. Same output contract as
    group_by_partials."""
    from arcade_spark.readops import _Pred

    all_cols, parts = load_manifest(out_dir)
    cols = dict(all_cols)
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if len(set(group_cols)) != len(group_cols):
        raise ValueError("duplicate group columns")
    vts = []
    for g in group_cols:
        if g not in cols:
            raise KeyError(f"no such column: {g}")
        vts.append(cols[g])
    if agg_col is not None:
        avt = cols.get(agg_col)
        if avt is None:
            raise KeyError(f"no such column: {agg_col}")
        if avt not in _AGG_VTS:
            raise NotImplementedError(f"fused group-by {_AGG_GUARD}")
    seen: set[str] = set()
    compiled = []
    for column, pred in preds_spec:
        if column not in cols:
            raise KeyError(f"no such column: {column}")
        if column in seen:
            raise ValueError(
                f"multiple predicates on {column!r} within one conjunct "
                "not supported"
            )
        seen.add(column)
        compiled.append(_Pred(column, cols[column], pred))
    conjuncts = [compiled]

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from arcade_spark.core import decode_int_block, replay_str_block
        from arcade_spark.gdict import GlobalDictDecoder
        from arcade_spark.readops import _str_chunk_codes

        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                pos_of, nb, _blk, p_cfs, p_cms = _part_match_positions(
                    out_dir, int(pid), conjuncts
                )
                matched = [b for b in range(nb) if len(pos_of[b])]
                if not matched:
                    continue
                last_m = matched[-1]
                matched_mask = np.zeros(nb, dtype=bool)
                matched_mask[matched] = True
                midx = np.asarray(matched, dtype=np.int64)

                gcf = {g: p_cfs.get(g) or _ColFile(out_dir, int(pid), g)
                       for g in group_cols}
                gcm = {g: (p_cms.get(g) or gcf[g].meta()) for g in group_cols}
                for g in group_cols:
                    if gcm[g].n != nb:
                        raise ValueError(
                            f"column {g!r}: block count mismatch in part {pid}"
                        )
                rng = np.arange(nb)
                gblobs = {g: gcf[g].payloads(midx, "blob") for g in group_cols}
                gsegs = {}
                for g, vt in zip(group_cols, vts):
                    if vt in ("str", "binary"):
                        seg_rows = np.nonzero(
                            (gcm[g].stateful | matched_mask) & (rng <= last_m)
                        )[0]
                        gsegs[g] = gcf[g].payloads(seg_rows, "seg")
                if agg_col is not None:
                    acf = p_cfs.get(agg_col) or _ColFile(out_dir, int(pid), agg_col)
                    acm = p_cms.get(agg_col) or acf.meta()
                    if acm.n != nb:
                        raise ValueError(
                            f"column {agg_col!r}: block count mismatch in part {pid}"
                        )
                    ablobs = acf.payloads(midx, "blob")
                gdecs = {g: GlobalDictDecoder() for g in group_cols}

                for b in range(last_m + 1):
                    if not matched_mask[b]:
                        for g, vt in zip(group_cols, vts):
                            if vt in ("str", "binary"):
                                replay_str_block(
                                    gcm[g].meta_dict(b, gsegs[g].get(b, b"")),
                                    gdecs[g],
                                )
                        continue
                    pos = pos_of[b]
                    key_codes, resolvers = [], []
                    cmask = None
                    for g, vt in zip(group_cols, vts):
                        if vt in ("str", "binary"):
                            meta = gcm[g].meta_dict(b, gsegs[g].get(b, b""))
                            codes, gvalid, resolve = _str_chunk_codes(
                                gdecs[g], gblobs[g][b], meta
                            )
                        else:
                            ib = decode_int_block(
                                gblobs[g][b], gcm[g].meta_dict(b)
                            )
                            gv = ib.values
                            if vt in ("double", "float"):
                                gv = gv.copy()
                                f = gv.view(np.float64)
                                gv[f == 0.0] = 0
                                gv[np.isnan(f)] = np.int64(0x7FF8000000000000)
                            uniq, codes = np.unique(gv, return_inverse=True)
                            gvalid = ib.validity
                            resolve = (lambda used, u=uniq: u[used])
                        key_codes.append(codes.astype(np.int64)[pos])
                        resolvers.append(resolve)
                        if gvalid is not None:
                            gv_pos = gvalid[pos]
                            cmask = gv_pos if cmask is None else (cmask & gv_pos)
                    n = len(pos)
                    if cmask is None:
                        cmask = np.ones(n, dtype=bool)
                    if not cmask.any():
                        continue
                    stack = np.stack(key_codes)
                    tuples, inv = np.unique(stack, axis=1, return_inverse=True)
                    width = tuples.shape[1]
                    cnt = np.bincount(inv[cmask], minlength=width)
                    sums = np.zeros(width, dtype=np.int64)
                    mins = np.full(width, np.iinfo(np.int64).max, dtype=np.int64)
                    maxs = np.full(width, np.iinfo(np.int64).min, dtype=np.int64)
                    acnt = np.zeros(width, dtype=np.int64)
                    if agg_col is not None:
                        aib = decode_int_block(ablobs[b], acm.meta_dict(b))
                        # quantize MATCHED rows only: a non-finite/overflow
                        # value in a predicate-excluded row must not raise
                        # (same contract as _filter_part_batches)
                        avd = (None if aib.validity is None
                               else aib.validity[pos])
                        av = quantized_agg_lane(
                            aib.values[pos], avd, avt, agg_scale
                        )
                        smask = cmask if avd is None else (cmask & avd)
                        np.add.at(sums, inv[smask], av[smask])
                        np.minimum.at(mins, inv[smask], av[smask])
                        np.maximum.at(maxs, inv[smask], av[smask])
                        acnt = np.bincount(inv[smask], minlength=width)
                    used = np.nonzero(cnt)[0]
                    has_agg = acnt[used] > 0
                    arrays = []
                    for i, vt in enumerate(vts):
                        vals = resolvers[i](tuples[i, used])
                        if vt in ("str", "binary"):
                            arrays.append(pa.array(list(vals), type=pa.binary()))
                        elif vt in ("double", "float"):
                            arrays.append(pa.array(
                                vals.view(np.float64), type=pa.float64()))
                        else:
                            arrays.append(pa.array(
                                vals.astype(np.int64), type=pa.int64()))
                    arrays += [
                        pa.array(sums[used].astype(np.int64), mask=~has_agg),
                        pa.array(mins[used].astype(np.int64), mask=~has_agg),
                        pa.array(maxs[used].astype(np.int64), mask=~has_agg),
                        pa.array(cnt[used].astype(np.int64)),
                    ]
                    yield pa.RecordBatch.from_arrays(
                        arrays,
                        names=[f"k{i}" for i in range(len(group_cols))]
                        + ["s", "mn", "mx", "c"],
                    )

    def lane(vt: str) -> str:
        if vt in ("str", "binary"):
            return "binary"
        if vt in ("double", "float"):
            return "double"
        return "long"

    ddl = ", ".join(
        [f"k{i} {lane(vt)}" for i, vt in enumerate(vts)]
        + ["s long", "mn long", "mx long", "c long"]
    )
    return _assign_df(spark, [p for p, _ in parts]).mapInArrow(kernel, schema=ddl), vts


def compile_agg_specs(
    specs: list[tuple], cols: dict[str, str], agg_scale: int
) -> list[dict]:
    """Normalize multi-aggregate specs for the fused kernel.

    Spec forms (name, kind, arg):
      ("sum_qty",  "sum",  "l_quantity")     — Σ q(col)
      ("avg_qty",  "avg",  "l_quantity")     — Σ q(col) / (scale·valid)
      ("min_qty",  "min",  "l_quantity")     — min q(col) (/scale)
      ("max_qty",  "max",  "l_quantity")     — max q(col) (/scale)
      ("sum_disc", "sumprod", [(col, mult, add), ...]) — Σ Π(add+mult·q)
      ("cnt",      "count", None)            — matched rows
    Affine terms live in the QUANTIZED domain (at scale 100, 1.0 is
    100 — so TPC-H's (1 − l_discount) is (col, −1, 100)). Each spec's
    output divisor is the product of its referenced columns' scales
    (agg_scale for double/float, 1 for integers), so the final value is
    one IEEE division of an exact int64 sum — cross-engine
    bit-identical, same contract as quantized_agg_lane."""
    out = []
    for name, kind, arg in specs:
        if kind == "count":
            out.append({"name": name, "kind": kind, "terms": [], "div": 1,
                        "vt": None})
            continue
        if kind in ("sum", "avg", "min", "max"):
            terms = [(arg, 1, 0)]
        elif kind == "sumprod":
            terms = [tuple(t) for t in arg]
        else:
            raise ValueError(f"unknown agg kind: {kind!r}")
        for _c, m, a in terms:
            # spec-constant sanity: the kernel's float-domain overflow
            # guard checks |m·q| and |a + m·q| before each exact int64
            # op, but a constant at/past 2^62 could cancel a wrapped
            # product inside one check — reject it outright
            if abs(int(m)) >= 2 ** 62 or abs(int(a)) >= 2 ** 62:
                raise ValueError(
                    "multi-agg affine constants must satisfy "
                    f"|m|, |a| < 2^62: got m={m}, a={a}"
                )
        div = 1
        col_vt = None
        for col, _m, _a in terms:
            vt = cols.get(col)
            if vt is None:
                raise KeyError(f"no such column: {col}")
            col_vt = vt
            if vt not in _AGG_VTS:
                # MIN/MAX over ts/date/bool are real queries and the
                # int64 lane already carries them (micros / days / 0-1)
                # with order preserved; MIN/MAX over str/binary ride a
                # BINARY lane (round-6): global dict codes are NOT
                # order-preserving, so the kernel compares VALUES of
                # used dictionary entries per block and the merge is a
                # lexicographic binary min/max. Sums stay meaningless
                # and rejected.
                if kind in ("min", "max") and vt in (
                    "ts", "tsntz", "date", "bool", "str", "binary"
                ):
                    continue
                raise NotImplementedError(f"multi-agg {_AGG_GUARD}")
            div *= agg_scale if vt in ("double", "float") else 1
        out.append({"name": name, "kind": kind, "terms": terms, "div": div,
                    "vt": col_vt})
    return out


def _bin_spec(sp: dict) -> bool:
    """True for a MIN/MAX spec over a str/binary column — the binary
    value lane through the multi-agg partials (round-6)."""
    return sp["kind"] in ("min", "max") and sp.get("vt") in ("str", "binary")


def filter_group_by_multi_partials(
    spark: SparkSession,
    out_dir: str,
    preds_spec: list[tuple[str, tuple]],
    group_cols: list[str],
    agg_specs: list[tuple],
    agg_scale: int = AGG_SCALE,
    dnf_spec: list[list[tuple[str, tuple]]] | None = None,
    keep_null_keys: bool = False,
) -> tuple[DataFrame, list[str], list[dict]]:
    """MULTI-aggregate fused ``WHERE <conj> GROUP BY g1.. `` — the
    COMPLETE TPC-H Q1 shape: one predicate pass, one positional decode
    per referenced agg column, N integer accumulators per group tuple.
    Every aggregate (including Σ price·(1−disc)·(1+tax) products) runs
    in the exact fixed-point int64 domain (compile_agg_specs), so the
    partials merge in any order and the DuckDB oracle replays the bytes.
    Partial schema: k0..kn, then (s{i}, c{i}) per non-count spec, then
    ``c`` (matched rows). A row feeds spec i iff every referenced
    column is valid there (SQL aggregate null semantics); count counts
    all matched rows with non-null group keys. ``keep_null_keys=True``
    switches to full SQL GROUP BY semantics instead: a null group
    value is its own group (code −1 in-kernel, a null k-lane in the
    partials) and count counts every matched row — the grouping-sets
    operator needs this, since a rolled-up level must keep rows that
    are null in an unrelated group column."""
    from arcade_spark.readops import _Pred

    all_cols, parts = load_manifest(out_dir)
    cols = dict(all_cols)
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if len(set(group_cols)) != len(group_cols):
        raise ValueError("duplicate group columns")
    vts = []
    for g in group_cols:
        if g not in cols:
            raise KeyError(f"no such column: {g}")
        vts.append(cols[g])
    cspecs = compile_agg_specs(agg_specs, cols, agg_scale)
    # str/binary MIN/MAX specs ride a binary VALUE lane, not the int64
    # quantized lane (global dict codes are not order-preserving)
    bin_cols = sorted({
        sp["terms"][0][0] for sp in cspecs if _bin_spec(sp)
    })
    needed = sorted(
        {c for sp in cspecs for c, _m, _a in sp["terms"]} - set(bin_cols)
    )
    live = [i for i, sp in enumerate(cspecs) if sp["kind"] != "count"]

    def _compile_conj(spec: list[tuple[str, tuple]]) -> list:
        seen: set[str] = set()
        compiled = []
        for column, pred in spec:
            if column not in cols:
                raise KeyError(f"no such column: {column}")
            if column in seen:
                raise ValueError(
                    f"multiple predicates on {column!r} within one "
                    "conjunct not supported"
                )
            seen.add(column)
            compiled.append(_Pred(column, cols[column], pred))
        return compiled

    if dnf_spec is not None:
        if preds_spec:
            raise ValueError("pass either preds_spec or dnf_spec, not both")
        conjuncts = [_compile_conj(c) for c in dnf_spec]
        if not all(conjuncts):
            raise ValueError("empty conjunct")
    else:
        compiled = _compile_conj(preds_spec)
        conjuncts = [compiled] if compiled else None  # None = full scan

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from arcade_spark.core import decode_int_block, replay_str_block
        from arcade_spark.gdict import GlobalDictDecoder
        from arcade_spark.readops import _str_chunk_codes

        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                if conjuncts is not None:
                    pos_of, nb, _blk, p_cfs, p_cms = _part_match_positions(
                        out_dir, int(pid), conjuncts
                    )
                else:
                    cf0 = _ColFile(out_dir, int(pid), group_cols[0])
                    cm0 = cf0.meta()
                    nb = cm0.n
                    pos_of = [
                        np.arange(int(cm0.n_values[b]), dtype=np.int64)
                        for b in range(nb)
                    ]
                    p_cfs, p_cms = {group_cols[0]: cf0}, {group_cols[0]: cm0}
                matched = [b for b in range(nb) if len(pos_of[b])]
                if not matched:
                    continue
                last_m = matched[-1]
                matched_mask = np.zeros(nb, dtype=bool)
                matched_mask[matched] = True
                midx = np.asarray(matched, dtype=np.int64)

                gcf = {g: p_cfs.get(g) or _ColFile(out_dir, int(pid), g)
                       for g in group_cols}
                gcm = {g: (p_cms.get(g) or gcf[g].meta()) for g in group_cols}
                acf = {c: p_cfs.get(c) or _ColFile(out_dir, int(pid), c)
                       for c in needed if c not in gcf}
                acm = {c: (p_cms.get(c) or acf[c].meta()) for c in acf}
                # binary min/max agg columns not already decoded as
                # group keys need their own dict-replay state
                bcf = {c: p_cfs.get(c) or _ColFile(out_dir, int(pid), c)
                       for c in bin_cols if c not in gcf}
                bcm = {c: (p_cms.get(c) or bcf[c].meta()) for c in bcf}
                for g in group_cols:
                    if gcm[g].n != nb:
                        raise ValueError(
                            f"column {g!r}: block count mismatch in part {pid}"
                        )
                for cms_x in (acm, bcm):
                    for c in cms_x:
                        if cms_x[c].n != nb:
                            raise ValueError(
                                f"column {c!r}: block count mismatch in part {pid}"
                            )
                rng = np.arange(nb)
                gblobs = {g: gcf[g].payloads(midx, "blob") for g in group_cols}
                gsegs = {}
                for g, vt in zip(group_cols, vts):
                    if vt in ("str", "binary"):
                        seg_rows = np.nonzero(
                            (gcm[g].stateful | matched_mask) & (rng <= last_m)
                        )[0]
                        gsegs[g] = gcf[g].payloads(seg_rows, "seg")
                ablobs = {c: acf[c].payloads(midx, "blob") for c in acf}
                bblobs = {c: bcf[c].payloads(midx, "blob") for c in bcf}
                bsegs = {}
                for c in bcf:
                    seg_rows = np.nonzero(
                        (bcm[c].stateful | matched_mask) & (rng <= last_m)
                    )[0]
                    bsegs[c] = bcf[c].payloads(seg_rows, "seg")
                gdecs = {g: GlobalDictDecoder() for g in group_cols}
                bdecs = {c: GlobalDictDecoder() for c in bcf}

                for b in range(last_m + 1):
                    if not matched_mask[b]:
                        for g, vt in zip(group_cols, vts):
                            if vt in ("str", "binary"):
                                replay_str_block(
                                    gcm[g].meta_dict(b, gsegs[g].get(b, b"")),
                                    gdecs[g],
                                )
                        for c in bcf:
                            replay_str_block(
                                bcm[c].meta_dict(b, bsegs[c].get(b, b"")),
                                bdecs[c],
                            )
                        continue
                    pos = pos_of[b]
                    key_codes, resolvers = [], []
                    str_dec: dict[str, tuple] = {}
                    cmask = None
                    for g, vt in zip(group_cols, vts):
                        if vt in ("str", "binary"):
                            meta = gcm[g].meta_dict(b, gsegs[g].get(b, b""))
                            codes, gvalid, resolve = _str_chunk_codes(
                                gdecs[g], gblobs[g][b], meta
                            )
                            # a binary min/max spec over a group column
                            # reuses this decode (replay runs ONCE)
                            str_dec[g] = (codes, gvalid, resolve)
                        else:
                            ib = decode_int_block(
                                gblobs[g][b], gcm[g].meta_dict(b)
                            )
                            gv = ib.values
                            if vt in ("double", "float"):
                                gv = gv.copy()
                                f = gv.view(np.float64)
                                gv[f == 0.0] = 0
                                gv[np.isnan(f)] = np.int64(0x7FF8000000000000)
                            uniq, codes = np.unique(gv, return_inverse=True)
                            gvalid = ib.validity
                            resolve = (lambda used, u=uniq: u[used])
                        kc = codes.astype(np.int64)[pos]
                        if gvalid is not None:
                            gv_pos = gvalid[pos]
                            if keep_null_keys:
                                # null is its own group: code -1
                                kc = np.where(gv_pos, kc, np.int64(-1))
                            else:
                                cmask = (gv_pos if cmask is None
                                         else (cmask & gv_pos))
                        key_codes.append(kc)
                        resolvers.append(resolve)
                    for c in bcf:
                        str_dec[c] = _str_chunk_codes(
                            bdecs[c], bblobs[c][b],
                            bcm[c].meta_dict(b, bsegs[c].get(b, b"")),
                        )
                    n = len(pos)
                    if cmask is None:
                        cmask = np.ones(n, dtype=bool)
                    if not cmask.any():
                        continue
                    stack = np.stack(key_codes)
                    tuples, inv = np.unique(stack, axis=1, return_inverse=True)
                    width = tuples.shape[1]
                    cnt = np.bincount(inv[cmask], minlength=width)

                    # decode each referenced agg column ONCE per block;
                    # quantize MATCHED rows only (a non-finite value in a
                    # predicate-excluded row must not raise — same contract
                    # as _filter_part_batches)
                    qcache: dict[str, tuple[np.ndarray, np.ndarray | None]] = {}
                    for c in needed:
                        ib = decode_int_block(
                            ablobs[c][b] if c in ablobs else gblobs[c][b],
                            (acm.get(c) or gcm[c]).meta_dict(b),
                        )
                        v = None if ib.validity is None else ib.validity[pos]
                        q = quantized_agg_lane(
                            ib.values[pos], v, cols[c], agg_scale
                        )
                        qcache[c] = (q, v)

                    spec_sums, spec_cnts = [], []
                    for i in live:
                        sp = cspecs[i]
                        if _bin_spec(sp):
                            # binary MIN/MAX: rank the USED dictionary
                            # entries by VALUE (codes are not order-
                            # preserving), take per-group extremal rank
                            c = sp["terms"][0][0]
                            codes_c, valid_c, resolve_c = str_dec[c]
                            sel = codes_c.astype(np.int64)[pos]
                            vmask = (cmask if valid_c is None
                                     else (cmask & valid_c[pos]))
                            spec_cnts.append(
                                np.bincount(inv[vmask], minlength=width)
                            )
                            if vmask.any():
                                sub = sel[vmask]
                                uniqc, subinv = np.unique(
                                    sub, return_inverse=True
                                )
                                varr = np.asarray(
                                    list(resolve_c(uniqc)), dtype=object
                                )
                                order = np.argsort(varr)
                                rank = np.empty(len(uniqc), dtype=np.int64)
                                rank[order] = np.arange(len(uniqc))
                                r = rank[subinv]
                                if sp["kind"] == "min":
                                    extr = np.full(width, len(uniqc),
                                                   dtype=np.int64)
                                    np.minimum.at(extr, inv[vmask], r)
                                else:
                                    extr = np.full(width, -1, dtype=np.int64)
                                    np.maximum.at(extr, inv[vmask], r)
                                sv = varr[order]
                            else:
                                extr = np.full(width, -1, dtype=np.int64)
                                sv = np.zeros(0, dtype=object)
                            spec_sums.append((extr, sv))
                            continue
                        # SQL agg null semantics: a row feeds the spec iff
                        # every referenced column is valid there
                        smask = cmask
                        for c, _m, _a in sp["terms"]:
                            v = qcache[c][1]
                            if v is not None:
                                smask = smask & v
                        # guarded product chain: verify the magnitude in
                        # float64 BEFORE each exact int64 multiply — an
                        # intermediate that wraps past ±2^63 would pass an
                        # after-the-fact check (e.g. 2^32·2^32 ≡ 0).  The
                        # 2^62 bar leaves a 2× margin over int64, so the
                        # ≤2^-52-relative float estimate can't mis-classify
                        # a genuinely unsafe product.
                        val = None
                        val_f = None
                        any_live = bool(smask.any())
                        for c, m, a in sp["terms"]:
                            q = qcache[c][0]
                            mq_f = float(m) * q.astype(np.float64)
                            if any_live and (
                                np.abs(mq_f[smask]) >= 2.0 ** 62
                            ).any():
                                # check the PRODUCT too, not just the
                                # affine result: a large |a| of opposite
                                # sign would cancel a wrapped m·q in the
                                # combined estimate
                                raise ValueError(
                                    "multi-agg affine term overflows int64: "
                                    "|m·q| must stay < 2^62"
                                )
                            t_f = float(a) + mq_f
                            if any_live and (
                                np.abs(t_f[smask]) >= 2.0 ** 62
                            ).any():
                                raise ValueError(
                                    "multi-agg affine term overflows int64: "
                                    "|a + m·q| must stay < 2^62"
                                )
                            t = a + m * q
                            if val is None:
                                val, val_f = t, t_f
                                continue
                            val_f = val_f * t_f
                            if any_live and (
                                np.abs(val_f[smask]) >= 2.0 ** 62
                            ).any():
                                raise ValueError(
                                    "multi-agg term product overflows int64: "
                                    "the fixed-point contract requires "
                                    "|Π terms| < 2^62 (lower agg_scale or "
                                    "split the product)"
                                )
                            val = val * t
                        kind = sp["kind"]
                        if kind == "min":
                            s_i = np.full(width, np.iinfo(np.int64).max,
                                          dtype=np.int64)
                            np.minimum.at(s_i, inv[smask], val[smask])
                        elif kind == "max":
                            s_i = np.full(width, np.iinfo(np.int64).min,
                                          dtype=np.int64)
                            np.maximum.at(s_i, inv[smask], val[smask])
                        else:
                            s_i = np.zeros(width, dtype=np.int64)
                            np.add.at(s_i, inv[smask], val[smask])
                        spec_sums.append(s_i)
                        spec_cnts.append(np.bincount(inv[smask], minlength=width))

                    used = np.nonzero(cnt)[0]
                    arrays = []
                    for i, vt in enumerate(vts):
                        code_row = tuples[i, used]
                        nullm = code_row < 0  # keep_null_keys groups
                        if nullm.all():
                            nz = len(code_row)
                            if vt in ("str", "binary"):
                                arrays.append(pa.array(
                                    [None] * nz, type=pa.binary()))
                            elif vt in ("double", "float"):
                                arrays.append(pa.array(
                                    np.zeros(nz), type=pa.float64(),
                                    mask=nullm))
                            else:
                                arrays.append(pa.array(
                                    np.zeros(nz, dtype=np.int64),
                                    type=pa.int64(), mask=nullm))
                            continue
                        safe = (np.where(nullm, code_row[~nullm][0],
                                         code_row)
                                if nullm.any() else code_row)
                        mask = nullm if nullm.any() else None
                        vals = resolvers[i](safe)
                        if vt in ("str", "binary"):
                            arrays.append(pa.array(
                                list(vals), type=pa.binary(), mask=mask))
                        elif vt in ("double", "float"):
                            arrays.append(pa.array(
                                vals.view(np.float64), type=pa.float64(),
                                mask=mask))
                        else:
                            arrays.append(pa.array(
                                vals.astype(np.int64), type=pa.int64(),
                                mask=mask))
                    names = [f"k{i}" for i in range(len(group_cols))]
                    for j, i in enumerate(live):
                        if _bin_spec(cspecs[i]):
                            extr, sv = spec_sums[j]
                            eu = extr[used]
                            arrays.append(pa.array(
                                [(sv[e] if 0 <= e < len(sv) else None)
                                 for e in eu],
                                type=pa.binary(),
                            ))
                        elif cspecs[i]["kind"] in ("min", "max"):
                            # null-mask empty groups so extremum
                            # sentinels never merge
                            arrays.append(pa.array(
                                spec_sums[j][used],
                                mask=spec_cnts[j][used] == 0,
                            ))
                        else:
                            arrays.append(pa.array(spec_sums[j][used]))
                        arrays.append(pa.array(spec_cnts[j][used]))
                        names += [f"s{i}", f"c{i}"]
                    arrays.append(pa.array(cnt[used].astype(np.int64)))
                    names.append("c")
                    yield pa.RecordBatch.from_arrays(arrays, names=names)

    def lane(vt: str) -> str:
        if vt in ("str", "binary"):
            return "binary"
        if vt in ("double", "float"):
            return "double"
        return "long"

    ddl = ", ".join(
        [f"k{i} {lane(vt)}" for i, vt in enumerate(vts)]
        + [x for i in live for x in (
            f"s{i} {'binary' if _bin_spec(cspecs[i]) else 'long'}",
            f"c{i} long",
        )]
        + ["c long"]
    )
    return (
        _assign_df(spark, [p for p, _ in parts]).mapInArrow(kernel, schema=ddl),
        vts,
        cspecs,
    )


def column_topk_parts(
    spark: SparkSession, out_dir: str, column: str, k: int, descending: bool = True
) -> DataFrame:
    """``SELECT col FROM t ORDER BY col [DESC] LIMIT k`` with zone-map
    block pruning — the ARCADE-thesis answer to top-k: each task sorts
    its partition's blocks by their zone bound and decodes them in
    bound order, STOPPING as soon as the next block's bound cannot beat
    the partition's current k-th value (ties cannot change the result
    multiset, so `bound <= threshold` stops). Blob bytes are fetched
    per block on demand — pruned blocks are never read. Partition
    partials (≤ k values each) merge with one tiny global sort.

    Doubles compare in the order-preserving key domain
    (bits.float_order_keys). String/binary columns dispatch to
    _column_topk_str_parts: their prefix-truncated zone bounds are
    still valid ENVELOPES (min_bin is always a lower bound; an inexact
    max_bin's next-prefix is an exclusive upper bound), so blocks prune
    the same way — see that kernel for the dictionary-replay ordering
    constraint. Nulls are excluded (SQL ORDER BY semantics for a
    LIMIT k of non-null values)."""
    from arcade_spark.bits import float_order_keys
    from arcade_spark.core import decode_int_block
    from arcade_spark.schema import spark_type_for

    all_cols, parts = load_manifest(out_dir)
    vt = dict(all_cols).get(column)
    if vt is None:
        raise KeyError(f"no such column: {column}")
    if vt in ("str", "binary"):
        return _column_topk_str_parts(spark, out_dir, column, k, descending, vt, parts)
    is_float = vt in ("double", "float")
    sign = 1 if descending else -1

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                cf = _ColFile(out_dir, int(pid), column)
                cm = cf.meta()
                hz = np.nonzero(cm.has_zone)[0]
                if len(hz) == 0:
                    continue
                bound = (cm.max_int if descending else cm.min_int)[hz] * sign
                order = hz[np.argsort(-bound, kind="stable")]
                best = np.empty(0, dtype=np.int64)  # key-domain, ascending
                scanned = 0
                for b in order:
                    b = int(b)
                    bnd = int((cm.max_int if descending else cm.min_int)[b]) * sign
                    if len(best) >= k and bnd <= int(best[0]):
                        break
                    blob = cf.payloads(np.array([b], dtype=np.int64), "blob")[b]
                    iblock = decode_int_block(blob, cm.meta_dict(b))
                    v = iblock.values
                    if iblock.validity is not None:
                        v = v[iblock.validity]
                    if len(v) == 0:
                        continue
                    scanned += 1
                    keys = (float_order_keys(v) if is_float else v) * sign
                    best = np.sort(np.concatenate([best, keys]))[-k:]
                # emit the partition partial in the STORED domain
                keys = best * sign
                if is_float:
                    # float_order_keys is its own inverse
                    out = float_order_keys(keys).view(np.float64)
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(out, type=pa.float64())], names=["v"]
                    )
                else:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(keys, type=pa.int64())], names=["v"]
                    )

    from pyspark.sql import functions as F

    ddl = "v double" if is_float else "v long"
    partial = _assign_df(spark, [p for p, _ in parts]).mapInArrow(kernel, schema=ddl)
    ordered = partial.orderBy(F.col("v").desc() if descending else F.col("v").asc())
    out = ordered.limit(k)
    if is_float:
        return out.select(F.col("v").cast(spark_type_for(vt)).alias("v"))
    if vt in ("ts", "tsntz"):
        col = F.timestamp_micros(F.col("v"))
        if vt == "tsntz":
            col = col.cast("timestamp_ntz")
        return out.select(col.alias("v"))
    if vt == "date":
        return out.select(F.date_from_unix_date(F.col("v").cast("int")).alias("v"))
    return out.select(F.col("v").cast(spark_type_for(vt)).alias("v"))


def _next_prefix(p: bytes) -> bytes | None:
    """Smallest byte string greater than EVERY string with prefix
    ``p`` (exclusive upper bound for a truncated zone prefix), or None
    when ``p`` is all 0xff (unbounded)."""
    b = bytearray(p)
    for i in range(len(b) - 1, -1, -1):
        if b[i] != 0xFF:
            return bytes(b[:i]) + bytes([b[i] + 1])
    return None


def _topk_str_part(
    out_dir: str, pid: int, column: str, k: int, descending: bool,
    probe: dict | None = None,
) -> list[bytes]:
    """ORDER BY <string col> LIMIT k for ONE partition, zone-pruned.

    Envelopes from (possibly prefix-truncated) zone bounds: min_bin is
    ALWAYS a valid lower bound (a truncated min prefix understates its
    chunk's true min); the upper bound is max_bin itself when exact,
    else next_prefix(max_bin) — every extension of the prefix is below
    it. A pre-decode threshold t0 comes from metadata alone (take
    blocks by their guaranteed-side bound until ≥ k non-null values are
    guaranteed); blob bytes are fetched ONLY for blocks whose envelope
    can beat t0. Unlike the int kernel, blocks cannot decode in bound
    order — differential-dictionary replay is sequential (writer.cpp
    dict-diff chain) — so the pass runs in block order, replaying
    segments for pruned blocks and tightening the threshold as decoded
    blocks fill the running top-k. ``probe`` (tests) records the block
    rows whose blobs were fetched under key "blob_rows"."""
    from arcade_spark.core import decode_str_block, replay_str_block
    from arcade_spark.gdict import GlobalDictDecoder

    cf = _ColFile(out_dir, pid, column)
    cm = cf.meta()
    nb = cm.n
    n_valid = cm.n_values - cm.n_nulls
    los: list[bytes | None] = []
    his: list[bytes | None] = []  # None = unbounded above
    for i in range(nb):
        mb, xb = cm.min_bin[i], cm.max_bin[i]
        if n_valid[i] == 0 or mb is None or xb is None:
            los.append(None)
            his.append(None)
            continue
        los.append(mb)
        his.append(xb if cm.max_exact[i] else _next_prefix(xb))
    valid = [i for i in range(nb) if los[i] is not None]

    # metadata-only threshold t0: pick blocks by their guaranteed-side
    # bound until >= k values are guaranteed at-least(t0)/at-most(t0)
    t0: bytes | None = None
    if descending:
        cum = 0
        for i in sorted(valid, key=lambda i: los[i], reverse=True):
            cum += int(n_valid[i])
            if cum >= k:
                t0 = los[i]
                break
    else:
        cum = 0
        # unbounded-above blocks can't contribute to the guarantee
        for i in sorted((i for i in valid if his[i] is not None),
                        key=lambda i: his[i]):
            cum += int(n_valid[i])
            if cum >= k:
                t0 = his[i]
                break

    def beats(i: int, t: bytes | None) -> bool:
        if t is None:
            return True
        if descending:
            return his[i] is None or his[i] > t
        return los[i] < t

    alive = np.zeros(nb, dtype=bool)
    for i in valid:
        alive[i] = beats(i, t0)
    aidx = np.nonzero(alive)[0]
    last = int(aidx[-1]) if len(aidx) else -1
    rng = np.arange(nb)
    seg_rows = np.nonzero((cm.stateful | alive) & (rng <= last))[0]
    segs = cf.payloads(seg_rows, "seg")
    blobs = cf.payloads(aidx, "blob")
    if probe is not None:
        probe["blob_rows"] = sorted(int(i) for i in aidx)
        probe["t0"] = t0
    gdec = GlobalDictDecoder()
    best: list[bytes] = []  # sorted ascending, len <= k
    for b in range(last + 1):
        meta = cm.meta_dict(b, segs.get(b, b""))
        t = None
        if len(best) >= k:
            t = best[0] if descending else best[-1]
            if t0 is not None:
                t = max(t, t0) if descending else min(t, t0)
        else:
            t = t0
        if not alive[b] or not beats(b, t):
            replay_str_block(meta, gdec)
            continue
        blk = decode_str_block(blobs[b], meta, gdec)
        arr = blk.to_arrow(binary=True)
        if blk.validity is not None:
            arr = arr.drop_null()
        vals = arr.to_pylist()
        if vals:
            merged = sorted(best + vals)
            best = merged[-k:] if descending else merged[:k]
    return best


def _column_topk_str_parts(
    spark: SparkSession, out_dir: str, column: str, k: int,
    descending: bool, vt: str, parts: list[tuple[int, int]],
) -> DataFrame:
    """String/binary ORDER BY LIMIT k: per-partition zone-pruned
    partials (≤ k values each, see _topk_str_part) merged by one tiny
    global sort."""
    from pyspark.sql import functions as F

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                best = _topk_str_part(out_dir, int(pid), column, k, descending)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(best, type=pa.binary())], names=["v"]
                )

    partial = _assign_df(spark, [p for p, _ in parts]).mapInArrow(
        kernel, schema="v binary"
    )
    ordered = partial.orderBy(F.col("v").desc() if descending else F.col("v").asc())
    out = ordered.limit(k)
    if vt == "str":
        return out.select(F.col("v").cast("string").alias("v"))
    return out


def column_agg_parts(
    spark: SparkSession, out_dir: str, column: str,
    agg_scale: int = AGG_SCALE,
    mode: str = "fixed",
) -> DataFrame:
    """``SELECT sum(col), count(*), count(col), avg(col)``: per-
    partition exact integer partials (nulls excluded from sum/avg, SQL
    semantics), one-row driver fold. Integer sums are exact in any
    order, and avg is a single IEEE division of exact integers — every
    engine reproduces the bytes. double/float columns aggregate through
    the fixed-point contract (quantized_agg_lane): sum_v/avg_v come
    from the exact int64 sum of floor(x·scale+0.5) with single IEEE
    divisions at the end, so they too are cross-engine bit-identical.

    ``mode="ieee"`` (round-5, double/float only): TRUE IEEE float64
    sums for arbitrary doubles the fixed-point contract can't carry
    (huge magnitudes, full precision, ±inf/NaN propagate per IEEE).
    Summation order is PINNED — per-block pairwise np.sum, Kahan
    compensation across blocks in block order, parts folded in part_id
    order on the driver — so the result is deterministic across runs
    and cluster sizes, but only tolerance-comparable (≈1e-15 relative)
    against other engines, which own different orders. Extrema follow
    Spark's NaN-greatest contract layout-independently (any NaN ⇒ max
    NaN; min NaN only if all NaN). Pick fixed for cross-engine hashes,
    ieee for arbitrary-double fidelity. NOTE: ieee mode runs its scan
    EAGERLY (the pinned fold happens at call time) and returns a wider
    schema than fixed mode (adds min_v/max_v)."""
    from arcade_spark.core import decode_int_block
    from arcade_spark.schema import spark_type_for  # noqa: F401

    all_cols, parts = load_manifest(out_dir)
    vt = dict(all_cols).get(column)
    if vt is None:
        raise KeyError(f"no such column: {column}")
    if vt not in _AGG_VTS:
        raise NotImplementedError(f"column_agg {_AGG_GUARD}")
    is_dbl = vt in ("double", "float")
    if mode not in ("fixed", "ieee"):
        raise ValueError(f"mode must be 'fixed' or 'ieee': {mode!r}")
    if mode == "ieee" and not is_dbl:
        raise ValueError("mode='ieee' applies to double/float columns only")

    if mode == "ieee":
        def ikernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            from arcade_spark.decode import _binary_views

            for batch in batches:
                for pid in batch.column("part_id").to_pylist():
                    cf = _ColFile(out_dir, int(pid), column)
                    s = 0.0
                    comp = 0.0  # Kahan compensation across blocks
                    mn = mx = None  # extrema over NON-NaN values
                    has_nan = False
                    cnt_all = 0
                    cnt_col = 0
                    for rg in range(cf.pf.metadata.num_row_groups):
                        tbl = cf.pf.read_row_group(
                            rg, columns=_META_COLS + ["blob"])
                        cm = _ColMeta(tbl)
                        b_off, b_mv = _binary_views(
                            tbl.column("blob").combine_chunks())
                        for i in range(cm.n):
                            iblock = decode_int_block(
                                b_mv[b_off[i]: b_off[i + 1]], cm.meta_dict(i)
                            )
                            v = iblock.values
                            if iblock.validity is not None:
                                v = v[iblock.validity]
                            f = v.view(np.float64)
                            cnt_all += int(cm.n_values[i])
                            cnt_col += len(f)
                            if len(f):
                                bs = float(f.sum())
                                if np.isfinite(bs) and np.isfinite(s):
                                    y = bs - comp
                                    t = s + y
                                    comp = (t - s) - y
                                    s = t
                                else:
                                    # Kahan compensation is NaN-poison
                                    # around ±inf — fall back to plain
                                    # IEEE accumulation
                                    s = s + bs
                                    comp = 0.0
                                # NaN-deterministic extrema (Spark's
                                # NaN-greatest contract, layout-
                                # independent): track NaN presence,
                                # min/max over the non-NaN values
                                nanmask = np.isnan(f)
                                if nanmask.any():
                                    has_nan = True
                                    fv = f[~nanmask]
                                else:
                                    fv = f
                                if len(fv):
                                    bmn = float(np.min(fv))
                                    bmx = float(np.max(fv))
                                    mn = bmn if mn is None else min(mn, bmn)
                                    mx = bmx if mx is None else max(mx, bmx)
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([int(pid)], type=pa.int64()),
                         pa.array([s], type=pa.float64()),
                         pa.array([mn], type=pa.float64()),
                         pa.array([mx], type=pa.float64()),
                         pa.array([bool(has_nan)], type=pa.bool_()),
                         pa.array([cnt_all], type=pa.int64()),
                         pa.array([cnt_col], type=pa.int64())],
                        names=["pid", "s", "mn", "mx", "hn", "ca", "cc"],
                    )

        rows = (
            _assign_df(spark, [p for p, _ in parts])
            .mapInArrow(
                ikernel,
                schema="pid long, s double, mn double, mx double, "
                       "hn boolean, ca long, cc long",
            )
            .collect()
        )
        rows = sorted(rows, key=lambda r: r["pid"])  # pinned fold order
        s = comp = 0.0
        ca = cc = 0
        mn = mx = None
        any_nan = False
        for r in rows:
            if np.isfinite(r["s"]) and np.isfinite(s):
                y = r["s"] - comp
                t = s + y
                comp = (t - s) - y
                s = t
            else:
                s = s + r["s"]
                comp = 0.0
            ca += r["ca"]
            cc += r["cc"]
            any_nan = any_nan or bool(r["hn"])
            if r["mn"] is not None:
                mn = r["mn"] if mn is None else min(mn, r["mn"])
                mx = r["mx"] if mx is None else max(mx, r["mx"])
        # Spark's NaN-greatest extrema contract, layout-independent:
        # any NaN present => max is NaN; min is NaN only when every
        # value is NaN
        if any_nan:
            mx = float("nan")
            if mn is None:
                mn = float("nan")
        avg = (s / float(cc)) if cc else None
        return spark.createDataFrame(
            [(s if cc else None, mn, mx, ca, cc, avg)],
            "sum_v double, min_v double, max_v double, "
            "cnt_all long, cnt_col long, avg_v double",
        )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from arcade_spark.decode import _binary_views

        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                cf = _ColFile(out_dir, int(pid), column)
                total = 0
                cnt_all = 0
                cnt_col = 0
                for rg in range(cf.pf.metadata.num_row_groups):
                    tbl = cf.pf.read_row_group(rg, columns=_META_COLS + ["blob"])
                    cm = _ColMeta(tbl)
                    b_off, b_mv = _binary_views(tbl.column("blob").combine_chunks())
                    for i in range(cm.n):
                        iblock = decode_int_block(
                            b_mv[b_off[i]: b_off[i + 1]], cm.meta_dict(i)
                        )
                        v = iblock.values
                        if iblock.validity is not None:
                            v = v[iblock.validity]
                        v = quantized_agg_lane(v, None, vt, agg_scale)
                        total += int(v.sum()) if len(v) else 0
                        cnt_all += int(cm.n_values[i])
                        cnt_col += len(v)
                yield pa.RecordBatch.from_arrays(
                    [pa.array([total], type=pa.int64()),
                     pa.array([cnt_all], type=pa.int64()),
                     pa.array([cnt_col], type=pa.int64())],
                    names=["s", "ca", "cc"],
                )

    rows = (
        _assign_df(spark, [p for p, _ in parts])
        .mapInArrow(kernel, schema="s long, ca long, cc long")
        .collect()
    )
    s = sum(r["s"] for r in rows)
    ca = sum(r["ca"] for r in rows)
    cc = sum(r["cc"] for r in rows)
    if is_dbl:
        # two single IEEE divisions of exact integers, replayed
        # identically by the oracle: sum = q_total/scale, avg = sum/cc
        sum_d = float(s) / float(agg_scale)
        avg = (sum_d / float(cc)) if cc else None
        return spark.createDataFrame(
            [(sum_d if cc else None, ca, cc, avg)],
            "sum_v double, cnt_all long, cnt_col long, avg_v double",
        )
    avg = (float(s) / float(cc)) if cc else None
    return spark.createDataFrame(
        [(s, ca, cc, avg)], "sum_v long, cnt_all long, cnt_col long, avg_v double"
    )


def column_null_count_parts(
    spark: SparkSession, out_dir: str, column: str
) -> DataFrame:
    """``SELECT count(*), count(col), count(*) - count(col)`` from
    chunk METADATA only: each task reads the column file's
    (n_values, n_nulls) columns — a few KB per partition, no payload
    bytes (parquet column pruning) — and the driver folds |parts|
    partial rows."""
    all_cols, parts = load_manifest(out_dir)
    if column not in dict(all_cols):
        raise KeyError(f"no such column: {column}")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                pf = pq.ParquetFile(blocks_path(out_dir, int(pid), column))
                t = pf.read(columns=["n_values", "n_nulls"])
                cnt = int(np.sum(t.column("n_values").to_numpy(zero_copy_only=False)))
                nulls = int(np.sum(t.column("n_nulls").to_numpy(zero_copy_only=False)))
                yield pa.RecordBatch.from_arrays(
                    [pa.array([cnt], type=pa.int64()),
                     pa.array([nulls], type=pa.int64())],
                    names=["cnt", "nulls"],
                )

    rows = (
        _assign_df(spark, [p for p, _ in parts])
        .mapInArrow(kernel, schema="cnt long, nulls long")
        .collect()
    )
    cnt = sum(r["cnt"] for r in rows)
    nulls = sum(r["nulls"] for r in rows)
    return spark.createDataFrame(
        [(cnt, cnt - nulls, nulls)], "cnt long, n_valid long, n_nulls long"
    )


def column_minmax_parts(spark: SparkSession, out_dir: str, column: str) -> DataFrame:
    """Files-mode ``SELECT min(col), max(col), count(*)``.

    Integer-family columns answer from chunk METADATA only (zone maps
    are non-null-exact since FORMAT_REV 8; float zones invert through
    the order-preserving key map). String columns answer from metadata
    when every extremum-winning chunk's bound is exact (min_bin/max_bin
    ≤ stats.ZONE_MAX_LEN, the common case for short strings); otherwise
    the task falls back to a single-column decode pass FOR ITS OWN
    PARTITION only. Nulls are excluded from min/max (SQL semantics);
    count(*) includes them."""
    import pyarrow.compute as pc

    from arcade_spark.schema import spark_type_for

    all_cols, parts = load_manifest(out_dir)
    vt = dict(all_cols).get(column)
    if vt is None:
        raise KeyError(f"no such column: {column}")
    is_str = vt in ("str", "binary")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from arcade_spark.core import decode_str_block
        from arcade_spark.decode import _binary_views
        from arcade_spark.gdict import GlobalDictDecoder

        for batch in batches:
            for pid in batch.column("part_id").to_pylist():
                cf = _ColFile(out_dir, int(pid), column)
                cm = cf.meta()
                cnt = int(cm.n_values.sum())
                nulls = int(cm.n_nulls.sum())
                if not is_str:
                    hz = cm.has_zone  # all-null chunks carry no zone
                    if hz.any():
                        lo = int(cm.min_int[hz].min())
                        hi = int(cm.max_int[hz].max())
                        lo_a = pa.array([lo], type=pa.int64())
                        hi_a = pa.array([hi], type=pa.int64())
                    else:
                        lo_a = pa.array([None], type=pa.int64())
                        hi_a = pa.array([None], type=pa.int64())
                    yield pa.RecordBatch.from_arrays(
                        [lo_a, hi_a, pa.array([None], type=pa.binary()),
                         pa.array([None], type=pa.binary()),
                         pa.array([cnt], type=pa.int64()),
                         pa.array([nulls], type=pa.int64())],
                        names=["lo_int", "hi_int", "lo_bin", "hi_bin", "cnt", "nulls"],
                    )
                    continue
                # string column: metadata path iff the winning bounds
                # are exact. All-null chunks carry min_bin None.
                lo = hi = None
                meta_ok = True
                for i in range(cm.n):
                    if cm.n_nulls[i] == cm.n_values[i]:
                        continue  # all-null chunk: no extrema
                    mb, xb = cm.min_bin[i], cm.max_bin[i]
                    if mb is None or xb is None:
                        meta_ok = False
                        break
                    if lo is None or mb < lo[0]:
                        lo = (mb, bool(cm.min_exact[i]))
                    # max side: a TIE with an inexact candidate demotes
                    # exactness — the candidate's true max extends the
                    # shared 128-byte prefix and so EXCEEDS the tied
                    # "exact" winner (min side is safe: an inexact tying
                    # prefix understates its chunk's true min, so the
                    # exact winner remains the smaller value)
                    if hi is None or xb > hi[0]:
                        hi = (xb, bool(cm.max_exact[i]))
                    elif xb == hi[0] and not cm.max_exact[i]:
                        hi = (xb, False)
                if meta_ok and lo is not None and not (lo[1] and hi[1]):
                    meta_ok = False
                if not meta_ok:
                    # decode fallback (this partition's column only)
                    gdec = GlobalDictDecoder()
                    lo_v = hi_v = None
                    for rg in range(cf.pf.metadata.num_row_groups):
                        tbl = cf.pf.read_row_group(
                            rg, columns=_META_COLS + ["blob", "seg"]
                        )
                        rcm = _ColMeta(tbl)
                        b_off, b_mv = _binary_views(tbl.column("blob").combine_chunks())
                        s_off, s_mv = _binary_views(tbl.column("seg").combine_chunks())
                        for i in range(rcm.n):
                            meta = rcm.meta_dict(i, s_mv[s_off[i]: s_off[i + 1]])
                            blk = decode_str_block(
                                b_mv[b_off[i]: b_off[i + 1]], meta, gdec
                            )
                            arr = blk.to_arrow(binary=True)
                            if blk.validity is not None:
                                arr = arr.drop_null()
                            if len(arr) == 0:
                                continue
                            mm = pc.min_max(arr)
                            bmn, bmx = mm["min"].as_py(), mm["max"].as_py()
                            if lo_v is None or bmn < lo_v:
                                lo_v = bmn
                            if hi_v is None or bmx > hi_v:
                                hi_v = bmx
                    lo_b, hi_b = lo_v, hi_v
                else:
                    lo_b = None if lo is None else lo[0]
                    hi_b = None if hi is None else hi[0]
                yield pa.RecordBatch.from_arrays(
                    [pa.array([None], type=pa.int64()),
                     pa.array([None], type=pa.int64()),
                     pa.array([lo_b], type=pa.binary()),
                     pa.array([hi_b], type=pa.binary()),
                     pa.array([cnt], type=pa.int64()),
                     pa.array([nulls], type=pa.int64())],
                    names=["lo_int", "hi_int", "lo_bin", "hi_bin", "cnt", "nulls"],
                )

    ddl = "lo_int long, hi_int long, lo_bin binary, hi_bin binary, cnt long, nulls long"
    rows = _assign_df(spark, [p for p, _ in parts]).mapInArrow(kernel, schema=ddl).collect()

    cnt = sum(r["cnt"] for r in rows)
    if is_str:
        los = [r["lo_bin"] for r in rows if r["lo_bin"] is not None]
        his = [r["hi_bin"] for r in rows if r["hi_bin"] is not None]
        lo_v = min(los) if los else None
        hi_v = max(his) if his else None
        if vt == "str":
            lo_v = lo_v.decode() if lo_v is not None else None
            hi_v = hi_v.decode() if hi_v is not None else None
        ddl_out = f"min_v {spark_type_for(vt)}, max_v {spark_type_for(vt)}, cnt long"
        return spark.createDataFrame([(lo_v, hi_v, cnt)], ddl_out)

    los = [r["lo_int"] for r in rows if r["lo_int"] is not None]
    his = [r["hi_int"] for r in rows if r["hi_int"] is not None]
    lo = min(los) if los else None
    hi = max(his) if his else None
    ddl_out = f"min_v {spark_type_for(vt)}, max_v {spark_type_for(vt)}, cnt long"
    if vt in ("double", "float"):

        def unkey(k: int | None) -> float | None:
            if k is None:
                return None
            from arcade_spark.bits import float_order_keys

            # scalar involution: key -> raw IEEE bit pattern
            bits = float_order_keys(np.array([k], dtype=np.int64))[0]
            return float(np.int64(bits).view(np.float64))

        return spark.createDataFrame([(unkey(lo), unkey(hi), cnt)], ddl_out)
    if vt in ("ts", "tsntz"):
        import datetime as _dt

        def to_dt(us: int | None):
            if us is None:
                return None
            # exact integer micros (no float division); UTC attached for
            # tz-aware columns so the result is session-timezone-proof
            base = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc if vt == "ts" else None)
            return base + _dt.timedelta(microseconds=int(us))

        return spark.createDataFrame([(to_dt(lo), to_dt(hi), cnt)], ddl_out)
    if vt == "date":
        import datetime as _dt

        def to_date(days: int | None):
            return None if days is None else _dt.date(1970, 1, 1) + _dt.timedelta(days=int(days))

        return spark.createDataFrame([(to_date(lo), to_date(hi), cnt)], ddl_out)
    if vt == "bool":
        lo_b = bool(lo) if lo is not None else None
        hi_b = bool(hi) if hi is not None else None
        return spark.createDataFrame([(lo_b, hi_b, cnt)], ddl_out)
    lo_i = int(lo) if lo is not None else None
    hi_i = int(hi) if hi is not None else None
    return spark.createDataFrame([(lo_i, hi_i, cnt)], ddl_out)
