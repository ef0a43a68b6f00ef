"""Single-block encode/decode API: profile → select → encode, with the
validity bitmap and codec payload framed into one self-describing blob.
This is the pure-Python core the Spark kernels (encode.py / decode.py)
call per Arrow batch — unit-testable without a SparkSession.

Blob layout: sections(validity_bitmap, codec_payload). Everything else
(codec id, widths, dict lineage, zone map) lives in the chunk's manifest
row — the queryable analogue of ARCADE's ``struct D`` header
(process.h:5-14).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from arcade_spark.bits import pack_sections, pack_validity, unpack_sections, unpack_validity
from arcade_spark.blocks import IntBlock, StrBlock
from arcade_spark.codecs.intcodecs import INT_DECODERS, INT_ENCODERS
from arcade_spark.codecs import strcodecs as sc
from arcade_spark.gdict import GlobalDict, GlobalDictDecoder
from arcade_spark.postpass import maybe_post, unpost
from arcade_spark.selector import choose_int_codec, choose_str_codec
from arcade_spark.stats import profile_int_block, profile_str_block


def _str_zone(block: StrBlock, stats) -> tuple[bytes | None, bytes | None, bool, bool]:
    """Zone-map bounds over NON-NULL values only (FORMAT_REV 8): null
    slots hold b'' sentinels that would poison the minimum, and SQL
    min/max exclude nulls — so do the zone maps (safe for filter
    pruning too: null rows never match a predicate)."""
    if block.validity is None:
        return stats.min_val, stats.max_val, stats.min_exact, stats.max_exact
    import pyarrow.compute as pc

    from arcade_spark.stats import ZONE_MAX_LEN

    arr = block.to_arrow(binary=True).drop_null()
    if len(arr) == 0:
        return None, None, False, False
    mm = pc.min_max(arr)
    mn_full, mx_full = mm["min"].as_py(), mm["max"].as_py()
    return (
        mn_full[:ZONE_MAX_LEN],
        mx_full[:ZONE_MAX_LEN],
        len(mn_full) <= ZONE_MAX_LEN,
        len(mx_full) <= ZONE_MAX_LEN,
    )


def encode_str_block(
    block: StrBlock, gdict: GlobalDict, fsst_rounds: int = 0
) -> tuple[bytes, dict[str, Any]]:
    """``fsst_rounds`` selects the string-codec profile: 0 (default,
    THROUGHPUT) keeps 1-2-byte FSST symbols; >0 (RATIO) enables that
    many pair-merge rounds (symbols up to 8 bytes) with a post-aware
    size estimate — measured Pareto in BENCH/BASELINE.md."""
    stats = profile_str_block(block)
    decision = choose_str_codec(stats, gdict, block, fsst_rounds=fsst_rounds)

    if decision.reset_before:
        gdict.reset()

    codec = decision.codec
    if codec == "plain":
        payload, cmeta = sc.encode_plain(block)
    elif codec == "fsst":
        payload, cmeta = sc.encode_fsst(block, rounds=fsst_rounds)
    elif codec == "rle_str":
        payload, cmeta = sc.encode_rle_str(block, stats.fact)
    elif codec == "dict_local":
        payload, cmeta = sc.encode_dict_local(block, stats.fact)
        if decision.seed_gdict:
            gdict.append([bytes(v) for v in stats.fact.uniques])
    elif codec == "dict_global":
        payload, cmeta = sc.encode_dict_global(block, stats.fact, gdict)
    else:  # pragma: no cover
        raise ValueError(codec)

    seg = cmeta.pop("seg", b"")
    payload, post = maybe_post(payload, codec)
    blob = pack_sections(pack_validity(block.validity), payload)
    zmin, zmax, zmin_exact, zmax_exact = _str_zone(block, stats)
    meta: dict[str, Any] = {
        "codec": codec,
        "post": post,
        "n_values": block.n,
        "raw_bytes": block.nbytes,
        "encoded_bytes": len(blob) + len(seg),
        "seg": seg,
        "n_distinct": stats.n_distinct,
        "n_runs": stats.n_runs,
        "n_nulls": int((~block.validity).sum()) if block.validity is not None else 0,
        "code_width": cmeta.get("code_width", 0),
        "dict_len": cmeta.get("dict_len", 0),
        "global_start": cmeta.get("global_start", -1),
        "global_size": cmeta.get("global_size", -1),
        "gdict_epoch": gdict.epoch,
        "gdict_reset": decision.reset_before,
        "gdict_seed": decision.seed_gdict,
        "min_bin": zmin,
        "max_bin": zmax,
        "min_exact": zmin_exact,
        "max_exact": zmax_exact,
        "min_int": None,
        "max_int": None,
        "entropy": stats.entropy,
    }
    return blob, meta


def decode_str_block(blob, meta: dict[str, Any], gdec: GlobalDictDecoder) -> StrBlock:
    validity_sec, payload = unpack_sections(blob)
    payload = unpost(payload, meta.get("post"))
    validity = unpack_validity(validity_sec, meta["n_values"])
    codec = meta["codec"]

    if meta.get("gdict_reset"):
        gdec.reset()

    if codec == "plain":
        out = sc.decode_plain(payload, meta)
    elif codec == "fsst":
        out = sc.decode_fsst(payload, meta)
    elif codec == "rle_str":
        out = sc.decode_rle_str(payload, meta)
    elif codec == "dict_local":
        out = sc.decode_dict_local(payload, meta)
        if meta.get("gdict_seed"):
            gdec.append(sc._deserialize_values_arrow(meta["seg"]))
    elif codec == "dict_global":
        out = sc.decode_dict_global(payload, meta, gdec)
    else:  # pragma: no cover
        raise ValueError(codec)

    out.validity = validity
    return out


def replay_str_block(meta: dict[str, Any], gdec: GlobalDictDecoder) -> None:
    """Advance the running-dictionary state without materializing values
    — used for zone-map-skipped blocks (SURVEY.md §4 O2; the reference
    resolves skipped blocks' segments via previndex, process.cpp:88-123).
    Needs only the chunk's ``seg`` (in meta) — the blob never ships for
    replay-only chunks (FORMAT_REV 6)."""
    if meta.get("gdict_reset"):
        gdec.reset()
    codec = meta["codec"]
    if codec == "dict_global" or (codec == "dict_local" and meta.get("gdict_seed")):
        gdec.append(sc._deserialize_values_arrow(meta["seg"]))


def encode_int_block(block: IntBlock, vtype: str = "int") -> tuple[bytes, dict[str, Any]]:
    stats = profile_int_block(block)
    decision = choose_int_codec(stats)
    # zone extrema over NON-NULL slots only (FORMAT_REV 8): null slots
    # hold 0 sentinels that would poison min/max; filters never match
    # null rows, so the narrower zones stay prune-safe and make
    # column_minmax metadata-exact under nulls. All-null ⇒ no zone.
    zvals = block.values if block.validity is None else block.values[block.validity]
    if len(zvals) == 0:
        zone_min = zone_max = None
    elif vtype in ("double", "float"):
        # zone maps for float columns live in the order-preserving key
        # domain (bits.float_order_keys) — raw bitcast min/max is not
        # ordered for negative floats and would prune wrongly
        from arcade_spark.bits import float_order_keys

        keys = float_order_keys(zvals)
        zone_min, zone_max = int(keys.min()), int(keys.max())
    else:
        zone_min, zone_max = int(zvals.min()), int(zvals.max())
    payload, cmeta = INT_ENCODERS[decision.codec](block.values)
    payload, post = maybe_post(payload, decision.codec)
    blob = pack_sections(pack_validity(block.validity), payload)
    meta: dict[str, Any] = {
        "codec": decision.codec,
        "post": post,
        "n_values": block.n,
        "raw_bytes": block.nbytes,
        "encoded_bytes": len(blob),
        "seg": b"",
        "n_distinct": stats.n_distinct,
        "n_runs": stats.n_runs,
        "n_nulls": int((~block.validity).sum()) if block.validity is not None else 0,
        "code_width": cmeta.get("code_width", 0),
        "dict_len": 0,
        "global_start": -1,
        "global_size": -1,
        "gdict_epoch": 0,
        "gdict_reset": False,
        "gdict_seed": False,
        "min_bin": None,
        "max_bin": None,
        "min_exact": True,
        "max_exact": True,
        "min_int": zone_min,
        "max_int": zone_max,
        "entropy": 0.0,
    }
    return blob, meta


def decode_int_block(blob, meta: dict[str, Any]) -> IntBlock:
    validity_sec, payload = unpack_sections(blob)
    payload = unpost(payload, meta.get("post"))
    validity = unpack_validity(validity_sec, meta["n_values"])
    values = INT_DECODERS[meta["codec"]](payload, meta)
    return IntBlock(values=np.asarray(values, dtype=np.int64), validity=validity)


def decode_str_positions(blob, meta: dict[str, Any], positions, gdec: GlobalDictDecoder):
    """Late materialization (ARCADE R6, process.cpp:4-180): decode only
    the requested positions of a string chunk, advancing running-dict
    state exactly as a full decode would. For dictionary codecs this
    touches codes[positions] + a dictionary take — never the whole
    block's payload. Returns a StrBlock of len(positions) (validity
    applied); ``positions`` must be sorted ascending."""
    import numpy as np
    import pyarrow as pa

    from arcade_spark.bits import unpack_uints
    from arcade_spark.blocks import StrBlock, strblock_from_arrow
    from arcade_spark.codecs import strcodecs as sc

    pos = np.asarray(positions, dtype=np.int64)
    uniq = np.unique(pos)
    if len(uniq) < len(pos):
        # duplicate positions (e.g. random_access with repeated row
        # ids): the plain/fsst keep-mask below would keep one payload
        # copy while duplicating lengths — decode the unique set once
        # (single state advance), then re-expand by take
        inv = np.searchsorted(uniq, pos)
        blk = decode_str_positions(blob, meta, uniq, gdec)
        arr = blk.to_arrow(binary=True).take(pa.array(inv, type=pa.int64()))
        return strblock_from_arrow(arr)

    validity_sec, payload = unpack_sections(blob)
    payload = unpost(payload, meta.get("post"))
    validity = unpack_validity(validity_sec, meta["n_values"])
    codec = meta["codec"]
    n = meta["n_values"]

    if meta.get("gdict_reset"):
        gdec.reset()

    if codec == "dict_global":
        gdec.append(sc._deserialize_values_arrow(meta["seg"]))
        codes = unpack_uints(payload, meta["code_width"], n).view(np.int64)
        out = gdec.take_block(codes[pos])
    elif codec == "dict_local":
        uniques = sc._deserialize_values_arrow(meta["seg"])
        if meta.get("gdict_seed"):
            gdec.append(uniques)
        codes = unpack_uints(payload, meta["code_width"], n).view(np.int64)
        out = sc._take_to_block(uniques, codes[pos])
    elif codec == "rle_str":
        import struct as _struct

        dict_sec, codes_sec, lens_sec = unpack_sections(payload)
        uniques = sc._deserialize_values_arrow(dict_sec)
        (nruns,) = _struct.unpack_from("<I", codes_sec, 0)
        run_codes = unpack_uints(codes_sec[4:], meta["code_width"], nruns).view(np.int64)
        from arcade_spark.codecs.intcodecs import decode_for_int

        run_lens = decode_for_int(lens_sec, {"n_values": nruns})
        ends = np.cumsum(run_lens)
        run_of = np.searchsorted(ends, pos, side="right")
        out = sc._take_to_block(uniques, run_codes[run_of])
    elif codec == "plain":
        lens_sec, data_sec = unpack_sections(payload)
        from arcade_spark.codecs.intcodecs import decode_for_int

        lengths = decode_for_int(lens_sec, {"n_values": n})
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offs[1:])
        data = np.frombuffer(data_sec, dtype=np.uint8)
        keep = np.zeros(len(data), dtype=bool)
        for p in pos:  # len(pos) is small by construction (matches only)
            keep[offs[p] : offs[p + 1]] = True
        out = StrBlock(lengths=lengths[pos], payload=data[keep].tobytes())
    else:  # fsst: payload must be expanded anyway
        full = sc.decode_fsst(payload, meta)
        offs = full.offsets()
        data = np.frombuffer(full.payload, dtype=np.uint8)
        keep = np.zeros(len(data), dtype=bool)
        for p in pos:
            keep[offs[p] : offs[p + 1]] = True
        out = StrBlock(lengths=full.lengths[pos], payload=data[keep].tobytes())

    out.validity = validity[pos] if validity is not None else None
    return out
