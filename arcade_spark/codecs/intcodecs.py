"""Integer codecs: plain, bit-packing, frame-of-reference, delta,
run-length. These extend the reference's string-only format per the
north star ("Other datatypes" is an unchecked roadmap item in the
reference — README.md:115-117). All operate on int64 numpy arrays.

Each encode returns (payload, meta) where meta holds only small scalars
that go to the manifest; payload is self-contained for decode given meta.
"""

from __future__ import annotations

import struct

import numpy as np

from arcade_spark.bits import (
    bit_width,
    pack_uints,
    unpack_uints,
    zigzag_decode,
    zigzag_encode,
)

# ---------------------------------------------------------------- plain


def encode_plain_int(values: np.ndarray) -> tuple[bytes, dict]:
    payload = np.ascontiguousarray(values, dtype=np.int64).tobytes()
    return payload, {"codec": "plain_int", "n_values": len(values)}


def decode_plain_int(payload, meta) -> np.ndarray:
    return np.frombuffer(payload, dtype=np.int64).copy()


# ------------------------------------------------------------- bitpack
# Non-negative values packed at ceil(log2(max+1)) bits (generalizes the
# reference's 1/2/4-byte code-width minimization — writer.cpp:198-252).


def encode_bitpack(values: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) and v.min() < 0:
        raise ValueError("bitpack requires non-negative values; use for_int/delta_int")
    w = bit_width(int(v.max())) if len(v) else 0
    payload = struct.pack("<B", w) + pack_uints(v.view(np.uint64), w)
    return payload, {"codec": "bitpack", "n_values": len(v), "code_width": w}


def decode_bitpack(payload, meta) -> np.ndarray:
    mv = memoryview(payload)
    (w,) = struct.unpack_from("<B", mv, 0)
    n = meta["n_values"]
    return unpack_uints(mv[1:], w, n).view(np.int64)


# ---------------------------------------------------- frame-of-reference


def encode_for_int(values: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values, dtype=np.int64)
    frame = int(v.min()) if len(v) else 0
    rel = (v - frame).view(np.uint64)
    w = bit_width(int(rel.max())) if len(v) else 0
    payload = struct.pack("<qB", frame, w) + pack_uints(rel, w)
    return payload, {"codec": "for_int", "n_values": len(v), "code_width": w}


def decode_for_int(payload, meta) -> np.ndarray:
    mv = memoryview(payload)
    frame, w = struct.unpack_from("<qB", mv, 0)
    n = meta["n_values"]
    rel = unpack_uints(mv[9:], w, n)
    return (rel.view(np.int64) + frame).astype(np.int64)


# ----------------------------------------------------------- delta
# First value as frame, zigzagged deltas bit-packed — for
# sorted/monotone columns (warc_ts within a crawl session, row ids).


def encode_delta_int(values: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values, dtype=np.int64)
    first = int(v[0]) if len(v) else 0
    deltas = np.diff(v) if len(v) else np.empty(0, dtype=np.int64)
    zz = zigzag_encode(deltas)
    w = bit_width(int(zz.max())) if len(zz) else 0
    payload = struct.pack("<qB", first, w) + pack_uints(zz, w)
    return payload, {"codec": "delta_int", "n_values": len(v), "code_width": w}


def decode_delta_int(payload, meta) -> np.ndarray:
    mv = memoryview(payload)
    first, w = struct.unpack_from("<qB", mv, 0)
    n = meta["n_values"]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    deltas = zigzag_decode(unpack_uints(mv[9:], w, n - 1))
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    np.cumsum(deltas, out=out[1:]) if n > 1 else None
    out[1:] += first
    return out


# ------------------------------------------------------------- rle_int


def int_runs(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_values, run_lengths) for an int64 array."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return v, np.empty(0, dtype=np.int64)
    change = np.nonzero(v[1:] != v[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    lengths = np.diff(np.concatenate([starts, [len(v)]]))
    return v[starts], lengths.astype(np.int64)


def encode_rle_int(values: np.ndarray) -> tuple[bytes, dict]:
    rv, rl = int_runs(values)
    vals_payload, _ = encode_for_int(rv)
    lens_zz = rl.view(np.uint64)
    lw = bit_width(int(lens_zz.max())) if len(rl) else 0
    payload = (
        struct.pack("<IIB", len(values), len(rv), lw)
        + struct.pack("<I", len(vals_payload))
        + vals_payload
        + pack_uints(lens_zz, lw)
    )
    return payload, {"codec": "rle_int", "n_values": len(values), "n_runs": len(rv)}


def decode_rle_int(payload, meta) -> np.ndarray:
    mv = memoryview(payload)
    n, nruns, lw = struct.unpack_from("<IIB", mv, 0)
    (vp_size,) = struct.unpack_from("<I", mv, 9)
    off = 13
    rv = decode_for_int(mv[off : off + vp_size], {"n_values": nruns})
    rl = unpack_uints(mv[off + vp_size :], lw, nruns).view(np.int64)
    return np.repeat(rv, rl)


INT_ENCODERS = {
    "plain_int": encode_plain_int,
    "bitpack": encode_bitpack,
    "for_int": encode_for_int,
    "delta_int": encode_delta_int,
    "rle_int": encode_rle_int,
}

INT_DECODERS = {
    "plain_int": decode_plain_int,
    "bitpack": decode_bitpack,
    "for_int": decode_for_int,
    "delta_int": decode_delta_int,
    "rle_int": decode_rle_int,
}
