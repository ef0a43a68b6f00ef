"""Bit-level helpers shared by every codec: bit-packing, zigzag, section
framing. All vectorized numpy — no per-element Python in any hot path.

The reference minimizes code width per dictionary size to 1/2/4 bytes
(writer.cpp:198-252); we generalize to arbitrary bit widths via
``np.packbits``/``np.unpackbits`` (LSB-first), which parquet-style
bit-packing also uses.
"""

from __future__ import annotations

import struct

import numpy as np


def bit_width(max_value: int) -> int:
    """Bits needed to represent values in [0, max_value]."""
    if max_value < 0:
        raise ValueError("bit_width requires non-negative max_value")
    return int(max_value).bit_length()


def pack_uints(a: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers < 2**width into a little-endian bit
    stream of `width` bits each. width == 0 packs to b'' (all zeros)."""
    if width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    a = np.ascontiguousarray(a, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((a[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_uints(buf: bytes | memoryview, width: int, n: int) -> np.ndarray:
    """Inverse of pack_uints → uint64[n]."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    flat = np.unpackbits(raw, count=n * width, bitorder="little")
    bits = flat.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def zigzag_encode(a: np.ndarray) -> np.ndarray:
    """int64 → uint64 zigzag (0,-1,1,-2 → 0,1,2,3)."""
    a = np.ascontiguousarray(a, dtype=np.int64)
    return ((a << 1) ^ (a >> 63)).view(np.uint64)


def zigzag_decode(a: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.uint64)
    return ((a >> np.uint64(1)).view(np.int64)) ^ -(a & np.uint64(1)).astype(np.int64)


def pack_sections(*sections: bytes) -> bytes:
    """Frame N byte sections: u32 count, u32 sizes, then payloads."""
    head = struct.pack("<I", len(sections)) + b"".join(
        struct.pack("<I", len(s)) for s in sections
    )
    return head + b"".join(sections)


def unpack_sections(buf: bytes | memoryview) -> list[memoryview]:
    mv = memoryview(buf)
    (count,) = struct.unpack_from("<I", mv, 0)
    sizes = struct.unpack_from(f"<{count}I", mv, 4)
    out = []
    off = 4 + 4 * count
    for s in sizes:
        out.append(mv[off : off + s])
        off += s
    return out


def pack_validity(mask: np.ndarray | None) -> bytes:
    """Null bitmap: 1 = valid, LSB-first; b'' when no nulls."""
    if mask is None:
        return b""
    return np.packbits(mask.astype(np.uint8), bitorder="little").tobytes()


def unpack_validity(buf: bytes | memoryview, n: int) -> np.ndarray | None:
    if len(buf) == 0:
        return None
    return np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=n, bitorder="little"
    ).astype(bool)
