"""Post-pass entropy coding, generalizing the reference's snappy over
serialized dictionaries (writer.cpp:182-187, README.md:120). Applied
only to codecs whose payload must be fully materialized to read anyway
(plain/fsst/plain_int) — never to dictionary code arrays, so predicate
evaluation on codes (process.cpp:358-400 semantics) still needs no
decompression."""

from __future__ import annotations

import struct

import pyarrow as pa

_ZSTD = pa.Codec("zstd", compression_level=1)
POST_MIN_BYTES = 4096
POST_MIN_GAIN = 0.90
_POSTABLE = {"plain", "fsst", "plain_int"}


def maybe_post(payload: bytes, codec: str) -> tuple[bytes, str]:
    if codec in _POSTABLE and len(payload) >= POST_MIN_BYTES:
        comp = _ZSTD.compress(payload, asbytes=True)
        if len(comp) < len(payload) * POST_MIN_GAIN:
            return struct.pack("<I", len(payload)) + comp, "zstd"
    return payload, ""


def unpost(payload, post: str | None):
    if post == "zstd":
        mv = memoryview(payload)
        (orig,) = struct.unpack_from("<I", mv, 0)
        return _ZSTD.decompress(bytes(mv[4:]), orig, asbytes=True)
    return payload


def zstd_sample_ratio(payload: bytes, cap: int = 65536) -> float:
    """Selector estimate of the post-pass gain on a payload sample."""
    sample = payload[:cap]
    if len(sample) < POST_MIN_BYTES:
        return 1.0
    return len(_ZSTD.compress(sample, asbytes=True)) / len(sample)
