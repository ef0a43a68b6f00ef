"""Codec registry. Every codec is a pair of pure functions

    encode(block, ctx) -> (payload: bytes, meta: dict)
    decode(payload, meta, ctx) -> block

vectorized numpy/Arrow end-to-end (the north rule forbids per-row
Python). String codecs operate on ``StrBlock``; integer codecs on
``IntBlock``. ``ctx`` carries the per-partition running global
dictionary for the differential codec (ARCADE's per-file dict scope —
writer.cpp:167-253)."""

from arcade_spark.codecs import intcodecs, strcodecs  # noqa: F401

STRING_CODECS = ("plain", "dict_local", "dict_global", "rle_str", "fsst")
INT_CODECS = ("plain_int", "bitpack", "for_int", "delta_int", "rle_int")
