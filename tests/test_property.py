"""Property-based round-trips (hypothesis): decode(encode(x)) == x for
arbitrary byte-string and int64 columns through the full auto-selecting
core API — the strongest form of the north-rule lossless invariant."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from arcade_spark.blocks import IntBlock, object_array_to_strblock
from arcade_spark.core import (
    decode_int_block,
    decode_str_block,
    encode_int_block,
    encode_str_block,
)
from arcade_spark.gdict import GlobalDict, GlobalDictDecoder

bytes_values = st.lists(
    st.one_of(st.binary(max_size=64), st.none()), min_size=0, max_size=300
)


@settings(max_examples=60, deadline=None)
@given(bytes_values)
def test_str_block_roundtrip(values):
    blk = object_array_to_strblock(np.array(values, dtype=object))
    blob, meta = encode_str_block(blk, GlobalDict())
    out = decode_str_block(blob, meta, GlobalDictDecoder())
    assert list(out.to_object_array()) == values


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=300
    )
)
def test_int_block_roundtrip(values):
    blk = IntBlock(values=np.array(values, dtype=np.int64))
    blob, meta = encode_int_block(blk)
    out = decode_int_block(blob, meta)
    assert list(out.values) == values


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from([b"a", b"bb", b"ccc", b"dddd", b"\xff" * 5]),
                 min_size=1, max_size=200),
        min_size=1,
        max_size=6,
    )
)
def test_block_sequence_roundtrip(blocks):
    """Multi-block sequences exercise differential-dict state + resets."""
    gdict, gdec = GlobalDict(), GlobalDictDecoder()
    encoded = []
    for vals in blocks:
        blk = object_array_to_strblock(np.array(vals, dtype=object))
        blob, meta = encode_str_block(blk, gdict)
        encoded.append((blob, meta, vals))
    for blob, meta, vals in encoded:
        out = decode_str_block(blob, meta, gdec)
        assert list(out.to_object_array()) == vals
