"""Per-block column profiling: cardinality, run lengths, value range,
entropy — the statistics the cost-model selector consumes (the reference
profiles distinct set + min/max per block in compress_batch,
writer.cpp:56-61; run/entropy stats are our north-star extension).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow.compute as pc

from arcade_spark.blocks import IntBlock, StrBlock
from arcade_spark.codecs.strcodecs import StrFactor, factorize_block

ZONE_MAX_LEN = 128
SAMPLE_ROWS = 4096


@dataclass
class StrStats:
    n: int
    n_distinct: int  # exact when fact is present, sample-scaled otherwise
    payload_bytes: int
    n_runs: int
    min_val: bytes
    max_val: bytes
    min_exact: bool
    max_exact: bool
    entropy: float  # byte entropy (bits/byte) of a payload sample
    fact: StrFactor | None  # None ⇒ high-cardinality shortcut (plain rule)

    @property
    def distinct_ratio(self) -> float:
        return self.n_distinct / self.n if self.n else 0.0


def _sample_entropy(payload: bytes, cap: int = 65536) -> float:
    if not payload:
        return 0.0
    data = np.frombuffer(payload[:cap], dtype=np.uint8)
    counts = np.bincount(data, minlength=256)
    p = counts[counts > 0] / len(data)
    return float(-(p * np.log2(p)).sum())


def profile_str_block(block: StrBlock) -> StrStats:
    """Profile a string block. Big high-cardinality blocks (html, text,
    url) take a shortcut: a SAMPLE_ROWS-row factorization estimates the
    distinct ratio; when it already exceeds the plain rule's 0.80
    threshold (writer.cpp:63) the dictionary codecs are off the table,
    so the full (expensive) factorization is skipped entirely and
    min/max come from Arrow's C min_max kernel."""
    n = block.n
    if n > SAMPLE_ROWS:
        head = StrBlock(
            lengths=block.lengths[:SAMPLE_ROWS],
            payload=bytes(
                memoryview(block.payload)[: int(block.lengths[:SAMPLE_ROWS].sum())]
            ),
            validity=None if block.validity is None else block.validity[:SAMPLE_ROWS],
        )
        sample_fact = factorize_block(head)
        sample_ratio = sample_fact.n_distinct / SAMPLE_ROWS
        if sample_ratio > 0.85:
            # zone maps on long high-cardinality values (html/text) never
            # prune (min/max of near-unique blobs brackets everything) —
            # skip the full min/max pass; a None zone map disables
            # pruning for the block, which is correctness-neutral
            avg_len = len(block.payload) / max(n, 1)
            if avg_len > 192:
                mn = mx = None
                min_exact = max_exact = False
            else:
                mm = pc.min_max(block.to_arrow(binary=True))
                mn_full = mm["min"].as_py() or b""
                mn = mn_full[:ZONE_MAX_LEN]
                mx_full = mm["max"].as_py() or b""
                mx = mx_full[:ZONE_MAX_LEN]
                # a prefix lower bound is always SAFE for pruning, but
                # only exact (= the true minimum, usable by metadata
                # min/max) when nothing was truncated
                min_exact = len(mn_full) <= ZONE_MAX_LEN
                max_exact = len(mx_full) <= ZONE_MAX_LEN
            return StrStats(
                n=n,
                n_distinct=int(sample_ratio * n),
                payload_bytes=len(block.payload),
                n_runs=n,
                min_val=mn,
                max_val=mx,
                min_exact=min_exact,
                max_exact=max_exact,
                entropy=_sample_entropy(block.payload),
                fact=None,
            )
    fact = factorize_block(block)
    codes = fact.codes
    n_runs = int((codes[1:] != codes[:-1]).sum()) + 1 if n else 0
    mn = bytes(fact.uniques[0]) if n else b""
    mx = bytes(fact.uniques[-1]) if n else b""
    return StrStats(
        n=n,
        n_distinct=fact.n_distinct,
        payload_bytes=len(block.payload),
        n_runs=n_runs,
        min_val=mn[:ZONE_MAX_LEN],
        max_val=mx[:ZONE_MAX_LEN],
        min_exact=len(mn) <= ZONE_MAX_LEN,
        max_exact=len(mx) <= ZONE_MAX_LEN,
        entropy=_sample_entropy(block.payload),
        fact=fact,
    )


@dataclass
class IntStats:
    n: int
    n_distinct: int
    min_val: int
    max_val: int
    n_runs: int
    is_sorted: bool
    max_abs_delta: int


def profile_int_block(block: IntBlock) -> IntStats:
    v = block.values
    n = len(v)
    if n == 0:
        return IntStats(0, 0, 0, 0, 0, True, 0)
    deltas = np.diff(v) if n > 1 else np.empty(0, dtype=np.int64)
    n_runs = int((deltas != 0).sum()) + 1
    return IntStats(
        n=n,
        n_distinct=int(len(np.unique(v))),
        min_val=int(v.min()),
        max_val=int(v.max()),
        n_runs=n_runs,
        is_sorted=bool((deltas >= 0).all()) if n > 1 else True,
        max_abs_delta=int(np.abs(deltas).max()) if n > 1 else 0,
    )
