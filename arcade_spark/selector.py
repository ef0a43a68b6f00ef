"""Greedy cost-model codec selector — replicates ARCADE's adaptive
per-block decision logic (writer.cpp:48-376) and extends it to the
north-star codec set (RLE, FSST, bit-pack, frame-of-reference).

Decision layers for string blocks, in order:

1. **Plain rule** (writer.cpp:63): distinct/count > 0.80 → dictionary
   codecs are off the table and the running global dictionary resets
   (writer.cpp:66-71). Our extension FSST may still beat plain by
   estimated bytes (it targets exactly this regime — unique-but-
   redundant URLs).
2. **Global-vs-local dictionary** (writer.cpp:85-163): local when the
   global dict is empty (seeds it — writer.cpp:114-116 + scan reset
   semantics process.cpp:458-471), when the memory budget would be
   exceeded (CACHE_SIZE, writer.cpp:52, :114-116), or when the block is
   ≥99% novel (diff/distinct > 0.99, writer.cpp:117); otherwise the
   cheaper of the two by estimated encoded bytes (a simplification of
   the reference's projected-blocks formula, writer.cpp:119-161 — ours
   compares this block's actual candidate sizes, which is the same
   greedy spirit without the forward projection).
3. **Codec tournament**: the surviving dictionary variant competes with
   RLE and FSST on estimated encoded bytes; minimum wins. Estimates are
   exact for dict/RLE (computed from the factorization) and
   sample-scaled for FSST.

The selector is a pure function of (stats, global-dict state) → decision,
unit-tested per regime in tests/test_selector.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from arcade_spark import DICT_MEMORY_CAP, NOVELTY_RATIO, PLAIN_DISTINCT_RATIO
from arcade_spark.bits import bit_width
from arcade_spark.blocks import IntBlock, StrBlock
from arcade_spark.codecs.strcodecs import estimate_fsst_bytes
from arcade_spark.postpass import zstd_sample_ratio
from arcade_spark.gdict import GlobalDict
from arcade_spark.stats import IntStats, StrStats

_SECTION_OVERHEAD = 32


@dataclass
class StrDecision:
    codec: str
    reset_before: bool  # reset the running global dict before encoding
    seed_gdict: bool  # dict_local seeds the (fresh) global dict
    diff: list[bytes] | None  # precomputed diff for dict_global
    estimates: dict[str, int] = field(default_factory=dict)


def _values_payload_estimate(values_total_bytes: int, count: int) -> int:
    """Serialized size of a value list: FOR-bitpacked lengths ≈ 2 B each
    (conservative) + payload."""
    return values_total_bytes + 2 * count + _SECTION_OVERHEAD


def choose_str_codec(
    stats: StrStats, gdict: GlobalDict, block: StrBlock, fsst_rounds: int = 0
) -> StrDecision:
    n, u = stats.n, stats.n_distinct
    est: dict[str, int] = {}
    est["plain"] = _values_payload_estimate(stats.payload_bytes, n)
    zr = zstd_sample_ratio(block.payload)
    if zr < 1.0:
        est["plain"] = min(
            est["plain"],
            int(stats.payload_bytes * zr) + 2 * n + _SECTION_OVERHEAD,
        )

    fsst_est = estimate_fsst_bytes(block, rounds=fsst_rounds)
    est["fsst"] = fsst_est + _SECTION_OVERHEAD

    # --- layer 1: ARCADE plain rule -------------------------------
    if n == 0 or stats.fact is None or stats.distinct_ratio > PLAIN_DISTINCT_RATIO:
        codec = "fsst" if est["fsst"] < est["plain"] else "plain"
        return StrDecision(
            codec=codec, reset_before=True, seed_gdict=False, diff=None, estimates=est
        )

    # --- layer 2: global vs local dictionary ----------------------
    uniq_bytes = sum(len(v) for v in stats.fact.uniques)
    w_local = bit_width(u - 1) if u > 1 else 0
    local_bytes = _values_payload_estimate(uniq_bytes, u) + (n * w_local + 7) // 8
    est["dict_local"] = local_bytes

    force_local = False
    diff: list[bytes] | None = None
    if len(gdict) == 0:
        force_local = True
    else:
        diff = gdict.diff(stats.fact.uniques)
        diff_bytes = sum(len(v) for v in diff)
        if gdict.nbytes + diff_bytes + 16 * len(diff) > DICT_MEMORY_CAP:
            force_local = True
        elif u > 0 and len(diff) / u > NOVELTY_RATIO:
            force_local = True
        else:
            gsize_after = len(gdict) + len(diff)
            w_g = bit_width(gsize_after - 1) if gsize_after > 1 else 0
            est["dict_global"] = (
                _values_payload_estimate(diff_bytes, len(diff)) + (n * w_g + 7) // 8
            )
            if est["dict_global"] < local_bytes and w_g > w_local:
                # ARCADE's forward projection at code-width boundaries
                # (writer.cpp:119-161): the global dict's codes are wider
                # than a fresh local dict's would be, so every FUTURE
                # block of this partition pays (w_g - w_local) bits per
                # row until the memory cap forces a reset. Project
                # pblocks = remaining budget / this diff's dump size
                # blocks ahead (writer.cpp:140) and charge: global path =
                # pblocks wide-code blocks + this diff; local path =
                # pblocks narrow-code blocks each paying the historical
                # mean diff dump (diffavg, writer.cpp:127-131) + this
                # local dump. Choose local when the projection says the
                # greedy global choice locks in a net loss.
                diffdictdump = _values_payload_estimate(diff_bytes, len(diff))
                diffavg = gdict.diff_avg(default=diffdictdump)
                remaining = max(DICT_MEMORY_CAP - gdict.nbytes, 0)
                pblocks = remaining // max(diffdictdump, 1)
                proj_global = pblocks * ((n * w_g + 7) // 8) + est["dict_global"]
                proj_local = pblocks * ((n * w_local + 7) // 8 + diffavg) + local_bytes
                if proj_global > proj_local:
                    force_local = True
                    est["proj_global"] = proj_global
                    est["proj_local"] = proj_local

    if force_local or est.get("dict_global", 1 << 62) >= local_bytes:
        dict_codec, dict_bytes = "dict_local", local_bytes
    else:
        dict_codec, dict_bytes = "dict_global", est["dict_global"]

    # --- layer 3: tournament with RLE / FSST / plain --------------
    w_run = w_local
    rle_bytes = (
        _values_payload_estimate(uniq_bytes, u)
        + (stats.n_runs * w_run + 7) // 8
        + 2 * stats.n_runs  # run lengths ≈ 2 B each FOR-packed
        + _SECTION_OVERHEAD
    )
    est["rle_str"] = rle_bytes

    candidates = {
        dict_codec: dict_bytes,
        "rle_str": rle_bytes,
        "fsst": est["fsst"],
        "plain": est["plain"],
    }
    codec = min(candidates, key=candidates.get)  # type: ignore[arg-type]

    if codec == "dict_local":
        return StrDecision(codec, reset_before=True, seed_gdict=True, diff=None, estimates=est)
    if codec == "dict_global":
        return StrDecision(codec, reset_before=False, seed_gdict=False, diff=diff, estimates=est)
    # rle/fsst/plain chosen by size: leave the running dict untouched —
    # later blocks may still diff against it (our extension; ARCADE's
    # plain path always resets, which layer 1 already covers)
    return StrDecision(codec, reset_before=False, seed_gdict=False, diff=None, estimates=est)


@dataclass
class IntDecision:
    codec: str
    estimates: dict[str, int] = field(default_factory=dict)


def choose_int_codec(stats: IntStats) -> IntDecision:
    n = stats.n
    est: dict[str, int] = {"plain_int": 8 * n + 8}
    if n:
        rng = stats.max_val - stats.min_val
        w_for = bit_width(rng) if rng > 0 else 0
        est["for_int"] = (n * w_for + 7) // 8 + 16
        if stats.min_val >= 0:
            w_bp = bit_width(stats.max_val) if stats.max_val > 0 else 0
            est["bitpack"] = (n * w_bp + 7) // 8 + 8
        w_d = bit_width(2 * stats.max_abs_delta) if stats.max_abs_delta else 0
        est["delta_int"] = (n * w_d + 7) // 8 + 16
        run_vals_rng = rng
        w_rv = bit_width(run_vals_rng) if run_vals_rng > 0 else 0
        est["rle_int"] = stats.n_runs * ((w_rv + 7) // 8 + 3) + 32
    codec = min(est, key=est.get)  # type: ignore[arg-type]
    return IntDecision(codec=codec, estimates=est)
