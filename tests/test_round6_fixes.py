"""Round-6 ADVICE/verdict fixes:

- key-stream cache hygiene: orderby_export / column_rank_values caches
  are auto-released (next call or release_key_caches()), so a long
  session never accumulates persisted RDDs;
- multi-agg overflow guard also bounds the PRODUCT |m·q| (not just the
  affine result a + m·q, which a huge opposite-sign constant could
  cancel) and rejects pathological spec constants outright.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from arcade_spark.encode import encode_job


@pytest.fixture(scope="module")
def r6_table(spark, tmp_path_factory):
    rng = np.random.default_rng(61)
    n = 3000
    pdf = pd.DataFrame(
        {
            "url": [f"https://h{rng.integers(0, 7)}.ex/p{i:05d}" for i in range(n)],
            "x": rng.integers(-1000, 1000, n).astype(np.int64),
            "big": rng.integers(2 ** 31, 2 ** 33, n).astype(np.int64),
        }
    )
    src = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("r6") / "enc")
    encode_job(spark, src, out, num_parts=3, block_rows=512, order_col="url")
    return out, pdf


def _persisted_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_key_cache_released_between_sorts(spark, r6_table):
    """Two sorts + a rank query in one session: after
    release_key_caches() no persisted RDD remains, and each new call
    reclaims the previous cache on its own."""
    from arcade_spark.readops import (
        column_rank_values,
        orderby_export,
        release_key_caches,
    )

    out, pdf = r6_table
    release_key_caches()
    base = _persisted_rdds(spark)

    r1 = orderby_export(spark, out, ["x", "url"], ["url"], buckets=5)
    assert r1.count() == len(pdf)
    assert _persisted_rdds(spark) == base + 1

    # the next sort releases the previous cache before persisting its own
    r2 = orderby_export(spark, out, ["url"], ["x"], buckets=5)
    assert r2.count() == len(pdf)
    assert _persisted_rdds(spark) == base + 1

    r3 = column_rank_values(spark, out, "x", quantiles=[0.5])
    assert r3.count() == 1
    assert _persisted_rdds(spark) == base + 1

    release_key_caches()
    assert _persisted_rdds(spark) == base


def test_overflow_guard_product_wrap(spark, r6_table):
    """m·q wrapping int64 must raise even when a huge |a| cancels the
    affine estimate — but |a| >= 2^62 is rejected at spec compile, and
    a product of two ~2^32 columns raises the |m·q| guard."""
    from arcade_spark.readops import group_by_multi

    out, _ = r6_table
    # spec-constant validation: |a| >= 2^62 rejected up front
    with pytest.raises(ValueError, match="affine constants"):
        group_by_multi(
            spark, out, ["url"],
            [("s", "sumprod", [("big", 1, -(2 ** 62))])],
        ).collect()
    # 2^32-ish · 2^32-ish wraps int64 → the float-domain |m·q| /
    # |a+m·q| guards must raise, never return wrapped sums
    with pytest.raises(Exception, match="overflows int64"):
        group_by_multi(
            spark, out, ["url"],
            [("s", "sumprod", [("big", 1, 0), ("big", 1, 0)])],
        ).collect()


def test_overflow_guard_safe_specs_still_pass(spark, r6_table):
    """Realistic specs (TPC-H constants) are untouched by the guard."""
    from arcade_spark.readops import group_by_multi

    out, pdf = r6_table
    got = group_by_multi(
        spark, out, ["url"],
        [("s", "sumprod", [("x", -1, 100)]), ("c", "count", None)],
    ).toPandas()
    assert int(got["c"].sum()) == len(pdf)
    assert int(got["s"].sum()) == int((100 - pdf["x"]).sum())
