"""Round-3 type coverage: DATE and BOOLEAN columns end-to-end — encode,
bit-identical scan, filters with native Python literals, group counts,
metadata min/max, top-k."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.types as T
import pytest

from arcade_spark.encode import encode_job


@pytest.fixture(scope="module")
def date_bool_table(spark, tmp_path_factory):
    base = dt.date(2024, 1, 1)
    rows = [
        (f"u{i:03d}", base + dt.timedelta(days=i % 40),
         i % 3 == 0,
         None if i % 17 == 0 else base + dt.timedelta(days=i % 11))
        for i in range(400)
    ]
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("d", T.DateType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("maybe_d", T.DateType(), True),
    ])
    src = spark.createDataFrame(rows, schema)
    out = str(tmp_path_factory.mktemp("dtb") / "enc")
    encode_job(spark, src, out, num_parts=2, block_rows=64)
    return out, rows


def test_scan_roundtrip_date_bool(spark, date_bool_table):
    from arcade_spark.decode import scan

    out, rows = date_bool_table
    got = {r["url"]: (r["d"], r["flag"], r["maybe_d"]) for r in scan(spark, out).collect()}
    want = {u: (d, f, m) for u, d, f, m in rows}
    assert got == want


def test_filter_date_range_native_literals(spark, date_bool_table):
    from arcade_spark.readops import filter_range

    out, rows = date_bool_table
    lo, hi = dt.date(2024, 1, 5), dt.date(2024, 1, 20)
    got = filter_range(spark, out, "d", lo, hi, project=["url"]).collect()
    want = sorted(u for u, d, _f, _m in rows if lo <= d <= hi)
    assert sorted(r["url"] for r in got) == want


def test_filter_bool_eq(spark, date_bool_table):
    from arcade_spark.readops import equi_filter

    out, rows = date_bool_table
    got = equi_filter(spark, out, "flag", True, project=["url"]).collect()
    want = sorted(u for u, _d, f, _m in rows if f)
    assert sorted(r["url"] for r in got) == want


def test_group_count_bool_and_date(spark, date_bool_table):
    from arcade_spark.readops import group_count

    out, rows = date_bool_table
    got = {r["flag"]: r["cnt"] for r in group_count(spark, out, "flag").collect()}
    n_true = sum(1 for _u, _d, f, _m in rows if f)
    assert got == {True: n_true, False: len(rows) - n_true}
    gd = {r["d"]: r["cnt"] for r in group_count(spark, out, "d").collect()}
    assert sum(gd.values()) == len(rows)
    assert min(gd) == dt.date(2024, 1, 1)


def test_minmax_and_topk_date_with_nulls(spark, date_bool_table):
    from arcade_spark.readops import column_minmax, column_topk

    out, rows = date_bool_table
    row = column_minmax(spark, out, "maybe_d").collect()[0]
    vals = [m for _u, _d, _f, m in rows if m is not None]
    assert (row["min_v"], row["max_v"], row["cnt"]) == (min(vals), max(vals), len(rows))
    top = [r["v"] for r in column_topk(spark, out, "maybe_d", 5).collect()]
    assert sorted(top, reverse=True) == sorted(vals, reverse=True)[:5]


def test_group_by_date_bool_keys(spark, date_bool_table):
    """Composite (date, bool) group keys convert back to their logical
    types through the int64 partial lane; null date keys form no group."""
    from collections import Counter

    from arcade_spark.readops import group_by

    out, rows = date_bool_table
    got = {
        (r["maybe_d"], r["flag"]): r["cnt"]
        for r in group_by(spark, out, ["maybe_d", "flag"]).collect()
    }
    want = Counter((m, f) for _u, _d, f, m in rows if m is not None)
    assert got == dict(want)
    assert all(k[0] is not None for k in got)
