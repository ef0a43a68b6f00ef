"""Filtered scan / count-only / random access vs the source of truth
(FIXTURES.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arcade_spark.encode import encode_job
from arcade_spark.readops import equi_filter, filter_count, random_access

N_PARTS = 6
BLOCK_ROWS_TEST = 512


@pytest.fixture(scope="module")
def encoded(spark, corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc_read") / "corpus")
    src = spark.read.parquet(corpus_path)
    encode_job(spark, src, out, num_parts=N_PARTS, block_rows=BLOCK_ROWS_TEST)
    return out, src


@pytest.mark.parametrize("lang", ["el", "en", "xx-nope"])
def test_equi_filter_matches_source(spark, encoded, lang):
    out, src = encoded
    got = equi_filter(spark, out, "lang", lang, project=["url", "text"])
    exp = src.filter(F.col("lang") == lang).select("url", "text")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_equi_filter_on_url_unique(spark, encoded):
    out, src = encoded
    target = src.select("url").orderBy("url").limit(1).collect()[0].url
    got = equi_filter(spark, out, "url", target, project=["url", "lang", "text"])
    rows = got.collect()
    assert len(rows) == 1
    exp = src.filter(F.col("url") == target).collect()[0]
    assert rows[0].text == exp.text and rows[0].lang == exp.lang


def test_count_only_and_zone_skip(spark, encoded):
    out, src = encoded
    row = filter_count(spark, out, "lang", "el").collect()[0]
    assert row.cnt == src.filter(F.col("lang") == "el").count()
    # a value lexically outside most blocks' [min,max] must skip blocks
    row2 = filter_count(spark, out, "url", "zzzz-not-a-url").collect()[0]
    assert row2.cnt == 0
    assert row2.blocks_skipped > 0  # zone maps actually pruned


def test_equi_filter_int_column(spark, encoded):
    out, src = encoded
    some_ts = src.select("warc_ts").limit(1).collect()[0].warc_ts
    import calendar

    micros = int(calendar.timegm(some_ts.timetuple())) * 1_000_000 + some_ts.microsecond
    got = equi_filter(spark, out, "warc_ts", micros, project=["url"])
    exp = src.filter(F.col("warc_ts") == some_ts).select("url")
    assert got.count() == exp.count() > 0


def test_random_access(spark, encoded):
    out, _ = encoded
    rids = [0, 15, 100, 511, 512, 1025, 5999]
    got = random_access(spark, out, rids).orderBy("row_id").collect()
    assert [r.row_id for r in got] == rids
    assert all(r.url and r.text is not None for r in got)


def test_random_access_matches_scan_order(spark, encoded):
    from arcade_spark.decode import scan

    out, _ = encoded
    full = (
        scan(spark, out, emit_meta=True)
        .orderBy("part_id", "block_id", "pos")
        .select("url")
        .collect()
    )
    rids = [3, 700, 4444]
    got = {r.row_id: r.url for r in random_access(spark, out, rids).collect()}
    for rid in rids:
        assert got[rid] == full[rid].url


def test_random_access_out_of_range(spark, encoded):
    out, _ = encoded
    with pytest.raises(IndexError):
        random_access(spark, out, [10**9])
