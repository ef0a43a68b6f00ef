from __future__ import annotations

from arcade_spark.catalog import has_iceberg, load
from arcade_spark.corpus import write_corpus_files
from arcade_spark.encode import encode_files_job


def test_encoded_table_api(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cat") / "files")
    write_corpus_files(d, 2000, 2, seed=13)
    out = str(tmp_path_factory.mktemp("cat") / "enc")
    encode_files_job(spark, d, out, block_rows=512)

    t = load(spark, out)
    st = t.stats()
    assert st["rows"] == 2000 and st["partitions"] == 2 and st["ratio"] < 1
    assert [n for n, _ in t.columns] == ["url", "warc_ts", "html", "text", "lang"]

    t.register("corpus_enc")
    # the manifest and per-chunk metadata are SQL-queryable rows —
    # unlike the reference's opaque struct D headers
    row = spark.sql(
        "SELECT codec, count(*) AS c FROM corpus_enc_blocks "
        "WHERE column = 'lang' GROUP BY codec ORDER BY c DESC"
    ).collect()[0]
    assert row.codec in ("dict_local", "dict_global", "rle_str")
    n = spark.sql("SELECT count(*) AS n FROM corpus_enc WHERE lang = 'en'").collect()[0].n
    src = spark.read.parquet(d).filter("lang = 'en'").count()
    assert n == src
    assert isinstance(has_iceberg(spark), bool)
