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


def test_register_iceberg_both_ways(spark, tmp_path_factory, monkeypatch):
    """has_iceberg is False in the sandbox (no jars): register_iceberg
    must fail fast with launch guidance; dry_run pins the DDL surface
    (CREATE TABLE ... USING iceberg PARTITIONED BY part_id for blocks +
    manifest) so the production path can't drift silently. With the
    probe faked True, the non-dry path proceeds past the guard (and
    would issue exactly the dry-run DDL)."""
    import pytest

    import arcade_spark.catalog as cat
    from arcade_spark.corpus import write_corpus_files
    from arcade_spark.encode import encode_files_job

    d = str(tmp_path_factory.mktemp("ice") / "files")
    write_corpus_files(d, 500, 1, seed=23)
    out = str(tmp_path_factory.mktemp("ice") / "enc")
    encode_files_job(spark, d, out, block_rows=512)
    t = cat.load(spark, out)

    assert has_iceberg(spark) is False  # sandbox has no Iceberg jars
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        t.register_iceberg("enc_tbl")

    ddls = t.register_iceberg("enc_tbl", catalog="prod", dry_run=True)
    assert len(ddls) == 2
    assert ddls[0].startswith("CREATE TABLE IF NOT EXISTS prod.enc_tbl_blocks (")
    assert "USING iceberg" in ddls[0] and "PARTITIONED BY (part_id)" in ddls[0]
    assert "blob binary" in ddls[0] and "seg binary" in ddls[0]
    assert ddls[1].startswith("CREATE TABLE IF NOT EXISTS prod.enc_tbl_manifest (")
    assert "format_rev int" in ddls[1]

    # fake the classpath probe: the guard passes and the execute path
    # runs — stub the session + writeTo so no Iceberg jars are needed
    issued = []

    class _FakeWriter:
        def append(self):
            issued.append("append")

    # blocks()/manifest() need the real session — pre-bind the frames
    # BEFORE swapping in the fake session
    real_blocks, real_manifest = t.blocks(), t.manifest()
    monkeypatch.setattr(cat, "has_iceberg", lambda s: True)
    monkeypatch.setattr(t, "spark", type("S", (), {"sql": lambda self, q: issued.append(q)})())
    monkeypatch.setattr(real_blocks, "writeTo", lambda full: _FakeWriter(), raising=False)
    monkeypatch.setattr(real_manifest, "writeTo", lambda full: _FakeWriter(), raising=False)
    monkeypatch.setattr(t, "blocks", lambda columns=None: real_blocks)
    monkeypatch.setattr(t, "manifest", lambda: real_manifest)
    ddls2 = t.register_iceberg("enc_tbl", catalog="prod")
    assert ddls2 == ddls
    assert issued.count("append") == 2 and ddls[0] in issued and ddls[1] in issued
