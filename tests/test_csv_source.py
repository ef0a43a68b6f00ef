"""W2 parity (SURVEY.md §2): the reference ingests CSV with a naive
split (writer.cpp:10-29); our source is ``spark.read.csv`` — correct
quoting for free — feeding the same encode pipeline."""

from __future__ import annotations


def test_csv_roundtrip(spark, tmp_path):
    import csv

    from pyspark.sql import functions as F

    from arcade_spark.decode import scan
    from arcade_spark.encode import encode_job

    path = str(tmp_path / "docs.csv")
    rows = [
        (i, f"text with, commas and \"quotes\" {i}", ["en", "el"][i % 2])
        for i in range(500)
    ]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "text", "lang"])
        w.writerows(rows)

    # RFC-4180 doubled-quote escaping (python csv writer's output)
    src = spark.read.csv(path, header=True, inferSchema=True, escape='"')
    out = str(tmp_path / "enc")
    m = encode_job(spark, src, out, num_parts=2, order_col="doc_id", block_rows=128)
    assert m["rows"] == 500

    decoded = scan(spark, out)
    assert decoded.count() == 500
    a = decoded.orderBy("doc_id").collect()
    for i, r in enumerate(a):
        assert r.text == rows[i][1] and r.lang == rows[i][2]


def test_snappy_post_codec(tmp_path):
    from arcade_spark.postpass import maybe_post, unpost

    payload = b"the quick brown fox " * 1000
    comp, post = maybe_post(payload, "plain", post_codec="snappy")
    assert post == "snappy" and len(comp) < len(payload)
    assert unpost(comp, post) == payload


def test_json_source_cli_roundtrip(spark, tmp_path):
    """Line-delimited JSON through the encode CLI: spark.read.json →
    the same shuffle-mode pipeline, lossless decode."""
    import json as _json

    import arcade_spark.jobs.encode_job as ej
    from arcade_spark.decode import scan

    src_path = tmp_path / "in.jsonl"
    rows = [{"url": f"u{i:03d}", "lang": ["en", "de"][i % 2], "n": i}
            for i in range(120)]
    src_path.write_text("\n".join(_json.dumps(r) for r in rows))
    out = str(tmp_path / "enc")
    rc = ej.main(["--input", str(src_path), "--out", out, "--json",
                  "--num-parts", "2", "--block-rows", "16"])
    assert rc == 0
    got = {r["url"]: (r["lang"], r["n"]) for r in scan(spark, out).collect()}
    assert got == {r["url"]: (r["lang"], r["n"]) for r in rows}
