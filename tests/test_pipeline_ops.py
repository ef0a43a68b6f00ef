"""Sanity tests for the training-data pipeline operators at sf0.001
(deep value-parity vs DuckDB lives in tools/check_correctness.py and
the driver's own gate)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_token_stats(spark):
    from arcade_spark.textops import token_stats

    rows = token_stats(spark, SF).collect()
    assert len(rows) > 0
    assert all(r.n_ws_tokens > 0 and r.n_re_tokens >= r.n_ws_tokens for r in rows)


def test_quality_and_langid(spark):
    from arcade_spark.textops import lang_id, quality_score

    q = quality_score(spark, SF).collect()
    assert all(0 <= r.stopword_bp <= 10000 for r in q)
    l = lang_id(spark, SF).collect()
    assert {r.pred_lang for r in l} <= {"en", "de", "fr", "es", "und"}


def test_fingerprint_unique_per_text(spark):
    from arcade_spark.textops import fingerprint

    df = fingerprint(spark, SF)
    n = df.count()
    assert df.select("fp").distinct().count() <= n


def test_dedup_exact_partition(spark):
    from arcade_spark.dedup import dedup_exact

    groups = dedup_exact(spark, SF).collect()
    total = sum(r.n_copies for r in groups)
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert total == docs


def test_minhash_lsh_agrees_with_exact(spark):
    from arcade_spark.dedup import dedup_minhash_lsh, dedup_ngram_jaccard

    exact = {(r.id_a, r.id_b) for r in dedup_ngram_jaccard(spark, SF).collect()}
    lsh = {(r.id_a, r.id_b) for r in dedup_minhash_lsh(spark, SF).collect()}
    assert lsh == exact  # verification makes LSH exact at this recall


def test_simhash_range(spark):
    from arcade_spark.dedup import dedup_simhash

    rows = dedup_simhash(spark, SF).collect()
    assert len(rows) == spark.read.parquet(f"{SF}/documents.parquet").count()
    assert all(0 <= r.simhash < (1 << 60) for r in rows)


def test_ann_topk_shape(spark):
    from arcade_spark.simsearch import ann_cosine_topk

    rows = ann_cosine_topk(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ann_lsh_subset_of_brute(spark):
    from arcade_spark.simsearch import ann_cosine_topk, ann_lsh_topk

    brute = {(r.query_id, r.neighbor_id) for r in ann_cosine_topk(spark, SF).collect()}
    lsh = {(r.query_id, r.neighbor_id) for r in ann_lsh_topk(spark, SF).collect()}
    # LSH returns bucket-local top-k: every hit is a real vector pair;
    # overlap with brute force is the recall signal (non-zero expected)
    assert len(lsh) > 0


def test_ann_sq_matches_brute_force(spark):
    """Quantized-scan ANN (int8 codes + integer-dot pool + exact
    re-rank) must reproduce the exact brute-force top-k on this corpus
    (measured recall 1.0 — the designed behavior for near-orthogonal
    data where LSH pruning can't reach high recall)."""
    from arcade_spark.simsearch import ann_cosine_topk, ann_sq_topk

    brute = {(r.query_id, r.rank, r.neighbor_id) for r in ann_cosine_topk(spark, SF).collect()}
    sq = {(r.query_id, r.rank, r.neighbor_id) for r in ann_sq_topk(spark, SF).collect()}
    assert sq == brute


def test_ann_sq_index_persisted(spark, tmp_path):
    """The persisted int8 code index returns IDENTICAL rows to the
    on-the-fly path, and the stored codes are tinyint (1/8 the vector
    bytes at scale)."""
    from arcade_spark.simsearch import ann_sq_topk, build_sq_index

    idx = str(tmp_path / "sqidx")
    build_sq_index(spark, SF, idx)
    stored = spark.read.parquet(idx)
    assert dict(stored.dtypes)["code8"] == "array<tinyint>"
    direct = {(r.query_id, r.rank, r.neighbor_id) for r in ann_sq_topk(spark, SF).collect()}
    indexed = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in ann_sq_topk(spark, SF, index_dir=idx).collect()
    }
    assert indexed == direct


def test_pair_candidates_shuffle_ids_only(spark):
    """Round-3 plan audit: the LSH banding/candidate stage of
    embedding_cosine_pairs must not carry the embedding vectors —
    vectors attach after dedup via id joins."""
    from arcade_spark.simsearch import embedding_cosine_pairs

    plan = embedding_cosine_pairs(spark, SF)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    # round-4: banding + explode are fused into ONE mapInArrow kernel
    # whose output schema is exactly (vec_id, table_id, bucket) — the
    # vectors never enter the candidate shuffle
    import re

    band_lines = [ln for ln in plan.splitlines() if "MapInArrow" in ln]
    assert band_lines, "banding kernel missing from plan"
    # the kernel's OUTPUT schema is exactly [vec_id, table_id, bucket]
    assert any(
        re.search(r"\[vec_id#\d+L?, table_id#\d+, bucket#\d+\]", ln)
        for ln in band_lines
    ), band_lines


def test_media_meta_plumbing(spark):
    from arcade_spark.multimodal import decode_media, media_meta

    rows = media_meta(spark, SF).collect()
    assert all(r.n_bytes > 0 and 16 <= r.width < 1040 for r in rows)
    from arcade_spark.multimodal import _try_import_pil

    if _try_import_pil() is None:
        with pytest.raises(NotImplementedError):
            decode_media(b"xxxx", fake=False)
    else:
        import base64

        # 1×1 transparent PNG
        png = base64.b64decode(
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGNg"
            "YGBgAAAABQABh6FO1AAAAABJRU5ErkJggg=="
        )
        meta = decode_media(png, fake=False)
        assert (meta["width"], meta["height"], meta["n_frames"]) == (1, 1, 1)


def test_media_resize_and_frame_sample(spark):
    from arcade_spark.multimodal import (
        FRAME_CHARS,
        RESIZE_TARGET,
        media_frame_sample,
        media_resize_meta,
    )

    rows = media_resize_meta(spark, SF).collect()
    assert all(max(r.out_w, r.out_h) == RESIZE_TARGET for r in rows)
    assert all(r.out_w <= RESIZE_TARGET and r.out_h <= RESIZE_TARGET for r in rows)

    frames = media_frame_sample(spark, SF).collect()
    assert len(frames) > len(rows)  # multi-frame docs exist
    n_chars = {r["doc_id"]: r["n_chars"] for r in
               spark.read.parquet(f"{SF}/documents.parquet").collect()}
    for r in frames[:50]:
        assert 0 <= r.frame_idx * FRAME_CHARS < n_chars[r.doc_id] + FRAME_CHARS
        assert len(r.frame_md5) == 32


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs = e.queries()
    oracles = e.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle without query: {missing}"


def test_dedup_cluster_components(spark):
    """Connected components over an EXPLICIT pair set with a chained
    component (A~B, B~C must cluster A,B,C together), checked against
    a driver-side union-find replay; canonical = min doc_id."""
    from arcade_spark.dedup import dedup_cluster

    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (9, 12), (2, 3), (20, 21)],  # chain 1-5-9-12
        "id_a long, id_b long",
    )
    got = {
        r["doc_id"]: (r["cluster"], r["keep"])
        for r in dedup_cluster(spark, SF, pairs=pairs).collect()
    }
    # the distributed label-propagation path must agree with the
    # driver union-find fast path on the same input
    dist = {
        r["doc_id"]: (r["cluster"], r["keep"])
        for r in dedup_cluster(
            spark, SF, pairs=pairs, driver_max_edges=0
        ).collect()
    }
    assert dist == got
    # union-find replay
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in [(1, 5), (5, 9), (9, 12), (2, 3), (20, 21)]:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*), min(doc_id), max(doc_id) FROM '{SF}/documents.parquet'"
    ).fetchone()
    assert len(got) == n_docs[0]  # one row per document
    for d, (c, keep) in got.items():
        exp = find(d) if d in parent else d
        assert c == exp, (d, c, exp)
        assert keep == (d == c)
    # chain clustered transitively
    assert got[12][0] == 1 and got[9][0] == 1 and got[5][0] == 1


def test_dedup_cluster_lsh_pairs(spark):
    """End-to-end over the real LSH pairs: keep-set = docs minus the
    non-canonical members of each pair component."""
    from arcade_spark.dedup import dedup_cluster, dedup_minhash_lsh

    pairs = [(r.id_a, r.id_b)
             for r in dedup_minhash_lsh(spark, SF).collect()]
    got = {r["doc_id"]: r["cluster"]
           for r in dedup_cluster(spark, SF).collect()}
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for d, c in got.items():
        assert c == (find(d) if d in parent else d)
