"""Text-analysis operators for a training-data pipeline over the
``documents`` table: token counting, quality scoring, language ID,
document fingerprinting. All pure ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python in any hot path.

Each operator has an ANSI-SQL oracle twin in __spark_entry__.py; the
heuristics are deliberately expressed in deterministic integer/string
math so DuckDB reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")
_BPE_RE = r"\w+|[^\w\s]"


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    d = _documents(spark, sf_dir)
    trimmed = F.trim(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_measured"),
        F.when(trimmed == "", 0)
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("long")
        .alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0))
        .cast("long")
        .alias("n_re_tokens"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword quality signals (integer counts
    plus one ratio in basis points — integer math end-to-end so the
    oracle hashes identically)."""
    d = _documents(spark, sf_dir)
    trimmed = F.trim(F.col("text"))
    words = F.split(F.lower(trimmed), " ")
    n_words = F.when(trimmed == "", 0).otherwise(F.size(words))
    n_punct = F.length("text") - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS))
    )
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_measured"),
        n_words.cast("long").alias("n_words"),
        n_punct.cast("long").alias("n_punct"),
        n_stop.cast("long").alias("n_stopwords"),
        F.when(n_words > 0, F.floor(F.lit(10000) * n_stop / n_words))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("stopword_bp"),
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercased
    text (the hash-based doc identity used for exact dedup)."""
    d = _documents(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return d.select("doc_id", F.md5(norm).alias("fp"))


# per-language marker words for the n-gram/stopword language-ID
# heuristic (deterministic, SQL-expressible)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "que", "es"),
}


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language scorer: counts per-language marker hits and
    predicts the argmax (ties → lexicographically first language, then
    'und' when nothing matches)."""
    d = _documents(spark, sf_dir)
    words = F.split(F.lower(F.trim(F.col("text"))), " ")

    def marker_filter(markers):
        return lambda w: w.isin(*markers)

    scores = [
        F.size(F.filter(words, marker_filter(markers))).alias(f"s_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = d.select("doc_id", *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in sorted(langs):
        pred = pred.when(F.col(f"s_{l}") == best, F.lit(l))
    return scored.select(
        "doc_id",
        *[F.col(f"s_{l}").cast("long").alias(f"s_{l}") for l in langs],
        pred.alias("pred_lang"),
    )


WINNOW_K = 4  # words per rolling shingle
WINNOW_W = 4  # window (shingles) per fingerprint selection


def fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprint (rolling-hash family): hash every
    rolling 4-word shingle (portable md5-prefix hash, as in SimHash),
    slide a 4-shingle window and keep each window's minimum — the
    classic winnowing selection (Schleimer et al., SIGMOD 2003 idea,
    standard public algorithm). Output: distinct (doc_id, fp) pairs.
    Docs with fewer than 4 words are excluded (same rule in the
    oracle)."""
    from pyspark.sql import Window

    d = _documents(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    words = F.split(norm, " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(words) - WINNOW_K),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, WINNOW_K)),
    )
    shingled = (
        d.select("doc_id", words.alias("w"), sh.alias("sh"))
        .filter(F.size("w") >= WINNOW_K)
        .select("doc_id", F.posexplode("sh").alias("pos", "shingle"))
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long").alias("h"),
        )
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    return (
        shingled.withColumn("fp", F.min("h").over(win))
        .select("doc_id", "fp")
        .distinct()
    )
