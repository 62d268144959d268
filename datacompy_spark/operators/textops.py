"""Document-level text analysis operators over the ``documents`` table shape:
quality statistics, language ID, token counting, content fingerprinting.
Thin DataFrame wrappers around ``datacompy_spark.functions.text`` /
``hashing`` Column builders — one narrow projection each, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacompy_spark.functions.hashing import char_ngrams
from datacompy_spark.functions.text import (
    language_id,
    normalize,
    quality_metrics,
    regex_token_count,
    tokens,
    whitespace_token_count,
)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality statistics (length, lexical diversity,
    punctuation, stopword hits)."""
    metrics = quality_metrics(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[expr.alias(name) for name, expr in metrics.items()],
    )


def detect_language(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-heuristic language ID: (doc_id, lang_pred)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        language_id(F.col(text_col)).alias("lang_pred"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace vs regex (BPE-ish) token counts per document."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        whitespace_token_count(F.col(text_col)).cast("long").alias("ws_tokens"),
        regex_token_count(F.col(text_col)).cast("long").alias("re_tokens"),
    )


def word_frequencies(
    df: DataFrame, text_col: str, salt_buckets: int = 0
) -> DataFrame:
    """Corpus word frequencies: explode tokens → count per word.

    ``salt_buckets > 0`` demonstrates explicit two-stage salted aggregation
    for pathological key skew: count per (word, salt) first, then sum per
    word — the hot key's rows spread over ``salt_buckets`` reducers in
    stage 1. (Spark's map-side partial aggregation already covers ordinary
    skew; explicit salting is for when a single key exceeds one reducer's
    budget even after partial agg.) Results are identical either way."""
    words = df.select(F.explode(tokens(F.col(text_col))).alias("word")).filter(
        F.col("word") != ""
    )
    if salt_buckets > 0:
        # the salt must be independent of the key (that's what spreads a hot
        # key across reducers) — a per-row ordinal works and stays deterministic
        return (
            words.withColumn(
                "__salt", F.monotonically_increasing_id() % F.lit(salt_buckets)
            )
            .groupBy("word", "__salt")
            .agg(F.count(F.lit(1)).alias("n_partial"))
            .groupBy("word")
            .agg(F.sum("n_partial").alias("n"))
        )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def fingerprint(df: DataFrame, id_col: str, text_col: str, ngram: int = 5) -> DataFrame:
    """Content fingerprints: full-text md5, winnowing-style minimum
    character-n-gram hash, and a 60-bit simhash — the three standard handles
    for exact, fuzzy-substring, and fuzzy-bag matching.

    Staged projections: ``normalize`` and the token hashes become real
    columns so their regex/md5 work runs once per document, not once per
    n-gram/bit (lambda bodies are outside Spark's subexpression elimination)."""
    from datacompy_spark.functions.hashing import simhash_from_hashes, token_hashes

    staged = df.select(
        F.col(id_col).alias("doc_id"),
        normalize(F.col(text_col)).alias("norm"),
        token_hashes(tokens(F.col(text_col))).alias("thash"),
    )
    return staged.select(
        "doc_id",
        F.md5(F.col("norm")).alias("content_md5"),
        F.array_min(
            F.transform(char_ngrams(F.col("norm"), ngram), lambda g: F.md5(g))
        ).alias("min_ngram_md5"),
        simhash_from_hashes(F.col("thash")).alias("simhash"),
    )
