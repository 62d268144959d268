"""Document-level text analysis operators over the ``documents`` table shape:
quality statistics, language ID, token counting, content fingerprinting.
Thin DataFrame wrappers around ``datacompy_spark.functions.text`` /
``hashing`` Column builders — one narrow projection each, no shuffles.
"""

from __future__ import annotations

from typing import Dict

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


def _shuffle_partition_count(spark, default: int = 200) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating the ``'auto'``
    value some AQE-managed platforms report (this build rejects setting it,
    but the engine must not crash where it is legal) — fall back to the
    cluster's default parallelism."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", str(default))
    try:
        return int(raw)
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


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


#: (label, pattern) redaction rules, applied in order. Patterns stay inside
#: the regex subset Java (Spark) and RE2 (DuckDB) evaluate identically.
PII_PATTERNS = [
    ("<URL>", r"https?://[^ ]+"),
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<IP>", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("<PHONE>", r"\+?\d{7,15}"),
]


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact URLs / emails / IPv4s / phone-number digit runs with typed
    placeholder tokens — the standard pre-training scrub pass. Rules apply
    sequentially (URLs first so their embedded host/userinfo never
    half-matches a later rule); ``n_redactions`` counts matches of each rule
    against the text as that rule saw it. Pure Column expressions; the
    DuckDB twin nests the same regexp_replace chain."""
    stages = [F.col(text_col)]
    for token, pat in PII_PATTERNS:
        stages.append(F.regexp_replace(stages[-1], pat, token))
    n_red = None
    for (token, pat), src in zip(PII_PATTERNS, stages):
        cnt = F.regexp_count(src, F.lit(pat))
        n_red = cnt if n_red is None else n_red + cnt
    return df.select(
        F.col(id_col).alias("doc_id"),
        stages[-1].alias("clean_text"),
        n_red.cast("long").alias("n_redactions"),
    )


def scrub_pii_sql(text: str) -> Dict[str, str]:
    """DuckDB twins for the scrub stages: {'clean_text': ..., 'n_redactions': ...}."""
    stages = [text]
    for token, pat in PII_PATTERNS:
        stages.append(f"regexp_replace({stages[-1]}, '{pat}', '{token}', 'g')")
    counts = [
        f"len(regexp_extract_all({src}, '{pat}'))"
        for (token, pat), src in zip(PII_PATTERNS, stages)
    ]
    return {
        "clean_text": stages[-1],
        "n_redactions": "(" + " + ".join(counts) + ")::BIGINT",
    }


#: (reason, threshold description) — the rule order fixes the reasons string
QUALITY_RULES = "too_few_words,low_diversity,high_punct,word_len_out_of_range"


def quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_type_token_ratio: float = 0.2,
    max_punct_ratio: float = 0.3,
    word_len_range: tuple = (2.0, 12.0),
) -> DataFrame:
    """Keep/drop verdict per document from the quality statistics, with a
    deterministic comma-joined ``reasons`` string naming every failed rule
    (empty string = keep). The thresholds mirror common pre-training
    heuristic filters (length, lexical diversity, punctuation density,
    gibberish word lengths)."""
    m = quality_metrics(F.col(text_col))
    lo, hi = word_len_range
    reasons = F.concat_ws(
        ",",
        F.when(m["n_words"] < min_words, F.lit("too_few_words")),
        F.when(m["type_token_ratio"] < min_type_token_ratio, F.lit("low_diversity")),
        F.when(m["punct_ratio"] > max_punct_ratio, F.lit("high_punct")),
        F.when(
            (m["avg_word_len"] < lo) | (m["avg_word_len"] > hi),
            F.lit("word_len_out_of_range"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        reasons.alias("reasons"),
    ).select("doc_id", (F.col("reasons") == "").alias("keep"), "reasons")


def quality_filter_sql(
    text: str,
    min_words: int = 5,
    min_type_token_ratio: float = 0.2,
    max_punct_ratio: float = 0.3,
    word_len_range: tuple = (2.0, 12.0),
) -> Dict[str, str]:
    from datacompy_spark.functions.text import quality_metrics_sql

    m = quality_metrics_sql(text)
    lo, hi = word_len_range
    reasons = (
        "concat_ws(',', "
        f"CASE WHEN {m['n_words']} < {min_words} THEN 'too_few_words' END, "
        f"CASE WHEN {m['type_token_ratio']} < {min_type_token_ratio}::DOUBLE THEN 'low_diversity' END, "
        f"CASE WHEN {m['punct_ratio']} > {max_punct_ratio}::DOUBLE THEN 'high_punct' END, "
        f"CASE WHEN {m['avg_word_len']} < {lo}::DOUBLE OR {m['avg_word_len']} > {hi}::DOUBLE "
        "THEN 'word_len_out_of_range' END)"
    )
    return {"reasons": reasons, "keep": f"({reasons} = '')"}


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    seed: str = "split#1",
) -> DataFrame:
    """Deterministic train/val/test assignment: md5 of the id (+seed) mod
    100 → stable, engine-independent, order-independent splits — the
    property a distributed pipeline needs so re-runs, backfills, and other
    engines agree on membership without coordination. No shuffle: one
    narrow projection."""
    from datacompy_spark.functions.hashing import md5_long

    bucket = md5_long(F.col(id_col).cast("string"), seed) % 100
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    token_budget: int = 512,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Streaming sequence packing: documents fill fixed token-budget bins in
    id order within each group (e.g. source shard) — ``bin_id`` is the bin
    holding the document's FIRST token, computed from a running token sum,
    so packing is one pass (no iterative bin search) and documents may
    straddle a bin boundary (soft budget, the common pre-training batching
    trade-off).

    The running sum is a DISTRIBUTED two-phase prefix sum, not a per-group
    window: a ``Window.partitionBy(grp)`` running sum would serialize each
    group onto one task, and a pre-training corpus routinely has one source
    shard holding billions of documents. Instead:

    1. range-partition by ``(grp, doc_id)`` — a hot group spans many
       partitions, but partition order still follows doc_id order;
    2. aggregate per-(grp, partition) token subtotals (tiny: at most
       groups x partitions rows);
    3. turn subtotals into per-partition starting offsets with a window over
       that TINY frame (partitioned by grp, ordered by partition id);
    4. broadcast the offsets back and finish with a partition-local running
       sum — the cumulative window now partitions by (grp, partition id), so
       no task ever scans more than one range partition.

    The range-partitioned frame passes through a lineage barrier because it
    is referenced by both the subtotal aggregate and the final projection:
    range bounds are sampled and ``spark_partition_id`` is physical, so the
    two branches must read the SAME materialized partitioning.
    ``checkpoint_dir`` upgrades the barrier to a reliable checkpoint."""
    from pyspark.sql import Window

    from datacompy_spark.plans.barrier import lineage_barrier

    n_tok = whitespace_token_count(F.col(text_col)).cast("long")
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        n_tok.alias("n_tokens"),
    )
    n_parts = num_partitions or _shuffle_partition_count(df.sparkSession)
    ranged = lineage_barrier(
        staged.repartitionByRange(n_parts, "grp", "doc_id").withColumn(
            "pid", F.spark_partition_id()
        ),
        checkpoint_dir,
        eager=False,
    )
    w_prior = (
        Window.partitionBy("grp")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranged.groupBy("grp", "pid")
        .agg(F.sum("n_tokens").alias("__sub"))
        .select(
            "grp",
            "pid",
            F.coalesce(F.sum("__sub").over(w_prior), F.lit(0)).alias("__off"),
        )
    )
    w_local = (
        Window.partitionBy("grp", "pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w_local) + F.col("__off")
    return (
        ranged.join(F.broadcast(offsets), ["grp", "pid"])
        .select(
            "doc_id",
            "grp",
            "n_tokens",
            F.floor((cum - F.col("n_tokens")) / F.lit(token_budget))
            .cast("long")
            .alias("bin_id"),
        )
    )


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
