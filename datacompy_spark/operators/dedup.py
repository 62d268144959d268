"""Deduplication operators for large-scale training-data pipelines.

Five families, all shuffle-conscious:

* exact      — hash-groupBy on a canonical text hash (one shuffle);
* minhash    — shingle → 16 md5 minima → 4 LSH bands → bucket self-join →
               exact Jaccard verification on candidates only;
* simhash    — 60-bit packed signature, banded for candidate generation,
               Hamming-verified;
* ngram      — blocked pairwise character-n-gram Jaccard;
* embedding  — cosine near-duplicates blocked by a grouping column.

Scale notes: every pairwise step is preceded by a blocking/banding stage so
the self-join runs per-bucket, never all-pairs; bucket keys are md5-derived
and uniformly distributed, so the shuffle is skew-resistant by construction.
All logic is Column expressions (whole-stage codegen); nothing collects to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacompy_spark.functions.hashing import (
    char_ngrams,
    hamming_distance,
    lsh_band_keys,
    minhash_from_hashes,
    shingle_hashes,
    simhash_from_hashes,
    token_hashes,
    word_shingles,
)
from datacompy_spark.functions.text import normalize, tokens

# NOTE on staging: expensive scalar expressions (normalize → regexes, md5)
# are materialized as real columns in their own projections before any
# higher-order-function lambda references them. Spark's codegen CSE does not
# reach inside lambdas — an inlined expression re-evaluates once per array
# ELEMENT (or per hash seed / per bit), which turns O(rows) work into
# O(rows × elements).


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups on normalized text: one row per distinct
    content hash with the survivor id (min) and duplicate count.

    Plan shape: project → hash → groupBy(hash) — a single partial-aggregated
    shuffle; output is O(distinct documents)."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.md5(normalize(F.col(text_col))).alias("content_hash"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _shingled(df: DataFrame, id_col: str, text_col: str, shingle_k: int) -> DataFrame:
    """Staged shingling: tokens → distinct shingles → shingle hashes, each a
    real column so every md5/regex runs once per document."""
    return (
        df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
        .select(
            "doc_id",
            F.array_distinct(word_shingles(F.col("toks"), shingle_k)).alias("shingles"),
        )
        .select("doc_id", "shingles", shingle_hashes(F.col("shingles")).alias("shash"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, shingle_k: int = 3
) -> DataFrame:
    """(id, minhash signature) — the reusable sketch table."""
    return _shingled(df, id_col, text_col, shingle_k).select(
        "doc_id",
        minhash_from_hashes(F.col("shash"), num_hashes).alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, Jaccard-verified.

    Stages: (1) per-doc shingle set + signature (narrow); (2) explode band
    keys and self-join per (band, key) bucket — the only shuffle, on
    uniformly-distributed md5 keys; (3) exact Jaccard on the candidate pairs'
    distinct shingle sets; emit pairs ≥ threshold, deduped across bands."""
    rows_per_band = num_hashes // bands
    # Persist the per-document sketches: Spark re-evaluates projection
    # expressions per JOINED ROW in self-joins, so without materialization the
    # shingling/minhash work would run once per candidate pair instead of
    # once per document.
    base = _shingled(df, id_col, text_col, shingle_k).persist()
    base.count()  # materialize BEFORE the self-join: two lazy scans of the
    # same unpopulated cache race and each recomputes the sketches
    sig = base.withColumn(
        "signature", minhash_from_hashes(F.col("shash"), num_hashes)
    )
    keys = lsh_band_keys(F.col("signature"), bands, rows_per_band)
    # band rows carry only (doc_id, band, bkey) — shingle arrays never enter
    # the bucket shuffle
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), k.alias("bkey"))
                    for b, k in enumerate(keys)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey").persist()
    banded.count()
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = base.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = base.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    scored = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("n_inter"),
            (F.size(F.col("sh_a")) + F.size(F.col("sh_b"))).alias("n_total"),
        )
        # lineage barrier: without it Catalyst pushes the threshold filter
        # into the join condition and the set intersection evaluates TWICE
        # per pair (condition + projection). Rows here are 4 ints — cheap to
        # materialize at any scale.
        .localCheckpoint(eager=False)
    )
    return (
        scored.select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_total") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, 60-bit simhash) sketch table."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        token_hashes(tokens(F.col(text_col))).alias("thash"),
    ).select("doc_id", simhash_from_hashes(F.col("thash")).alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by simhash Hamming distance ≤ ``max_hamming``.

    Banding gives the standard pigeonhole guarantee: with 4 bands of 15 bits,
    any pair within Hamming distance 3 shares at least one exact band — so the
    per-band bucket join finds every true pair without an all-pairs scan."""
    bits_per_band = 60 // bands
    sigs = simhash_signatures(df, id_col, text_col).persist()
    sigs.count()  # materialize before the self-join (see minhash note)
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * bits_per_band)
                        .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                        .alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.bkey")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming_distance(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Blocked pairwise character-n-gram Jaccard similarity: all pairs within
    a blocking key (e.g. language, length bucket) scored exactly."""
    from datacompy_spark.functions.hashing import md5_long

    # hash each distinct n-gram to a 60-bit int once per document: the
    # pairwise intersections then run over int arrays (no per-pair string
    # hashing/allocation) — identical sets, cross-engine reproducible.
    # normalize() is staged as its own column: inlined, its regexes would
    # re-run once per n-gram inside the char_ngrams lambda.
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(block_col).alias("block"),
            normalize(F.col(text_col)).alias("norm"),
        )
        .select(
            "doc_id",
            "block",
            F.transform(char_ngrams(F.col("norm"), n), lambda g: md5_long(g)).alias(
                "grams"
            ),
        )
        .persist()
    )  # without the persist the gram hashing re-runs per joined pair
    base.count()  # materialize before the self-join
    a, b = base.alias("a"), base.alias("b")
    # materialize the intersection size once per pair (it feeds both the
    # numerator and the union-size denominator)
    paired = a.join(
        b,
        (F.col("a.block") == F.col("b.block")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).alias("n_inter"),
        (F.size(F.col("a.grams")) + F.size(F.col("b.grams"))).alias("n_total"),
    )
    return (
        # lineage barrier (see minhash note): keeps the threshold filter from
        # being pushed into the join, which would re-run array_intersect per
        # pair in the join condition
        paired.localCheckpoint(eager=False)
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_total") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 15
) -> DataFrame:
    """Connected components over an undirected pair list (id_a, id_b) via
    iterative min-label propagation: every node's label converges to the
    smallest id reachable from it.

    Each iteration propagates labels across edges (one join + min-agg) and
    then SHORTCUTS by propagating labels across labels (pointer doubling:
    node→label→label-of-label), so convergence is O(log diameter) — a chain
    of 2^15 nodes converges within the default ``max_iter`` instead of
    silently returning partial labels. Terminates early when no label
    changes; warns if ``max_iter`` is exhausted without convergence (the
    DuckDB oracle computes the exact transitive closure, so an unconverged
    return would silently diverge). Output: (node, component) where
    component is the cluster's minimum id."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    labels.count()
    converged = False
    for _ in range(max_iter):
        # labels flowing across edges
        prop = (
            edges.join(labels, edges["src"] == labels["node"])
            .select(F.col("dst").alias("node"), F.col("component"))
        )
        # materialize + truncate lineage BEFORE the self-join below: the
        # doubling step references `stepped` twice, so without a barrier the
        # logical plan doubles every iteration (exponential analysis cost)
        stepped = (
            labels.select("node", "component")
            .unionAll(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        # pointer doubling: replace each label with its label's label, so
        # long chains collapse in O(log diameter) rounds, not O(diameter)
        lab_of_lab = stepped.select(
            F.col("node").alias("__c"), F.col("component").alias("__cc")
        )
        new_labels = (
            stepped.join(lab_of_lab, stepped["component"] == F.col("__c"), "left")
            .select(
                "node",
                F.coalesce(F.col("__cc"), F.col("component")).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: label propagation did not converge in "
            f"{max_iter} iterations; component ids may be partial",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def assign_components(
    df: DataFrame, id_col: str, pairs: DataFrame, max_iter: int = 15
) -> DataFrame:
    """Component id for EVERY row of ``df``: near-dup cluster minimum for
    paired ids, own id for singletons — the final dedup verdict table
    (survivors are rows where component == id)."""
    cc = connected_components(pairs, max_iter=max_iter)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.99,
) -> DataFrame:
    """Cosine near-duplicate pairs among embeddings, blocked by ``block_col``
    (e.g. a cluster/label id) so the pairwise stage is per-block."""
    from datacompy_spark.functions.vector import dot, norm

    # norms are per-vector: compute them once per row, not once per pair
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(block_col).alias("block"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
    ).persist()
    base.count()  # materialize before the self-join
    a, b = base.alias("a"), base.alias("b")
    scored = a.join(
        b,
        (F.col("a.block") == F.col("b.block")) & (F.col("a.vid") < F.col("b.vid")),
    ).select(
        F.col("a.vid").alias("id_a"),
        F.col("b.vid").alias("id_b"),
        (dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))).alias(
            "cos_sim"
        ),
    )
    # barrier: otherwise the threshold filter is pushed into the join and the
    # dot product evaluates twice per pair
    return scored.localCheckpoint(eager=False).filter(
        F.col("cos_sim") >= F.lit(threshold)
    )
