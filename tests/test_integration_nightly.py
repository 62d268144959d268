"""End-to-end integration: the nightly snapshot-pipeline workflow the
operators exist to compose.

    profile gate → CDC diff → replay → full compare → partitioned publish

Each step is individually tested elsewhere; this test asserts they
compose — same frames, same session, no glue code beyond what a user
would write.
"""

from pyspark.sql import functions as F

from datacompy_spark import SparkCompare
from datacompy_spark.operators.cdc import apply_changes, snapshot_cdc
from datacompy_spark.operators.profile import profile_compare
from datacompy_spark.sources.loaders import write_partitioned


class TestNightlyPipeline:
    def test_profile_cdc_replay_compare_publish(self, spark, orders, tmp_path):
        keys = ["o_orderkey"]
        today = orders
        tomorrow = (
            orders.filter(F.col("o_orderkey") % 50 != 0)
            .withColumn(
                "o_totalprice",
                F.when(
                    F.col("o_orderkey") % 9 == 2, F.col("o_totalprice") + 10.0
                ).otherwise(F.col("o_totalprice")),
            )
        )

        # 1. cheap stats-only gate: the drift check must notice the change
        drift = profile_compare(today, tomorrow, ["o_totalprice", "o_custkey"])
        flagged = drift.filter(
            F.col("null_rate_drifted") | F.col("distinct_drifted") | F.col("range_changed")
        )
        assert flagged.count() >= 1  # row-count/range change is visible in stats

        # 2. CDC diff captures exactly the planted changes
        feed = snapshot_cdc(today, tomorrow, keys)
        kinds = dict(feed.groupBy("change_type").count().collect())
        n_deletes = today.filter(F.col("o_orderkey") % 50 == 0).count()
        assert kinds["delete"] == n_deletes
        assert "insert" not in kinds
        assert set(
            r["changed_cols"][0]
            for r in feed.filter(F.col("change_type") == "update").collect()
        ) == {"o_totalprice"}

        # 3. replaying the feed onto today reproduces tomorrow...
        cmp_cols = [c for c in orders.columns if c not in keys]
        rebuilt = apply_changes(today, feed, keys, cmp_cols)

        # 4. ...verified by the comparison engine, not by hand
        cmp_ = SparkCompare(spark, rebuilt, tomorrow, join_columns=keys)
        assert cmp_.matches()

        # 5. publish the new snapshot partitioned by order status;
        #    read-back must still match
        out = str(tmp_path / "published")
        published = tomorrow.withColumn(
            "status_part", F.col("o_orderstatus")
        )
        write_partitioned(published, out, "status_part", sort_columns="o_orderkey")
        back = spark.read.parquet(out).drop("status_part")
        cmp2 = SparkCompare(spark, back, tomorrow, join_columns=keys)
        assert cmp2.matches()


class TestNightlyIngestPipeline:
    """The r8 ingest composition: feed-health gate → incremental dedup
    against the standing ledger → deterministic sharding of survivors.
    Each operator is tested alone elsewhere; this asserts they compose on
    the same frames with no glue beyond what a user would write."""

    def test_anomaly_gate_ledger_dedup_shard(self, spark, documents, tmp_path):
        import datetime as dt

        from pyspark.sql import functions as F

        from datacompy_spark.operators.analytics import rolling_anomaly
        from datacompy_spark.operators.dedup import incremental_dedup_with_ledger
        from datacompy_spark.operators.textops import shard_corpus

        spark.sql("DROP TABLE IF EXISTS nightly_ledger")
        try:
            # ingest log: one event per arriving doc, steady feed
            docs = documents.select("doc_id", "text").limit(120)
            base = dt.datetime(2026, 1, 2)
            arrivals = docs.select(
                "doc_id",
                F.lit("ingest").alias("event_type"),
                (
                    F.lit(base)
                    + (F.col("doc_id") % 24).cast("int") * F.expr("INTERVAL 1 HOUR")
                ).alias("ts"),
            )
            scores = rolling_anomaly(
                arrivals, "ts", ["event_type"], bucket_seconds=3600,
                trailing=24, min_history=3,
            )
            flagged = scores.filter(F.abs(F.col("zscore")) >= 6).count()
            assert flagged == 0  # steady feed → gate passes

            # day 1: seed the ledger with the even half
            day1 = docs.filter(F.col("doc_id") % 2 == 0)
            v1 = incremental_dedup_with_ledger(
                spark, day1, "nightly_ledger", "doc_id", "text", num_buckets=4
            )
            n_seeded = v1.filter(F.col("verdict") == "new").count()
            assert n_seeded > 0

            # day 2: odd half + a replayed even doc → replay must die
            day2 = docs.filter(
                (F.col("doc_id") % 2 == 1) | (F.col("doc_id") == 0)
            )
            v2 = incremental_dedup_with_ledger(
                spark, day2, "nightly_ledger", "doc_id", "text", num_buckets=4
            )
            verdicts = {r["doc_id"]: r["verdict"] for r in v2.collect()}
            assert verdicts.get(0) == "dup_corpus"
            survivors = v2.filter(F.col("verdict") == "new").select("doc_id")
            assert survivors.count() > 0

            # shard the survivors for training order: deterministic, dense
            shards = shard_corpus(survivors, "doc_id", n_shards=4)
            rows = shards.collect()
            assert len(rows) == survivors.count()
            per = {}
            for r in rows:
                per.setdefault(r["shard"], []).append(r["pos"])
            for s, ps in per.items():
                assert sorted(ps) == list(range(1, len(ps) + 1))
        finally:
            spark.sql("DROP TABLE IF EXISTS nightly_ledger")


class TestNightlyEmbeddingPipeline:
    """The r8 embedding lane end to end:

        health gate → kmeans fit → persisted IVF index → streaming ingest
        → cluster-balanced sample → leakage-safe split

    Each step is unit-tested elsewhere; this asserts they compose on the
    real test embeddings with no glue beyond user code."""

    def test_health_cluster_index_sample_split(self, spark, tmp_path):
        from datacompy_spark.operators.profile import embedding_health
        from datacompy_spark.operators.similarity import (
            build_ivf_index,
            kmeans_fit,
            query_ivf_index,
        )
        from datacompy_spark.operators.textops import (
            cap_per_group,
            split_by_group,
        )
        from datacompy_spark.sources.loaders import load_table
        from datacompy_spark.streaming.drift import (
            streaming_cluster_assign,
            streaming_ivf_ingest,
        )

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

        # 1. QA gate: only rows the health check passes move on
        ok = (
            embedding_health(emb, "vec_id", "embedding", dim=64)
            .filter(F.col("verdict") == "ok")
            .select("vec_id")
        )
        clean = emb.join(ok, "vec_id")
        assert clean.count() == emb.count()  # testdata is clean

        # 2. train the quantizer once; centroids drive BOTH the index and
        # the cluster assignments
        cents = kmeans_fit(clean, "vec_id", "embedding", k=6, iters=2)

        # 3. persisted index built from half the corpus, other half arrives
        # via the stream
        idx = str(tmp_path / "idx")
        half_a = clean.filter(F.col("vec_id") % 2 == 0)
        half_b = clean.filter(F.col("vec_id") % 2 == 1).select(
            "vec_id", "embedding"
        )
        pivots = clean.filter(F.col("vec_id") % 101 == 0).select(
            "vec_id", "embedding"
        )
        build_ivf_index(half_a, "vec_id", "embedding", idx, pivots=pivots)
        sdir = str(tmp_path / "stream")
        half_b.repartition(2).write.parquet(sdir)
        q = streaming_ivf_ingest(
            spark.readStream.schema(half_b.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir),
            idx, "vec_id", "embedding",
            checkpoint_path=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)
        assert spark.read.parquet(f"{idx}/cells").count() == clean.count()
        nn = query_ivf_index(
            spark, idx, clean.filter(F.col("vec_id") % 97 == 0),
            "vec_id", "embedding", k=3, nprobe=2,
        )
        assert nn.count() > 0

        # 4. cluster-balanced sample from the SAME centroids
        assigned = streaming_cluster_assign(
            clean, cents, "vec_id", "embedding"
        )
        sample = cap_per_group(
            assigned.select("vec_id", "cluster_id"),
            "vec_id", "cluster_id", cap=20,
        )
        sizes = {
            r["cluster_id"]: r["n"]
            for r in sample.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert sizes and all(n <= 20 for n in sizes.values())

        # 5. leakage-safe split over the sampled ids, grouped by cluster:
        # every cluster lands wholly in one split
        out = split_by_group(
            sample.select("vec_id", "cluster_id"), "vec_id", "cluster_id"
        ).collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
        assert all(len(v) == 1 for v in by_cluster.values())
