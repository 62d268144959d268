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
