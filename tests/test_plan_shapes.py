"""Physical-plan regression guards: the scale properties we engineered
(shuffle counts, column pruning, no pathological recompute) must not quietly
regress as the engine evolves."""

import re

import pytest
from pyspark.sql import functions as F

from datacompy_spark import SparkCompare


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def li_pair(spark, lineitem):
    df1 = lineitem.filter(F.col("l_orderkey") % 50 != 0)
    df2 = lineitem.filter(F.col("l_orderkey") % 50 != 1)
    return df1, df2


KEYS = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]


class TestCompareTopology:
    def test_assume_unique_minimal_plan(self, spark, li_pair):
        c = SparkCompare(spark, *li_pair, join_columns=KEYS, assume_unique=True)
        p = plan_of(c._outer)
        assert p.count("Exchange") == 2, "assume_unique must be one shuffle per side"
        assert p.count("Window") == 0
        assert p.count("SortMergeJoin") == 1

    def test_paired_plan_bounded(self, spark, li_pair):
        c = SparkCompare(spark, *li_pair, join_columns=KEYS)
        p = plan_of(c._outer)
        # ordinal pairing costs at most one extra exchange per side
        assert p.count("Exchange") <= 4
        assert p.count("Window") == 2
        assert p.count("SortMergeJoin") == 1

    def test_narrow_projection_prunes_scan(self, spark, li_pair):
        c = SparkCompare(spark, *li_pair, join_columns=KEYS, assume_unique=True)
        narrow = c.intersect_rows.select("l_orderkey", "l_quantity_df1")
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan_of(narrow))
        assert schemas, "expected parquet ReadSchema in plan"
        for s in schemas:
            cols = {c.split(":")[0] for c in s.split(",")}
            assert cols <= {"l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"}

    def test_stats_is_single_aggregate_action(self, spark, li_pair):
        c = SparkCompare(spark, *li_pair, join_columns=KEYS)
        before = spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []
        _ = c._stats
        after = spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []
        # one action → a small bounded number of jobs (AQE may split stages
        # into a few jobs, but far fewer than a per-column action loop)
        new_jobs = len(set(after) - set(before))
        # AQE materializes stages as separate jobs (≈6 for one action); the
        # guard is against regressing to a per-column action loop (2N+1 ≥ 15)
        assert new_jobs <= 8, f"stats ran {new_jobs} jobs; expected a single action"


class TestKnnTopology:
    def test_bruteforce_broadcasts_queries(self, spark, embeddings):
        from datacompy_spark.operators.similarity import knn_bruteforce

        probes = embeddings.filter(F.col("vec_id") % 97 == 0)
        p = plan_of(knn_bruteforce(embeddings, probes, "vec_id", "embedding", k=3))
        assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
