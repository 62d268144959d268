"""Partition-count guard for Python-heavy stages.

Local parquet files under ``spark.sql.files.maxPartitionBytes`` (128 MB
default) scan as a SINGLE partition, which serializes every downstream
Arrow/``mapInPandas``/interpreted-HOF stage onto one core — a 32x
slowdown on exactly the operators that pay per-row Python cost. At real
scale the scan already carries thousands of partitions and this guard is
a no-op; it only rescues the small-input case, so the round-robin shuffle
it introduces is bounded by the small input itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` round-robin ONLY if its current partition count is
    below ``min_parts`` (default: the session's default parallelism, i.e.
    the core count in local mode). Safe before any partitioning-insensitive
    stage (per-row maps, blocked self-joins that shuffle on their own keys
    anyway)."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    # getNumPartitions builds the physical RDD plan but launches no job
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
