"""Scenario snapshot corpus for report() — breadth to match the reference's
golden set (``/root/reference/tests/snapshots/``: duplicates, no_mismatches,
sample_count variants, unique columns/rows, tolerances) plus engine-specific
scenarios (join-cols-only, empty intersection, masked report). Regenerate
with DATACOMPY_REGEN_SNAPSHOTS=1 after intentional format changes.

Each scenario builds small deterministic frames, renders the full report, and
compares byte-for-byte against its golden. Sample sections are sorted before
limiting (plans/report.py), so output is run-order independent.
"""

import os
import pathlib

import pytest

from datacompy_spark import SparkCompare

SNAP_DIR = pathlib.Path(__file__).parent / "snapshots"


def _base_frames(spark):
    df1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)],
        "id bigint, val string, score double",
    )
    df2 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "x", 2.0005), (3, "c", 3.0), (5, "e", 5.0)],
        "id bigint, val string, score double",
    )
    return df1, df2


def scenario_no_mismatches(spark):
    df1, _ = _base_frames(spark)
    return SparkCompare(spark, df1, df1.select(*df1.columns), join_columns="id")


def scenario_duplicates(spark):
    df1 = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b"), (3, "c")], "id bigint, val string"
    )
    df2 = spark.createDataFrame(
        [(1, "a"), (1, "zz"), (2, "b"), (2, "b2")], "id bigint, val string"
    )
    return SparkCompare(spark, df1, df2, join_columns="id")


def scenario_with_tolerances(spark):
    df1, df2 = _base_frames(spark)
    return SparkCompare(
        spark, df1, df2, join_columns="id", abs_tol=0.001, rel_tol=0
    )


def scenario_unique_columns(spark):
    df1, df2 = _base_frames(spark)
    from pyspark.sql import functions as F

    return SparkCompare(
        spark,
        df1.withColumn("only_left", F.lit(1)),
        df2.withColumn("only_right", F.lit("r")),
        join_columns="id",
    )


def scenario_sample_count_zero(spark):
    df1, df2 = _base_frames(spark)
    return SparkCompare(spark, df1, df2, join_columns="id")


def scenario_join_cols_only(spark):
    # frames consisting solely of the join key: no compared columns at all —
    # exercises the only_join_columns() degenerate report path
    df1 = spark.createDataFrame([(1,), (2,), (3,)], "id bigint")
    df2 = spark.createDataFrame([(2,), (3,), (4,)], "id bigint")
    return SparkCompare(spark, df1, df2, join_columns="id")


def scenario_empty_intersection(spark):
    # zero overlapping keys: every row is unique to one side
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, val string")
    df2 = spark.createDataFrame([(8, "x"), (9, "y")], "id bigint, val string")
    return SparkCompare(spark, df1, df2, join_columns="id")


def scenario_masked(spark):
    df1, df2 = _base_frames(spark)
    cmp_ = SparkCompare(spark, df1, df2, join_columns="id")
    cmp_.hide_sensitive_columns(["val"])
    return cmp_


def scenario_sample_count(spark):
    # sample_count=2 with more than 2 mismatching rows: exercises the
    # sorted-then-limited sample truncation (ref pandas_sample_count.txt)
    df1 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 9)], "id bigint, val string"
    )
    df2 = spark.createDataFrame(
        [(i, (f"x{i}" if i % 2 == 0 else f"v{i}")) for i in range(1, 9)],
        "id bigint, val string",
    )
    return SparkCompare(spark, df1, df2, join_columns="id")


def scenario_unique_rows(spark):
    # several rows unique to each side, none mismatching in the
    # intersection (ref pandas/polars unique_rows scenario)
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id bigint, val string"
    )
    df2 = spark.createDataFrame(
        [(3, "c"), (4, "d"), (5, "e"), (6, "f")], "id bigint, val string"
    )
    return SparkCompare(spark, df1, df2, join_columns="id")


SCENARIOS = {
    "spark_sample_count": (scenario_sample_count, 2),
    "spark_unique_rows": (scenario_unique_rows, 5),
    "spark_no_mismatches": (scenario_no_mismatches, 5),
    "spark_duplicates": (scenario_duplicates, 5),
    "spark_with_tolerances": (scenario_with_tolerances, 5),
    "spark_unique_columns": (scenario_unique_columns, 5),
    "spark_sample_count_zero": (scenario_sample_count_zero, 0),
    "spark_join_cols_only": (scenario_join_cols_only, 5),
    "spark_empty_intersection": (scenario_empty_intersection, 5),
    "spark_masked": (scenario_masked, 5),
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_report_scenario_snapshot(spark, name):
    build, sample_count = SCENARIOS[name]
    text = build(spark).report(sample_count=sample_count)
    snap = SNAP_DIR / f"{name}.txt"
    if os.environ.get("DATACOMPY_REGEN_SNAPSHOTS") == "1" or not snap.exists():
        snap.parent.mkdir(exist_ok=True)
        snap.write_text(text)
    assert text == snap.read_text()


def test_masked_report_shows_asterisks_not_values(spark):
    cmp_ = scenario_masked(spark)
    text = cmp_.report(sample_count=5)
    # the val mismatch sample must render masks, not the real cell values
    assert text.count("*******") >= 2
    sample_section = text[text.index("Sample Rows"):]
    assert " x " not in sample_section and "\tx" not in sample_section
