"""Single-pass table profiling: per-column counts, null counts, distinct
counts, min/max — the "what am I even looking at" primitive that precedes
any comparison or pipeline run.

The whole profile is ONE aggregate action regardless of column count (the
same design as the compare engine's single statistics pass); the per-column
layout is melted to long format in-plan with an explode, never in the
driver.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value) — one
    row per profiled column, from one aggregate action.

    ``approx_distinct=True`` switches to HyperLogLog
    ``approx_count_distinct`` — at 100 TB that is the right choice: exact
    multi-column ``count_distinct`` plans an Expand (input replicated once
    per distinct-agg), while the sketch keeps the single narrow pass.
    min/max run on the native type (string-casting first would order
    "10" < "9") and cast to string only for the heterogeneous output."""
    cols = list(columns or df.columns)
    distinct = F.approx_count_distinct if approx_distinct else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn__{c}"),
            distinct(F.col(c)).alias(f"__nd__{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn__{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx__{c}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn__{c}")).alias("n_nulls"),
            F.col(f"__nd__{c}").alias("n_distinct"),
            F.col(f"__mn__{c}").alias("min_value"),
            F.col(f"__mx__{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
