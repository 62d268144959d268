"""Custom stateful streaming operators via ``applyInPandasWithState``.

Demonstrates the arbitrary-stateful path (the escape hatch when watermarked
windows can't express the semantics): per-key running aggregates that
survive across micro-batches, with GroupState checkpointed by the engine.
State per key is O(1); keys distribute over the cluster by the groupBy hash.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_nulls", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("nulls", T.LongType()),
    ]
)


def running_totals(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running (count, sum, null-count) maintained across
    micro-batches; each batch emits the updated totals for keys it touched.

    On a batch DataFrame: plain groupBy aggregation with identical output
    (the batch twin / oracle)."""
    if not df.isStreaming:
        from pyspark.sql import functions as F

        return df.groupBy(F.col(key_col).alias("key")).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col(value_col), F.lit(0.0))).alias("total_value"),
            F.sum(F.when(F.col(value_col).isNull(), 1).otherwise(0)).alias("n_nulls"),
        )

    def update(
        key: Tuple[str], pdfs: Iterator["pandas.DataFrame"], state: GroupState  # noqa: F821
    ) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        n, total, nulls = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            vals = pdf[value_col]
            n += len(pdf)
            nulls += int(vals.isna().sum())
            total += float(vals.fillna(0.0).sum())
        state.update((n, total, nulls))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total_value": [total], "n_nulls": [nulls]}
        )

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
