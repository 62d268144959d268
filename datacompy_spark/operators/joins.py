"""Temporal join operators the core Spark API lacks: as-of join.

The reference library has no as-of/range joins (SURVEY §2.3) — this is part
of the training-data-pipeline extension surface.

Implementation is the union-merge pattern, not a join: tag right rows 0 and
left rows 1, sort per key by (ts, tag, tiebreak), and carry the latest right
values forward with ``last(..., ignorenulls=True)`` over an unbounded-
preceding window. One shuffle on the key columns, no join explosion, and the
window state is O(1) per row — this scales to arbitrarily dense right sides,
where a naive range join (left × all-earlier-rights) is quadratic.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    carry_cols: Sequence[str],
    tiebreak_col: Optional[str] = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row (``right.ts <=
    left.ts``) within the same ``on`` key group.

    Output: all left columns + ``{prefix}{ts_col}`` + ``{prefix}{c}`` for
    each carried column (NULL when no prior right row exists). Ties at the
    same timestamp: the right row counts as "prior" (<= semantics), and
    ``tiebreak_col`` makes the pick among equal-ts right rows deterministic.
    """
    on = list(on)
    tag = F.lit(0)
    r = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__carry_{c}") for c in carry_cols],
        *(
            [F.col(tiebreak_col).alias("__tb")]
            if tiebreak_col
            else [F.lit(0).alias("__tb")]
        ),
    )
    left_cols = left.columns
    l = left.select(
        "*",
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__tag"),
        *(
            [F.col(tiebreak_col).alias("__tb")]
            if tiebreak_col
            else [F.lit(0).alias("__tb")]
        ),
    )
    for c in carry_cols:
        l = l.withColumn(f"__carry_{c}", F.lit(None).cast(right.schema[c].dataType))
    u = r.unionByName(l, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.col(f"__carry_{c}"), ignorenulls=True).over(w).alias(f"{prefix}{c}")
        for c in carry_cols
    ]
    asof_ts = F.last(
        F.when(F.col("__tag") == 0, F.col("__ts")), ignorenulls=True
    ).over(w).alias(f"{prefix}{ts_col}")
    return (
        u.select("*", asof_ts, *carried)
        .filter(F.col("__tag") == 1)
        .select(*left_cols, f"{prefix}{ts_col}", *[f"{prefix}{c}" for c in carry_cols])
    )
