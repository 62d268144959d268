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


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    suffixes: tuple = ("_l", "_r"),
) -> DataFrame:
    """Temporal range join: pairs (l, r) sharing ``on`` keys with
    ``l.ts + lower_ms <= r.ts <= l.ts + upper_ms``.

    A naive theta join on the interval predicate degenerates to a per-key
    cross product. Here both sides are bucketed by ``W = upper - lower``
    milliseconds; any qualifying pair lands in the same or adjacent bucket,
    so the plan is an EQUI-join on (keys, bucket) — one hash shuffle — with
    the exact interval applied as a post-filter. Each left row probes at
    most two buckets (exploded), so the work is O(matches), not O(pairs).
    """
    if upper_ms <= lower_ms:
        raise ValueError("upper_ms must exceed lower_ms")
    w = upper_ms - lower_ms
    on = list(on)

    lm = F.unix_millis(F.col(left_ts))
    rm = F.unix_millis(F.col(right_ts))

    l = left.select(
        *[F.col(c) for c in on],
        *[F.col(c).alias(f"{c}{suffixes[0]}") for c in left.columns if c not in on],
        lm.alias("__lms"),
        F.explode(
            F.array(
                F.floor((lm + F.lit(lower_ms)) / F.lit(w)),
                F.floor((lm + F.lit(upper_ms)) / F.lit(w)),
            )
        ).alias("__bucket"),
    )  # the two probe buckets always differ by exactly 1 (width == span),
    # and a right row lives in exactly one bucket → no duplicate pairs
    r = right.select(
        *[F.col(c) for c in on],
        *[F.col(c).alias(f"{c}{suffixes[1]}") for c in right.columns if c not in on],
        rm.alias("__rms"),
        F.floor(rm / F.lit(w)).alias("__bucket"),
    )
    joined = l.join(r, on + ["__bucket"]).filter(
        (F.col("__rms") >= F.col("__lms") + F.lit(lower_ms))
        & (F.col("__rms") <= F.col("__lms") + F.lit(upper_ms))
    )
    return joined.drop("__bucket", "__lms", "__rms")


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


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    max_gap_ms: int = 3_600_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Sequential conversion funnel: per user, the earliest time each stage
    was reached, where stage k counts only if it happens AFTER stage k-1's
    reach time and within ``max_gap_ms`` of it. Output is one row per
    (stage_idx, stage) with ``n_users`` reaching it — the standard
    view→click→purchase product-analytics question.

    Scale shape: ONE shuffle. All stage-reach times come from cumulative
    ``min`` windows over the same (user, ts) ordering — window k reads
    window k-1's column, and Spark chains same-spec window operators
    without re-partitioning or re-sorting. No self-joins, no per-stage
    passes over the corpus; per-user state is |stages| running minima.
    Timestamps are compared in epoch milliseconds so the engine and the
    SQL oracle do identical integer arithmetic."""
    from pyspark.sql import Window

    order = [F.col("__ms")] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = df.select(
        F.col(user_col),
        F.col(type_col).alias("__type"),
        F.unix_millis(F.col(ts_col)).alias("__ms"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    )
    reach_cols = []
    for i, stage in enumerate(stages):
        if i == 0:
            qual = F.col("__type") == stage
        else:
            prev = F.col(f"__r{i-1}")
            qual = (
                (F.col("__type") == stage)
                & prev.isNotNull()
                & (F.col("__ms") >= prev)
                & (F.col("__ms") <= prev + F.lit(max_gap_ms))
            )
        cur = cur.withColumn(
            f"__r{i}", F.min(F.when(qual, F.col("__ms"))).over(w)
        )
        reach_cols.append(f"__r{i}")
    # per-user final reach times = the windows' values on the user's LAST row;
    # a plain groupBy-min would accept stage-k events from before stage k-1
    per_user = cur.groupBy(user_col).agg(
        *[F.min(F.col(c)).alias(c) for c in reach_cols]
    )
    counts = per_user.agg(
        *[
            F.count(F.col(c)).cast("long").alias(f"__n{i}")
            for i, c in enumerate(reach_cols)
        ]
    )
    rows = [
        F.struct(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.col(f"__n{i}").alias("n_users"),
        )
        for i, stage in enumerate(stages)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
