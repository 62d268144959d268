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


ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_history", T.LongType()),
        T.StructField("hist_sum", T.LongType()),
        T.StructField("hist_sumsq", T.LongType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)

_ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def streaming_anomaly(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    bucket_seconds: int = 3600,
    trailing: int = 24,
    min_history: int = 6,
) -> DataFrame:
    """Always-on volume-anomaly scores — the streaming counterpart of
    ``operators.analytics.rolling_anomaly``, built on
    ``applyInPandasWithState`` because no watermarked window can express
    "score THIS bucket against the N buckets before it" (the frame
    reaches backwards across window boundaries).

    State per key: the (bucket → count) map of the most recent
    ``2 × trailing`` buckets as two parallel arrays — O(trailing) per
    key, pruned on every update, engine-checkpointed. Each micro-batch
    folds its events into the map and re-emits scores for the buckets it
    touched (update mode: a late event revises its bucket's score).
    Events older than the pruning horizon are folded into nothing —
    documented loss, same contract as a watermark.

    The z-score uses the IDENTICAL exact-integer formula as the batch
    operator — ``(n·x − Σx)/sqrt(n·Σx² − (Σx)²)`` over int sums — so a
    single-batch replay reproduces the batch operator's floats bit for
    bit (the equivalence test pins this).

    On a batch frame: delegates to ``rolling_anomaly`` (the oracle twin),
    key column renamed/cast to the streaming output shape."""
    from pyspark.sql import functions as F

    if not df.isStreaming:
        from datacompy_spark.operators.analytics import rolling_anomaly

        out = rolling_anomaly(
            df, ts_col, [key_col], bucket_seconds=bucket_seconds,
            trailing=trailing, min_history=min_history,
        )
        return out.select(
            F.col(key_col).cast("string").alias("key"),
            "bucket", "n_events", "n_history", "hist_sum", "hist_sumsq", "zscore",
        )

    def update(
        key: Tuple[str], pdfs: Iterator["pandas.DataFrame"], state: GroupState  # noqa: F821
    ) -> Iterator["pandas.DataFrame"]:
        import math

        import pandas as pd

        if state.exists:
            bks, cts = state.get
            hist = dict(zip(list(bks), list(cts)))
        else:
            hist = {}
        touched = set()
        for pdf in pdfs:
            for b, c in pdf.groupby("bucket").size().items():
                b = int(b)
                hist[b] = hist.get(b, 0) + int(c)
                touched.add(b)
        # score BEFORE pruning: the horizon bounds what future batches can
        # revise, never what this batch already knows — a backfill batch
        # spanning more than the horizon must still score its early
        # buckets against the full history it just delivered (and a
        # single-batch replay must reproduce the batch operator exactly)
        rows = []
        for b in sorted(touched):
            prior = [hist[x] for x in hist if b - trailing <= x < b]
            n, s1 = len(prior), sum(prior)
            s2 = sum(v * v for v in prior)
            var_num = n * s2 - s1 * s1
            z = (
                (float(n) * float(hist[b]) - float(s1)) / math.sqrt(float(var_num))
                if n >= min_history and var_num > 0
                else None
            )
            # SQL window sums over an EMPTY frame are NULL (count is 0);
            # match that so the single-batch replay is value-identical
            rows.append(
                (key[0], b, hist[b], n,
                 s1 if n else None, s2 if n else None, z)
            )
        # prune for the SAVED state only: bounded O(trailing) per key
        if hist:
            horizon = max(hist) - 2 * trailing
            hist = {b: c for b, c in hist.items() if b >= horizon}
        state.update((sorted(hist), [hist[b] for b in sorted(hist)]))
        yield pd.DataFrame(
            rows,
            columns=[
                "key", "bucket", "n_events", "n_history",
                "hist_sum", "hist_sumsq", "zscore",
            ],
        )

    bucketed = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).alias("bucket"),
    )
    return bucketed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HEAVY_HITTERS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("min_count", T.LongType()),
        T.StructField("n_total", T.LongType()),
    ]
)

_HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("values", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("total", T.LongType()),
    ]
)


def _misra_gries_fold(counters: dict, values, capacity: int) -> dict:
    """Fold a value sequence into Misra-Gries counters of size ≤ capacity.

    Classic guarantee: every value with true frequency > n/(capacity+1)
    survives, and each surviving counter undercounts its value's true
    frequency by at most n/(capacity+1)."""
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            # decrement-all step; drop zeroed counters
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
    return counters


def streaming_heavy_hitters(
    df: DataFrame,
    key_col: str,
    value_col: str,
    capacity: int = 64,
) -> DataFrame:
    """Per-key heavy hitters over an unbounded stream in O(capacity)
    state — Misra-Gries summaries maintained across micro-batches via
    ``applyInPandasWithState``. Answers "which values dominate this key's
    feed?" (top user-ids per event type, top domains per source, …)
    without the unbounded per-key value dictionary an exact count needs.

    Guarantee (per key, n = events seen): any value with true frequency
    > n/(capacity+1) is present, and each reported ``min_count``
    undercounts the true frequency by at most n/(capacity+1) — a LOWER
    bound, never an overcount. With ``capacity`` ≥ the key's distinct
    value count the summary is exact (the batch-equality test pins this).

    Each micro-batch re-emits the key's full current summary (update
    mode). On a batch frame: exact per-value groupBy counts (no
    truncation) — with capacity ≥ the distinct value count the streaming
    summary is identical to it, which is the equality oracle in tests."""
    from pyspark.sql import functions as F

    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    if not df.isStreaming:
        counts = (
            df.select(
                F.col(key_col).cast("string").alias("key"),
                F.col(value_col).cast("string").alias("value"),
            )
            .groupBy("key", "value")
            .agg(F.count(F.lit(1)).alias("min_count"))
        )
        from pyspark.sql import Window

        w = Window.partitionBy("key")
        return counts.select(
            "key", "value", "min_count",
            F.sum("min_count").over(w).alias("n_total"),
        )

    def update(
        key: Tuple[str], pdfs: Iterator["pandas.DataFrame"], state: GroupState  # noqa: F821
    ) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        if state.exists:
            vals, cts, total = state.get
            counters = dict(zip(list(vals), list(cts)))
            total = int(total)
        else:
            counters, total = {}, 0
        for pdf in pdfs:
            seq = pdf[value_col].astype("string").tolist()
            total += len(seq)
            _misra_gries_fold(counters, seq, capacity)
        items = sorted(counters)
        state.update((items, [counters[v] for v in items], total))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(items),
                "value": items,
                "min_count": [counters[v] for v in items],
                "n_total": [total] * len(items),
            }
        )

    src = df.select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(value_col).cast("string").alias(value_col),
    )
    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=HEAVY_HITTERS_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
