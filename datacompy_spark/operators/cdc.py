"""Change-data-capture between keyed table snapshots.

Extension beyond the reference surface (its ``SparkSQLCompare``,
``spark.py:450-528``, classifies rows left/right-only/both but never emits a
change feed). ``snapshot_cdc`` turns two snapshots of the same keyed table
into an insert/delete/update feed with the exact set of changed columns per
row — the shape a downstream incremental consumer (SCD merge, audit log,
cache invalidation) wants. ``apply_changes`` is the inverse: replay a feed
onto the old snapshot to reproduce the new one, which doubles as the
self-test of the pair.

Scale design: one null-safe full-outer equi-join on the key (single
shuffle, AQE-compatible sort-merge; broadcast when one snapshot is small),
change classification and the changed-column set computed as native column
expressions inside the same stage — no second pass, no UDFs, no driver
materialization. At 100 TB the join IS the cost floor for snapshot diffing;
for recurring diffs of the same table, bucket both snapshots on the key
(``sources/loaders.py::write_bucketed``) and the Exchange disappears.
"""

from __future__ import annotations

from functools import reduce
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change_type values, in output order.
INSERT, DELETE, UPDATE = "insert", "delete", "update"


def snapshot_cdc(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    include_unchanged: bool = False,
    null_safe: bool = True,
) -> DataFrame:
    """Diff two snapshots keyed by ``keys``.

    Returns one row per changed key:
    ``keys..., change_type ∈ {insert,delete,update}, changed_cols
    array<string> (sorted; empty for insert/delete), <col>_old, <col>_new``
    for every compared column. ``insert`` = key only in ``new``; ``delete``
    = key only in ``old``; ``update`` = key in both with at least one
    compared column differing under null-safe equality. Unchanged keys are
    dropped unless ``include_unchanged`` (then tagged ``'unchanged'``).

    The key columns must be unique per snapshot (a snapshot IS a keyed
    state); duplicate keys make "the" old/new value ill-defined — use
    ``SparkCompare``'s ordinal pairing for bag semantics instead.

    ``compare_cols`` defaults to the non-key columns present in BOTH
    snapshots, so schema evolution (a column added or dropped between
    versions) doesn't break the diff — pair with
    ``operators.profile.schema_compare`` to report the column-level
    changes themselves.

    ``null_safe=False`` asserts the key columns contain no NULLs and joins
    on plain equality: Spark then hashes the raw key (not
    ``coalesce(key)/isnull(key)`` composites), which is what lets a pair of
    bucket-sorted snapshots (``sources/loaders.py::write_bucketed``) diff
    with ZERO Exchange — the recurring nightly-diff fast path.
    """
    keys = list(keys)
    if compare_cols is None:
        new_cols = set(new.columns)
        compare_cols = [c for c in old.columns if c not in keys and c in new_cols]
    compare_cols = list(compare_cols)

    # plan aliases (not df[...] references): `new` is routinely DERIVED from
    # `old` (filter/withColumn on the same scan), which makes attribute-based
    # references ambiguous under Spark's self-join check — qualified names
    # through Dataset aliases stay unambiguous regardless of shared lineage
    lhs = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
    ).alias("__cdc_l")
    rhs = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
    ).alias("__cdc_r")
    # Null-safe key equality: a NULL key component pairs with NULL, matching
    # the engine-wide join semantics (compare.py J1).
    if null_safe:
        cond = [
            F.col(f"__cdc_l.{k}").eqNullSafe(F.col(f"__cdc_r.{k}")) for k in keys
        ]
    else:
        cond = [F.col(f"__cdc_l.{k}") == F.col(f"__cdc_r.{k}") for k in keys]
    j = lhs.join(rhs, on=cond, how="full_outer")

    key_cols = [
        F.coalesce(F.col(f"__cdc_l.{k}"), F.col(f"__cdc_r.{k}")).alias(k)
        for k in keys
    ]
    # array_compact drops the NULL slots left by unchanged columns, giving
    # the sorted changed-column name set as one expression.
    changed = F.array_sort(
        F.array_compact(
            F.array(
                *[
                    F.when(
                        ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            )
        )
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit(INSERT))
        .when(F.col("__in_new").isNull(), F.lit(DELETE))
        .when(F.size(changed) > 0, F.lit(UPDATE))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *key_cols,
        change_type.alias("change_type"),
        F.when(F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(), changed)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
        *[F.col(f"{c}_old") for c in compare_cols],
        *[F.col(f"{c}_new") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def apply_changes(
    old: DataFrame,
    feed: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Replay a ``snapshot_cdc`` feed onto ``old``, reproducing ``new``.

    Deletes and updates are removed via a null-safe left-anti join on the
    key (one shuffle; broadcast when the feed is small, which it usually is
    relative to the snapshot), then updated/inserted rows are appended from
    the feed's ``*_new`` columns. Round-trip property:
    ``apply_changes(old, snapshot_cdc(old, new, k), k, cols) ≡ new``.
    """
    keys = list(keys)
    compare_cols = list(compare_cols)
    # same alias discipline as snapshot_cdc: the feed shares lineage with old
    touched = (
        feed.filter(F.col("change_type").isin(DELETE, UPDATE))
        .select(*keys)
        .alias("__cdc_t")
    )
    old_a = old.alias("__cdc_o")
    cond = [
        F.col(f"__cdc_o.{k}").eqNullSafe(F.col(f"__cdc_t.{k}")) for k in keys
    ]
    kept = old_a.join(touched, on=cond, how="left_anti")
    additions = feed.filter(F.col("change_type").isin(INSERT, UPDATE)).select(
        *keys, *[F.col(f"{c}_new").alias(c) for c in compare_cols]
    )
    return kept.select(*keys, *compare_cols).unionByName(additions)


def scd2_merge(
    history: Optional[DataFrame],
    snapshot: DataFrame,
    keys: Sequence[str],
    version,
    compare_cols: Optional[Sequence[str]] = None,
    version_type: str = "bigint",
    null_safe: bool = True,
) -> DataFrame:
    """Type-2 slowly-changing-dimension maintenance: merge one ``snapshot``
    (tagged ``version``) into an SCD2 ``history`` table — the standard
    warehouse materialization of what :func:`snapshot_cdc` detects.

    History schema: ``keys…, compare_cols…, valid_from, valid_to,
    is_current`` — one row per (key, value-span); ``valid_to`` NULL while
    the span is open. Merge semantics per key of the CURRENT slice vs the
    snapshot: an insert opens a span; an update closes the open span at
    ``version`` and opens a new one; a delete closes the span; an
    unchanged key passes through. Closed history rows are never touched.
    ``history=None`` bootstraps: every snapshot row opens at ``version``.

    Plan shape: ONE full-outer key join of the current slice against the
    snapshot; the up-to-two output rows per key (close + reopen on update)
    come from exploding a per-row candidate array inside the same stage —
    no second join, no second pass. Closed rows ride a union straight from
    the history scan. At 100 TB: the join is the cost floor (bucket the
    history on the key to kill the Exchange); history grows append-only,
    so store it partitioned by ``valid_to IS NULL`` to keep the current
    slice a partition-pruned scan.

    ``version`` must be orderable and castable to ``version_type``
    (bigint by default; pass ``version_type='date'``/``'timestamp'`` for
    calendar versions)."""
    keys = list(keys)
    ver = F.lit(version).cast(version_type)
    open_to = F.lit(None).cast(version_type)
    snap_data = [c for c in snapshot.columns if c not in keys]
    if compare_cols is None:
        compare_cols = (
            snap_data
            if history is None
            else [c for c in snap_data if c in history.columns]
        )
    cols = list(compare_cols)

    if history is None:
        return snapshot.select(
            *keys,
            *cols,
            ver.alias("valid_from"),
            open_to.alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    out_cols = [*keys, *cols, "valid_from", "valid_to", "is_current"]
    closed = history.filter(~F.col("is_current")).select(*out_cols)
    lhs = (
        history.filter(F.col("is_current"))
        .select(
            *keys,
            F.lit(True).alias("__in_old"),
            F.col("valid_from").alias("__vf"),
            *[F.col(c).alias(f"{c}_old") for c in cols],
        )
        .alias("__scd_l")
    )
    rhs = snapshot.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"{c}_new") for c in cols],
    ).alias("__scd_r")
    if null_safe:
        cond = [F.col(f"__scd_l.{k}").eqNullSafe(F.col(f"__scd_r.{k}")) for k in keys]
    else:
        cond = [F.col(f"__scd_l.{k}") == F.col(f"__scd_r.{k}") for k in keys]
    j = lhs.join(rhs, on=cond, how="full_outer")

    key_vals = [
        F.coalesce(F.col(f"__scd_l.{k}"), F.col(f"__scd_r.{k}")).alias(k)
        for k in keys
    ]
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")) for c in cols],
        F.lit(False),
    )

    def span(side: str, vf, vt, current: bool):
        return F.struct(
            *key_vals,
            *[F.col(f"{c}_{side}").alias(c) for c in cols],
            vf.alias("valid_from"),
            vt.alias("valid_to"),
            F.lit(current).alias("is_current"),
        )

    candidates = F.array_compact(
        F.array(
            # close the open span: key gone or values moved
            F.when(
                in_old & (~in_new | changed),
                span("old", F.col("__vf"), ver, False),
            ),
            # untouched open span passes through
            F.when(
                in_old & in_new & ~changed,
                span("old", F.col("__vf"), open_to, True),
            ),
            # open a new span: fresh key or the post-update values
            F.when(
                in_new & (~in_old | changed),
                span("new", ver, open_to, True),
            ),
        )
    )
    merged = (
        j.select(F.explode(candidates).alias("__span"))
        .select(*[F.col(f"__span.{c}").alias(c) for c in out_cols])
    )
    return closed.unionByName(merged)


def scd2_build(
    snapshots: Sequence,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    version_type: str = "bigint",
    null_safe: bool = True,
) -> DataFrame:
    """Fold a version-ordered sequence of ``(version, snapshot)`` pairs
    into one SCD2 history via repeated :func:`scd2_merge` — the bootstrap
    path when no history table exists yet. The fold is a driver-side loop
    over the (bounded) snapshot COUNT; each step is one distributed join,
    so the plan depth grows linearly with versions — localCheckpoint
    between steps if folding many."""
    history = None
    for version, snap in snapshots:
        history = scd2_merge(
            history,
            snap,
            keys,
            version,
            compare_cols=compare_cols,
            version_type=version_type,
            null_safe=null_safe,
        )
    if history is None:
        raise ValueError("scd2_build needs at least one snapshot")
    return history


def cdc_summary(feed: DataFrame) -> DataFrame:
    """Counts per change_type plus per-column update frequency — the
    one-line answer to "what moved between snapshots". Single partial-agg
    shuffle over the (already small relative to inputs) feed."""
    by_type = feed.groupBy("change_type").agg(F.count("*").alias("n_rows"))
    per_col = (
        feed.filter(F.col("change_type") == UPDATE)
        .select(F.explode("changed_cols").alias("column"))
        .groupBy("column")
        .agg(F.count("*").alias("n_rows"))
        .select(F.concat(F.lit("updated:"), "column").alias("change_type"), "n_rows")
    )
    return by_type.unionByName(per_col)


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Log compaction: collapse an append-only change log (or any
    multi-version table) to the LATEST row per key by ``order_col`` — the
    inverse direction of :func:`snapshot_cdc` (feed → state rather than
    state → feed), and the standard first step before comparing a CDC log
    against a snapshot.

    One window shuffle on the key with the rank filter pushed into the
    sort (WindowGroupLimit ⇒ O(1) memory per key, hot keys included).
    ``tiebreak`` columns break order ties deterministically — REQUIRED for
    reproducible compaction when ``order_col`` can repeat (e.g. same-ms
    events).
    """
    from datacompy_spark.operators.analytics import top_k_per_group

    tb = list(tiebreak) if tiebreak else []
    out = top_k_per_group(df, list(keys), order_col, k=1, ascending=False,
                          tiebreak=tb)
    return out.drop("rank")
