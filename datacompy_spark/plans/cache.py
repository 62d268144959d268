"""Tracked persist ledger: bounded-lifecycle caching for operator internals.

Several operators persist an internal frame that multiple branches of the
RETURNED lazy plan consume (e.g. the normalized key frame in the
edit-distance join family feeds the index, the probe, and the exact
verify). The persist is load-bearing — without it Spark re-executes the
full upstream scan per consumer — but the returned plan is lazy, so the
function cannot know when its caller is done and the cache can drop.

In a short-lived session (CLI run, driver sweep) the leak is harmless:
the session ends, the block manager goes with it. In a long-lived
session calling such operators repeatedly (a notebook, a service), the
entries accumulate. :func:`tracked_persist` registers every such frame
in a module ledger; callers drain it explicitly:

    from datacompy_spark import release_caches
    pairs = edit_distance_pairs(docs, "doc_id", "text", max_dist=2)
    pairs.write.parquet(out)      # plan materialized — caches now idle
    release_caches()              # drop every operator-internal cache

``spark.catalog.clearCache()`` is the blunt alternative (it also drops
caches the USER created); ``release_caches`` frees exactly the frames
this library persisted and nothing else.
"""

from __future__ import annotations

import weakref
from typing import List

from pyspark.sql import DataFrame

_TRACKED: List[DataFrame] = []

#: weakrefs to frames returned by ``lineage_barrier``'s localCheckpoint
#: branch. Weak, not strong: if the caller dropped every reference, the
#: Python GC + Spark's ContextCleaner reclaim the blocks on their own, and
#: a strong ledger entry would PIN the frame and block exactly that path.
_TRACKED_CHECKPOINTS: List["weakref.ref[DataFrame]"] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register in the ledger for :func:`release_caches`.

    Returns the persisted frame. Materialization stays lazy — the first
    action populates the cache, exactly as with a bare ``persist()``.
    """
    df = df.persist()
    _TRACKED.append(df)
    return df


def register_checkpoint(df: DataFrame) -> DataFrame:
    """Record a localCheckpoint-ed frame for :func:`release_checkpoints`."""
    _TRACKED_CHECKPOINTS.append(weakref.ref(df))
    return df


def release_caches() -> int:
    """Unpersist every ledger entry; returns how many frames were released.

    Safe to call at any time: a plan whose cache is dropped early is
    recomputed from lineage on its next action (slower, never wrong).
    Deliberately does NOT touch localCheckpoint blocks — dropping those is
    destructive (see :func:`release_checkpoints`), so it stays a separate,
    explicit call.
    """
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            released += 1
        except Exception:  # noqa: BLE001 — a dead session must not raise here
            pass
    return released


def release_checkpoints() -> int:
    """Free the executor-local blocks of every registered localCheckpoint.

    UNLIKE :func:`release_caches` this is destructive: a localCheckpoint
    TRUNCATED its frame's lineage, so once the blocks are dropped the frame
    cannot be recomputed — any later action on it fails. Call it only when
    every consumer has fully materialized (e.g. after writing the results
    to parquet), in long-lived/borrowed sessions where waiting for GC +
    ContextCleaner to reclaim the blocks is not acceptable. Frames the
    caller already dropped are skipped (the weakref is dead) — the normal
    GC path reclaims those.
    """
    released = 0
    while _TRACKED_CHECKPOINTS:
        df = _TRACKED_CHECKPOINTS.pop()()
        if df is None:  # caller dropped it — GC/ContextCleaner's job
            continue
        try:
            # the localCheckpoint blocks live in the LogicalRDD's internal
            # RDD; DataFrame.unpersist() does not reach them (probed on
            # PySpark 4.1: this drops the MapPartitionsRDD blocks from
            # getRDDStorageInfo, plain unpersist leaves them)
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
            released += 1
        except Exception:  # noqa: BLE001 — a dead session must not raise here
            pass
    return released
