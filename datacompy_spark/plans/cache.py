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

from typing import List

from pyspark.sql import DataFrame

_TRACKED: List[DataFrame] = []

#: internal-RDD ids of frames returned by ``lineage_barrier``'s
#: localCheckpoint branch. Ids, not DataFrame references: a strong ref
#: would pin the JVM Dataset and block ContextCleaner's own cleanup, and
#: a WEAK ref is dead at every real call site — operators drop the Python
#: wrapper as soon as they return a derived frame, while the checkpoint
#: blocks stay pinned by the derived plan's LogicalRDD (probed: wrapper
#: GC does NOT free the blocks; unpersisting by id from
#: ``getPersistentRDDs`` does, even after the wrapper is gone). RDD ids
#: are monotonic per context and never reused, so a stale id simply
#: misses in the persistent-RDD map.
_TRACKED_CHECKPOINTS: List[int] = []

#: soft cap: ints are tiny, but a service that calls barrier-using
#: operators forever without ever releasing shouldn't grow this unbounded
_CHECKPOINT_LEDGER_CAP = 100_000


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register in the ledger for :func:`release_caches`.

    Returns the persisted frame. Materialization stays lazy — the first
    action populates the cache, exactly as with a bare ``persist()``.
    """
    df = df.persist()
    _TRACKED.append(df)
    return df


def register_checkpoint(df: DataFrame) -> DataFrame:
    """Record a localCheckpoint-ed frame's internal-RDD id for
    :func:`release_checkpoints`. Lazy (eager=False) checkpoints register
    too — localCheckpoint marks the RDD persisted immediately, so the id
    is already in the persistent-RDD map before materialization."""
    try:
        _TRACKED_CHECKPOINTS.append(
            df._jdf.queryExecution().analyzed().rdd().id()
        )
    except Exception:  # noqa: BLE001 — ledger bookkeeping must never break the op
        return df
    if len(_TRACKED_CHECKPOINTS) > _CHECKPOINT_LEDGER_CAP:
        del _TRACKED_CHECKPOINTS[: _CHECKPOINT_LEDGER_CAP // 2]
    return df


def checkpoint_ledger_mark() -> int:
    """Current ledger position — pass to :func:`release_checkpoints` to
    release only checkpoints registered AFTER this point (scoping a
    destructive release to one operator call instead of the whole
    process; a global release could kill checkpointed frames that
    unrelated consumers in a borrowed session still need)."""
    return len(_TRACKED_CHECKPOINTS)


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


def release_checkpoints(mark: int = 0) -> int:
    """Free the executor-local blocks of registered localCheckpoints.

    UNLIKE :func:`release_caches` this is destructive: a localCheckpoint
    TRUNCATED its frame's lineage, so once the blocks are dropped the frame
    cannot be recomputed — any later action on any plan built over it
    fails. Call it only when every consumer has fully materialized (e.g.
    after writing the results to parquet), in long-lived/borrowed sessions
    where waiting for the JVM GC + ContextCleaner to reclaim the blocks is
    not acceptable. Pass ``mark`` from :func:`checkpoint_ledger_mark` to
    release only the checkpoints one operator call registered, leaving
    earlier ones (possibly owned by unrelated consumers) alone.

    Blocks Spark's ContextCleaner already reclaimed are skipped (their id
    is gone from the persistent-RDD map).
    """
    from pyspark import SparkContext

    mark = max(0, min(mark, len(_TRACKED_CHECKPOINTS)))
    ids = _TRACKED_CHECKPOINTS[mark:]
    del _TRACKED_CHECKPOINTS[mark:]
    if not ids:
        return 0
    # the blocks live on the CONTEXT (getActiveSession is thread-local and
    # may be None for a borrowed session touched from another thread)
    sc = SparkContext._active_spark_context
    if sc is None:  # context gone — its block manager went with it
        return 0
    released = 0
    try:
        persistent = sc._jsc.getPersistentRDDs()
    except Exception:  # noqa: BLE001 — a dying context must not raise here
        return 0
    for rid in ids:
        try:
            jrdd = persistent.get(rid)
            if jrdd is None:  # ContextCleaner beat us to it
                continue
            jrdd.unpersist(False)
            released += 1
        except Exception:  # noqa: BLE001
            pass
    return released
