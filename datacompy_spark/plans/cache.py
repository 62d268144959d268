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


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register in the ledger for :func:`release_caches`.

    Returns the persisted frame. Materialization stays lazy — the first
    action populates the cache, exactly as with a bare ``persist()``.
    """
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every ledger entry; returns how many frames were released.

    Safe to call at any time: a plan whose cache is dropped early is
    recomputed from lineage on its next action (slower, never wrong).
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
