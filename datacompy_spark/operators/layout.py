"""Multi-dimensional data layout: Z-order (Morton) clustering keys and a
Z-ordered parquet writer.

Why this exists at 100 TB: sorting a lake table by ONE column gives parquet
row-group min/max pruning on that column only; interleaving the bits of
several quantized columns (a Z-curve) gives *every* interleaved column
locality, so a filter on any of them prunes most row groups. This is the
same layout trick Delta Lake's ``OPTIMIZE ZORDER BY`` and Iceberg's
``sort_order(zorder(...))`` apply — re-expressed here as a plain Column
expression plus ``repartitionByRange`` so it works on stock Spark parquet.

Everything is exact int64 bit arithmetic (quantize → interleave), so the
key is oracle-checkable cross-engine, and the write path is a range
repartition on the key — one shuffle, no skew (range boundaries come from
Spark's reservoir sampling over the key distribution).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(qcols: Sequence[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each already-quantized int64
    column: bit ``j`` of column ``i`` lands at output position
    ``j * ncols + i``. Pure shift/and/or — exact on any engine."""
    ncols = len(qcols)
    out = F.lit(0).cast("long")
    for i, q in enumerate(qcols):
        for j in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(q, j).bitwiseAND(F.lit(1)), j * ncols + i)
            )
    return out


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "zval",
) -> DataFrame:
    """Attach a Z-order (Morton) clustering key over integer-valued
    ``cols``: each column is min-max quantized to ``bits`` bits —
    ``q = (x - min) * (2^bits - 1) DIV max(1, max - min)`` — and the
    quantized values are bit-interleaved into one int64 ``out_col``.

    ``bits * len(cols)`` must be ≤ 62. The quantizing division is written
    as ``floor(double(num) / double(range))`` — the SAME IEEE expression on
    both engines, so it is cross-engine exact as long as
    ``(max - min) * (2^bits - 1)`` stays below 2^52 (with the default 8
    bits: column ranges up to ~1.7e13; raise an eyebrow, not the bits, for
    wider domains — quantize to a coarser unit first).

    The per-column min/max come from ONE corpus agg folded to a single row
    and broadcast into the projection — no driver round-trip in the plan,
    no second scan per column. NULLs in any interleaved column quantize to
    the cell floor (rank 0) rather than poisoning the whole key.
    """
    if bits * len(cols) > 62:
        raise ValueError(f"zorder_key: {bits} bits x {len(cols)} cols exceeds int64")
    if not cols:
        raise ValueError("zorder_key: need at least one column")
    levels = (1 << bits) - 1
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"__min_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("long").alias(f"__max_{i}") for i, c in enumerate(cols)],
    )
    qcols: List[Column] = []
    for i, c in enumerate(cols):
        rng = F.greatest(F.lit(1).cast("long"), F.col(f"__max_{i}") - F.col(f"__min_{i}"))
        num = (F.col(c).cast("long") - F.col(f"__min_{i}")) * F.lit(levels)
        q = F.floor(num.cast("double") / rng.cast("double")).cast("long")
        qcols.append(F.coalesce(q, F.lit(0).cast("long")))
    return df.crossJoin(F.broadcast(stats)).select(
        *[F.col(c) for c in df.columns],
        _interleave(qcols, bits).alias(out_col),
    )


def zorder_key_sql(
    table: str,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "zval",
    select_cols: Sequence[str] | None = None,
) -> str:
    """DuckDB twin of :func:`zorder_key` (same quantization and interleave
    arithmetic; the quantizing division is the identical
    ``floor(::DOUBLE / ::DOUBLE)`` IEEE expression the Spark side uses).

    ``select_cols`` optionally narrows the passthrough projection (the
    Spark side keeps all of ``df``'s columns; a query wrapper that selects
    a subset should pass the same subset here)."""
    if bits * len(cols) > 62:
        raise ValueError(f"zorder_key_sql: {bits} bits x {len(cols)} cols exceeds int64")
    levels = (1 << bits) - 1
    ncols = len(cols)
    mins = ", ".join(f"min({c})::BIGINT AS min_{i}" for i, c in enumerate(cols))
    maxs = ", ".join(f"max({c})::BIGINT AS max_{i}" for i, c in enumerate(cols))
    qdefs = ", ".join(
        f"coalesce(floor((({c}::BIGINT - s.min_{i}) * {levels})::DOUBLE"
        f" / greatest(1::BIGINT, s.max_{i} - s.min_{i})::DOUBLE)::BIGINT, 0) AS q_{i}"
        for i, c in enumerate(cols)
    )
    terms = []
    for i in range(ncols):
        for j in range(bits):
            terms.append(f"(((q_{i} >> {j}) & 1) << {j * ncols + i})")
    zexpr = " | ".join(terms)
    keep = ", ".join(select_cols) if select_cols else "* EXCLUDE (" + ", ".join(
        f"q_{i}" for i in range(ncols)
    ) + ")"
    return f"""
WITH s AS (SELECT {mins}, {maxs} FROM {table}),
q AS (SELECT t.*, {qdefs} FROM {table} t CROSS JOIN s)
SELECT {keep}, ({zexpr})::BIGINT AS {out_col} FROM q"""


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    target_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet physically clustered along the Z-curve of
    ``cols``: attach the Morton key, ``repartitionByRange`` on it (range
    boundaries from Spark's sampled quantiles — balanced files even under
    key skew), sort within each partition, and drop the key before the
    write so the on-disk schema is unchanged.

    Effect at scale: row-group min/max stats become tight boxes along the
    Z-curve, so point/range predicates on ANY of ``cols`` prune most row
    groups (verified by the row-group profiler in the test suite). This is
    the batch-layout complement of ``compact_files`` — same writer shape,
    multi-dimensional sort key.
    """
    keyed = zorder_key(df, cols, bits=bits, out_col="__zval")
    (
        keyed.repartitionByRange(target_files, "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval")
        .write.mode(mode)
        .parquet(path)
    )
