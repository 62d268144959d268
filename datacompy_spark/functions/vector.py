"""Vector math over array<float> embedding columns — pure Column expressions.

Everything is a sequential left-to-right double fold (``F.aggregate`` over
``F.zip_with``), which is bit-identical to DuckDB's ``list_sum(list_transform)``
fold — verified empirically — so cosine scores can appear in oracle-checked
outputs. No UDFs: the hot path stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm (double)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either norm is zero (``try_divide`` —
    matches DuckDB's x/0.0 → NULL instead of ANSI DIVIDE_BY_ZERO)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def _dot_seq_batch(a, b):
    """Arrow-batch dot product with the SAME left-to-right fold order as
    :func:`dot` / DuckDB ``list_sum(list_transform(...))``.

    ``np.dot`` would use pairwise/SIMD summation — fast but NOT bit-identical
    to a sequential fold, which would break oracle hash-matching. Instead we
    accumulate column-at-a-time (``acc += P[:, j]`` in index order): each row
    sees exactly the fold ``((0 + x0*y0) + x1*y1) + ...`` in IEEE double, yet
    the adds are vectorized across the rows of the batch."""
    import numpy as np
    import pandas as pd

    va, vb = a.to_numpy(), b.to_numpy()
    nulls = np.fromiter(
        (x is None or y is None for x, y in zip(va, vb)), dtype=bool, count=len(va)
    )
    out = np.full(len(va), np.nan, dtype=np.float64)
    live = ~nulls
    if live.any():
        A = np.stack(va[live]).astype(np.float64)
        B = np.stack(vb[live]).astype(np.float64)
        P = A * B
        acc = np.zeros(P.shape[0], dtype=np.float64)
        for j in range(P.shape[1]):
            acc += P[:, j]
        out[live] = acc
    s = pd.Series(out)
    return s.mask(nulls, None) if nulls.any() else s


_DOT_ARROW = None


def dot_arrow(a: Column, b: Column) -> Column:
    """Vectorized twin of :func:`dot` for HOT per-pair verify paths.

    Catalyst interprets lambda higher-order functions (no codegen), so the
    ``F.aggregate(F.zip_with(...))`` fold costs an interpreted 64-element
    loop per pair — the dominant cost when candidates ≈ all-pairs. This
    pandas_udf moves the same computation to Arrow batches + numpy while
    preserving bit-identical results (see ``_dot_seq_batch``). Fixed-length
    vectors only (embeddings); ragged inputs raise in ``np.stack``."""
    global _DOT_ARROW
    if _DOT_ARROW is None:
        from pyspark.sql.functions import pandas_udf

        _DOT_ARROW = pandas_udf(_dot_seq_batch, "double")
    return _DOT_ARROW(a, b)


def dot_int(a: Column, b: Column) -> Column:
    """EXACT dot product of two integer-code arrays (int8-quantized
    embeddings): BIGINT multiply-accumulate, no floating point at all, so
    the result is order-independent and bit-identical on every engine —
    no sequential-fold contortions needed."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("bigint") * y.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _dot_int_batch(a, b):
    """Arrow-batch exact int64 dot. Integer arithmetic is associative, so
    plain vectorized ``(A*B).sum(axis=1)`` is safe here (unlike the float
    path, which must preserve fold order). int8 codes × 64 dims cannot
    overflow int64 (|x|≤127 ⇒ |dot| ≤ 64·127² ≈ 1.03e6)."""
    import numpy as np
    import pandas as pd

    va, vb = a.to_numpy(), b.to_numpy()
    nulls = np.fromiter(
        (x is None or y is None for x, y in zip(va, vb)), dtype=bool, count=len(va)
    )
    out = np.zeros(len(va), dtype=np.int64)
    live = ~nulls
    if live.any():
        A = np.stack(va[live]).astype(np.int64)
        B = np.stack(vb[live]).astype(np.int64)
        out[live] = (A * B).sum(axis=1)
    s = pd.Series(out)
    return s.mask(nulls, None) if nulls.any() else s


_DOT_INT_ARROW = None


def dot_int_arrow(a: Column, b: Column) -> Column:
    """Vectorized twin of :func:`dot_int` for the all-pairs prefilter hot
    path — the integer-SIMD scoring pass of the quantize-then-rerank ANN."""
    global _DOT_INT_ARROW
    if _DOT_INT_ARROW is None:
        from pyspark.sql.functions import pandas_udf

        _DOT_INT_ARROW = pandas_udf(_dot_int_batch, "long")
    return _DOT_INT_ARROW(a, b)


def norm_int(a: Column) -> Column:
    """L2 norm of an integer-code array: sqrt of the EXACT BIGINT sum of
    squares (one correctly-rounded IEEE sqrt — cross-engine stable)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("bigint") * x.cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
    )


def dot_int_sql(a: str, b: str, dim: int) -> str:
    """DuckDB twin of :func:`dot_int` (exact integer MAC; ``::BIGINT``
    collapses DuckDB's HUGEINT list_sum back to int64)."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> {a}[i]::BIGINT * {b}[i]::BIGINT))::BIGINT"
    )


def norm_int_sql(a: str, dim: int) -> str:
    return (
        f"sqrt((list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> {a}[i]::BIGINT * {a}[i]::BIGINT))::BIGINT)::DOUBLE)"
    )


def dot_sql(a: str, b: str, dim: int) -> str:
    """DuckDB twin of :func:`dot` (same fold order → bit-identical)."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def norm_sql(a: str, dim: int) -> str:
    return (
        f"sqrt(list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))"
    )


def cosine_sql(a: str, b: str, dim: int) -> str:
    return f"({dot_sql(a, b, dim)} / ({norm_sql(a, dim)} * {norm_sql(b, dim)}))"


def l2sq_slice(a: Column, b: Column, start: int, length: int) -> Column:
    """Squared L2 distance over a 1-based subvector window — the
    product-quantization subspace metric. Sequential double fold, same
    order as :func:`l2sq_slice_sql`, so results are bit-identical."""
    return F.aggregate(
        F.zip_with(
            F.slice(a, start, length),
            F.slice(b, start, length),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2sq_slice_sql(a: str, b: str, start: int, length: int) -> str:
    """DuckDB twin of :func:`l2sq_slice` (1-based, same fold order)."""
    return (
        f"list_sum(list_transform(generate_series({start}, {start + length - 1}),"
        f" i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE)"
        f" * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)))"
    )
