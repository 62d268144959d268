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
    """Cosine similarity; NULL if either norm is zero."""
    return dot(a, b) / (norm(a) * norm(b))


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
