"""Vector math over ``array<float>`` columns as pure Catalyst expressions.

Dot products / norms / cosine are built from ``zip_with`` +
``aggregate`` higher-order functions — they run inside whole-stage
codegen on the JVM, no Python boundary, no UDF serde. Accumulation is
in DOUBLE, sequentially over the array, which makes results
deterministic (same order every run) and comparable with a DuckDB
oracle computing the same left-to-right sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order double-precision dot product of two arrays."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(None)).otherwise(dot(a, b) / denom)
