"""Vector math over ``array<float>`` columns as pure Catalyst expressions.

Dot products / norms / cosine are built from ``zip_with`` +
``aggregate`` higher-order functions — they run inside whole-stage
codegen on the JVM, no Python boundary, no UDF serde. Accumulation is
in DOUBLE, sequentially over the array, which makes results
deterministic (same order every run) and comparable with a DuckDB
oracle computing the same left-to-right sum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

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


def cosine_pandas_udf():
    """Arrow-batched Pandas-UDF cosine — the documented slow path.

    Everything in this engine's hot paths uses the JVM expressions
    above; this exists for ops that genuinely need numpy (e.g. a real
    model's normalized embeddings with fused ops). Vectorized over the
    whole Arrow batch (one np.stack per column, no per-row Python), it
    is ~10-100x faster than a row-at-a-time UDF but still pays
    JVM<->Arrow transfer: prefer the expression form when both work.
    Parity with `cosine()` is pinned by tests (same float64 math).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.to_numpy()).astype(np.float64)
        bv = np.stack(b.to_numpy()).astype(np.float64)
        dots = (av * bv).sum(axis=1)
        denom = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom == 0, np.nan, dots / denom)
        return pd.Series(out)

    return _cos
