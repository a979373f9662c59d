"""Multi-dimensional (Z-order) clustering for compaction rewrites.

``compact(order_by=[a, b])`` range-clusters LEXICOGRAPHICALLY: files
get disjoint ranges of ``a``, so per-file min/max skipping is perfect
on ``a`` but near-useless on ``b`` alone (every file spans most of
``b``'s range). Z-ordering interleaves the bits of per-column ranks so
each file covers a small RECTANGLE in (a, b, ...) space — both columns
skip well, the OPTIMIZE ... ZORDER BY trade (slightly worse on ``a``
than pure range-clustering, far better on everything else).

Spark-first shape, no UDFs anywhere:

1. per column, ~64 rank boundaries from one distributed
   ``approxQuantile`` pass (driver holds 63 scalars, never rows);
2. rank = sum of 63 JVM comparisons (whole-stage codegen);
3. z-value = bit-interleave of the ranks, again pure integer
   expressions;
4. ``repartitionByRange`` + ``sortWithinPartitions`` on the z-value.

The z-value is a TRANSIENT sort key: it is dropped before the write,
and its effect lives entirely in the per-file stats (tight min/max
rectangles) that ``files_for_range``/``read_where`` and the add-action
stats skipping consume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 64 rank buckets per column = 6 bits; up to 4 columns keeps the
# z-value within 24 bits — far more resolution than file-level
# clustering can use (files per table << 2^24)
RANK_BITS = 6
MAX_COLS = 4

_NUMERIC_EXACT = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "date",
}
# parameterized numeric types match by prefix — but NEVER bare "int",
# which would startswith-match "interval day to second" and defeat
# this guard's whole purpose (a clear error instead of a cryptic
# approxQuantile failure)
_NUMERIC_PREFIXES = ("decimal", "timestamp")


def _rankable(df: DataFrame, col: str) -> Column:
    """The column as a quantile-rankable double (dates/timestamps via
    their numeric representation). Raises for types approxQuantile
    cannot rank (strings, binaries, intervals, nested)."""
    dt = dict(df.dtypes).get(col)
    if dt is None:
        raise ValueError(f"zorder column {col!r} not in the table")
    if dt not in _NUMERIC_EXACT and not dt.startswith(_NUMERIC_PREFIXES):
        raise ValueError(
            f"zorder column {col!r} has type {dt}: rank boundaries come "
            "from approxQuantile, which needs an orderable numeric "
            "representation — cast or hash the column first, or "
            "range-cluster on it lexicographically via order_by"
        )
    c = F.col(col)
    if dt == "date":
        c = c.cast("timestamp")
        dt = "timestamp"
    if dt.startswith("timestamp"):
        c = c.cast("long")
    return c.cast("double")


def zorder_value(df: DataFrame, cols: list[str]) -> Column:
    """A 6-bit-per-column bit-interleaved Z-value Column for ``df``.

    One ``approxQuantile`` job per call computes every column's rank
    boundaries together (distributed sketch, driver receives 63
    numbers per column). NULLs rank lowest (rank 0) — they cluster
    into the first files, matching NULLS FIRST stats behavior."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if len(cols) > MAX_COLS:
        raise ValueError(
            f"zorder on {len(cols)} columns: beyond {MAX_COLS} the "
            "per-column resolution no longer separates files"
        )
    n_buckets = 1 << RANK_BITS
    probs = [i / n_buckets for i in range(1, n_buckets)]
    ranked = df.select(
        *[_rankable(df, c).alias(f"__zq_{i}") for i, c in enumerate(cols)]
    )
    all_bounds = ranked.approxQuantile(
        [f"__zq_{i}" for i in range(len(cols))], probs, 0.001
    )
    z = F.lit(0).cast("long")
    k = len(cols)
    for ci, (col, bounds) in enumerate(zip(cols, all_bounds)):
        v = _rankable(df, col)
        rank = F.lit(0)
        # strictly-increasing boundary subset: approxQuantile repeats
        # boundaries on skewed data, and a repeated boundary must not
        # double-count a rank step
        prev = None
        for b in bounds:
            if prev is not None and not (b > prev):
                continue
            prev = b
            rank = rank + F.when(v > F.lit(b), 1).otherwise(0)
        rank = rank.cast("long")
        for bit in range(RANK_BITS):
            z = z + F.shiftleft(
                F.shiftright(rank, bit).bitwiseAND(F.lit(1)),
                bit * k + ci,
            )
    return z


def cluster_for_write(
    df: DataFrame, cols: list[str], n_files: int, zorder: bool
) -> DataFrame:
    """Repartition+sort ``df`` for a clustered compaction rewrite:
    lexicographic range-clustering (``zorder=False``) or Z-order. The
    transient sort key never reaches the files."""
    if not zorder:
        return df.repartitionByRange(n_files, *cols).sortWithinPartitions(
            *cols
        )
    z = zorder_value(df, cols)
    return (
        df.withColumn("__cdl_z", z)
        .repartitionByRange(n_files, "__cdl_z")
        .sortWithinPartitions("__cdl_z")
        .drop("__cdl_z")
    )
