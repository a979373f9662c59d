"""Skew mitigation: salted joins and salted (two-phase) aggregation.

At 100 TB a handful of hot keys (a viral document, a default account
id, an empty-string token) can put one shuffle partition hours behind
the rest. AQE's skew-join splitting handles sort-merge joins when it
can observe the skew at runtime; salting is the explicit, always-works
form, and the only option when the skewed side feeds a window or the
build side of a broadcast is too big.

- ``salted_join``: replicate the right side ``salt`` times, scatter
  the left side across salts with a deterministic hash of its row key,
  join on (key, salt). Result is row-identical to the plain inner
  join (oracle-checkable); the shuffle for any single key is spread
  over ``salt`` partitions.

- ``salted_agg_sum``: two-phase aggregation — partial aggregate on
  (key, salt), then final aggregate on key. Spark's hash aggregate
  already does map-side partial combine, so this matters only for
  aggregations that defeat partial combine (e.g. exact distinct on a
  hot key); kept for completeness of the skew toolkit.

Salt derivation uses ``pmod(xxhash64(scatter_col), salt)`` — a
deterministic function of a high-cardinality column, NOT rand():
deterministic tasks can be retried/speculated safely, rand() cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    scatter_col: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join, row-identical to ``left.join(right, key, how)``.

    ``scatter_col`` is a high-cardinality column of ``left`` (ideally a
    row id) whose hash spreads the hot key's rows across ``salt``
    shuffle partitions. ``right`` is exploded ``salt``-fold, so keep it
    the smaller side. Supports inner/left joins (the replicated side
    must be the non-preserved one for outer correctness).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [key] if isinstance(key, str) else list(key)
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(scatter_col)), F.lit(salt)).cast("int")
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, on=keys + ["__salt"], how=how).drop("__salt")


def salted_agg_sum(
    df: DataFrame,
    key: str | list[str],
    value_col: str,
    scatter_col: str,
    salt: int = 16,
    out: str = "sum_value",
) -> DataFrame:
    """Two-phase (salted) sum: partial on (key, salt), final on key.

    Accumulates in decimal so the two-step regrouping cannot change the
    double result vs a direct groupBy (order-independent)."""
    keys = [key] if isinstance(key, str) else list(key)
    partial = (
        df.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(scatter_col)), F.lit(salt)).cast("int")
        )
        .groupBy(*keys, "__salt")
        .agg(F.sum(F.col(value_col).cast("decimal(27,4)")).alias("__p"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("__p").cast("double").alias(out))
    )


def ensure_scan_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the upstream scan cannot
    parallelize — the guide §2.5 "unsplittable input" remedy, made
    scale-adaptive instead of a local-mode constant.

    The test parquet ships ONE row group per table, so a scan is a
    single task regardless of split size, and every expensive map
    that follows (tokenize + shingle explode, the BPE REPLACE chain,
    minhash aggregation's map side) runs on one core of the box. At
    production scale inputs arrive as many files / row groups, the
    file count exceeds the threshold, and this returns the input
    UNCHANGED — no exchange is added to the plan. Round-robin keeps
    Spark's sort-before-repartition determinism (safe under task
    retry); callers must be row-order-insensitive, which every
    aggregate/join/window consumer here is.

    Splittability is decided from ``df.inputFiles()`` — one py4j call
    that walks the ALREADY-ANALYZED plan. The previous
    ``df.rdd.getNumPartitions()`` probe ran full physical planning +
    plan→RDD conversion on the driver per operator invocation — the
    exact py4j/analyzer chatter tax the checkpoint-heavy queries
    already pay (~3 s of q167's sf0.1 time was driver analysis).
    A file under one effective scan task is the only case local
    parallelism collapses here; a frame with NO input files (its
    lineage was cut by localCheckpoint) inherited its materialized
    partitioning from the producer — which already ran through this
    helper — so it is returned unchanged, never probed.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < max(2, target // 2):
        return df.repartition(target)
    return df
