"""Incremental view maintenance: keep a grouped rollup current under
row changes WITHOUT rescanning the fact table.

The warehouse's keyed merges (operators/merge.py) replace whole rows
by key; a downstream rollup (counts/sums per group) can be maintained
from just the CHANGED rows — the classic delta-propagation rule for
distributive aggregates:

    rollup' = rollup  ⊎  agg(inserted_or_new_rows)  ⊖  agg(replaced_old_rows)

where ⊎/⊖ combine per group key (counts add, sums add/subtract) and
groups whose maintained count reaches zero are dropped. At 100 TB the
difference is a scan of the daily delta (GBs) versus the full fact
table (TBs) per refresh — the same reason Materialize/Delta Live
Tables exist; this is the minimal relational core of that idea.

Exactness: sums MUST be maintained in DECIMAL. A double sum is
order-dependent, so the incrementally-maintained value would drift
from a full recompute by ulps even with identical inputs; decimal
addition is associative, making `maintained == recomputed` an exact
equality (pinned in tests and by the q128 oracle).

Only distributive/algebraic aggregates maintain this way (COUNT, SUM,
and AVG = SUM/COUNT at read time). MIN/MAX are NOT retractable — a
deleted minimum needs a rescan of its group. The production answer is
to keep partial aggregates at a granularity you can cheaply rescan;
here that granularity already exists: the warehouse's hash buckets.
``build_minmax_partials`` keeps per-(bucket, group) partials; a
refresh rescans ONLY the buckets the change feed says moved (b/N of
the fact table), swaps those buckets' partial rows, and re-finalizes
from the partials (|partials| <= n_buckets x |groups| — combine-sized,
never fact-sized). Deleting a group's minimum is exact: the deleted
row's bucket is by definition a changed bucket, so its partial is
recomputed from surviving rows, and the finalize takes the min/max
across buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COUNT_COL = "n_rows"


def build_rollup(
    facts: DataFrame, keys: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Full (re)build: count + decimal sums per group.

    ``sum_cols`` maps output column -> source column; sources are cast
    to DECIMAL(28,6) BEFORE summing (exact, associative — see module
    docstring)."""
    aggs = [F.count(F.lit(1)).alias(COUNT_COL)] + [
        # COALESCE pins the all-NULL-group case to 0 on BOTH paths:
        # the incremental combine necessarily coalesces (a group with
        # no delta must keep its value), so the full build must too or
        # maintained == recomputed breaks exactly when every value in
        # a group is NULL (SUM would give NULL here but 0 there)
        F.coalesce(
            F.sum(F.col(src).cast("decimal(28,6)")),
            F.lit(0).cast("decimal(38,6)"),
        ).alias(out)
        for out, src in sum_cols.items()
    ]
    return facts.groupBy(*keys).agg(*aggs)


def apply_rollup_delta(
    rollup: DataFrame,
    applied: DataFrame,
    retracted: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
) -> DataFrame:
    """Maintain ``rollup`` under a keyed replace: ``retracted`` holds
    the OLD versions of changed rows (empty for pure inserts),
    ``applied`` the new/inserted versions.

    One aggregation over |delta| rows and one outer combine with the
    rollup — the fact table is never touched. Groups whose count
    reaches zero disappear (all their rows were retracted)."""
    def signed(df: DataFrame, sign: int) -> DataFrame:
        aggs = [F.sum(F.lit(sign)).cast("long").alias(COUNT_COL)] + [
            F.sum(F.col(src).cast("decimal(28,6)") * sign).alias(out)
            for out, src in sum_cols.items()
        ]
        return df.groupBy(*keys).agg(*aggs)

    delta = signed(applied, 1).unionByName(signed(retracted, -1))
    delta = delta.groupBy(*keys).agg(
        F.sum(COUNT_COL).cast("long").alias(COUNT_COL),
        *[F.sum(out).alias(out) for out in sum_cols],
    )
    out_cols = [COUNT_COL, *sum_cols.keys()]
    merged = rollup.alias("r").join(delta.alias("d"), on=keys, how="full")
    exprs = [F.col(k) for k in keys] + [
        (
            F.coalesce(F.col(f"r.{c}"), F.lit(0))
            + F.coalesce(F.col(f"d.{c}"), F.lit(0))
        ).alias(c)
        for c in out_cols
    ]
    return merged.select(*exprs).filter(F.col(COUNT_COL) > 0)


# -- MIN/MAX via per-bucket partials -----------------------------------------

BUCKET_ID_COL = "__mvb"


def build_minmax_partials(
    facts: DataFrame,
    bucket_key: str,
    n_buckets: int,
    keys: list[str],
    agg_cols: dict[str, tuple[str, str]],
) -> DataFrame:
    """Per-(bucket, group) partial aggregates: COUNT plus one MIN or
    MAX per output column. ``agg_cols`` maps output column ->
    (source column, "min"|"max"). The bucket id is COMPUTED from the
    bucket key (pmod(xxhash64(key), n) — operators/merge.py
    bucket_of), not read from storage, so partials can be rebuilt for
    any subset of rows and always agree with the warehouse's routing."""
    from .merge import bucket_of

    aggs = [F.count(F.lit(1)).alias(COUNT_COL)]
    for out, (src, fn) in agg_cols.items():
        if fn not in ("min", "max"):
            raise ValueError(f"{out}: unsupported aggregate {fn!r}")
        aggs.append((F.min if fn == "min" else F.max)(F.col(src)).alias(out))
    return (
        facts.withColumn(BUCKET_ID_COL, bucket_of(F.col(bucket_key), n_buckets))
        .groupBy(BUCKET_ID_COL, *keys)
        .agg(*aggs)
    )


def finalize_minmax(
    partials: DataFrame,
    keys: list[str],
    agg_cols: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold per-bucket partials into the user-facing view: min of
    mins / max of maxes, counts add (MIN/MAX are distributive, so the
    two-level aggregation is exact). One combine-sized job."""
    aggs = [F.sum(COUNT_COL).cast("long").alias(COUNT_COL)]
    for out, (_src, fn) in agg_cols.items():
        aggs.append((F.min if fn == "min" else F.max)(F.col(out)).alias(out))
    return partials.groupBy(*keys).agg(*aggs)
