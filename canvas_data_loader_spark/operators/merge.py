"""Keyed merge (upsert) — the heart of the reference, done set-oriented.

The reference upserts row-at-a-time: for every incoming row, infer the
key column, DELETE the old row by key, INSERT the new one
(src/importer.rs:345-390 — two SQL statements per row). The
set-oriented equivalent with identical end-state:

    merged = new ∪ (old ⟕anti new on key)

i.e. every key present in the incoming batch is last-writer-wins
replaced; keys absent from the batch survive unchanged.

Scale notes (100 TB design point):
- The incoming batch is usually small vs the table -> broadcast the
  *keys* of the batch for the anti-join (Catalyst/AQE does this when
  the new side is under the broadcast threshold; we hint explicitly).
- An anti-join merge rewrites the whole table per batch. At scale,
  partition the warehouse table by a stable bucket of the key
  (``pmod(hash(key), N)``) and rewrite only partitions containing
  incoming keys — implemented here: ``write_bucketed`` +
  ``merge_upsert_bucketed`` (partition pruning on read, dynamic
  partition overwrite on write).
- Duplicate keys *within* a batch resolve deterministically to the
  last row by ingest order (window dedup), matching the reference's
  sequential overwrite outcome within a file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    key: str | list[str],
    order_col: str | list[str],
    ascending: bool = False,
) -> DataFrame:
    """Keep one row per key: the latest by ``order_col``.

    This is the reference's sequential-overwrite semantics (last writer
    wins, src/importer.rs:345-390) expressed as a window. One shuffle
    on the key; AQE handles skew. Pass several order columns (e.g. a
    timestamp plus a unique tiebreaker) to make ties deterministic.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    ordering = [
        F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Last-writer-wins keyed upsert: new rows replace old rows by key.

    Equivalent to the reference's per-row DELETE+INSERT loop
    (src/importer.rs:363-389) but as two relational ops:
    anti-join keeps old rows whose key is NOT incoming, then union.

    If ``order_col`` is given, duplicate keys inside ``new`` are first
    collapsed to the latest (matching within-file sequential overwrite).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if order_col is not None:
        new = dedup_latest(new, keys, order_col)
    survivors = old.join(F.broadcast(new.select(*keys).distinct()), on=keys, how="left_anti")
    return survivors.unionByName(new.select(old.columns))


def merge_upsert_large_batch(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
) -> DataFrame:
    """Upsert variant for batches too large to broadcast: plain shuffled
    anti-join (sort-merge); Catalyst picks the strategy, AQE re-plans if
    the new side turns out small at runtime."""
    keys = [key] if isinstance(key, str) else list(key)
    survivors = old.join(new.select(*keys).distinct(), on=keys, how="left_anti")
    return survivors.unionByName(new.select(old.columns))


BUCKET_COL = "__kb"


def bucket_of(key_col, n_buckets: int):
    """Stable key bucket: pmod(xxhash64(key), n). Deterministic across
    runs/sessions, so a table written partitioned by it is mergeable
    forever after."""
    return F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")


def write_bucketed(df: DataFrame, path: str, key: str, n_buckets: int) -> None:
    """Write a warehouse table Hive-partitioned by the key's bucket —
    the layout that makes `merge_upsert_bucketed` rewrite only
    affected partitions instead of the whole table."""
    df.withColumn(BUCKET_COL, bucket_of(F.col(key), n_buckets)).write.mode(
        "overwrite"
    ).partitionBy(BUCKET_COL).parquet(path)


def merge_upsert_bucketed(
    spark,
    path: str,
    new: DataFrame,
    key: str,
    n_buckets: int,
    order_col: str | None = None,
) -> list[int]:
    """Partition-pruned keyed upsert into a bucket-partitioned table.

    At 100 TB a whole-table anti-join merge rewrites everything per
    batch; this rewrites only the buckets the incoming keys hash to:

      1. buckets = distinct pmod(xxhash64(key), N) of the batch
         (driver-side list, at most N integers);
      2. read ONLY those partitions (partition pruning on the filter —
         a batch touching b of N buckets scans b/N of the table);
      3. anti-join merge within them;
      4. dynamic partition overwrite replaces just those directories.

    Equivalent to Delta/Iceberg MERGE with bucket clustering, built
    from plain parquet + a deterministic layout. Returns the affected
    bucket ids (for observability/testing).
    """
    new_b = new.withColumn(BUCKET_COL, bucket_of(F.col(key), n_buckets))
    if order_col is not None:
        new_b = dedup_latest(new_b, key, order_col)
    affected = sorted(
        r[BUCKET_COL] for r in new_b.select(BUCKET_COL).distinct().collect()
    )
    old = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(affected))
    merged = old.join(
        F.broadcast(new_b.select(key).distinct()), on=key, how="left_anti"
    ).unionByName(new_b.select(old.columns))
    # Per-write option, NOT spark.conf.set: mutating the shared session
    # conf would silently change the semantics of any later static
    # partitioned overwrite in the same session.
    merged.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(BUCKET_COL).parquet(path)
    return affected


def merge_upsert_evolve(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Keyed upsert with additive schema evolution: columns present in
    only one side survive the merge, null-padded on the other (the
    mergeSchema analog of merge_upsert). The reference's answer to any
    schema change is a full reload (main.rs:188-193); an additive
    column does not need one — old rows simply read NULL for the new
    column, exactly what a warehouse backfill would produce. Column
    REMOVALS and type changes still route to full reload (they change
    the meaning of existing data, not just its extent).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if order_col is not None:
        new = dedup_latest(new, keys, order_col)
    survivors = old.join(
        F.broadcast(new.select(*keys).distinct()), on=keys, how="left_anti"
    )
    return survivors.unionByName(new, allowMissingColumns=True)
