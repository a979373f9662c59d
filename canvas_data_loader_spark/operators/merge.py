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
  incoming keys — implemented in ``plans/pipeline.py`` via dynamic
  partition overwrite.
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
