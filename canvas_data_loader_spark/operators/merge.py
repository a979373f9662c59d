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


# --- schema evolution (round 8) --------------------------------------------
#
# The reference's answer to ANY schema change is a full table reload
# (main.rs:188-193). At 100 TB that turns a one-column widening into a
# complete rewrite. Three change classes are data-preserving and need
# no rewrite at all:
#   ADD    — old rows read NULL for the new column (backfill semantics);
#   WIDEN  — byte<short<int<long and float<double: every old value is
#            exactly representable in the wider type, so casting on
#            read/merge is lossless;
#   RENAME — same data, new name; declared via an explicit rename map
#            (a rename is indistinguishable from drop+add without one).
# Everything else (narrowing, cross-family changes, true drops where
# the new name must win) still routes to full reload — those change
# the MEANING of stored data, not just its extent.

_INT_LADDER = ("byte", "short", "integer", "long")
_FLOAT_LADDER = ("float", "double")


class SchemaEvolutionError(ValueError):
    """The schema change is NOT one of the data-preserving classes
    (add / widen / declared rename) — the caller must fall back to the
    reference's full-reload behavior (main.rs:188-193)."""


def widened_type(a, b):
    """The lossless common supertype of two Spark DataTypes, or None if
    the pair is not widenable (int family: byte<short<int<long; float
    family: float<double; no cross-family widening — long->double loses
    integer precision past 2^53)."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    for ladder in (_INT_LADDER, _FLOAT_LADDER):
        if an in ladder and bn in ladder:
            return a if ladder.index(an) >= ladder.index(bn) else b
    return None


def evolved_schema(old_schema, new_schema, renames: dict[str, str] | None = None):
    """The merge target schema for an evolving upsert: NEW's columns in
    new order (types widened against old where both sides have the
    column), then OLD-only columns appended null-padded (symmetric
    additive — a column the new feed stopped sending keeps its history;
    dropping it for real is a deliberate volatile reload).

    ``renames`` maps OLD column name -> NEW name (applied to the old
    side first). Raises ValueError on a non-widenable type change —
    the caller's signal to fall back to the reference's full reload.
    """
    from pyspark.sql import types as T

    renames = renames or {}
    old_by_name = {renames.get(f.name, f.name): f for f in old_schema.fields}
    out = []
    for f in new_schema.fields:
        prev = old_by_name.get(f.name)
        if prev is None:
            out.append(T.StructField(f.name, f.dataType, True))
            continue
        w = widened_type(prev.dataType, f.dataType)
        if w is None:
            raise SchemaEvolutionError(
                f"column {f.name!r}: {prev.dataType.simpleString()} -> "
                f"{f.dataType.simpleString()} is not a lossless widening — "
                "schema change requires a full reload"
            )
        out.append(T.StructField(f.name, w, True))
    new_names = {f.name for f in new_schema.fields}
    for name, f in old_by_name.items():
        if name not in new_names:
            out.append(T.StructField(name, f.dataType, True))
    return T.StructType(out)


def _chain_renames(
    prev: dict[str, list[str]], renames: dict[str, str]
) -> dict[str, list[str]]:
    """Fold a new rename map (old -> new) into the recorded rename
    history (current name -> historical names, newest first). Chains
    collapse: with history {b: [a]} and rename {b: c}, the result is
    {c: [b, a]} — files on disk may carry ANY historical name and a
    read must resolve all of them to the current one."""
    out = {k: list(v) for k, v in prev.items()}
    for old, new in renames.items():
        out[new] = [old] + out.pop(old, [])
    return out


def rename_simultaneous(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    """Rename columns in ONE projection. ``withColumnsRenamed`` applies
    its map name-by-name, so a chain-shaped map ({a -> b, c -> a}: a
    renamed-away name re-used by another column) transiently duplicates
    a name and the second rename hits BOTH columns; a single select
    with per-position aliases is simultaneous and collision-free."""
    if not renames or all(renames.get(c, c) == c for c in df.columns):
        return df
    return df.select(*[df[c].alias(renames.get(c, c)) for c in df.columns])


def guard_reused_names(
    renamed_from: dict[str, list[str]], target, table: str
) -> None:
    """Refuse a manifest-lane evolve whose target re-uses a column
    name that some OTHER column's rename history consumed: the
    manifest protocol stores files by LOGICAL name, so old files
    physically carry the consumed name with the renamed column's
    values and no read could tell the two columns apart (the delta
    protocol disambiguates via columnMapping physical names; the
    manifest protocol has no such indirection). Rename-back of the
    SAME column (a -> b -> a) stays legal — its own chain is not a
    conflict."""
    for f in target.fields:
        hits = sorted(
            n
            for n, hist in (renamed_from or {}).items()
            if n != f.name and f.name in hist
        )
        if hits:
            raise ValueError(
                f"{table}: cannot add column {f.name!r} — the name was "
                f"consumed by the rename history of {hits} and files on "
                "disk still carry it with that column's values; pick a "
                "different name (the delta protocol supports re-use via "
                "column mapping)"
            )


def conform_to(
    df: DataFrame,
    target,
    renamed_from: dict[str, list[str]] | None = None,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Project ``df`` onto ``target`` (a StructType): cast columns the
    frame has, resolve renamed columns via ``renamed_from`` (target
    name -> historical names, newest first), null-pad columns it lacks.
    Pure column expressions — at scale this is a zero-shuffle map over
    whatever files carry an older schema (the Delta/Iceberg read-time
    schema-resolution shape; files are never rewritten).

    ``keep``: extra column names carried through unchanged when the
    frame has them (the deletion-vector read path threads its file/
    row-position columns past the conforming projection this way)."""
    renamed_from = renamed_from or {}
    have = set(df.columns)
    # a name in ANOTHER field's chain is that field's historical
    # on-disk spelling: exact-name matching it would alias the
    # renamed-away column's values into a same-named new column
    # (mirrors _conform_arrow; the manifest lane additionally REJECTS
    # creating this shape — guard_reused_names — but reads stay
    # defensive for delta-lane tables where it is legal)
    consumed = {
        h for n, hist in renamed_from.items() for h in hist if h != n
    }
    cols = []
    for f in target.fields:
        src = f.name if (f.name in have and f.name not in consumed) else next(
            (h for h in renamed_from.get(f.name, []) if h in have), None
        )
        if src is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(src).cast(f.dataType).alias(f.name))
    cols += [F.col(k) for k in keep if k in have and k not in target.names]
    return df.select(*cols)


def merge_upsert_evolve(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    order_col: str | None = None,
    renames: dict[str, str] | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Keyed upsert with schema evolution: ADD (columns present in only
    one side survive, null-padded on the other), WIDEN (int-family /
    float-family lossless type widening on either side), and RENAME
    (``renames``: old name -> new name, applied to the old side). The
    reference full-reloads on any schema change (main.rs:188-193);
    none of these three classes needs one. Non-widenable type changes
    raise ValueError — the caller's cue to fall back to full reload.

    ``broadcast=False`` for batches too large to broadcast their key
    set (same cutover contract as merge_upsert_large_batch)."""
    keys = [key] if isinstance(key, str) else list(key)
    if order_col is not None:
        new = dedup_latest(new, keys, order_col)
    if renames:
        old = old.withColumnsRenamed(renames)
    target = evolved_schema(old.schema, new.schema)
    old_c = conform_to(old, target)
    new_c = conform_to(new, target)
    batch_keys = new_c.select(*keys).distinct()
    if broadcast:
        batch_keys = F.broadcast(batch_keys)
    survivors = old_c.join(batch_keys, on=keys, how="left_anti")
    return survivors.unionByName(new_c)
