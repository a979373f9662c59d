"""Warehouse maintenance operations written AGAINST THE SHARED
CONTRACT (read_versioned / routing_info / write / GENESIS_VERSION),
so one implementation serves both commit-log impls (numbered-manifest
Warehouse and the Delta-protocol DeltaWarehouse) — the point of having
a contract is that operations like these need writing once.

``rebucket`` — change a table's bucket count (or bucket a plain
table): the operation a 100 TB deployment needs when a table outgrows
its layout — too few buckets make every merge rewrite huge slices,
too many fragment the scan. One full rewrite, published via CAS so a
concurrent merge always wins and the rebucket re-derives; after it,
every future merge prunes on the NEW layout. The reference has no
analog (its tables are unpartitioned SQL tables); this is the
operational complement to merge_bucketed's b/N contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.merge import bucket_of, conform_to
from .pipeline import CommitConflict


def rebucket(
    warehouse,
    table: str,
    n_buckets: int,
    key: str | None = None,
    max_retries: int = 5,
) -> str:
    """Rewrite ``table`` bucketed on ``key`` into ``n_buckets`` buckets.

    ``key`` defaults to the table's current bucket key (required for a
    currently-unbucketed table). The rewrite is repartitioned ON the
    bucket expression so each bucket lands wholly in one task — one
    output file per non-empty bucket, the compacted layout. Publish is
    a CAS against the commit the rows were read from: a merge landing
    mid-rebucket wins and the rebucket re-derives (it is maintenance;
    the merge is data). Returns the written snapshot name/batch dir.
    """
    for _ in range(1 + max_retries):
        info = warehouse.routing_info(table)
        if info is None:
            raise FileNotFoundError(f"table not in warehouse: {table}")
        use_key = key or info["bucket_key"]
        if use_key is None:
            raise ValueError(
                f"table {table!r} is not bucketed — pass key= to choose "
                "the bucket column"
            )
        base, df = warehouse.read_versioned(table)
        if use_key not in df.columns:
            raise ValueError(
                f"bucket key {use_key!r} not a column of {table!r} "
                f"(have {df.columns})"
            )
        try:
            return warehouse.write(
                table,
                df.repartition(n_buckets, bucket_of(F.col(use_key), n_buckets)),
                snapshot=f"rebucket-{n_buckets}",
                bucket=(use_key, n_buckets),
                expected_version=base,
            )
        except CommitConflict:
            continue
    raise CommitConflict(
        f"{table}: rebucket lost the commit race {1 + max_retries} times — "
        "run it in a quieter window"
    )


def keyed_changes(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Delta-CDF-shaped change rows between two keyed snapshots:
    every output row is a table row plus ``_change_type`` in
    {insert, delete, update_preimage, update_postimage}. Updates are
    detected by whole-row null-safe struct comparison — one full-outer
    join on the key, no per-column expression fan-out."""
    cols = new.columns
    if old.columns != cols:
        # additive evolution between the versions: null-pad/cast the
        # old side onto the new schema (declared renames would need
        # the caller to conform first)
        old = conform_to(old, new.schema)
    o = old.select(key, F.struct(*[F.col(c) for c in cols]).alias("__o"))
    n = new.select(key, F.struct(*[F.col(c) for c in cols]).alias("__n"))
    j = o.join(n, on=key, how="full_outer")
    ins = j.filter(F.col("__o").isNull()).select(
        F.col("__n.*"), F.lit("insert").alias("_change_type")
    )
    dels = j.filter(F.col("__n").isNull()).select(
        F.col("__o.*"), F.lit("delete").alias("_change_type")
    )
    diff = j.filter(
        F.col("__o").isNotNull()
        & F.col("__n").isNotNull()
        & ~F.col("__o").eqNullSafe(F.col("__n"))
    )
    pre = diff.select(
        F.col("__o.*"), F.lit("update_preimage").alias("_change_type")
    )
    post = diff.select(
        F.col("__n.*"), F.lit("update_postimage").alias("_change_type")
    )
    return ins.unionByName(dels).unionByName(pre).unionByName(post)


def table_changes(
    warehouse, table: str, v_from: int, v_to: int, key: str | None = None
) -> DataFrame:
    """Change feed between two retained commits — the Delta CHANGE DATA
    FEED shape, computed on O(changed buckets), not O(table), for
    bucketed tables on either warehouse impl: untouched buckets back
    onto identical immutable files/directories, which PROVES their
    rows identical, so only buckets whose backing differs are read at
    either version. Falls back to a full two-version diff when
    pruning is unavailable (unbucketed, or the layout changed between
    the versions). ``key`` defaults to the table's bucket key.

    This is what downstream incremental consumers poll instead of
    re-reading the table: at 100 TB a daily merge's change feed costs
    b/N of a scan, and a no-op interval costs nothing but metadata.
    """
    changed = warehouse.changed_buckets(table, v_from, v_to)
    if key is None:
        info = warehouse.routing_info(table)
        key = info["bucket_key"] if info else None
        if key is None:
            raise ValueError(
                f"table {table!r} has no bucket key — pass key= explicitly"
            )
    if changed is None:
        old = warehouse.read_at_version(table, v_from)
        new = warehouse.read_at_version(table, v_to)
    elif not changed:
        # nothing changed: empty feed with the table's schema — pure
        # metadata, no file is opened
        new = warehouse.read_buckets_at_version(table, v_to, [])
        return new.withColumn("_change_type", F.lit("insert")).limit(0)
    else:
        old = warehouse.read_buckets_at_version(table, v_from, changed)
        new = warehouse.read_buckets_at_version(table, v_to, changed)
    return keyed_changes(old, new, key)


def apply_changes(base: DataFrame, feed: DataFrame, key: str) -> DataFrame:
    """The consumer half of the change feed: apply a ``table_changes``
    feed to a downstream copy of the FROM-version table, producing the
    TO-version table (pinned by the reconstruction test in the
    contract suite). Keys with a delete or update_preimage row are
    removed, then insert/update_postimage rows are added — one
    anti-join + union, the same shape as the warehouse merge itself,
    so a downstream mirror stays O(changes) per sync."""
    removed = feed.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).select(key)
    added = feed.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")
    return base.join(removed, on=key, how="left_anti").unionByName(added)
