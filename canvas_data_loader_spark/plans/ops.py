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

from pyspark.sql import functions as F

from ..operators.merge import bucket_of
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
