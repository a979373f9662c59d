"""Streaming ingestion into the warehouse: the reference's hourly
cron re-list-and-import loop (README.md:31-33, src/main.rs:55-249)
expressed as a Structured Streaming pipeline.

``foreachBatch`` is the bridge between the streaming source and the
batch merge machinery: each micro-batch of newly-arrived rows is
applied to the warehouse with the SAME keyed last-writer-wins merge
the batch pipeline uses (operators/merge.py, ref importer.rs:345-390),
and the streaming checkpoint plays the role of the import ledger
(A25): files already processed are never re-read, so reruns are
idempotent without any bookkeeping code of ours.

At scale this is the standard continuous-ingestion shape: file (or
Kafka) source -> AvailableNow/continuous trigger -> foreachBatch ->
MERGE into the table layout; state is bounded by the checkpoint, and
each micro-batch merge is partition-pruned by the bucketed layout
(merge_upsert_bucketed) rather than rewriting the table.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

from ..operators.merge import dedup_latest, merge_upsert
from ..plans.pipeline import Warehouse


def stream_upsert_to_warehouse(
    stream_df: DataFrame,
    warehouse: Warehouse,
    table: str,
    key: str | list[str],
    order_col: str | None = None,
    checkpoint: str | None = None,
):
    """Continuously merge a stream into ``warehouse.table`` by key.

    Returns the StreamingQuery (caller awaits termination). Each
    micro-batch: collapse in-batch duplicate keys to the latest (by
    ``order_col`` when given — within-batch arrival order is not
    deterministic in a distributed source, unlike the reference's
    sequential per-file loop), then anti-join/union against the
    current snapshot and atomically swap the table pointer.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df
        if order_col is not None:
            new = dedup_latest(new, keys, order_col)
        # Every publish here is state-DEPENDENT — create (CAS at
        # commit 1), plain merge (CAS at the commit it read), and the
        # bucketed-vs-plain ROUTING itself (a concurrent batch
        # pipeline may create the table bucketed inside this
        # micro-batch's window) — so the whole decision tree sits
        # inside the conflict-retry loop: on CommitConflict the table
        # state is re-inspected from scratch, never re-derived from a
        # stale routing decision. Otherwise a create attempt losing to
        # a bucketed creator would fall into the PLAIN merge branch
        # and publish an unbucketed manifest, silently destroying the
        # layout this function refuses loudly to destroy below.
        from ..plans.pipeline import CommitConflict

        for attempt in range(6):
            # ONE state fetch per attempt: exists / bucketed / bucket_key
            # all derive from a single manifest snapshot. Separate
            # exists()/is_bucketed()/current_manifest() calls reopen a
            # TOCTOU where the table is dropped or replaced un-bucketed
            # between them and .get on a None manifest raises
            # AttributeError OUTSIDE the CommitConflict retry loop,
            # crashing the micro-batch (r7 advisor finding).
            m = warehouse.current_manifest(table)
            if m is not None and m.get("buckets"):
                bucket_key = m.get("bucket_key")
                if len(keys) != 1 or bucket_key != keys[0]:
                    # falling through to the plain path would publish
                    # an UNbucketed manifest — silently destroying the
                    # table's layout (and the pruned-merge property) on
                    # the first micro-batch. Refuse loudly instead.
                    raise ValueError(
                        f"table {table!r} is bucketed on {bucket_key!r}; "
                        f"stream merge key {keys!r} must match it"
                    )
                # bucketed tables take the partition-pruned MERGE: each
                # micro-batch reads and rewrites only the buckets its
                # keys hash to (round-6 pipeline default, same path as
                # batch). broadcast_keys=False: a stream has no
                # staged-bytes size signal, and an unthrottled backfill
                # can deliver the whole backlog as ONE micro-batch —
                # forcing a broadcast of an unbounded key set is the
                # exact hazard the batch path gates on
                # broadcast_merge_max_bytes; AQE still broadcasts
                # genuinely small key sets at runtime
                warehouse.merge_bucketed(
                    table, new, snapshot=f"stream-{batch_id}",
                    broadcast_keys=False,
                )
                return
            if m is None:
                merged, base_version = new, 0
            else:
                base_version, old = warehouse.read_versioned(table)
                merged = merge_upsert(old, new.select(old.columns), keys)
            try:
                warehouse.write(
                    table,
                    merged,
                    snapshot=f"stream-{batch_id}",
                    expected_version=base_version,
                )
                return
            except CommitConflict:
                if attempt == 5:
                    raise

    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="ingest_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
