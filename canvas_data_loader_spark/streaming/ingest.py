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

Exactly-once is belt-and-braces:

- BY VALUE: every stream write is a keyed last-writer-wins merge, so
  re-applying a batch's rows is a no-op (this is why the path REFUSES
  to ever take an append/overwrite write — see the guard in
  ``apply_stream_batch``);
- BY EPOCH: each published manifest records ``{app_id: batch_id}``
  (the Delta ``txn`` action shape); a replayed ``foreachBatch``
  delivery whose batch_id is already recorded skips cleanly — which
  also protects the one case value-idempotence can't: an operator
  re-running an OLD batch (stale checkpoint copy) after newer batches
  landed would otherwise overwrite newer values with older ones.

At scale this is the standard continuous-ingestion shape: file (or
Kafka) source -> AvailableNow/continuous trigger -> foreachBatch ->
MERGE into the table layout; state is bounded by the checkpoint, and
each micro-batch merge is partition-pruned by the bucketed layout
(merge_bucketed) rather than rewriting the table.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

from ..operators.merge import dedup_latest, merge_upsert
from ..plans.pipeline import CommitConflict, Warehouse


def apply_stream_batch(
    warehouse: Warehouse,
    table: str,
    keys: list[str],
    order_col: str | None,
    app_id: str,
    batch_df: DataFrame,
    batch_id: int,
) -> bool:
    """Apply ONE micro-batch as a keyed merge; returns False if the
    (app_id, batch_id) epoch was already recorded on the table (a
    foreachBatch replay) and the batch was skipped.

    Module-level (not a closure) so the replay contract is directly
    testable: deliver the same batch twice -> identical table, one
    commit. Every publish records the epoch in the manifest's ``txn``
    map via the SAME CAS commit that publishes the data — epoch
    bookkeeping and rows can never diverge.
    """
    new = batch_df
    if order_col is not None:
        new = dedup_latest(new, keys, order_col)
    # Every publish here is state-DEPENDENT — create (CAS at
    # commit 1), plain merge (CAS at the commit it read), and the
    # bucketed-vs-plain ROUTING itself (a concurrent batch
    # pipeline may create the table bucketed inside this
    # micro-batch's window) — so the whole decision tree sits
    # inside the conflict-retry loop, and each attempt derives
    # exists/bucketed/bucket_key/replayed from ONE manifest fetch
    # (a table dropped between separate fetches would otherwise
    # crash outside the retry loop). On CommitConflict the table
    # state is re-inspected from scratch, never re-derived from a
    # stale routing decision.
    for attempt in range(6):
        m = warehouse.routing_info(table)
        if m is not None and int(m["txn"].get(app_id, -1)) >= batch_id:
            # replayed epoch: this batch's merge already committed
            # (crash landed between the warehouse publish and the
            # streaming checkpoint commit, or an old checkpoint was
            # restored). Skip — re-applying after LATER batches have
            # landed would overwrite newer values with older ones.
            return False
        if m is not None and m["bucket_key"] is not None:
            bucket_key = m["bucket_key"]
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
                txn=(app_id, batch_id),
            )
            return True
        # INVARIANT: the stream path is merge-only. Both remaining
        # branches below are keyed merges published via CAS with the
        # epoch recorded; there is deliberately NO append or volatile
        # overwrite routing here — adding one would break replay
        # safety by value (re-applied appends duplicate rows) and this
        # function's exactly-once contract documents that refusal.
        if m is None:
            merged, base_version = new, warehouse.GENESIS_VERSION
        else:
            base_version, old = warehouse.read_versioned(table)
            merged = merge_upsert(old, new.select(old.columns), keys)
        try:
            warehouse.write(
                table,
                merged,
                snapshot=f"stream-{batch_id}",
                expected_version=base_version,
                txn=(app_id, batch_id),
            )
            return True
        except CommitConflict:
            if attempt == 5:
                raise
    return True  # unreachable; loop either returns or raises


def stream_upsert_to_warehouse(
    stream_df: DataFrame,
    warehouse: Warehouse,
    table: str,
    key: str | list[str],
    order_col: str | None = None,
    checkpoint: str | None = None,
    app_id: str | None = None,
    refresh_views: bool = False,
    maintain_indexes: bool = False,
):
    """Continuously merge a stream into ``warehouse.table`` by key.

    Returns the StreamingQuery (caller awaits termination). Each
    micro-batch: collapse in-batch duplicate keys to the latest (by
    ``order_col`` when given — within-batch arrival order is not
    deterministic in a distributed source, unlike the reference's
    sequential per-file loop), then anti-join/union against the
    current snapshot and atomically swap the table pointer.

    ``app_id`` names this writer in the table's epoch (``txn``) map;
    it defaults to the checkpoint path because batch_ids are scoped to
    a checkpoint — two queries sharing a checkpoint are the same
    logical writer resumed, two distinct checkpoints are independent
    writers whose epochs must not collide.

    ``refresh_views=True`` advances every materialized rollup view
    registered on ``table`` (plans/ops.py create_rollup_view) after
    each micro-batch's merge commits — the streaming twin of
    PipelineConfig.auto_refresh_views, incremental off the batch's
    changed buckets, and best-effort the same way: a view failure is
    logged and skipped (the stream's exactly-once data path must not
    be held hostage by a derived table; the view catches up on the
    next batch).

    ``maintain_indexes=True`` does the same for REGISTERED near-dup /
    ANN indexes on ``table`` (plans/ops.py maintain_indexes_of) — the
    streaming twin of PipelineConfig.auto_maintain_indexes: each
    micro-batch's merge is followed by an O(changed) index advance
    keyed off the index's own txn watermark, so a replayed batch
    (skipped merge, watermark already at head) is an index no-op too.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ckpt = checkpoint or tempfile.mkdtemp(prefix="ingest_ckpt_")
    writer_id = app_id if app_id is not None else f"stream:{ckpt}"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_stream_batch(
            warehouse, table, keys, order_col, writer_id, batch_df, batch_id
        )
        if refresh_views:
            from ..plans.ops import refresh_views_of

            refresh_views_of(warehouse, table)
        if maintain_indexes:
            from ..plans.ops import maintain_indexes_of

            maintain_indexes_of(warehouse, table)

    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
