"""Spark-free keyed MERGE (pyarrow) — the DML core for driver-side
contexts that have NO SparkSession.

Why it exists: the Python Data Source streaming WRITER's ``commit()``
(SPARK-44076) runs in a plain Python worker process spawned by the
JVM — ``SparkSession.getActiveSession()`` is None there, so the
exactly-once merge a ``writeStream.format("cdl_warehouse")`` batch
needs cannot go through the DataFrame API. This module re-expresses
the bucketed keyed upsert over pyarrow against the SAME commit
protocols (numbered-manifest ``Warehouse`` and Delta-log
``DeltaWarehouse``), reusing their Spark-free metadata paths
(``sources.warehouse_source._Meta``) and the stream reader's
conformed/DV-masked arrow read, and publishing through the SAME CAS
primitives (``Warehouse._publish`` / ``DeltaWarehouse._commit``) —
one commit protocol, two execution engines.

Scale envelope (documented, deliberate): memory is O(batch bytes +
affected buckets' bytes) in ONE process. A micro-batch touches the
buckets its keys hash to; with the compaction policy keeping buckets
file-count-bounded this is megabytes-to-low-gigabytes — fine for a
streaming commit thread. The fully distributed lane for backfills
that touch every bucket remains ``streaming.ingest`` (foreachBatch +
``apply_stream_batch``), which this module mirrors semantically
(same epoch skip rule, same CAS retry, pinned by shared tests).

The bucket routing MUST equal Spark's ``pmod(xxhash64(key), n)``
(operators/merge.py bucket_of) bit-for-bit, or a stream-merged row
lands in a different bucket than a batch-merged one and the pruned
merge silently misses it. xxHash64 is implemented here from the
public xxHash spec (BSD, Cyan4973/xxHash) with Spark's per-type input
conventions (int family through the 4-byte lane sign-extended, long
through the 8-byte lane, strings as UTF-8 bytes, NULL hashes to the
seed); parity with ``F.xxhash64`` is pinned by
tests/test_arrow_dml.py across random values of every supported type.
"""

from __future__ import annotations

import json
import os
import time

_SEED = 42  # Spark's xxhash64 seed (catalyst hash expressions)

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _xxh64_long(value: int, seed: int = _SEED) -> int:
    """xxHash64 of one 64-bit value (Spark's hashLong lane)."""
    h = (seed + _P5 + 8) & _M
    k1 = (value & _M) * _P2 & _M
    k1 = (_rotl(k1, 31) * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _xxh64_int(value: int, seed: int = _SEED) -> int:
    """xxHash64 of one 32-bit value (Spark's hashInt lane — byte/
    short/int all promote to this, sign-extended then masked)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _xxh64_bytes(data: bytes, seed: int = _SEED) -> int:
    """Full xxHash64 over a byte string (Spark's hashUnsafeBytes lane
    — strings hash as their UTF-8 bytes). Written from the public
    xxHash spec: 32-byte stripes through four accumulators, then the
    8/4/1-byte tails, little-endian words throughout."""
    length = len(data)
    off = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while off + 32 <= length:
            for i, v in enumerate((v1, v2, v3, v4)):
                w = int.from_bytes(data[off + 8 * i : off + 8 * i + 8], "little")
                v = (v + w * _P2) & _M
                v = (_rotl(v, 31) * _P1) & _M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h ^ k) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + length) & _M
    while off + 8 <= length:
        w = int.from_bytes(data[off : off + 8], "little")
        k = (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= length:
        w = int.from_bytes(data[off : off + 4], "little")
        h = (_rotl(h ^ ((w * _P1) & _M), 23) * _P2 + _P3) & _M
        off += 4
    while off < length:
        h = (_rotl(h ^ ((data[off] * _P5) & _M), 11) * _P1) & _M
        off += 1
    return _fmix(h)


_INT_TYPES = {"tinyint", "smallint", "int", "integer", "byte", "short"}
_LONG_TYPES = {"bigint", "long"}


def spark_xxhash64(value, dtype: str, seed: int = _SEED) -> int:
    """Signed-64 result of Spark's ``xxhash64(col)`` for one value.
    NULL hashes to the seed unchanged (Catalyst's null rule)."""
    if value is None:
        u = seed & _M
    elif dtype in _LONG_TYPES:
        u = _xxh64_long(int(value), seed)
    elif dtype in _INT_TYPES:
        u = _xxh64_int(int(value), seed)
    elif dtype in ("string", "varchar"):
        u = _xxh64_bytes(str(value).encode("utf-8"), seed)
    elif dtype == "boolean":
        u = _xxh64_int(1 if value else 0, seed)
    else:
        raise ValueError(
            f"unsupported bucket-key type {dtype!r} for the Spark-free "
            "merge lane (supported: int family, long, string, boolean)"
        )
    return u - (1 << 64) if u >= (1 << 63) else u


def bucket_of_value(value, dtype: str, n: int) -> int:
    """``pmod(xxhash64(value), n)`` — Spark's bucket routing
    (operators/merge.py bucket_of), value-for-value."""
    return spark_xxhash64(value, dtype) % n  # python % IS pmod


# ---------------------------------------------------------------------------
# the merge
# ---------------------------------------------------------------------------


def _dedup_latest_arrow(batch, key_cols: list[str], order_col: str | None):
    """In-batch duplicate keys collapse to the latest by ``order_col``
    (dedup_latest's window semantics; arrow sort is stable so ties
    resolve deterministically). No order column -> keep the LAST
    occurrence (the reference's sequential-overwrite outcome)."""
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return batch
    if order_col is not None:
        order = pc.sort_indices(
            batch, sort_keys=[(order_col, "descending")]
        ).to_pylist()
    else:
        order = list(range(batch.num_rows - 1, -1, -1))
    key_vals = [tuple(batch.column(k)[i].as_py() for k in key_cols) for i in range(batch.num_rows)]
    seen: set = set()
    keep = []
    for i in order:
        k = key_vals[i]
        if k not in seen:
            seen.add(k)
            keep.append(i)
    keep.sort()
    return batch.take(keep)


def _anti_join(old, batch, key_cols: list[str]):
    """Rows of ``old`` whose key tuple does NOT appear in ``batch``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if old.num_rows == 0 or batch.num_rows == 0:
        return old
    if len(key_cols) == 1:
        k = key_cols[0]
        # Spark's join-on-key never matches NULL keys, on EITHER side:
        # drop nulls from the probe set (else a null-key batch row
        # would "match" old null-key rows) and keep old null-key rows
        # unconditionally (is_in yields null for them; fill as True)
        probe = pc.drop_null(pc.unique(batch.column(k)))
        mask = pc.invert(pc.is_in(old.column(k), value_set=probe))
        mask = pc.fill_null(mask, True)
        return old.filter(mask)
    batch_keys = {
        tuple(batch.column(k)[i].as_py() for k in key_cols)
        for i in range(batch.num_rows)
        if all(batch.column(k)[i].is_valid for k in key_cols)
    }
    keep = [
        i
        for i in range(old.num_rows)
        if not all(old.column(k)[i].is_valid for k in key_cols)
        or tuple(old.column(k)[i].as_py() for k in key_cols) not in batch_keys
    ]
    return old.take(keep) if len(keep) < old.num_rows else old


def _write_parquet(table, path: str) -> None:
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)


def _conform_batch(batch, meta, version: int):
    """Project the staged batch onto the table's declared data schema
    (same conform rules as every read: rename chains, null-pad, cast).
    Returns (conformed batch, data arrow schema, spark struct)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    from ..sources.warehouse_source import _conform_arrow

    struct = meta.spark_schema(version)
    data_schema = to_arrow_schema(struct)
    return _conform_arrow(batch, data_schema, meta.renamed_from(version)), data_schema, struct


def apply_stream_batch_arrow(
    root: str,
    table: str,
    keys: list[str],
    order_col: str | None,
    app_id: str,
    batch,
    batch_id: int,
    protocol: str | None = None,
    max_commit_retries: int = 5,
) -> bool:
    """Session-free twin of ``streaming.ingest.apply_stream_batch``:
    apply ONE micro-batch (a pyarrow Table) as a keyed merge with the
    ``(app_id, batch_id)`` epoch recorded in the SAME CAS commit.
    Returns False when the epoch was already recorded (a replay) and
    the batch was skipped. Same decision tree as the Spark lane:
    bucketed tables take the partition-pruned merge (single key, must
    equal the bucket key), plain tables rewrite the snapshot, an
    absent table is created plain — all inside the conflict-retry
    loop, state re-derived per attempt."""
    import pyarrow as pa

    from ..sources.warehouse_source import _Meta, _read_conformed

    has_delta = os.path.isdir(os.path.join(root, table, "_delta_log"))
    has_manifest = os.path.isdir(os.path.join(root, table, "_commits"))
    if protocol is None:
        protocol = "delta" if has_delta else "manifest"
    elif (protocol == "manifest" and has_delta and not has_manifest) or (
        protocol == "delta" and has_manifest and not has_delta
    ):
        # an explicit wrong protocol option must not CAS-create a
        # SECOND commit log inside an existing table directory — the
        # auto-detecting readers would keep following the original one
        # and every streamed row would be silently invisible
        raise ValueError(
            f"table {table!r} already exists under the "
            f"{'delta' if has_delta else 'manifest'} protocol; "
            f"refusing to write it as {protocol!r}"
        )
    batch = _dedup_latest_arrow(batch, keys, order_col)

    for _attempt in range(1 + max_commit_retries):
        exists = (
            os.path.isdir(os.path.join(root, table, "_delta_log"))
            if protocol == "delta"
            else os.path.isdir(os.path.join(root, table, "_commits"))
        )
        if not exists:
            if _create_plain(root, table, batch, app_id, batch_id, protocol):
                return True
            continue  # lost the create race: re-derive as a merge
        meta = _Meta(root, table, protocol)
        base = meta.current_version()
        info = meta.wh.routing_info(table)
        if info is not None and int(info["txn"].get(app_id, -1)) >= batch_id:
            return False  # replayed epoch: already committed
        bucket_key = info.get("bucket_key") if info else None
        if bucket_key is not None:
            if len(keys) != 1 or keys[0] != bucket_key:
                raise ValueError(
                    f"table {table!r} is bucketed on {bucket_key!r}; "
                    f"stream merge key {keys!r} must match it"
                )
            ok = _merge_bucketed_arrow(
                root, table, meta, base, bucket_key,
                int(info["n_buckets"]), batch, app_id, batch_id, protocol,
            )
        else:
            ok = _merge_plain_arrow(
                root, table, meta, base, keys, batch, app_id, batch_id,
                protocol,
            )
        if ok:
            return True
    from .pipeline import CommitConflict

    raise CommitConflict(
        f"{table}: arrow stream merge lost the commit race "
        f"{1 + max_commit_retries} times"
    )



def _enforce_arrow_constraints(meta, table: str, batch_c, base: int) -> None:
    """CHECK constraints on the session-less lane: the writer contract
    (plans/constraints.py) holds here too — DuckDB evaluates the same
    expressions over the conformed arrow batch, so a constrained table
    refuses a violating micro-batch BEFORE any file is written.
    Properties come from the merge's BASE metadata (the manifest /
    memoized log replay already fetched for this attempt — no second
    log read, and the check is consistent with the state the merge
    derives from)."""
    from .constraints import constraints_of, enforce_arrow

    if meta.protocol == "delta":
        _, m, _, _, _ = meta._replayed(base)
        props = m.get("configuration") or {}
    else:
        props = meta._manifest_at(base).get("props") or {}
    enforce_arrow(batch_c, constraints_of(props), table)


def _spark_type_of(struct, col: str) -> str:
    return struct[col].dataType.simpleString()


def _merge_bucketed_arrow(
    root, table, meta, base, key, n, batch, app_id, batch_id, protocol
) -> bool:
    import pyarrow as pa

    from ..sources.warehouse_source import _read_conformed

    batch_c, data_schema, struct = _conform_batch(batch, meta, base)
    _enforce_arrow_constraints(meta, table, batch_c, base)
    ktype = _spark_type_of(struct, key)
    kvals = batch_c.column(key).to_pylist()
    buckets = [bucket_of_value(v, ktype, n) for v in kvals]
    affected = sorted(set(buckets))
    by_bucket: dict[int, list[int]] = {}
    for i, b in enumerate(buckets):
        by_bucket.setdefault(b, []).append(i)
    files_map = meta.files_by_bucket(base)
    dv_all = meta.dv_by_file(base)
    renames = meta.renamed_from(base)
    out_tables: dict[int, pa.Table] = {}
    for b in affected:
        files = files_map.get(b, [])
        old = _read_conformed(
            files, data_schema, renames,
            {f: dv_all[f] for f in files if f in dv_all},
        )
        kept = _anti_join(old, batch_c, [key])
        mine = batch_c.take(by_bucket[b])
        out_tables[b] = pa.concat_tables([kept, mine])
    if protocol == "manifest":
        from ..operators.merge import BUCKET_COL
        from .pipeline import (
            CommitConflict,
            Warehouse,
            _dv_surviving_rewrite,
            _txn_overlay,
        )

        wh = Warehouse(None, root)
        latest = wh._latest_commit(table)
        if latest is None or latest[0] != base:
            return False  # state moved underneath: re-derive
        m = latest[1]
        snapshot = wh._fresh_snapshot_name(table, f"stream-{batch_id}")
        out_dir = os.path.join(root, table, snapshot)
        for b, t in out_tables.items():
            _write_parquet(
                t, os.path.join(out_dir, f"{BUCKET_COL}={b}", "part-00000.parquet")
            )
        wh._write_stats_sidecar(out_dir)
        manifest = {
            "snapshot": snapshot,
            "bucket_key": key,
            "n_buckets": n,
            "buckets": {
                **m["buckets"],
                **{str(b): snapshot for b in affected},
            },
            **(
                {"dv": dvk}
                if (dvk := _dv_surviving_rewrite(m, affected))
                else {}
            ),
            **({"schema": m["schema"]} if m.get("schema") else {}),
            **(
                {"renamed_from": m["renamed_from"]}
                if m.get("renamed_from")
                else {}
            ),
            "txn": _txn_overlay(m.get("txn"), (app_id, batch_id)),
            **wh._props_map(None, m),
            **({"table_id": m["table_id"]} if m.get("table_id") else {}),
        }
        try:
            wh._publish(table, manifest, expected_version=base)
        except CommitConflict:
            return False
        wh._prune(table)
        return True
    return _delta_commit_files(
        root, table, base, out_tables, affected, app_id, batch_id,
        remove_buckets=affected,
    )


def _merge_plain_arrow(
    root, table, meta, base, keys, batch, app_id, batch_id, protocol
) -> bool:
    import pyarrow as pa

    from ..sources.warehouse_source import _read_conformed

    batch_c, data_schema, _struct = _conform_batch(batch, meta, base)
    _enforce_arrow_constraints(meta, table, batch_c, base)
    files_map = meta.files_by_bucket(base)
    files = [f for fl in files_map.values() for f in fl]
    dv_all = meta.dv_by_file(base)
    old = _read_conformed(
        files, data_schema, meta.renamed_from(base),
        {f: dv_all[f] for f in files if f in dv_all},
    )
    merged = pa.concat_tables([_anti_join(old, batch_c, keys), batch_c])
    if protocol == "manifest":
        from .pipeline import CommitConflict, Warehouse, _txn_overlay

        wh = Warehouse(None, root)
        latest = wh._latest_commit(table)
        if latest is None or latest[0] != base:
            return False
        m = latest[1]
        snapshot = wh._fresh_snapshot_name(table, f"stream-{batch_id}")
        out_dir = os.path.join(root, table, snapshot)
        _write_parquet(merged, os.path.join(out_dir, "part-00000.parquet"))
        wh._write_stats_sidecar(out_dir)
        manifest = {
            "snapshot": snapshot,
            "txn": _txn_overlay(m.get("txn"), (app_id, batch_id)),
            **wh._props_map(None, m),
            **({"table_id": m["table_id"]} if m.get("table_id") else {}),
        }
        try:
            wh._publish(table, manifest, expected_version=base)
        except CommitConflict:
            return False
        wh._prune(table)
        return True
    return _delta_commit_files(
        root, table, base, {None: merged}, [], app_id, batch_id,
        remove_buckets=None,
    )


def _create_plain(root, table, batch, app_id, batch_id, protocol) -> bool:
    """CAS-create an absent table from the first micro-batch (plain,
    like the Spark lane — bucketing is a batch-pipeline decision)."""
    if protocol == "manifest":
        from .pipeline import CommitConflict, Warehouse

        wh = Warehouse(None, root)
        snapshot = wh._fresh_snapshot_name(table, f"stream-{batch_id}")
        out_dir = os.path.join(root, table, snapshot)
        _write_parquet(batch, os.path.join(out_dir, "part-00000.parquet"))
        wh._write_stats_sidecar(out_dir)
        import uuid

        manifest = {
            "snapshot": snapshot,
            "txn": {app_id: batch_id},
            "table_id": str(uuid.uuid4()),
        }
        try:
            wh._publish(
                table, manifest, expected_version=wh.GENESIS_VERSION
            )
            return True
        except CommitConflict:
            return False
    from pyspark.sql.pandas.types import from_arrow_schema

    from .delta import DeltaWarehouse
    from .pipeline import CommitConflict

    wh = DeltaWarehouse(None, root)
    rel = wh._claim_batch_dir(table, f"stream-{batch_id}")
    path = os.path.join(root, table, rel, "part-00000.parquet")
    _write_parquet(batch, path)
    schema_json = from_arrow_schema(batch.schema).json()
    actions = [
        wh._commit_info("CREATE TABLE AS SELECT", {"mode": "Stream"}),
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": wh._meta_action(schema_json, None)},
        {"txn": {"appId": app_id, "version": batch_id}},
        _delta_add(root, table, path),
    ]
    try:
        wh._commit(table, 0, actions)
        return True
    except CommitConflict:
        return False


def _delta_add(root: str, table: str, path: str, pv: dict | None = None) -> dict:
    from .stats import _file_stats

    rel = os.path.relpath(path, os.path.join(root, table))
    return {
        "add": {
            "path": rel,
            "partitionValues": pv or {},
            "size": os.path.getsize(path),
            "modificationTime": int(os.path.getmtime(path) * 1000),
            "dataChange": True,
            "stats": _file_stats(path),
        }
    }


def _delta_commit_files(
    root, table, base, out_tables, affected, app_id, batch_id,
    remove_buckets,
) -> bool:
    """Write the merged tables as delta files and CAS-commit at
    base+1: removes = the files previously live in the rewritten
    buckets (all live files when ``remove_buckets`` is None, the
    plain-table rewrite), adds = the new files (physical column names
    under column mapping)."""
    from ..operators.merge import BUCKET_COL
    from .delta import DeltaWarehouse, _cm_mapping
    from .pipeline import CommitConflict

    wh = DeltaWarehouse(None, root)
    _v, meta, live, _txn, _ = wh._replay(table, upto=base)
    mapping = _cm_mapping(meta) or {}
    rel = wh._claim_batch_dir(table, f"stream-{batch_id}")
    actions = [
        wh._commit_info("MERGE", {"affectedBuckets": len(affected)}),
        {"txn": {"appId": app_id, "version": batch_id}},
    ]
    now = int(time.time() * 1000)
    wanted = {str(b) for b in remove_buckets} if remove_buckets is not None else None
    for p, a in sorted(live.items()):
        b = (a.get("partitionValues") or {}).get(BUCKET_COL)
        if wanted is None or b in wanted:
            actions.append(
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": now,
                        "dataChange": True,
                    }
                }
            )
    for b, t in sorted(
        out_tables.items(), key=lambda kv: (kv[0] is None, kv[0])
    ):
        if mapping:
            t = t.rename_columns(
                [mapping.get(nm, nm) for nm in t.schema.names]
            )
        if b is None:
            path = os.path.join(root, table, rel, "part-00000.parquet")
            pv = {}
        else:
            path = os.path.join(
                root, table, rel, f"{BUCKET_COL}={b}", "part-00000.parquet"
            )
            pv = {BUCKET_COL: str(b)}
        _write_parquet(t, path)
        actions.append(_delta_add(root, table, path, pv))
    try:
        wh._commit(table, base + 1, actions)
        return True
    except CommitConflict:
        return False
