"""Delta Lake transaction-log Warehouse: the same commit semantics as
``plans.pipeline.Warehouse`` (CAS publishes, snapshot isolation, time
travel, partition-pruned MERGE, writer epochs) expressed in the PUBLIC
Delta Lake protocol format, so the tables this writer produces are
consumable by any real Delta reader (delta-spark, delta-rs, DuckDB's
delta extension) — no proprietary manifest format on the read side.

Protocol facts used here (all from the open Delta protocol spec,
https://github.com/delta-io/delta/blob/master/PROTOCOL.md):

- a table is a directory; its state is the ordered log of JSON commit
  files ``_delta_log/{version:020d}.json``, each holding one action
  per line: ``protocol``, ``metaData``, ``add``, ``remove``, ``txn``,
  ``commitInfo``;
- commit atomicity = put-if-absent of the next version's file: on a
  POSIX/HDFS store an exclusive create (``open(..., 'x')``), on S3 a
  conditional PUT — EXACTLY the mechanism the numbered-manifest
  warehouse already uses, which is why both impls pass one shared
  concurrency suite (tests/test_warehouse_contract.py);
- data files are immutable parquet anywhere under the table dir,
  referenced by relative ``path``; logical deletion is a ``remove``
  action (tombstone), physical deletion is VACUUM after a retention
  window;
- partition columns are carried in directory names + the add action's
  ``partitionValues`` (never in the data files);
- readers bound log replay with a parquet CHECKPOINT
  (``{v:020d}.checkpoint.parquet`` + ``_last_checkpoint``); without
  one, replay is O(commits) — ``checkpoint()`` writes them and
  ``_replay`` consumes them, so metadata stays bounded at 100 TB
  (a year of hourly merges ≈ 9k commits; checkpoint every 10 keeps
  replay at ≤ 10 JSON reads + one parquet footer).

The reference analog is A15-A19 (create/drop/upsert,
src/importer.rs:345-390): this class is the at-scale sink those rows
target when the warehouse must interop with an external lakehouse.
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import BUCKET_COL, bucket_of, rename_simultaneous
from .pipeline import CommitConflict
from .stats import _file_stats

_LOG_FMT = "{:020d}.json"
_CKPT_FMT = "{:020d}.checkpoint.parquet"
# multi-part classic checkpoint (PROTOCOL.md §checkpoints): part p of n
_CKPT_PART_FMT = "{:020d}.checkpoint.{:010d}.{:010d}.parquet"
# V2 spec checkpoint (PROTOCOL.md §v2-spec-checkpoints): one top-level
# manifest named {v:020d}.checkpoint.{uniqueId}.parquet holding
# protocol/metaData/txn/checkpointMetadata/sidecar actions, with the
# FILE actions (add/remove) in sidecar parquets under
# _delta_log/_sidecars/ — the layout current external writers produce,
# which bounds the manifest to metadata-row size no matter how many
# live files the state holds
_CKPT_V2_FMT = "{:020d}.checkpoint.{}.parquet"
_RE_CKPT_PART = re.compile(r"\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet")
_SIDECAR_DIR = "_sidecars"

# Column mapping (PROTOCOL.md §column-mapping): the rename lane. With
# ``delta.columnMapping.mode = name`` the schemaString's field metadata
# carries a stable ``physicalName`` (the name actually stored in every
# parquet file) plus a unique ``id``; a RENAME changes only the
# LOGICAL field name in schemaString — no data file is touched, which
# at 100 TB is the whole point. Upgrading an existing table assigns
# physicalName = the current (on-disk) name per field, so every file
# already written stays readable.
_CM_MODE = "delta.columnMapping.mode"
_CM_MAX_ID = "delta.columnMapping.maxColumnId"
_CM_ID = "delta.columnMapping.id"
_CM_PHYS = "delta.columnMapping.physicalName"


def _overlay_user_cfg(
    existing_cfg: dict | None, props: dict | None, internal
) -> dict:
    """ONE property-merge rule for metaData.configuration (the
    _props_map twin): carried user keys minus the engine's internal
    routing keys, overlaid with ``props`` (None unsets, values
    stringified). Shared by _meta_action and the write-path constraint
    gate so the checked set can never drift from the committed one."""
    cfg = {
        k: v
        for k, v in (existing_cfg or {}).items()
        if k not in internal
    }
    for k, v in (props or {}).items():
        if v is None:
            cfg.pop(k, None)
        else:
            cfg[str(k)] = str(v)
    return cfg


def _cm_mapping(meta: dict) -> dict[str, str] | None:
    """{logical name -> physical name} when the table uses column
    mapping (mode=name), else None (physical == logical everywhere)."""
    if (meta.get("configuration") or {}).get(_CM_MODE) != "name":
        return None
    sch = json.loads(meta["schemaString"])
    return {
        f["name"]: (f.get("metadata") or {}).get(_CM_PHYS, f["name"])
        for f in sch["fields"]
    }



class DeltaWarehouse:
    """Delta-log-format warehouse with the same write surface as
    ``Warehouse``: ``write`` (full replace / create), ``merge_bucketed``
    (partition-pruned keyed upsert), ``read``/``read_versioned``/
    ``read_at_version`` (snapshot + time travel), ``compact``,
    ``vacuum``, ``external_read_sql``, ``last_txn_epoch``.

    Concurrency contract (shared with ``Warehouse`` and pinned by the
    shared suite): every state-DEPENDENT publish is a compare-and-swap
    at exactly ``base_version + 1`` — losers get CommitConflict and
    re-derive; state-independent full replacements retry internally
    with freshly derived remove-sets (last-writer-wins is then correct
    because each attempt's tombstones are re-read from the new head).
    """

    # Delta versions start at 0, so a CAS create races against -1
    # (shared-contract counterpart of Warehouse.GENESIS_VERSION)
    GENESIS_VERSION = -1

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        checkpoint_interval: int = 10,
        vacuum_retention_sec: float = 6 * 3600.0,
        checkpoint_part_size: int = 100_000,
        checkpoint_v2: bool = False,
    ):
        self.spark = spark
        self.root = root
        self.checkpoint_interval = checkpoint_interval
        self.vacuum_retention_sec = vacuum_retention_sec
        # True = write V2 SPEC checkpoints (sidecar layout) instead of
        # classic/multi-part; both forms are always READ (the reader
        # dispatches on what _last_checkpoint's version names on disk)
        self.checkpoint_v2 = checkpoint_v2
        # actions per checkpoint file: a state larger than this writes
        # the protocol's MULTI-PART classic checkpoint (…checkpoint.
        # {part}.{parts}.parquet + "parts" in _last_checkpoint), so
        # checkpoint write cost is bounded PER PART instead of one
        # O(all-live-files) parquet write — the metadata bottleneck at
        # millions of add actions
        self.checkpoint_part_size = checkpoint_part_size
        os.makedirs(root, exist_ok=True)

    # -- log primitives -----------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _log_dir(self, table: str) -> str:
        return os.path.join(self.root, table, "_delta_log")

    def _versions_on_disk(self, table: str) -> list[int]:
        ldir = self._log_dir(table)
        if not os.path.isdir(ldir):
            return []
        return sorted(
            int(n[:-5])
            for n in os.listdir(ldir)
            if n.endswith(".json") and n[:-5].isdigit()
        )

    def current_version(self, table: str) -> int:
        """Highest committed version, or -1 (Delta versions start at 0)."""
        vs = self._versions_on_disk(table)
        return vs[-1] if vs else -1

    def exists(self, table: str) -> bool:
        return self.current_version(table) >= 0

    def _commit(self, table: str, version: int, actions: list[dict]) -> None:
        """Put-if-absent of ``{version:020d}.json`` — the Delta commit.
        Raises CommitConflict if the version is already taken (the
        caller's base is superseded; re-derive and retry)."""
        ldir = self._log_dir(table)
        os.makedirs(ldir, exist_ok=True)
        target = os.path.join(ldir, _LOG_FMT.format(version))
        # Write the body to a hidden temp file, then CLAIM the version
        # with an atomic hard link. A bare open('x') + write has a
        # torn-commit window: a crash mid-write leaves a truncated
        # commit under the claimed number and every later replay
        # json-fails on it. link-after-write publishes only complete
        # bodies and keeps the exact put-if-absent semantics (link
        # fails with FileExistsError if the version is taken; on an
        # object store the conditional PUT is full-body atomic anyway).
        tmp = os.path.join(ldir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            for a in actions:
                fh.write(json.dumps(a, separators=(",", ":")) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflict(
                f"{table}: delta version {version} already committed — "
                "base state superseded"
            ) from None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        if version > 0 and version % self.checkpoint_interval == 0:
            try:
                self.checkpoint(table, version)
            except Exception:
                pass  # checkpoints are an optimization, never block a commit

    # -- replay -------------------------------------------------------------
    def _read_last_checkpoint(self, table: str) -> tuple[int, list[dict]] | None:
        lc = os.path.join(self._log_dir(table), "_last_checkpoint")
        try:
            with open(lc) as fh:
                data = json.load(fh)
            v = int(data["version"])
            parts = int(data["parts"]) if data.get("parts") else None
        except (OSError, ValueError, KeyError):
            return None
        ldir = self._log_dir(table)
        if parts:
            paths = [
                os.path.join(ldir, _CKPT_PART_FMT.format(v, p, parts))
                for p in range(1, parts + 1)
            ]
        else:
            paths = [os.path.join(ldir, _CKPT_FMT.format(v))]
        if all(os.path.isfile(p) for p in paths):
            import pyarrow.parquet as pq

            actions = []
            for path in paths:
                for r in pq.read_table(path).to_pylist():
                    for kind in (
                        "protocol", "metaData", "add", "remove", "txn",
                    ):
                        if r.get(kind) is not None:
                            actions.append({kind: r[kind]})
            return v, actions
        if not parts:
            # V2 SPEC checkpoint: {v}.checkpoint.{uniqueId}.parquet
            # manifest + sidecar file actions; every named sidecar must
            # exist, else fall back to full JSON replay (None)
            got = self._read_v2_checkpoint(table, v)
            if got is not None:
                return v, got
        return None

    def _read_v2_checkpoint(self, table: str, v: int) -> list[dict] | None:
        """Read a V2 spec checkpoint at version ``v``: the top-level
        manifest carries protocol/metaData/txn + sidecar references;
        add/remove actions come from the sidecar parquets. Returns the
        flattened action list, or None when the manifest or any named
        sidecar is missing (conservative: replay falls back to JSON)."""
        import glob as _glob

        import pyarrow.parquet as pq

        ldir = self._log_dir(table)
        cands = sorted(
            p
            for p in _glob.glob(
                os.path.join(ldir, _CKPT_V2_FMT.format(v, "*"))
            )
            # exclude classic multi-part names ({10d}.{10d}.parquet)
            if not _RE_CKPT_PART.fullmatch(os.path.basename(p))
        )
        if not cands:
            return None
        actions: list[dict] = []
        sidecars: list[str] = []
        for r in pq.read_table(cands[0]).to_pylist():
            for kind in ("protocol", "metaData", "txn"):
                if r.get(kind) is not None:
                    actions.append({kind: r[kind]})
            if r.get("sidecar") is not None:
                sidecars.append(r["sidecar"]["path"])
        sdir = os.path.join(ldir, _SIDECAR_DIR)
        paths = [os.path.join(sdir, s) for s in sidecars]
        if not all(os.path.isfile(p) for p in paths):
            return None
        for path in paths:
            for r in pq.read_table(path).to_pylist():
                for kind in ("add", "remove"):
                    if r.get(kind) is not None:
                        actions.append({kind: r[kind]})
        return actions

    def _replay(
        self, table: str, upto: int | None = None
    ) -> tuple[int, dict, dict[str, dict], dict[str, int], dict[str, dict]]:
        """Reconstruct table state at ``upto`` (default: head).

        Returns (version, metaData, live {path: add}, txn {app: epoch},
        tombstones {path: remove}). Replay starts from the newest
        checkpoint at-or-below ``upto`` when one exists, else from 0.
        """
        versions = self._versions_on_disk(table)
        if upto is not None:
            versions = [v for v in versions if v <= upto]
        if not versions:
            raise FileNotFoundError(f"table not in delta warehouse: {table}")
        if upto is not None and versions[-1] != upto:
            raise FileNotFoundError(
                f"delta version {upto} of {table!r} does not exist "
                f"(have {versions[:3]}..{versions[-1]})"
            )
        meta: dict = {}
        live: dict[str, dict] = {}
        txn: dict[str, int] = {}
        dead: dict[str, dict] = {}
        start = 0
        ckpt = self._read_last_checkpoint(table)
        if ckpt is not None and (upto is None or ckpt[0] <= versions[-1]):
            ckpt_v, actions = ckpt
            if ckpt_v <= versions[-1]:
                for a in actions:
                    self._apply(a, live, dead, txn)
                    if "metaData" in a:
                        meta = a["metaData"]
                start = ckpt_v + 1
        ldir = self._log_dir(table)
        for v in versions:
            if v < start:
                continue
            with open(os.path.join(ldir, _LOG_FMT.format(v))) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    self._apply(a, live, dead, txn)
                    if "metaData" in a:
                        meta = a["metaData"]
        return versions[-1], meta, live, txn, dead

    @staticmethod
    def _apply(a: dict, live: dict, dead: dict, txn: dict) -> None:
        if "add" in a:
            live[a["add"]["path"]] = a["add"]
            dead.pop(a["add"]["path"], None)
        elif "remove" in a:
            dead[a["remove"]["path"]] = a["remove"]
            live.pop(a["remove"]["path"], None)
        elif "txn" in a:
            t = a["txn"]
            txn[t["appId"]] = max(int(t["version"]), txn.get(t["appId"], -1))

    def checkpoint(
        self, table: str, version: int | None = None, v2: bool | None = None
    ) -> str:
        """Write the reconciled state as ``{v:020d}.checkpoint.parquet``
        + ``_last_checkpoint`` (the protocol's replay bound). One row
        per action, standard top-level columns (protocol / metaData /
        add / remove / txn), written driver-side — the state is
        metadata-sized (file entries, not data). With ``v2`` (or the
        warehouse's ``checkpoint_v2`` default) the V2 SPEC layout is
        written instead: a sidecar parquet per part of the FILE actions
        under ``_delta_log/_sidecars/`` and a top-level manifest
        referencing them — the form current external writers produce;
        readers here (and tools/delta_reader.py) consume both."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if v2 is None:
            v2 = self.checkpoint_v2
        v, meta, live, txn, dead = self._replay(table, upto=version)
        if v2:
            return self._checkpoint_v2(table, v, meta, live, txn, dead)
        # the protocol row matches the features live IN this state:
        # deletionVectors while DVs are live, columnMapping while the
        # metaData declares mode=name (a feature-free state checkpoints
        # the base protocol — our readers ignore protocol rows, and a
        # real Delta reader only needs the gate while the feature is
        # in play; note a real writer would never downgrade, documented
        # trade)
        rows: list[dict] = [
            self._protocol_action(meta, live, table=table),
            {"metaData": meta},
        ]
        rows += [{"txn": {"appId": k, "version": n}} for k, n in sorted(txn.items())]
        rows += [{"add": a} for _, a in sorted(live.items())]
        rows += [{"remove": r} for _, r in sorted(dead.items())]
        cols = ("protocol", "metaData", "add", "remove", "txn")

        def _no_empty(v):
            # parquet cannot encode zero-field structs; empty maps
            # ({} partitionValues / options / configuration) become
            # null in the CHECKPOINT only — replay treats absent as
            # empty, and the authoritative JSON log keeps the exact
            # protocol spelling
            if isinstance(v, dict):
                return {k: _no_empty(x) for k, x in v.items()} or None
            return v

        arrow_rows = [{c: _no_empty(r.get(c)) for c in cols} for r in rows]
        ldir = self._log_dir(table)
        psize = max(1, int(self.checkpoint_part_size))
        if len(arrow_rows) <= psize:
            path = os.path.join(ldir, _CKPT_FMT.format(v))
            pq.write_table(pa.Table.from_pylist(arrow_rows), path)
            lc = {"version": v, "size": len(arrow_rows)}
        else:
            # multi-part classic checkpoint: each part's write is
            # bounded by part size, so checkpointing a state with
            # millions of add actions never funnels through one
            # O(state) parquet write. All parts land before
            # _last_checkpoint points at them (same publish-last
            # discipline as every other write here); readers require
            # every named part and fall back to full JSON replay if
            # any is missing.
            parts = (len(arrow_rows) + psize - 1) // psize
            # one schema for every part, inferred over ALL rows — a
            # part holding only adds must still carry the full 5-column
            # shape (a type inferred from one chunk could differ)
            schema = pa.Table.from_pylist(arrow_rows).schema
            for p in range(1, parts + 1):
                chunk = arrow_rows[(p - 1) * psize : p * psize]
                path = os.path.join(ldir, _CKPT_PART_FMT.format(v, p, parts))
                pq.write_table(
                    pa.Table.from_pylist(chunk, schema=schema), path
                )
            path = os.path.join(ldir, _CKPT_PART_FMT.format(v, 1, parts))
            lc = {"version": v, "size": len(arrow_rows), "parts": parts}
        with open(os.path.join(ldir, "_last_checkpoint"), "w") as fh:
            json.dump(lc, fh)
        return path

    def _checkpoint_v2(
        self,
        table: str,
        v: int,
        meta: dict,
        live: dict,
        txn: dict,
        dead: dict,
    ) -> str:
        """V2 SPEC checkpoint writer (PROTOCOL.md §v2-spec-checkpoints):
        FILE actions (add/remove) go to part-size-bounded sidecar
        parquets under ``_delta_log/_sidecars/``; the top-level
        manifest ``{v}.checkpoint.{uniqueId}.parquet`` carries
        protocol / metaData / txn / checkpointMetadata / sidecar rows.
        Every file lands before ``_last_checkpoint`` repoints (the
        publish-last discipline); unique ids are DETERMINISTIC uuid5 of
        (table, version, part) so a re-run overwrites its own files
        instead of littering. Write cost is bounded per sidecar part —
        the multi-part guarantee — while the manifest stays
        metadata-row-sized no matter how many live files exist."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        def _no_empty(val):
            if isinstance(val, dict):
                return {k: _no_empty(x) for k, x in val.items()} or None
            return val

        ldir = self._log_dir(table)
        sdir = os.path.join(ldir, _SIDECAR_DIR)
        os.makedirs(sdir, exist_ok=True)
        file_rows = [{"add": a} for _, a in sorted(live.items())]
        file_rows += [{"remove": r} for _, r in sorted(dead.items())]
        psize = max(1, int(self.checkpoint_part_size))
        fcols = ("add", "remove")
        arrow_files = [
            {c: _no_empty(r.get(c)) for c in fcols} for r in file_rows
        ]
        n_parts = max(1, (len(arrow_files) + psize - 1) // psize)
        fschema = pa.Table.from_pylist(
            arrow_files or [{c: None for c in fcols}]
        ).schema
        sidecar_rows = []
        for p in range(n_parts):
            chunk = arrow_files[p * psize : (p + 1) * psize]
            uid = str(
                uuid.uuid5(uuid.NAMESPACE_URL, f"cdl:{table}:{v}:side:{p}")
            )
            fname = f"{uid}.parquet"
            fpath = os.path.join(sdir, fname)
            pq.write_table(pa.Table.from_pylist(chunk, schema=fschema), fpath)
            st = os.stat(fpath)
            sidecar_rows.append(
                {
                    "sidecar": {
                        "path": fname,
                        "sizeInBytes": int(st.st_size),
                        "modificationTime": int(st.st_mtime * 1000),
                    }
                }
            )
        top_rows: list[dict] = [
            self._protocol_action(meta, live, force_v2ckpt=True),
            {"metaData": meta},
            {"checkpointMetadata": {"version": v, "tags": None}},
        ]
        top_rows += [
            {"txn": {"appId": k, "version": n}} for k, n in sorted(txn.items())
        ]
        top_rows += sidecar_rows
        tcols = ("protocol", "metaData", "txn", "checkpointMetadata", "sidecar")
        arrow_top = [{c: _no_empty(r.get(c)) for c in tcols} for r in top_rows]
        uid_top = str(uuid.uuid5(uuid.NAMESPACE_URL, f"cdl:{table}:{v}:top"))
        path = os.path.join(ldir, _CKPT_V2_FMT.format(v, uid_top))
        pq.write_table(pa.Table.from_pylist(arrow_top), path)
        lc = {"version": v, "size": len(arrow_top) + len(arrow_files)}
        with open(os.path.join(ldir, "_last_checkpoint"), "w") as fh:
            json.dump(lc, fh)
        return path

    # -- write path ---------------------------------------------------------
    def _claim_batch_dir(self, table: str, hint: str) -> str:
        """mkdir-claimed fresh directory for this write's data files
        (same claim-then-append discipline as Warehouse: names are
        never reused, Spark writes with mode=append into the claimed
        empty dir, so no overwrite window exists anywhere)."""
        n = 0
        base = f"batch-{hint}"
        while True:
            cand = base if n == 0 else f"{base}-{n}"
            try:
                os.makedirs(os.path.join(self._table_dir(table), cand))
                return cand
            except FileExistsError:
                n += 1

    def _write_files(
        self,
        table: str,
        df: DataFrame,
        hint: str,
        bucket: tuple[str, int] | None,
        mapping: dict[str, str] | None = None,
    ) -> tuple[list[dict], str, str]:
        """Write ``df``'s parquet under a claimed batch dir; return the
        ``add`` actions (relative paths, partitionValues from the
        directory layout), the schema JSON written, and the claimed
        batch dir's relative name.

        ``df`` arrives with LOGICAL column names; ``mapping`` (from
        ``_cm_mapping``) renames them to the table's stable PHYSICAL
        names just before the write — files always store physical
        names, readers always surface logical ones. The bucket key in
        ``bucket`` is logical (the bucket expression is bound before
        the rename)."""
        rel = self._claim_batch_dir(table, hint)
        out = os.path.join(self._table_dir(table), rel)

        def to_physical(frame: DataFrame) -> DataFrame:
            # simultaneous rename: a re-used logical name's map is
            # chain-shaped ({name_old -> name, name -> col-uuid}) and
            # withColumnsRenamed would collide mid-way
            return rename_simultaneous(
                frame,
                {lg: ph for lg, ph in (mapping or {}).items() if lg != ph},
            )

        if bucket is None:
            to_physical(df).write.mode("append").parquet(out)
            schema_json = df.schema.json()
        else:
            key, n = bucket
            with_b = df.withColumn(BUCKET_COL, bucket_of(F.col(key), n))
            to_physical(with_b).write.mode("append").partitionBy(
                BUCKET_COL
            ).parquet(out)
            schema_json = with_b.drop(BUCKET_COL).schema.json()
        adds = []
        tdir = self._table_dir(table)
        for dp, _, fs in os.walk(out):
            for f in sorted(fs):
                if not f.endswith(".parquet"):
                    continue
                full = os.path.join(dp, f)
                path = os.path.relpath(full, tdir)
                pv = {}
                for seg in os.path.relpath(dp, out).split(os.sep):
                    if "=" in seg:
                        k, _, val = seg.partition("=")
                        pv[k] = val
                adds.append(
                    {
                        "path": path,
                        "partitionValues": pv,
                        "size": os.path.getsize(full),
                        "modificationTime": int(os.path.getmtime(full) * 1000),
                        "dataChange": True,
                        "stats": _file_stats(full),
                    }
                )
        return adds, schema_json, rel

    # configuration keys owned by the engine (bucket routing), never
    # reported as user properties and always re-derived from the
    # ``bucket`` argument rather than carried forward
    _INTERNAL_CFG = ("spark_graft.bucket_key", "spark_graft.n_buckets")

    def _meta_action(
        self,
        schema_json: str,
        bucket: tuple[str, int] | None,
        existing: dict | None = None,
        props: dict | None = None,
    ) -> dict:
        key_cfg = {}
        if bucket is not None:
            # the bucket spec rides metaData.configuration so a merge
            # can recover (key, n) without a side channel; the physical
            # partition column is the standard partitionColumns entry
            key_cfg = {
                "spark_graft.bucket_key": bucket[0],
                "spark_graft.n_buckets": str(bucket[1]),
            }
        # user properties (TBLPROPERTIES) carry forward across commits
        # — Delta metaData replaces wholesale, so dropping them here
        # would silently unset properties on every write; ``props``
        # overlays on top, a None value unsetting the key (the same
        # merge rule as Warehouse._props_map, pinned by the contract
        # suite)
        cfg = _overlay_user_cfg(
            (existing or {}).get("configuration"), props, self._INTERNAL_CFG
        )
        return {
            "id": (existing or {}).get("id") or str(uuid.uuid4()),
            "name": None,
            "description": None,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json,
            "partitionColumns": [BUCKET_COL] if bucket is not None else [],
            "configuration": {**cfg, **key_cfg},
            "createdTime": (existing or {}).get("createdTime")
            or int(time.time() * 1000),
        }

    def _evolved_schema_string(
        self,
        old_meta: dict,
        target,
        renames: dict[str, str] | None,
    ) -> tuple[str, dict, dict[str, str] | None]:
        """Build the metaData pieces for an in-place schema evolution:
        (schemaString JSON, configuration updates, logical->physical
        mapping for the accompanying file writes).

        - Already-mapped table: every surviving field keeps its
          ``columnMapping.id`` + ``physicalName`` (a RENAME moves only
          the logical name); new fields get fresh ids and ``col-uuid``
          physical names, per the protocol's assignment rule.
        - Unmapped table + renames: UPGRADE to ``mode = name`` —
          existing fields' physicalName = their PRE-rename (on-disk)
          name so every already-written file stays readable; ids are
          assigned in field order.
        - Unmapped, no renames (pure ADD/WIDEN): stays unmapped; the
          schemaString alone evolves ({} config updates, None mapping).
        """
        renames = renames or {}
        old_sch = json.loads(old_meta["schemaString"])
        old_fields = {f["name"]: f for f in old_sch["fields"]}
        mapped = (old_meta.get("configuration") or {}).get(_CM_MODE) == "name"
        enable = mapped or bool(renames)
        inv = {new: old for old, new in renames.items()}
        max_id = int((old_meta.get("configuration") or {}).get(_CM_MAX_ID, 0))
        fields = []
        mapping: dict[str, str] = {}
        # name/type/nullable spellings straight from Spark's own JSON
        # (identical to Delta's schema serialization for flat types)
        target_json = json.loads(target.json())["fields"]
        for tf in target_json:
            old_name = inv.get(tf["name"], tf["name"])
            prev = old_fields.get(old_name)
            if (
                prev is not None
                and old_name in renames
                and renames[old_name] != tf["name"]
            ):
                # old_name was CONSUMED by a rename in this same
                # evolve (a -> a_old) and this field merely re-uses
                # the freed-up logical name: it is a brand-new column,
                # not the renamed one — without this, both fields
                # would inherit the same physicalName and the commit
                # would either die (COLUMN_ALREADY_EXISTS) or alias
                # old values into the new column on old files
                prev = None
            fmeta = dict((prev or {}).get("metadata") or {})
            if enable:
                if _CM_PHYS not in fmeta:
                    max_id += 1
                    fmeta[_CM_ID] = max_id
                    # physical name: for a field that already has data
                    # on disk, the name those files carry (its pre-
                    # rename logical name); for a brand-new field, a
                    # fresh opaque name
                    fmeta[_CM_PHYS] = (
                        old_name if prev is not None else f"col-{uuid.uuid4()}"
                    )
                mapping[tf["name"]] = fmeta[_CM_PHYS]
            fields.append({**tf, "metadata": fmeta})
        schema_json = json.dumps(
            {"type": "struct", "fields": fields}, separators=(",", ":")
        )
        cfg = {_CM_MODE: "name", _CM_MAX_ID: str(max_id)} if enable else {}
        return schema_json, cfg, (mapping if enable else None)

    def _v2_checkpoint_in_effect(self, table: str) -> bool:
        """True when the table's protocol must keep declaring the
        ``v2Checkpoint`` readerWriter feature: the warehouse writes V2
        spec checkpoints (``checkpoint_v2``), or the table's active
        ``_last_checkpoint`` names a V2 manifest a reader may still be
        replaying from. Cheap (one small-JSON read + one glob), called
        only on protocol-emitting commits."""
        if self.checkpoint_v2:
            return True
        lc = os.path.join(self._log_dir(table), "_last_checkpoint")
        try:
            with open(lc) as fh:
                data = json.load(fh)
            v = int(data["version"])
            if data.get("parts"):
                return False
        except (OSError, ValueError, KeyError):
            return False
        if os.path.isfile(os.path.join(self._log_dir(table), _CKPT_FMT.format(v))):
            return False
        import glob as _glob

        return bool(
            _glob.glob(
                os.path.join(self._log_dir(table), _CKPT_V2_FMT.format(v, "*"))
            )
        )

    def _protocol_action(
        self,
        meta: dict,
        live: dict,
        force_dv: bool = False,
        force_v2ckpt: bool = False,
        table: str | None = None,
    ) -> dict:
        """The protocol row matching the table's CURRENT feature set:
        base (1/2) when no feature is in play, else the table-
        features form with columnMapping / deletionVectors /
        v2Checkpoint. ``force_dv``: the commit being assembled ADDS
        deletion vectors (the pre-commit live set can't show them
        yet). ``force_v2ckpt``: the row is being written INTO a V2
        spec checkpoint manifest — the upstream spec gates V2-
        checkpoint handling on the ``v2Checkpoint`` readerWriter
        feature, so a spec-compliant external reader needs it declared
        whenever a V2 checkpoint exists (PROTOCOL.md §v2-checkpoint-
        table-feature). ``table``: pass it on every OTHER protocol-
        emitting commit (DV adds, newly-mapped columns, v1
        checkpoints) so that once a V2 checkpoint is in effect the
        feature stays declared — a later protocol row WITHOUT
        v2Checkpoint would regress the declaration below the feature
        the still-referenced checkpoint requires, which a strict
        external reader may reject (ADVICE r12)."""
        feats = []
        if (meta.get("configuration") or {}).get(_CM_MODE) == "name":
            feats.append("columnMapping")
        if force_dv or any(a.get("deletionVector") for a in live.values()):
            feats.append("deletionVectors")
        if force_v2ckpt or (
            table is not None and self._v2_checkpoint_in_effect(table)
        ):
            feats.append("v2Checkpoint")
        if not feats:
            return {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        return {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": feats,
                "writerFeatures": feats,
            }
        }

    def table_properties(self, table: str) -> dict:
        """User table properties at the head (SHOW TBLPROPERTIES):
        metaData.configuration minus the engine's bucket-routing keys.
        {} for a table with no commits (same leniency as
        last_txn_epoch and the manifest impl)."""
        try:
            _, meta, _, _, _ = self._replay(table)
        except FileNotFoundError:
            return {}
        return {
            k: v
            for k, v in (meta.get("configuration") or {}).items()
            if k not in self._INTERNAL_CFG
        }

    def table_id(self, table: str) -> str | None:
        """Stable table identity (``metaData.id``, minted at create and
        carried across commits): a drop + recreate yields a different
        id, which incremental consumers use to detect the
        version-number ABA (shared contract with Warehouse.table_id)."""
        try:
            _, meta, _, _, _ = self._replay(table)
        except FileNotFoundError:
            return None
        return meta.get("id")

    def rows_changed(self, table: str, v_from: int, v_to: int) -> bool | None:
        """Could any ROW differ between two versions? False only when
        every commit in (v_from, v_to] carries no action with
        ``dataChange`` true — the protocol's own marker (OPTIMIZE and
        metadata/txn-only commits qualify). Lets change-feed consumers
        advance their watermark across maintenance traffic without
        reading data. None = unknown (a commit file in the interval is
        gone): treat as changed. Shared contract with
        Warehouse.rows_changed."""
        if v_to <= v_from:
            return False
        ldir = self._log_dir(table)
        for v in range(v_from + 1, v_to + 1):
            path = os.path.join(ldir, _LOG_FMT.format(v))
            if not os.path.isfile(path):
                return None
            with open(path) as fh:
                for line in fh:
                    a = json.loads(line)
                    body = a.get("add") or a.get("remove")
                    if body is not None and body.get("dataChange", True):
                        return True
        return False

    def record_txn(
        self, table: str, app_id: str, epoch: int, max_retries: int = 5
    ) -> int:
        """Txn-action-only commit recording a writer epoch (data files
        untouched; every action is dataChange-free, so rows_changed
        stays False across it). Shared contract with
        Warehouse.record_txn."""
        for _ in range(1 + max_retries):
            base = self.current_version(table)
            if base < 0:
                raise FileNotFoundError(f"table not in warehouse: {table}")
            actions = [
                self._commit_info("TXN", {"appId": app_id, "epoch": epoch}),
                {"txn": {"appId": app_id, "version": epoch}},
            ]
            try:
                self._commit(table, base + 1, actions)
                return base + 1
            except CommitConflict:
                continue
        raise CommitConflict(
            f"{table}: record_txn lost the commit race {1 + max_retries} times"
        )

    def tables(self) -> list[str]:
        """All tables with a Delta log under this warehouse root (the
        catalog LIST; shared contract with Warehouse.tables)."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            n
            for n in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, n, "_delta_log"))
        )

    def set_properties(
        self, table: str, props: dict, max_retries: int = 5
    ) -> int:
        """Metadata-only commit updating table properties (ALTER TABLE
        SET/UNSET TBLPROPERTIES; None values unset). Emits only a new
        ``metaData`` action — no add/remove, data untouched — as a CAS
        at head+1 so a concurrent data commit wins and this re-derives.
        Returns the new head version."""
        from .constraints import validate_constraint_props

        validate_constraint_props(props)
        for _ in range(1 + max_retries):
            base, meta, _, _, _ = self._replay(table)
            new_meta = self._meta_action(
                meta["schemaString"],
                self._bucket_spec(meta),
                meta,
                props=props,
            )
            actions = [
                self._commit_info(
                    "SET TBLPROPERTIES",
                    {k: "<unset>" if v is None else v for k, v in props.items()},
                ),
                {"metaData": new_meta},
            ]
            try:
                self._commit(table, base + 1, actions)
                return base + 1
            except CommitConflict:
                continue
        raise CommitConflict(
            f"{table}: set_properties lost the commit race "
            f"{1 + max_retries} times"
        )

    @staticmethod
    def _commit_info(operation: str, params: dict | None = None) -> dict:
        """Protocol-standard commitInfo action (informational; readers
        must ignore unknown/extra actions, and both our replays do)."""
        return {
            "commitInfo": {
                "timestamp": int(time.time() * 1000),
                "operation": operation,
                "operationParameters": {
                    k: str(v) for k, v in (params or {}).items()
                },
                "engineInfo": "canvas-data-loader-spark/delta-writer",
            }
        }

    def write(
        self,
        table: str,
        df: DataFrame,
        snapshot: str = "w",
        bucket: tuple[str, int] | None = None,
        expected_version: int | None = None,
        txn: tuple[str, int] | None = None,
        max_retries: int = 5,
        props: dict | None = None,
        data_change: bool = True,
    ) -> str:
        """Full-snapshot replace (or create): add the new files, remove
        every previously-live file.

        ``expected_version``: commit version the caller derived from
        (``-1``/0-base create uses ``0`` semantics: pass ``-1`` to CAS
        the CREATE itself, mirroring Warehouse's CAS-at-commit-1).
        None = state-independent last-writer-wins; the remove-set is
        re-derived per attempt so the loser's retry tombstones exactly
        the winner's files.
        """
        # A full replace of a COLUMN-MAPPED table keeps the mapping:
        # the protocol forbids dropping mode=name once enabled, and
        # preserving each surviving column's id/physicalName keeps old
        # log versions and the new head mutually consistent. Same-name
        # columns reuse their mapping entry; new columns get fresh ids.
        cm_cfg: dict = {}
        mapping = None
        try:
            _, head_meta, _, _, _ = self._replay(table)
        except FileNotFoundError:
            head_meta = None
        # CHECK constraints gate every data-adding write against the
        # EFFECTIVE post-commit property set (carried configuration
        # overlaid with this write's ``props``) — a table cannot be
        # born (or become) constrained while already violating via
        # property smuggling. Reuses the head replay above (no extra
        # log read for unconstrained tables).
        from .constraints import (
            constraints_of,
            enforce_spark,
            validate_constraint_props,
        )

        validate_constraint_props(props)
        checked_cons = constraints_of(
            _overlay_user_cfg(
                (head_meta or {}).get("configuration"),
                props,
                self._INTERNAL_CFG,
            )
        )
        enforce_spark(df, checked_cons, table)
        if head_meta is not None and _cm_mapping(head_meta) is not None:
            schema_str, cm_cfg, mapping = self._evolved_schema_string(
                head_meta, df.schema, renames=None
            )
        else:
            schema_str = None
        adds, schema_json, rel = self._write_files(
            table, df, snapshot, bucket, mapping=mapping
        )
        if schema_str is not None:
            schema_json = schema_str
        for _attempt in range(1 + max_retries):
            if expected_version is not None:
                base = expected_version
            else:
                base = self.current_version(table)
            old_meta, old_live, old_txn = {}, {}, {}
            if base >= 0:
                _, old_meta, old_live, old_txn, _ = self._replay(table, upto=base)
            # a constraint ADDED while this write was running arrives
            # through the carried configuration: re-gate the batch
            # before this attempt commits it into the constrained
            # table (same rule as merge_bucketed's per-attempt check)
            cons_now = constraints_of(
                _overlay_user_cfg(
                    (old_meta or {}).get("configuration"),
                    props,
                    self._INTERNAL_CFG,
                )
            )
            if cons_now != checked_cons:
                enforce_spark(df, cons_now, table)
                checked_cons = cons_now
            now = int(time.time() * 1000)
            actions: list[dict] = [
                self._commit_info(
                    "CREATE TABLE AS SELECT" if base < 0 else "WRITE",
                    {"mode": "Overwrite"},
                )
            ]
            if base < 0:
                actions.append(
                    {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
                )
            actions.append(
                {
                    "metaData": self._meta_action(
                        schema_json,
                        bucket,
                        old_meta,
                        props={**cm_cfg, **(props or {})} if cm_cfg else props,
                    )
                }
            )
            if txn is not None:
                actions.append({"txn": {"appId": txn[0], "version": txn[1]}})
            actions += [
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": now,
                        "dataChange": data_change,
                    }
                }
                for p in sorted(old_live)
            ]
            actions += [
                {"add": {**a, "dataChange": data_change} if not data_change else a}
                for a in adds
            ]
            try:
                self._commit(table, base + 1, actions)
                return rel
            except CommitConflict:
                if expected_version is not None:
                    raise  # CAS mode: the caller re-derives
                # randomized backoff: lockstep re-collisions under
                # N-writer contention (same reasoning as merge_bucketed)
                import random

                time.sleep(
                    min(0.05 * (_attempt + 1), 0.5) * random.random()
                )
        raise CommitConflict(
            f"{table}: full-replace lost the commit race {1 + max_retries} times"
        )

    # -- read path ----------------------------------------------------------
    def _bucket_spec(self, meta: dict) -> tuple[str, int] | None:
        cfg = meta.get("configuration") or {}
        if "spark_graft.bucket_key" in cfg:
            return cfg["spark_graft.bucket_key"], int(cfg["spark_graft.n_buckets"])
        return None

    def is_bucketed(self, table: str) -> bool:
        try:
            _, meta, _, _, _ = self._replay(table)
        except FileNotFoundError:
            return False
        return self._bucket_spec(meta) is not None

    def _df_for(
        self,
        table: str,
        meta: dict,
        live: dict[str, dict],
        with_location: bool = False,
    ) -> DataFrame:
        from .dv import FILE_COL, POS_COL, apply_dv, decode_inline_dv, locate_columns

        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        # Column mapping: files store PHYSICAL names; read with the
        # physical twin of the declared schema, rename back to logical
        # after the scan. When the table is unmapped the two schemas
        # are identical and this is a no-op. Declaring the schema
        # explicitly (rather than inferring) also makes every read
        # conform older files to the head schema in one pass: files
        # written before an ADD null-pad the missing column, files
        # written before a WIDEN read through the parquet reader's
        # lossless type promotion (int family / float family).
        mapping = _cm_mapping(meta) or {}
        phys_schema = T.StructType(
            [
                T.StructField(mapping.get(f.name, f.name), f.dataType, True)
                for f in schema.fields
            ]
        )
        to_logical = {ph: lg for lg, ph in mapping.items() if lg != ph}
        # add actions carrying a deletionVector descriptor (merge-on-
        # read deletes): decode the inline bitmaps driver-side (their
        # total size is bounded by delete_where's inline cap) and
        # anti-join the (file, row-position) pairs out — broadcast,
        # no shuffle, same mechanism as the manifest warehouse
        dv_rows = [
            (p, int(pos))
            for p, a in live.items()
            if a.get("deletionVector")
            for pos in decode_inline_dv(a["deletionVector"])
        ]
        need_loc = with_location or bool(dv_rows)
        if not live:
            if with_location:
                schema = schema.add(FILE_COL, "string").add(POS_COL, "long")
            return self.spark.createDataFrame([], schema)
        tdir = self._table_dir(table)
        partitioned = bool(meta.get("partitionColumns"))
        if not partitioned:
            files = [os.path.join(tdir, p) for p in sorted(live)]
            out = self.spark.read.schema(phys_schema).parquet(*files)
            if need_loc:
                out = locate_columns(out, tdir)
        else:
            # group files by their batch dir so basePath recovers the
            # partition column from the path, then union
            part_schema = T.StructType(
                [*phys_schema.fields, T.StructField(BUCKET_COL, T.IntegerType())]
            )
            by_base: dict[str, list[str]] = {}
            for p in sorted(live):
                base = os.path.join(tdir, p.split(os.sep, 1)[0])
                by_base.setdefault(base, []).append(os.path.join(tdir, p))
            parts = []
            for b, fs in sorted(by_base.items()):
                part = (
                    self.spark.read.schema(part_schema)
                    .option("basePath", b)
                    .parquet(*fs)
                )
                if need_loc:
                    part = locate_columns(part, tdir)
                parts.append(part)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        if to_logical:
            # one simultaneous projection, NOT withColumnsRenamed: the
            # latter renames name-by-name, so a map like {name ->
            # name_old, col-uuid -> name} (rename + re-used logical
            # name) transiently creates two columns called name_old
            out = out.select(
                *[out[c].alias(to_logical.get(c, c)) for c in out.columns]
            )
        if dv_rows:
            dv_df = self.spark.createDataFrame(dv_rows, "file string, pos long")
            out = apply_dv(out, dv_df)
        if need_loc and not with_location:
            out = out.drop(FILE_COL, POS_COL)
        return out

    def read_versioned(self, table: str) -> tuple[int, DataFrame]:
        v, meta, live, _, _ = self._replay(table)
        df = self._df_for(table, meta, live)
        if meta.get("partitionColumns"):
            df = df.drop(*meta["partitionColumns"])
        return v, df

    def read(self, table: str) -> DataFrame:
        return self.read_versioned(table)[1]

    def read_at_version(self, table: str, version: int) -> DataFrame:
        """Time travel (Delta ``VERSION AS OF``): replay to ``version``.
        Raises FileNotFoundError if the version never existed or its
        files were vacuumed."""
        _, meta, live, _, _ = self._replay(table, upto=version)
        tdir = self._table_dir(table)
        missing = [p for p in live if not os.path.isfile(os.path.join(tdir, p))]
        if missing:
            raise FileNotFoundError(
                f"version {version} of {table!r} references vacuumed "
                f"files (e.g. {missing[0]!r})"
            )
        df = self._df_for(table, meta, live)
        if meta.get("partitionColumns"):
            df = df.drop(*meta["partitionColumns"])
        return df

    def version_at_timestamp(self, table: str, ts, strict: bool = False) -> int:
        """The commit AS OF a wall-clock time (shared contract with
        Warehouse.version_at_timestamp): greatest on-disk version whose
        commitInfo ``timestamp`` (ms — every commit path here writes
        one first) is at or before ``ts`` (STRICTLY before with
        ``strict=True`` — the feed-start spelling); commit-file mtime
        is the fallback for foreign commits without one. MAX qualifying
        version, monotone in version number."""
        from .pipeline import _to_epoch_seconds

        bound = _to_epoch_seconds(ts)
        versions = self._versions_on_disk(table)
        if not versions:
            raise FileNotFoundError(f"table not in delta warehouse: {table}")
        ldir = self._log_dir(table)
        best = None
        for v in versions:
            path = os.path.join(ldir, _LOG_FMT.format(v))
            t = None
            try:
                with open(path) as fh:
                    for line in fh:
                        if not line.strip():
                            continue
                        a = json.loads(line)
                        if "commitInfo" in a:
                            t = a["commitInfo"].get("timestamp")
                            if t is not None:
                                t = t / 1000.0
                            break
            except OSError:
                continue
            if t is None:
                try:
                    t = os.path.getmtime(path)
                except OSError:
                    continue
            if (t < bound) if strict else (t <= bound):
                best = v if best is None else max(best, v)
        if best is None:
            raise FileNotFoundError(
                f"no commit of {table!r} "
                f"{'before' if strict else 'at or before'} {ts!r} "
                f"(oldest: version {versions[0]})"
            )
        return best

    def read_at_timestamp(self, table: str, ts) -> DataFrame:
        """Time travel by WALL-CLOCK time (Delta TIMESTAMP AS OF)."""
        return self.read_at_version(
            table, self.version_at_timestamp(table, ts)
        )

    def last_txn_epoch(self, app_id: str, table: str) -> int:
        try:
            _, _, _, txn, _ = self._replay(table)
        except FileNotFoundError:
            return -1
        return txn.get(app_id, -1)

    # -- data skipping ------------------------------------------------------
    def files_for_range(
        self, table: str, col: str, lo=None, hi=None
    ) -> tuple[list[str], int]:
        """(relative paths of live files whose ``col`` [min,max] can
        intersect [lo,hi], total live files) — file-level data
        skipping off the add actions' stats, the scan optimization
        that matters at 100 TB: a time- or key-range query touches the
        files that can contain matches, not the table. Files without
        stats for ``col`` are conservatively kept."""
        from .stats import stats_disjoint

        _, meta, live, _, _ = self._replay(table)
        # add-action stats are keyed by the PHYSICAL column name (the
        # name in the file) — identical to the logical name except
        # under column mapping, where a renamed column's stats live
        # under its stable physical name in every era's files
        pcol = (_cm_mapping(meta) or {}).get(col, col)
        kept = [
            p
            for p, a in live.items()
            if not stats_disjoint(a.get("stats"), pcol, lo, hi)
        ]
        return sorted(kept), len(live)

    def read_where(self, table: str, col: str, lo=None, hi=None) -> DataFrame:
        """Range read with file-level data skipping: open only the
        files ``files_for_range`` keeps, then apply the residual
        filter (stats prune FILES; rows inside a kept file still need
        the predicate). Equivalent to read().filter(...), minus the
        skipped IO."""
        _, meta, live, _, _ = self._replay(table)
        kept, _total = self.files_for_range(table, col, lo, hi)
        sub = {p: live[p] for p in kept}
        df = self._df_for(table, meta, sub)
        if meta.get("partitionColumns"):
            df = df.drop(*meta["partitionColumns"])
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
        return df

    def routing_info(self, table: str) -> dict | None:
        """ONE-fetch routing snapshot for stream ingestion (shared
        spelling with Warehouse.routing_info): None if the table does
        not exist, else {"bucket_key": key-or-None, "txn": epoch map}
        from a single log replay."""
        try:
            _, meta, _, txn, _ = self._replay(table)
        except FileNotFoundError:
            return None
        spec = self._bucket_spec(meta)
        return {
            "bucket_key": spec[0] if spec else None,
            "n_buckets": spec[1] if spec else None,
            "txn": txn,
        }

    def external_read_sql(self, table: str, version: int | None = None) -> str:
        """DuckDB-runnable snapshot read straight off the data files the
        chosen commit references (files are immutable, so the statement
        is isolated from concurrent writers exactly like the manifest
        warehouse's). A DuckDB build with the delta extension could
        instead ``delta_scan`` the table root — this spelling needs
        only parquet."""
        from .dv import decode_inline_dv

        _, meta, live, _, _ = self._replay(table, upto=version)
        tdir = self._table_dir(table)
        files = []
        for p in sorted(live):
            full = os.path.join(tdir, p)
            if not os.path.isfile(full):
                raise FileNotFoundError(
                    f"{table!r} v{version}: file vacuumed: {p!r}"
                )
            files.append("'" + full.replace("'", "''") + "'")
        if not files:
            raise FileNotFoundError(
                f"delta table {table!r} has no data files to read externally"
            )
        # live deletion vectors: inline the (absolute file, position)
        # pairs as a VALUES anti-join — bounded by the inline-DV cap,
        # and the positions are already decoded driver-side anyway
        dv_values = [
            (os.path.join(tdir, p), pos)
            for p, a in sorted(live.items())
            if a.get("deletionVector")
            for pos in decode_inline_dv(a["deletionVector"])
        ]
        if len(dv_values) > 200_000:
            raise ValueError(
                f"{table!r} carries {len(dv_values)} inline-DV deleted "
                "positions — too many to inline in a portable SQL "
                "statement; compact() the table to materialize them first"
            )
        src = (
            "read_parquet([" + ", ".join(files) + "], "
            "hive_partitioning=false, union_by_name=true"
            + (", filename=true, file_row_number=true" if dv_values else "")
            + ")"
        )
        # Schema-pinned projection off schemaString, exactly like the
        # manifest impl's: declared order and types regardless of file
        # era (pre-ADD files null-pad via union_by_name, pre-WIDEN
        # files CAST up), and — under column mapping — the stored
        # PHYSICAL name aliased back to the logical one. Physical
        # names absent from every referenced file (an added column no
        # live file carries yet) fall back to typed NULL rather than a
        # binder error.
        from pyspark.sql import types as T

        from .pipeline import _duckdb_type

        mapping = _cm_mapping(meta) or {}
        target = T.StructType.fromJson(json.loads(meta["schemaString"]))
        available: set[str] = set()
        import pyarrow.parquet as pq

        # one footer per batch dir (files within a batch share one
        # write's schema), same metadata-only sampling discipline as
        # Warehouse._sampled_columns
        seen_batches: set[str] = set()
        for p in sorted(live):
            batch = p.split(os.sep, 1)[0]
            if batch in seen_batches:
                continue
            seen_batches.add(batch)
            try:
                available |= set(
                    pq.read_schema(os.path.join(tdir, p)).names
                )
            except OSError:
                pass
        exprs = []
        for f in target.fields:
            phys = mapping.get(f.name, f.name)
            duck_t = _duckdb_type(f.dataType)
            qname = '"' + f.name.replace('"', '""') + '"'
            if phys not in available:
                expr = f"CAST(NULL AS {duck_t or 'VARCHAR'})"
            else:
                qphys = '"' + phys.replace('"', '""') + '"'
                expr = f"CAST({qphys} AS {duck_t})" if duck_t else qphys
            exprs.append(f"{expr} AS {qname}")
        proj = ", ".join(exprs)
        if not dv_values:
            return f"SELECT {proj} FROM {src}"
        vals = ", ".join(
            "('" + f.replace("'", "''") + "', " + str(int(pos)) + ")"
            for f, pos in dv_values
        )
        return (
            f"SELECT {proj} FROM {src} r "
            f"WHERE NOT EXISTS (SELECT 1 FROM (VALUES {vals}) d(file, pos) "
            "WHERE d.file = r.filename AND d.pos = r.file_row_number)"
        )

    # -- merge --------------------------------------------------------------
    def merge_bucketed(
        self,
        table: str,
        new: DataFrame,
        snapshot: str = "m",
        broadcast_keys: bool = True,
        max_commit_retries: int = 5,
        txn: tuple[str, int] | None = None,
        observation=None,
        evolve: bool = False,
        renames: dict[str, str] | None = None,
        delete_keys: DataFrame | None = None,
    ) -> list[int]:
        """Partition-pruned keyed upsert — the Delta MERGE shape: only
        files in buckets the batch's keys hash to are read, rewritten,
        and tombstoned; every other live file is untouched (not even
        mentioned in the commit, which is what makes the commit size
        O(affected), not O(table)). CAS at base+1; on conflict the
        whole merge re-derives against the new head.

        ``evolve=True`` applies in-place schema evolution for the
        three data-preserving classes — ADD (null-padded on old
        files), WIDEN (int/float-family lossless promotion), and
        declared RENAME via ``renames`` (old -> new name), carried by
        the protocol's COLUMN MAPPING (mode=name: stable physical
        names in field metadata; a rename edits only schemaString, no
        file is rewritten). A non-widenable change still raises
        SchemaEvolutionError so the pipeline's shared fallback (full
        reload with the new schema — the reference behavior,
        src/main.rs:188-193) engages. ``observation``: attached to the
        first attempt's merged frame, same contract as Warehouse.
        ``delete_keys``: key rows to REMOVE in the same atomic commit
        (the CDC apply — upserts + deletes, one commit, exactly-once
        under ``txn``; a key in both frames lands on the upsert)."""
        from ..operators.merge import SchemaEvolutionError, conform_to, evolved_schema
        from .constraints import constraints_of, enforce_spark, guard_renames

        checked_cons: dict | None = None
        for attempt in range(1 + max_commit_retries):
            base, meta, live, head_txn, _ = self._replay(table)
            spec = self._bucket_spec(meta)
            if spec is None:
                raise FileNotFoundError(f"table not bucketed: {table}")
            if txn is not None and head_txn.get(txn[0], -1) >= int(txn[1]):
                # this epoch (or newer) already folded into the log — a
                # replay or split-brain race; re-publishing the stale
                # batch's buckets would overwrite newer data (same rule
                # as the manifest impl's head-epoch check)
                return []
            old_key, n = spec
            # a declared rename may cover the bucket key itself: the
            # VALUES (and thus xxhash64 buckets) are unchanged, only
            # the recorded key name moves forward (same rule as the
            # manifest impl)
            key = (renames or {}).get(old_key, old_key) if evolve else old_key
            new_b = new.withColumn(BUCKET_COL, bucket_of(F.col(key), n))
            touched = new_b.select(BUCKET_COL)
            if delete_keys is not None:
                touched = touched.unionByName(
                    delete_keys.select(
                        bucket_of(F.col(key), n).alias(BUCKET_COL)
                    )
                )
            affected = sorted(
                int(r[BUCKET_COL]) for r in touched.distinct().collect()
            )
            wanted = {str(b) for b in affected}
            old_paths = [
                p
                for p, a in live.items()
                if a.get("partitionValues", {}).get(BUCKET_COL) in wanted
            ]
            sub_live = {p: live[p] for p in old_paths}
            old = self._df_for(table, meta, sub_live)
            if not old_paths:
                # no existing rows in these buckets: schema-only frame
                from pyspark.sql import types as T

                schema = T.StructType.fromJson(
                    json.loads(meta["schemaString"])
                ).add(BUCKET_COL, "integer")
                old = self.spark.createDataFrame([], schema)
            mapping = _cm_mapping(meta)
            meta_actions: list[dict] = []
            if evolve:
                from pyspark.sql import types as T

                if renames:
                    old = rename_simultaneous(old, renames)
                target = evolved_schema(old.schema, new_b.schema)
                old_kt = old.schema[key].dataType
                new_kt = new_b.schema[key].dataType
                if old_kt != new_kt:
                    raise SchemaEvolutionError(
                        f"bucket key {key!r} type change "
                        f"({old_kt.simpleString()} -> "
                        f"{new_kt.simpleString()}): xxhash64 buckets by "
                        "physical type, so existing rows would no longer "
                        "co-locate with new ones — re-bucket via full reload"
                    )
                data_target = T.StructType(
                    [f for f in target.fields if f.name != BUCKET_COL]
                )
                declared = T.StructType.fromJson(
                    json.loads(meta["schemaString"])
                )
                shape = lambda st: [(f.name, f.dataType) for f in st.fields]  # noqa: E731
                # frames conform to the target WHENEVER they differ
                # from it — a SUBSET batch (fewer columns, no adds, no
                # renames) leaves the declared schema untouched but
                # still needs its missing columns null-padded, or the
                # union/select below (and the constraint gate) would
                # die unresolved; the manifest impl conforms
                # unconditionally, and the two must agree
                if shape(new_b.schema) != shape(target):
                    new_b = conform_to(new_b, target)
                if shape(old.schema) != shape(target):
                    old = conform_to(old, target)
                if renames or shape(data_target) != shape(declared):
                    schema_json, cm_cfg, mapping = self._evolved_schema_string(
                        meta, data_target, renames
                    )
                    newly_mapped = (
                        cm_cfg
                        and (meta.get("configuration") or {}).get(_CM_MODE)
                        != "name"
                    )
                    new_meta = self._meta_action(
                        schema_json, (key, n), meta, props=cm_cfg or None
                    )
                    if newly_mapped:
                        meta_actions.append(
                            self._protocol_action(
                                new_meta, live, table=table
                            )
                        )
                    meta_actions.append({"metaData": new_meta})
            # CHECK constraints gate the batch POST-conform (an evolve
            # batch missing a constrained column is null-padded — NULL
            # passes, per SQL CHECK) and AFTER the epoch skip above (a
            # replayed batch is a contracted no-op, never an error).
            # Re-checked only when the constraint SET changed between
            # CAS attempts (a concurrent ADD CONSTRAINT must gate the
            # batch that commits after it). Same rules as the manifest
            # impl.
            cons = constraints_of(meta.get("configuration") or {})
            if evolve and renames:
                guard_renames(cons, renames, table)
            if cons != checked_cons:
                enforce_spark(new_b.drop(BUCKET_COL), cons, table)
                checked_cons = cons
            keys = new_b.select(key)
            if delete_keys is not None:
                keys = keys.unionByName(delete_keys.select(key))
            keys = keys.distinct()
            if broadcast_keys:
                keys = F.broadcast(keys)
            merged = old.join(keys, on=key, how="left_anti").unionByName(
                new_b.select(old.columns)
            )
            if observation is not None and attempt == 0:
                merged = merged.observe(
                    observation, F.count(F.lit(1)).alias("rows")
                )
            adds, _schema_json, _rel = self._write_files(
                table,
                merged.drop(BUCKET_COL),
                f"{snapshot}-{attempt}" if attempt else snapshot,
                bucket=(key, n),
                mapping=mapping,
            )
            now = int(time.time() * 1000)
            actions: list[dict] = [
                self._commit_info(
                    "MERGE", {"affectedBuckets": len(affected)}
                ),
                *meta_actions,
            ]
            if txn is not None:
                actions.append({"txn": {"appId": txn[0], "version": txn[1]}})
            actions += [
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": now,
                        "dataChange": True,
                    }
                }
                for p in sorted(old_paths)
            ]
            actions += [{"add": a} for a in adds]
            try:
                self._commit(table, base + 1, actions)
                return affected
            except CommitConflict:
                # LOGICAL CONFLICT DETECTION (the Delta winning-commit
                # reconciliation shape): when every intervening commit
                # touched only buckets DISJOINT from ours, the derived
                # files are exactly as valid against the new head —
                # re-publish them directly instead of re-reading and
                # re-writing the buckets. Physical conflicts (same
                # bucket, compaction, restore, schema/property change)
                # fall through to the full re-derive.
                if (
                    self._reconcile_merge_commit(table, base, affected, actions)
                    is not None
                ):
                    return affected
                # orphaned batch dir is vacuum-swept later; randomized
                # backoff desynchronizes lockstep re-collisions (same
                # reasoning as Warehouse.merge_bucketed)
                import random

                time.sleep(min(0.05 * (attempt + 1), 0.5) * random.random())
                continue
        raise CommitConflict(
            f"{table}: merge lost the commit race {1 + max_commit_retries} "
            "times — contention too high, back off and retry"
        )

    def _reconcile_merge_commit(
        self,
        table: str,
        base_version: int,
        affected: list[int],
        actions: list[dict],
        max_attempts: int = 5,
    ) -> int | None:
        """CAS-loss reconciliation for a bucketed MERGE: if every
        action in the commits between our base and the current head is
        bucket-disjoint from ``affected`` (and none is a metaData /
        unknown action), our already-written files and action list are
        still exactly correct — re-commit them at head+1 with a fresh
        commitInfo. Returns the committed version, or None when the
        conflict is physical (overlapping bucket, compaction/restore
        repointing, schema or property change) and the caller must
        re-derive. At hourly imports × auto-compaction × MV refresh ×
        mirror sync this is what keeps disjoint writers from
        serializing through wasted re-derives."""
        import re

        aff = {int(b) for b in affected}
        tail = [a for a in actions if "commitInfo" not in a]
        if any("protocol" in a or "metaData" in a for a in tail):
            # our tail was assembled against BASE's live state: a
            # verbatim re-commit of its protocol row would last-wins
            # downgrade a feature gate an intervening commit added
            # (e.g. a disjoint delete_where enabling deletionVectors),
            # and a metaData row may be stale the same way — re-derive
            return None
        # our own epoch claims: an intervening commit recording the
        # SAME app at an equal-or-newer version means this merge is a
        # replay / split-brain loser, not a disjoint writer
        own_txn = {
            a["txn"]["appId"]: int(a["txn"]["version"])
            for a in tail
            if "txn" in a
        }

        def bucket_of_path(p: str) -> int | None:
            mt = re.search(rf"(?:^|/){re.escape(BUCKET_COL)}=(\d+)/", p)
            return int(mt.group(1)) if mt else None

        for _ in range(max_attempts):
            head = self.current_version(table)
            if head <= base_version:
                return None
            ldir = self._log_dir(table)
            for v in range(base_version + 1, head + 1):
                try:
                    with open(os.path.join(ldir, _LOG_FMT.format(v))) as fh:
                        lines = [ln for ln in fh if ln.strip()]
                except OSError:
                    return None
                for ln in lines:
                    a = json.loads(ln)
                    if "txn" in a:
                        t = a["txn"]
                        if (
                            t["appId"] in own_txn
                            and int(t["version"]) >= own_txn[t["appId"]]
                        ):
                            # epoch conflict: the winner already
                            # recorded our app at >= our version —
                            # re-derive (the merge loop's head-epoch
                            # check then skips the stale batch)
                            return None
                        continue  # other apps' epochs: informational
                    if "commitInfo" in a or "protocol" in a:
                        # informational / feature-gate rows never
                        # invalidate a disjoint merge
                        continue
                    if "metaData" in a:
                        # schema, bucket spec, or properties moved —
                        # our (possibly evolve-derived) metadata and
                        # conformed frames may be stale: re-derive
                        return None
                    act = a.get("add") or a.get("remove")
                    if act is None:
                        return None  # unknown action: conservative
                    pv = (a.get("add") or {}).get("partitionValues") or {}
                    b = (
                        int(pv[BUCKET_COL])
                        if pv.get(BUCKET_COL) is not None
                        else bucket_of_path(act.get("path", ""))
                    )
                    if b is None or b in aff:
                        return None
            fresh = [
                self._commit_info(
                    "MERGE",
                    {"affectedBuckets": len(affected), "reconciled": True},
                ),
                *tail,
            ]
            try:
                self._commit(table, head + 1, fresh)
                return head + 1
            except CommitConflict:
                continue  # another winner landed: re-check against it
        return None

    # -- row-level delete ----------------------------------------------------
    # protocol feature gate for deletion vectors (PROTOCOL.md: DV
    # tables require reader 3 / writer 7 with the named feature) —
    # emitted via _protocol_action(force_dv=True) so a mapped table's
    # columnMapping feature rides the same protocol row

    def delete_where(
        self,
        table: str,
        condition,
        mode: str = "auto",
        dv_max_fraction: float = 0.2,
        txn: tuple[str, int] | None = None,
        max_commit_retries: int = 5,
        dv_inline_max_rows: int = 100_000,
    ) -> int:
        """Row-level DELETE with the same surface and semantics as
        ``Warehouse.delete_where`` (the shared contract suite pins the
        two), expressed in Delta protocol actions:

        - merge-on-read (``mor``): each affected file's ``add`` action
          is re-committed (remove + add of the same path) carrying a
          ``deletionVector`` descriptor — inline storage, Base85-
          encoded RoaringBitmapArray (plans/dv.py). No data file is
          rewritten; the commit is O(deleted positions). The first DV
          commit also emits the protocol upgrade the spec requires
          (reader 3 / writer 7 + the deletionVectors feature).
        - copy-on-write (``cow``): FILE-granular rewrite — only files
          containing matches are tombstoned and rewritten without the
          matching rows (the manifest impl's granularity is the
          bucket; files are this impl's unit of backing identity).
        - ``auto``: mor while the matched fraction stays within
          ``dv_max_fraction`` AND the positions fit the inline cap
          (``dv_inline_max_rows`` — inline DVs ride the commit JSON,
          so they must stay log-line-sized; a delete too big to
          inline is by definition dense enough to rewrite).

        Returns the number of rows deleted."""
        if mode not in ("auto", "mor", "cow"):
            raise ValueError(f"delete_where mode {mode!r}")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        keep_cond = ~F.coalesce(cond.cast("boolean"), F.lit(False))
        from .dv import FILE_COL, POS_COL, merge_inline_dv

        for attempt in range(1 + max_commit_retries):
            base, meta, live, _, _ = self._replay(table)
            located = self._df_for(table, meta, live, with_location=True)
            matched = located.filter(cond).localCheckpoint(eager=True)
            n_deleted = matched.count()
            if n_deleted == 0:
                return 0
            # the cap bounds the CUMULATIVE live DV set (readers
            # broadcast it), not just this commit's contribution
            dv_after = n_deleted + sum(
                int(a["deletionVector"].get("cardinality", 0))
                for a in live.values()
                if a.get("deletionVector")
            )
            chosen = mode
            if mode == "auto":
                total = self._approx_live_rows(live)
                if total is None:
                    total = located.count()
                chosen = (
                    "mor"
                    if total
                    and n_deleted / total <= dv_max_fraction
                    and dv_after <= dv_inline_max_rows
                    else "cow"
                )
            if chosen == "mor" and dv_after > dv_inline_max_rows:
                raise ValueError(
                    f"live deletion vectors would reach {dv_after} "
                    f"positions (cap {dv_inline_max_rows}): compact() to "
                    "materialize the backlog, or use mode='cow' (or "
                    "'auto')"
                )
            now = int(time.time() * 1000)
            actions: list[dict] = [
                self._commit_info("DELETE", {"mode": chosen})
            ]
            if txn is not None:
                actions.append({"txn": {"appId": txn[0], "version": txn[1]}})
            if chosen == "mor":
                by_file: dict[str, list[int]] = {}
                for r in matched.select(FILE_COL, POS_COL).collect():
                    by_file.setdefault(r[0], []).append(int(r[1]))
                # idempotent protocol upgrade rides every DV commit
                # (later protocol actions replace earlier ones)
                actions.insert(
                    1,
                    self._protocol_action(
                        meta, live, force_dv=True, table=table
                    ),
                )
                for p in sorted(by_file):
                    old_add = live[p]
                    actions.append(
                        {
                            "remove": {
                                "path": p,
                                "deletionTimestamp": now,
                                "dataChange": True,
                            }
                        }
                    )
                    actions.append(
                        {
                            "add": {
                                **old_add,
                                "deletionVector": merge_inline_dv(
                                    old_add.get("deletionVector"),
                                    by_file[p],
                                ),
                                "dataChange": True,
                            }
                        }
                    )
            else:
                affected = sorted(
                    r[0]
                    for r in matched.select(FILE_COL).distinct().collect()
                )
                sub_live = {p: live[p] for p in affected}
                kept = self._df_for(table, meta, sub_live).filter(keep_cond)
                spec = self._bucket_spec(meta)
                if spec is not None:
                    kept = kept.drop(BUCKET_COL)
                adds, _sj, _rel = self._write_files(
                    table,
                    kept,
                    f"delete-cow-{attempt}" if attempt else "delete-cow",
                    bucket=spec,
                    mapping=_cm_mapping(meta),
                )
                actions += [
                    {
                        "remove": {
                            "path": p,
                            "deletionTimestamp": now,
                            "dataChange": True,
                        }
                    }
                    for p in affected
                ]
                actions += [{"add": a} for a in adds]
            try:
                self._commit(table, base + 1, actions)
                return n_deleted
            except CommitConflict:
                import random

                time.sleep(min(0.05 * (attempt + 1), 0.5) * random.random())
                continue
        raise CommitConflict(
            f"{table}: delete lost the commit race {1 + max_commit_retries} "
            "times — contention too high, back off and retry"
        )

    def update_where(
        self,
        table: str,
        set_map: dict,
        condition,
        mode: str = "auto",
        dv_max_fraction: float = 0.2,
        txn: tuple[str, int] | None = None,
        max_commit_retries: int = 5,
        dv_inline_max_rows: int = 100_000,
    ) -> int:
        """Predicate UPDATE (``UPDATE t SET ... WHERE ...``) — with the
        keyed MERGE this completes the DML triad the reference spells
        as one DELETE + one INSERT per row (src/importer.rs:363-389).

        ``set_map``: column -> new-value expression (SQL string or
        Column), evaluated against the OLD row — all assignments see
        pre-update values simultaneously, standard SQL UPDATE
        semantics. The bucket key cannot be updated (its value routes
        the row's bucket; changing it is a delete+insert, i.e. a
        MERGE).

        - merge-on-read (``mor``): ONE commit carrying a deletion
          vector on each matched file's old positions PLUS new data
          files with the updated rows — O(updated) written, no
          matched file rewritten.
        - copy-on-write (``cow``): FILE-granular rewrite of matched
          files with the assignments applied.
        - ``auto``: mor within ``dv_max_fraction`` and the inline cap,
          else cow.

        Returns the number of rows updated."""
        if mode not in ("auto", "mor", "cow"):
            raise ValueError(f"update_where mode {mode!r}")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        keep_cond = ~F.coalesce(cond.cast("boolean"), F.lit(False))
        assigns = {
            c: (F.expr(e) if isinstance(e, str) else e)
            for c, e in set_map.items()
        }
        from .dv import FILE_COL, POS_COL, merge_inline_dv

        for attempt in range(1 + max_commit_retries):
            base, meta, live, _, _ = self._replay(table)
            spec = self._bucket_spec(meta)
            if spec is not None and spec[0] in assigns:
                raise ValueError(
                    f"update of bucket key {spec[0]!r} would re-route rows "
                    "across buckets — that is a delete+insert; use the "
                    "keyed MERGE instead"
                )
            bad = [c for c in assigns if c == BUCKET_COL]
            if bad:
                raise ValueError(f"cannot update internal column {bad}")
            # validate BEFORE writing anything: withColumns silently
            # ADDS an unknown assignment column, and a committed
            # extra-column file bricks every later read of a bucketed
            # table (NUM_COLUMNS_MISMATCH on the part union)
            from pyspark.sql import types as T

            table_cols = set(
                T.StructType.fromJson(
                    json.loads(meta["schemaString"])
                ).names
            )
            unknown = sorted(set(assigns) - table_cols)
            if unknown:
                raise ValueError(
                    f"update_where assignments reference columns not in "
                    f"{table!r}: {unknown} (have: {sorted(table_cols)})"
                )
            located = self._df_for(table, meta, live, with_location=True)
            matched = located.filter(cond).localCheckpoint(eager=True)
            n_updated = matched.count()
            if n_updated == 0:
                return 0
            dv_after = n_updated + sum(
                int(a["deletionVector"].get("cardinality", 0))
                for a in live.values()
                if a.get("deletionVector")
            )
            chosen = mode
            if mode == "auto":
                total = self._approx_live_rows(live)
                if total is None:
                    total = located.count()
                chosen = (
                    "mor"
                    if total
                    and n_updated / total <= dv_max_fraction
                    and dv_after <= dv_inline_max_rows
                    else "cow"
                )
            if chosen == "mor" and dv_after > dv_inline_max_rows:
                raise ValueError(
                    f"live deletion vectors would reach {dv_after} "
                    f"positions (cap {dv_inline_max_rows}): compact() to "
                    "materialize the backlog, or use mode='cow' (or "
                    "'auto')"
                )
            # assignments see OLD values: withColumns applies the full
            # map against the pre-update row in one projection
            updated = matched.withColumns(assigns).drop(FILE_COL, POS_COL)
            if BUCKET_COL in updated.columns:
                updated = updated.drop(BUCKET_COL)
            from .constraints import constraints_of, enforce_spark

            enforce_spark(
                updated,
                constraints_of(meta.get("configuration") or {}),
                table,
            )
            now = int(time.time() * 1000)
            actions: list[dict] = [
                self._commit_info("UPDATE", {"mode": chosen})
            ]
            if txn is not None:
                actions.append({"txn": {"appId": txn[0], "version": txn[1]}})
            if chosen == "mor":
                by_file: dict[str, list[int]] = {}
                for r in matched.select(FILE_COL, POS_COL).collect():
                    by_file.setdefault(r[0], []).append(int(r[1]))
                actions.insert(
                    1,
                    self._protocol_action(
                        meta, live, force_dv=True, table=table
                    ),
                )
                for p in sorted(by_file):
                    old_add = live[p]
                    actions.append(
                        {
                            "remove": {
                                "path": p,
                                "deletionTimestamp": now,
                                "dataChange": True,
                            }
                        }
                    )
                    actions.append(
                        {
                            "add": {
                                **old_add,
                                "deletionVector": merge_inline_dv(
                                    old_add.get("deletionVector"),
                                    by_file[p],
                                ),
                                "dataChange": True,
                            }
                        }
                    )
                adds, _sj, _rel = self._write_files(
                    table,
                    updated,
                    f"update-{attempt}" if attempt else "update",
                    bucket=spec,
                    mapping=_cm_mapping(meta),
                )
                actions += [{"add": a} for a in adds]
            else:
                affected = sorted(
                    r[0]
                    for r in matched.select(FILE_COL).distinct().collect()
                )
                sub_live = {p: live[p] for p in affected}
                src = self._df_for(table, meta, sub_live)
                if spec is not None:
                    src = src.drop(BUCKET_COL)
                rewritten = src.filter(keep_cond).unionByName(updated)
                adds, _sj, _rel = self._write_files(
                    table,
                    rewritten,
                    f"update-cow-{attempt}" if attempt else "update-cow",
                    bucket=spec,
                    mapping=_cm_mapping(meta),
                )
                actions += [
                    {
                        "remove": {
                            "path": p,
                            "deletionTimestamp": now,
                            "dataChange": True,
                        }
                    }
                    for p in affected
                ]
                actions += [{"add": a} for a in adds]
            try:
                self._commit(table, base + 1, actions)
                return n_updated
            except CommitConflict:
                import random

                time.sleep(min(0.05 * (attempt + 1), 0.5) * random.random())
                continue
        raise CommitConflict(
            f"{table}: update lost the commit race {1 + max_commit_retries} "
            "times — contention too high, back off and retry"
        )

    def dv_stats(self, table: str) -> dict:
        """Deletion-vector load at the head (shared spelling with
        Warehouse.dv_stats): {positions, entries, fraction} from the
        live adds' descriptors — exact, since dead adds' DVs leave the
        state with their files."""
        try:
            _, _, live, _, _ = self._replay(table)
        except FileNotFoundError:
            return {"positions": 0, "entries": 0, "fraction": None}
        dvs = [a["deletionVector"] for a in live.values()
               if a.get("deletionVector")]
        positions = sum(int(d.get("cardinality", 0)) for d in dvs)
        out = {"positions": positions, "entries": len(dvs),
               "fraction": None}
        if positions:
            rows = self._approx_live_rows(live)
            if rows:
                # _approx_live_rows already subtracts DV cardinality
                out["fraction"] = positions / (positions + rows)
        return out

    @staticmethod
    def _approx_live_rows(live: dict[str, dict]) -> int | None:
        """Live row count from the add actions' stats minus recorded
        DV cardinalities — metadata only; None when any file lacks
        stats (caller falls back to a count)."""
        total = 0
        for a in live.values():
            st = a.get("stats")
            if not st:
                return None
            try:
                total += int(json.loads(st)["numRecords"])
            except (ValueError, KeyError, TypeError):
                return None
            dv = a.get("deletionVector")
            if dv:
                total -= int(dv.get("cardinality", 0))
        return total

    # -- maintenance --------------------------------------------------------
    def live_file_count(self, table: str) -> int:
        """Live (non-tombstoned) data files at the head — the
        fragmentation signal auto-compaction triggers on."""
        try:
            _, _, live, _, _ = self._replay(table)
        except FileNotFoundError:
            return 0
        return len(live)

    def compact(
        self,
        table: str,
        target_bytes: int = 128 * 1024 * 1024,
        order_by: list[str] | None = None,
        zorder: bool = False,
    ) -> int:
        """OPTIMIZE: rewrite the live file set into ~target-size files
        (per bucket for partitioned tables — one file per non-empty
        bucket). dataChange=false semantics: the commit replaces files
        without changing rows, CAS'd against the commit it read so a
        concurrent merge always wins over a compaction.

        ``order_by`` clusters the rewrite (OPTIMIZE ... ZORDER done as
        range-clustering, same contract as Warehouse.compact):
        unbucketed tables get disjoint per-file value ranges so the
        add-action stats skip to ~1 file per range predicate; bucketed
        tables keep their layout and sort within each bucket file.
        ``zorder=True`` interleaves the listed columns' quantile ranks
        (plans/cluster.py) so skipping works on every listed column,
        not just the first."""
        for _ in range(6):
            base, meta, live, _, _ = self._replay(table)
            spec = self._bucket_spec(meta)
            df = self._df_for(table, meta, live)
            if spec is not None:
                key, n = spec
                flat = df.drop(BUCKET_COL)
                df = flat.repartition(n, bucket_of(F.col(key), n))
                if order_by and zorder:
                    from .cluster import zorder_value

                    df = (
                        df.withColumn("__cdl_z", zorder_value(flat, order_by))
                        .sortWithinPartitions("__cdl_z")
                        .drop("__cdl_z")
                    )
                elif order_by:
                    df = df.sortWithinPartitions(*order_by)
                adds, _sj, _rel = self._write_files(
                    table, df, "compact", bucket=(key, n),
                    mapping=_cm_mapping(meta),
                )
            else:
                total = sum(a.get("size", 0) for a in live.values())
                n_files = max(1, math.ceil(total / target_bytes))
                if order_by:
                    from .cluster import cluster_for_write

                    df = cluster_for_write(df, order_by, n_files, zorder)
                else:
                    df = df.repartition(n_files)
                adds, _sj, _rel = self._write_files(
                    table, df, "compact", bucket=None,
                    mapping=_cm_mapping(meta),
                )
            now = int(time.time() * 1000)
            actions = [self._commit_info("OPTIMIZE", {"files": len(adds)})] + [
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": now,
                        "dataChange": False,
                    }
                }
                for p in sorted(live)
            ]
            actions += [
                {"add": {**a, "dataChange": False}} for a in adds
            ]
            try:
                self._commit(table, base + 1, actions)
                return len(adds)
            except CommitConflict:
                continue
        raise CommitConflict(
            f"{table}: compaction lost the commit race 6 times — "
            "run it in a quieter window"
        )

    def vacuum(self, table: str, retention_sec: float | None = None) -> int:
        """Physically delete tombstoned files older than the retention
        window, plus batch dirs no action ever referenced (crashed
        writers) older than the same window. Time-travel to versions
        whose files are vacuumed then raises — Delta's documented
        trade. Returns the number of files deleted."""
        retention = (
            self.vacuum_retention_sec if retention_sec is None else retention_sec
        )
        horizon_ms = (time.time() - retention) * 1000
        _, _, live, _, dead = self._replay(table)
        tdir = self._table_dir(table)
        deleted = 0
        for p, r in dead.items():
            if r.get("deletionTimestamp", 0) <= horizon_ms:
                full = os.path.join(tdir, p)
                if os.path.isfile(full):
                    os.remove(full)
                    deleted += 1
        # crash-leaked commit temp files (.tmp-*, from the link-based
        # put-if-absent) older than the window
        ldir = self._log_dir(table)
        if os.path.isdir(ldir):
            for f in os.listdir(ldir):
                if f.startswith(".tmp-"):
                    full = os.path.join(ldir, f)
                    try:
                        if os.path.getmtime(full) < time.time() - retention:
                            os.remove(full)
                            deleted += 1
                    except OSError:
                        pass
        # metadata cleanup (the delta.logRetentionDuration analog):
        # JSON commits and superseded checkpoint files STRICTLY BELOW
        # the active _last_checkpoint pointer, older than the window.
        # Head replay never reads them (_replay starts at the pointer's
        # checkpoint); only time travel below the checkpoint does,
        # which past retention is vacuum's documented trade — reads of
        # cleaned versions raise ("does not exist"), exactly like
        # time-traveling to vacuumed data files. The pointer version's
        # own JSON is KEPT (version-discovery anchor), as are all its
        # checkpoint part files (publish-last: an existing pointer
        # implies its parts landed). Without this, the log directory
        # is the one file set that grows forever at 100 TB commit
        # rates — O(#commits) listing cost on every read.
        deleted += self._cleanup_log(table, time.time() - retention)
        # unreferenced files (crashed/conflicted writers): neither live
        # nor tombstoned, judged by mtime age — same TTL reasoning as
        # Warehouse._prune's orphan sweep
        referenced = set(live) | set(dead)
        horizon_s = time.time() - retention
        for dp, _, fs in os.walk(tdir):
            if "_delta_log" in dp:
                continue
            for f in fs:
                full = os.path.join(dp, f)
                rel = os.path.relpath(full, tdir)
                if rel in referenced or not f.endswith(".parquet"):
                    continue
                try:
                    if os.path.getmtime(full) < horizon_s:
                        os.remove(full)
                        deleted += 1
                except OSError:
                    pass
        return deleted

    def _cleanup_log(self, table: str, horizon_s: float) -> int:
        """Delete log JSONs / checkpoint files below the active
        checkpoint pointer with mtime older than ``horizon_s``.
        Conservative: no pointer -> no cleanup; the pointer version's
        JSON and checkpoint files always stay."""
        import re as _re

        ldir = self._log_dir(table)
        lc_path = os.path.join(ldir, "_last_checkpoint")
        try:
            with open(lc_path) as fh:
                vc = int(json.load(fh)["version"])
        except (OSError, ValueError, KeyError, TypeError):
            return 0
        pat = _re.compile(
            r"(\d{20})\.(?:json|checkpoint"
            r"(?:\.\d{10}\.\d{10}|\.[0-9a-f-]{36})?\.parquet)$"
        )
        deleted = 0
        for f in os.listdir(ldir):
            m = pat.fullmatch(f)
            if m is None or int(m.group(1)) >= vc:
                continue
            full = os.path.join(ldir, f)
            try:
                if os.path.getmtime(full) < horizon_s:
                    os.remove(full)
                    deleted += 1
            except OSError:
                pass
        # sidecar sweep (V2 checkpoints): files the ACTIVE pointer's
        # manifest references always stay; everything else in
        # _sidecars/ belongs to superseded checkpoints and goes once
        # past retention
        sdir = os.path.join(ldir, _SIDECAR_DIR)
        if os.path.isdir(sdir):
            import glob as _glob

            keep: set[str] = set()
            cands = sorted(
                p
                for p in _glob.glob(
                    os.path.join(ldir, _CKPT_V2_FMT.format(vc, "*"))
                )
                if not _RE_CKPT_PART.fullmatch(os.path.basename(p))
            )
            if cands:
                import pyarrow.parquet as pq

                try:
                    for r in pq.read_table(
                        cands[0], columns=["sidecar"]
                    ).to_pylist():
                        if r.get("sidecar"):
                            keep.add(r["sidecar"]["path"])
                except Exception:
                    return deleted  # unreadable manifest: touch nothing
            for f in os.listdir(sdir):
                if f in keep:
                    continue
                full = os.path.join(sdir, f)
                try:
                    if os.path.getmtime(full) < horizon_s:
                        os.remove(full)
                        deleted += 1
                except OSError:
                    pass
        return deleted

    def _live_by_bucket(
        self, live: dict[str, dict]
    ) -> dict[int, frozenset[tuple]]:
        out: dict[int, set[tuple]] = {}
        for p, a in live.items():
            b = a.get("partitionValues", {}).get(BUCKET_COL)
            if b is not None:
                # a file's row identity = (path, deletion-vector): a
                # merge-on-read delete changes rows without changing
                # any path, so the DV payload is part of the identity
                dv = a.get("deletionVector") or {}
                out.setdefault(int(b), set()).add(
                    (p, dv.get("pathOrInlineDv"))
                )
        return {k: frozenset(v) for k, v in out.items()}

    def changed_buckets(
        self, table: str, v_from: int, v_to: int
    ) -> list[int] | None:
        """Bucket ids whose live FILE SET differs between two versions
        (the pruning input for plans/ops.py table_changes — files are
        immutable, so an identical file set proves identical rows).
        None when pruning is unavailable: either version unbucketed,
        or the bucket layout changed between them."""
        _, meta1, live1, _, _ = self._replay(table, upto=v_from)
        _, meta2, live2, _, _ = self._replay(table, upto=v_to)
        s1, s2 = self._bucket_spec(meta1), self._bucket_spec(meta2)
        if s1 is None or s2 is None or s1 != s2:
            return None
        b1, b2 = self._live_by_bucket(live1), self._live_by_bucket(live2)
        return sorted(
            b
            for b in set(b1) | set(b2)
            if b1.get(b, frozenset()) != b2.get(b, frozenset())
        )

    def read_buckets_at_version(
        self, table: str, version: int, bucket_ids: list[int]
    ) -> DataFrame:
        """Partition-pruned read of specific buckets AS OF a version
        (the read half of pruned CDC). Files must not be vacuumed."""
        _, meta, live, _, _ = self._replay(table, upto=version)
        wanted = {str(b) for b in bucket_ids}
        sub = {
            p: a
            for p, a in live.items()
            if a.get("partitionValues", {}).get(BUCKET_COL) in wanted
        }
        tdir = self._table_dir(table)
        missing = [p for p in sub if not os.path.isfile(os.path.join(tdir, p))]
        if missing:
            raise FileNotFoundError(
                f"version {version} of {table!r} references vacuumed "
                f"files (e.g. {missing[0]!r})"
            )
        df = self._df_for(table, meta, sub)
        if not sub:
            # schema-only: _df_for built from metaData schema (which
            # excludes the partition column, matching the drop below)
            return df
        return df.drop(*meta.get("partitionColumns", []))

    def read_buckets(self, table: str, bucket_ids: list[int]) -> DataFrame:
        """Partition-pruned HEAD read of specific buckets — the same
        b/N contract as the manifest warehouse's read_buckets, so
        contract-level consumers (the generic MERGE executor's routing
        read, probe_neardup_index, fetch_docs_for_pairs,
        probe_ann_index) prune on either commit protocol."""
        return self.read_buckets_at_version(
            table, self.current_version(table), bucket_ids
        )

    def restore(self, table: str, version: int, max_retries: int = 5) -> int:
        """Delta RESTORE: publish a new head commit whose live file set
        (and metaData — schema rollback is part of a restore) equals
        the table's state at ``version``. History moves forward;
        nothing is rewound. Writer epochs are untouched by
        construction (txn folds take the max across ALL commits, and
        this commit emits none). Files at ``version`` must not be
        vacuumed. CAS at head; concurrent merges win and the restore
        re-derives. Returns the new head version."""
        _, meta_v, live_v, _, _ = self._replay(table, upto=version)
        tdir = self._table_dir(table)
        missing = [
            p for p in live_v if not os.path.isfile(os.path.join(tdir, p))
        ]
        if missing:
            raise FileNotFoundError(
                f"version {version} of {table!r} references vacuumed "
                f"files (e.g. {missing[0]!r})"
            )
        for _ in range(1 + max_retries):
            base, _meta_h, live_h, _, _ = self._replay(table)
            now = int(time.time() * 1000)
            actions: list[dict] = [
                self._commit_info("RESTORE", {"version": version}),
                {"metaData": meta_v},
            ]
            actions += [
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": now,
                        "dataChange": True,
                    }
                }
                for p in sorted(set(live_h) - set(live_v))
            ]
            # re-added: paths absent at head, PLUS paths live at both
            # versions whose deletion vector differs (a restore across
            # a merge-on-read delete must restore the row visibility,
            # not just the file set — replay keys adds by path, so
            # re-adding overwrites the head's descriptor)
            readd = [
                p
                for p in live_v
                if p not in live_h
                or (live_h[p].get("deletionVector") or {}).get(
                    "pathOrInlineDv"
                )
                != (live_v[p].get("deletionVector") or {}).get(
                    "pathOrInlineDv"
                )
            ]
            actions += [{"add": live_v[p]} for p in sorted(readd)]
            try:
                self._commit(table, base + 1, actions)
                return base + 1
            except CommitConflict:
                continue
        raise CommitConflict(
            f"{table}: restore lost the commit race {1 + max_retries} times"
        )

    def drop(self, table: str) -> None:
        tdir = self._table_dir(table)
        if os.path.isdir(tdir):
            shutil.rmtree(tdir, ignore_errors=True)
