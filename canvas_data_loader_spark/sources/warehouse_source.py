"""Warehouse tables as a registered Spark data source (``cdl_warehouse``)
via the PySpark Python Data Source API (SPARK-44076, pyspark>=4.0).

Two consumption modes, matching what Delta Lake exposes for its tables:

  batch snapshot          spark.read.format("cdl_warehouse")
                               .option("root", ...).option("table", ...)
                               [.option("version", N)].load()
  batch change feed       ... .option("feed", "true")
                              .option("startingVersion", v | "earliest")
                              [.option("endingVersion", N)].load()
  streaming change feed   spark.readStream.format("cdl_warehouse")
                               .option("root", ...).option("table", ...)
                               .option("feed", "true")
                               [.option("startingVersion", v | "earliest")]
                               .load()

The stream's OFFSETS ARE COMMIT VERSIONS: ``latestOffset`` is one
commit-log LIST (no data IO), each micro-batch delivers the
Delta-CDF-shaped rows (``_change_type`` in insert/delete/
update_preimage/update_postimage plus ``_commit_version``) for the
version range it was planned over, and Spark's checkpoint makes the
version cursor exactly-once. Both commit protocols are served — the
numbered-manifest :class:`~..plans.pipeline.Warehouse` and the Delta
:class:`~..plans.delta.DeltaWarehouse` — through their Spark-free
metadata paths (the reader workers have no SparkSession).

Scale shape (the reason this exists): a downstream consumer of a
100 TB table polls ONE metadata listing per trigger, and a micro-batch
over a merge that touched b of N buckets plans one input partition per
CHANGED bucket — the same b/N pruning contract as
``plans.ops.table_changes`` (whose Spark-side diff semantics the
executor-side Arrow diff replicates; the equivalence test in
tests/test_stream_source.py pins them row-for-row). A no-op interval
(rows unchanged, e.g. maintenance commits) plans zero data partitions.
Unbucketed tables fall back to a single full-diff partition, guarded by
``maxDiffBytes`` so a table that should have been bucketed fails
descriptively instead of silently serializing through one worker.

Reference analog: the Rust loader's downstream consumers re-poll whole
tables between hourly runs (``src/main.rs:119-138``'s skip rule exists
precisely because re-imports are expensive); this source gives Spark
consumers the incremental tail the reference never had.

Cluster deployment note: the data source class is resolved by module
import inside Spark's Python workers — ship the package to executors
(``--py-files`` / pip-installed image), the standard requirement for
any Python UDF/data-source code.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

SOURCE_NAME = "cdl_warehouse"
CDF_COLS = ("_change_type", "_commit_version")

from canvas_data_loader_spark.operators.merge import BUCKET_COL as _BUCKET_COL


class FeedReconstructionError(RuntimeError):
    """The requested version interval can no longer be replayed (a
    commit the stream had not yet consumed was pruned/vacuumed).
    The stream must be restarted from a fresh startingVersion — the
    same failure mode as a Delta stream reading past VACUUM."""


# --------------------------------------------------------------------------
# Spark-free metadata over either commit protocol
# --------------------------------------------------------------------------


class _Meta:
    """File/metadata resolution for one table, no SparkSession.

    Wraps the two warehouse impls' pure-filesystem paths (``_commits``
    / ``_replay`` / ``changed_buckets``) so the data source planner and
    executors resolve exactly what the Spark-side readers resolve —
    one implementation of the commit protocols, not a re-derivation.
    """

    def __init__(self, root: str, table: str, protocol: str | None = None):
        self.root, self.table = root, table
        if protocol is None:
            if os.path.isdir(os.path.join(root, table, "_delta_log")):
                protocol = "delta"
            else:
                protocol = "manifest"
        self.protocol = protocol
        if protocol == "delta":
            from canvas_data_loader_spark.plans.delta import DeltaWarehouse

            self.wh = DeltaWarehouse(None, root)
            self.genesis = -1
        else:
            from canvas_data_loader_spark.plans.pipeline import Warehouse

            self.wh = Warehouse(None, root)
            self.genesis = 0

    def _replayed(self, version: int):
        """Memoized Delta log replay at a FIXED version — the commit
        log is immutable below a retained version, and one _Meta
        instance serves one planning/commit pass, so the memo turns
        the ~5 accessor replays per streaming commit (schema, renames,
        files, DVs) into one log read. Never used for head resolution
        (current_version stays live)."""
        if not hasattr(self, "_replay_memo"):
            self._replay_memo: dict = {}
        if version not in self._replay_memo:
            self._replay_memo[version] = self.wh._replay(
                self.table, upto=version
            )
        return self._replay_memo[version]

    def current_version(self) -> int:
        return self.wh.current_version(self.table)

    def retained_versions(self) -> list[int]:
        if self.protocol == "delta":
            return self.wh._versions_on_disk(self.table)
        return [v for v, _ in self.wh._commits(self.table)]

    def changed_buckets(self, v_from: int, v_to: int) -> list[int] | None:
        return self.wh.changed_buckets(self.table, v_from, v_to)

    def _manifest_at(self, version: int) -> dict:
        m = dict(self.wh._commits(self.table)).get(version)
        if m is None:
            raise FeedReconstructionError(
                f"commit {version} of {self.table!r} is not retained"
            )
        return m

    def spark_schema(self, version: int | None = None) -> StructType:
        """The table's LOGICAL schema at a version — from the commit
        log when recorded there (exact Spark types, survives
        evolution), falling back to a live parquet file's arrow
        schema (pre-evolution unbucketed manifests carry none)."""
        def drop_bucket(st: StructType) -> StructType:
            # the internal bucket partition column never reaches
            # readers (both impls drop it) — nor this source
            return StructType(
                [f for f in st.fields if f.name != _BUCKET_COL]
            )

        if version is None:
            version = self.current_version()
        if self.protocol == "delta":
            _, meta, _, _, _ = self._replayed(version)
            st = StructType.fromJson(json.loads(meta["schemaString"]))
            # drop field metadata (column-mapping ids/physical names)
            # — the stream's output schema is purely logical
            from pyspark.sql.types import StructField

            return drop_bucket(
                StructType(
                    [
                        StructField(f.name, f.dataType, f.nullable)
                        for f in st.fields
                    ]
                )
            )
        m = self._manifest_at(version)
        if m.get("schema"):
            return drop_bucket(StructType.fromJson(json.loads(m["schema"])))
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        files = [f for fl in self.files_by_bucket(version).values() for f in fl]
        if not files:
            raise FileNotFoundError(
                f"table {self.table!r} v{version} has no data files and "
                "its manifest carries no schema"
            )
        return from_arrow_schema(pq.read_schema(files[0]))

    def bucket_key(self, version: int | None = None) -> str | None:
        if version is None:
            version = self.current_version()
        if self.protocol == "delta":
            _, meta, _, _, _ = self._replayed(version)
            spec = self.wh._bucket_spec(meta)
            return spec[0] if spec else None
        return self._manifest_at(version).get("bucket_key")

    def renamed_from(self, version: int) -> dict:
        """{current logical name: historical on-disk names} at a
        version — the chains `_conform_arrow` resolves when a FILE
        carries an older spelling of a column. Manifest protocol:
        the manifest's recorded rename chains. Delta protocol: the
        column mapping (mode=name) — every file stores the stable
        PHYSICAL name, so a renamed column's single historical
        spelling is its physicalName."""
        if self.protocol == "delta":
            from ..plans.delta import _cm_mapping

            _, meta, _, _, _ = self._replayed(version)
            return {
                logical: [phys]
                for logical, phys in (_cm_mapping(meta) or {}).items()
                if phys != logical
            }
        return self._manifest_at(version).get("renamed_from") or {}

    def dv_by_file(self, version: int) -> dict[str, list[int]]:
        """{abs parquet path: sorted deleted row positions} for every
        file a merge-on-read DELETE touched, at a version. Empty when
        the version carries no deletion vectors (the common case —
        planning then adds zero payload to the partitions). Driver-
        side metadata read: inline descriptors from the Delta log, or
        the manifest's small DV sidecar parquet."""
        tdir = os.path.join(self.root, self.table)
        if self.protocol == "delta":
            from ..plans.dv import decode_inline_dv

            _, _, live, _, _ = self._replayed(version)
            return {
                os.path.join(tdir, p): decode_inline_dv(a["deletionVector"])
                for p, a in live.items()
                if a.get("deletionVector")
            }
        m = self._manifest_at(version)
        entries = m.get("dv") or []
        if not entries:
            return {}
        import pyarrow.parquet as pq

        out: dict[str, list[int]] = {}
        for e in entries:
            d = os.path.join(tdir, e["dir"])
            if not os.path.isdir(d):
                raise FeedReconstructionError(
                    f"version {version} of {self.table!r} references a "
                    f"pruned deletion vector ({e['dir']!r}) — restart the "
                    "stream from a fresh startingVersion"
                )
            t = pq.read_table(d)
            for f, pos in zip(
                t.column("file").to_pylist(), t.column("pos").to_pylist()
            ):
                out.setdefault(os.path.join(tdir, f), []).append(int(pos))
        for v in out.values():
            v.sort()
        return out

    def bucket_spec(self, version: int) -> tuple[str, int] | None:
        """(bucket key, n_buckets) at a version, or None for an
        unbucketed table — the routing the batch reader's filter
        pushdown prunes partitions with."""
        if self.protocol == "delta":
            _, meta, _, _, _ = self._replayed(version)
            return self.wh._bucket_spec(meta)
        m = self._manifest_at(version)
        if m.get("bucket_key") and m.get("n_buckets"):
            return (m["bucket_key"], int(m["n_buckets"]))
        return None

    def stats_by_file(self, version: int) -> dict[str, str | None]:
        """{abs parquet path: per-file stats JSON (or None)} at a
        version — delta: off the add actions; manifest: off the
        per-snapshot ``_stats.json`` sidecars. Metadata-only (no
        parquet footer is opened here)."""
        tdir = os.path.join(self.root, self.table)
        if self.protocol == "delta":
            _, _, live, _, _ = self._replayed(version)
            return {
                os.path.join(tdir, p): a.get("stats")
                for p, a in live.items()
            }
        m = self._manifest_at(version)
        snaps = (
            set(m["buckets"].values()) if m.get("buckets") else {m["snapshot"]}
        )
        out: dict[str, str | None] = {}
        for snap in sorted(snaps):
            for rel, st in self.wh._sidecar(self.table, snap).items():
                out[os.path.join(tdir, snap, rel)] = st
        return out

    def files_by_bucket(self, version: int) -> dict[int | None, list[str]]:
        """{bucket_id: [abs parquet paths]} at a version; {None: [...]}
        for unbucketed. Empty buckets are absent (no directory is ever
        written for them). Pure listing — no file is opened."""
        tdir = os.path.join(self.root, self.table)
        if self.protocol == "delta":
            _, meta, live, _, _ = self._replayed(version)
            out: dict[int | None, list[str]] = {}
            for p, a in live.items():
                b = (a.get("partitionValues") or {}).get(_BUCKET_COL)
                key = int(b) if b is not None else None
                out.setdefault(key, []).append(os.path.join(tdir, p))
            for fl in out.values():
                fl.sort()
            return out
        m = self._manifest_at(version)
        if m.get("buckets"):
            out = {}
            for b, snap in m["buckets"].items():
                d = os.path.join(tdir, snap, f"{_BUCKET_COL}={int(b)}")
                if os.path.isdir(d):
                    out[int(b)] = sorted(
                        os.path.join(d, n)
                        for n in os.listdir(d)
                        if n.endswith(".parquet")
                    )
            return out
        snap_dir = os.path.join(tdir, m["snapshot"])
        files = []
        for dirp, _, names in os.walk(snap_dir):
            files += [
                os.path.join(dirp, n) for n in names if n.endswith(".parquet")
            ]
        return {None: sorted(files)}


# --------------------------------------------------------------------------
# shared feed planning (batch CDF + streaming share this)
# --------------------------------------------------------------------------


@dataclass
class FeedPartition(InputPartition):
    v_from: int  # base version (may equal genesis: empty base)
    v_to: int  # _commit_version stamped on every emitted row
    key: str | None
    old_files: list[str] = field(default_factory=list)
    new_files: list[str] = field(default_factory=list)
    insert_only: bool = False
    # rename chains of the DECLARED schema's version (cumulative), not
    # of each step's own version: every file — from any older step —
    # conforms onto the one declared schema, and only the latest
    # chains can place columns renamed after that step. (This is where
    # the source EXCEEDS plans.ops.table_changes, which raises
    # FeedSchemaDrift on rename-crossing intervals.)
    renames: dict = field(default_factory=dict)
    # deletion-vector positions per file at each side of the step
    # ({abs path: [row positions]}, only this partition's files) — the
    # executor masks them out before diffing, so a merge-on-read
    # DELETE interval feeds exactly its deleted rows
    old_dv: dict = field(default_factory=dict)
    new_dv: dict = field(default_factory=dict)


def _plan_step(
    meta: _Meta,
    base: int | None,
    v: int,
    key: str | None,
    max_diff_bytes: int,
    renames: dict,
) -> list[FeedPartition]:
    """Input partitions for ONE version step. ``base=None`` = empty
    base (full snapshot of ``v`` delivered as inserts, one partition
    per FILE — no diff, so no reason to coalesce a bucket). Otherwise
    one partition per CHANGED bucket (the b/N pruning), or a single
    guarded full-diff partition when pruning is unavailable."""
    if base is None:
        dv_all = meta.dv_by_file(v)
        # NO early return: these partitions flow through the shared
        # vacuum/size guard below — a snapshot file pruned between
        # planning and read must surface as the documented
        # FeedReconstructionError, not as a raw executor
        # FileNotFoundError (the diff branch's contract)
        return _guard_partitions(
            meta,
            [
                FeedPartition(
                    v_from=meta.genesis,
                    v_to=v,
                    key=key,
                    new_files=[f],
                    insert_only=True,
                    renames=renames,
                    new_dv={f: dv_all[f]} if f in dv_all else {},
                )
                for fl in meta.files_by_bucket(v).values()
                for f in fl
            ],
            max_diff_bytes,
        )
    if meta.wh.rows_changed(meta.table, base, v) is False:
        # interval provably row-identical (compaction / rebucket /
        # properties / txn-only commits carry data_change=false):
        # advance with ZERO data IO — without this, a nightly OPTIMIZE
        # repointing every bucket would cost the stream a full-table
        # diff to discover nothing changed
        return []
    changed = meta.changed_buckets(base, v)
    if changed is not None and not changed:
        return []
    if key is None:
        raise ValueError(
            f"table {meta.table!r} has no bucket key and no 'key' option "
            "was given — a keyed change feed needs one"
        )
    parts: list[FeedPartition] = []
    old_dv_all = meta.dv_by_file(base)
    new_dv_all = meta.dv_by_file(v)

    def dv_for(files: list[str], dv_all: dict) -> dict:
        return {f: dv_all[f] for f in files if f in dv_all}

    if changed is None:
        old = [f for fl in meta.files_by_bucket(base).values() for f in fl]
        new = [f for fl in meta.files_by_bucket(v).values() for f in fl]
        parts.append(
            FeedPartition(
                v_from=base,
                v_to=v,
                key=key,
                old_files=old,
                new_files=new,
                renames=renames,
                old_dv=dv_for(old, old_dv_all),
                new_dv=dv_for(new, new_dv_all),
            )
        )
    else:
        old_map = meta.files_by_bucket(base)
        new_map = meta.files_by_bucket(v)
        for b in changed:
            parts.append(
                FeedPartition(
                    v_from=base,
                    v_to=v,
                    key=key,
                    old_files=old_map.get(b, []),
                    new_files=new_map.get(b, []),
                    renames=renames,
                    old_dv=dv_for(old_map.get(b, []), old_dv_all),
                    new_dv=dv_for(new_map.get(b, []), new_dv_all),
                )
            )
    return _guard_partitions(meta, parts, max_diff_bytes)


def _guard_partitions(
    meta: _Meta, parts: list[FeedPartition], max_diff_bytes: int
) -> list[FeedPartition]:
    """Planner-side guard every feed partition passes (diff AND
    snapshot-catch-up shapes): vacuumed files fail as the documented
    FeedReconstructionError, oversized partitions as an actionable
    maxDiffBytes error — never a raw executor FileNotFoundError."""
    for p in parts:
        try:
            size = sum(
                os.path.getsize(f) for f in (*p.old_files, *p.new_files)
            )
        except FileNotFoundError as e:
            # delta keeps every commit ENTRY but vacuum removes files:
            # a log-visible version whose data is gone is the same
            # unreconstructable gap as a pruned manifest
            raise FeedReconstructionError(
                f"version {p.v_from} or {p.v_to} of {meta.table!r} "
                f"references vacuumed data files ({e.filename!r}) — "
                "restart the stream from a fresh startingVersion"
            ) from e
        if size > max_diff_bytes:
            raise ValueError(
                f"change-feed partition for {meta.table!r} "
                f"v{p.v_from}->v{p.v_to} spans {size} bytes "
                f"(> maxDiffBytes={max_diff_bytes}): bucket the table so "
                "diffs prune to changed buckets, or raise the option"
            )
    return parts


def _plan_range(
    meta: _Meta,
    start_v: int,
    end_v: int,
    key: str | None,
    max_diff_bytes: int,
    renames: dict | None = None,
) -> list[FeedPartition]:
    """Partitions for (start_v, end_v], stepping through the RETAINED
    versions so every emitted row's ``_commit_version`` names a real
    commit. A gap below the first step is only legal from genesis
    (full-snapshot catch-up); a gap past a version the consumer
    already reached means pruned, unreconstructable increments."""
    if end_v <= start_v:
        return []
    retained = [v for v in meta.retained_versions() if v > meta.genesis]
    steps = [v for v in retained if start_v < v <= end_v]
    if not steps:
        return []
    parts: list[FeedPartition] = []
    prev = start_v
    for v in steps:
        if prev == meta.genesis:
            base = None
        elif prev in retained:
            base = prev
        else:
            raise FeedReconstructionError(
                f"versions ({prev}..{v}) of {meta.table!r} were pruned "
                "before this stream consumed them — the change feed "
                "cannot be reconstructed; restart from a fresh "
                "startingVersion"
            )
        parts.extend(
            _plan_step(meta, base, v, key, max_diff_bytes, renames or {})
        )
        prev = v
    return parts


# --------------------------------------------------------------------------
# executor-side Arrow diff (replicates plans.ops.keyed_changes)
# --------------------------------------------------------------------------


def _canon(v):
    """Canonical comparable form for one cell of an object column —
    null-safe, NaN-safe, nested-safe (mirrors eqNullSafe on a struct:
    null==null and NaN==NaN are both matches)."""
    import numpy as np

    if v is None:
        return ("\0null",)
    if isinstance(v, float):
        return ("\0nan",) if v != v else v
    if isinstance(v, np.ndarray):
        return tuple(_canon(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    try:
        if v != v:  # pandas NaT, Decimal('NaN')
            return ("\0nan",)
    except TypeError:
        pass
    return v


def _null_safe_neq(a, b):
    """Vectorized per-column null-safe INEQUALITY over two aligned
    pandas Series (null==null, NaN==NaN)."""
    import numpy as np
    import pandas as pd

    if a.dtype == object or b.dtype == object:
        ca = pd.Series([_canon(x) for x in a], dtype=object)
        cb = pd.Series([_canon(x) for x in b], dtype=object)
        return (ca != cb).to_numpy(dtype=bool)
    eq = (a.to_numpy() == b.to_numpy()) | (
        a.isna().to_numpy() & b.isna().to_numpy()
    )
    return ~np.asarray(eq, dtype=bool)


def _conform_arrow(t, target, renames: dict):
    """Cast a parquet-read arrow table onto the declared data schema:
    widened types cast, added columns null-padded, renamed columns
    resolved via the recorded chains — the Arrow twin of
    operators.merge.conform_to. Columns in the FILE that the declared
    schema cannot place mean the table evolved past the running
    stream's schema: fail with the restart instruction rather than
    silently dropping data."""
    import pyarrow as pa

    have = set(t.schema.names)
    placed: set[str] = set()
    # a name appearing in ANOTHER field's rename chain is that field's
    # historical on-disk spelling — an exact-name match on it would
    # alias the renamed-away column's values into a same-named new
    # column (delta lane: new field a after rename a -> a_old; old
    # files physically carry 'a' for a_old's data, while new 'a' lives
    # under its fresh col-uuid physical name)
    consumed = {
        h
        for name, hist in renames.items()
        for h in hist
        if h != name
    }
    arrays = []
    for f in target:
        src = f.name if (f.name in have and f.name not in consumed) else next(
            (h for h in renames.get(f.name, []) if h in have), None
        )
        if src is None:
            arrays.append(pa.nulls(len(t), f.type))
        else:
            arrays.append(t.column(src).cast(f.type))
            placed.add(src)
    extra = have - placed - set(target.names)
    if extra:
        raise FeedReconstructionError(
            f"data files carry columns {sorted(extra)} not in this "
            "reader's schema — the table evolved after the stream "
            "started; restart the stream to pick up the new schema"
        )
    return pa.Table.from_arrays(arrays, schema=target)


def _read_conformed(
    files: list[str], target, renames: dict, dv: dict | None = None
):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not files:
        return target.empty_table()

    def one(f: str):
        t = pq.read_table(f)
        pos = (dv or {}).get(f)
        if pos:
            # deletion-vector positions are PHYSICAL row indexes in
            # this file — mask before anything else touches rows
            mask = np.ones(len(t), dtype=bool)
            mask[[p for p in pos if p < len(t)]] = False
            t = t.filter(pa.array(mask))
        return _conform_arrow(t, target, renames)

    return pa.concat_tables(one(f) for f in files)


def _emit(t, change_type: str, version: int, full_schema):
    """Append the CDF metadata columns and yield record batches."""
    import pyarrow as pa

    if len(t) == 0:
        return
    t = t.append_column(
        "_change_type", pa.array([change_type] * len(t), pa.string())
    ).append_column(
        "_commit_version", pa.array([version] * len(t), pa.int64())
    )
    yield from t.cast(full_schema).to_batches()


def _read_feed_partition(p: FeedPartition, full_schema):
    """The executor half: diff one partition's old/new file sets into
    CDF rows. Output rows are TAKEN from the original arrow tables by
    index (pandas is used only to build the key join and the equality
    mask), so values never round-trip through pandas."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    data_schema = pa.schema(
        [f for f in full_schema if f.name not in CDF_COLS]
    )
    new = _read_conformed(p.new_files, data_schema, p.renames, p.new_dv)
    if p.insert_only:
        yield from _emit(new, "insert", p.v_to, full_schema)
        return
    old = _read_conformed(p.old_files, data_schema, p.renames, p.old_dv)
    k = p.key
    jo = pd.DataFrame(
        {"k": old.column(k).to_pandas(), "io": np.arange(len(old))}
    )
    jn = pd.DataFrame(
        {"k": new.column(k).to_pandas(), "ii": np.arange(len(new))}
    )
    m = jo.merge(jn, on="k", how="outer", indicator=True)
    ins = m.loc[m["_merge"] == "right_only", "ii"].to_numpy(dtype=np.int64)
    dels = m.loc[m["_merge"] == "left_only", "io"].to_numpy(dtype=np.int64)
    both = m[m["_merge"] == "both"]
    io = both["io"].to_numpy(dtype=np.int64)
    ii = both["ii"].to_numpy(dtype=np.int64)
    neq = np.zeros(len(both), dtype=bool)
    for name in data_schema.names:
        if name == k or neq.all():
            continue
        co = old.column(name).take(pa.array(io)).to_pandas()
        cn = new.column(name).take(pa.array(ii)).to_pandas()
        neq |= _null_safe_neq(co, cn)
    yield from _emit(new.take(pa.array(ins)), "insert", p.v_to, full_schema)
    yield from _emit(old.take(pa.array(dels)), "delete", p.v_to, full_schema)
    yield from _emit(
        old.take(pa.array(io[neq])), "update_preimage", p.v_to, full_schema
    )
    yield from _emit(
        new.take(pa.array(ii[neq])), "update_postimage", p.v_to, full_schema
    )


# --------------------------------------------------------------------------
# the data source
# --------------------------------------------------------------------------


def _opt_bool(options, name: str, default: bool = False) -> bool:
    v = options.get(name)
    return default if v is None else str(v).lower() in ("true", "1", "yes")


def _required(options, name: str) -> str:
    v = options.get(name)
    if not v:
        raise ValueError(f"cdl_warehouse: option {name!r} is required")
    return v


def _arrow_full_schema(schema: StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _snapshot_version(meta: _Meta, options) -> int:
    """The snapshot read's pinned version from the ``version`` /
    ``timestamp`` options (mutually exclusive). ``timestamp`` is
    resolved ONCE per load — the DataSource pins the resolved version
    into the options it hands the reader, so the schema and the data
    cannot resolve to DIFFERENT versions when a commit lands between
    the two calls (post-evolution files read against a pre-evolution
    schema)."""
    v = options.get("version")
    ts = options.get("timestamp")
    if v is not None and ts is not None:
        raise ValueError(
            "pass either 'version' (VERSION AS OF) or 'timestamp' "
            "(TIMESTAMP AS OF), not both"
        )
    if ts is not None:
        return meta.wh.version_at_timestamp(meta.table, ts)
    return int(v) if v is not None else meta.current_version()


def _starting_option(meta: _Meta, options) -> str | None:
    """The effective startingVersion, honoring ``startingTimestamp``
    (Delta CDF semantics: changes committed AT OR AFTER the time).
    Resolution: the max version STRICTLY BEFORE the timestamp, plus
    one — a commit stamped exactly at the given time is therefore
    DELIVERED (a consumer restarting from a stamp it read off
    maintain --stats or commitInfo must not lose that commit's
    changes). A timestamp predating all history means 'earliest'; a
    MISSING table raises (mapping it to 'earliest' would make a typo'd
    table name read as an empty feed)."""
    sv = options.get("startingVersion")
    ts = options.get("startingTimestamp")
    if ts is None:
        return sv
    if sv is not None:
        raise ValueError(
            "pass either 'startingVersion' or 'startingTimestamp', not both"
        )
    if not meta.wh.exists(meta.table):
        raise FileNotFoundError(
            f"table {meta.table!r} not in warehouse {meta.root!r}"
        )
    try:
        return str(
            meta.wh.version_at_timestamp(meta.table, ts, strict=True) + 1
        )
    except FileNotFoundError:
        return "earliest"  # ts predates the whole retained history


def _resolve_start(
    meta: _Meta, starting: str | None, *, default_latest: bool
) -> int:
    """Map the startingVersion option to the initial offset (= last
    version considered consumed). 'earliest' consumes the full history
    (first delivery = the earliest retained snapshot as inserts);
    an integer v delivers changes FROM v on (Delta's inclusive
    semantics), requiring v-1 retained or genesis."""
    if starting is None:
        return meta.current_version() if default_latest else meta.genesis
    if str(starting).lower() == "earliest":
        return meta.genesis
    v = int(starting)
    prev = v - 1
    if prev != meta.genesis and prev not in meta.retained_versions():
        raise FeedReconstructionError(
            f"startingVersion={v} needs commit {prev} of "
            f"{meta.table!r} as the diff base, but it is not retained "
            "— use startingVersion='earliest' for a full-snapshot start"
        )
    return prev


class WarehouseStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self.root = _required(options, "root")
        self.table = _required(options, "table")
        self.protocol = options.get("protocol")
        self.key_opt = options.get("key")
        self.max_diff_bytes = int(
            options.get("maxDiffBytes", 4 * 1024 * 1024 * 1024)
        )
        self.max_versions = int(options.get("maxVersionsPerTrigger", 0))
        self.full_schema = _arrow_full_schema(schema)
        meta0 = self._meta()
        self.starting = _starting_option(meta0, options)
        self.key = self.key_opt or meta0.bucket_key()
        # the declared schema was resolved against the current head;
        # its cumulative rename chains place every older file's columns
        self.renames = meta0.renamed_from(meta0.current_version())
        # highest version this reader has planned a batch through —
        # the rate-limit floor. Seeded SOFTLY at construction (Spark
        # may ask for latestOffset before initialOffset, e.g. the
        # AvailableNow fallback freezing its end target): a fresh
        # stream seeds from startingVersion, but a RESTART long after
        # the named base was pruned must not fail construction — the
        # checkpointed offset governs then, and the floor falls back
        # to the current head (first recovered trigger may be
        # unclamped: bounded staleness, never lost data).
        #
        # RESTART SAFETY: a restarted stream re-passing the same
        # startingVersion + maxVersionsPerTrigger options must never
        # clamp latestOffset BELOW the checkpointed cursor (offset
        # regression = duplicate delivery). The engine re-plans the
        # last offset-logged batch on every restart (observed:
        # partitions(ckpt, ckpt) precedes the first latestOffset in
        # both trigger modes) and replays commit() for it — so
        # partitions() and commit() below fold every offset they see
        # into this floor, making the clamp safe whichever recovery
        # path runs and independent of that undocumented ordering
        # (pinned by test_restart_with_rate_limit_never_rewinds).
        try:
            self._planned_through = _resolve_start(
                self._meta(), self.starting, default_latest=True
            )
        except FeedReconstructionError:
            self._planned_through = self._meta().current_version()



    def _meta(self) -> _Meta:
        return _Meta(self.root, self.table, self.protocol)

    def initialOffset(self):
        # only called for a FRESH stream (no checkpoint) — the one
        # place the startingVersion option is resolved and validated
        v = _resolve_start(self._meta(), self.starting, default_latest=True)
        # never LOWER a floor partitions()/commit() already raised
        self._planned_through = max(self._planned_through, v)
        return {"version": v}

    def latestOffset(self):
        # one commit-log LIST — the no-op-trigger cost at any scale
        head = self._meta().current_version()
        if self.max_versions > 0:
            # bound catch-up bursts: at most N versions per micro-batch
            head = min(head, self._planned_through + self.max_versions)
        return {"version": head}

    def partitions(self, start, end):
        start_v, end_v = int(start["version"]), int(end["version"])
        # NEVER clamp here: ``end`` is already in the offset log, so
        # planning less than it would mark undelivered data consumed —
        # but fold BOTH bounds into the rate-limit floor (the start is
        # the checkpointed cursor on a restarted recovered batch)
        self._planned_through = max(self._planned_through, start_v, end_v)
        parts = _plan_range(
            self._meta(),
            start_v,
            end_v,
            self.key,
            self.max_diff_bytes,
            self.renames,
        )
        # Spark requires >=1 partition per planned batch; a rows-
        # unchanged interval plans one no-op partition (zero files)
        return parts or [
            FeedPartition(
                v_from=int(start["version"]),
                v_to=int(end["version"]),
                key=self.key,
                insert_only=True,
            )
        ]

    def read(self, partition: FeedPartition):
        yield from _read_feed_partition(partition, self.full_schema)

    def commit(self, end):
        # the engine replays commit(<checkpointed end>) when it
        # recovers a COMMITTED final batch — folding it into the floor
        # keeps a restarted rate-limited stream from clamping
        # latestOffset below the checkpoint
        try:
            self._planned_through = max(
                self._planned_through, int(end["version"])
            )
        except (KeyError, TypeError, ValueError):
            pass


class WarehouseFeedBatchReader(DataSourceReader):
    """Batch CDF (Delta's ``readChangeFeed`` shape): all changes in
    (startingVersion-1, endingVersion] as one bounded read."""

    def __init__(self, schema: StructType, options):
        meta = _Meta(
            _required(options, "root"),
            _required(options, "table"),
            options.get("protocol"),
        )
        self.full_schema = _arrow_full_schema(schema)
        starting = _starting_option(meta, options)
        if starting is None:
            raise ValueError(
                "batch CDF needs 'startingVersion' or 'startingTimestamp'"
            )
        if (
            options.get("startingTimestamp") is not None
            and str(starting).lower() != "earliest"
            and int(starting) > meta.current_version()
        ):
            # batch semantics (Delta's too): a start time past the last
            # commit is an error, not an empty frame — streaming is the
            # spelling for "tail from now on"
            raise ValueError(
                f"startingTimestamp {options['startingTimestamp']!r} is "
                f"after {meta.table!r}'s last commit "
                f"(v{meta.current_version()}) — nothing to read; use a "
                "STREAMING feed to tail future commits"
            )
        start_v = _resolve_start(meta, starting, default_latest=False)
        end_v = int(options.get("endingVersion", meta.current_version()))
        key = options.get("key") or meta.bucket_key()
        self._parts = _plan_range(
            meta,
            start_v,
            end_v,
            key,
            int(options.get("maxDiffBytes", 4 * 1024 * 1024 * 1024)),
            meta.renamed_from(end_v),
        )

    def partitions(self):
        return self._parts or [
            FeedPartition(v_from=0, v_to=0, key=None, insert_only=True)
        ]

    def read(self, partition: FeedPartition):
        yield from _read_feed_partition(partition, self.full_schema)


@dataclass
class SnapshotPartition(InputPartition):
    file: str
    renames: dict
    dv: tuple = ()  # deleted row positions in this file (merge-on-read)


def _push_canon(v):
    """Canonicalize a pushed-filter value for comparison against the
    per-file stats JSON (which stores dates/timestamps as isoformat
    strings and decimals as strings — plans/stats.py as_json). None
    means 'cannot use this value for pruning'."""
    import datetime
    import decimal

    if isinstance(v, bool) or isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return None


class WarehouseSnapshotReader(DataSourceReader):
    """Batch snapshot read (optionally AS OF a retained version), one
    input partition per live data file. This base class plans every
    live file; the default reader is WarehousePushdownSnapshotReader
    below, which adds filter pushdown (this class remains the
    ``.option("pushdown", "false")`` escape hatch for sessions where
    ``spark.sql.python.filterPushdown.enabled`` cannot be turned on —
    Spark refuses a pushFilters-implementing reader under that conf
    rather than silently ignoring it).

    - equality / IN on the bucket key prunes whole BUCKETS: the
      routing hash (pmod(xxhash64(key), n) — plans/arrow_dml.py, the
      Spark-bit-exact port) is recomputed driver-side, so a point
      lookup plans O(files-in-one-bucket) partitions, not the table;
    - comparison / IN predicates on any stats-covered column skip
      FILES whose footer min/max provably cannot match (the same
      contract as Warehouse.files_for_range, rename-chain-aware);
    - StringStartsWith prunes as the range [prefix, upper(prefix));
      IS NULL skips files whose stats nullCount proves zero NULLs,
      IS NOT NULL skips all-NULL files (nullCount == numRecords) —
      older stats without the nullCount field simply never prune.

    Both prunes are conservative — a file is dropped only on PROOF of
    emptiness, files without usable stats are kept — and every filter
    is returned as residual so Spark re-applies the exact predicate to
    surviving rows: pushdown changes IO, never semantics. At 100 TB
    this is the difference between a selective read through
    ``spark.read.format("cdl_warehouse")`` scanning one bucket and
    scanning the table."""

    def __init__(self, schema: StructType, options):
        meta = _Meta(
            _required(options, "root"),
            _required(options, "table"),
            options.get("protocol"),
        )
        self.arrow_schema = _arrow_full_schema(schema)
        version = _snapshot_version(meta, options)
        self._renames = meta.renamed_from(version)
        self._dv_all = meta.dv_by_file(version)
        self._files_by_bucket = meta.files_by_bucket(version)
        self._stats = meta.stats_by_file(version)
        self._spec = meta.bucket_spec(version)
        self._key_dtype = None
        if self._spec is not None:
            fld = next(
                (f for f in schema.fields if f.name == self._spec[0]), None
            )
            if fld is not None:
                self._key_dtype = fld.dataType.simpleString()
        # pushdown state (empty until pushFilters runs)
        self._allowed_buckets: set[int] | None = None
        self._bounds: dict[str, tuple] = {}
        self._in_vals: dict[str, tuple] = {}
        self._prefixes: dict[str, list[str]] = {}
        self._null_cols: set[str] = set()
        self._notnull_cols: set[str] = set()
        # observability: tests and the scale probe read this after
        # planning ({buckets pruned to, files skipped/planned/total})
        self.pushed: dict = {"filters": []}

    def _stat_name(
        self, stats_json: str, col: str, section: str = "minValues"
    ) -> str | None:
        """Which recorded name (current or a rename-chain historical/
        physical one) THIS file's stats carry for ``col`` — checking an
        absent name always reads 'cannot skip' and defeats the prune.
        ``section`` picks the stats map the name must appear in
        (min/max for range prunes, nullCount for null prunes)."""
        try:
            mv = json.loads(stats_json).get(section, {})
        except (ValueError, AttributeError):
            return None
        return next(
            (
                n
                for n in (col, *self._renames.get(col, []))
                if n in mv
            ),
            None,
        )

    def _file_pruned(self, path: str) -> bool:
        from ..plans.stats import (
            prefix_upper_bound,
            stats_all_null,
            stats_disjoint,
            stats_no_null,
        )

        st = self._stats.get(path)
        if not st:
            return False
        for col, (lo, hi) in self._bounds.items():
            nm = self._stat_name(st, col)
            if nm is not None and stats_disjoint(st, nm, lo, hi):
                return True
        for col, vals in self._in_vals.items():
            if not vals:
                continue
            nm = self._stat_name(st, col)
            if nm is not None and all(
                stats_disjoint(st, nm, v, v) for v in vals
            ):
                return True
        for col, prefixes in self._prefixes.items():
            nm = self._stat_name(st, col)
            if nm is None:
                continue
            for p in prefixes:
                # startswith(p) rows live in [p, upper(p)): reusing the
                # closed-interval prune with hi=upper keeps a harmless
                # fmin == upper(p) file — conservative, never wrong
                if stats_disjoint(st, nm, p, prefix_upper_bound(p)):
                    return True
        for col in self._null_cols:
            nm = self._stat_name(st, col, "nullCount")
            if nm is not None and stats_no_null(st, nm):
                return True
        for col in self._notnull_cols:
            nm = self._stat_name(st, col, "nullCount")
            if nm is not None and stats_all_null(st, nm):
                return True
        return False

    def partitions(self):
        parts = []
        skipped = 0
        for b, fl in sorted(
            self._files_by_bucket.items(),
            key=lambda kv: (-1 if kv[0] is None else kv[0]),
        ):
            if (
                self._allowed_buckets is not None
                and b is not None
                and b not in self._allowed_buckets
            ):
                skipped += len(fl)
                continue
            for f in fl:
                if self._file_pruned(f):
                    skipped += 1
                    continue
                parts.append(
                    SnapshotPartition(
                        file=f,
                        renames=self._renames,
                        dv=tuple(self._dv_all.get(f, ())),
                    )
                )
        self.pushed.update(
            {
                "buckets": (
                    sorted(self._allowed_buckets)
                    if self._allowed_buckets is not None
                    else None
                ),
                "files_planned": len(parts),
                "files_skipped": skipped,
            }
        )
        return parts or [SnapshotPartition(file="", renames={})]

    def read(self, partition: SnapshotPartition):
        if not partition.file:
            return
        # one shared DV-mask + conform implementation with the feed
        # readers (_read_conformed) — a masking fix lands once
        t = _read_conformed(
            [partition.file],
            self.arrow_schema,
            partition.renames,
            {partition.file: list(partition.dv)} if partition.dv else None,
        )
        yield from t.to_batches()


class WarehousePushdownSnapshotReader(WarehouseSnapshotReader):
    """The DEFAULT batch reader: WarehouseSnapshotReader + FILTER
    PUSHDOWN (``DataSourceReader.pushFilters``, Spark ≥ 4.1 with
    ``spark.sql.python.filterPushdown.enabled`` — get_spark sets it):

    - equality / IN on the bucket key prunes whole BUCKETS: the
      routing hash (pmod(xxhash64(key), n) — plans/arrow_dml.py, the
      Spark-bit-exact port) is recomputed driver-side, so a point
      lookup plans O(files-in-one-bucket) partitions, not the table;
    - comparison / IN predicates on any stats-covered column skip
      FILES whose footer min/max provably cannot match (the same
      contract as Warehouse.files_for_range, rename-chain-aware);
    - StringStartsWith prunes as the range [prefix, upper(prefix));
      IS NULL skips files whose stats nullCount proves zero NULLs,
      IS NOT NULL skips all-NULL files (nullCount == numRecords) —
      older stats without the nullCount field simply never prune.

    Both prunes are conservative — a file is dropped only on PROOF of
    emptiness, files without usable stats are kept — and every filter
    is returned as residual so Spark re-applies the exact predicate to
    surviving rows: pushdown changes IO, never semantics. At 100 TB
    this is the difference between a selective read through
    ``spark.read.format("cdl_warehouse")`` scanning one bucket and
    scanning the table."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
            StringStartsWith,
        )

        key = self._spec[0] if self._spec is not None else None
        key_vals: set | None = None
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            if isinstance(f, IsNull):
                # prunes files whose nullCount proves zero NULLs
                self._null_cols.add(col)
                self.pushed["filters"].append(f)
                continue
            if isinstance(f, IsNotNull):
                # prunes all-NULL files (nullCount == numRecords)
                self._notnull_cols.add(col)
                self.pushed["filters"].append(f)
                continue
            if isinstance(f, StringStartsWith):
                if isinstance(f.value, str):
                    self._prefixes.setdefault(col, []).append(f.value)
                    self.pushed["filters"].append(f)
                continue
            if isinstance(f, In):
                vals = tuple(
                    c
                    for c in (_push_canon(v) for v in f.value)
                    if c is not None
                )
                if not vals or len(vals) != len(f.value):
                    continue  # un-canonicalizable member: no pruning
                prev = self._in_vals.get(col)
                self._in_vals[col] = (
                    vals
                    if prev is None
                    else tuple(v for v in vals if v in set(prev))
                )
                if col == key:
                    s = set(vals)
                    key_vals = s if key_vals is None else (key_vals & s)
                self.pushed["filters"].append(f)
                continue
            if not isinstance(
                f,
                (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
                 LessThanOrEqual),
            ):
                continue
            v = _push_canon(f.value)
            if v is None:
                continue
            if isinstance(f, EqualTo):
                nlo, nhi = v, v
                if col == key:
                    key_vals = (
                        {v} if key_vals is None else (key_vals & {v})
                    )
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                # strict vs inclusive doesn't matter for file PRUNING:
                # lo=v inclusive keeps a superset, the residual filter
                # drops the boundary rows
                nlo, nhi = v, None
            else:
                nlo, nhi = None, v
            lo, hi = self._bounds.get(col, (None, None))
            try:
                lo = nlo if lo is None else (lo if nlo is None else max(lo, nlo))
                hi = nhi if hi is None else (hi if nhi is None else min(hi, nhi))
            except TypeError:
                continue  # mixed-type bounds on one column: skip
            self._bounds[col] = (lo, hi)
            self.pushed["filters"].append(f)
        if key_vals is not None and self._key_dtype is not None:
            try:
                from ..plans.arrow_dml import bucket_of_value

                self._allowed_buckets = {
                    bucket_of_value(v, self._key_dtype, self._spec[1])
                    for v in key_vals
                }
            except (ValueError, TypeError):
                self._allowed_buckets = None  # unsupported key type
        # every filter stays residual: Spark re-applies the exact
        # predicates to the rows of whatever files survive
        return filters


class WarehouseDataSource(DataSource):
    """``cdl_warehouse``: snapshot + change-feed reads of warehouse
    tables (both commit protocols) without a Warehouse object — the
    path an external Spark job on a cluster takes. Register once per
    session: ``spark.dataSource.register(WarehouseDataSource)``."""

    @classmethod
    def name(cls):
        return SOURCE_NAME

    def schema(self):
        meta = _Meta(
            _required(self.options, "root"),
            _required(self.options, "table"),
            self.options.get("protocol"),
        )
        if _opt_bool(self.options, "feed"):
            v = self.options.get("endingVersion")
            base = meta.spark_schema(int(v) if v is not None else None)
            return StructType(
                list(base.fields)
                + [
                    StructField("_change_type", StringType(), False),
                    StructField("_commit_version", LongType(), False),
                ]
            )
        v = self.options.get("version")
        ts = self.options.get("timestamp")
        if ts is not None and v is None:
            # resolve ONCE and pin: reader() reads the version this
            # schema was resolved at, never a head that moved between
            # the two calls (see _snapshot_version)
            pinned = meta.wh.version_at_timestamp(meta.table, ts)
            self._pinned_ts_version = pinned
            return meta.spark_schema(pinned)
        return meta.spark_schema(int(v) if v is not None else None)

    def reader(self, schema: StructType):
        if _opt_bool(self.options, "feed"):
            return WarehouseFeedBatchReader(schema, self.options)
        opts = self.options
        pinned = getattr(self, "_pinned_ts_version", None)
        if pinned is not None:
            # hand the reader the version schema() resolved, not the
            # timestamp (which a fresh commit could re-resolve)
            opts = dict(opts)
            opts.pop("timestamp", None)
            opts["version"] = str(pinned)
        # pushdown by default (requires
        # spark.sql.python.filterPushdown.enabled=true, which get_spark
        # sets); option("pushdown", "false") opts out for sessions
        # where that conf cannot be enabled — Spark refuses a
        # pushFilters-implementing reader under a disabled conf
        if str(opts.get("pushdown", "true")).lower() == "false":
            return WarehouseSnapshotReader(schema, opts)
        return WarehousePushdownSnapshotReader(schema, opts)

    def streamReader(self, schema: StructType):
        if not _opt_bool(self.options, "feed"):
            raise ValueError(
                "cdl_warehouse streaming is a change feed — pass "
                ".option('feed', 'true') (snapshot semantics have no "
                "streaming meaning for merge-updated tables)"
            )
        return WarehouseStreamReader(schema, self.options)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return WarehouseStreamWriter(schema, self.options, overwrite)

    # No batch writer() on purpose: the Python Data Source write path
    # funnels every partition's rows through staging + a single
    # session-less commit process, which is the right trade for a
    # micro-batch (bounded by the trigger) but an anti-feature for
    # batch loads — Warehouse.write / merge_bucketed already run the
    # batch path DISTRIBUTED (Spark executors write the parquet,
    # the driver only publishes the commit). Batch writes belong there.


# --------------------------------------------------------------------------
# streaming WRITE: writeStream.format("cdl_warehouse")
# --------------------------------------------------------------------------


@dataclass
class _StagedFiles(WriterCommitMessage):
    files: list[str] = field(default_factory=list)


class WarehouseStreamWriter(DataSourceStreamWriter):
    """Exactly-once streaming upsert INTO a warehouse table — the
    writer half of the data source, so consumers no longer hand-roll
    foreachBatch around ``streaming.ingest.apply_stream_batch``::

        df.writeStream.format("cdl_warehouse")
          .option("root", ...).option("table", ...)
          .option("key", "id")[.option("orderCol", "seq")]
          .option("appId", <stable writer id>)
          .option("checkpointLocation", ...).start()

    Protocol: executors STAGE each partition's rows as parquet under
    ``<table>/.stream-stage/<appId>/`` (claimed fresh file names, a
    directory no commit ever references — the vacuum/orphan TTL sweep
    reclaims crashed stages); the driver-side ``commit(batchId)``
    reads the staged files back and applies ONE keyed merge via
    ``apply_stream_batch``, which records the ``(appId, batchId)``
    epoch in the SAME CAS commit as the rows. A crash after the
    warehouse commit but before Spark's checkpoint commit replays the
    batch; the epoch check skips it — rows and bookkeeping can never
    diverge (the Delta ``txn`` shape, both commit protocols).

    ``appId`` is REQUIRED and must be stable for the lifetime of one
    checkpoint (batch ids are scoped to a checkpoint: two queries
    sharing an appId but not a checkpoint would skip each other's
    epochs). The reader half's convention applies: name it after the
    checkpoint."""

    def __init__(self, schema: StructType, options, overwrite: bool):
        if overwrite:
            raise ValueError(
                "cdl_warehouse streaming write is merge-only (keyed "
                "upsert); outputMode('complete') has no meaning here"
            )
        self.schema = schema
        self.root = _required(options, "root")
        self.table = _required(options, "table")
        self.app_id = options.get("appId")
        if not self.app_id:
            raise ValueError(
                "cdl_warehouse streaming write requires .option('appId', "
                "<stable writer id>) — epochs are recorded under it; "
                "keep it 1:1 with the checkpoint location"
            )
        keys = _required(options, "key")
        self.keys = [k.strip() for k in keys.split(",") if k.strip()]
        self.order_col = options.get("orderCol")
        self.protocol = options.get("protocol")

    def _stage_dir(self) -> str:
        return os.path.join(self.root, self.table, ".stream-stage", self.app_id)

    def write(self, iterator):
        """Executor-side: stage this partition's rows as one parquet
        file (no warehouse state is touched — commit() owns that)."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        rows = [r.asDict(recursive=True) for r in iterator]
        if not rows:
            return _StagedFiles()
        stage = self._stage_dir()
        os.makedirs(stage, exist_ok=True)
        path = os.path.join(stage, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(
            pa.Table.from_pylist(rows, schema=to_arrow_schema(self.schema)),
            path,
        )
        return _StagedFiles(files=[path])

    def commit(self, messages, batchId: int):
        """Driver-side per-batch commit. Runs in the data source's
        Python worker process, which has NO SparkSession (SPARK-44076
        architecture: the JVM spawns a plain worker for the writer's
        lifecycle hooks) — so the keyed merge goes through the
        Spark-free pyarrow lane (plans/arrow_dml.py), which publishes
        through the SAME CAS commit protocols with the SAME
        ``(appId, batchId)`` epoch rule as streaming.ingest."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from canvas_data_loader_spark.plans.arrow_dml import (
            apply_stream_batch_arrow,
        )

        files = [f for m in messages if m is not None for f in m.files]
        if files:
            batch = pa.concat_tables([pq.read_table(f) for f in files])
            apply_stream_batch_arrow(
                self.root,
                self.table,
                self.keys,
                self.order_col,
                self.app_id,
                batch,
                batchId,
                protocol=self.protocol,
            )
        # staged files served their purpose (the merge wrote real data
        # files); reclaim eagerly — a crash between the merge commit
        # and here leaves orphans for the TTL sweep
        for f in files:
            try:
                os.remove(f)
            except OSError:
                pass

    def abort(self, messages, batchId: int):
        for m in messages or []:
            for f in getattr(m, "files", None) or []:
                try:
                    os.remove(f)
                except OSError:
                    pass


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(WarehouseDataSource)


def read_changes_stream(spark, root: str, table: str, **options):
    """Convenience: a streaming CDF DataFrame over a warehouse table."""
    register(spark)
    r = (
        spark.readStream.format(SOURCE_NAME)
        .option("root", root)
        .option("table", table)
        .option("feed", "true")
    )
    for k, v in options.items():
        r = r.option(k, str(v))
    return r.load()
