"""Shared warehouse contract: ONE suite, BOTH commit-log impls.

The numbered-manifest warehouse (plans/pipeline.py Warehouse) and the
Delta-protocol warehouse (plans/delta.py DeltaWarehouse) implement the
same semantics — CAS publishes, snapshot isolation, partition-pruned
bucketed MERGE with file reuse, writer epochs, time travel by commit
number, external DuckDB reads, compaction. Every test here runs
against both via the ``wh_factory`` fixture, so a divergence between
the two commit protocols is a test failure, not a doc footnote.

(The round-7 verdict's ask: a second Warehouse impl in a REAL lake
format "passing the SAME merge/concurrency/time-travel suite".)
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from canvas_data_loader_spark.plans.delta import DeltaWarehouse
from canvas_data_loader_spark.plans.pipeline import CommitConflict, Warehouse


@pytest.fixture(params=["manifest", "delta"])
def wh_factory(request, tmp_path, spark):
    """Factory returning a fresh warehouse of the parametrized impl;
    calling it twice with the same name yields two handles on the SAME
    store (the concurrent-writer setup).

    Post-condition (delta impl): after the test body, every table's
    final state is decoded by the INDEPENDENT protocol reader
    (tools/delta_reader.py — log replay, checkpoints, column mapping,
    Z85/roaring deletion vectors, shares no code with the writer) and
    compared row-for-row with the writer's own read. Every commit
    shape the suite produces must be consumable by a from-spec
    reader — self-confirmation is not conformance."""
    built = []

    def build(name="wh"):
        root = str(tmp_path / f"{request.param}-{name}")
        if request.param == "delta":
            wh = DeltaWarehouse(spark, root)
        else:
            wh = Warehouse(spark, root)
        built.append(wh)
        return wh

    build.kind = request.param
    yield build
    if request.param == "delta":
        for root in {w.root for w in built}:
            _assert_independent_reader_agrees(spark, root)


def _reader_canon(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "\0null"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return format(v, "f")
    if isinstance(v, float):
        return "\0nan" if math.isnan(v) else repr(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(_reader_canon(x) for x in v)
    return str(v)


def _assert_independent_reader_agrees(spark, root):
    """Decode every delta table under ``root`` with the independent
    reader and pin its rows to the writer's own read (columns matched
    by name; both sides canonicalized)."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo/tools")
    try:
        import delta_reader
    finally:
        sys.path.pop(0)

    if not os.path.isdir(root):
        return
    wh = DeltaWarehouse(spark, root)
    for table in sorted(os.listdir(root)):
        if not os.path.isdir(os.path.join(root, table, "_delta_log")):
            continue
        ours = wh.read(table)
        try:
            sql = delta_reader.duckdb_sql(os.path.join(root, table))
        except FileNotFoundError:
            # no live files: the reader has nothing to scan — the
            # writer's read must agree the table is empty
            assert ours.count() == 0, (
                f"{table}: writer sees rows but the independent reader "
                "resolves no live files"
            )
            continue
        rel = duckdb.sql(sql)
        cols = sorted(ours.columns)
        assert sorted(rel.columns) == cols, (
            f"{table}: column sets diverge "
            f"(writer {sorted(ours.columns)}, reader {sorted(rel.columns)})"
        )
        idx = [rel.columns.index(c) for c in cols]
        theirs = sorted(
            tuple(_reader_canon(row[i]) for i in idx)
            for row in rel.fetchall()
        )
        mine = sorted(
            tuple(_reader_canon(r[c]) for c in cols)
            for r in ours.collect()
        )
        assert mine == theirs, (
            f"{table}: independent-reader rows diverge from the "
            f"writer's read ({len(mine)} vs {len(theirs)} rows; first "
            f"difference: "
            f"{next((a, b) for a, b in zip(mine + [None], theirs + [None]) if a != b)})"
        )


def head(wh, table):
    if isinstance(wh, DeltaWarehouse):
        return wh.current_version(table)
    return wh._current_version(table)


def rows_of(wh, table):
    return sorted(tuple(r) for r in wh.read(table).collect())


def md5s(root):
    import hashlib

    out = {}
    for dp, _, fs in os.walk(root):
        if "_delta_log" in dp or "_commits" in dp:
            continue
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(dp, f)
                out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


class TestContractBasics:
    def test_create_read_replace_drop(self, spark, wh_factory):
        wh = wh_factory()
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        wh.write("t", df, snapshot="s1")
        assert wh.exists("t")
        assert rows_of(wh, "t") == [(1, "a"), (2, "b")]
        # full replace: complete new contents, old rows gone
        wh.write(
            "t", spark.createDataFrame([(9, "z")], "id long, v string"),
            snapshot="s2",
        )
        assert rows_of(wh, "t") == [(9, "z")]
        wh.drop("t")
        assert not wh.exists("t")

    def test_bucketed_write_and_read_drops_bucket_col(self, spark, wh_factory):
        wh = wh_factory()
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        )
        wh.write("t", df, snapshot="s1", bucket=("id", 4))
        assert wh.is_bucketed("t")
        got = wh.read("t")
        assert got.columns == ["id", "v"]
        assert got.count() == 10


class TestContractCas:
    def test_create_race_cas(self, spark, wh_factory):
        # two creators race the genesis version: exactly one wins
        a, b = wh_factory(), wh_factory()
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        a.write("t", df, snapshot="s1", expected_version=a.GENESIS_VERSION)
        with pytest.raises(CommitConflict):
            b.write(
                "t",
                spark.createDataFrame([(2, "b")], "id long, v string"),
                snapshot="s1b",
                expected_version=b.GENESIS_VERSION,
            )
        assert rows_of(a, "t") == [(1, "a")]

    def test_lost_update_prevented(self, spark, wh_factory):
        wh, other = wh_factory(), wh_factory()
        wh.write(
            "t", spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s1",
        )
        base, old = wh.read_versioned("t")
        # a concurrent full replace lands in between
        other.write(
            "t", spark.createDataFrame([(2, "b")], "id long, v string"),
            snapshot="s2",
        )
        # the stale-derived publish must conflict, not silently drop it
        with pytest.raises(CommitConflict):
            wh.write("t", old, snapshot="s3", expected_version=base)
        assert rows_of(wh, "t") == [(2, "b")]

    def test_threaded_disjoint_merges_all_land(self, spark, wh_factory):
        # the 4-writer disjoint-key stress: every upsert survives, no
        # lost updates, exactly base+N commits (serialized by CAS)
        wh = wh_factory()
        base = spark.createDataFrame(
            [(i, "base") for i in range(40)], "id long, v string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 8))
        v0 = head(wh, "t")
        errors: list[Exception] = []

        def worker(w, my_ids):
            try:
                for j, i in enumerate(my_ids):
                    batch = spark.createDataFrame(
                        [(i, f"w{i}")], "id long, v string"
                    )
                    w.merge_bucketed(
                        "t", batch, snapshot=f"m{i}-{j}",
                        max_commit_retries=25,
                    )
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        handles = [wh_factory() for _ in range(4)]
        threads = [
            threading.Thread(target=worker, args=(handles[k], range(k, 12, 4)))
            for k in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        got = {r["id"]: r["v"] for r in wh.read("t").collect()}
        for i in range(12):
            assert got[i] == f"w{i}", f"lost update on key {i}"
        for i in range(12, 40):
            assert got[i] == "base"
        assert head(wh, "t") == v0 + 12  # one commit per merge, no gaps


class TestContractBucketedMerge:
    def test_merge_prunes_and_reuses_untouched_files(self, spark, wh_factory):
        wh = wh_factory()
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 17)], "id long, v string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 8))
        before = md5s(wh.root)
        batch = spark.createDataFrame([(1, "NEW")], "id long, v string")
        affected = wh.merge_bucketed("t", batch, snapshot="m1")
        assert len(affected) == 1
        got = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert got[1] == "NEW" and len(got) == 16
        # untouched buckets' files: byte-identical, never rewritten
        after = md5s(wh.root)
        touched = {f"__kb={b}" for b in affected}
        for p, h in before.items():
            if any(t in p for t in touched):
                continue
            assert after.get(p) == h, f"rewritten: {p}"

    def test_merge_on_unbucketed_table_raises(self, spark, wh_factory):
        wh = wh_factory()
        wh.write(
            "t", spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        with pytest.raises(FileNotFoundError):
            wh.merge_bucketed(
                "t", spark.createDataFrame([(1, "b")], "id long, v string"),
                snapshot="m1",
            )


class TestContractTimeTravelAndExternal:
    def test_time_travel_by_version(self, spark, wh_factory):
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, "old") for i in range(8)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        v1 = head(wh, "t")
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "new")], "id long, v string"),
            snapshot="m1",
        )
        old = wh.read_at_version("t", v1)
        assert {r["v"] for r in old.collect()} == {"old"}
        assert {r["v"] for r in wh.read("t").filter("id = 1").collect()} == {
            "new"
        }
        with pytest.raises(FileNotFoundError):
            wh.read_at_version("t", 9999)

    def test_external_read_matches_spark_and_is_isolated(
        self, spark, wh_factory
    ):
        import duckdb

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(12)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        sql = wh.external_read_sql("t")
        got = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
        assert got == rows_of(wh, "t")
        # the emitted statement reads the PINNED snapshot: a later
        # merge must not change what it returns
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "X")], "id long, v string"),
            snapshot="m1",
        )
        again = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
        assert again == got
        # a fresh statement sees the merge
        fresh = dict(duckdb.sql(wh.external_read_sql("t")).fetchall())
        assert fresh[1] == "X"


class TestContractTimestampTravel:
    def test_timestamp_as_of_resolves_between_commits(
        self, spark, wh_factory
    ):
        import time as _time

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
            bucket=("id", 2),
        )
        v1 = head(wh, "t")
        _time.sleep(0.05)
        t_between = _time.time()
        _time.sleep(0.05)
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "b"), (2, "c")], "id long, v string"),
            snapshot="m1",
        )
        v2 = head(wh, "t")
        assert wh.version_at_timestamp("t", t_between) == v1
        assert wh.version_at_timestamp("t", _time.time()) == v2
        assert rows_of(wh, "t") != [(1, "a")]
        assert sorted(
            tuple(r) for r in wh.read_at_timestamp("t", t_between).collect()
        ) == [(1, "a")]
        # datetime and ISO-string spellings resolve identically
        import datetime as _dt

        dt = _dt.datetime.fromtimestamp(t_between, _dt.timezone.utc)
        assert wh.version_at_timestamp("t", dt) == v1
        assert wh.version_at_timestamp("t", dt.isoformat()) == v1

    def test_timestamp_before_history_raises(self, spark, wh_factory):
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        with pytest.raises(FileNotFoundError, match="at or before"):
            wh.version_at_timestamp("t", 1.0)  # 1970

    def test_restore_commit_carries_its_own_time(self, spark, wh_factory):
        # a restore republishes OLD state, but AS OF after-the-restore
        # must resolve to the restore commit (its publish time is now,
        # not the original's)
        import time as _time

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
            bucket=("id", 2),
        )
        v0 = head(wh, "t")
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "BAD")], "id long, v string"),
            snapshot="bad",
        )
        _time.sleep(0.05)
        wh.restore("t", v0)
        v_restore = head(wh, "t")
        assert wh.version_at_timestamp("t", _time.time()) == v_restore
        assert sorted(
            tuple(r)
            for r in wh.read_at_timestamp("t", _time.time()).collect()
        ) == [(1, "a")]


class TestContractTxnEpochs:
    def test_epoch_recorded_and_read_back(self, spark, wh_factory):
        wh = wh_factory()
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        assert wh.last_txn_epoch("app", "t") == -1
        wh.write("t", df, snapshot="s0", bucket=("id", 4), txn=("app", 0))
        assert wh.last_txn_epoch("app", "t") == 0
        wh.merge_bucketed(
            "t", spark.createDataFrame([(2, "b")], "id long, v string"),
            snapshot="m1", txn=("app", 1),
        )
        assert wh.last_txn_epoch("app", "t") == 1
        assert wh.last_txn_epoch("other", "t") == -1


class TestContractCompaction:
    def test_compact_preserves_rows_and_reduces_files(self, spark, wh_factory):
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(1, 13)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        # fragment: several single-row merges
        for i in (1, 2, 3):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(i, f"m{i}")], "id long, v string"),
                snapshot=f"m{i}",
            )
        before = rows_of(wh, "t")
        wh.compact("t")
        assert rows_of(wh, "t") == before


class TestDeltaProtocolFormat:
    """Delta-specific: the on-disk artifacts must be the PUBLIC Delta
    protocol shapes (PROTOCOL.md), so a real Delta reader can consume
    the table from the JSON log alone."""

    def test_first_commit_carries_protocol_and_metadata(self, spark, tmp_path):
        import json

        wh = DeltaWarehouse(spark, str(tmp_path / "d"))
        wh.write(
            "t", spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0", bucket=("id", 4),
        )
        log = os.path.join(wh.root, "t", "_delta_log")
        names = sorted(os.listdir(log))
        assert names == ["00000000000000000000.json"]  # 20-digit, v0
        actions = [
            json.loads(line)
            for line in open(os.path.join(log, names[0]))
            if line.strip()
        ]
        kinds = [next(iter(a)) for a in actions]
        # commitInfo leads (informational); protocol + metaData follow
        assert kinds[0] == "commitInfo"
        ci = actions[0]["commitInfo"]
        assert ci["operation"] and "timestamp" in ci
        assert kinds[1] == "protocol" and kinds[2] == "metaData"
        proto = actions[1]["protocol"]
        assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
        meta = actions[2]["metaData"]
        assert meta["format"] == {"provider": "parquet", "options": {}}
        assert meta["partitionColumns"] == ["__kb"]
        # schemaString parses back to the logical schema
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        assert [f.name for f in schema.fields] == ["id", "v"]
        adds = [a["add"] for a in actions if "add" in a]
        assert adds, "first commit must add data files"
        for a in adds:
            assert not os.path.isabs(a["path"])  # relative to table root
            assert a["dataChange"] is True
            assert "__kb" in a["partitionValues"]
            assert a["size"] > 0
            assert os.path.isfile(os.path.join(wh.root, "t", a["path"]))

    def test_merge_commit_is_o_affected_not_o_table(self, spark, tmp_path):
        import json

        wh = DeltaWarehouse(spark, str(tmp_path / "d"))
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(32)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 8),
        )
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "X")], "id long, v string"),
            snapshot="m1",
        )
        log = os.path.join(wh.root, "t", "_delta_log")
        actions = [
            json.loads(line)
            for line in open(os.path.join(log, "00000000000000000001.json"))
            if line.strip()
        ]
        removes = [a["remove"] for a in actions if "remove" in a]
        adds = [a["add"] for a in actions if "add" in a]
        # one bucket touched: ONLY its files are tombstoned + replaced;
        # the other 7 buckets are NOT mentioned (commit size is
        # O(affected buckets), not O(table))
        assert adds and removes
        buckets_mentioned = {a["partitionValues"]["__kb"] for a in adds} | {
            r["path"].split("__kb=")[1].split("/")[0] for r in removes
        }
        assert len(buckets_mentioned) == 1
        v0_actions = [
            json.loads(line)
            for line in open(os.path.join(log, "00000000000000000000.json"))
            if line.strip()
        ]
        v0_files = sum(1 for a in v0_actions if "add" in a)
        assert len(removes) < v0_files  # strictly partial rewrite

    def test_checkpoint_written_and_bounds_replay(self, spark, tmp_path):
        import json

        wh = DeltaWarehouse(spark, str(tmp_path / "d"), checkpoint_interval=5)
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, "base") for i in range(16)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        for i in range(1, 7):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(i, f"m{i}")], "id long, v string"),
                snapshot=f"m{i}",
            )
        log = os.path.join(wh.root, "t", "_delta_log")
        assert os.path.isfile(
            os.path.join(log, "00000000000000000005.checkpoint.parquet")
        )
        lc = json.load(open(os.path.join(log, "_last_checkpoint")))
        assert lc["version"] == 5
        # replay THROUGH the checkpoint equals replay from scratch:
        # delete nothing, just compare checkpointed state vs the same
        # table read with the checkpoint pointer removed
        with_ckpt = rows_of(wh, "t")
        os.remove(os.path.join(log, "_last_checkpoint"))
        assert rows_of(wh, "t") == with_ckpt
        # epochs and merges all present
        got = {r["id"]: r["v"] for r in wh.read("t").collect()}
        for i in range(1, 7):
            assert got[i] == f"m{i}"

    def test_vacuum_deletes_tombstones_and_breaks_old_time_travel(
        self, spark, tmp_path
    ):
        wh = DeltaWarehouse(spark, str(tmp_path / "d"))
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, "old") for i in range(8)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "new")], "id long, v string"),
            snapshot="m1",
        )
        # within retention: nothing deleted, time travel works
        assert wh.vacuum("t") == 0
        assert wh.read_at_version("t", 0).count() == 8
        # zero retention: tombstoned files go; v0 now raises
        deleted = wh.vacuum("t", retention_sec=0)
        assert deleted >= 1
        with pytest.raises(FileNotFoundError, match="vacuum"):
            wh.read_at_version("t", 0)
        # the CURRENT version is untouched
        got = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert got[1] == "new" and len(got) == 8

    def test_vacuum_sweeps_conflicted_writer_orphans(self, spark, tmp_path):
        wh = DeltaWarehouse(spark, str(tmp_path / "d"))
        wh.write(
            "t", spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        # simulate a crashed writer: claimed batch dir with a file,
        # never committed
        orphan = os.path.join(wh.root, "t", "batch-crashed")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "part-dead.parquet"), "wb") as fh:
            fh.write(b"x")
        assert wh.vacuum("t", retention_sec=0) == 1
        assert not os.path.isfile(os.path.join(orphan, "part-dead.parquet"))


class TestPipelineOverDelta:
    """The import pipeline runs unchanged over the Delta-format
    warehouse (PipelineConfig.warehouse_format='delta'): same dump
    lifecycle, keyed merges, bucketed pruning, ledger idempotency."""

    def _env(self, tmp_path, **cfg_kw):
        from canvas_data_loader_spark.plans.pipeline import PipelineConfig
        from canvas_data_loader_spark.sources.api_client import (
            CanvasDataApiClient,
            LocalDirTransport,
            gzip_tsv,
        )

        schema_json = {
            "version": "4.2.0",
            "schema": {
                "account_dim": {
                    "tableName": "account_dim",
                    "dw_type": "dimension",
                    "incremental": False,
                    "columns": [
                        {"name": "id", "type": "bigint"},
                        {"name": "name", "type": "varchar"},
                    ],
                },
            },
        }

        def dump(did, seq, created):
            return {
                "dumpId": did, "sequence": seq, "accountId": "self",
                "numFiles": 1, "finished": True, "expires": None,
                "createdAt": created, "updatedAt": created,
                "schemaVersion": "4.2.0",
            }

        def files(did, fname):
            return {
                "dumpId": did,
                "artifactsByTable": {
                    "account_dim": {
                        "partial": False,
                        "files": [
                            {"filename": fname, "url": f"u://{did}/{fname}"}
                        ],
                    }
                },
            }

        dumps = [
            dump("d1", 1, "2024-01-01T00:00:00Z"),
            dump("d2", 2, "2024-01-02T00:00:00Z"),
        ]
        files_by_dump = {
            "d1": files("d1", "account_dim-00000-aaa.gz"),
            "d2": files("d2", "account_dim-00000-bbb.gz"),
        }
        payloads = {
            "u://d1/account_dim-00000-aaa.gz": gzip_tsv(
                [[1, "a"], [2, "b"], [3, "c"]]
            ),
            "u://d2/account_dim-00000-bbb.gz": gzip_tsv([[2, "B2"], [4, "d"]]),
        }
        transport = LocalDirTransport(dumps, schema_json, files_by_dump, payloads)
        client = CanvasDataApiClient("key", "secret", transport)
        config = PipelineConfig(
            stage_dir=str(tmp_path / "stage"),
            warehouse_dir=str(tmp_path / "wh"),
            ledger_path=str(tmp_path / "ledger.jsonl"),
            warehouse_format="delta",
            **cfg_kw,
        )
        return client, config

    def test_two_dump_merge_and_idempotent_rerun(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.pipeline import ImportPipeline

        client, config = self._env(tmp_path)
        p = ImportPipeline(spark, client, config)
        assert isinstance(p.warehouse, DeltaWarehouse)
        results = p.run()
        assert [r.status for r in results] == ["successful", "successful"]
        assert rows_of(p.warehouse, "account_dim") == [
            (1, "a"), (2, "B2"), (3, "c"), (4, "d"),
        ]
        # the table is a real Delta log on disk
        assert os.path.isfile(
            os.path.join(
                config.warehouse_dir, "account_dim", "_delta_log",
                "00000000000000000000.json",
            )
        )
        v = p.warehouse.current_version("account_dim")
        # rerun: ledger skips both dumps, no new commits
        p.run()
        assert p.warehouse.current_version("account_dim") == v

    def test_bucketed_pipeline_over_delta_prunes(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.pipeline import ImportPipeline

        client, config = self._env(
            tmp_path, bucketed_tables={"account_dim": 4}
        )
        p = ImportPipeline(spark, client, config)
        p.run()
        assert p.warehouse.is_bucketed("account_dim")
        assert rows_of(p.warehouse, "account_dim") == [
            (1, "a"), (2, "B2"), (3, "c"), (4, "d"),
        ]


class TestStreamOverDelta:
    def test_stream_batches_merge_with_epochs(self, spark, tmp_path):
        from pyspark.sql import types as T

        from canvas_data_loader_spark.streaming.ingest import (
            apply_stream_batch,
        )

        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("val", T.StringType()),
                T.StructField("seq", T.LongType()),
            ]
        )
        wh = DeltaWarehouse(spark, str(tmp_path / "d"))
        b0 = spark.createDataFrame([(1, "v@0", 1)], schema)
        assert apply_stream_batch(wh, "t", ["id"], "seq", "app", b0, 0) is True
        assert wh.last_txn_epoch("app", "t") == 0
        # replay skipped
        assert apply_stream_batch(wh, "t", ["id"], "seq", "app", b0, 0) is False
        # bucketed delta table: stream takes the pruned merge
        wh2 = DeltaWarehouse(spark, str(tmp_path / "d2"))
        wh2.write(
            "t",
            spark.createDataFrame([(i, f"v{i}", 0) for i in range(1, 9)], schema),
            snapshot="s0",
            bucket=("id", 4),
        )
        b1 = spark.createDataFrame([(1, "NEW", 1)], schema)
        assert apply_stream_batch(wh2, "t", ["id"], "seq", "app", b1, 0) is True
        got = {r["id"]: r["val"] for r in wh2.read("t").collect()}
        assert got[1] == "NEW" and len(got) == 8
        # key mismatch on a bucketed table refuses loudly
        import pytest as _pytest

        with _pytest.raises(ValueError, match="bucketed on"):
            apply_stream_batch(wh2, "t", ["val"], None, "app", b1, 1)


class TestAutoMaintenance:
    """50 imports through the pipeline with auto_compact_min_files set:
    live file count and commit-log size stay BOUNDED (not O(imports)),
    contents stay correct, and the trigger fires through both commit-log
    impls. The write path owns maintenance — nobody has to remember to
    run OPTIMIZE."""

    @pytest.mark.parametrize("fmt", ["manifest", "delta"])
    def test_fifty_imports_stay_bounded(self, spark, tmp_path, fmt):
        import json as _json

        from canvas_data_loader_spark.plans.pipeline import (
            ImportPipeline,
            PipelineConfig,
        )
        from canvas_data_loader_spark.sources.api_client import (
            CanvasDataApiClient,
            LocalDirTransport,
            gzip_tsv,
        )

        n_dumps = 50
        schema_json = {
            "version": "4.2.0",
            "schema": {
                "account_dim": {
                    "tableName": "account_dim",
                    "dw_type": "dimension",
                    "incremental": False,
                    "columns": [
                        {"name": "id", "type": "bigint"},
                        {"name": "name", "type": "varchar"},
                    ],
                },
            },
        }
        dumps, files_by_dump, payloads = [], {}, {}
        for i in range(n_dumps):
            did = f"d{i:03d}"
            fname = f"account_dim-00000-{did}.gz"
            dumps.append(
                {
                    "dumpId": did, "sequence": i + 1, "accountId": "self",
                    "numFiles": 1, "finished": True, "expires": None,
                    "createdAt": f"2024-01-01T{i // 60:02d}:{i % 60:02d}:00Z",
                    "updatedAt": f"2024-01-01T{i // 60:02d}:{i % 60:02d}:00Z",
                    "schemaVersion": "4.2.0",
                }
            )
            files_by_dump[did] = {
                "dumpId": did,
                "artifactsByTable": {
                    "account_dim": {
                        "partial": False,
                        "files": [
                            {"filename": fname, "url": f"u://{did}/{fname}"}
                        ],
                    }
                },
            }
            # each dump updates one key and inserts one new key
            payloads[f"u://{did}/{fname}"] = gzip_tsv(
                [[1, f"v{i}"], [100 + i, f"new{i}"]]
            )
        transport = LocalDirTransport(dumps, schema_json, files_by_dump, payloads)
        client = CanvasDataApiClient("key", "secret", transport)
        threshold = 12
        config = PipelineConfig(
            stage_dir=str(tmp_path / "stage"),
            warehouse_dir=str(tmp_path / "wh"),
            ledger_path=str(tmp_path / "ledger.jsonl"),
            bucketed_tables={"account_dim": 4},
            warehouse_format=fmt,
            auto_compact_min_files=threshold,
        )
        p = ImportPipeline(spark, client, config)
        results = p.run()
        assert len(results) == n_dumps
        # contents correct: key 1 carries the LAST dump's value, every
        # insert survived
        rows = {r["id"]: r["name"] for r in p.warehouse.read("account_dim").collect()}
        assert rows[1] == f"v{n_dumps - 1}"
        assert all(rows[100 + i] == f"new{i}" for i in range(n_dumps))
        assert len(rows) == 1 + n_dumps
        # FILE COUNT bounded: a compaction drops to <= n_buckets files,
        # and at most `threshold` more accumulate before the next one
        files = p.warehouse.live_file_count("account_dim")
        assert files <= threshold + 4, f"{fmt}: {files} live files"
        # COMMIT-LOG size bounded
        if fmt == "manifest":
            cdir = os.path.join(config.warehouse_dir, "account_dim", "_commits")
            n_manifests = len([n for n in os.listdir(cdir) if n.endswith(".json")])
            assert n_manifests <= 25, f"commit log grew: {n_manifests}"
        else:
            # delta keeps the full JSON log but checkpoints bound REPLAY:
            # a reader processes only the tail past the last checkpoint
            log = os.path.join(
                config.warehouse_dir, "account_dim", "_delta_log"
            )
            lc = _json.load(open(os.path.join(log, "_last_checkpoint")))
            head = p.warehouse.current_version("account_dim")
            assert head - lc["version"] < p.warehouse.checkpoint_interval


class TestCompactionVsMergeRace:
    def test_concurrent_merge_and_compact_both_land(self, spark, wh_factory):
        # compaction is an optimization and must NEVER revert a merge:
        # run them concurrently; final state has the merge's rows and
        # a coherent (compacted or not) layout
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, "base") for i in range(16)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        for i in (1, 2):  # fragment a little
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(i, f"f{i}")], "id long, v string"),
                snapshot=f"f{i}",
            )
        errs = []

        def do_merge(w):
            try:
                w.merge_bucketed(
                    "t",
                    spark.createDataFrame([(3, "MERGED")], "id long, v string"),
                    snapshot="race-m",
                    max_commit_retries=25,
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        def do_compact(w):
            try:
                w.compact("t")
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        t1 = threading.Thread(target=do_merge, args=(wh_factory(),))
        t2 = threading.Thread(target=do_compact, args=(wh_factory(),))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert errs == [], errs
        got = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert got[3] == "MERGED" and got[1] == "f1" and len(got) == 16


class TestIndependentDeltaReader:
    """tools/delta_reader.py replays the log from scratch (no shared
    code with plans/delta.py) — a second implementation written only
    from the protocol must resolve the same state the writer claims."""

    def test_independent_replay_matches_writer_and_spark(
        self, spark, tmp_path
    ):
        import sys

        import duckdb

        sys.path.insert(0, os.path.join(REPO_ROOT := os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tools"))
        import delta_reader

        wh = DeltaWarehouse(spark, str(tmp_path / "d"), checkpoint_interval=3)
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, "base") for i in range(16)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
            txn=("app", 0),
        )
        for i in range(1, 5):  # crosses a checkpoint at v3
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(i, f"m{i}")], "id long, v string"),
                snapshot=f"m{i}",
                txn=("app", i),
            )
        tdir = os.path.join(wh.root, "t")
        state = delta_reader.replay(tdir)
        assert state["version"] == wh.current_version("t")
        assert state["txn"] == {"app": 4}
        assert state["protocol"] == {"minReaderVersion": 1, "minWriterVersion": 2}
        # identical live file sets, independently derived
        _, _, live, _, _ = wh._replay("t")
        assert set(state["files"]) == set(live)
        # identical rows through DuckDB off the independent reader's SQL
        got = sorted(
            tuple(r) for r in duckdb.sql(delta_reader.duckdb_sql(tdir)).fetchall()
        )
        assert got == rows_of(wh, "t")
        # time travel agrees too
        v0 = sorted(
            tuple(r)
            for r in duckdb.sql(delta_reader.duckdb_sql(tdir, version=0)).fetchall()
        )
        assert v0 == sorted(
            tuple(r) for r in wh.read_at_version("t", 0).collect()
        )

    def test_independent_reader_decodes_deletion_vectors(
        self, spark, tmp_path
    ):
        """The independent reader must also decode the writer's inline
        deletion vectors (Base85 + roaring bitmap) FROM THE DOCUMENTED
        FORMAT — a second decode implementation, so the DV bytes are
        proven against the format description, not merely against the
        writer's own reader."""
        import sys

        import duckdb

        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tools"))
        import delta_reader

        wh = DeltaWarehouse(spark, str(tmp_path / "dv"))
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, i % 3) for i in range(30)], "id long, v long"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        wh.delete_where("t", "v = 1", mode="mor")
        wh.delete_where("t", "id = 0", mode="mor")  # accumulates
        tdir = os.path.join(wh.root, "t")
        state = delta_reader.replay(tdir)
        assert state["protocol"]["minReaderVersion"] == 3
        positions = [
            p
            for a in state["files"].values()
            if a.get("deletionVector")
            for p in delta_reader.decode_deletion_vector(a["deletionVector"])
        ]
        assert len(positions) == 11  # 10 with v==1, plus id 0
        got = sorted(
            tuple(r)
            for r in duckdb.sql(delta_reader.duckdb_sql(tdir)).fetchall()
        )
        assert got == rows_of(wh, "t")
        assert all(v != 1 for _, v in got) and (0, 0) not in got


class TestDeltaDataSkipping:
    """add-action stats (numRecords / per-column min-max from parquet
    footers) + file-level range pruning — the protocol's data-skipping
    mechanism, which is the scan optimization that matters at 100 TB."""

    def test_stats_recorded_in_log(self, spark, tmp_path):
        import json

        wh = DeltaWarehouse(spark, str(tmp_path / "d"))
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(100)], "id long, v string"
            ).coalesce(1),
            snapshot="s0",
        )
        log = os.path.join(wh.root, "t", "_delta_log")
        actions = [
            json.loads(line)
            for line in open(os.path.join(log, "00000000000000000000.json"))
            if line.strip()
        ]
        adds = [a["add"] for a in actions if "add" in a]
        assert adds
        st = json.loads(adds[0]["stats"])
        assert st["numRecords"] == 100
        assert st["minValues"]["id"] == 0 and st["maxValues"]["id"] == 99
        assert st["minValues"]["v"] == "v0"  # utf8 footer stats decoded

    def test_range_read_skips_disjoint_files(self, spark, tmp_path):
        wh = DeltaWarehouse(spark, str(tmp_path / "d"))
        # 4 files with DISJOINT id ranges (range partitioning)
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(400)], "id long, v string"
        ).repartitionByRange(4, "id")
        wh.write("t", df, snapshot="s0")
        kept, total = wh.files_for_range("t", "id", lo=50, hi=60)
        assert total == 4 and len(kept) == 1, (kept, total)
        got = sorted(r["id"] for r in wh.read_where("t", "id", 50, 60).collect())
        assert got == list(range(50, 61))
        # open-ended ranges prune too
        kept_hi, _ = wh.files_for_range("t", "id", lo=350)
        assert len(kept_hi) == 1
        # a column with no stats in some file: conservatively kept
        kept_all, _ = wh.files_for_range("t", "nonexistent", lo=0, hi=1)
        assert len(kept_all) == 4

    def test_partial_rowgroup_stats_invalidate_column(self, monkeypatch):
        """A row group with NO statistics object invalidates the
        column's nullCount AND min/max in the emitted add-action stats:
        a partial sum/range over only the groups that carry stats would
        overclaim and mis-prune (IS NULL / range proofs). Invalidation
        is permanent regardless of which group lacks stats."""
        import json

        import pyarrow.parquet as pq

        from canvas_data_loader_spark.plans import stats as stats_mod

        class St:
            def __init__(self, mn, mx, nulls):
                self.has_min_max = True
                self.min, self.max = mn, mx
                self.has_null_count = True
                self.null_count = nulls

        class Col:
            def __init__(self, name, st):
                self.path_in_schema = name
                self.statistics = st

        class RG:
            def __init__(self, cols):
                self._cols = cols
                self.num_columns = len(cols)

            def column(self, i):
                return self._cols[i]

        groups = [
            RG([Col("a", St(0, 4, 0)), Col("b", St(0, 4, 0)), Col("c", None)]),
            RG([Col("a", St(5, 9, 0)), Col("b", None), Col("c", St(0, 9, 0))]),
        ]

        class MD:
            num_rows = 10
            num_row_groups = 2

            def row_group(self, i):
                return groups[i]

        class PF:
            def __init__(self, path):
                self.metadata = MD()

        monkeypatch.setattr(pq, "ParquetFile", PF)
        st = json.loads(stats_mod._file_stats("ignored"))
        # full coverage → usable stats
        assert st["minValues"]["a"] == 0 and st["maxValues"]["a"] == 9
        assert st["nullCount"]["a"] == 0
        # stats-less group AFTER a stats-bearing one → no partial claims
        assert "b" not in st["minValues"] and "b" not in st["maxValues"]
        assert "b" not in st["nullCount"]
        # stats-less group BEFORE a stats-bearing one → same (no re-add)
        assert "c" not in st["minValues"] and "c" not in st["maxValues"]
        assert "c" not in st["nullCount"]

    def test_skipping_survives_merge_and_checkpoint(self, spark, tmp_path):
        wh = DeltaWarehouse(spark, str(tmp_path / "d"), checkpoint_interval=2)
        df = spark.createDataFrame(
            [(i, "base") for i in range(400)], "id long, v string"
        ).repartitionByRange(4, "id")
        wh.write("t", df, snapshot="s0", bucket=("id", 4))
        for i in (1, 2):  # cross the checkpoint at v2
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(i, f"m{i}")], "id long, v string"),
                snapshot=f"m{i}",
            )
        # stats flow through merge-written files and checkpoint replay
        _, _, live, _, _ = wh._replay("t")
        assert all(a.get("stats") for a in live.values())
        got = {r["id"]: r["v"] for r in wh.read_where("t", "id", 1, 2).collect()}
        assert got == {1: "m1", 2: "m2"}


class TestCommitBodyAtomicity:
    """Round-8 hardening: commits publish via write-temp + fsync +
    hard-link (put-if-absent on the link), so a claimed commit number
    can never hold a truncated body. These tests pin the mechanics."""

    def test_leftover_tmp_does_not_break_reads_and_is_swept(
        self, spark, wh_factory
    ):
        import time as _time

        wh = wh_factory()
        wh.write(
            "t", spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        # simulate a crashed writer's leaked temp body
        log_dir = os.path.join(
            wh.root, "t",
            "_delta_log" if isinstance(wh, DeltaWarehouse) else "_commits",
        )
        leak = os.path.join(log_dir, ".tmp-deadbeef")
        with open(leak, "w") as fh:
            fh.write('{"partial": ')  # truncated JSON on purpose
        old = _time.time() - 7 * 24 * 3600
        os.utime(leak, (old, old))
        # reads ignore it entirely
        assert rows_of(wh, "t") == [(1, "a")]
        # the maintenance sweep removes it once older than the TTL
        if isinstance(wh, DeltaWarehouse):
            wh.vacuum("t")
        else:
            wh._prune("t")
        assert not os.path.exists(leak)

    def test_conflict_still_raises_and_leaves_no_tmp(self, spark, wh_factory):
        a, b = wh_factory(), wh_factory()
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        a.write("t", df, snapshot="s1", expected_version=a.GENESIS_VERSION)
        with pytest.raises(CommitConflict):
            b.write(
                "t", df, snapshot="s1b", expected_version=b.GENESIS_VERSION
            )
        log_dir = os.path.join(
            a.root, "t",
            "_delta_log" if isinstance(a, DeltaWarehouse) else "_commits",
        )
        assert not [f for f in os.listdir(log_dir) if f.startswith(".tmp-")]


class TestPruneVsInFlightReader:
    """Round-8 race fix (found by the merge-vs-compact stress): a
    commit that repoints every bucket at once made the PREVIOUS
    manifest's directories instantly unreferenced, and _prune deleted
    them out from under any in-flight reader planned against that
    manifest. Two-layer fix: retention keeps the union of the last
    `retain` manifests' references, and CAS writes translate residual
    mid-job missing-file failures into retryable CommitConflict."""

    def test_retention_keeps_previous_manifests_references(
        self, spark, tmp_path
    ):
        wh = Warehouse(spark, str(tmp_path / "wh"))
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(8)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "m")], "id long, v string"),
            snapshot="m1",
        )
        # compaction repoints ALL buckets away from s0/m1 — but both
        # stay on disk because the previous manifests still reference
        # them (an in-flight reader may be consuming either)
        wh.compact("t")
        assert os.path.isdir(os.path.join(wh.root, "t", "s0"))
        assert os.path.isdir(os.path.join(wh.root, "t", "m1"))

    def test_stale_cas_write_over_pruned_base_raises_conflict(
        self, spark, tmp_path
    ):
        # retain=1 collapses the safety window to zero, making the
        # residual race deterministic: the CAS write's job reads files
        # _prune already removed -> must surface as CommitConflict
        # (caller re-derives), never a raw Py4J FileNotFound crash
        wh = Warehouse(spark, str(tmp_path / "wh"), retain=1)
        wh.write(
            "t", spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        base, old = wh.read_versioned("t")
        wh.write(
            "t", spark.createDataFrame([(2, "b")], "id long, v string"),
            snapshot="s1",
        )  # retain=1: s0's files are pruned here
        assert not os.path.isdir(os.path.join(wh.root, "t", "s0"))
        with pytest.raises(CommitConflict):
            wh.write("t", old, snapshot="s2", expected_version=base)


class TestRebucketAndRestore:
    """Round-8 ops written against the shared contract: rebucket (one
    impl serves both warehouses — plans/ops.py) and restore (the
    forward-history rollback; same name/signature on both impls)."""

    def test_rebucket_changes_layout_and_merges_prune_on_it(
        self, spark, wh_factory
    ):
        from canvas_data_loader_spark.plans.ops import rebucket

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(32)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 2),
        )
        rebucket(wh, "t", 8)
        assert wh.routing_info("t")["bucket_key"] == "id"
        assert rows_of(wh, "t") == sorted((i, f"v{i}") for i in range(32))
        # merges now prune against the 8-bucket layout
        affected = wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "X")], "id long, v string"),
            snapshot="m1",
        )
        assert len(affected) == 1
        got = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert got[1] == "X" and len(got) == 32

    def test_rebucket_plain_table_requires_key(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import rebucket

        wh = wh_factory()
        wh.write(
            "t", spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        with pytest.raises(ValueError, match="pass key="):
            rebucket(wh, "t", 4)
        rebucket(wh, "t", 4, key="id")
        assert wh.is_bucketed("t")
        assert rows_of(wh, "t") == [(1, "a")]

    def test_restore_rolls_back_data_but_not_history_or_epochs(
        self, spark, wh_factory
    ):
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, "old") for i in range(8)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
            txn=("app", 0),
        )
        v_good = head(wh, "t")
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "BAD")], "id long, v string"),
            snapshot="bad", txn=("app", 1),
        )
        v_bad = head(wh, "t")
        new_head = wh.restore("t", v_good)
        assert new_head > v_bad  # history moves FORWARD
        assert {r["v"] for r in wh.read("t").collect()} == {"old"}
        # the bad state is still time-travelable (nothing rewound)
        bad = wh.read_at_version("t", v_bad)
        assert {r["v"] for r in bad.filter("id = 1").collect()} == {"BAD"}
        # writer epochs carried forward, NOT rolled back: a replayed
        # stream batch 1 must still be recognized as seen
        assert wh.last_txn_epoch("app", "t") == 1
        # and the table keeps merging normally after the restore
        wh.merge_bucketed(
            "t", spark.createDataFrame([(2, "NEW")], "id long, v string"),
            snapshot="m2",
        )
        got = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert got[2] == "NEW" and got[1] == "old"

    def test_restore_unknown_version_raises(self, spark, wh_factory):
        wh = wh_factory()
        wh.write(
            "t", spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        with pytest.raises(FileNotFoundError):
            wh.restore("t", 9999)


class TestContractDataSkipping:
    """files_for_range / read_where are contract surface on BOTH impls
    (Delta: stats in add actions; manifest: per-snapshot _stats.json
    sidecars). Same semantics: provably-disjoint files skipped,
    stat-less files conservatively kept, residual filter applied."""

    def test_range_read_prunes_and_matches_filter(self, spark, wh_factory):
        wh = wh_factory()
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(400)], "id long, v string"
        ).repartitionByRange(4, "id")
        wh.write("t", df, snapshot="s0")
        kept, total = wh.files_for_range("t", "id", lo=50, hi=60)
        assert total == 4 and len(kept) == 1, (kept, total)
        got = sorted(
            r["id"] for r in wh.read_where("t", "id", 50, 60).collect()
        )
        assert got == list(range(50, 61))
        want = sorted(
            r["id"]
            for r in wh.read("t").filter("id between 50 and 60").collect()
        )
        assert got == want
        # unknown column: nothing provable, everything kept
        kept_all, _ = wh.files_for_range("t", "nope", lo=0, hi=1)
        assert len(kept_all) == 4

    def test_bucketed_range_read(self, spark, wh_factory):
        wh = wh_factory()
        df = spark.createDataFrame(
            [(i, i * 10) for i in range(64)], "id long, score long"
        )
        wh.write("t", df, snapshot="s0", bucket=("id", 4))
        # score correlates with nothing bucket-wise, so pruning on
        # score is weak — correctness is what's under test here
        got = sorted(
            tuple(r) for r in wh.read_where("t", "score", 100, 200).collect()
        )
        want = sorted(
            tuple(r)
            for r in wh.read("t").filter("score between 100 and 200").collect()
        )
        assert got == want and len(got) == 11


class TestManifestSkippingEvolved:
    def test_renamed_column_range_prunes_old_files(self, spark, tmp_path):
        # files written before a RENAME carry the old physical name in
        # their stats; a range on the CURRENT name must still prune
        # them via the manifest's rename chain
        wh = Warehouse(spark, str(tmp_path / "wh"))
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, i * 10) for i in range(64)], "id long, cnt int"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        batch = spark.createDataFrame(
            [(1, 999)], "id long, total int"
        )
        wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True, renames={"cnt": "total"},
        )
        kept, total = wh.files_for_range("t", "total", lo=5000, hi=9000)
        # every pre-rename file has cnt <= 630 and the merge file holds
        # 999 — ALL files are provably disjoint from [5000, 9000]
        assert kept == [] and total >= 4
        assert wh.read_where("t", "total", 5000, 9000).count() == 0
        # and an intersecting range still resolves through the chain
        got = {r["id"]: r["total"] for r in wh.read_where("t", "total", 990, 1000).collect()}
        assert got == {1: 999}


class TestContractChangeFeed:
    """table_changes (plans/ops.py): Delta-CDF-shaped change feed
    between two retained commits, computed on O(changed buckets) via
    each impl's changed_buckets/read_buckets_at_version primitives."""

    def test_merge_produces_pruned_update_and_insert_feed(
        self, spark, wh_factory
    ):
        from canvas_data_loader_spark.plans.ops import table_changes

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(32)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 8),
        )
        v0 = head(wh, "t")
        wh.merge_bucketed(
            "t",
            spark.createDataFrame(
                [(1, "UPD"), (100, "NEW")], "id long, v string"
            ),
            snapshot="m1",
        )
        v1 = head(wh, "t")
        # pruning: only the touched buckets differ
        changed = wh.changed_buckets("t", v0, v1)
        assert changed is not None and 1 <= len(changed) <= 2
        feed = table_changes(wh, "t", v0, v1)
        got = sorted(
            (r["id"], r["v"], r["_change_type"]) for r in feed.collect()
        )
        assert got == [
            (1, "UPD", "update_postimage"),
            (1, "v1", "update_preimage"),
            (100, "NEW", "insert"),
        ]

    def test_no_change_interval_is_metadata_only_empty(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import table_changes

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
            bucket=("id", 4),
        )
        v0 = head(wh, "t")
        feed = table_changes(wh, "t", v0, v0)
        assert feed.columns == ["id", "v", "_change_type"]
        assert feed.count() == 0

    def test_restore_shows_deletes(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import table_changes

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
            bucket=("id", 4),
        )
        v0 = head(wh, "t")
        wh.merge_bucketed(
            "t", spark.createDataFrame([(2, "b")], "id long, v string"),
            snapshot="m1",
        )
        v1 = head(wh, "t")
        wh.restore("t", v0)
        v2 = head(wh, "t")
        got = sorted(
            (r["id"], r["_change_type"])
            for r in table_changes(wh, "t", v1, v2).collect()
        )
        assert got == [(2, "delete")]

    def test_unbucketed_falls_back_to_full_diff(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import table_changes

        wh = wh_factory()
        wh.write(
            "t", spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
            snapshot="s0",
        )
        v0 = head(wh, "t")
        wh.write(
            "t", spark.createDataFrame([(1, "a"), (3, "c")], "id long, v string"),
            snapshot="s1",
        )
        v1 = head(wh, "t")
        assert wh.changed_buckets("t", v0, v1) is None
        got = sorted(
            (r["id"], r["_change_type"])
            for r in table_changes(wh, "t", v0, v1, key="id").collect()
        )
        assert got == [(2, "delete"), (3, "insert")]


class TestApplyChangesReconstruction:
    def test_feed_applied_downstream_reproduces_new_version(
        self, spark, wh_factory
    ):
        # the completeness invariant that makes the feed trustworthy:
        # FROM-version table + feed == TO-version table, exactly
        from canvas_data_loader_spark.plans.ops import (
            apply_changes,
            table_changes,
        )

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(24)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        v0 = head(wh, "t")
        wh.merge_bucketed(
            "t",
            spark.createDataFrame(
                [(3, "U3"), (7, "U7"), (200, "NEW")], "id long, v string"
            ),
            snapshot="m1",
        )
        wh.restore("t", v0)  # introduces deletes in the next interval
        wh.merge_bucketed(
            "t", spark.createDataFrame([(5, "U5")], "id long, v string"),
            snapshot="m2",
        )
        v_final = head(wh, "t")
        feed = table_changes(wh, "t", v0, v_final)
        downstream = apply_changes(
            wh.read_at_version("t", v0), feed, "id"
        )
        assert sorted(tuple(r) for r in downstream.collect()) == sorted(
            tuple(r) for r in wh.read("t").collect()
        )


class TestContractTableProperties:
    """User table properties (TBLPROPERTIES): manifest ``props`` field
    vs Delta ``metaData.configuration`` — one merge rule (overlay;
    None unsets), carried forward across data commits, rolled back by
    restore, and never leaking the engine's bucket-routing keys."""

    def test_props_written_read_and_carried_through_commits(
        self, spark, wh_factory
    ):
        wh = wh_factory()
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(12)], "id long, v string"
        )
        wh.write(
            "t", df, snapshot="s0", bucket=("id", 4),
            props={"owner": "etl", "tier": "gold"},
        )
        assert wh.table_properties("t") == {"owner": "etl", "tier": "gold"}
        # survives a merge (which builds its commit independently)
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "U")], "id long, v string"),
            snapshot="m1",
        )
        assert wh.table_properties("t") == {"owner": "etl", "tier": "gold"}
        # survives compaction
        wh.compact("t")
        assert wh.table_properties("t") == {"owner": "etl", "tier": "gold"}
        # survives a full replace with no props argument
        wh.write("t", df, snapshot="s1", bucket=("id", 4))
        assert wh.table_properties("t") == {"owner": "etl", "tier": "gold"}

    def test_set_properties_overlay_unset_and_cas(self, spark, wh_factory):
        wh = wh_factory()
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        wh.write("t", df, snapshot="s0", props={"a": "1", "b": "2"})
        v = wh.set_properties("t", {"b": None, "c": "3"})
        assert wh.table_properties("t") == {"a": "1", "c": "3"}
        assert head(wh, "t") == v  # metadata-only commit advanced the head
        # data untouched by the metadata-only commit
        assert rows_of(wh, "t") == [(1, "a")]
        # values stringify (Delta configuration is map<string,string>)
        wh.set_properties("t", {"n": 7})
        assert wh.table_properties("t")["n"] == "7"

    def test_restore_rolls_back_properties(self, spark, wh_factory):
        wh = wh_factory()
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        wh.write("t", df, snapshot="s0", props={"stage": "raw"})
        v0 = head(wh, "t")
        wh.set_properties("t", {"stage": "curated"})
        assert wh.table_properties("t") == {"stage": "curated"}
        wh.restore("t", v0)
        assert wh.table_properties("t") == {"stage": "raw"}

    def test_bucket_routing_keys_never_reported_or_lost(
        self, spark, wh_factory
    ):
        wh = wh_factory()
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id long, v string"
        )
        wh.write("t", df, snapshot="s0", bucket=("id", 4), props={"x": "y"})
        assert "spark_graft.bucket_key" not in wh.table_properties("t")
        # setting properties must not clobber bucket routing
        wh.set_properties("t", {"x": "z"})
        assert wh.is_bucketed("t")
        assert wh.routing_info("t")["bucket_key"] == "id"
        wh.merge_bucketed(
            "t", spark.createDataFrame([(2, "U")], "id long, v string"),
            snapshot="m1",
        )
        assert wh.table_properties("t") == {"x": "z"}

    def test_missing_table_is_empty(self, spark, wh_factory):
        wh = wh_factory()
        assert wh.table_properties("nope") == {}


class TestContractMaterializedViews:
    """create_rollup_view / refresh_rollup_view (plans/ops.py): a
    grouped rollup materialized as a warehouse table, its definition
    in table properties and its source watermark in the txn map,
    refreshed INCREMENTALLY from the change feed. The exactness bar is
    equality — decimal sums make maintained == recomputed exact, so
    every assertion here compares collected sets, not approximations."""

    @staticmethod
    def _facts(spark, n=32):
        return spark.createDataFrame(
            [(i, f"g{i % 4}", i * 10) for i in range(n)],
            "id long, grp string, amount long",
        )

    @staticmethod
    def _recompute(wh, source, keys=("grp",), sums={"total": "amount"}):
        from canvas_data_loader_spark.operators.ivm import build_rollup

        return sorted(
            tuple(r)
            for r in build_rollup(wh.read(source), list(keys), dict(sums))
            .collect()
        )

    def _mk(self, spark, wh):
        from canvas_data_loader_spark.plans.ops import create_rollup_view

        wh.write("facts", self._facts(spark), snapshot="s0", bucket=("id", 8))
        create_rollup_view(
            wh, "facts_by_grp", "facts", ["grp"], {"total": "amount"}
        )

    def test_create_matches_full_recompute(self, spark, wh_factory):
        wh = wh_factory()
        self._mk(spark, wh)
        assert (
            sorted(tuple(r) for r in wh.read("facts_by_grp").collect())
            == self._recompute(wh, "facts")
        )

    def test_incremental_refresh_exact_and_noop(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import refresh_rollup_view

        wh = wh_factory()
        self._mk(spark, wh)
        # update two rows, insert one — retraction and addition paths
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(1, "g1", 99999), (2, "g2", -5), (500, "g0", 7)],
                "id long, grp string, amount long",
            ),
            snapshot="m1",
        )
        out = refresh_rollup_view(wh, "facts_by_grp")
        assert out["mode"] == "incremental"
        assert (
            sorted(tuple(r) for r in wh.read("facts_by_grp").collect())
            == self._recompute(wh, "facts")
        )
        # replaying the refresh with nothing new is a no-op: no commit
        head_before = head(wh, "facts_by_grp")
        assert refresh_rollup_view(wh, "facts_by_grp")["mode"] == "noop"
        assert head(wh, "facts_by_grp") == head_before

    def test_refresh_reads_only_changed_buckets(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import refresh_rollup_view

        wh = wh_factory()
        self._mk(spark, wh)
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(3, "g3", 1234)], "id long, grp string, amount long"
            ),
            snapshot="m1",
        )
        seen = []
        orig = wh.read_buckets_at_version

        def spy(table, version, bucket_ids):
            seen.append((table, sorted(bucket_ids)))
            return orig(table, version, bucket_ids)

        wh.read_buckets_at_version = spy
        assert refresh_rollup_view(wh, "facts_by_grp")["mode"] == "incremental"
        # the feed read exactly the one bucket id=3 hashes to, at both
        # versions — never the whole fact table
        assert seen and all(len(b) == 1 for _, b in seen)

    def test_pruned_horizon_falls_back_to_full(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import refresh_rollup_view

        wh = wh_factory()
        self._mk(spark, wh)
        # full rewrites repoint every bucket, so the watermark commit's
        # snapshot leaves every retained manifest's reference set and
        # is pruned (merge chains, by contrast, keep old snapshots
        # referenced through untouched buckets — the horizon survives
        # them, which the incremental tests above rely on)
        for i in range(4):
            wh.write(
                "facts",
                self._facts(spark, n=16 + i),
                snapshot=f"r{i}",
                bucket=("id", 8),
            )
        if hasattr(wh, "vacuum"):
            wh.checkpoint("facts")
            wh.vacuum("facts", retention_sec=0.0)
        out = refresh_rollup_view(wh, "facts_by_grp")
        assert out["mode"] == "full"
        assert (
            sorted(tuple(r) for r in wh.read("facts_by_grp").collect())
            == self._recompute(wh, "facts")
        )

    def test_source_recreated_watermark_ahead_rebuilds(
        self, spark, wh_factory
    ):
        from canvas_data_loader_spark.plans.ops import refresh_rollup_view

        wh = wh_factory()
        self._mk(spark, wh)
        # drop + recreate the source: its version numbering restarts
        # below the view's recorded watermark
        wh.drop("facts")
        wh.write(
            "facts", self._facts(spark, n=8), snapshot="s0", bucket=("id", 8)
        )
        out = refresh_rollup_view(wh, "facts_by_grp")
        assert out["mode"] == "full"
        assert (
            sorted(tuple(r) for r in wh.read("facts_by_grp").collect())
            == self._recompute(wh, "facts")
        )

    def test_refresh_on_non_view_raises(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import refresh_rollup_view

        wh = wh_factory()
        wh.write(
            "plain",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        with pytest.raises(ValueError, match="not a materialized view"):
            refresh_rollup_view(wh, "plain")


class TestWriterEpochDurability:
    """Round-9 review findings: writer epochs (the txn map) must
    survive EVERY commit — the Delta read side max-folds txn actions
    across the whole log, so the manifest impl must materialize the
    same semantics at write time — and a stale epoch can never
    regress a watermark or republish its batch's data."""

    SCHEMA = "id long, v string, seq long"

    def _mk(self, spark, wh):
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}", 0) for i in range(1, 9)], self.SCHEMA
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "b7", 7)], self.SCHEMA),
            snapshot="m7",
            txn=("app", 7),
        )
        assert wh.last_txn_epoch("app", "t") == 7

    def test_epochs_survive_txnless_merge(self, spark, wh_factory):
        wh = wh_factory()
        self._mk(spark, wh)
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(2, "etl", 0)], self.SCHEMA),
            snapshot="etl",
        )
        assert wh.last_txn_epoch("app", "t") == 7

    def test_epochs_survive_txnless_full_write(self, spark, wh_factory):
        wh = wh_factory()
        self._mk(spark, wh)
        wh.write(
            "t",
            spark.createDataFrame([(9, "re", 0)], self.SCHEMA),
            snapshot="rewrite",
            bucket=("id", 4),
        )
        assert wh.last_txn_epoch("app", "t") == 7

    def test_stale_epoch_merge_skipped_entirely(self, spark, wh_factory):
        """A merge carrying an epoch <= the recorded one is a replay /
        split-brain loser: it must publish NOTHING (no commit, no data
        change) — the CAS retry loop must not re-derive it over newer
        data."""
        wh = wh_factory()
        self._mk(spark, wh)
        head = head_of(wh, "t")
        out = wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "STALE", 5)], self.SCHEMA),
            snapshot="stale",
            txn=("app", 5),
        )
        assert out == []
        assert head_of(wh, "t") == head
        assert wh.last_txn_epoch("app", "t") == 7
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert rows[1] == "b7"  # the newer batch's value survived

    def test_record_txn_never_regresses(self, spark, wh_factory):
        wh = wh_factory()
        self._mk(spark, wh)
        wh.record_txn("t", "app", 5)  # stale watermark advance
        assert wh.last_txn_epoch("app", "t") == 7


def head_of(wh, table):
    return wh.current_version(table)


class TestContractMinMaxViews:
    """create_minmax_view / refresh_minmax_view (plans/ops.py):
    MIN/MAX — the aggregates the rollup lane refuses as
    non-retractable — maintained at O(changed buckets) through a
    per-(bucket, group) partials sidecar. The exactness bar is the
    same equality: maintained == rebuilt-from-head after EVERY kind of
    change, including deleting a group's minimum (the case delta
    propagation cannot express and the reason the sidecar exists)."""

    @staticmethod
    def _facts(spark, n=32):
        return spark.createDataFrame(
            [(i, f"g{i % 4}", i * 10) for i in range(n)],
            "id long, grp string, amount long",
        )

    AGGS = {"lo": ("amount", "min"), "hi": ("amount", "max")}

    def _recompute(self, wh, source="facts"):
        src = wh.read(source)
        return sorted(
            tuple(r)
            for r in src.groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min("amount").alias("lo"),
                F.max("amount").alias("hi"),
            )
            .collect()
        )

    def _view(self, wh):
        return sorted(tuple(r) for r in wh.read("mm").collect())

    def _mk(self, spark, wh):
        from canvas_data_loader_spark.plans.ops import create_minmax_view

        wh.write("facts", self._facts(spark), snapshot="s0", bucket=("id", 8))
        create_minmax_view(wh, "mm", "facts", ["grp"], self.AGGS)

    def test_create_matches_full_recompute(self, spark, wh_factory):
        wh = wh_factory()
        self._mk(spark, wh)
        assert self._view(wh) == self._recompute(wh)

    def test_unbucketed_source_refused(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import create_minmax_view

        wh = wh_factory()
        wh.write("plainsrc", self._facts(spark), snapshot="s0")
        with pytest.raises(ValueError, match="BUCKETED"):
            create_minmax_view(wh, "mm", "plainsrc", ["grp"], self.AGGS)

    def test_create_refuses_to_clobber_non_view(self, spark, wh_factory):
        """A plain table under the view's (or the partials sidecar's)
        name is someone's DATA — never silently full-replaced
        (round-9 review finding: the guard let mv.source=None pass)."""
        from canvas_data_loader_spark.plans.ops import create_minmax_view

        wh = wh_factory()
        wh.write("facts", self._facts(spark), snapshot="s0", bucket=("id", 8))
        wh.write("mm", spark.range(3), snapshot="s0")
        with pytest.raises(ValueError, match="refusing to overwrite"):
            create_minmax_view(wh, "mm", "facts", ["grp"], self.AGGS)
        wh.write("mm2__partials", spark.range(3), snapshot="s0")
        with pytest.raises(ValueError, match="refusing to overwrite"):
            create_minmax_view(wh, "mm2", "facts", ["grp"], self.AGGS)
        assert wh.read("mm").count() == 3  # untouched

    def test_source_rewritten_unbucketed_raises_cleanly(
        self, spark, wh_factory
    ):
        """Source fully replaced WITHOUT bucketing while the key
        column still exists: the refresh must raise its documented
        no-change-unit error, not TypeError int(None) (round-9
        review finding)."""
        from canvas_data_loader_spark.plans.ops import refresh_minmax_view

        wh = wh_factory()
        self._mk(spark, wh)
        wh.write("facts", self._facts(spark, n=6), snapshot="flat")  # unbucketed
        with pytest.raises(ValueError, match="no longer bucketed"):
            refresh_minmax_view(wh, "mm")

    def test_maintained_through_update_insert_delete(
        self, spark, wh_factory
    ):
        """The full change matrix, each step refreshed incrementally
        and pinned equal to a rebuild — including the non-retractable
        case: deleting the row that WAS a group's minimum must surface
        the next-smallest survivor, and deleting a whole group must
        drop its view row."""
        from canvas_data_loader_spark.plans.ops import refresh_minmax_view

        wh = wh_factory()
        self._mk(spark, wh)
        # update: raise one row, lower another (max and min both move)
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(1, "g1", 99999), (2, "g2", -5), (500, "g0", 7)],
                "id long, grp string, amount long",
            ),
            snapshot="m1",
        )
        out = refresh_minmax_view(wh, "mm")
        assert out["mode"] == "incremental"
        assert self._view(wh) == self._recompute(wh)
        # delete the CURRENT MINIMUM of g2 (id=2, amount=-5, mor DV):
        # the view must recover the next-smallest from surviving rows
        wh.delete_where("facts", F.col("id") == 2, mode="mor")
        out = refresh_minmax_view(wh, "mm")
        assert out["mode"] == "incremental"
        assert self._view(wh) == self._recompute(wh)
        assert all(r[0] != -5 for r in self._view(wh))
        # delete an entire group: its row disappears from the view
        wh.delete_where("facts", F.col("grp") == "g3")
        refresh_minmax_view(wh, "mm")
        assert self._view(wh) == self._recompute(wh)
        assert not any(r[0] == "g3" for r in self._view(wh))

    def test_noop_and_maintenance_advance(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import refresh_minmax_view

        wh = wh_factory()
        self._mk(spark, wh)
        head_before = head(wh, "mm")
        assert refresh_minmax_view(wh, "mm")["mode"] == "noop"
        assert head(wh, "mm") == head_before
        # compaction repoints buckets without changing rows: the
        # refresh advances watermarks with txn-only commits, zero IO
        wh.compact("facts")
        out = refresh_minmax_view(wh, "mm")
        assert out["mode"] == "advance"
        assert self._view(wh) == self._recompute(wh)
        assert refresh_minmax_view(wh, "mm")["mode"] == "noop"

    def test_refresh_reads_only_changed_buckets(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import refresh_minmax_view

        wh = wh_factory()
        self._mk(spark, wh)
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(3, "g3", 1234)], "id long, grp string, amount long"
            ),
            snapshot="m1",
        )
        seen = []
        orig = wh.read_buckets_at_version

        def spy(table, version, bucket_ids):
            seen.append((table, sorted(bucket_ids)))
            return orig(table, version, bucket_ids)

        wh.read_buckets_at_version = spy
        assert refresh_minmax_view(wh, "mm")["mode"] == "incremental"
        # exactly the one bucket id=3 hashes to, never the fact table
        assert seen and all(len(b) == 1 for _, b in seen)

    def test_crash_between_partials_and_view_heals(self, spark, wh_factory):
        """Partials committed, view commit never landed (crash between
        the pair): the next refresh detects the partials watermark
        ahead of the view's and re-finalizes WITHOUT touching the
        fact table."""
        from canvas_data_loader_spark.plans.ops import refresh_minmax_view

        wh = wh_factory()
        self._mk(spark, wh)
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(7, "g3", -777)], "id long, grp string, amount long"
            ),
            snapshot="m1",
        )
        # crash injection: the view publish (2nd write) dies
        orig_write = wh.write
        calls = {"n": 0}

        def dying_write(table, *a, **kw):
            if table == "mm":
                raise RuntimeError("injected crash before view publish")
            return orig_write(table, *a, **kw)

        wh.write = dying_write
        with pytest.raises(RuntimeError, match="injected crash"):
            refresh_minmax_view(wh, "mm")
        wh.write = orig_write
        # partials ahead, view behind — heal without a source rescan
        orig_rbav = wh.read_buckets_at_version

        def no_source_read(table, version, bucket_ids):
            raise AssertionError("heal must not rescan the source")

        wh.read_buckets_at_version = no_source_read
        out = refresh_minmax_view(wh, "mm")
        wh.read_buckets_at_version = orig_rbav
        assert out["mode"] == "heal"
        assert self._view(wh) == self._recompute(wh)

    def test_source_bucket_key_rename_rebinds(self, spark, wh_factory):
        """Declared RENAME of the source's bucket key: the stored key
        no longer exists, so the refresh re-binds to the source's
        current bucket key in the same commit and stays exact
        (the rollup lane's rule, applied to the partials lane)."""
        from canvas_data_loader_spark.plans.ops import refresh_minmax_view

        wh = wh_factory()
        self._mk(spark, wh)
        batch = spark.createDataFrame(
            [(77, "g1", 5)], "fact_id long, grp string, amount long"
        )
        wh.merge_bucketed(
            "facts", batch, snapshot="m1", evolve=True,
            renames={"id": "fact_id"},
        )
        out = refresh_minmax_view(wh, "mm")
        assert out["mode"] in ("incremental", "full")
        assert self._view(wh) == self._recompute(wh)
        assert wh.table_properties("mm")["mv.source_key"] == "fact_id"
        # and the NEXT refresh runs on the re-bound key
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(78, "g2", -9)], "fact_id long, grp string, amount long"
            ),
            snapshot="m2",
        )
        out = refresh_minmax_view(wh, "mm")
        assert out["mode"] == "incremental"
        assert self._view(wh) == self._recompute(wh)

    def test_source_recreated_rebuilds(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import refresh_minmax_view

        wh = wh_factory()
        self._mk(spark, wh)
        wh.drop("facts")
        wh.write(
            "facts", self._facts(spark, n=8), snapshot="s0", bucket=("id", 8)
        )
        out = refresh_minmax_view(wh, "mm")
        assert out["mode"] == "full"
        assert self._view(wh) == self._recompute(wh)

    def test_refresh_dispatcher_routes_by_kind(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import (
            create_rollup_view,
            refresh_view,
        )

        wh = wh_factory()
        self._mk(spark, wh)
        create_rollup_view(
            wh, "facts_by_grp", "facts", ["grp"], {"total": "amount"}
        )
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(9, "g1", 5)], "id long, grp string, amount long"
            ),
            snapshot="m1",
        )
        assert refresh_view(wh, "mm")["mode"] == "incremental"
        assert refresh_view(wh, "facts_by_grp")["mode"] == "incremental"
        assert self._view(wh) == self._recompute(wh)


class TestAutoRefreshViews:
    """auto_refresh_views: the import loop advances registered rollup
    views as part of the write path — derived tables current at
    O(changes) per import, with no side registry (views discovered
    from their own table properties)."""

    @pytest.mark.parametrize("fmt", ["manifest", "delta"])
    def test_views_track_imports(self, spark, tmp_path, fmt):
        from canvas_data_loader_spark.operators.ivm import build_rollup
        from canvas_data_loader_spark.plans.ops import create_rollup_view
        from canvas_data_loader_spark.plans.pipeline import (
            ImportPipeline,
            PipelineConfig,
        )
        from canvas_data_loader_spark.sources.api_client import (
            CanvasDataApiClient,
            LocalDirTransport,
            gzip_tsv,
        )

        schema_json = {
            "version": "4.2.0",
            "schema": {
                "account_dim": {
                    "tableName": "account_dim",
                    "dw_type": "dimension",
                    "incremental": False,
                    "columns": [
                        {"name": "id", "type": "bigint"},
                        {"name": "name", "type": "varchar"},
                    ],
                },
            },
        }

        def mk_dump(i):
            did = f"d{i:03d}"
            fname = f"account_dim-00000-{did}.gz"
            return (
                {
                    "dumpId": did, "sequence": i + 1, "accountId": "self",
                    "numFiles": 1, "finished": True, "expires": None,
                    "createdAt": f"2024-01-01T00:{i:02d}:00Z",
                    "updatedAt": f"2024-01-01T00:{i:02d}:00Z",
                    "schemaVersion": "4.2.0",
                },
                {
                    "dumpId": did,
                    "artifactsByTable": {
                        "account_dim": {
                            "partial": False,
                            "files": [{
                                "filename": fname,
                                "url": f"u://{did}/{fname}",
                            }],
                        }
                    },
                },
                {f"u://{did}/{fname}": gzip_tsv(
                    [[1, f"v{i}"], [50 + i, f"new{i}"]]
                )},
            )

        made = [mk_dump(i) for i in range(5)]
        config = PipelineConfig(
            stage_dir=str(tmp_path / "stage"),
            warehouse_dir=str(tmp_path / "wh"),
            ledger_path=str(tmp_path / "ledger.jsonl"),
            bucketed_tables={"account_dim": 4},
            warehouse_format=fmt,
            auto_refresh_views=True,
        )

        def pipeline(upto):
            dumps = [d for d, _, _ in made[:upto]]
            files = {d["dumpId"]: f for d, f, _ in made[:upto]}
            payloads = {}
            for _, _, p in made[:upto]:
                payloads.update(p)
            transport = LocalDirTransport(
                dumps, schema_json, files, payloads
            )
            return ImportPipeline(
                spark, CanvasDataApiClient("key", "secret", transport), config
            )

        # first import creates the table; then register the view on it
        p1 = pipeline(1)
        p1.run()
        create_rollup_view(
            p1.warehouse, "accounts_rollup", "account_dim",
            ["name"], {"total_id": "id"},
        )
        # remaining imports auto-refresh the view after each merge
        p2 = pipeline(5)
        p2.run()
        wh = p2.warehouse
        assert sorted(
            tuple(r) for r in wh.read("accounts_rollup").collect()
        ) == sorted(
            tuple(r)
            for r in build_rollup(
                wh.read("account_dim"), ["name"], {"total_id": "id"}
            ).collect()
        )
        # the watermark rode each refresh commit: view reflects the head
        head_src = (
            wh.current_version("account_dim")
            if hasattr(wh, "current_version")
            else wh._current_version("account_dim")
        )
        assert (
            wh.last_txn_epoch("mv:account_dim", "accounts_rollup")
            == head_src
        )


class TestMvRefreshVsMergeRace:
    def test_concurrent_merges_and_refreshes_converge_exact(
        self, spark, wh_factory
    ):
        """Refreshers race ingest: a writer thread lands 6 keyed merges
        while a refresher thread advances the view after each one it
        observes. CAS serializes view commits; watermarks ride the same
        commits; the final refresh must land EXACTLY on a recompute —
        not approximately, and with no lost retraction."""
        from canvas_data_loader_spark.operators.ivm import build_rollup
        from canvas_data_loader_spark.plans.ops import (
            create_rollup_view,
            refresh_rollup_view,
        )

        wh = wh_factory()
        wh.write(
            "facts",
            spark.createDataFrame(
                [(i, f"g{i % 4}", i * 10) for i in range(32)],
                "id long, grp string, amount long",
            ),
            snapshot="s0",
            bucket=("id", 8),
        )
        create_rollup_view(
            wh, "v", "facts", ["grp"], {"total": "amount"}
        )
        errors: list[Exception] = []
        merger = wh_factory()

        def write_side():
            try:
                for i in range(6):
                    merger.merge_bucketed(
                        "facts",
                        spark.createDataFrame(
                            [(i, f"g{i % 4}", 7777 + i), (900 + i, "gX", i)],
                            "id long, grp string, amount long",
                        ),
                        snapshot=f"m{i}",
                        max_commit_retries=25,
                    )
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        refresher = wh_factory()

        def refresh_side():
            try:
                for _ in range(4):
                    refresh_rollup_view(refresher, "v", max_retries=25)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=write_side),
            threading.Thread(target=refresh_side),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        refresh_rollup_view(wh, "v", max_retries=25)  # catch up to head
        assert sorted(tuple(r) for r in wh.read("v").collect()) == sorted(
            tuple(r)
            for r in build_rollup(
                wh.read("facts"), ["grp"], {"total": "amount"}
            ).collect()
        )


class TestCheckConstraints:
    """CHECK constraints (plans/constraints.py) — the public Delta
    spelling (``delta.constraints.<name>`` table property), enforced
    by every data-adding writer path on BOTH commit protocols BEFORE
    any file is written: a violating batch leaves the table untouched
    (head version unchanged — stricter than Delta's mid-job abort).
    SQL CHECK null rule throughout: only expr IS FALSE violates."""

    SCHEMA = "id long, v string, amount long"

    def _mk(self, spark, wh):
        from canvas_data_loader_spark.plans.constraints import add_constraint

        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}", i * 10) for i in range(1, 9)], self.SCHEMA
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        add_constraint(wh, "t", "amount_nonneg", "amount >= 0")

    def test_add_validates_existing_rows(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.constraints import (
            ConstraintViolation,
            add_constraint,
        )

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a", -5)], self.SCHEMA),
            snapshot="s0",
        )
        with pytest.raises(ConstraintViolation, match="amount_nonneg"):
            add_constraint(wh, "t", "amount_nonneg", "amount >= 0")
        # refused ADD left no property behind
        assert wh.table_properties("t") == {}

    def test_violating_write_and_merge_refused_atomically(
        self, spark, wh_factory
    ):
        from canvas_data_loader_spark.plans.constraints import (
            ConstraintViolation,
        )

        wh = wh_factory()
        self._mk(spark, wh)
        head = wh.current_version("t")
        with pytest.raises(ConstraintViolation, match="amount_nonneg"):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(1, "bad", -1)], self.SCHEMA),
                snapshot="m-bad",
            )
        with pytest.raises(ConstraintViolation, match="amount_nonneg"):
            wh.write(
                "t",
                spark.createDataFrame([(9, "bad", -1)], self.SCHEMA),
                snapshot="w-bad",
                bucket=("id", 4),
            )
        assert wh.current_version("t") == head  # nothing committed
        # passing rows (and the NULL rule: NULL amount is not FALSE)
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "ok", 5), (9, "nul", None)], self.SCHEMA),
            snapshot="m-ok",
        )
        rows = {r["id"]: r["amount"] for r in wh.read("t").collect()}
        assert rows[1] == 5 and rows[9] is None

    def test_update_enforced_on_assigned_rows(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.constraints import (
            ConstraintViolation,
        )

        wh = wh_factory()
        self._mk(spark, wh)
        with pytest.raises(ConstraintViolation, match="amount_nonneg"):
            wh.update_where("t", {"amount": "amount - 1000"}, "id = 1")
        assert {r["id"]: r["amount"] for r in wh.read("t").collect()}[1] == 10
        n = wh.update_where("t", {"amount": "amount + 1"}, "id = 1")
        assert n == 1
        # deletes cannot violate CHECK and pass through unchecked
        wh.delete_where("t", F.col("id") == 2)
        assert wh.read("t").filter("id = 2").count() == 0

    def test_survives_commits_and_restore_rolls_back(
        self, spark, wh_factory
    ):
        from canvas_data_loader_spark.plans.constraints import (
            ConstraintViolation,
        )

        wh = wh_factory()
        self._mk(spark, wh)
        v_with = wh.current_version("t")
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(3, "x", 1)], self.SCHEMA),
            snapshot="m1",
        )
        # still enforced after unrelated commits (property carried)
        with pytest.raises(ConstraintViolation):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(3, "y", -1)], self.SCHEMA),
                snapshot="m2",
            )
        # RESTORE to the PRE-constraint state removes it (properties
        # are part of the restored state)
        pre = v_with - 1
        wh.restore("t", pre)
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(3, "neg-ok", -1)], self.SCHEMA),
            snapshot="m3",
        )
        assert {r["id"]: r["amount"] for r in wh.read("t").collect()}[3] == -1

    def test_drop_and_duplicate_guards(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.constraints import (
            add_constraint,
            drop_constraint,
        )

        wh = wh_factory()
        self._mk(spark, wh)
        with pytest.raises(ValueError, match="already exists"):
            add_constraint(wh, "t", "amount_nonneg", "amount >= -1")
        assert drop_constraint(wh, "t", "amount_nonneg") is True
        wh.merge_bucketed(  # re-allowed
            "t",
            spark.createDataFrame([(1, "neg", -1)], self.SCHEMA),
            snapshot="m-neg",
        )
        with pytest.raises(ValueError, match="no constraint"):
            drop_constraint(wh, "t", "amount_nonneg")
        assert drop_constraint(wh, "t", "amount_nonneg", if_exists=True) is False

    def test_evolve_batch_missing_constrained_column_null_passes(
        self, spark, wh_factory
    ):
        """Enforcement runs POST-conform: an evolve batch that omits
        the constrained column is null-padded, and NULL passes per SQL
        CHECK — it must not die unresolved (round-9 second-review
        finding)."""
        wh = wh_factory()
        self._mk(spark, wh)
        batch = spark.createDataFrame(
            [(30, "new-col-only", "x")], "id long, v string, extra string"
        )
        affected = wh.merge_bucketed("t", batch, snapshot="ev", evolve=True)
        assert affected
        got = {r["id"]: (r["amount"], r["extra"]) for r in wh.read("t").collect()}
        assert got[30] == (None, "x")

    def test_evolve_subset_batch_conforms_and_null_passes(
        self, spark, wh_factory
    ):
        """The SUBSET case (third-review finding): an evolve batch
        with FEWER columns and no additions leaves the declared schema
        untouched, yet must still null-pad — on BOTH impls (the delta
        impl skipped conform when the declared schema didn't change)."""
        wh = wh_factory()
        self._mk(spark, wh)
        batch = spark.createDataFrame([(31, "subset")], "id long, v string")
        affected = wh.merge_bucketed("t", batch, snapshot="sub", evolve=True)
        assert affected
        got = {r["id"]: r["amount"] for r in wh.read("t").collect()}
        assert got[31] is None and len(got) == 9

    def test_concurrent_add_constraint_gates_inflight_write_and_merge(
        self, spark, wh_factory
    ):
        """A constraint added WHILE a violating write/merge is running
        (after its entry check, before its commit) must still gate it:
        the publish path re-checks the effective constraint set per
        attempt (third-review finding — the checked-once flag let the
        violating batch land in the same commit that carried the
        constraint forward)."""
        from canvas_data_loader_spark.plans.constraints import (
            ConstraintViolation,
            add_constraint,
        )

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}", i * 10) for i in range(1, 9)], self.SCHEMA
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        adder = wh_factory()  # second handle over the same root

        # WRITE lane: inject the ADD between the entry check and the
        # file write (manifest: snapshot claim; delta: file staging)
        injected = {"done": False}
        if hasattr(wh, "_fresh_snapshot_name"):
            orig = wh._fresh_snapshot_name

            def hook(table_, wanted):
                if table_ == "t" and not injected["done"]:
                    injected["done"] = True
                    add_constraint(adder, "t", "amount_nonneg", "amount >= 0")
                return orig(table_, wanted)

            wh._fresh_snapshot_name = hook
        else:
            orig = wh._write_files

            def hook(*a, **kw):
                if not injected["done"]:
                    injected["done"] = True
                    add_constraint(adder, "t", "amount_nonneg", "amount >= 0")
                return orig(*a, **kw)

            wh._write_files = hook
        try:
            with pytest.raises(ConstraintViolation, match="amount_nonneg"):
                wh.write(
                    "t",
                    spark.createDataFrame([(1, "bad", -1)], self.SCHEMA),
                    snapshot="s1",
                    bucket=("id", 4),
                )
        finally:
            if hasattr(wh, "_fresh_snapshot_name") and injected["done"]:
                wh._fresh_snapshot_name = orig
            elif hasattr(wh, "_write_files"):
                wh._write_files = orig
        # the violating write never landed under the new constraint
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert rows[1] == "v1" and len(rows) == 8

    def test_concurrent_add_constraint_gates_merge_retry(
        self, spark, wh_factory
    ):
        """MERGE lane of the same race: the ADD lands as the commit
        that makes the merge's CAS lose — the retry must re-check the
        new constraint set and refuse the batch (and the manifest
        reconcile path must treat the props change as a conflict, not
        fast-path the pre-validated files through)."""
        from canvas_data_loader_spark.plans.constraints import (
            ConstraintViolation,
            add_constraint,
        )
        from canvas_data_loader_spark.plans.pipeline import CommitConflict

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}", i * 10) for i in range(1, 9)], self.SCHEMA
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        adder = wh_factory()
        injected = {"done": False}
        commit_attr = (
            "_publish" if hasattr(wh, "_publish") else "_commit"
        )
        orig = getattr(wh, commit_attr)

        def hook(*a, **kw):
            if not injected["done"]:
                injected["done"] = True
                # the winner: a metadata-only ADD CONSTRAINT — then
                # force this merge's publish to lose its CAS
                add_constraint(adder, "t", "amount_nonneg", "amount >= 0")
                raise CommitConflict("injected CAS loss")
            return orig(*a, **kw)

        setattr(wh, commit_attr, hook)
        try:
            with pytest.raises(ConstraintViolation, match="amount_nonneg"):
                wh.merge_bucketed(
                    "t",
                    spark.createDataFrame([(1, "bad", -1)], self.SCHEMA),
                    snapshot="m-bad",
                )
        finally:
            setattr(wh, commit_attr, orig)
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert rows[1] == "v1" and len(rows) == 8

    def test_replayed_epoch_skips_even_when_batch_violates(
        self, spark, wh_factory
    ):
        """Epoch skip precedes enforcement: a replayed batch is the
        contracted silent no-op even if it would violate a constraint
        added since — never an error (round-9 second-review finding)."""
        wh = wh_factory()
        self._mk(spark, wh)
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "e7", 7)], self.SCHEMA),
            snapshot="m7",
            txn=("app", 7),
        )
        out = wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "stale", -1)], self.SCHEMA),
            snapshot="replay",
            txn=("app", 7),
        )
        assert out == []
        assert {r["id"]: r["v"] for r in wh.read("t").collect()}[1] == "e7"

    def test_write_props_cannot_smuggle_violating_constraint(
        self, spark, wh_factory
    ):
        """write(props={constraint}) enforces the EFFECTIVE post-commit
        set: a table cannot be born constrained while already
        violating; a valid birth IS constrained from commit one."""
        from canvas_data_loader_spark.plans.constraints import (
            ConstraintViolation,
        )

        wh = wh_factory()
        key = "delta.constraints.amount_nonneg"
        with pytest.raises(ConstraintViolation, match="amount_nonneg"):
            wh.write(
                "t2",
                spark.createDataFrame([(1, "a", -5)], self.SCHEMA),
                snapshot="s0",
                props={key: "amount >= 0"},
            )
        assert not wh.exists("t2")
        wh.write(
            "t2",
            spark.createDataFrame([(1, "a", 5)], self.SCHEMA),
            snapshot="s0",
            props={key: "amount >= 0"},
        )
        with pytest.raises(ConstraintViolation):
            wh.write(
                "t2",
                spark.createDataFrame([(2, "b", -1)], self.SCHEMA),
                snapshot="s1",
            )

    def test_smuggled_bad_expression_fails_descriptively(
        self, spark, wh_factory
    ):
        """set_properties validates constraint NAMES; an expression
        smuggled past add_constraint that no longer resolves surfaces
        at write time as a descriptive ValueError naming the
        constraint set, never a bare AnalysisException."""
        wh = wh_factory()
        self._mk(spark, wh)
        with pytest.raises(ValueError, match="invalid constraint name"):
            wh.set_properties("t", {"delta.constraints.bad name!": "1 = 1"})
        wh.set_properties(
            "t", {"delta.constraints.ghost": "no_such_col > 0"}
        )
        with pytest.raises(ValueError, match="no longer evaluates"):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(1, "x", 1)], self.SCHEMA),
                snapshot="m",
            )

    def test_rename_of_constrained_column_refused(self, spark, wh_factory):
        """Delta's rule: a declared RENAME of a column a CHECK
        constraint references is refused (the stored expression keeps
        the old name and would brick every subsequent write) — drop
        the constraint first."""
        wh = wh_factory()
        self._mk(spark, wh)
        batch = spark.createDataFrame(
            [(1, "r", 5)], "id long, v string, amt long"
        )
        with pytest.raises(ValueError, match="referenced by CHECK"):
            wh.merge_bucketed(
                "t",
                batch,
                snapshot="ren",
                evolve=True,
                renames={"amount": "amt"},
            )

    def test_cross_engine_expression_gate(self, spark, wh_factory):
        """A Spark-only spelling must fail at ADD time — the arrow
        lane enforces with DuckDB, and a constraint only one engine
        can evaluate would brick the stream writer later."""
        from canvas_data_loader_spark.plans.constraints import add_constraint

        wh = wh_factory()
        self._mk(spark, wh)
        with pytest.raises(ValueError, match="arrow lane"):
            add_constraint(wh, "t", "sparkonly", "v rlike '^v'")


class TestMultiWriterChaos:
    """Three writers with different jobs race on ONE table — a
    streaming upserter carrying epochs, a txn-less batch ETL that also
    deletes, and a maintenance thread compacting and refreshing two
    materialized views (rollup + minmax). This is the round-9
    epoch/reconciliation surface under real contention, on both commit
    protocols: no lost update, no lost retraction, epochs monotone and
    SURVIVING the txn-less writers' commits, a stale replay a no-op,
    and both views exactly equal to a recompute at the end."""

    R = 3

    def test_chaos_converges(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import (
            create_minmax_view,
            create_rollup_view,
            refresh_view,
        )

        wh = wh_factory()
        wh.write(
            "facts",
            spark.createDataFrame(
                [(i, f"g{i % 4}", i * 10) for i in range(32)],
                "id long, grp string, amount long",
            ),
            snapshot="s0",
            bucket=("id", 8),
        )
        create_rollup_view(wh, "v_sum", "facts", ["grp"], {"total": "amount"})
        create_minmax_view(
            wh, "v_mm", "facts", ["grp"],
            {"lo": ("amount", "min"), "hi": ("amount", "max")},
        )
        errors: list[Exception] = []
        R = self.R
        sch = "id long, grp string, amount long"

        stream_wh = wh_factory()

        def stream_side():
            try:
                for i in range(R):
                    stream_wh.merge_bucketed(
                        "facts",
                        spark.createDataFrame(
                            [(100 + k, "gS", 1000 * i + k) for k in range(4)],
                            sch,
                        ),
                        snapshot=f"s{i}",
                        txn=("stream", i),
                        max_commit_retries=25,
                    )
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        etl_wh = wh_factory()

        def etl_side():
            try:
                for i in range(R):
                    etl_wh.merge_bucketed(
                        "facts",
                        spark.createDataFrame(
                            [(200 + k, "gE", -(10 * i) - k) for k in range(4)],
                            sch,
                        ),
                        snapshot=f"e{i}",
                        max_commit_retries=25,
                    )
                # retract the row that IS gE's minimum (id=203 carries
                # the smallest amount) — the minmax view must recover
                # the next-smallest from survivors
                etl_wh.delete_where(
                    "facts", F.col("id") == 203, max_commit_retries=25
                )
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        maint_wh = wh_factory()

        def maint_side():
            for _ in range(R):
                # maintenance losing a race is acceptable (re-runnable);
                # anything else is a real failure
                try:
                    maint_wh.compact("facts")
                    refresh_view(maint_wh, "v_sum")
                    refresh_view(maint_wh, "v_mm")
                except CommitConflict:
                    pass
                except Exception as e:  # noqa: BLE001
                    errors.append(e)

        threads = [
            threading.Thread(target=f)
            for f in (stream_side, etl_side, maint_side)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        rows = {r["id"]: r["amount"] for r in wh.read("facts").collect()}
        for k in range(4):  # every stream-lane last value survived
            assert rows[100 + k] == 1000 * (R - 1) + k
        assert 203 not in rows  # the retraction survived
        for k in (0, 1, 2):  # every ETL-lane last value survived
            assert rows[200 + k] == -(10 * (R - 1)) - k
        # epochs survived the txn-less ETL + maintenance commits
        assert wh.last_txn_epoch("stream", "facts") == R - 1
        # a stale replay (split-brain loser) publishes nothing
        assert (
            stream_wh.merge_bucketed(
                "facts",
                spark.createDataFrame([(100, "gS", -999)], sch),
                snapshot="replay",
                txn=("stream", 0),
            )
            == []
        )
        assert rows[100] == 1000 * (R - 1)
        # both views converge EXACTLY on a recompute
        refresh_view(wh, "v_sum")
        refresh_view(wh, "v_mm")
        facts = wh.read("facts")
        from canvas_data_loader_spark.operators.ivm import build_rollup

        assert sorted(tuple(r) for r in wh.read("v_sum").collect()) == sorted(
            tuple(r)
            for r in build_rollup(
                facts, ["grp"], {"total": "amount"}
            ).collect()
        )
        assert sorted(tuple(r) for r in wh.read("v_mm").collect()) == sorted(
            tuple(r)
            for r in facts.groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min("amount").alias("lo"),
                F.max("amount").alias("hi"),
            )
            .collect()
        )


class TestSyncMirror:
    """sync_mirror (plans/ops.py): incremental cross-warehouse
    replication off the pruned change feed. Written against the shared
    contract, so the two ends may run DIFFERENT commit protocols —
    every test here runs all four (src, dst) format pairs."""

    @staticmethod
    def _mk_pair(request_kind, tmp_path, spark, pair):
        def build(kind, name):
            root = str(tmp_path / f"{kind}-{name}")
            return (
                DeltaWarehouse(spark, root)
                if kind == "delta"
                else Warehouse(spark, root)
            )

        s, d = pair.split("->")
        return build(s, "src"), build(d, "dst")

    @pytest.fixture(
        params=[
            "manifest->manifest",
            "manifest->delta",
            "delta->manifest",
            "delta->delta",
        ]
    )
    def pair(self, request, tmp_path, spark):
        return self._mk_pair(None, tmp_path, spark, request.param)

    def _seed(self, spark, src):
        src.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(24)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 8),
        )

    def test_clone_then_incremental_then_noop(self, spark, pair):
        from canvas_data_loader_spark.plans.ops import sync_mirror

        src, dst = pair
        self._seed(spark, src)
        out = sync_mirror(src, "t", dst)
        assert out["mode"] == "clone"
        assert rows_of(dst, "t") == rows_of(src, "t")
        assert dst.is_bucketed("t")  # layout replicated, future syncs prune
        # keyed upsert at the source -> incremental sync, merged not cloned
        src.merge_bucketed(
            "t",
            spark.createDataFrame(
                [(1, "UPD"), (100, "NEW")], "id long, v string"
            ),
            snapshot="m1",
        )
        out = sync_mirror(src, "t", dst)
        assert out["mode"] == "incremental"
        assert rows_of(dst, "t") == rows_of(src, "t")
        # nothing new -> metadata-only noop, destination head unmoved
        h = head(dst, "t")
        assert sync_mirror(src, "t", dst)["mode"] == "noop"
        assert head(dst, "t") == h

    def test_deletes_stay_incremental(self, spark, pair):
        """A partial-delete interval (merge then restore: one bucket's
        key vanishes) syncs INCREMENTALLY — the deletes ride the same
        atomic merge commit as the upserts (merge_bucketed
        delete_keys), O(changed buckets) at the destination. This was
        the rewrite lane's last bucketed trigger; rewrite now serves
        only unbucketed mirrors."""
        from canvas_data_loader_spark.plans.ops import sync_mirror

        src, dst = pair
        self._seed(spark, src)
        v0 = head(src, "t")
        sync_mirror(src, "t", dst)
        src.merge_bucketed(
            "t",
            spark.createDataFrame([(100, "NEW")], "id long, v string"),
            snapshot="m1",
        )
        sync_mirror(src, "t", dst)
        src.restore("t", v0)  # key 100 deleted in the next interval
        out = sync_mirror(src, "t", dst)
        assert out["mode"] == "incremental"
        assert rows_of(dst, "t") == rows_of(src, "t")

    def test_row_level_delete_syncs_incrementally(self, spark, pair):
        """delete_where at the source (merge-on-read) reaches the
        mirror as an incremental sync — the DV interval's feed is pure
        deletes, applied via the merge's delete_keys lane."""
        from canvas_data_loader_spark.plans.ops import sync_mirror

        src, dst = pair
        self._seed(spark, src)
        sync_mirror(src, "t", dst)
        src.delete_where("t", "id % 3 = 0", mode="mor")
        out = sync_mirror(src, "t", dst)
        assert out["mode"] == "incremental"
        assert rows_of(dst, "t") == rows_of(src, "t")
        assert all(r[0] % 3 != 0 for r in rows_of(dst, "t"))

    def test_full_replace_interval_takes_clone_not_double_diff(
        self, spark, pair
    ):
        from canvas_data_loader_spark.plans.ops import sync_mirror

        src, dst = pair
        self._seed(spark, src)
        sync_mirror(src, "t", dst)
        # a full replace repoints every bucket: diffing ~all buckets at
        # two versions would cost ~2x a straight re-clone, so the sync
        # must choose the clone
        src.write(
            "t",
            spark.createDataFrame(
                [(i, f"w{i}") for i in range(0, 24, 2)], "id long, v string"
            ),
            snapshot="s1",
            bucket=("id", 8),
        )
        out = sync_mirror(src, "t", dst)
        assert out["mode"] == "clone"
        assert rows_of(dst, "t") == rows_of(src, "t")

    def test_refuses_same_name_from_different_source_warehouse(
        self, spark, pair, tmp_path
    ):
        from canvas_data_loader_spark.plans.ops import sync_mirror

        src, dst = pair
        self._seed(spark, src)
        sync_mirror(src, "t", dst)
        other = (
            DeltaWarehouse(spark, str(tmp_path / "other-src"))
            if isinstance(src, DeltaWarehouse)
            else Warehouse(spark, str(tmp_path / "other-src"))
        )
        self._seed(spark, other)
        # same table NAME, different source warehouse: an id mismatch
        # here is NOT a recreation — without the root check two DR jobs
        # would ping-pong clones over each other's mirror
        with pytest.raises(ValueError, match="refusing to overwrite"):
            sync_mirror(other, "t", dst)
        # the original pairing still syncs
        assert sync_mirror(src, "t", dst)["mode"] == "noop"

    def test_source_recreation_reclones(self, spark, pair):
        from canvas_data_loader_spark.plans.ops import sync_mirror

        src, dst = pair
        self._seed(spark, src)
        sync_mirror(src, "t", dst)
        src.drop("t")
        src.write(
            "t",
            spark.createDataFrame([(7, "fresh")], "id long, v string"),
            snapshot="s0",
            bucket=("id", 8),
        )
        out = sync_mirror(src, "t", dst)
        assert out["mode"] == "clone"
        assert rows_of(dst, "t") == [(7, "fresh")]

    def test_history_reset_reclones_once_then_goes_incremental(
        self, spark, pair
    ):
        """The advance_index ABA fix applied to mirrors: advance the
        watermark several source versions, then drop + recreate the
        source so its version counter restarts BELOW the recorded
        epoch. The monotone-max txn map would read watermark > head on
        every later sync and re-clone the whole mirror each time
        (correct but O(mirror) per sync) — the shadow must instead
        bump mirror.app_gen so exactly ONE clone re-arms the
        incremental ladder."""
        from canvas_data_loader_spark.plans.ops import sync_mirror

        src, dst = pair
        self._seed(spark, src)
        sync_mirror(src, "t", dst)
        for i in range(3):
            src.merge_bucketed(
                "t",
                spark.createDataFrame(
                    [(i, f"upd{i}")], "id long, v string"
                ),
                snapshot=f"m{i}",
            )
            assert sync_mirror(src, "t", dst)["mode"] == "incremental"
        # recreate: version counter restarts below the recorded epoch
        src.drop("t")
        src.write(
            "t",
            spark.createDataFrame(
                [(i, f"n{i}") for i in range(12)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 8),
        )
        assert src.current_version("t") < 4
        assert sync_mirror(src, "t", dst)["mode"] == "clone"
        assert rows_of(dst, "t") == rows_of(src, "t")
        assert sync_mirror(src, "t", dst)["mode"] == "noop"
        # the lane must keep tracking the new incarnation
        # incrementally — the shadowed watermark re-cloned here
        src.merge_bucketed(
            "t",
            spark.createDataFrame([(3, "UPD")], "id long, v string"),
            snapshot="m-post",
        )
        out = sync_mirror(src, "t", dst)
        assert out["mode"] == "incremental"
        assert rows_of(dst, "t") == rows_of(src, "t")
        assert sync_mirror(src, "t", dst)["mode"] == "noop"

    def test_refuses_foreign_destination(self, spark, pair):
        from canvas_data_loader_spark.plans.ops import sync_mirror

        src, dst = pair
        self._seed(spark, src)
        dst.write(
            "t",
            spark.createDataFrame([(1, "mine")], "id long, v string"),
            snapshot="s0",
        )
        with pytest.raises(ValueError, match="refusing to overwrite"):
            sync_mirror(src, "t", dst)

    def test_incremental_reads_only_changed_buckets(self, spark, pair):
        from canvas_data_loader_spark.plans.ops import sync_mirror

        src, dst = pair
        self._seed(spark, src)
        sync_mirror(src, "t", dst)
        src.merge_bucketed(
            "t",
            spark.createDataFrame([(5, "U5")], "id long, v string"),
            snapshot="m1",
        )
        seen = []
        orig = src.read_buckets_at_version

        def spy(table, version, bucket_ids):
            seen.append(sorted(bucket_ids))
            return orig(table, version, bucket_ids)

        src.read_buckets_at_version = spy
        assert sync_mirror(src, "t", dst)["mode"] == "incremental"
        assert seen and all(len(b) == 1 for b in seen)


class TestMvReviewRegressions:
    """Regression lanes for the round-8 review findings on the MV /
    properties / replication surface."""

    def test_compaction_interval_prefers_full_rebuild(
        self, spark, wh_factory
    ):
        # a compaction repoints every bucket; diffing ~all buckets at
        # two versions costs ~2x the rebuild's single pruned scan, so
        # the refresh must choose mode=full (auto_compact +
        # auto_refresh hit this combination on every auto-compaction)
        from canvas_data_loader_spark.operators.ivm import build_rollup
        from canvas_data_loader_spark.plans.ops import (
            create_rollup_view,
            refresh_rollup_view,
        )

        wh = wh_factory()
        wh.write(
            "facts",
            spark.createDataFrame(
                [(i, f"g{i % 4}", i * 10) for i in range(32)],
                "id long, grp string, amount long",
            ),
            snapshot="s0",
            bucket=("id", 8),
        )
        create_rollup_view(
            wh, "v", "facts", ["grp"], {"total": "amount"}
        )
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(1, "g1", 777)], "id long, grp string, amount long"
            ),
            snapshot="m1",
        )
        wh.compact("facts")
        out = refresh_rollup_view(wh, "v")
        assert out["mode"] == "full"
        assert sorted(tuple(r) for r in wh.read("v").collect()) == sorted(
            tuple(r)
            for r in build_rollup(
                wh.read("facts"), ["grp"], {"total": "amount"}
            ).collect()
        )

    def test_all_null_group_maintained_equals_recomputed(
        self, spark, wh_factory
    ):
        # SUM over an all-NULL group: the incremental combine pins it
        # to 0, so the full build must too — maintained == recomputed
        # stays an exact equality, not a NULL-vs-0 flicker between
        # refresh modes
        from canvas_data_loader_spark.operators.ivm import build_rollup
        from canvas_data_loader_spark.plans.ops import (
            create_rollup_view,
            refresh_rollup_view,
        )

        wh = wh_factory()
        wh.write(
            "facts",
            spark.createDataFrame(
                [(i, f"g{i % 2}", i) for i in range(8)],
                "id long, grp string, amount long",
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        create_rollup_view(wh, "v", "facts", ["grp"], {"total": "amount"})
        # a brand-new group whose every amount is NULL
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(100, "gNull", None), (101, "gNull", None)],
                "id long, grp string, amount long",
            ),
            snapshot="m1",
        )
        out = refresh_rollup_view(wh, "v")
        assert out["mode"] == "incremental"
        maintained = sorted(tuple(r) for r in wh.read("v").collect())
        recomputed = sorted(
            tuple(r)
            for r in build_rollup(
                wh.read("facts"), ["grp"], {"total": "amount"}
            ).collect()
        )
        assert maintained == recomputed

    def test_create_refuses_to_clobber_non_view(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import create_rollup_view

        wh = wh_factory()
        wh.write(
            "facts",
            spark.createDataFrame(
                [(1, "g0", 10)], "id long, grp string, amount long"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        with pytest.raises(ValueError, match="refusing to overwrite"):
            create_rollup_view(
                wh, "facts", "facts", ["grp"], {"total": "amount"}
            )
        assert {r["id"] for r in wh.read("facts").collect()} == {1}

    def test_renamed_bucket_key_rebinds_and_keeps_refreshing(
        self, spark, tmp_path
    ):
        # declared-rename evolution moves the bucket key: the refresh
        # must re-bind mv.source_key (and survive the rename interval
        # via the FeedSchemaDrift full-rebuild lane), then return to
        # incremental refreshes under the NEW key (manifest impl only —
        # the delta impl answers renames by full reload, a recreation)
        from canvas_data_loader_spark.operators.ivm import build_rollup
        from canvas_data_loader_spark.plans.ops import (
            create_rollup_view,
            refresh_rollup_view,
        )

        wh = Warehouse(spark, str(tmp_path / "wh-rename"))
        wh.write(
            "facts",
            spark.createDataFrame(
                [(i, f"g{i % 3}", i) for i in range(12)],
                "id long, grp string, amount long",
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        create_rollup_view(wh, "v", "facts", ["grp"], {"total": "amount"})
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(1, "g1", 999)], "doc_id long, grp string, amount long"
            ).withColumnRenamed("doc_id", "id"),
            snapshot="m0",
        )
        refresh_rollup_view(wh, "v")
        # rename the bucket key id -> row_id
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(2, "g2", 555)], "row_id long, grp string, amount long"
            ),
            snapshot="m1",
            evolve=True,
            renames={"id": "row_id"},
        )
        out = refresh_rollup_view(wh, "v")
        assert out["mode"] == "full"  # rename interval: feed undefined
        assert wh.table_properties("v")["mv.source_key"] == "row_id"
        # and the NEXT change refreshes incrementally under the new key
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(3, "g0", 111)], "row_id long, grp string, amount long"
            ),
            snapshot="m2",
        )
        out = refresh_rollup_view(wh, "v")
        assert out["mode"] == "incremental"
        assert sorted(tuple(r) for r in wh.read("v").collect()) == sorted(
            tuple(r)
            for r in build_rollup(
                wh.read("facts"), ["grp"], {"total": "amount"}
            ).collect()
        )

    def test_lww_write_does_not_erase_racing_set_properties(
        self, spark, wh_factory
    ):
        # the LWW metadata lost-update: a set_properties landing while
        # a plain full-replace write is in flight must survive — the
        # publish re-derives carried metadata against the head it
        # actually lands on
        wh = wh_factory()
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        wh.write("t", df, snapshot="s0", props={"owner": "etl"})
        tid0 = wh.table_id("t")

        orig_write = (
            wh._publish_replace if hasattr(wh, "_publish_replace") else None
        )
        if orig_write is not None:
            # inject the race deterministically: a metadata commit lands
            # between the parquet job and the publish
            def delayed(table, manifest_for, expected_version, **kw):
                wh.set_properties("t", {"tier": "gold"})
                wh._publish_replace = orig_write
                return orig_write(
                    table, manifest_for, expected_version, **kw
                )

            wh._publish_replace = delayed
            wh.write("t", df, snapshot="s1")
        else:
            # delta: same interleaving via the commit primitive
            orig_commit = wh._commit
            injected = {"done": False}

            def delayed_commit(table, version, actions):
                if not injected["done"]:
                    injected["done"] = True
                    wh.set_properties("t", {"tier": "gold"})
                return orig_commit(table, version, actions)

            wh._commit = delayed_commit
            wh.write("t", df, snapshot="s1")
            wh._commit = orig_commit
        assert wh.table_properties("t") == {"owner": "etl", "tier": "gold"}
        assert wh.table_id("t") == tid0


class TestClusteredCompaction:
    """compact(order_by=...): OPTIMIZE-with-clustering. Merge output
    files each span the whole value range, so per-file min/max skipping
    degenerates to open-everything; a clustered rewrite gives each file
    a disjoint range and restores skipping's value — maintenance and
    data skipping are one feature, not two."""

    def test_clustered_compact_restores_file_skipping(
        self, spark, wh_factory
    ):
        wh = wh_factory()
        # 6 round-robin files: every file spans ~the full value range
        df = spark.createDataFrame(
            [(i, i * 10) for i in range(2400)], "id long, x long"
        ).repartition(6)
        wh.write("t", df, snapshot="s0")
        kept0, total0 = wh.files_for_range("t", "x", 100, 200)
        assert total0 >= 4 and len(kept0) == total0  # skipping useless
        n = wh.compact("t", target_bytes=4 * 1024, order_by=["x"])
        assert n >= 3  # still a multi-file table
        kept1, total1 = wh.files_for_range("t", "x", 100, 200)
        assert total1 == n
        assert len(kept1) <= max(1, total1 // 2), (
            f"clustering did not tighten skipping: {len(kept1)}/{total1}"
        )
        # correctness unchanged
        got = sorted(
            r["id"] for r in wh.read_where("t", "x", 100, 200).collect()
            if 100 <= r["x"] <= 200
        )
        assert got == [i for i in range(2400) if 100 <= i * 10 <= 200]
        assert rows_of(wh, "t") == sorted((i, i * 10) for i in range(2400))

    def test_bucketed_clustered_compact_keeps_layout(self, spark, wh_factory):
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(64)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        before = rows_of(wh, "t")
        wh.compact("t", order_by=["id"])
        assert wh.is_bucketed("t")
        assert rows_of(wh, "t") == before
        # merges still prune on the preserved layout
        wh.merge_bucketed(
            "t", spark.createDataFrame([(3, "U")], "id long, v string"),
            snapshot="m1",
        )
        assert {r["v"] for r in wh.read("t").collect() if r["id"] == 3} == {
            "U"
        }


class TestRowsChangedAndAdvance:
    """rows_changed / record_txn (both impls) and the consumers'
    'advance' lane: maintenance traffic (compaction, rebucket,
    metadata commits) provably changes zero rows, so change-feed
    consumers move their watermark with a txn-only commit instead of
    re-reading — the difference between a metadata write and a full
    re-clone after every nightly OPTIMIZE."""

    def test_rows_changed_truth_table(self, spark, wh_factory):
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(16)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        v0 = head(wh, "t")
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "U")], "id long, v string"),
            snapshot="m1",
        )
        v1 = head(wh, "t")
        assert wh.rows_changed("t", v0, v1) is True  # merge = data
        wh.compact("t")
        v2 = head(wh, "t")
        assert wh.rows_changed("t", v1, v2) is False  # OPTIMIZE = layout
        wh.set_properties("t", {"x": "y"})
        v3 = head(wh, "t")
        assert wh.rows_changed("t", v2, v3) is False  # metadata only
        wh.record_txn("t", "some-app", 7)
        v4 = head(wh, "t")
        assert wh.rows_changed("t", v3, v4) is False  # txn only
        assert wh.last_txn_epoch("some-app", "t") == 7
        wh.restore("t", v0)
        v5 = head(wh, "t")
        assert wh.rows_changed("t", v4, v5) is True  # restore = data
        # composite interval: any data commit poisons the whole span
        assert wh.rows_changed("t", v0, v5) is True
        assert wh.rows_changed("t", v1, v4) is False

    def test_rebucket_is_row_preserving(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import rebucket

        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(16)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        v0 = head(wh, "t")
        rebucket(wh, "t", 8)
        assert wh.rows_changed("t", v0, head(wh, "t")) is False

    def test_mirror_advances_over_compaction_without_data_io(
        self, spark, wh_factory
    ):
        from canvas_data_loader_spark.plans.ops import sync_mirror

        src, dst = wh_factory("src"), wh_factory("dst")
        src.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(24)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 8),
        )
        sync_mirror(src, "t", dst)
        src.compact("t")  # repoints every bucket, changes zero rows
        dst_files_before = md5s(dst.root)
        out = sync_mirror(src, "t", dst)
        assert out["mode"] == "advance"
        assert md5s(dst.root) == dst_files_before  # no data written
        # watermark moved: the next sync is a plain noop
        assert sync_mirror(src, "t", dst)["mode"] == "noop"
        # and a later real change still syncs incrementally
        src.merge_bucketed(
            "t", spark.createDataFrame([(1, "U")], "id long, v string"),
            snapshot="m1",
        )
        assert sync_mirror(src, "t", dst)["mode"] == "incremental"
        assert rows_of(dst, "t") == rows_of(src, "t")

    def test_view_advances_over_compaction(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import (
            create_rollup_view,
            refresh_rollup_view,
        )

        wh = wh_factory()
        wh.write(
            "facts",
            spark.createDataFrame(
                [(i, f"g{i % 3}", i) for i in range(12)],
                "id long, grp string, amount long",
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        create_rollup_view(wh, "v", "facts", ["grp"], {"total": "amount"})
        wh.compact("facts")
        out = refresh_rollup_view(wh, "v")
        assert out["mode"] == "advance"
        assert refresh_rollup_view(wh, "v")["mode"] == "noop"

    def test_explicit_source_key_is_preserved(self, spark, wh_factory):
        # an explicit source_key= at create is a contract: refresh must
        # not silently swap it for the bucket key while it still exists
        from canvas_data_loader_spark.plans.ops import (
            create_rollup_view,
            refresh_rollup_view,
        )

        wh = wh_factory()
        wh.write(
            "facts",
            spark.createDataFrame(
                [(i, 1000 + i, f"g{i % 2}", i) for i in range(8)],
                "id long, alt_key long, grp string, amount long",
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        create_rollup_view(
            wh, "v", "facts", ["grp"], {"total": "amount"},
            source_key="alt_key",
        )
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(1, 1001, "g1", 999)],
                "id long, alt_key long, grp string, amount long",
            ),
            snapshot="m1",
        )
        out = refresh_rollup_view(wh, "v")
        assert out["mode"] == "incremental"
        assert wh.table_properties("v")["mv.source_key"] == "alt_key"


class TestConflictReconciliation:
    """Logical conflict detection: a CAS-lost bucketed MERGE whose
    competing commit touched DISJOINT buckets re-publishes its
    already-written files directly (zero re-derives, zero re-written
    parquet); overlapping buckets — and anything that moves schema,
    layout, or the affected buckets' DV cover — still re-derive. Both
    commit protocols. (Without this, hourly imports × auto-compaction
    × MV refresh × mirror sync serialize through wasted re-derives —
    the multi-writer bottleneck at scale.)"""

    N_BUCKETS = 8

    def _seed(self, spark, wh):
        rows = [(i, f"v{i}") for i in range(1, 17)]
        wh.write(
            "t",
            spark.createDataFrame(rows, "id long, v string"),
            snapshot="s0",
            bucket=("id", self.N_BUCKETS),
        )

    def _bucket(self, spark, key: int) -> int:
        from pyspark.sql import functions as F

        return (
            spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(key).cast("long")), F.lit(self.N_BUCKETS))
                .cast("int")
                .alias("b")
            )
            .collect()[0]["b"]
        )

    def _keys_disjoint_overlapping(self, spark):
        """(key_a, key_b_disjoint, key_b_same_bucket) — two keys in
        different buckets and one sharing key_a's bucket."""
        b_of = {k: self._bucket(spark, k) for k in range(1, 17)}
        key_a = 1
        disjoint = next(k for k in range(2, 17) if b_of[k] != b_of[key_a])
        same = next(
            (k for k in range(2, 17) if b_of[k] == b_of[key_a]), None
        )
        return key_a, disjoint, same

    def _race(self, spark, wh, wh2, key_mine: int, key_theirs: int):
        """Deterministically lose the first CAS: just before our merge
        publishes, the competing merge (through a second handle on the
        same store) lands first."""
        fired = {"done": False}
        batch_theirs = spark.createDataFrame(
            [(key_theirs, "THEIRS")], "id long, v string"
        )
        if isinstance(wh, DeltaWarehouse):
            orig = wh._commit

            def racing(table, version, actions):
                if not fired["done"]:
                    fired["done"] = True
                    wh2.merge_bucketed("t", batch_theirs, snapshot="mB")
                return orig(table, version, actions)

            wh._commit = racing
        else:
            orig = wh._publish

            def racing(table, manifest, expected_version=None):
                if not fired["done"]:
                    fired["done"] = True
                    wh2.merge_bucketed("t", batch_theirs, snapshot="mB")
                return orig(table, manifest, expected_version)

            wh._publish = racing
        batch_mine = spark.createDataFrame(
            [(key_mine, "MINE")], "id long, v string"
        )
        try:
            wh.merge_bucketed("t", batch_mine, snapshot="mA")
        finally:
            if isinstance(wh, DeltaWarehouse):
                wh._commit = orig
            else:
                wh._publish = orig

    def _derive_dirs(self, wh):
        """Data directories on disk whose name marks a merge RETRY
        attempt (manifest: '-v<N>' suffix; delta: 'batch-mA-<n>')."""
        import re

        out = []
        for d in os.listdir(os.path.join(wh.root, "t")):
            if re.search(r"-v\d+$", d) or re.fullmatch(r"batch-mA-\d+", d):
                out.append(d)
        return out

    def test_disjoint_buckets_commit_without_rederive(
        self, spark, wh_factory
    ):
        wh, wh2 = wh_factory(), wh_factory()
        self._seed(spark, wh)
        base = head(wh, "t")
        key_a, key_disjoint, _ = self._keys_disjoint_overlapping(spark)
        self._race(spark, wh, wh2, key_a, key_disjoint)
        # both merges landed, exactly one commit each
        assert head(wh, "t") == base + 2
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert rows[key_a] == "MINE" and rows[key_disjoint] == "THEIRS"
        assert len(rows) == 16
        # ZERO re-derives: no retry-suffixed data directory exists
        assert self._derive_dirs(wh) == []

    def test_overlapping_buckets_still_rederive(self, spark, wh_factory):
        wh, wh2 = wh_factory(), wh_factory()
        self._seed(spark, wh)
        key_a, _, key_same = self._keys_disjoint_overlapping(spark)
        if key_same is None:
            pytest.skip("no same-bucket key pair at this layout")
        base = head(wh, "t")
        self._race(spark, wh, wh2, key_a, key_same)
        assert head(wh, "t") == base + 2
        # correctness first: both writers' rows survive the retry
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert rows[key_a] == "MINE" and rows[key_same] == "THEIRS"
        assert len(rows) == 16
        # and the loser really did re-derive (retry-named data dir)
        assert self._derive_dirs(wh) != []

    def test_concurrent_compaction_forces_rederive(self, spark, wh_factory):
        """OPTIMIZE repoints EVERY bucket — a merge that lost to it
        must re-derive (its read set was globally invalidated), never
        reconcile."""
        wh, wh2 = wh_factory(), wh_factory()
        self._seed(spark, wh)
        key_a, _, _ = self._keys_disjoint_overlapping(spark)
        fired = {"done": False}
        if isinstance(wh, DeltaWarehouse):
            orig = wh._commit

            def racing(table, version, actions):
                if not fired["done"]:
                    fired["done"] = True
                    wh2.compact("t")
                return orig(table, version, actions)

            wh._commit = racing
        else:
            orig = wh._publish

            def racing(table, manifest, expected_version=None):
                if not fired["done"]:
                    fired["done"] = True
                    wh2.compact("t")
                return orig(table, manifest, expected_version)

            wh._publish = racing
        try:
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(key_a, "MINE")], "id long, v string"),
                snapshot="mA",
            )
        finally:
            if isinstance(wh, DeltaWarehouse):
                wh._commit = orig
            else:
                wh._publish = orig
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert rows[key_a] == "MINE" and len(rows) == 16
        assert self._derive_dirs(wh) != []

    def test_reconciled_commit_carries_epoch_and_dv(
        self, spark, wh_factory
    ):
        """The reconciled publish preserves BOTH sides' invariants:
        our txn epoch lands, and a pre-existing DV on an untouched
        bucket keeps suppressing its row."""
        wh, wh2 = wh_factory(), wh_factory()
        self._seed(spark, wh)
        # merge-on-read delete on some row far from key_a's bucket
        key_a, key_disjoint, _ = self._keys_disjoint_overlapping(spark)
        victim = next(
            k
            for k in range(1, 17)
            if k not in (key_a, key_disjoint)
            and self._bucket(spark, k)
            not in (self._bucket(spark, key_a), self._bucket(spark, key_disjoint))
        )
        assert wh.delete_where("t", f"id = {victim}", mode="mor") == 1
        fired = {"done": False}
        batch_theirs = spark.createDataFrame(
            [(key_disjoint, "THEIRS")], "id long, v string"
        )
        if isinstance(wh, DeltaWarehouse):
            orig = wh._commit

            def racing(table, version, actions):
                if not fired["done"]:
                    fired["done"] = True
                    wh2.merge_bucketed("t", batch_theirs, snapshot="mB")
                return orig(table, version, actions)

            wh._commit = racing
        else:
            orig = wh._publish

            def racing(table, manifest, expected_version=None):
                if not fired["done"]:
                    fired["done"] = True
                    wh2.merge_bucketed("t", batch_theirs, snapshot="mB")
                return orig(table, manifest, expected_version)

            wh._publish = racing
        try:
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(key_a, "MINE")], "id long, v string"),
                snapshot="mA",
                txn=("app1", 7),
            )
        finally:
            if isinstance(wh, DeltaWarehouse):
                wh._commit = orig
            else:
                wh._publish = orig
        assert self._derive_dirs(wh) == []
        assert wh.last_txn_epoch("app1", "t") == 7
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert victim not in rows
        assert rows[key_a] == "MINE" and rows[key_disjoint] == "THEIRS"
        assert len(rows) == 15

    def test_evolve_merge_cas_loss_rederives_keeps_dv_gate(
        self, spark, wh_factory
    ):
        """Round-10 (advisor finding, delta _reconcile_merge_commit): a
        tail carrying protocol/metaData actions must NEVER be
        re-committed verbatim — a newly-mapped evolve's base-derived
        protocol row would last-wins drop the deletionVectors gate an
        intervening disjoint mor-delete just added. The fix re-derives
        instead, and the re-derived commit's protocol row reflects the
        head's live DVs."""
        import json as _json
        import os as _os
        import re as _re

        wh, wh2 = wh_factory(), wh_factory()
        if not isinstance(wh, DeltaWarehouse):
            pytest.skip("delta-specific: manifest reconcile is head-derived")
        self._seed(spark, wh)
        key_a, key_disjoint, _ = self._keys_disjoint_overlapping(spark)
        victim = next(
            k
            for k in range(1, 17)
            if self._bucket(spark, k) != self._bucket(spark, key_a)
        )
        fired = {"done": False}
        orig = wh._commit

        def racing(table, version, actions):
            if not fired["done"]:
                fired["done"] = True
                assert wh2.delete_where("t", f"id = {victim}", mode="mor") == 1
            return orig(table, version, actions)

        wh._commit = racing
        try:
            wh.merge_bucketed(
                "t",
                spark.createDataFrame(
                    [(key_a, "MINE")], "id long, display string"
                ),
                snapshot="mA",
                evolve=True,
                renames={"v": "display"},
            )
        finally:
            wh._commit = orig
        # end state: both writers\' effects land
        rows = {r["id"]: r["display"] for r in wh.read("t").collect()}
        assert rows[key_a] == "MINE" and victim not in rows
        assert len(rows) == 15
        # the LAST protocol row still gates deletionVectors (and now
        # also columnMapping from the evolve) while DVs are live
        ldir = wh._log_dir("t")
        last_proto = None
        for f in sorted(_os.listdir(ldir)):
            if not _re.fullmatch(r"\d+\.json", f):
                continue
            for ln in open(_os.path.join(ldir, f)):
                if ln.strip():
                    a = _json.loads(ln)
                    if "protocol" in a:
                        last_proto = a["protocol"]
        feats = set(last_proto.get("readerFeatures") or [])
        assert "deletionVectors" in feats, (
            f"DV feature gate lost by reconcile replay: {last_proto}"
        )
        assert "columnMapping" in feats


class TestMultiPartCheckpoints:
    """Round-10 (VERDICT next-round #3): states above
    ``checkpoint_part_size`` actions write the protocol's MULTI-PART
    classic checkpoint ({v}.checkpoint.{p:010}.{n:010}.parquet +
    "parts" in _last_checkpoint), bounding checkpoint write cost per
    part instead of one O(all-live-files) parquet. Replay from parts
    must equal replay from JSON, through BOTH the writer and the
    independent spec-pure reader."""

    def _wh(self, spark, tmp_path, part_size):
        return DeltaWarehouse(
            spark,
            str(tmp_path / "dwh"),
            checkpoint_interval=10_000,  # manual checkpoints only
            checkpoint_part_size=part_size,
        )

    def _seed(self, spark, wh, n=48, buckets=16):
        base = spark.createDataFrame(
            [(i, f"v{i}", i * 10) for i in range(1, n + 1)],
            "id long, v string, cnt int",
        )
        wh.write("t", base, snapshot="s0", bucket=("id", buckets))
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "V1", 11)], "id long, v string, cnt int"),
            snapshot="m1",
            txn=("app", 3),
        )

    def _expect(self, wh):
        return sorted(tuple(r) for r in wh.read("t").collect())

    def test_parts_written_and_roundtrip(self, spark, tmp_path):
        import re

        wh = self._wh(spark, tmp_path, part_size=5)
        self._seed(spark, wh)
        want = self._expect(wh)
        wh.checkpoint("t")
        ldir = wh._log_dir("t")
        parts = sorted(
            f
            for f in os.listdir(ldir)
            if re.fullmatch(r"\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet", f)
        )
        assert len(parts) > 1, "state must have split into parts"
        lc = json.load(open(os.path.join(ldir, "_last_checkpoint")))
        assert lc["parts"] == len(parts)
        # every named part exists with the declared numbering
        assert parts == [
            f"{lc['version']:020d}.checkpoint."
            f"{p:010d}.{lc['parts']:010d}.parquet"
            for p in range(1, lc["parts"] + 1)
        ]
        assert self._expect(wh) == want

    def test_replay_actually_uses_parts(self, spark, tmp_path):
        """Deleting every pre-checkpoint JSON commit proves the parts
        carry the full state (and _read_last_checkpoint reads them)."""
        wh = self._wh(spark, tmp_path, part_size=4)
        self._seed(spark, wh)
        want = self._expect(wh)
        wh.checkpoint("t")
        v = wh.current_version("t")
        ldir = wh._log_dir("t")
        # delete every commit BELOW the checkpoint (Delta's metadata
        # cleanup shape: the checkpoint version's own JSON stays, it
        # is the version-discovery anchor)
        for f in list(os.listdir(ldir)):
            if f.endswith(".json") and int(f.split(".")[0]) < v:
                os.remove(os.path.join(ldir, f))
        # post-checkpoint commits still fold on top
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(2, "V2", 22)], "id long, v string, cnt int"),
            snapshot="m2",
        )
        got = {r["id"]: (r["v"], r["cnt"]) for r in wh.read("t").collect()}
        assert got[2] == ("V2", 22) and got[1] == ("V1", 11)
        assert len(got) == len(want)
        # epochs survive the checkpoint round-trip
        assert wh.last_txn_epoch("app", "t") == 3

    def test_missing_part_falls_back_to_json(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path, part_size=4)
        self._seed(spark, wh)
        want = self._expect(wh)
        wh.checkpoint("t")
        ldir = wh._log_dir("t")
        victim = next(
            f for f in sorted(os.listdir(ldir)) if ".checkpoint.00000" in f
        )
        os.remove(os.path.join(ldir, victim))
        # JSON intact -> full replay still serves the exact state
        assert self._expect(wh) == want

    def test_independent_reader_reads_parts(self, spark, tmp_path):
        import sys

        import duckdb

        sys.path.insert(0, "/root/repo/tools")
        try:
            import delta_reader
        finally:
            sys.path.pop(0)

        wh = self._wh(spark, tmp_path, part_size=4)
        self._seed(spark, wh)
        # harden the state: a mor-delete (inline DV) + a rename evolve
        # (column mapping) must survive the part split too
        assert wh.delete_where("t", "id = 7", mode="mor") == 1
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(3, "N3", 33)], "id long, name string, cnt long"),
            snapshot="m2",
            evolve=True,
            renames={"v": "name"},
        )
        wh.checkpoint("t")
        v = wh.current_version("t")
        ldir = wh._log_dir("t")
        for f in list(os.listdir(ldir)):
            if f.endswith(".json") and int(f.split(".")[0]) < v:
                os.remove(os.path.join(ldir, f))
        sql = delta_reader.duckdb_sql(os.path.join(wh.root, "t"))
        rel = duckdb.sql(sql)
        cols = [d[0] for d in rel.description]
        got = sorted(
            tuple(r[cols.index(c)] for c in ("id", "name", "cnt"))
            for r in rel.fetchall()
        )
        want = sorted(
            tuple(r)
            for r in wh.read("t").select("id", "name", "cnt").collect()
        )
        assert got == want
        assert all(g[0] != 7 for g in got)

    def test_single_part_path_unchanged(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path, part_size=100_000)
        self._seed(spark, wh)
        wh.checkpoint("t")
        ldir = wh._log_dir("t")
        assert any(
            f.endswith(".checkpoint.parquet") for f in os.listdir(ldir)
        )
        lc = json.load(open(os.path.join(ldir, "_last_checkpoint")))
        assert "parts" not in lc


class TestDeltaLogCleanup:
    """vacuum's metadata cleanup (the delta.logRetentionDuration
    analog): log JSONs and superseded checkpoint files below the
    active _last_checkpoint pointer are deleted past retention — the
    log directory stops being the one file set that grows forever.
    Head reads, epochs, the change feed ABOVE the checkpoint, and the
    independent reader must all be unaffected; time travel BELOW the
    checkpoint raises like any vacuumed read."""

    def _seeded(self, spark, tmp_path, part_size=4):
        wh = DeltaWarehouse(
            spark,
            str(tmp_path / "dlc"),
            checkpoint_interval=10_000,
            checkpoint_part_size=part_size,
        )
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 33)], "id long, v string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 8))
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "V1")], "id long, v string"),
            snapshot="m1",
            txn=("app", 7),
        )
        wh.checkpoint("t")
        # post-checkpoint commit so the JSON tail matters
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(2, "V2")], "id long, v string"),
            snapshot="m2",
        )
        return wh

    def test_log_cleanup_below_checkpoint(self, spark, tmp_path):
        import os as _os

        wh = self._seeded(spark, tmp_path)
        want = sorted(tuple(r) for r in wh.read("t").collect())
        ldir = wh._log_dir("t")
        import json as _json

        vc = _json.load(open(_os.path.join(ldir, "_last_checkpoint")))[
            "version"
        ]
        before = sorted(_os.listdir(ldir))
        n = wh.vacuum("t", retention_sec=0.0)
        assert n > 0
        after = sorted(_os.listdir(ldir))
        # every JSON below the pointer is gone; pointer version + tail
        # stay
        for f in after:
            if f.endswith(".json"):
                assert int(f[:20]) >= vc, f
        assert any(int(f[:20]) == vc for f in after if f.endswith(".json"))
        # checkpoint files at the pointer stay (part or single form)
        assert any(".checkpoint" in f for f in after)
        # state, epochs, head reads unaffected
        assert sorted(tuple(r) for r in wh.read("t").collect()) == want
        assert wh.last_txn_epoch("app", "t") == 7
        # a fresh warehouse object (no memo) replays identically
        wh2 = DeltaWarehouse(spark, wh.root)
        assert sorted(tuple(r) for r in wh2.read("t").collect()) == want
        # sub-checkpoint time travel now raises, like vacuumed data
        with pytest.raises(FileNotFoundError):
            wh.read_at_version("t", 0)
        # independent reader still decodes the table
        import sys as _sys

        _sys.path.insert(0, "/root/repo/tools")
        try:
            import delta_reader
        finally:
            _sys.path.pop(0)
        import duckdb as _duckdb

        rel = _duckdb.sql(
            delta_reader.duckdb_sql(_os.path.join(wh.root, "t"))
        )
        cols = [d[0] for d in rel.description]
        got = sorted(
            (r[cols.index("id")], r[cols.index("v")]) for r in rel.fetchall()
        )
        assert got == [(t[0], t[1]) for t in want]
        assert before != after

    def test_no_pointer_no_cleanup(self, spark, tmp_path):
        wh = DeltaWarehouse(spark, str(tmp_path / "np"))
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        import os as _os

        ldir = wh._log_dir("t")
        before = sorted(_os.listdir(ldir))
        wh.vacuum("t", retention_sec=0.0)
        assert sorted(_os.listdir(ldir)) == before

    def test_retention_window_respected(self, spark, tmp_path):
        # generous retention: nothing in the log is old enough
        wh = self._seeded(spark, tmp_path)
        import os as _os

        ldir = wh._log_dir("t")
        before = sorted(
            f for f in _os.listdir(ldir)
            if f.endswith(".json") or ".checkpoint" in f
        )
        wh.vacuum("t", retention_sec=3600.0)
        after = sorted(
            f for f in _os.listdir(ldir)
            if f.endswith(".json") or ".checkpoint" in f
        )
        assert after == before

    def test_stream_source_composes_with_log_cleanup(self, spark, tmp_path):
        """After checkpoint+vacuum cleans the log tail, every stream/
        CDF read of the cleaned range fails DESCRIPTIVELY (the same
        pruned-gap contract the manifest impl always had) while reads
        of the retained range and the head stay green:

        - a startingVersion whose diff base was cleaned -> the
          not-retained FeedReconstructionError with restart guidance;
        - 'earliest' when the earliest retained SNAPSHOT needs a
          vacuumed data file (a post-checkpoint merge tombstoned it,
          retention 0 deleted it) -> the vacuumed-files
          FeedReconstructionError, never a silent partial delivery;
        - with retention 0 even the head diff's PREIMAGE files are
          gone (this is why real retention windows exist) -> same
          descriptive error, never a partial delivery;
        - a post-vacuum commit is reconstructable and delivers;
        - head snapshot reads unaffected."""
        from canvas_data_loader_spark.sources.warehouse_source import (
            FeedReconstructionError,
            WarehouseDataSource,
            _Meta,
            _resolve_start,
        )

        wh = self._seeded(spark, tmp_path)
        head = wh.current_version("t")
        wh.vacuum("t", retention_sec=0.0)
        spark.dataSource.register(WarehouseDataSource)
        base = (
            spark.read.format("cdl_warehouse")
            .option("root", wh.root)
            .option("table", "t")
        )
        with pytest.raises(Exception, match="vacuumed data files"):
            (
                base.option("feed", "true")
                .option("startingVersion", "earliest")
                .load()
                .collect()
            )
        meta = _Meta(wh.root, "t")
        with pytest.raises(FeedReconstructionError, match="not retained"):
            _resolve_start(meta, "1", default_latest=False)
        with pytest.raises(Exception, match="vacuumed data files"):
            (
                base.option("feed", "true")
                .option("startingVersion", str(head))
                .load()
                .collect()
            )
        # a post-vacuum commit's diff base (head's files) is live
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(3, "V3")], "id long, v string"),
            snapshot="m3",
        )
        got = (
            base.option("feed", "true")
            .option("startingVersion", str(head + 1))
            .load()
            .collect()
        )
        assert sorted(r["_change_type"] for r in got) == [
            "update_postimage",
            "update_preimage",
        ]
        # fresh reader: `base` accumulated the feed options above
        assert (
            spark.read.format("cdl_warehouse")
            .option("root", wh.root)
            .option("table", "t")
            .load()
            .count()
        ) == 32


class TestDeltaV2Checkpoints:
    """Round-11 (VERDICT r10 What's-missing #4): the V2 SPEC checkpoint
    layout — a {v}.checkpoint.{uniqueId}.parquet manifest carrying
    protocol/metaData/txn/checkpointMetadata/sidecar rows, with the
    FILE actions in sidecar parquets under _delta_log/_sidecars/ — the
    form current external writers produce. Both the warehouse reader
    and the independent spec-pure reader consume it; classic and
    multi-part remain readable; vacuum's log cleanup keeps the active
    manifest's sidecars and sweeps superseded ones."""

    def _wh(self, spark, tmp_path, part_size=5):
        return DeltaWarehouse(
            spark,
            str(tmp_path / "dv2"),
            checkpoint_interval=10_000,  # manual checkpoints only
            checkpoint_part_size=part_size,
            checkpoint_v2=True,
        )

    def _seed(self, spark, wh, n=48, buckets=16):
        base = spark.createDataFrame(
            [(i, f"v{i}", i * 10) for i in range(1, n + 1)],
            "id long, v string, cnt int",
        )
        wh.write("t", base, snapshot="s0", bucket=("id", buckets))
        wh.merge_bucketed(
            "t",
            spark.createDataFrame(
                [(1, "V1", 11)], "id long, v string, cnt int"
            ),
            snapshot="m1",
            txn=("app", 3),
        )

    def _expect(self, wh):
        return sorted(tuple(r) for r in wh.read("t").collect())

    def test_v2_layout_written_and_roundtrip(self, spark, tmp_path):
        import re

        wh = self._wh(spark, tmp_path, part_size=5)
        self._seed(spark, wh)
        want = self._expect(wh)
        path = wh.checkpoint("t")
        ldir = wh._log_dir("t")
        # manifest name is the V2 shape (uniqueId, not a classic name)
        assert re.fullmatch(
            r"\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet",
            os.path.basename(path),
        )
        # file actions split into part-size-bounded sidecars
        sdir = os.path.join(ldir, "_sidecars")
        sides = sorted(os.listdir(sdir))
        assert len(sides) > 1 and all(s.endswith(".parquet") for s in sides)
        lc = json.load(open(os.path.join(ldir, "_last_checkpoint")))
        assert "parts" not in lc and lc["version"] == wh.current_version("t")
        # the manifest references exactly the written sidecars
        import pyarrow.parquet as pq

        refs = sorted(
            r["sidecar"]["path"]
            for r in pq.read_table(path).to_pylist()
            if r.get("sidecar")
        )
        assert refs == sides
        # checkpointMetadata row carries the version
        cm = [
            r["checkpointMetadata"]
            for r in pq.read_table(path).to_pylist()
            if r.get("checkpointMetadata")
        ]
        assert len(cm) == 1 and int(cm[0]["version"]) == lc["version"]
        # the manifest's protocol row declares the v2Checkpoint
        # readerWriter table feature the upstream spec gates V2-
        # checkpoint handling on (round-12 ADVICE)
        protos = [
            r["protocol"]
            for r in pq.read_table(path).to_pylist()
            if r.get("protocol")
        ]
        assert len(protos) == 1
        assert protos[0]["minReaderVersion"] == 3
        assert protos[0]["minWriterVersion"] == 7
        assert "v2Checkpoint" in protos[0]["readerFeatures"]
        assert "v2Checkpoint" in protos[0]["writerFeatures"]
        assert self._expect(wh) == want

    def test_protocol_never_regresses_below_v2_checkpoint(
        self, spark, tmp_path
    ):
        """Once a V2 checkpoint exists, every LATER protocol-emitting
        commit keeps declaring the v2Checkpoint readerWriter feature
        (round-13 ADVICE): a DV-adding delete after the checkpoint —
        and the same commit issued by a DIFFERENT warehouse handle
        opened with checkpoint_v2=False over the same log — must not
        regress the declaration below what the still-referenced
        checkpoint requires for a strict external reader."""

        def _commit_protocols(ldir, v_from=0):
            out = []
            for f in sorted(os.listdir(ldir)):
                if not f.endswith(".json") or not f[0].isdigit():
                    continue
                if int(f.split(".")[0]) < v_from:
                    continue
                with open(os.path.join(ldir, f)) as fh:
                    for line in fh:
                        a = json.loads(line)
                        if "protocol" in a:
                            out.append(a["protocol"])
            return out

        wh = self._wh(spark, tmp_path, part_size=4)
        self._seed(spark, wh)
        wh.checkpoint("t")
        v_ckpt = wh.current_version("t")
        ldir = wh._log_dir("t")
        # a DV commit from the checkpointing handle
        assert wh.delete_where("t", "id = 5", mode="mor") == 1
        # ... and one from a fresh handle that does NOT itself write
        # v2 checkpoints (the in-effect detection reads the active
        # _last_checkpoint, not the handle's own config)
        wh_plain = DeltaWarehouse(
            spark, wh.root, checkpoint_interval=10_000, checkpoint_v2=False
        )
        assert wh_plain.delete_where("t", "id = 6", mode="mor") == 1
        protos = _commit_protocols(ldir, v_from=v_ckpt + 1)
        assert len(protos) == 2
        for p in protos:
            assert "v2Checkpoint" in p.get("readerFeatures", []), p
            assert "v2Checkpoint" in p.get("writerFeatures", []), p
            assert "deletionVectors" in p["writerFeatures"]
        # state stays correct through it all
        got = {r[0] for r in wh.read("t").select("id").collect()}
        assert 5 not in got and 6 not in got

    def test_replay_actually_uses_v2(self, spark, tmp_path):
        """Deleting every pre-checkpoint JSON proves the manifest +
        sidecars carry the full state (adds, DV deletes, epochs)."""
        wh = self._wh(spark, tmp_path, part_size=4)
        self._seed(spark, wh)
        assert wh.delete_where("t", "id = 7", mode="mor") == 1
        want = self._expect(wh)
        wh.checkpoint("t")
        v = wh.current_version("t")
        ldir = wh._log_dir("t")
        for f in list(os.listdir(ldir)):
            if f.endswith(".json") and int(f.split(".")[0]) < v:
                os.remove(os.path.join(ldir, f))
        assert self._expect(wh) == want
        # post-checkpoint commits fold on top; epochs survive
        wh.merge_bucketed(
            "t",
            spark.createDataFrame(
                [(2, "V2", 22)], "id long, v string, cnt int"
            ),
            snapshot="m2",
        )
        got = {r["id"]: (r["v"], r["cnt"]) for r in wh.read("t").collect()}
        assert got[2] == ("V2", 22) and got[1] == ("V1", 11)
        assert 7 not in got
        assert wh.last_txn_epoch("app", "t") == 3

    def test_missing_sidecar_falls_back_to_json(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path, part_size=4)
        self._seed(spark, wh)
        want = self._expect(wh)
        wh.checkpoint("t")
        sdir = os.path.join(wh._log_dir("t"), "_sidecars")
        victim = sorted(os.listdir(sdir))[0]
        os.remove(os.path.join(sdir, victim))
        # JSON intact -> full replay still serves the exact state
        assert self._expect(wh) == want

    def test_independent_reader_reads_v2(self, spark, tmp_path):
        import sys

        import duckdb

        sys.path.insert(0, "/root/repo/tools")
        try:
            import delta_reader
        finally:
            sys.path.pop(0)

        wh = self._wh(spark, tmp_path, part_size=4)
        self._seed(spark, wh)
        # harden: a mor-delete (inline DV) + a rename evolve (column
        # mapping) must survive the sidecar split too
        assert wh.delete_where("t", "id = 7", mode="mor") == 1
        wh.merge_bucketed(
            "t",
            spark.createDataFrame(
                [(3, "N3", 33)], "id long, name string, cnt long"
            ),
            snapshot="m2",
            evolve=True,
            renames={"v": "name"},
        )
        wh.checkpoint("t")
        v = wh.current_version("t")
        ldir = wh._log_dir("t")
        for f in list(os.listdir(ldir)):
            if f.endswith(".json") and int(f.split(".")[0]) < v:
                os.remove(os.path.join(ldir, f))
        sql = delta_reader.duckdb_sql(os.path.join(wh.root, "t"))
        rel = duckdb.sql(sql)
        cols = [d[0] for d in rel.description]
        got = sorted(
            tuple(r[cols.index(c)] for c in ("id", "name", "cnt"))
            for r in rel.fetchall()
        )
        want = sorted(
            tuple(r)
            for r in wh.read("t").select("id", "name", "cnt").collect()
        )
        assert got == want
        assert all(g[0] != 7 for g in got)

    def test_log_cleanup_sweeps_superseded_keeps_active(
        self, spark, tmp_path
    ):
        wh = self._wh(spark, tmp_path, part_size=4)
        self._seed(spark, wh)
        wh.checkpoint("t")  # superseded later
        sdir = os.path.join(wh._log_dir("t"), "_sidecars")
        old_sides = set(os.listdir(sdir))
        wh.merge_bucketed(
            "t",
            spark.createDataFrame(
                [(2, "V2", 22)], "id long, v string, cnt int"
            ),
            snapshot="m2",
        )
        wh.checkpoint("t")  # the active pointer
        want = self._expect(wh)
        active_path = None
        import re

        ldir = wh._log_dir("t")
        lc = json.load(open(os.path.join(ldir, "_last_checkpoint")))
        wh.vacuum("t", retention_sec=0)
        sides_now = set(os.listdir(sdir))
        # the active manifest's sidecars stay; superseded ones are gone
        # (versions differ, so uuid5 names differ)
        assert not (old_sides & sides_now)
        assert sides_now, "active sidecars must survive"
        # superseded v2 manifest below the pointer is gone too
        manifests = [
            f
            for f in os.listdir(ldir)
            if re.fullmatch(
                r"\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet", f
            )
        ]
        assert all(int(f.split(".")[0]) >= lc["version"] for f in manifests)
        assert self._expect(wh) == want

    def test_classic_remains_readable_alongside(self, spark, tmp_path):
        """The same warehouse object reads a CLASSIC checkpoint it
        inherited (v2 is a write-side choice, never a read gate)."""
        wh = self._wh(spark, tmp_path, part_size=100_000)
        self._seed(spark, wh)
        want = self._expect(wh)
        wh.checkpoint("t", v2=False)  # classic single-file
        ldir = wh._log_dir("t")
        assert any(
            f.endswith(".checkpoint.parquet") for f in os.listdir(ldir)
        )
        v = wh.current_version("t")
        for f in list(os.listdir(ldir)):
            if f.endswith(".json") and int(f.split(".")[0]) < v:
                os.remove(os.path.join(ldir, f))
        assert self._expect(wh) == want


class TestJoinViews:
    """create_join_view / refresh_join_view (round 13 — plans/ops.py):
    a fact ⋈ dim INNER equi-join materialized with a ``__pending``
    sidecar of unmatched fact rows, maintained at O(touched join-key
    buckets) from BOTH sides' change feeds. The exactness bar is
    equality against a from-scratch `_jv_split` of both heads, on both
    commit protocols, through every motion: fact update / insert
    (matched and unmatched) / fk re-pointing / delete, dim payload
    update / dim INSERT promoting pending rows / dim DELETE demoting
    matched rows, replay no-op, maintenance-only advance, and full
    rebuild on incarnation change."""

    @staticmethod
    def _fact(spark):
        return spark.createDataFrame(
            [(i, i % 6, i * 10.0) for i in range(1, 41)],
            "oid long, ckey long, amt double",
        )

    @staticmethod
    def _dim(spark):
        # keys 4, 5 deliberately absent: fact rows with them start
        # in the pending sidecar
        return spark.createDataFrame(
            [(c, f"cust{c}", f"seg{c % 2}") for c in range(0, 4)],
            "ckey long, cname string, seg string",
        )

    @staticmethod
    def _rebuilt(wh):
        from canvas_data_loader_spark.plans.ops import _jv_split

        m, p = _jv_split(
            wh.read("fact"), wh.read("dim"), "ckey", "ckey",
            ["cname", "seg"],
        )
        return (
            sorted(tuple(r) for r in m.collect()),
            sorted(tuple(r) for r in p.collect()),
        )

    @staticmethod
    def _current(wh):
        return (
            sorted(tuple(r) for r in wh.read("jv").collect()),
            sorted(tuple(r) for r in wh.read("jv__pending").collect()),
        )

    def _mk(self, spark, wh):
        from canvas_data_loader_spark.plans.ops import create_join_view

        wh.write("fact", self._fact(spark), "s0", bucket=("oid", 8))
        wh.write("dim", self._dim(spark), "s0", bucket=("ckey", 4))
        create_join_view(wh, "jv", "fact", "dim", fk="ckey")

    def test_maintained_equals_rebuilt_through_all_motions(
        self, spark, wh_factory
    ):
        from canvas_data_loader_spark.plans.ops import refresh_join_view

        wh = wh_factory()
        self._mk(spark, wh)
        assert self._current(wh) == self._rebuilt(wh)
        assert refresh_join_view(wh, "jv")["mode"] == "noop"
        # FACT wave: amt update, matched insert, UNMATCHED insert,
        # fk re-pointing to an unmatched key, and a delete
        wh.merge_bucketed(
            "fact",
            spark.createDataFrame(
                [(1, 1, 999.0), (41, 2, 55.0), (42, 5, 66.0), (2, 4, 20.0)],
                "oid long, ckey long, amt double",
            ),
            "m1",
            delete_keys=spark.createDataFrame([(3,)], "oid long"),
        )
        out = refresh_join_view(wh, "jv")
        assert out["mode"] == "incremental"
        assert self._current(wh) == self._rebuilt(wh)
        # DIM wave: payload update, INSERT of key 5 (must PROMOTE the
        # pending fact rows — unfindable without the sidecar), DELETE
        # of key 0 (must demote its matched rows back to pending)
        wh.merge_bucketed(
            "dim",
            spark.createDataFrame(
                [(1, "cust1-renamed", "seg9"), (5, "cust5", "seg1")],
                "ckey long, cname string, seg string",
            ),
            "m1",
            delete_keys=spark.createDataFrame([(0,)], "ckey long"),
        )
        assert refresh_join_view(wh, "jv")["mode"] == "incremental"
        assert self._current(wh) == self._rebuilt(wh)
        assert wh.read("jv").filter("ckey = 5").count() > 0
        assert wh.read("jv__pending").filter("ckey = 0").count() > 0
        # replay: noop; maintenance-only interval: advance
        assert refresh_join_view(wh, "jv")["mode"] == "noop"
        wh.record_txn("fact", "someapp", 1)
        assert refresh_join_view(wh, "jv")["mode"] == "advance"
        assert self._current(wh) == self._rebuilt(wh)
        # auto-discovery from the DIM side: refresh_views_of(dim) finds
        # the view through jv.dim and never touches the pending sidecar
        # directly (mv.parent)
        from canvas_data_loader_spark.plans.ops import refresh_views_of

        wh.merge_bucketed(
            "dim",
            spark.createDataFrame(
                [(2, "cust2-v2", "seg0")],
                "ckey long, cname string, seg string",
            ),
            "m2",
        )
        refresh_views_of(wh, "dim")
        assert self._current(wh) == self._rebuilt(wh)

    def test_dim_recreate_triggers_full_rebuild(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import refresh_join_view

        wh = wh_factory()
        self._mk(spark, wh)
        wh.drop("dim")
        wh.write("dim", self._dim(spark), "s0", bucket=("ckey", 4))
        out = refresh_join_view(wh, "jv")
        assert out["mode"] == "full"
        assert self._current(wh) == self._rebuilt(wh)
        assert refresh_join_view(wh, "jv")["mode"] == "noop"

    def test_crash_between_pair_heals(self, spark, wh_factory):
        """A crash AFTER the pending commit but BEFORE the view commit
        leaves pending's epoch ahead of the view watermark. The next
        refresh detects the half-applied pair and heals by REBUILDING
        from both heads — a state-based replay is exact for fact waves
        like this one but loses dim-side promotions (a committed
        pending merge already consumed the promoted rows), so the
        detection is unconditional; see
        TestJoinViewCrashBetweenCommitPair for the lossy case."""
        from canvas_data_loader_spark.plans.ops import refresh_join_view

        wh = wh_factory()
        self._mk(spark, wh)
        wh.merge_bucketed(
            "fact",
            spark.createDataFrame(
                [(1, 5, 111.0), (43, 0, 77.0)],
                "oid long, ckey long, amt double",
            ),
            "m1",
        )
        real = wh.merge_bucketed

        def dying(table, *a, **kw):
            out = real(table, *a, **kw)
            if table == "jv":
                raise RuntimeError("injected crash after view commit? no —")
            return out

        # crash BEFORE the view merge: let pending commit, die on view
        def dying_before_view(table, *a, **kw):
            if table == "jv":
                raise RuntimeError("injected crash")
            return real(table, *a, **kw)

        wh.merge_bucketed = dying_before_view
        try:
            with pytest.raises(RuntimeError, match="injected crash"):
                refresh_join_view(wh, "jv")
        finally:
            wh.merge_bucketed = real
        # the crashed pair is detected; the rebuild converges
        out = refresh_join_view(wh, "jv")
        assert out["mode"] == "full"
        assert self._current(wh) == self._rebuilt(wh)
        assert refresh_join_view(wh, "jv")["mode"] == "noop"

    def test_rollup_composes_on_top(self, spark, wh_factory):
        """A rollup view OVER the join view — the star-schema rollup —
        maintains itself from the join view's change feed with zero new
        machinery: the join view is a first-class warehouse table."""
        from canvas_data_loader_spark.operators.ivm import build_rollup
        from canvas_data_loader_spark.plans.ops import (
            create_rollup_view,
            refresh_join_view,
            refresh_view,
        )

        wh = wh_factory()
        self._mk(spark, wh)
        create_rollup_view(
            wh, "amt_by_seg", "jv", ["seg"], {"total_amt": "amt"},
            source_key="oid",
        )
        wh.merge_bucketed(
            "dim",
            spark.createDataFrame(
                [(0, "cust0", "seg9"), (4, "cust4", "seg0")],
                "ckey long, cname string, seg string",
            ),
            "m1",
        )
        refresh_join_view(wh, "jv")
        out = refresh_view(wh, "amt_by_seg")
        assert out["mode"] in ("incremental", "full")
        assert sorted(
            tuple(r) for r in wh.read("amt_by_seg").collect()
        ) == sorted(
            tuple(r)
            for r in build_rollup(
                wh.read("jv"), ["seg"], {"total_amt": "amt"}
            ).collect()
        )

    def test_sql_ddl_create_refresh_drop(self, spark, wh_factory):
        from canvas_data_loader_spark.sql import SqlDmlError, execute_dml

        wh = wh_factory()
        wh.write("fact", self._fact(spark), "s0", bucket=("oid", 8))
        wh.write("dim", self._dim(spark), "s0", bucket=("ckey", 4))
        out = execute_dml(
            wh,
            "CREATE MATERIALIZED VIEW jv AS SELECT * FROM fact "
            "JOIN dim ON fact.ckey = dim.ckey",
        )
        assert out["kind"] == "join"
        assert self._current(wh) == self._rebuilt(wh)
        wh.merge_bucketed(
            "dim",
            spark.createDataFrame(
                [(4, "cust4", "seg0")], "ckey long, cname string, seg string"
            ),
            "m1",
        )
        out = execute_dml(wh, "REFRESH MATERIALIZED VIEW jv")
        assert out["mode"] == "incremental"
        assert self._current(wh) == self._rebuilt(wh)
        # statement writes to the view and its sidecar are refused
        with pytest.raises(SqlDmlError, match="materialized view"):
            execute_dml(wh, "DELETE FROM jv WHERE oid = 1")
        with pytest.raises(SqlDmlError, match="materialized view"):
            execute_dml(wh, "DELETE FROM jv__pending WHERE oid = 1")
        # DROP takes the pending sidecar with it
        execute_dml(wh, "DROP MATERIALIZED VIEW jv")
        assert not wh.exists("jv") and not wh.exists("jv__pending")
        # a mis-qualified ON clause is refused with the actionable error
        with pytest.raises(SqlDmlError, match="qualifiers"):
            execute_dml(
                wh,
                "CREATE MATERIALIZED VIEW jv2 AS SELECT * FROM fact "
                "JOIN dim ON other.ckey = dim.ckey",
            )

    def test_create_validations(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import create_join_view

        wh = wh_factory()
        wh.write("fact", self._fact(spark), "s0", bucket=("oid", 8))
        wh.write("dim", self._dim(spark), "s0", bucket=("ckey", 4))
        with pytest.raises(ValueError, match="distinct fact and dim"):
            create_join_view(wh, "jv", "fact", "fact", fk="ckey")
        with pytest.raises(ValueError, match="not a column"):
            create_join_view(wh, "jv", "fact", "dim", fk="nope")
        # a dim payload column colliding with a fact column is refused
        wh.write(
            "dim2",
            self._dim(spark).withColumnRenamed("cname", "amt"),
            "s0",
            bucket=("ckey", 4),
        )
        with pytest.raises(ValueError, match="collide with fact columns"):
            create_join_view(wh, "jv", "fact", "dim2", fk="ckey")


class TestMvHistoryResetRebuildsOnce:
    """The advance_index/sync_mirror shadowed-watermark rule applied to
    the three MV lanes: a source drop+recreate whose version counter
    restarts BELOW the recorded epoch must cost ONE rebuild, after
    which the incremental ladder re-arms — the monotone-max txn map
    alone would put the lane on the full path EVERY refresh until the
    new counter caught up."""

    @staticmethod
    def _advance(wh, spark, table, rows, n):
        for i in range(n):
            wh.merge_bucketed(
                table,
                spark.createDataFrame(rows(i), "id long, grp string, amount long"),
                snapshot=f"adv{i}",
            )

    def test_rollup_goes_incremental_after_reset(self, spark, wh_factory):
        from canvas_data_loader_spark.operators.ivm import build_rollup
        from canvas_data_loader_spark.plans.ops import (
            create_rollup_view,
            refresh_rollup_view,
        )

        wh = wh_factory()
        base = spark.createDataFrame(
            [(i, f"g{i % 3}", i * 10) for i in range(24)],
            "id long, grp string, amount long",
        )
        wh.write("facts", base, "s0", bucket=("id", 8))
        create_rollup_view(wh, "v", "facts", ["grp"], {"total": "amount"})
        self._advance(
            wh, spark, "facts", lambda i: [(900 + i, "gX", i)], 3
        )
        assert refresh_rollup_view(wh, "v")["mode"] == "incremental"
        old_head = wh.current_version("facts")
        wh.drop("facts")
        wh.write("facts", base, "s0", bucket=("id", 8))
        assert wh.current_version("facts") < old_head
        assert refresh_rollup_view(wh, "v")["mode"] == "full"
        assert refresh_rollup_view(wh, "v")["mode"] == "noop"
        # the lane must keep tracking the new incarnation INCREMENTALLY
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(1, "g1", 7777)], "id long, grp string, amount long"
            ),
            snapshot="post",
        )
        assert refresh_rollup_view(wh, "v")["mode"] == "incremental"
        assert sorted(tuple(r) for r in wh.read("v").collect()) == sorted(
            tuple(r)
            for r in build_rollup(
                wh.read("facts"), ["grp"], {"total": "amount"}
            ).collect()
        )

    def test_minmax_goes_incremental_after_reset(self, spark, wh_factory):
        from canvas_data_loader_spark.operators.ivm import (
            build_minmax_partials,
            finalize_minmax,
        )
        from canvas_data_loader_spark.plans.ops import (
            create_minmax_view,
            refresh_minmax_view,
        )

        wh = wh_factory()
        base = spark.createDataFrame(
            [(i, f"g{i % 3}", i * 10) for i in range(24)],
            "id long, grp string, amount long",
        )
        wh.write("facts", base, "s0", bucket=("id", 8))
        create_minmax_view(
            wh, "v", "facts", ["grp"], {"lo": ("amount", "min")}
        )
        self._advance(
            wh, spark, "facts", lambda i: [(900 + i, "gX", -i)], 3
        )
        assert refresh_minmax_view(wh, "v")["mode"] == "incremental"
        old_head = wh.current_version("facts")
        wh.drop("facts")
        wh.write("facts", base, "s0", bucket=("id", 8))
        assert wh.current_version("facts") < old_head
        assert refresh_minmax_view(wh, "v")["mode"] == "full"
        assert refresh_minmax_view(wh, "v")["mode"] == "noop"
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(1, "g1", -555)], "id long, grp string, amount long"
            ),
            snapshot="post",
        )
        assert refresh_minmax_view(wh, "v")["mode"] == "incremental"
        want = finalize_minmax(
            build_minmax_partials(
                wh.read("facts"), "id", 8, ["grp"], {"lo": ("amount", "min")}
            ),
            ["grp"],
            {"lo": ("amount", "min")},
        )
        assert sorted(tuple(r) for r in wh.read("v").collect()) == sorted(
            tuple(r) for r in want.collect()
        )

    def test_join_view_goes_incremental_after_fact_reset(
        self, spark, wh_factory
    ):
        from canvas_data_loader_spark.plans.ops import (
            _jv_split,
            create_join_view,
            refresh_join_view,
        )

        wh = wh_factory()
        fact = spark.createDataFrame(
            [(i, i % 4, i * 10.0) for i in range(1, 17)],
            "oid long, ckey long, amt double",
        )
        wh.write("fact", fact, "s0", bucket=("oid", 8))
        wh.write(
            "dim",
            spark.createDataFrame(
                [(c, f"cust{c}") for c in range(0, 3)],
                "ckey long, cname string",
            ),
            "s0",
            bucket=("ckey", 4),
        )
        create_join_view(wh, "jv", "fact", "dim", fk="ckey")
        for i in range(3):
            wh.merge_bucketed(
                "fact",
                spark.createDataFrame(
                    [(100 + i, i % 4, 5.0)], "oid long, ckey long, amt double"
                ),
                snapshot=f"adv{i}",
            )
            assert refresh_join_view(wh, "jv")["mode"] == "incremental"
        old_head = wh.current_version("fact")
        wh.drop("fact")
        wh.write("fact", fact, "s0", bucket=("oid", 8))
        assert wh.current_version("fact") < old_head
        assert refresh_join_view(wh, "jv")["mode"] == "full"
        assert refresh_join_view(wh, "jv")["mode"] == "noop"
        wh.merge_bucketed(
            "fact",
            spark.createDataFrame(
                [(1, 2, 999.0)], "oid long, ckey long, amt double"
            ),
            snapshot="post",
        )
        assert refresh_join_view(wh, "jv")["mode"] == "incremental"
        m, p = _jv_split(
            wh.read("fact"), wh.read("dim"), "ckey", "ckey", ["cname"]
        )
        assert sorted(tuple(r) for r in wh.read("jv").collect()) == sorted(
            tuple(r) for r in m.collect()
        )
        assert sorted(
            tuple(r) for r in wh.read("jv__pending").collect()
        ) == sorted(tuple(r) for r in p.collect())


class TestJoinViewNullFk:
    def test_null_fk_rows_never_ghost_the_pending_sidecar(
        self, spark, wh_factory
    ):
        """NULL-fk fact rows can never equality-match any dim row, so
        they belong in NEITHER the view NOR the pending sidecar: every
        maintenance join is fk equality, which skips NULLs, so a
        NULL-fk pending row could never be retracted — deleting or
        re-pointing it would leave a ghost forever (maintained !=
        rebuilt). Pins: the build excludes them; deleting one and
        re-pointing one through NULL in both directions all keep
        maintained == rebuilt."""
        from canvas_data_loader_spark.plans.ops import (
            _jv_split,
            create_join_view,
            refresh_join_view,
        )

        wh = wh_factory()
        rows = [(i, i % 4, i * 10.0) for i in range(1, 17)]
        rows += [(100, None, 1.0), (101, None, 2.0), (102, None, 3.0)]
        wh.write(
            "fact",
            spark.createDataFrame(
                rows, "oid long, ckey long, amt double"
            ),
            "s0",
            bucket=("oid", 8),
        )
        wh.write(
            "dim",
            spark.createDataFrame(
                [(c, f"cust{c}") for c in range(0, 3)],
                "ckey long, cname string",
            ),
            "s0",
            bucket=("ckey", 4),
        )
        create_join_view(wh, "jv", "fact", "dim", fk="ckey")

        def rebuilt():
            m, p = _jv_split(
                wh.read("fact"), wh.read("dim"), "ckey", "ckey", ["cname"]
            )
            return (
                sorted(tuple(r) for r in m.collect()),
                sorted(tuple(r) for r in p.collect()),
            )

        def current():
            return (
                sorted(tuple(r) for r in wh.read("jv").collect()),
                sorted(tuple(r) for r in wh.read("jv__pending").collect()),
            )

        assert current() == rebuilt()
        # NULL-fk rows are in neither half
        assert (
            wh.read("jv__pending").filter(F.col("ckey").isNull()).count()
            == 0
        )
        # delete one NULL-fk row; re-point one NULL -> 1 (appears);
        # re-point a matched row 1 -> NULL (disappears)
        wh.merge_bucketed(
            "fact",
            spark.createDataFrame(
                [(101, 1, 2.0), (1, None, 10.0)],
                "oid long, ckey long, amt double",
            ),
            "m1",
            delete_keys=spark.createDataFrame([(100,)], "oid long"),
        )
        assert refresh_join_view(wh, "jv")["mode"] == "incremental"
        assert current() == rebuilt()
        assert wh.read("jv").filter("oid = 101").count() == 1
        assert wh.read("jv").filter("oid = 1").count() == 0
        assert (
            wh.read("jv__pending").filter(F.col("ckey").isNull()).count()
            == 0
        )
        assert refresh_join_view(wh, "jv")["mode"] == "noop"


class TestJoinViewCrashBetweenCommitPair:
    def test_crash_after_pending_merge_heals_by_rebuild(
        self, spark, wh_factory, monkeypatch
    ):
        """The incremental motion commits pending FIRST, view second.
        A crash between the pair (injected: the second merge raises
        after the first committed) consumes a promoted row from
        pending before the view gains it — a state-based replay
        cannot see that row anywhere, so the NEXT refresh must detect
        pending's epoch ahead of the view watermark and heal by
        rebuilding from both heads, with the promotion present."""
        from canvas_data_loader_spark.plans.ops import (
            _jv_split,
            create_join_view,
            refresh_join_view,
        )

        wh = wh_factory()
        wh.write(
            "fact",
            spark.createDataFrame(
                [(i, i % 6, i * 10.0) for i in range(1, 25)],
                "oid long, ckey long, amt double",
            ),
            "s0",
            bucket=("oid", 8),
        )
        wh.write(
            "dim",
            spark.createDataFrame(
                [(c, f"cust{c}", f"seg{c % 2}") for c in range(0, 4)],
                "ckey long, cname string, seg string",
            ),
            "s0",
            bucket=("ckey", 4),
        )
        create_join_view(wh, "jv", "fact", "dim", fk="ckey")
        assert wh.read("jv__pending").filter("ckey = 5").count() > 0
        # dim INSERT of key 5: the refresh will PROMOTE those pending
        # rows — crash it between the two commits
        wh.merge_bucketed(
            "dim",
            spark.createDataFrame(
                [(5, "cust5", "seg1")], "ckey long, cname string, seg string"
            ),
            "m1",
        )
        real = wh.merge_bucketed
        calls = {"n": 0}

        def crash_after_first(table, *a, **k):
            out = real(table, *a, **k)
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected crash between the pair")
            return out

        monkeypatch.setattr(wh, "merge_bucketed", crash_after_first)
        with pytest.raises(RuntimeError, match="injected crash"):
            refresh_join_view(wh, "jv")
        monkeypatch.setattr(wh, "merge_bucketed", real)
        # the half-applied pair: pending no longer holds key 5, the
        # view does not yet — the promoted rows are nowhere
        assert wh.read("jv__pending").filter("ckey = 5").count() == 0
        assert wh.read("jv").filter("ckey = 5").count() == 0
        out = refresh_join_view(wh, "jv")
        assert out["mode"] == "full"
        m, p = _jv_split(
            wh.read("fact"), wh.read("dim"), "ckey", "ckey",
            ["cname", "seg"],
        )
        assert sorted(tuple(r) for r in wh.read("jv").collect()) == sorted(
            tuple(r) for r in m.collect()
        )
        assert sorted(
            tuple(r) for r in wh.read("jv__pending").collect()
        ) == sorted(tuple(r) for r in p.collect())
        assert wh.read("jv").filter("ckey = 5").count() > 0
        assert refresh_join_view(wh, "jv")["mode"] == "noop"


class TestJoinViewRefreshVsMergeRace:
    def test_concurrent_merges_and_refreshes_converge_exact(
        self, spark, wh_factory
    ):
        """The TestMvRefreshVsMergeRace bar applied to join views: a
        writer thread lands keyed merges on BOTH sources (fact rows
        re-pointing across dim keys, dim payload churn) while a
        refresher thread advances the view after each state it
        observes. CAS serializes every view/pending commit and the
        per-source watermarks ride those commits, so the final refresh
        must land EXACTLY on a from-scratch `_jv_split` of both heads
        — no lost promotion/demotion, no double-applied feed row."""
        from canvas_data_loader_spark.plans.ops import (
            _jv_split,
            create_join_view,
            refresh_join_view,
        )

        wh = wh_factory()
        wh.write(
            "fact",
            spark.createDataFrame(
                [(i, i % 6, i * 10.0) for i in range(1, 33)],
                "oid long, ckey long, amt double",
            ),
            "s0",
            bucket=("oid", 8),
        )
        wh.write(
            "dim",
            spark.createDataFrame(
                [(c, f"cust{c}", f"seg{c % 2}") for c in range(0, 4)],
                "ckey long, cname string, seg string",
            ),
            "s0",
            bucket=("ckey", 4),
        )
        create_join_view(wh, "jv", "fact", "dim", fk="ckey")
        errors: list[Exception] = []
        merger = wh_factory()

        def write_side():
            try:
                for i in range(4):
                    merger.merge_bucketed(
                        "fact",
                        spark.createDataFrame(
                            # update re-pointing oid 1 across keys
                            # (incl. the absent 4/5 -> pending), plus a
                            # fresh insert per round
                            [(1, (i * 2) % 6, 999.0 + i),
                             (100 + i, i % 6, 5.0 * i)],
                            "oid long, ckey long, amt double",
                        ),
                        snapshot=f"mf{i}",
                        max_commit_retries=25,
                    )
                    merger.merge_bucketed(
                        "dim",
                        spark.createDataFrame(
                            [(i % 4, f"cust{i % 4}-r{i}", f"seg{i % 3}")],
                            "ckey long, cname string, seg string",
                        ),
                        snapshot=f"md{i}",
                        max_commit_retries=25,
                    )
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        refresher = wh_factory()

        def refresh_side():
            try:
                for _ in range(4):
                    refresh_join_view(refresher, "jv")
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=write_side),
            threading.Thread(target=refresh_side),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        refresh_join_view(wh, "jv")  # catch up to both heads
        m, p = _jv_split(
            wh.read("fact"), wh.read("dim"), "ckey", "ckey",
            ["cname", "seg"],
        )
        assert sorted(tuple(r) for r in wh.read("jv").collect()) == sorted(
            tuple(r) for r in m.collect()
        )
        assert sorted(
            tuple(r) for r in wh.read("jv__pending").collect()
        ) == sorted(tuple(r) for r in p.collect())
