"""Golden end-to-end pipeline tests (SURVEY.md §5 item 2).

Synthetic Canvas-style mini-dumps (gzipped TSVs + schema JSON) are
served through the offline transport; the pipeline runs the reference
lifecycle (src/main.rs:55-249) against a temp warehouse. Covers:
idempotency, cross-dump upsert, volatile full-refresh, historical skip,
schema-version-change reload, out-of-date dumps, ledger state machine.
"""

from __future__ import annotations

import pytest

from canvas_data_loader_spark.plans.ledger import (
    FAILURE,
    OUT_OF_DATE,
    SUCCESSFUL,
    ImportLedger,
)
from canvas_data_loader_spark.plans.pipeline import ImportPipeline, PipelineConfig
from canvas_data_loader_spark.sources.api_client import (
    CanvasDataApiClient,
    LocalDirTransport,
    gzip_tsv,
)

SCHEMA_JSON = {
    "version": "4.2.0",
    "schema": {
        "account_dim": {
            "tableName": "account_dim",
            "dw_type": "dimension",
            "incremental": False,
            "columns": [
                {"name": "id", "type": "bigint"},
                {"name": "name", "type": "varchar"},
                {"name": "workflow_state", "type": "enum"},
            ],
        },
        "requests": {
            "tableName": "requests",
            "dw_type": "fact",
            "incremental": True,
            "columns": [
                {"name": "url", "type": "text"},
                {"name": "hits", "type": "int"},
            ],
        },
        # quiz_fact HAS an inferrable key (quiz_id) but is in the
        # reference's VOLATILE_TABLES (importer.rs:26) because its IDs
        # are unstable — it must be overwritten, never merged.
        "quiz_fact": {
            "tableName": "quiz_fact",
            "dw_type": "fact",
            "incremental": False,
            "columns": [
                {"name": "quiz_id", "type": "bigint"},
                {"name": "points_possible", "type": "int"},
            ],
        },
    },
}


def make_dump_json(dump_id, seq, created, version="4.2.0", finished=True):
    return {
        "dumpId": dump_id,
        "sequence": seq,
        "accountId": "self",
        "numFiles": 1,
        "finished": finished,
        "expires": None,
        "createdAt": created,
        "updatedAt": created,
        "schemaVersion": version,
    }


def files_json(dump_id, table_files):
    return {
        "dumpId": dump_id,
        "artifactsByTable": {
            t: {"partial": False, "files": [{"filename": f, "url": f"u://{dump_id}/{f}"} for f in fs]}
            for t, fs in table_files.items()
        },
    }


@pytest.fixture
def env(tmp_path):
    def build(dumps_json, files_by_dump, payloads, **cfg_kw):
        transport = LocalDirTransport(dumps_json, SCHEMA_JSON, files_by_dump, payloads)
        client = CanvasDataApiClient("key", "secret", transport)
        config = PipelineConfig(
            stage_dir=str(tmp_path / "stage"),
            warehouse_dir=str(tmp_path / "wh"),
            ledger_path=str(tmp_path / "ledger.jsonl"),
            **cfg_kw,
        )
        return client, config

    return build


def wh_rows(pipeline, table):
    return sorted(tuple(r) for r in pipeline.warehouse.read(table).collect())


class TestEndToEnd:
    def test_single_dump_load_and_idempotent_rerun(self, spark, env):
        payloads = {
            "u://d1/account_dim-00000-aaa.gz": gzip_tsv(
                [[1, "root", "active"], [2, "sub", None]]
            )
        }
        client, config = env(
            [make_dump_json("d1", 1, "2024-01-01T00:00:00Z")],
            {"d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]})},
            payloads,
        )
        p = ImportPipeline(spark, client, config)
        results = p.run()
        assert [r.status for r in results] == ["successful"]
        assert wh_rows(p, "account_dim") == [(1, "root", "active"), (2, "sub", None)]

        # second run: dump already successful -> no work, same state
        p2 = ImportPipeline(spark, client, config)
        assert p2.run() == []
        assert wh_rows(p2, "account_dim") == [(1, "root", "active"), (2, "sub", None)]

    def test_cross_dump_upsert_latest_wins(self, spark, env):
        payloads = {
            "u://d1/account_dim-00000-aaa.gz": gzip_tsv([[1, "old", "active"], [2, "keep", "active"]]),
            "u://d2/account_dim-00000-bbb.gz": gzip_tsv([[1, "new", "deleted"], [3, "add", "active"]]),
        }
        client, config = env(
            [
                make_dump_json("d1", 1, "2024-01-01T00:00:00Z"),
                make_dump_json("d2", 2, "2024-01-02T00:00:00Z"),
            ],
            {
                "d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]}),
                "d2": files_json("d2", {"account_dim": ["account_dim-00000-bbb.gz"]}),
            },
            payloads,
        )
        p = ImportPipeline(spark, client, config)
        p.run()
        # id=1 replaced by d2, id=2 preserved, id=3 inserted
        assert wh_rows(p, "account_dim") == [
            (1, "new", "deleted"),
            (2, "keep", "active"),
            (3, "add", "active"),
        ]

    def test_within_batch_duplicate_keys_collapse_last_wins(self, spark, env):
        # The reference's sequential DELETE+INSERT nets exactly ONE
        # (last-writer) row when a single dump repeats a key
        # (src/importer.rs:363-389). Both the first-load path and the
        # merge path must collapse, or the duplicates persist in the
        # warehouse across all future merges.
        payloads = {
            "u://d1/account_dim-00000-aaa.gz": gzip_tsv(
                [[1, "first", "active"], [1, "second", "deleted"], [2, "x", "active"]]
            ),
            "u://d2/account_dim-00000-bbb.gz": gzip_tsv(
                [[2, "v1", "active"], [2, "v2", "deleted"], [2, "v3", "active"]]
            ),
        }
        client, config = env(
            [
                make_dump_json("d1", 1, "2024-01-01T00:00:00Z"),
                make_dump_json("d2", 2, "2024-01-02T00:00:00Z"),
            ],
            {
                "d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]}),
                "d2": files_json("d2", {"account_dim": ["account_dim-00000-bbb.gz"]}),
            },
            payloads,
        )
        p = ImportPipeline(spark, client, config)
        results = p.run()
        # one row per key, last line of the shard wins
        assert wh_rows(p, "account_dim") == [
            (1, "second", "deleted"),
            (2, "v3", "active"),
        ]
        # observed row counts come from the write job (no re-scan) and
        # reflect the POST-collapse table
        assert results[0].tables["account_dim"] == 2
        assert results[1].tables["account_dim"] == 2

    def test_volatile_table_full_refresh(self, spark, env):
        # 'requests' is in VOLATILE_TABLES (and has no id column):
        # second dump REPLACES content instead of merging
        payloads = {
            "u://d1/requests-00000-aaa.gz": gzip_tsv([["/a", 1], ["/b", 2]]),
            "u://d2/requests-00000-bbb.gz": gzip_tsv([["/c", 3]]),
        }
        client, config = env(
            [
                make_dump_json("d1", 1, "2024-01-01T00:00:00Z"),
                make_dump_json("d2", 2, "2024-01-02T00:00:00Z"),
            ],
            {
                "d1": files_json("d1", {"requests": ["requests-00000-aaa.gz"]}),
                "d2": files_json("d2", {"requests": ["requests-00000-bbb.gz"]}),
            },
            payloads,
        )
        p = ImportPipeline(spark, client, config)
        p.run()
        assert wh_rows(p, "requests") == [("/c", 3)]

    def test_quiz_fact_overwritten_despite_inferrable_key(self, spark, env):
        # quiz_fact HAS quiz_id (the key-inference rule would pick it up),
        # but the reference routes it to drop/recreate because its IDs are
        # unstable across dumps (importer.rs:26).  A merge would keep the
        # stale quiz_id=1 row from d1; the correct result is d2's rows only.
        from canvas_data_loader_spark.schema import infer_key_column

        assert infer_key_column("quiz_fact", ["quiz_id", "points_possible"]) == "quiz_id"
        payloads = {
            "u://d1/quiz_fact-00000-aaa.gz": gzip_tsv([[1, 10], [2, 20]]),
            "u://d2/quiz_fact-00000-bbb.gz": gzip_tsv([[2, 25], [3, 30]]),
        }
        client, config = env(
            [
                make_dump_json("d1", 1, "2024-01-01T00:00:00Z"),
                make_dump_json("d2", 2, "2024-01-02T00:00:00Z"),
            ],
            {
                "d1": files_json("d1", {"quiz_fact": ["quiz_fact-00000-aaa.gz"]}),
                "d2": files_json("d2", {"quiz_fact": ["quiz_fact-00000-bbb.gz"]}),
            },
            payloads,
        )
        p = ImportPipeline(spark, client, config)
        p.run()
        # full refresh: quiz_id=1 must be GONE (a merge would have kept it)
        assert wh_rows(p, "quiz_fact") == [(2, 25), (3, 30)]

    def test_large_batch_merges_without_broadcast_hint(self, spark, env, tmp_path):
        # A historical-refresh-sized batch must not force its key set
        # through a driver broadcast (OOM at scale). Above the cutover
        # the pipeline routes to the shuffled anti-join: no broadcast
        # hint in the logical plan, and with the auto-broadcast
        # threshold off, a physical plan with NO BroadcastExchange.
        import pyspark.sql.functions as F

        client, config = env([], {}, {}, broadcast_merge_max_bytes=100)
        p = ImportPipeline(spark, client, config)
        old = spark.range(1000).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
        new = spark.range(500).select(F.col("id"), (F.col("id") * 3).alias("v"))

        small = p._merge(old, new, "id", batch_bytes=50)
        large = p._merge(old, new, "id", batch_bytes=101)
        unknown = p._merge(old, new, "id", batch_bytes=0)

        def optimized(df):
            return df._jdf.queryExecution().optimizedPlan().toString()

        assert "broadcast" in optimized(small).lower()  # hinted key broadcast
        assert "hint" not in optimized(large).lower()
        assert "hint" not in optimized(unknown).lower()

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            phys = large._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastExchange" not in phys
            # result is still a correct upsert either way
            assert large.count() == 1000
            assert large.filter("id = 0").collect()[0]["v"] == 0
            assert large.filter("id = 600").collect()[0]["v"] == 1200
            assert large.filter("id = 400").collect()[0]["v"] == 1200
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_large_batch_end_to_end_routes_off_broadcast(self, spark, env):
        # broadcast_merge_max_bytes=0 disables the broadcast-keys hint
        # entirely, so the second dump merges through the shuffled
        # anti-join inside the REAL run() flow — results must be
        # identical to the default path.
        payloads = {
            "u://d1/account_dim-00000-aaa.gz": gzip_tsv(
                [[1, "old", "active"], [2, "keep", "active"]]
            ),
            "u://d2/account_dim-00000-bbb.gz": gzip_tsv(
                [[1, "new", "deleted"], [3, "add", "active"]]
            ),
        }
        client, config = env(
            [
                make_dump_json("d1", 1, "2024-01-01T00:00:00Z"),
                make_dump_json("d2", 2, "2024-01-02T00:00:00Z"),
            ],
            {
                "d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]}),
                "d2": files_json("d2", {"account_dim": ["account_dim-00000-bbb.gz"]}),
            },
            payloads,
            broadcast_merge_max_bytes=0,
        )
        p = ImportPipeline(spark, client, config)
        results = p.run()
        assert [r.status for r in results] == ["successful", "successful"]
        assert wh_rows(p, "account_dim") == [
            (1, "new", "deleted"),
            (2, "keep", "active"),
            (3, "add", "active"),
        ]

    def test_historical_refresh_skipped_and_marked_successful(self, spark, env):
        payloads = {"u://d1/requests-00000-aaa.gz": gzip_tsv([["/a", 1]])}
        client, config = env(
            [make_dump_json("d1", 1, "2024-01-01T00:00:00Z")],
            {"d1": files_json("d1", {"requests": ["requests-00000-aaa.gz"]})},
            payloads,
            skip_historical_imports=True,
        )
        p = ImportPipeline(spark, client, config)
        results = p.run()
        assert [r.status for r in results] == ["skipped_historical"]
        # marked successful exactly as reference does (main.rs:158-168)
        assert p.ledger.status("d1") == SUCCESSFUL
        assert not p.warehouse.exists("requests")

    def test_stale_schema_version_marked_out_of_date(self, spark, env):
        client, config = env(
            [make_dump_json("d1", 1, "2024-01-01T00:00:00Z", version="4.1.0")],
            {},
            {},
        )
        p = ImportPipeline(spark, client, config)
        results = p.run()
        assert results == []
        assert p.ledger.status("d1") == OUT_OF_DATE
        # out-of-date dumps are never retried (main.rs:133)
        p2 = ImportPipeline(spark, client, config)
        assert p2.run() == []

    def test_unfinished_dump_skipped(self, spark, env):
        client, config = env(
            [make_dump_json("d1", 1, "2024-01-01T00:00:00Z", finished=False)],
            {},
            {},
        )
        p = ImportPipeline(spark, client, config)
        assert p.run() == []
        assert p.ledger.status("d1") is None

    def test_only_load_final(self, spark, env):
        payloads = {
            "u://d1/account_dim-00000-aaa.gz": gzip_tsv([[1, "a", "x"]]),
            "u://d2/account_dim-00000-bbb.gz": gzip_tsv([[2, "b", "y"]]),
        }
        client, config = env(
            [
                make_dump_json("d1", 1, "2024-01-01T00:00:00Z"),
                make_dump_json("d2", 2, "2024-01-02T00:00:00Z"),
            ],
            {
                "d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]}),
                "d2": files_json("d2", {"account_dim": ["account_dim-00000-bbb.gz"]}),
            },
            payloads,
            only_load_final=True,
        )
        p = ImportPipeline(spark, client, config)
        p.run()
        assert p.ledger.status("d1") is None  # skipped by position
        assert wh_rows(p, "account_dim") == [(2, "b", "y")]

    def test_schema_version_change_forces_full_reload(self, spark, env):
        payloads = {
            "u://d1/account_dim-00000-aaa.gz": gzip_tsv([[1, "a", "x"], [2, "b", "y"]]),
        }
        client, config = env(
            [make_dump_json("d1", 1, "2024-01-01T00:00:00Z")],
            {"d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]})},
            payloads,
        )
        # pretend a previous run processed an older schema version
        ledger = ImportLedger(config.ledger_path)
        ledger.set_last_version_processed("4.1.0")
        p = ImportPipeline(spark, client, config)
        p.run()
        # full reload happened (overwrite path) and version advanced
        assert wh_rows(p, "account_dim") == [(1, "a", "x"), (2, "b", "y")]
        assert p.ledger.last_version_processed == "4.2.0"

    def test_failure_marked_and_retryable(self, spark, env):
        # payload missing -> download raises -> dump marked failure;
        # failures are retried on the next run (main.rs:133 skips only
        # successful/out-of-date)
        client, config = env(
            [make_dump_json("d1", 1, "2024-01-01T00:00:00Z")],
            {"d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]})},
            {},  # no payloads!
        )
        p = ImportPipeline(spark, client, config)
        with pytest.raises(KeyError):
            p.run()
        assert p.ledger.status("d1") == FAILURE

        # now provide the payload; rerun imports it
        client2, _ = env(
            [make_dump_json("d1", 1, "2024-01-01T00:00:00Z")],
            {"d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]})},
            {"u://d1/account_dim-00000-aaa.gz": gzip_tsv([[1, "a", "x"]])},
        )
        p2 = ImportPipeline(spark, client2, config)
        results = p2.run()
        assert [r.status for r in results] == ["successful"]
        assert wh_rows(p2, "account_dim") == [(1, "a", "x")]


class TestLedger:
    def test_state_machine_persistence(self, tmp_path):
        path = str(tmp_path / "l.jsonl")
        led = ImportLedger(path)
        led.mark_in_progress("d1", "v1")
        led.mark_successful("d1", "v1")
        led.mark_failure("d2", "v1")
        led.set_last_version_processed("v1")
        # replay from disk
        led2 = ImportLedger(path)
        assert led2.status("d1") == SUCCESSFUL
        assert led2.status("d2") == FAILURE
        assert led2.should_skip("d1") and not led2.should_skip("d2")
        assert led2.last_version_processed == "v1"


class TestWarehouseTimeTravel:
    def test_versions_read_at_and_retention(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"), retain=2)
        df1 = spark.createDataFrame([(1, "a")], "id long, v string")
        df2 = spark.createDataFrame([(1, "b"), (2, "c")], "id long, v string")
        df3 = spark.createDataFrame([(3, "d")], "id long, v string")
        wh.write("t", df1, snapshot="s1")
        wh.write("t", df2, snapshot="s2")
        assert wh.versions("t") == ["s1", "s2"]
        # time travel to the pre-merge state while current moved on
        assert sorted(tuple(r) for r in wh.read_at("t", "s1").collect()) == [(1, "a")]
        assert sorted(tuple(r) for r in wh.read("t").collect()) == [(1, "b"), (2, "c")]
        # third write prunes s1 (retain=2)
        wh.write("t", df3, snapshot="s3")
        assert wh.versions("t") == ["s2", "s3"]
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError):
            wh.read_at("t", "s1")

    def test_orphan_snapshot_is_invisible_until_published(self, spark, tmp_path):
        # Crash-safety of the manifest commit log: parquet data written
        # but whose manifest was never published (crash between the two
        # steps) must not be visible to readers — the read path follows
        # only the commit log, never directory listing of snapshots.
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        wh.write("t", spark.range(3), snapshot="s1")
        orphan = tmp_path / "wh" / "t" / "s-orphan"
        spark.range(99).write.mode("overwrite").parquet(str(orphan))
        assert wh.read("t").count() == 3
        assert wh.versions("t") == ["s1"]

    def test_publish_collision_retries_to_next_number(self, spark, tmp_path):
        # Concurrent committers race on the commit number; the loser of
        # the conditional put must retry with the next number, not fail
        # or overwrite.
        import json as _json

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        wh.write("t", spark.range(1), snapshot="a")
        cdir = tmp_path / "wh" / "t" / "_commits"
        # another writer publishes #2 AFTER our stale listing (simulated
        # by freezing _commits at the pre-race state for one publish)
        spark.range(5).write.mode("overwrite").parquet(
            str(tmp_path / "wh" / "t" / "b")
        )
        with open(cdir / "00000002.json", "x") as fh:
            _json.dump({"snapshot": "b"}, fh)
        spark.range(7).write.mode("overwrite").parquet(
            str(tmp_path / "wh" / "t" / "c")
        )
        stale = [(1, {"snapshot": "a"})]
        real_commits = wh._commits
        wh._commits = lambda table: stale  # stale LIST: next number = 2
        try:
            got = wh._publish("t", {"snapshot": "c"})
        finally:
            wh._commits = real_commits
        assert got == 3  # conditional put on #2 lost, retried to #3
        assert sorted(p.name for p in cdir.iterdir()) == [
            "00000001.json",
            "00000002.json",
            "00000003.json",
        ]
        assert wh.versions("t") == ["a", "b", "c"]

    def test_drop_clears_history(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        wh.write("t", spark.createDataFrame([(1,)], "id long"), snapshot="s1")
        wh.drop("t")
        assert wh.versions("t") == []
        assert not wh.exists("t")


class TestCompaction:
    def test_fragmented_table_compacts_to_fewer_files(self, spark, tmp_path):
        import os

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        # fragment: 16 partitions of a small table = 16 tiny files
        df = spark.range(0, 1000).repartition(16)
        wh.write("t", df, snapshot="s1")
        path = wh.current_path("t")
        n_before = sum(
            1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
        )
        assert n_before >= 16
        n_after = wh.compact("t")
        assert n_after == 1  # tiny table -> single file
        assert sorted(r.id for r in wh.read("t").collect()) == list(range(1000))
        # pre-compaction snapshot still reachable (time travel)
        assert "s1" in wh.versions("t")

    def test_bucketed_table_compacts_per_bucket(self, spark, tmp_path):
        # merge history fragments each bucket; compact must rewrite ONE
        # full bucketed snapshot (all buckets repointed), preserve rows
        # and keep the table bucketed for future pruned merges
        import os

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "whc"))
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 25)], "id long, v string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        for i in range(1, 4):
            batch = spark.createDataFrame(
                [(i, f"u{i}"), (i + 10, f"u{i+10}")], "id long, v string"
            )
            wh.merge_bucketed("t", batch, snapshot=f"s{i}")
        before = sorted(tuple(r) for r in wh.read("t").collect())
        wh.compact("t")
        m = wh.current_manifest("t")
        assert set(m["buckets"].values()) == {"compact-bucketed"}
        assert wh.is_bucketed("t")
        assert sorted(tuple(r) for r in wh.read("t").collect()) == before
        # still merge-able after compaction
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "FINAL")], "id long, v string"),
            snapshot="s9",
        )
        assert dict((r[0], r[1]) for r in wh.read("t").collect())[1] == "FINAL"


class TestBucketedPipeline:
    """VERDICT r5 item 5: the bucketed, partition-pruned MERGE is the
    pipeline default for configured tables — reads and rewrites only
    affected buckets, untouched bucket FILES are byte-identical across
    merges (never rewritten), all under the crash-safe commit log."""

    def _md5s(self, root):
        import hashlib
        import os

        out = {}
        for dp, _, fs in os.walk(root):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(dp, f)
                    out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return out

    def test_incremental_merge_prunes_and_reuses_buckets(self, spark, env):
        import os

        d1_rows = [[i, f"v{i}", "active"] for i in range(1, 13)]
        payloads1 = {"u://d1/account_dim-00000-aaa.gz": gzip_tsv(d1_rows)}
        client, config = env(
            [make_dump_json("d1", 1, "2024-01-01T00:00:00Z")],
            {"d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]})},
            payloads1,
            bucketed_tables={"account_dim": 8},
        )
        p = ImportPipeline(spark, client, config)
        p.run()
        wh = p.warehouse
        assert wh.is_bucketed("account_dim")
        m1 = wh.current_manifest("account_dim")
        assert set(m1["buckets"].values()) == {"d1"}
        before = self._md5s(os.path.join(wh.root, "account_dim", "d1"))

        # second dump updates key 1 and inserts key 99
        payloads2 = dict(payloads1)
        payloads2["u://d2/account_dim-00000-bbb.gz"] = gzip_tsv(
            [[1, "NEW", "deleted"], [99, "add", "active"]]
        )
        client2, config2 = env(
            [
                make_dump_json("d1", 1, "2024-01-01T00:00:00Z"),
                make_dump_json("d2", 2, "2024-01-02T00:00:00Z"),
            ],
            {
                "d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]}),
                "d2": files_json("d2", {"account_dim": ["account_dim-00000-bbb.gz"]}),
            },
            payloads2,
            bucketed_tables={"account_dim": 8},
        )
        p2 = ImportPipeline(spark, client2, config2)
        p2.run()  # ledger skips d1; only d2 merges

        # merged content is the plain-upsert expectation
        expect = [(1, "NEW", "deleted")] + [
            (i, f"v{i}", "active") for i in range(2, 13)
        ] + [(99, "add", "active")]
        assert wh_rows(p2, "account_dim") == sorted(expect)

        # the manifest reuses d1 directories for untouched buckets and
        # points only affected buckets at d2
        m2 = p2.warehouse.current_manifest("account_dim")
        snaps = set(m2["buckets"].values())
        assert snaps == {"d1", "d2"}
        affected = sorted(
            int(b) for b, s in m2["buckets"].items() if s == "d2"
        )
        untouched = [int(b) for b, s in m2["buckets"].items() if s == "d1"]
        assert 1 <= len(affected) <= 2  # keys 1 and 99 -> at most 2 buckets
        assert untouched, "expected untouched buckets"

        # untouched bucket FILES in d1 are byte-identical (never rewritten)
        after = self._md5s(os.path.join(p2.warehouse.root, "account_dim", "d1"))
        for path, h in before.items():
            if any(f"__kb={b}/" in path or path.find(f"__kb={b}{os.sep}") >= 0 for b in affected):
                continue  # affected bucket data in d1 is now shadowed
            assert after.get(path) == h, f"rewritten: {path}"

        # partition-pruned read: listing only the affected buckets'
        # directories, never the untouched ones
        files = p2.warehouse.read_buckets("account_dim", affected).inputFiles()
        assert files, "pruned read should see the merged bucket files"
        for f in files:
            assert any(f"__kb={b}" in f for b in affected), f
            assert "/d2/" in f, f"pruned read escaped the d2 snapshot: {f}"

    def test_volatile_reload_keeps_bucket_layout(self, spark, env):
        # quiz_fact is in the reference's volatile list: every dump
        # overwrites it. A configured table must stay bucketed across
        # such reloads (layout survives full refresh).
        payloads = {
            "u://d1/quiz_fact-00000-aaa.gz": gzip_tsv([[1, 10], [2, 20]]),
            "u://d2/quiz_fact-00000-bbb.gz": gzip_tsv([[3, 30]]),
        }
        client, config = env(
            [
                make_dump_json("d1", 1, "2024-01-01T00:00:00Z"),
                make_dump_json("d2", 2, "2024-01-02T00:00:00Z"),
            ],
            {
                "d1": files_json("d1", {"quiz_fact": ["quiz_fact-00000-aaa.gz"]}),
                "d2": files_json("d2", {"quiz_fact": ["quiz_fact-00000-bbb.gz"]}),
            },
            payloads,
            bucketed_tables={"quiz_fact": 4},
        )
        p = ImportPipeline(spark, client, config)
        p.run()
        assert p.warehouse.is_bucketed("quiz_fact")
        assert wh_rows(p, "quiz_fact") == [(3, 30)]  # volatile: last dump only

    def test_retention_never_prunes_referenced_snapshots(self, spark, tmp_path):
        # Five merges all touching the same key leave the other buckets
        # referencing the ORIGINAL snapshot; retention (3) must keep it
        # alive while pruning superseded intermediate snapshots.
        import os

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "whb"), retain=3)
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 13)], "id long, v string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 8))
        for i in range(1, 6):
            batch = spark.createDataFrame([(1, f"u{i}")], "id long, v string")
            wh.merge_bucketed("t", batch, snapshot=f"s{i}")
        m = wh.current_manifest("t")
        assert "s0" in set(m["buckets"].values())  # untouched buckets still on s0
        assert os.path.isdir(os.path.join(wh.root, "t", "s0"))
        # superseded intermediates got pruned (s1/s2 are unreferenced
        # and beyond the retention window)
        assert not os.path.isdir(os.path.join(wh.root, "t", "s1"))
        rows = sorted(tuple(r) for r in wh.read("t").collect())
        assert rows == sorted([(1, "u5")] + [(i, f"v{i}") for i in range(2, 13)])

    def test_crash_before_publish_leaves_table_intact(self, spark, tmp_path):
        # merge_bucketed inherits the commit-log contract: parquet for
        # the new snapshot written but manifest unpublished (crash
        # between the steps) leaves readers on the old state.
        import os

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "whc"))
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 9)], "id long, v string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        before = sorted(tuple(r) for r in wh.read("t").collect())
        # simulate the crash: write the data directory exactly as
        # merge_bucketed would, but never publish a manifest
        from canvas_data_loader_spark.operators.merge import BUCKET_COL, bucket_of
        import pyspark.sql.functions as F

        batch = spark.createDataFrame([(1, "CRASH")], "id long, v string")
        batch.withColumn(BUCKET_COL, bucket_of(F.col("id"), 4)).write.mode(
            "overwrite"
        ).partitionBy(BUCKET_COL).parquet(os.path.join(wh.root, "t", "s1"))
        assert sorted(tuple(r) for r in wh.read("t").collect()) == before
        # retry completes the merge and the update becomes visible
        wh.merge_bucketed("t", batch, snapshot="s1")
        rows = dict((r[0], r[1]) for r in wh.read("t").collect())
        assert rows[1] == "CRASH" and len(rows) == 8


class TestWarehouseSafety:
    """Round-6 review fixes: snapshot names never collide with
    referenced/existing directories (mode=overwrite into a directory a
    lazy read is consuming = data loss), empty bucketed writes stay
    readable, compaction writes one file per non-empty bucket."""

    def test_double_compaction_is_safe(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 25)], "id long, v string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "u1")], "id long, v string"),
            snapshot="s1",
        )
        before = sorted(tuple(r) for r in wh.read("t").collect())
        wh.compact("t")
        wh.compact("t")  # second compaction reads what the first wrote
        assert sorted(tuple(r) for r in wh.read("t").collect()) == before
        # the two compactions landed in distinct directories
        snaps = {m["snapshot"] for _, m in wh._commits("t")}
        assert len([s for s in snaps if s.startswith("compact-bucketed")]) == 2

    def test_bucketed_compaction_one_file_per_nonempty_bucket(
        self, spark, tmp_path
    ):
        import os

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "whn"))
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 41)], "id long, v string"
        ).repartition(8)  # fragment: several files per bucket
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        for i in range(1, 3):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(i, f"u{i}")], "id long, v string"),
                snapshot=f"s{i}",
            )
        n_files = wh.compact("t")
        new_path = wh.current_path("t")
        buckets_on_disk = [
            d for d in os.listdir(new_path) if d.startswith("__kb=")
        ]
        assert n_files == len(buckets_on_disk)  # exactly one per bucket

    def test_replayed_merge_snapshot_name_is_disambiguated(
        self, spark, tmp_path
    ):
        # foreachBatch replay: the same snapshot name arriving twice
        # must not overwrite the directory the manifest (and our own
        # lazy read) references
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "whr"))
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 9)], "id long, v string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        batch = spark.createDataFrame([(1, "B")], "id long, v string")
        wh.merge_bucketed("t", batch, snapshot="stream-7")
        wh.merge_bucketed("t", batch, snapshot="stream-7")  # replay
        rows = dict((r[0], r[1]) for r in wh.read("t").collect())
        assert rows[1] == "B" and len(rows) == 8
        snaps = {m["snapshot"] for _, m in wh._commits("t")}
        assert "stream-7" in snaps and any(
            s.startswith("stream-7-v") for s in snaps
        )

    def test_empty_bucketed_write_stays_readable(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "whe"))
        empty = spark.createDataFrame([], "id long, v string")
        wh.write("t", empty, snapshot="s0", bucket=("id", 4))
        assert wh.read("t").count() == 0
        assert wh.read("t").columns == ["id", "v"]
        # and the table recovers: a later merge works on the empty base
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s1",
        )
        assert [tuple(r) for r in wh.read("t").collect()] == [(1, "a")]


class TestHttpTransportLoopback:
    """Exercise the REAL HttpTransport over the wire (loopback): an
    in-process HTTP server serves the dump listing / schema / files
    JSON and the gzipped TSV payloads; the full ImportPipeline runs
    against it — the same client/pipeline code as production, with
    urllib actually on the socket. Also asserts the server received
    the signed Authorization/Date headers on every API route (the
    file URLs are pre-signed in the real service: no auth there)."""

    def test_pipeline_end_to_end_over_http(self, spark, tmp_path):
        import json
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from canvas_data_loader_spark.sources.api_client import (
            CanvasDataApiClient,
            HttpTransport,
            gzip_tsv,
        )

        payload = gzip_tsv([[1, "root", "active"], [2, "sub", None]])
        seen_auth: dict[str, list[str]] = {"api": [], "files": []}
        dumps_json = [make_dump_json("d1", 1, "2024-01-01T00:00:00Z")]

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # keep pytest output clean
                pass

            def do_GET(self):
                if self.path.startswith("/files/"):
                    seen_auth["files"].append(
                        self.headers.get("Authorization", "")
                    )
                    body, ctype = payload, "application/gzip"
                else:
                    seen_auth["api"].append(self.headers.get("Authorization", ""))
                    if self.path == "/api/account/self/dump":
                        doc = dumps_json
                    elif self.path == "/api/schema/latest":
                        doc = SCHEMA_JSON
                    elif self.path == "/api/account/self/file/byDump/d1":
                        doc = files_json(
                            "d1", {"account_dim": ["account_dim-00000-aaa.gz"]}
                        )
                        # rewrite URLs to point at THIS server
                        for a in doc["artifactsByTable"].values():
                            for f in a["files"]:
                                f["url"] = (
                                    f"http://{self.server.server_address[0]}:"
                                    f"{self.server.server_address[1]}/files/"
                                    f"{f['filename']}"
                                )
                    else:
                        self.send_response(404)
                        self.end_headers()
                        return
                    body, ctype = json.dumps(doc).encode(), "application/json"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            host = f"127.0.0.1:{srv.server_address[1]}"
            client = CanvasDataApiClient(
                "key", "secret", HttpTransport(host=host, scheme="http")
            )
            config = PipelineConfig(
                stage_dir=str(tmp_path / "stage_http"),
                warehouse_dir=str(tmp_path / "wh_http"),
                ledger_path=str(tmp_path / "ledger_http.jsonl"),
            )
            p = ImportPipeline(spark, client, config)
            results = p.run()
            assert [r.status for r in results] == ["successful"]
            assert wh_rows(p, "account_dim") == [
                (1, "root", "active"),
                (2, "sub", None),
            ]
            # every API call carried the HMAC signature
            assert len(seen_auth["api"]) == 3  # dumps, schema, byDump
            assert all(a.startswith("HMACAuth ") for a in seen_auth["api"])
        finally:
            srv.shutdown()

    def test_crash_orphan_never_reclaimed_in_place_but_ttl_gced(
        self, spark, tmp_path
    ):
        # An on-disk directory is NEVER deleted-and-reused by a retry:
        # it is indistinguishable from a CONCURRENT writer's in-flight
        # output, and reclaiming it would destroy that writer's data
        # right before its (CAS-passing) publish. The retry writes
        # somewhere fresh; the true crash orphan is garbage-collected
        # by _prune once older than orphan_ttl_sec (age, not mere
        # unreferencedness, distinguishes dead from in-flight).
        import os

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "who"), orphan_ttl_sec=1e9)
        orphan = tmp_path / "who" / "t" / "d1"
        spark.range(99).write.mode("overwrite").parquet(str(orphan))  # crashed attempt
        wh.write("t", spark.range(3), snapshot="d1")  # retry
        assert wh.read("t").count() == 3
        assert not wh.current_path("t").endswith("/d1")  # fresh -v name
        assert (tmp_path / "who" / "t" / "d1").is_dir()  # untouched (young)
        # ...until the TTL passes: then _prune sweeps it
        wh.orphan_ttl_sec = 0.0
        wh.write("t", spark.range(4), snapshot="d2")  # triggers _prune
        assert not (tmp_path / "who" / "t" / "d1").exists()
        dirs = sorted(os.listdir(tmp_path / "who" / "t"))
        assert "_commits" in dirs and wh.read("t").count() == 4

    def test_orphan_age_is_newest_inner_mtime_not_container(
        self, spark, tmp_path
    ):
        # A long-lived unreferenced CONTAINER (.stream-stage/<appId> is
        # the canonical one: the stream writer stages every batch's
        # parquet there for seconds) keeps an ancient top-level mtime
        # while fresh in-flight files sit inside. The sweep must judge
        # age by the NEWEST mtime in the tree, or it rmtree's an active
        # stage mid-batch the moment the container outlives the TTL.
        import os
        import time as _t

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "whs"), orphan_ttl_sec=3600.0)
        wh.write("t", spark.range(3), snapshot="d1")
        stage = tmp_path / "whs" / "t" / ".stream-stage" / "app"
        stage.mkdir(parents=True)
        staged = stage / "part-live.parquet"
        staged.write_bytes(b"in-flight")  # fresh mtime
        old = _t.time() - 7200
        os.utime(stage, (old, old))
        os.utime(stage.parent, (old, old))
        wh.write("t", spark.range(4), snapshot="d2")  # triggers _prune
        assert staged.exists()  # survived: inner file is young
        # once EVERYTHING inside is past the TTL, the container goes
        os.utime(staged, (old, old))
        os.utime(stage, (old, old))
        os.utime(stage.parent, (old, old))
        wh.write("t", spark.range(5), snapshot="d3")
        assert not (tmp_path / "whs" / "t" / ".stream-stage").exists()


class TestRetryingTransport:
    """Retry/backoff decorator over the transport seam — the WAN
    resilience the reference lacks entirely (one transient 503 aborts
    its whole hourly run). Unit-tests the retry policy with an
    injected sleeper (instant), then drives the REAL HttpTransport
    against a flaky loopback server that 503s the first hit of every
    route — the full pipeline must succeed anyway."""

    class _Flaky:
        """Transport failing with the given exceptions, then serving."""

        def __init__(self, failures, result="ok"):
            self.failures = list(failures)
            self.result = result
            self.calls = 0

        def get_json(self, path, query, headers):
            self.calls += 1
            if self.failures:
                raise self.failures.pop(0)
            return self.result

        def get_bytes(self, url):
            self.calls += 1
            if self.failures:
                raise self.failures.pop(0)
            return b"ok"

    @staticmethod
    def _http_error(code):
        import io
        import urllib.error

        return urllib.error.HTTPError(
            "http://x", code, "err", hdrs=None, fp=io.BytesIO(b"")
        )

    def test_transient_503_retried_with_exponential_backoff(self):
        from canvas_data_loader_spark.sources.api_client import RetryingTransport

        slept = []
        flaky = self._Flaky([self._http_error(503), self._http_error(502)])
        t = RetryingTransport(
            flaky, max_attempts=5, base_delay=0.5, sleep=slept.append
        )
        assert t.get_json("/p", "", {}) == "ok"
        assert flaky.calls == 3
        assert slept == [0.5, 1.0]  # base * 2^attempt
        assert t.retries == 2

    def test_permanent_http_error_raises_immediately(self):
        import pytest
        import urllib.error

        from canvas_data_loader_spark.sources.api_client import RetryingTransport

        slept = []
        flaky = self._Flaky([self._http_error(401)])
        t = RetryingTransport(flaky, sleep=slept.append)
        with pytest.raises(urllib.error.HTTPError):
            t.get_json("/p", "", {})
        assert flaky.calls == 1 and slept == []  # no retry on bad auth

    def test_exhaustion_raises_last_error_after_max_attempts(self):
        import pytest

        from canvas_data_loader_spark.sources.api_client import RetryingTransport

        slept = []
        flaky = self._Flaky([self._http_error(503)] * 10)
        t = RetryingTransport(flaky, max_attempts=3, sleep=slept.append)
        with pytest.raises(Exception):
            t.get_bytes("http://x/f")
        assert flaky.calls == 3 and len(slept) == 2

    def test_connection_errors_and_timeouts_transient(self):
        import urllib.error

        from canvas_data_loader_spark.sources.api_client import RetryingTransport

        for exc in (
            ConnectionResetError("reset"),
            TimeoutError("timed out"),
            urllib.error.URLError("dns"),
        ):
            slept = []
            flaky = self._Flaky([exc])
            t = RetryingTransport(flaky, sleep=slept.append)
            assert t.get_bytes("u") == b"ok"
            assert len(slept) == 1

    def test_delay_capped_at_max_delay(self):
        from canvas_data_loader_spark.sources.api_client import RetryingTransport

        slept = []
        flaky = self._Flaky([self._http_error(503)] * 6)
        t = RetryingTransport(
            flaky, max_attempts=7, base_delay=1.0, max_delay=4.0,
            sleep=slept.append,
        )
        assert t.get_json("/p", "", {}) == "ok"
        assert slept == [1.0, 2.0, 4.0, 4.0, 4.0, 4.0]

    def test_flaky_loopback_pipeline_succeeds(self, spark, tmp_path):
        # every route 503s on its FIRST hit; the wrapped real
        # HttpTransport retries and the full import still lands
        import json
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from canvas_data_loader_spark.sources.api_client import (
            CanvasDataApiClient,
            HttpTransport,
            RetryingTransport,
            gzip_tsv,
        )

        payload = gzip_tsv([[1, "root", "active"]])
        dumps_json = [make_dump_json("d1", 1, "2024-01-01T00:00:00Z")]
        seen: dict[str, int] = {}

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                first = self.path not in seen
                seen[self.path] = seen.get(self.path, 0) + 1
                if first:
                    self.send_response(503)
                    self.end_headers()
                    return
                if self.path.startswith("/files/"):
                    body, ctype = payload, "application/gzip"
                else:
                    if self.path == "/api/account/self/dump":
                        doc = dumps_json
                    elif self.path == "/api/schema/latest":
                        doc = SCHEMA_JSON
                    elif self.path == "/api/account/self/file/byDump/d1":
                        doc = files_json(
                            "d1", {"account_dim": ["account_dim-00000-aaa.gz"]}
                        )
                        for a in doc["artifactsByTable"].values():
                            for f in a["files"]:
                                f["url"] = (
                                    f"http://{self.server.server_address[0]}:"
                                    f"{self.server.server_address[1]}/files/"
                                    f"{f['filename']}"
                                )
                    else:
                        self.send_response(404)
                        self.end_headers()
                        return
                    body, ctype = json.dumps(doc).encode(), "application/json"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            host = f"127.0.0.1:{srv.server_address[1]}"
            slept = []
            transport = RetryingTransport(
                HttpTransport(host=host, scheme="http"),
                base_delay=0.01,
                sleep=slept.append,
            )
            client = CanvasDataApiClient("key", "secret", transport)
            config = PipelineConfig(
                stage_dir=str(tmp_path / "stage_flaky"),
                warehouse_dir=str(tmp_path / "wh_flaky"),
                ledger_path=str(tmp_path / "ledger_flaky.jsonl"),
            )
            p = ImportPipeline(spark, client, config)
            results = p.run()
            assert [r.status for r in results] == ["successful"]
            assert wh_rows(p, "account_dim") == [(1, "root", "active")]
            # each of the 4 routes was hit twice (503 then 200)
            assert transport.retries == 4
            assert all(n == 2 for n in seen.values()), seen
        finally:
            srv.shutdown()


class TestOptimisticConcurrency:
    """Snapshot-isolation upgrade of the commit log: read-modify-write
    publishes are compare-and-swap at the exact next commit number,
    and merges re-derive on conflict — two concurrent merges on
    disjoint keys must BOTH land (the lost-update anomaly the blind
    bump-and-publish protocol allowed). Delta/Iceberg-style optimistic
    concurrency over plain files; the same single put-if-absent S3/HDFS
    primitive as before, no new filesystem assumptions."""

    def _bucketed(self, spark, tmp_path, name="wh"):
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / name))
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id long, val string"
        )
        wh.write("t", df, snapshot="base", bucket=("id", 4))
        return wh

    def test_cas_publish_conflict_raises_not_bumps(self, spark, tmp_path):
        import pytest

        from canvas_data_loader_spark.plans.pipeline import (
            CommitConflict,
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        wh.write("t", spark.range(1), snapshot="a")  # commit 1
        wh.write("t", spark.range(2), snapshot="b")  # commit 2
        # a manifest derived from commit 1 must NOT land on top of 2
        with pytest.raises(CommitConflict):
            wh._publish("t", {"snapshot": "stale"}, expected_version=1)
        # and nothing was committed by the failed CAS
        assert wh._current_version("t") == 2
        assert wh.current_manifest("t")["snapshot"] == "b"

    def test_cas_publish_succeeds_at_expected_head(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        wh.write("t", spark.range(1), snapshot="a")
        spark.range(2).write.mode("overwrite").parquet(
            str(tmp_path / "wh" / "t" / "c")
        )
        assert wh._publish("t", {"snapshot": "c"}, expected_version=1) == 2
        assert wh.current_manifest("t")["snapshot"] == "c"

    def test_merge_bucketed_lost_update_prevented(self, spark, tmp_path):
        # Writer A starts a merge (reads base state), writer B commits
        # a merge on a DIFFERENT key in A's race window; A's publish
        # must conflict and re-derive so B's row survives. Without CAS
        # this test fails: A's manifest (derived from base) overwrote
        # B's bucket map and B's update vanished.
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_a = self._bucketed(spark, tmp_path)
        wh_b = Warehouse(spark, str(tmp_path / "wh"))
        raced = {"done": False}

        class RacingWarehouse(Warehouse):
            def read_buckets(self, table, bucket_ids, manifest=None):
                # B commits inside A's window, exactly once
                if not raced["done"]:
                    raced["done"] = True
                    wh_b.merge_bucketed(
                        "t",
                        spark.createDataFrame(
                            [(1, "B-WINS")], "id long, val string"
                        ),
                        snapshot="b-merge",
                    )
                return super().read_buckets(table, bucket_ids, manifest)

        racing = RacingWarehouse(spark, str(tmp_path / "wh"))
        racing.merge_bucketed(
            "t",
            spark.createDataFrame([(2, "A-WINS")], "id long, val string"),
            snapshot="a-merge",
        )
        rows = {r["id"]: r["val"] for r in wh_a.read("t").collect()}
        assert rows[1] == "B-WINS"  # B's update survived A's publish
        assert rows[2] == "A-WINS"
        assert len(rows) == 8
        assert raced["done"]

    def test_merge_conflict_exhaustion_raises(self, spark, tmp_path):
        import pytest

        from canvas_data_loader_spark.plans.pipeline import (
            CommitConflict,
            Warehouse,
        )

        wh = self._bucketed(spark, tmp_path)
        contender = Warehouse(spark, str(tmp_path / "wh"))
        n = {"i": 0}

        class AlwaysRaced(Warehouse):
            def read_buckets(self, table, bucket_ids, manifest=None):
                n["i"] += 1
                # the contender hits the SAME key — a physical
                # conflict every round, so reconciliation correctly
                # refuses and the retry budget must exhaust (a
                # disjoint-bucket contender would now reconcile and
                # commit instead; that lane is pinned in
                # tests/test_warehouse_contract.py
                # TestConflictReconciliation)
                contender.merge_bucketed(
                    "t",
                    spark.createDataFrame(
                        [(2, f"c{n['i']}")], "id long, val string"
                    ),
                    snapshot=f"c{n['i']}",
                )
                return super().read_buckets(table, bucket_ids, manifest)

        racing = AlwaysRaced(spark, str(tmp_path / "wh"))
        with pytest.raises(CommitConflict, match="commit race"):
            racing.merge_bucketed(
                "t",
                spark.createDataFrame([(2, "never")], "id long, val string"),
                snapshot="x",
                max_commit_retries=2,
            )
        assert n["i"] == 3  # initial attempt + 2 retries, all re-derived

    def test_threaded_concurrent_merges_both_land(self, spark, tmp_path):
        # real concurrency: two threads merge disjoint keys through the
        # same commit log at the same time; CAS serializes them and
        # both updates are present afterwards
        import threading

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        self._bucketed(spark, tmp_path)
        errs = []

        def merge(tag, key_id):
            try:
                Warehouse(spark, str(tmp_path / "wh")).merge_bucketed(
                    "t",
                    spark.createDataFrame(
                        [(key_id, tag)], "id long, val string"
                    ),
                    snapshot=f"m-{tag}",
                )
            except Exception as e:  # surfaced after join
                errs.append(e)

        ts = [
            threading.Thread(target=merge, args=(f"w{i}", i)) for i in (5, 6)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        rows = {r["id"]: r["val"] for r in
                Warehouse(spark, str(tmp_path / "wh")).read("t").collect()}
        assert rows[5] == "w5" and rows[6] == "w6"
        assert len(rows) == 8


class TestCommitLogBounded:
    """The commit log must not grow with table lifetime: manifests
    whose snapshot directories were pruned are dead (read_at needs the
    data) and are removed, and the current-state accessors read ONE
    manifest (LIST + single GET) rather than parsing the whole
    history — at an import per hour the unbounded log would make
    metadata, not data, the scan bottleneck within a year."""

    def test_log_stays_bounded_over_many_merges(self, spark, tmp_path):
        import os

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"), retain=3)
        df = spark.createDataFrame(
            [(i, "v") for i in range(8)], "id long, val string"
        )
        wh.write("t", df, snapshot="base", bucket=("id", 4))
        for k in range(12):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(k % 8, f"m{k}")], "id long, val string"),
                snapshot=f"m{k}",
            )
        cdir = tmp_path / "wh" / "t" / "_commits"
        n_files = len([n for n in os.listdir(cdir) if n.endswith(".json")])
        # every LIVE snapshot keeps its manifest; dead ones are gone.
        # Round 8 widened retention to the union of the last `retain`
        # manifests' references (prune-vs-in-flight-reader fix), so for
        # a bucketed table the bound is retain + what those manifests'
        # bucket maps can reference (<= n_buckets distinct last-touch
        # snapshots) — a CONSTANT in table lifetime, which is the
        # boundedness contract under test (vs 13 commits made).
        assert n_files <= 3 + 4 + 1, n_files
        # numbering never reuses a pruned slot: version = total commits
        assert wh._current_version("t") == 13
        rows = {r["id"]: r["val"] for r in wh.read("t").collect()}
        assert rows[3] == "m11"  # k=11 hits id 3 last
        # time travel within the retained window still works
        assert wh.read_at("t", "m11").count() == 8

    def test_latest_commit_single_get(self, spark, tmp_path):
        # the hot-path accessors go through _latest_commit, not a full
        # history parse: _commits must not be called by them
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        wh.write("t", spark.range(2), snapshot="s1")
        wh.write("t", spark.range(3), snapshot="s2")
        called = []
        orig = wh._commits
        wh._commits = lambda table: (called.append(table), orig(table))[1]
        try:
            assert wh.current_manifest("t")["snapshot"] == "s2"
            assert wh._current_version("t") == 2
            assert wh.current_path("t").endswith("/s2")
            assert wh.read("t").count() == 3
        finally:
            wh._commits = orig
        assert called == []  # zero full-history parses on the hot path


class TestExternalSnapshotRead:
    """Cross-engine snapshot reads: external_read_sql emits DuckDB SQL
    enumerating exactly the parquet leaves one manifest references.
    Because writers never overwrite in place, the emitted statement is
    immune to concurrent Spark commits — snapshot isolation across
    engines on plain files (the reader half of the Delta interop
    story, without the format)."""

    def test_duckdb_reads_match_spark_bucketed(self, spark, tmp_path):
        import duckdb

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(16)], "id long, val string"
        )
        wh.write("t", df, snapshot="base", bucket=("id", 4))
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(3, "UPD")], "id long, val string"),
            snapshot="m1",
        )
        sql = wh.external_read_sql("t")
        duck = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
        via_spark = sorted(
            (r["id"], r["val"]) for r in wh.read("t").collect()
        )
        assert duck == via_spark
        assert dict(duck)[3] == "UPD"

    def test_pinned_version_is_isolated_from_later_commits(self, spark, tmp_path):
        import duckdb

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"), retain=4)
        df = spark.createDataFrame(
            [(i, "old") for i in range(8)], "id long, val string"
        )
        wh.write("t", df, snapshot="base", bucket=("id", 4))
        v1_sql = wh.external_read_sql("t", version=1)
        before = sorted(tuple(r) for r in duckdb.sql(v1_sql).fetchall())
        # a later Spark merge must not change what the pinned statement reads
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(2, "NEW")], "id long, val string"),
            snapshot="m1",
        )
        after = sorted(tuple(r) for r in duckdb.sql(v1_sql).fetchall())
        assert after == before
        assert all(v == "old" for _, v in after)
        # while the current statement sees the merge
        cur = dict(
            tuple(r) for r in duckdb.sql(wh.external_read_sql("t")).fetchall()
        )
        assert cur[2] == "NEW"

    def test_nonbucketed_and_errors(self, spark, tmp_path):
        import duckdb
        import pytest

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        wh.write("t", spark.range(5), snapshot="s1")
        got = sorted(r[0] for r in duckdb.sql(wh.external_read_sql("t")).fetchall())
        assert got == [0, 1, 2, 3, 4]
        with pytest.raises(FileNotFoundError):
            wh.external_read_sql("missing")
        with pytest.raises(FileNotFoundError):
            wh.external_read_sql("t", version=99)

    def test_empty_nonbucketed_table_raises_locally(self, spark, tmp_path):
        # r7 advisor: an empty-frame write leaves a snapshot directory
        # with no parquet files; the emitted glob would fail later
        # INSIDE the reading engine — raise the descriptive error
        # locally, as the bucketed branch already does
        import os

        import duckdb
        import pytest

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "whe"))
        # this Spark build writes a schema-only part file for an empty
        # frame, which stays externally readable (0 rows) —
        wh.write("empty", spark.range(5).filter("id < 0"), snapshot="s1")
        assert duckdb.sql(wh.external_read_sql("empty")).fetchall() == []
        # — but a writer that emits NO part files (zero output tasks)
        # must fail locally with the descriptive error, not later
        # inside the reading engine: simulate by clearing the snapshot
        snap = os.path.join(wh.root, "empty", "s1")
        for f in os.listdir(snap):
            if f.endswith(".parquet") or f.endswith(".crc"):
                os.remove(os.path.join(snap, f))
        with pytest.raises(FileNotFoundError, match="no data files"):
            wh.external_read_sql("empty")


class TestReviewedConcurrencyFixes:
    """Regression tests for the round-7 code-review findings on the
    CAS protocol's own threat model."""

    def test_fresh_snapshot_name_claims_atomically(self, spark, tmp_path):
        # two writers wanting the same name can never be handed the
        # same directory: the first claim wins, the second bumps
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        (tmp_path / "wh" / "t").mkdir(parents=True)
        a = wh._fresh_snapshot_name("t", "d1")
        b = wh._fresh_snapshot_name("t", "d1")
        assert a == "d1" and b != a
        # both claimed on disk, so a third differs again
        assert wh._fresh_snapshot_name("t", "d1") not in (a, b)

    def test_inflight_same_name_writer_not_clobbered(self, spark, tmp_path):
        # writer A wrote parquet under its claimed name but has not
        # published; writer B reusing the same wanted name must NOT
        # rmtree A's directory (the old reclaim did — a lost update the
        # CAS cannot see)
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        df = spark.createDataFrame(
            [(i, "x") for i in range(8)], "id long, val string"
        )
        wh.write("t", df, snapshot="base", bucket=("id", 4))
        # A claims d1 and writes its data, publish pending
        a_name = wh._fresh_snapshot_name("t", "d1")
        a_dir = tmp_path / "wh" / "t" / a_name
        spark.range(7).write.mode("overwrite").parquet(str(a_dir))
        # B merges under the same wanted name — must leave A's dir alone
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "B")], "id long, val string"),
            snapshot="d1",
        )
        assert a_dir.is_dir()
        assert spark.read.parquet(str(a_dir)).count() == 7  # A's data intact

    def test_compact_conflicting_merge_survives(self, spark, tmp_path):
        # a merge landing inside compaction's read->publish window must
        # survive: compaction's CAS conflicts and re-derives, never
        # reverting the merge
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        base = Warehouse(spark, str(tmp_path / "wh"))
        df = spark.createDataFrame(
            [(i, "old") for i in range(8)], "id long, val string"
        )
        base.write("t", df, snapshot="base", bucket=("id", 4))
        raced = {"done": False}

        class RacingCompact(Warehouse):
            def _read_manifest(self, table, manifest):
                if not raced["done"]:
                    raced["done"] = True
                    base.merge_bucketed(
                        "t",
                        spark.createDataFrame(
                            [(2, "MERGED")], "id long, val string"
                        ),
                        snapshot="mid",
                    )
                return super()._read_manifest(table, manifest)

        RacingCompact(spark, str(tmp_path / "wh")).compact("t")
        rows = {r["id"]: r["val"] for r in base.read("t").collect()}
        assert rows[2] == "MERGED" and raced["done"]

    def test_external_read_sql_escapes_quotes(self, spark, tmp_path):
        import duckdb

        from canvas_data_loader_spark.plans.pipeline import Warehouse

        root = tmp_path / "o'brien wh"
        wh = Warehouse(spark, str(root))
        wh.write("t", spark.range(3), snapshot="s1")
        sql = wh.external_read_sql("t")
        assert "''" in sql  # the quote is doubled, not a terminator
        assert sorted(r[0] for r in duckdb.sql(sql).fetchall()) == [0, 1, 2]


class TestCreateRaceCas:
    """First-write (create) is state-dependent too: racing creators
    must serialize through the CAS at commit 1, not silently supersede
    each other's entire first import."""

    def test_cas_create_conflicts_when_table_exists(self, spark, tmp_path):
        import pytest

        from canvas_data_loader_spark.plans.pipeline import (
            CommitConflict,
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        wh.write("t", spark.range(5), snapshot="a", expected_version=0)
        with pytest.raises(CommitConflict):
            wh.write("t", spark.range(9), snapshot="b", expected_version=0)
        assert wh.read("t").count() == 5  # first creator's data intact


class TestPrunedSlotGuard:
    def test_cas_below_head_recycled_slot_conflicts(self, spark, tmp_path):
        # commit-log pruning frees old numbers; a stalled writer whose
        # base was pruned must NOT land an invisible below-head commit
        import json as _json
        import os

        import pytest

        from canvas_data_loader_spark.plans.pipeline import (
            CommitConflict,
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        cdir = tmp_path / "wh" / "t" / "_commits"
        os.makedirs(cdir)
        # history advanced to 6; commits 1-5 pruned away
        for v in (5, 6):
            with open(cdir / f"{v:08d}.json", "x") as fh:
                _json.dump({"snapshot": f"s{v}"}, fh)
        with pytest.raises(CommitConflict, match="recycled pruned slot"):
            wh._publish("t", {"snapshot": "stale"}, expected_version=0)
        # the guard self-reverted: slot 1 is free again, head unchanged
        assert not (cdir / "00000001.json").exists()
        assert wh._current_version("t") == 6


class TestAutoMaintainIndexes:
    """PipelineConfig.auto_maintain_indexes (round 12 — VERDICT r11
    next-round #1): registered near-dup / ANN indexes advance as part
    of the WRITE path, the reference's unattended-cron operating model
    (README.md:31-33) applied to the round-10/11 index probes. The
    invariant everywhere is maintained == from-scratch rebuild against
    the FROZEN parameters, and a replayed interval is an exact no-op.

    The import-loop lane exercises the near-dup index (Canvas's type
    system — schema.rs via schema.py CANVAS_TO_SPARK — has no array
    type, so an imported table can't carry embeddings); the ANN index
    rides the streaming micro-batch lane below, which ingests
    arbitrary parquet schemas."""

    DOCS_SCHEMA = {
        "version": "4.2.0",
        "schema": {
            "documents_dim": {
                "tableName": "documents_dim",
                "dw_type": "dimension",
                "incremental": False,
                "columns": [
                    {"name": "id", "type": "bigint"},
                    {"name": "body", "type": "text"},
                ],
            },
        },
    }

    def _mk_dump(self, i, rows):
        did = f"d{i:03d}"
        fname = f"documents_dim-00000-{did}.gz"
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
                    "documents_dim": {
                        "partial": False,
                        "files": [
                            {"filename": fname, "url": f"u://{did}/{fname}"}
                        ],
                    }
                },
            },
            {f"u://{did}/{fname}": __import__(
                "canvas_data_loader_spark.sources.api_client",
                fromlist=["gzip_tsv"],
            ).gzip_tsv(rows)},
        )

    @pytest.mark.parametrize("fmt", ["manifest", "delta"])
    def test_import_loop_maintains_neardup_index(self, spark, tmp_path, fmt):
        from canvas_data_loader_spark.operators.dedup import minhash_bands
        from canvas_data_loader_spark.plans.ops import register_neardup_index

        def text(i, rev=0):
            base = (
                f"the quick brown fox {i} jumps over the lazy dog "
                f"while number {i} watches rev {rev}"
            )
            return base

        made = [
            self._mk_dump(0, [[i, text(i)] for i in range(1, 13)]),
            # d1 updates 3 docs' text and inserts 3 new docs
            self._mk_dump(
                1,
                [[i, text(i, rev=1)] for i in (1, 5, 9)]
                + [[i, text(i)] for i in range(13, 16)],
            ),
            # d2 another wave of updates + inserts
            self._mk_dump(
                2,
                [[i, text(i, rev=2)] for i in (2, 13)]
                + [[16, text(16)]],
            ),
        ]
        config = PipelineConfig(
            stage_dir=str(tmp_path / "stage"),
            warehouse_dir=str(tmp_path / "wh"),
            ledger_path=str(tmp_path / "ledger.jsonl"),
            bucketed_tables={"documents_dim": 4},
            warehouse_format=fmt,
            auto_maintain_indexes=True,
        )

        def pipeline(upto):
            dumps = [d for d, _, _ in made[:upto]]
            files = {d["dumpId"]: f for d, f, _ in made[:upto]}
            payloads = {}
            for _, _, p in made[:upto]:
                payloads.update(p)
            transport = LocalDirTransport(
                dumps, self.DOCS_SCHEMA, files, payloads
            )
            return ImportPipeline(
                spark, CanvasDataApiClient("key", "secret", transport), config
            )

        # first import creates the table; register the index on it
        p1 = pipeline(1)
        p1.run()
        register_neardup_index(
            p1.warehouse, "docs_nd", "documents_dim", "idx0",
            id_col="id", text_col="body", n_buckets=8,
        )
        # remaining dumps auto-maintain the index after each merge
        p2 = pipeline(3)
        p2.run()
        wh = p2.warehouse

        def rebuilt():
            return sorted(
                tuple(r)
                for r in minhash_bands(
                    wh.read("documents_dim").select("id", "body"),
                    "body", "id", 16, 4, 3,
                ).distinct().collect()
            )

        got = sorted(tuple(r) for r in wh.read("docs_nd").collect())
        assert got == rebuilt()
        # watermark rode the maintenance commit: index is at the head
        assert wh.last_txn_epoch(
            "idx-sync:docs_nd", "docs_nd"
        ) == wh.current_version("documents_dim")
        # replayed run: every dump already successful -> no-op
        v_idx = wh.current_version("docs_nd")
        p3 = pipeline(3)
        assert p3.run() == []
        assert p3.warehouse.current_version("docs_nd") == v_idx
        assert sorted(
            tuple(r) for r in p3.warehouse.read("docs_nd").collect()
        ) == got

    def test_failing_index_sync_never_blocks_import_then_catches_up(
        self, spark, tmp_path, capsys, monkeypatch
    ):
        """Failure injection for the best-effort contract (round 13 —
        VERDICT r12 next-round #8, previously asserted only by code
        comment): an index sync that DIES mid-import must (1) leave the
        dump's data commit in place — import reports success, rows are
        queryable; (2) log the skip; (3) leave the index one interval
        behind, and the NEXT import catches it up to a from-scratch
        rebuild, because advance_index always targets the source
        HEAD."""
        from canvas_data_loader_spark.operators.dedup import minhash_bands
        from canvas_data_loader_spark.plans import ops as O
        from canvas_data_loader_spark.plans.ops import register_neardup_index

        def text(i, rev=0):
            return (
                f"the quick brown fox {i} jumps over the lazy dog "
                f"while number {i} watches rev {rev}"
            )

        made = [
            self._mk_dump(0, [[i, text(i)] for i in range(1, 13)]),
            self._mk_dump(1, [[i, text(i, rev=1)] for i in (1, 5)]),
            self._mk_dump(2, [[13, text(13)]]),
        ]
        config = PipelineConfig(
            stage_dir=str(tmp_path / "stage"),
            warehouse_dir=str(tmp_path / "wh"),
            ledger_path=str(tmp_path / "ledger.jsonl"),
            bucketed_tables={"documents_dim": 4},
            auto_maintain_indexes=True,
        )

        def pipeline(upto):
            dumps = [d for d, _, _ in made[:upto]]
            files = {d["dumpId"]: f for d, f, _ in made[:upto]}
            payloads = {}
            for _, _, p in made[:upto]:
                payloads.update(p)
            transport = LocalDirTransport(
                dumps, self.DOCS_SCHEMA, files, payloads
            )
            return ImportPipeline(
                spark, CanvasDataApiClient("key", "secret", transport), config
            )

        p1 = pipeline(1)
        p1.run()
        register_neardup_index(
            p1.warehouse, "docs_nd", "documents_dim", "idx0",
            id_col="id", text_col="body", n_buckets=8,
        )
        v_idx_before = p1.warehouse.current_version("docs_nd")

        real_advance = O.advance_index

        def dying_advance(warehouse, index):
            raise RuntimeError("injected index-sync failure")

        monkeypatch.setattr(O, "advance_index", dying_advance)
        p2 = pipeline(2)
        imported = p2.run()
        monkeypatch.setattr(O, "advance_index", real_advance)
        # (1) the data commit survived: the dump imported, rows live
        assert imported, "dump 2 must import despite the index failure"
        body = {
            r["id"]: r["body"]
            for r in p2.warehouse.read("documents_dim").collect()
        }
        assert "rev 1" in body[1]
        # (2) the skip was logged, (3) the index did NOT advance
        assert "auto-maintain of index" in capsys.readouterr().err
        wh = p2.warehouse
        assert wh.current_version("docs_nd") == v_idx_before
        assert wh.last_txn_epoch("idx-sync:docs_nd", "docs_nd") < (
            wh.current_version("documents_dim")
        )
        # next import catches the index up to the head == rebuilt
        p3 = pipeline(3)
        assert p3.run()
        wh = p3.warehouse
        assert wh.last_txn_epoch(
            "idx-sync:docs_nd", "docs_nd"
        ) == wh.current_version("documents_dim")
        want = sorted(
            tuple(r)
            for r in minhash_bands(
                wh.read("documents_dim").select("id", "body"),
                "body", "id", 16, 4, 3,
            ).distinct().collect()
        )
        assert sorted(
            tuple(r) for r in wh.read("docs_nd").collect()
        ) == want

    @pytest.mark.parametrize("fmt", ["manifest", "delta"])
    def test_streaming_batches_maintain_ann_index(self, spark, tmp_path, fmt):
        import time

        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from canvas_data_loader_spark.operators import simsearch as S
        from canvas_data_loader_spark.plans.delta import DeltaWarehouse
        from canvas_data_loader_spark.plans.ops import (
            _ann_meta,
            _centroid_frame,
            create_ann_index,
        )
        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from canvas_data_loader_spark.streaming.ingest import (
            stream_upsert_to_warehouse,
        )

        W = DeltaWarehouse if fmt == "delta" else Warehouse
        wh = W(spark, str(tmp_path / "wh"))
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField(
                    "embedding", T.ArrayType(T.DoubleType())
                ),
                T.StructField("seq", T.LongType()),
            ]
        )

        def vec(i, rev=0):
            return [float((i * 7 + j * 3 + rev * 11) % 17) for j in range(4)]

        base = [(i, vec(i), 0) for i in range(1, 25)]
        wh.write(
            "vecs",
            spark.createDataFrame(base, schema),
            "s0",
            bucket=("vec_id", 4),
        )
        create_ann_index(
            wh, "vecs_ann", None, "idx0", n_cells=4, n_buckets=4,
            source="vecs",
        )
        src = tmp_path / "drops"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")

        def run_once():
            stream = spark.readStream.schema(schema).parquet(str(src))
            q = stream_upsert_to_warehouse(
                stream, wh, "vecs", key="vec_id", order_col="seq",
                checkpoint=ckpt, maintain_indexes=True,
            )
            q.awaitTermination()

        # batch 1: update 4 vectors, insert 3
        spark.createDataFrame(
            [(i, vec(i, rev=1), 1) for i in (1, 5, 9, 13)]
            + [(i, vec(i), 1) for i in range(25, 28)],
            schema,
        ).coalesce(1).write.mode("append").parquet(str(src))
        run_once()
        time.sleep(0.05)
        # batch 2: another update wave
        spark.createDataFrame(
            [(i, vec(i, rev=2), 2) for i in (2, 25)], schema
        ).coalesce(1).write.mode("append").parquet(str(src))
        run_once()

        cents = _centroid_frame(
            spark, _ann_meta(wh, "vecs_ann")["centroids"]
        )
        want = sorted(
            (r.vec_id, r.cell)
            for r in S.assign_cells(
                wh.read("vecs").select("vec_id", "embedding"),
                cents, "vec_id", "embedding",
            ).collect()
        )
        got = sorted(
            (r.vec_id, r.cell) for r in wh.read("vecs_ann").collect()
        )
        assert got == want
        assert wh.last_txn_epoch(
            "idx-sync:vecs_ann", "vecs_ann"
        ) == wh.current_version("vecs")
        # replayed stream (same checkpoint, no new files): merge skipped
        # by epoch, index advance is a watermark no-op
        v_idx = wh.current_version("vecs_ann")
        run_once()
        assert wh.current_version("vecs_ann") == v_idx
        assert sorted(
            (r.vec_id, r.cell) for r in wh.read("vecs_ann").collect()
        ) == want
