"""Settings layering (ref settings.rs:61-80) + CLI runner end-to-end."""

from __future__ import annotations

import gzip
import json

from canvas_data_loader_spark.settings import Settings


def write_toml(path, text):
    path.write_text(text)


class TestSettingsLayering:
    def test_default_only(self, tmp_path):
        write_toml(
            tmp_path / "default.toml",
            'save_location = "/tmp/s"\nrocksdb_location = "/tmp/r"\n'
            'skip_historical_imports = true\n'
            '[canvasdataauth]\napi_key = "k"\napi_secret = "sec"\n'
            '[database]\nurl = "postgres://x/y"\ndb_type = "Psql"\n',
        )
        st = Settings.load(str(tmp_path), environ={})
        assert st.save_location == "/tmp/s"
        assert st.skip_historical_imports is True
        assert st.only_load_final is False  # Option::None default
        assert st.api_key == "k" and st.database_url == "postgres://x/y"

    def test_local_overrides_default(self, tmp_path):
        write_toml(tmp_path / "default.toml", 'save_location = "/tmp/a"\nrocksdb_location = "/tmp/r"\n')
        write_toml(tmp_path / "local.toml", 'save_location = "/tmp/b"\n')
        st = Settings.load(str(tmp_path), environ={})
        assert st.save_location == "/tmp/b"
        assert st.rocksdb_location == "/tmp/r"  # non-overridden key survives

    def test_env_overrides_all(self, tmp_path):
        write_toml(
            tmp_path / "default.toml",
            'save_location = "/tmp/a"\nrocksdb_location = "/tmp/r"\n'
            '[database]\nurl = "postgres://default"\n',
        )
        env = {
            "cdl__save_location": "/tmp/env",
            "cdl__database__url": "mysql://env",
            "cdl__database__db_type": "Mysql",
            "cdl__only_load_final": "true",
            "UNRELATED": "x",
        }
        st = Settings.load(str(tmp_path), environ=env)
        assert st.save_location == "/tmp/env"
        assert st.database_url == "mysql://env"
        assert st.db_type == "Mysql"
        assert st.only_load_final is True

    def test_unknown_db_type_falls_back_to_psql(self, tmp_path):
        # settings.rs:113-118: unknown strings silently -> Psql
        write_toml(
            tmp_path / "default.toml",
            'save_location = "/s"\nrocksdb_location = "/r"\n[database]\ndb_type = "oracle"\n',
        )
        st = Settings.load(str(tmp_path), environ={})
        assert st.db_type == "Psql"

    def test_missing_config_dir_gives_defaults(self, tmp_path):
        st = Settings.load(str(tmp_path / "nope"), environ={})
        assert st.save_location == "/tmp/cdl-save"
        assert st.db_type == "Psql"


class TestCliRunner:
    def test_offline_fixture_end_to_end(self, tmp_path, spark):
        from tests.test_pipeline import SCHEMA_JSON, files_json, make_dump_json

        fx = tmp_path / "fx"
        (fx / "payloads").mkdir(parents=True)
        (fx / "dumps.json").write_text(
            json.dumps([make_dump_json("d1", 1, "2024-01-01T00:00:00Z")])
        )
        (fx / "schema.json").write_text(json.dumps(SCHEMA_JSON))
        (fx / "files_by_dump.json").write_text(
            json.dumps({"d1": files_json("d1", {"account_dim": ["account_dim-00000-aaa.gz"]})})
        )
        tsv = "1\tAlpha\tactive\n2\tBeta\t\\N\n".encode()
        (fx / "payloads" / "account_dim-00000-aaa.gz").write_bytes(gzip.compress(tsv))
        cfgdir = tmp_path / "config"
        cfgdir.mkdir()
        (cfgdir / "default.toml").write_text(
            f'save_location = "{tmp_path}/stage"\n'
            f'rocksdb_location = "{tmp_path}/ledger.jsonl"\n'
            'skip_historical_imports = false\n'
            '[canvasdataauth]\napi_key = "k"\napi_secret = "s"\n'
        )

        import canvas_data_loader_spark.__main__ as cli

        rc = cli.main(
            [
                "--config-dir", str(cfgdir),
                "--offline-fixture", str(fx),
                "--warehouse-dir", str(tmp_path / "wh"),
            ]
        )
        assert rc == 0
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        rows = sorted(tuple(r) for r in wh.read("account_dim").collect())
        assert rows == [(1, "Alpha", "active"), (2, "Beta", None)]


class TestStreamingUpsert:
    def test_incremental_files_merge_latest_wins(self, tmp_path, spark):
        import time

        from pyspark.sql import types as T

        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from canvas_data_loader_spark.streaming.ingest import (
            stream_upsert_to_warehouse,
        )

        src = tmp_path / "drops"
        src.mkdir()
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("val", T.StringType()),
                T.StructField("seq", T.LongType()),
            ]
        )
        wh = Warehouse(spark, str(tmp_path / "wh"))
        ckpt = str(tmp_path / "ckpt")

        def run_once():
            stream = spark.readStream.schema(schema).parquet(str(src))
            q = stream_upsert_to_warehouse(
                stream, wh, "t", key="id", order_col="seq", checkpoint=ckpt
            )
            q.awaitTermination()

        # drop 1: two rows, plus an in-batch duplicate key (seq decides)
        spark.createDataFrame(
            [(1, "a1", 1), (2, "b1", 1), (1, "a1-late", 2)], schema
        ).coalesce(1).write.mode("append").parquet(str(src))
        run_once()
        assert sorted(tuple(r) for r in wh.read("t").collect()) == [
            (1, "a1-late", 2),
            (2, "b1", 1),
        ]

        # drop 2: update key 1, add key 3; checkpoint must skip drop 1
        time.sleep(0.05)
        spark.createDataFrame([(1, "a2", 3), (3, "c1", 1)], schema).coalesce(
            1
        ).write.mode("append").parquet(str(src))
        run_once()
        assert sorted(tuple(r) for r in wh.read("t").collect()) == [
            (1, "a2", 3),
            (2, "b1", 1),
            (3, "c1", 1),
        ]

        # rerun with nothing new: idempotent no-op (ledger-by-checkpoint)
        before = wh.current_path("t")
        run_once()
        assert sorted(tuple(r) for r in wh.read("t").collect()) == [
            (1, "a2", 3),
            (2, "b1", 1),
            (3, "c1", 1),
        ]

    def test_stream_merges_into_bucketed_table_with_file_reuse(
        self, tmp_path, spark
    ):
        # round-6 integration: a stream draining into a BUCKETED
        # warehouse table takes the partition-pruned merge — untouched
        # bucket files stay byte-identical across micro-batches
        import hashlib
        import os

        from pyspark.sql import types as T

        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from canvas_data_loader_spark.streaming.ingest import (
            stream_upsert_to_warehouse,
        )

        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("val", T.StringType()),
                T.StructField("seq", T.LongType()),
            ]
        )
        wh = Warehouse(spark, str(tmp_path / "whs"))
        base = spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(1, 13)], schema
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 8))

        def md5s(root):
            out = {}
            for dp, _, fs in os.walk(root):
                for f in fs:
                    if f.endswith(".parquet"):
                        p = os.path.join(dp, f)
                        out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
            return out

        before = md5s(os.path.join(wh.root, "t", "s0"))

        src = tmp_path / "drops_b"
        src.mkdir()
        spark.createDataFrame([(1, "NEW", 1)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = stream_upsert_to_warehouse(
            stream, wh, "t", key="id", order_col="seq",
            checkpoint=str(tmp_path / "ckpt_b"),
        )
        q.awaitTermination()

        rows = {r[0]: r[1] for r in wh.read("t").collect()}
        assert rows[1] == "NEW" and len(rows) == 12
        m = wh.current_manifest("t")
        snaps = set(m["buckets"].values())
        assert "s0" in snaps and len(snaps) == 2  # one stream snapshot + s0
        affected = {b for b, s in m["buckets"].items() if s != "s0"}
        assert len(affected) == 1
        after = md5s(os.path.join(wh.root, "t", "s0"))
        for p, h in before.items():
            if any(f"__kb={b}" in p for b in affected):
                continue
            assert after.get(p) == h, f"rewritten: {p}"

    def test_rate_limited_backfill_bounded_batches(self, tmp_path, spark):
        # maxFilesPerTrigger=1 + availableNow: a large backlog drains
        # in bounded micro-batches (the backfill pattern — a TB-scale
        # backlog must not become one unbounded first batch). Each
        # batch lands as its own warehouse snapshot via foreachBatch.
        from pyspark.sql import types as T

        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from canvas_data_loader_spark.streaming.ingest import (
            stream_upsert_to_warehouse,
        )

        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("val", T.StringType()),
                T.StructField("seq", T.LongType()),
            ]
        )
        src = tmp_path / "backlog"
        src.mkdir()
        for i in range(3):
            spark.createDataFrame(
                [(i, f"v{i}", i)], schema
            ).coalesce(1).write.mode("append").parquet(str(src))
        wh = Warehouse(spark, str(tmp_path / "whr"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_upsert_to_warehouse(
            stream, wh, "t", key="id", order_col="seq",
            checkpoint=str(tmp_path / "ckpt_r"),
        )
        q.awaitTermination()
        assert sorted(r[0] for r in wh.read("t").collect()) == [0, 1, 2]
        # one snapshot per bounded micro-batch (3 files -> 3 batches)
        assert len([v for v in wh.versions("t") if v.startswith("stream-")]) == 3


class TestStreamCreateRacesBucketedCreator:
    def test_conflicted_create_reroutes_to_bucketed_merge(self, tmp_path, spark):
        # round-7 review fix: a stream's CREATE attempt losing the CAS
        # to a concurrent BUCKETED creator must re-inspect and take the
        # bucketed merge on retry — not publish an unbucketed manifest
        # that silently destroys the layout
        from pyspark.sql import types as T

        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from canvas_data_loader_spark.streaming.ingest import (
            stream_upsert_to_warehouse,
        )

        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("val", T.StringType()),
                T.StructField("seq", T.LongType()),
            ]
        )
        wh = Warehouse(spark, str(tmp_path / "whr"))
        other = Warehouse(spark, str(tmp_path / "whr"))
        raced = {"done": False}
        orig_write = wh.write

        def racing_write(
            table, df, snapshot, bucket=None, expected_version=None, **kw
        ):
            # inject the race exactly once, inside the stream's create
            # attempt: a concurrent batch pipeline creates the table
            # BUCKETED before the stream's publish
            if not raced["done"]:
                raced["done"] = True
                other.write(
                    "t",
                    spark.createDataFrame(
                        [(i, f"v{i}", 0) for i in range(1, 9)], schema
                    ),
                    snapshot="batch-create",
                    bucket=("id", 4),
                )
            return orig_write(
                table, df, snapshot, bucket=bucket,
                expected_version=expected_version, **kw,
            )

        wh.write = racing_write
        src = tmp_path / "drops_r"
        src.mkdir()
        spark.createDataFrame([(1, "STREAMED", 1)], schema).coalesce(
            1
        ).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = stream_upsert_to_warehouse(
            stream, wh, "t", key="id", order_col="seq",
            checkpoint=str(tmp_path / "ckpt_r"),
        )
        q.awaitTermination()
        assert raced["done"]
        # layout survived AND both writers' rows are present
        assert other.is_bucketed("t")
        rows = {r["id"]: r["val"] for r in other.read("t").collect()}
        assert rows[1] == "STREAMED" and rows[8] == "v8" and len(rows) == 8


class TestStreamRoutingSingleStateFetch:
    def test_table_dropped_mid_batch_takes_create_path(self, tmp_path, spark):
        # r7 advisor: the routing check used three separate state
        # fetches (exists / is_bucketed / current_manifest); a table
        # dropped between them made current_manifest() return None and
        # `.get` raise AttributeError OUTSIDE the CommitConflict retry
        # loop. The fix derives the whole routing decision from ONE
        # manifest snapshot — simulate the drop by having the first
        # manifest fetch observe a bucketed table that is gone by the
        # time the batch proceeds: no crash, the create path lands.
        from pyspark.sql import types as T

        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from canvas_data_loader_spark.streaming.ingest import (
            stream_upsert_to_warehouse,
        )

        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("val", T.StringType()),
                T.StructField("seq", T.LongType()),
            ]
        )
        wh = Warehouse(spark, str(tmp_path / "whd"))
        # seed a bucketed table, then arrange for it to be DROPPED the
        # moment the stream first inspects it (concurrent operator)
        wh.write(
            "t",
            spark.createDataFrame([(9, "old", 0)], schema),
            snapshot="s0",
            bucket=("id", 4),
        )
        orig_manifest = wh.current_manifest
        dropped = {"done": False}

        def dropping_manifest(table):
            if not dropped["done"]:
                dropped["done"] = True
                wh.drop(table)  # concurrent DROP lands first
            return orig_manifest(table)

        wh.current_manifest = dropping_manifest
        src = tmp_path / "drops_d"
        src.mkdir()
        spark.createDataFrame([(1, "NEW", 1)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = stream_upsert_to_warehouse(
            stream, wh, "t", key="id", order_col="seq",
            checkpoint=str(tmp_path / "ckpt_d"),
        )
        q.awaitTermination()
        assert dropped["done"]
        rows = {r["id"]: r["val"] for r in wh.read("t").collect()}
        assert rows == {1: "NEW"}  # created fresh after the drop


class TestStreamReplayExactlyOnce:
    """Round-8: the epoch (txn) guard. Every stream publish records
    {app_id: batch_id} in the manifest via the same CAS commit as the
    rows; a replayed delivery of a recorded epoch is skipped — the one
    case keyed-merge value-idempotence can't cover is an OLD batch
    re-applied after NEWER batches landed (older values would win)."""

    def _schema(self):
        from pyspark.sql import types as T

        return T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("val", T.StringType()),
                T.StructField("seq", T.LongType()),
            ]
        )

    def test_replayed_batch_skipped_plain_and_stale_replay_cannot_regress(
        self, tmp_path, spark
    ):
        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from canvas_data_loader_spark.streaming.ingest import apply_stream_batch

        schema = self._schema()
        wh = Warehouse(spark, str(tmp_path / "wht"))
        b0 = spark.createDataFrame([(1, "v1@0", 1)], schema)
        assert apply_stream_batch(wh, "t", ["id"], "seq", "app", b0, 0) is True
        v_after = wh._current_version("t")
        assert wh.last_txn_epoch("app", "t") == 0

        # exact replay: same batch id -> skipped, no new commit
        assert apply_stream_batch(wh, "t", ["id"], "seq", "app", b0, 0) is False
        assert wh._current_version("t") == v_after

        # newer epoch applies
        b1 = spark.createDataFrame([(1, "v1@1", 2)], schema)
        assert apply_stream_batch(wh, "t", ["id"], "seq", "app", b1, 1) is True
        assert wh.last_txn_epoch("app", "t") == 1

        # OLD epoch replayed after a newer one landed: must be skipped —
        # a keyed merge would otherwise overwrite v1@1 with v1@0
        assert apply_stream_batch(wh, "t", ["id"], "seq", "app", b0, 0) is False
        rows = {r["id"]: r["val"] for r in wh.read("t").collect()}
        assert rows == {1: "v1@1"}

        # an INDEPENDENT writer (different app_id) is not blocked by
        # this app's epochs, and both apps' horizons survive in the map
        b_other = spark.createDataFrame([(2, "w", 1)], schema)
        assert (
            apply_stream_batch(wh, "t", ["id"], "seq", "other", b_other, 0)
            is True
        )
        assert wh.last_txn_epoch("app", "t") == 1
        assert wh.last_txn_epoch("other", "t") == 0

    def test_replayed_batch_skipped_bucketed(self, tmp_path, spark):
        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from canvas_data_loader_spark.streaming.ingest import apply_stream_batch

        schema = self._schema()
        wh = Warehouse(spark, str(tmp_path / "whb"))
        base = spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(1, 9)], schema
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        b0 = spark.createDataFrame([(1, "NEW", 1)], schema)
        assert apply_stream_batch(wh, "t", ["id"], "seq", "app", b0, 0) is True
        v_after = wh._current_version("t")
        assert apply_stream_batch(wh, "t", ["id"], "seq", "app", b0, 0) is False
        assert wh._current_version("t") == v_after
        rows = {r["id"]: r["val"] for r in wh.read("t").collect()}
        assert rows[1] == "NEW" and len(rows) == 8
        # the epoch map rides the BUCKETED manifest and carries forward
        # across later merges
        b1 = spark.createDataFrame([(2, "NEW2", 1)], schema)
        assert apply_stream_batch(wh, "t", ["id"], "seq", "app", b1, 1) is True
        assert wh.last_txn_epoch("app", "t") == 1

    def test_stream_end_to_end_records_epochs(self, tmp_path, spark):
        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from canvas_data_loader_spark.streaming.ingest import (
            stream_upsert_to_warehouse,
        )

        schema = self._schema()
        src = tmp_path / "drops_t"
        src.mkdir()
        spark.createDataFrame([(1, "a", 1)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        wh = Warehouse(spark, str(tmp_path / "whs"))
        ckpt = str(tmp_path / "ckpt_t")
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = stream_upsert_to_warehouse(
            stream, wh, "t", key="id", order_col="seq", checkpoint=ckpt
        )
        q.awaitTermination()
        # app id defaults to the checkpoint path (batch ids are scoped
        # to a checkpoint); batch 0 is recorded
        assert wh.last_txn_epoch(f"stream:{ckpt}", "t") == 0


class TestMaintainCli:
    def test_compact_rebucket_restore_via_cli(self, tmp_path, spark):
        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whm")
        wh = Warehouse(spark, wh_dir)
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(16)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 2),
        )
        v_good = wh._current_version("t")
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "BAD")], "id long, v string"),
            snapshot="bad",
        )
        base = ["maintain", "--warehouse-dir", wh_dir, "--table", "t"]
        assert main(base + ["--rebucket", "4"]) == 0
        assert wh.current_manifest("t")["n_buckets"] == 4
        assert main(base + ["--compact"]) == 0
        assert main(base + ["--restore", str(v_good)]) == 0
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert rows[1] == "v1" and len(rows) == 16  # BAD rolled back
        # vacuum on manifest format: refused with guidance
        assert main(base + ["--vacuum"]) == 2

    def test_delete_where_via_cli(self, tmp_path, spark):
        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whdel")
        wh = Warehouse(spark, wh_dir)
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, i % 3) for i in range(30)], "id long, v long"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        base = ["maintain", "--warehouse-dir", wh_dir, "--table", "t"]
        # merge-on-read delete, then compact materializes the vectors
        assert main(base + ["--delete-where", "v = 1",
                            "--delete-mode", "mor"]) == 0
        assert bool(wh.current_manifest("t").get("dv"))
        assert sorted(r.id for r in wh.read("t").collect()) == [
            i for i in range(30) if i % 3 != 1
        ]
        assert main(base + ["--compact"]) == 0
        assert not wh.current_manifest("t").get("dv")
        assert wh.read("t").count() == 20

    def test_update_where_via_cli(self, tmp_path, spark):
        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whupd")
        wh = Warehouse(spark, wh_dir)
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, i % 3) for i in range(30)], "id long, v long"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        base = ["maintain", "--warehouse-dir", wh_dir, "--table", "t"]
        assert main(base + ["--update-where", "v = 1",
                            "--set", "v = v + 100"]) == 0
        rows = {r.id: r.v for r in wh.read("t").collect()}
        assert all(rows[i] == 101 for i in range(30) if i % 3 == 1)
        assert all(rows[i] == i % 3 for i in range(30) if i % 3 != 1)
        # missing --set is a usage error, not a crash
        assert main(base + ["--update-where", "v = 0"]) == 2

    def test_stats_via_cli(self, tmp_path, spark, capsys):
        import json as _json

        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whst")
        wh = Warehouse(spark, wh_dir)
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, i % 3) for i in range(30)], "id long, v long"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        wh.delete_where("t", "v = 1", mode="mor")
        assert main(
            ["maintain", "--warehouse-dir", wh_dir, "--table", "t",
             "--stats"]
        ) == 0
        out = _json.loads(capsys.readouterr().out)
        assert out["bucket_key"] == "id" and out["n_buckets"] == 4
        assert out["dv"]["positions"] == 10
        assert out["live_files"] >= 4
        # missing table: usage error, not a crash
        assert main(
            ["maintain", "--warehouse-dir", wh_dir, "--table", "ghost",
             "--stats"]
        ) == 2

    def test_vacuum_via_cli_delta(self, tmp_path, spark):
        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.delta import DeltaWarehouse

        wh_dir = str(tmp_path / "whd")
        wh = DeltaWarehouse(spark, wh_dir, vacuum_retention_sec=0)
        wh.write(
            "t", spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        wh.write(
            "t", spark.createDataFrame([(2, "b")], "id long, v string"),
            snapshot="s1",
        )
        rc = main(
            ["maintain", "--warehouse-dir", wh_dir, "--table", "t",
             "--format", "delta", "--vacuum"]
        )
        assert rc == 0
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert rows == {2: "b"}


class TestChangesCli:
    def test_change_feed_export(self, tmp_path, spark):
        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whc")
        wh = Warehouse(spark, wh_dir)
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(8)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        v0 = wh._current_version("t")
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "UPD")], "id long, v string"),
            snapshot="m1",
        )
        v1 = wh._current_version("t")
        out = str(tmp_path / "feed")
        rc = main(
            ["maintain", "--warehouse-dir", wh_dir, "--table", "t",
             "--changes", str(v0), str(v1), "--out", out]
        )
        assert rc == 0
        feed = {(r["id"], r["_change_type"]) for r in spark.read.parquet(out).collect()}
        assert feed == {(1, "update_preimage"), (1, "update_postimage")}
        # missing --out is a usage error
        assert main(
            ["maintain", "--warehouse-dir", wh_dir, "--table", "t",
             "--changes", str(v0), str(v1)]
        ) == 2


class TestRefreshViewCli:
    def test_refresh_view_via_cli(self, tmp_path, spark):
        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.operators.ivm import build_rollup
        from canvas_data_loader_spark.plans.ops import create_rollup_view
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whv")
        wh = Warehouse(spark, wh_dir)
        wh.write(
            "facts",
            spark.createDataFrame(
                [(i, f"g{i % 3}", i) for i in range(12)],
                "id long, grp string, amount long",
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        create_rollup_view(
            wh, "facts_by_grp", "facts", ["grp"], {"total": "amount"}
        )
        wh.merge_bucketed(
            "facts",
            spark.createDataFrame(
                [(1, "g9", 1000)], "id long, grp string, amount long"
            ),
            snapshot="m1",
        )
        rc = main(
            ["maintain", "--warehouse-dir", wh_dir, "--table",
             "facts_by_grp", "--refresh-view"]
        )
        assert rc == 0
        assert sorted(
            tuple(r) for r in wh.read("facts_by_grp").collect()
        ) == sorted(
            tuple(r)
            for r in build_rollup(
                wh.read("facts"), ["grp"], {"total": "amount"}
            ).collect()
        )

    def test_refresh_minmax_view_via_cli(self, tmp_path, spark):
        """--refresh-view dispatches by mv.kind: a minmax view routes
        through the partials lane, including after a delete of a
        group's current minimum."""
        from pyspark.sql import functions as F

        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.ops import create_minmax_view
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whmm")
        wh = Warehouse(spark, wh_dir)
        wh.write(
            "facts",
            spark.createDataFrame(
                [(i, f"g{i % 3}", i) for i in range(12)],
                "id long, grp string, amount long",
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        create_minmax_view(
            wh, "mm", "facts", ["grp"], {"lo": ("amount", "min")}
        )
        wh.delete_where("facts", F.col("amount") < 3, mode="mor")
        rc = main(
            ["maintain", "--warehouse-dir", wh_dir, "--table", "mm",
             "--refresh-view"]
        )
        assert rc == 0
        assert sorted(
            tuple(r) for r in wh.read("mm").collect()
        ) == sorted(
            tuple(r)
            for r in wh.read("facts")
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min("amount").alias("lo"),
            )
            .collect()
        )


class TestMirrorCli:
    def test_mirror_to_delta_via_cli(self, tmp_path, spark):
        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.delta import DeltaWarehouse
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        src_dir = str(tmp_path / "src")
        dst_dir = str(tmp_path / "dst")
        src = Warehouse(spark, src_dir)
        src.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(8)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        base = ["maintain", "--warehouse-dir", src_dir, "--table", "t",
                "--mirror-to", dst_dir, "--mirror-format", "delta"]
        assert main(base) == 0  # clone
        src.merge_bucketed(
            "t", spark.createDataFrame([(1, "UPD")], "id long, v string"),
            snapshot="m1",
        )
        assert main(base) == 0  # incremental
        dst = DeltaWarehouse(spark, dst_dir)
        assert sorted(tuple(r) for r in dst.read("t").collect()) == sorted(
            tuple(r) for r in src.read("t").collect()
        )


class TestClusterByCli:
    def test_compact_cluster_by_via_cli(self, tmp_path, spark):
        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whcb")
        wh = Warehouse(spark, wh_dir)
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, i * 10) for i in range(2400)], "id long, x long"
            ).repartition(6),
            snapshot="s0",
        )
        rc = main(
            ["maintain", "--warehouse-dir", wh_dir, "--table", "t",
             "--compact", "--cluster-by", "x",
             "--target-bytes", str(4 * 1024)]
        )
        assert rc == 0
        kept, total = wh.files_for_range("t", "x", 100, 200)
        assert total >= 2 and len(kept) <= max(1, total // 2)


class TestStreamAutoRefreshViews:
    def test_stream_batches_advance_registered_views(self, tmp_path, spark):
        from pyspark.sql import types as T

        from canvas_data_loader_spark.operators.ivm import build_rollup
        from canvas_data_loader_spark.plans.ops import create_rollup_view
        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from canvas_data_loader_spark.streaming.ingest import (
            stream_upsert_to_warehouse,
        )

        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("grp", T.StringType()),
                T.StructField("amount", T.LongType()),
                T.StructField("seq", T.LongType()),
            ]
        )
        wh = Warehouse(spark, str(tmp_path / "whrv"))
        wh.write(
            "facts",
            spark.createDataFrame(
                [(i, f"g{i % 3}", i * 10, 0) for i in range(12)], schema
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        create_rollup_view(
            wh, "facts_by_grp", "facts", ["grp"], {"total": "amount"}
        )
        src = tmp_path / "drops_rv"
        src.mkdir()
        spark.createDataFrame(
            [(1, "g1", 9999, 1), (100, "gZ", 7, 1)], schema
        ).coalesce(1).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = stream_upsert_to_warehouse(
            stream, wh, "facts", key="id", order_col="seq",
            checkpoint=str(tmp_path / "ckpt_rv"), refresh_views=True,
        )
        q.awaitTermination()
        assert sorted(
            tuple(r) for r in wh.read("facts_by_grp").collect()
        ) == sorted(
            tuple(r)
            for r in build_rollup(
                wh.read("facts"), ["grp"], {"total": "amount"}
            ).collect()
        )


class TestSqlCli:
    def test_sql_subcommand_dml_roundtrip(self, tmp_path, spark, capsys):
        """`sql --stmt` runs DELETE / UPDATE / MERGE through the same
        warehouse DML the Python API exposes; warehouse tables are
        pre-registered as views so a MERGE source can be a subquery
        over them."""
        import json as _json

        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whsql")
        wh = Warehouse(spark, wh_dir)
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}", i * 10) for i in range(1, 9)],
                "id long, v string, cnt long",
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        wh.write(
            "staged",
            spark.createDataFrame(
                [(2, "UP", 999), (20, "NEW", 1)],
                "id long, v string, cnt long",
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        base = ["sql", "--warehouse-dir", wh_dir]
        assert main(base + ["--stmt", "DELETE FROM t WHERE cnt > 70"]) == 0
        assert _json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {
            "operation": "DELETE",
            "rows": 1,
        }
        assert main(
            base + ["--stmt", "UPDATE t SET v = upper(v) WHERE id = 1"]
        ) == 0
        assert main(
            base
            + [
                "--stmt",
                "MERGE INTO t USING (SELECT * FROM staged) AS s "
                "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *",
            ]
        ) == 0
        rows = {r["id"]: (r["v"], r["cnt"]) for r in wh.read("t").collect()}
        assert rows[1] == ("V1", 10)      # UPDATE applied
        assert 8 not in rows              # DELETE applied
        assert rows[2] == ("UP", 999)     # MERGE update
        assert rows[20] == ("NEW", 1)     # MERGE insert


class TestNeardupIndexCli:
    def test_neardup_index_via_cli(self, tmp_path, spark, capsys):
        """Two-dump lifecycle through `maintain --neardup-index`: dump1
        creates the index; dump2 probes it (candidates written to
        --out) and appends its bands; a replay of dump2 is a row-level
        no-op on the index. Candidates must equal the operator-level
        rebuild restricted to dump2."""
        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.operators import dedup as D
        from canvas_data_loader_spark.plans.pipeline import Warehouse
        from pyspark.sql import functions as F

        wh_dir = str(tmp_path / "whnd")
        wh = Warehouse(spark, wh_dir)
        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
        )
        wh.write("docs", docs, snapshot="s0", bucket=("doc_id", 4))
        base = ["maintain", "--warehouse-dir", wh_dir, "--table", "docs"]
        # dump1 = doc_id % 5 < 4 -> creates the index
        assert main(base + [
            "--neardup-index", "band_index",
            "--where", "doc_id % 5 < 4",
        ]) == 0
        assert wh.exists("band_index")
        # dump2 = doc_id % 5 = 4 -> probes then appends
        out = str(tmp_path / "cand")
        assert main(base + [
            "--neardup-index", "band_index",
            "--where", "doc_id % 5 = 4", "--out", out,
        ]) == 0
        got = sorted(
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(out).collect()
        )
        full = D.minhash_candidate_pairs(docs, "text", "doc_id").filter(
            (F.col("doc_a") % 5 == 4) | (F.col("doc_b") % 5 == 4)
        )
        assert got == sorted((r.doc_a, r.doc_b) for r in full.collect())
        assert len(got) > 0
        rows_after = sorted(
            map(tuple, wh.read("band_index").select(
                "doc", "band", "band_hash").collect())
        )
        # replay of dump2 (probe-only first: no index change at all)
        assert main(base + [
            "--neardup-index", "band_index",
            "--where", "doc_id % 5 = 4", "--probe-only",
        ]) == 0
        assert sorted(
            map(tuple, wh.read("band_index").select(
                "doc", "band", "band_hash").collect())
        ) == rows_after
        # full replay: idempotent on rows
        assert main(base + [
            "--neardup-index", "band_index",
            "--where", "doc_id % 5 = 4",
        ]) == 0
        assert sorted(
            map(tuple, wh.read("band_index").select(
                "doc", "band", "band_hash").collect())
        ) == rows_after


    def test_neardup_rescore_via_cli(self, tmp_path, spark):
        """--rescore upgrades the --out payload to the exact-Jaccard
        scored pairs (candidate-bounded operator), equal to calling
        rescore_candidates directly on the probe's candidates."""
        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.operators import dedup as D
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whndr")
        wh = Warehouse(spark, wh_dir)
        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
        )
        wh.write("docs", docs, snapshot="s0", bucket=("doc_id", 4))
        base = ["maintain", "--warehouse-dir", wh_dir, "--table", "docs"]
        assert main(base + [
            "--neardup-index", "band_index",
            "--where", "doc_id % 5 < 4",
        ]) == 0
        out = str(tmp_path / "scored")
        assert main(base + [
            "--neardup-index", "band_index",
            "--where", "doc_id % 5 = 4", "--probe-only",
            "--rescore", "--out", out,
        ]) == 0
        got = sorted(
            (r.doc_a, r.doc_b, r.common, r.jaccard_r)
            for r in spark.read.parquet(out).collect()
        )
        assert len(got) > 0
        assert all(0 < j <= 1 for *_, j in got)
        # equals the operator applied to the same candidate set
        from pyspark.sql import functions as F

        bands = D.minhash_bands(docs, "text", "doc_id").localCheckpoint()
        cand = D.incremental_neardup_candidates(
            bands.filter(F.col("doc") % 5 != 4),
            bands.filter(F.col("doc") % 5 == 4),
        ).localCheckpoint()
        want = sorted(
            map(tuple, D.rescore_candidates(docs, cand).collect())
        )
        assert got == want


class TestCheckpointCli:
    def test_checkpoint_then_vacuum_bounds_log(self, tmp_path, spark):
        import os

        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.delta import DeltaWarehouse

        wh_dir = str(tmp_path / "whck")
        wh = DeltaWarehouse(
            spark, wh_dir, checkpoint_interval=10_000,
            vacuum_retention_sec=0.0,
        )
        wh.write(
            "t",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(8)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 2),
        )
        for k in range(3):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(k, f"U{k}")], "id long, v string"),
                snapshot=f"m{k}",
            )
        want = sorted(tuple(r) for r in wh.read("t").collect())
        base = ["maintain", "--warehouse-dir", wh_dir, "--table", "t",
                "--format", "delta"]
        # manifest format refuses with guidance
        assert main(["maintain", "--warehouse-dir", str(tmp_path / "x"),
                     "--table", "t", "--checkpoint"]) == 2
        assert main(base + ["--checkpoint"]) == 0
        assert main(base + ["--vacuum", "--retention-sec", "0"]) == 0
        ldir = wh._log_dir("t")
        jsons = [f for f in os.listdir(ldir) if f.endswith(".json")]
        # only the pointer version's JSON survives (head == pointer)
        assert len(jsons) == 1
        assert sorted(tuple(r) for r in wh.read("t").collect()) == want


class TestHistoryCli:
    def test_history_via_cli(self, tmp_path, spark, capsys):
        import json

        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whh")
        wh = Warehouse(spark, wh_dir)
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
            bucket=("id", 2),
        )
        wh.merge_bucketed(
            "t", spark.createDataFrame([(2, "b")], "id long, v string"),
            snapshot="m1",
        )
        assert main(["maintain", "--warehouse-dir", wh_dir, "--table", "t",
                     "--history"]) == 0
        rows = json.loads(capsys.readouterr().out)
        assert [r["version"] for r in rows] == sorted(
            (r["version"] for r in rows), reverse=True
        )
        assert len(rows) == 2 and all(r["timestamp"] for r in rows)
        assert main(["maintain", "--warehouse-dir", wh_dir,
                     "--table", "ghost", "--history"]) == 2


class TestAdvanceIndexCli:
    def test_advance_index_via_cli(self, tmp_path, spark):
        """maintain --advance-index: the hand-run twin of
        PipelineConfig.auto_maintain_indexes (round 12)."""
        from pyspark.sql import functions as F

        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.operators.dedup import minhash_bands
        from canvas_data_loader_spark.plans.ops import register_neardup_index
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whidx")
        wh = Warehouse(spark, wh_dir)
        docs = spark.createDataFrame(
            [(i, f"the quick brown fox {i} jumps over the lazy dog {i}")
             for i in range(1, 20)],
            "doc_id long, text string",
        )
        wh.write("docs", docs, "s0", bucket=("doc_id", 4))
        register_neardup_index(
            wh, "nd", "docs", "idx0", id_col="doc_id", text_col="text",
            n_buckets=4,
        )
        wh.merge_bucketed(
            "docs",
            docs.filter(F.col("doc_id") <= 3).withColumn(
                "text", F.concat(F.lit("CHANGED "), F.col("text"))
            ),
            "m1",
        )
        base = ["maintain", "--warehouse-dir", wh_dir, "--table", "nd"]
        assert main(base + ["--advance-index"]) == 0
        want = sorted(
            tuple(r)
            for r in minhash_bands(
                wh.read("docs"), "text", "doc_id", 16, 4, 3
            ).distinct().collect()
        )
        assert sorted(tuple(r) for r in wh.read("nd").collect()) == want
        # replay: noop, rows identical
        assert main(base + ["--advance-index"]) == 0
        assert sorted(tuple(r) for r in wh.read("nd").collect()) == want


class TestCliAutoMaintain:
    def test_run_cli_auto_maintains_registered_index(self, tmp_path, spark):
        """--auto-maintain-indexes on the run entrypoint: the cron
        invocation itself keeps registered indexes current (round 12 —
        the reference's hourly-cron operating model end to end)."""
        from tests.test_pipeline import files_json, make_dump_json

        schema_json = {
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

        def write_fixture(fx, dumps, files, payloads):
            (fx / "payloads").mkdir(parents=True, exist_ok=True)
            (fx / "dumps.json").write_text(json.dumps(dumps))
            (fx / "schema.json").write_text(json.dumps(schema_json))
            (fx / "files_by_dump.json").write_text(json.dumps(files))
            for name, data in payloads.items():
                (fx / "payloads" / name).write_bytes(data)

        def tsv_gz(rows):
            return gzip.compress(
                "".join("\t".join(map(str, r)) + "\n" for r in rows).encode()
            )

        text = "the quick brown fox {i} jumps over the lazy dog {i}"
        d1_rows = [[i, text.format(i=i)] for i in range(1, 13)]
        d2_rows = [[1, "totally fresh wording for doc one now"],
                   [13, text.format(i=13)]]
        fx1, fx2 = tmp_path / "fx1", tmp_path / "fx2"
        write_fixture(
            fx1,
            [make_dump_json("d1", 1, "2024-01-01T00:00:00Z")],
            {"d1": files_json("d1", {"documents_dim": ["documents_dim-00000-d1.gz"]})},
            {"documents_dim-00000-d1.gz": tsv_gz(d1_rows)},
        )
        write_fixture(
            fx2,
            [make_dump_json("d1", 1, "2024-01-01T00:00:00Z"),
             make_dump_json("d2", 2, "2024-01-02T00:00:00Z")],
            {"d1": files_json("d1", {"documents_dim": ["documents_dim-00000-d1.gz"]}),
             "d2": files_json("d2", {"documents_dim": ["documents_dim-00000-d2.gz"]})},
            {"documents_dim-00000-d1.gz": tsv_gz(d1_rows),
             "documents_dim-00000-d2.gz": tsv_gz(d2_rows)},
        )
        cfgdir = tmp_path / "config"
        cfgdir.mkdir()
        (cfgdir / "default.toml").write_text(
            f'save_location = "{tmp_path}/stage"\n'
            f'rocksdb_location = "{tmp_path}/ledger.jsonl"\n'
            '[canvasdataauth]\napi_key = "k"\napi_secret = "s"\n'
        )
        wh_dir = str(tmp_path / "wh")

        import canvas_data_loader_spark.__main__ as cli
        from canvas_data_loader_spark.operators.dedup import (
            bloom_bit_counts,
            minhash_bands,
        )
        from canvas_data_loader_spark.plans.ops import (
            register_bloom_index,
            register_neardup_index,
        )
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        base = ["--config-dir", str(cfgdir), "--warehouse-dir", wh_dir,
                "--auto-maintain-indexes"]
        assert cli.main(base + ["--offline-fixture", str(fx1)]) == 0
        wh = Warehouse(spark, wh_dir)
        register_neardup_index(
            wh, "docs_nd", "documents_dim", "idx0",
            id_col="id", text_col="body", n_buckets=8,
        )
        # the maintenance loop is kind-agnostic — register a round-13
        # counting-Bloom index on the same source so the cron run must
        # advance BOTH kinds
        register_bloom_index(
            wh, "docs_bf", "documents_dim", "idx0",
            id_col="id", text_col="body", n_buckets=4,
        )
        # the SECOND cron run imports d2 and auto-advances the indexes
        assert cli.main(base + ["--offline-fixture", str(fx2)]) == 0
        want = sorted(
            tuple(r)
            for r in minhash_bands(
                wh.read("documents_dim").select("id", "body"),
                "body", "id", 16, 4, 3,
            ).distinct().collect()
        )
        assert sorted(tuple(r) for r in wh.read("docs_nd").collect()) == want
        assert wh.last_txn_epoch(
            "idx-sync:docs_nd", "docs_nd"
        ) == wh.current_version("documents_dim")
        want_bf = sorted(
            tuple(r)
            for r in bloom_bit_counts(
                wh.read("documents_dim").select("id", "body"), "body"
            ).collect()
        )
        assert sorted(tuple(r) for r in wh.read("docs_bf").collect()) == want_bf
        assert wh.last_txn_epoch(
            "idx-sync:docs_bf", "docs_bf"
        ) == wh.current_version("documents_dim")


class TestDecontamIndexCli:
    def test_probe_and_cut_via_cli(self, tmp_path, spark):
        """maintain --decontam-index: per-dump decontamination as one
        CLI invocation — probe the registered eval-gram index, span-cut
        the hits, write the cleaned parquet. The cut must agree with
        the q164/q171 recompute on the same rows."""
        from pyspark.sql import functions as F

        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.functions.text import tokens
        from canvas_data_loader_spark.operators.dedup import exactsubstr_grams
        from canvas_data_loader_spark.plans.ops import register_decontam_index
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whdc")
        wh = Warehouse(spark, wh_dir)
        eval_rows = [(100 + i, f"secret benchmark answer {i} is here")
                     for i in range(4)]
        train_rows = [
            (1, "plain training text with no overlap at all"),
            (2, "the secret benchmark answer 2 is here verbatim leak"),
            (3, ""),
        ]
        wh.write(
            "eval_docs",
            spark.createDataFrame(eval_rows, "doc_id long, text string"),
            "s0", bucket=("doc_id", 2),
        )
        wh.write(
            "train",
            spark.createDataFrame(train_rows, "doc_id long, text string"),
            "s0", bucket=("doc_id", 2),
        )
        register_decontam_index(
            wh, "dc", "eval_docs", "idx0", id_col="doc_id",
            text_col="text", n=3, n_buckets=4,
        )
        out_dir = str(tmp_path / "clean")
        rc = main([
            "maintain", "--warehouse-dir", wh_dir, "--table", "train",
            "--decontam-index", "dc", "--out", out_dir,
        ])
        assert rc == 0
        got = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
        assert got[1]["n_removed"] == 0
        assert got[2]["n_removed"] > 0
        assert "secret" not in got[2]["clean_text"]
        # the registry-wide split convention (q164 oracle's
        # STRING_SPLIT agrees): empty text is one empty token
        assert got[3]["n_tokens"] == 1 and got[3]["n_removed"] == 0
        # parity with the recompute (q164/q171 shape) on doc 2
        ev_g = exactsubstr_grams(
            wh.read("eval_docs").select(
                "doc_id", tokens(F.col("text")).alias("t")
            ), n=3,
        ).select("g").distinct()
        hits = exactsubstr_grams(
            wh.read("train").select(
                "doc_id", tokens(F.col("text")).alias("t")
            ), n=3,
        ).join(ev_g, "g", "semi")
        covered = hits.filter(F.col("doc_id") == 2).select(
            F.explode(F.sequence(F.col("i"), F.col("i") + 2)).alias("j")
        ).distinct().count()
        assert got[2]["n_removed"] == covered
        # refuse a non-index table
        assert main([
            "maintain", "--warehouse-dir", wh_dir, "--table", "train",
            "--decontam-index", "train",
        ]) == 2


class TestBloomIndexCli:
    def test_probe_and_prepass_via_cli(self, tmp_path, spark):
        """maintain --bloom-index: the Dolma/BFF per-dump pre-pass as
        one CLI invocation — probe the registered counting-Bloom
        filter, write the definitely-new rows. Kept rows must carry NO
        content fingerprint the indexed corpus holds (the
        no-false-negative contract), and the verdicts must equal the
        q172/q174 recompute."""
        from pyspark.sql import functions as F

        from canvas_data_loader_spark.__main__ import main
        from canvas_data_loader_spark.functions.text import fingerprint
        from canvas_data_loader_spark.operators.dedup import (
            bloom_bits,
            bloom_maybe_member,
        )
        from canvas_data_loader_spark.plans.ops import register_bloom_index
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh_dir = str(tmp_path / "whbf")
        wh = Warehouse(spark, wh_dir)
        corpus_rows = [(i, f"well known corpus document number {i}")
                       for i in range(1, 9)]
        dump_rows = [
            (101, "well known corpus document number 3"),   # exact dup
            (102, "a genuinely new document never seen"),
            (103, "well known corpus document number 7"),   # exact dup
            (104, "another new arrival with fresh words"),
        ]
        wh.write(
            "corpus",
            spark.createDataFrame(corpus_rows, "doc_id long, text string"),
            "s0", bucket=("doc_id", 2),
        )
        wh.write(
            "dump",
            spark.createDataFrame(dump_rows, "doc_id long, text string"),
            "s0", bucket=("doc_id", 2),
        )
        register_bloom_index(
            wh, "bf", "corpus", "idx0",
            id_col="doc_id", text_col="text", n_buckets=2,
        )
        probe_dir = str(tmp_path / "verdicts")
        rc = main([
            "maintain", "--warehouse-dir", wh_dir, "--table", "dump",
            "--bloom-index", "bf", "--probe-only", "--out", probe_dir,
        ])
        assert rc == 0
        got = {
            r["doc_id"]: r["maybe_dup"]
            for r in spark.read.parquet(probe_dir).collect()
        }
        want = {
            r["doc_id"]: r["maybe_dup"]
            for r in bloom_maybe_member(
                wh.read("dump"),
                bloom_bits(wh.read("corpus"), "text"),
                "text",
                "doc_id",
            ).collect()
        }
        assert got == want
        assert got[101] == 1 and got[103] == 1  # never miss a dup
        kept_dir = str(tmp_path / "kept")
        rc = main([
            "maintain", "--warehouse-dir", wh_dir, "--table", "dump",
            "--bloom-index", "bf", "--out", kept_dir,
        ])
        assert rc == 0
        kept = spark.read.parquet(kept_dir)
        kept_ids = {r["doc_id"] for r in kept.collect()}
        assert kept_ids == {d for d, m in got.items() if m == 0}
        # no kept row's fingerprint exists in the corpus (the contract
        # that makes the pre-pass safe to import without exact dedup)
        overlap = (
            kept.select(fingerprint("text").alias("fp"))
            .join(
                wh.read("corpus").select(fingerprint("text").alias("fp")),
                "fp",
                "semi",
            )
            .count()
        )
        assert overlap == 0
        # kept rows keep the full document schema
        assert set(kept.columns) == {"doc_id", "text"}
        # refuse a non-index table
        assert main([
            "maintain", "--warehouse-dir", wh_dir, "--table", "dump",
            "--bloom-index", "dump",
        ]) == 2
