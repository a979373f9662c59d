"""Round-8 schema-evolution matrix: ADD / WIDEN / RENAME across
volatile/incremental × bucketed/plain, with idempotent reruns.

The reference full-reloads every table on any schema-version change
(src/main.rs:188-193). The evolution lanes (operators/merge.py:
evolved_schema / conform_to / merge_upsert_evolve; Warehouse.
merge_bucketed(evolve=True)) keep the three data-preserving change
classes in place — at 100 TB the difference between a one-column
widening and a full rewrite. Non-evolvable changes still fall back to
the reference's reload, table by table.
"""

from __future__ import annotations

import pytest

from canvas_data_loader_spark.operators.merge import (
    SchemaEvolutionError,
    _chain_renames,
    evolved_schema,
    merge_upsert_evolve,
    widened_type,
)


class TestWidenRenameOperators:
    def test_widened_type_lattice(self):
        from pyspark.sql import types as T

        assert widened_type(T.IntegerType(), T.LongType()) == T.LongType()
        assert widened_type(T.LongType(), T.IntegerType()) == T.LongType()
        assert widened_type(T.ByteType(), T.ShortType()) == T.ShortType()
        assert widened_type(T.FloatType(), T.DoubleType()) == T.DoubleType()
        assert widened_type(T.StringType(), T.StringType()) == T.StringType()
        # no cross-family widening: long -> double loses precision >2^53
        assert widened_type(T.LongType(), T.DoubleType()) is None
        assert widened_type(T.StringType(), T.LongType()) is None

    def test_chain_renames_collapses(self):
        assert _chain_renames({}, {"a": "b"}) == {"b": ["a"]}
        assert _chain_renames({"b": ["a"]}, {"b": "c"}) == {"c": ["b", "a"]}
        # unrelated history untouched
        assert _chain_renames({"x": ["w"]}, {"a": "b"}) == {
            "x": ["w"],
            "b": ["a"],
        }

    def test_widen_merge_both_directions(self, spark):
        old = spark.createDataFrame([(1, 10), (2, 20)], "id long, cnt int")
        new = spark.createDataFrame([(2, 99), (3, 30)], "id long, cnt long")
        out = merge_upsert_evolve(old, new, "id")
        assert dict(out.dtypes)["cnt"] == "bigint"
        assert sorted(tuple(r) for r in out.collect()) == [
            (1, 10),
            (2, 99),
            (3, 30),
        ]
        # reversed widths: old wider than new — target stays wide
        out2 = merge_upsert_evolve(new, old, "id")
        assert dict(out2.dtypes)["cnt"] == "bigint"

    def test_rename_merge_preserves_history(self, spark):
        old = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
        new = spark.createDataFrame(
            [(2, "B"), (3, "c")], "id long, display_name string"
        )
        out = merge_upsert_evolve(
            old, new, "id", renames={"name": "display_name"}
        )
        assert out.columns == ["id", "display_name"]
        assert sorted(tuple(r) for r in out.collect()) == [
            (1, "a"),
            (2, "B"),
            (3, "c"),
        ]

    def test_combined_add_widen_rename(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id long, name string, cnt int"
        )
        new = spark.createDataFrame(
            [(2, "B", 99, "x")],
            "id long, display_name string, cnt long, extra string",
        )
        out = merge_upsert_evolve(
            old, new, "id", renames={"name": "display_name"}
        )
        assert dict(out.dtypes) == {
            "id": "bigint",
            "display_name": "string",
            "cnt": "bigint",
            "extra": "string",
        }
        assert sorted(tuple(r) for r in out.collect()) == [
            (1, "a", 10, None),
            (2, "B", 99, "x"),
        ]

    def test_non_widenable_raises(self, spark):
        old = spark.createDataFrame([(1, 10)], "id long, cnt int")
        new = spark.createDataFrame([(1, "ten")], "id long, cnt string")
        with pytest.raises(SchemaEvolutionError, match="not a lossless"):
            merge_upsert_evolve(old, new, "id")
        with pytest.raises(SchemaEvolutionError):
            evolved_schema(old.schema, new.schema)


class TestWarehouseBucketedEvolve:
    """Evolution through the partition-pruned MERGE: untouched buckets
    are NEVER rewritten (their files stay byte-identical); reads and
    external reads conform older snapshots to the evolved schema."""

    def _seed(self, spark, tmp_path, n=12, buckets=8):
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        base = spark.createDataFrame(
            [(i, f"n{i}", i * 10) for i in range(1, n + 1)],
            "id long, name string, cnt int",
        )
        wh.write("t", base, snapshot="s0", bucket=("id", buckets))
        return wh

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

    def test_evolve_merge_add_widen_rename_no_bucket_rewrite(
        self, spark, tmp_path
    ):
        import os

        wh = self._seed(spark, tmp_path)
        before = self._md5s(os.path.join(wh.root, "t", "s0"))
        batch = spark.createDataFrame(
            [(1, "N1", 999, "x")],
            "id long, display_name string, cnt long, extra string",
        )
        affected = wh.merge_bucketed(
            "t",
            batch,
            snapshot="m1",
            evolve=True,
            renames={"name": "display_name"},
        )
        m = wh.current_manifest("t")
        assert m["renamed_from"] == {"display_name": ["name"]}
        # Spark read: evolved schema over ALL buckets, including the
        # untouched pre-evolution files
        df = wh.read("t")
        assert dict(df.dtypes) == {
            "id": "bigint",
            "display_name": "string",
            "cnt": "bigint",
            "extra": "string",
        }
        rows = {r["id"]: (r["display_name"], r["cnt"], r["extra"]) for r in df.collect()}
        assert rows[1] == ("N1", 999, "x")
        assert rows[2] == ("n2", 20, None)
        assert len(rows) == 12
        # untouched buckets: byte-identical files (evolution rewrote
        # ONLY the affected buckets)
        after = self._md5s(os.path.join(wh.root, "t", "s0"))
        touched = {str(b) for b in affected}
        for p, h in before.items():
            if any(f"__kb={b}" in p for b in touched):
                continue
            assert after.get(p) == h, f"rewritten: {p}"

    def test_external_read_matches_spark_after_evolution(self, spark, tmp_path):
        import duckdb

        wh = self._seed(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "N1", 999, "x")],
            "id long, display_name string, cnt long, extra string",
        )
        wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True,
            renames={"name": "display_name"},
        )
        sql = wh.external_read_sql("t")
        duck = duckdb.sql(sql)
        assert duck.columns == ["id", "display_name", "cnt", "extra"]
        got = sorted(tuple(r) for r in duck.fetchall())
        want = sorted(
            tuple(r)
            for r in wh.read("t")
            .select("id", "display_name", "cnt", "extra")
            .collect()
        )
        assert got == want
        # types pinned: widened cnt comes back BIGINT even from the
        # int32 pre-evolution files
        assert [str(t) for t in duck.types][2] == "BIGINT"

    def test_chained_rename_reads_oldest_files(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        b1 = spark.createDataFrame(
            [(1, "N1", 10)], "id long, display_name string, cnt int"
        )
        wh.merge_bucketed(
            "t", b1, snapshot="m1", evolve=True,
            renames={"name": "display_name"},
        )
        b2 = spark.createDataFrame(
            [(2, "T2", 20)], "id long, title string, cnt int"
        )
        wh.merge_bucketed(
            "t", b2, snapshot="m2", evolve=True,
            renames={"display_name": "title"},
        )
        m = wh.current_manifest("t")
        assert m["renamed_from"] == {"title": ["display_name", "name"]}
        rows = {r["id"]: r["title"] for r in wh.read("t").collect()}
        # s0 files carry `name`, m1 files carry `display_name`, m2
        # files carry `title` — all resolve through the chain
        assert rows[1] == "N1" and rows[2] == "T2" and rows[3] == "n3"

    def test_bucket_key_type_change_refused(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        # id arrives widened int->long? seed is long; try NARROW int
        # batch: xxhash64(int) != xxhash64(long) for the same value, so
        # any key-type change must refuse (re-bucket via reload)
        batch = spark.createDataFrame(
            [(1, "x", 1)], "id int, name string, cnt int"
        )
        with pytest.raises(SchemaEvolutionError, match="bucket key"):
            wh.merge_bucketed("t", batch, snapshot="m1", evolve=True)

    def test_bucket_key_rename_keeps_pruning(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "N1", 999)], "account_id long, name string, cnt int"
        )
        affected = wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True,
            renames={"id": "account_id"},
        )
        m = wh.current_manifest("t")
        assert m["bucket_key"] == "account_id"
        assert m["renamed_from"] == {"account_id": ["id"]}
        # pruned: only the batch's bucket was touched
        assert len(affected) == 1
        snaps = set(m["buckets"].values())
        assert "s0" in snaps
        rows = {r["account_id"]: r["cnt"] for r in wh.read("t").collect()}
        assert rows[1] == 999 and rows[2] == 20 and len(rows) == 12

    def test_evolve_merge_idempotent_reapply(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "N1", 999, "x")],
            "id long, display_name string, cnt long, extra string",
        )
        for snap in ("m1", "m2"):
            wh.merge_bucketed(
                "t", batch, snapshot=snap, evolve=True,
                renames={"name": "display_name"},
            )
        rows = sorted(tuple(r) for r in wh.read("t").collect())
        assert len(rows) == 12
        assert rows[0] == (1, "N1", 999, "x")

    def test_time_travel_sees_pre_evolution_schema(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "N1", 999, "x")],
            "id long, display_name string, cnt long, extra string",
        )
        wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True,
            renames={"name": "display_name"},
        )
        old = wh.read_at("t", "s0")
        assert old.columns == ["id", "name", "cnt"]
        assert old.count() == 12


SCHEMA_V1 = {
    "version": "4.2.0",
    "schema": {
        "account_dim": {
            "tableName": "account_dim",
            "dw_type": "dimension",
            "incremental": False,
            "columns": [
                {"name": "id", "type": "bigint"},
                {"name": "name", "type": "varchar"},
                {"name": "cnt", "type": "int"},
            ],
        },
    },
}

# v2: name RENAMED to display_name, cnt WIDENED int->bigint, extra ADDED
SCHEMA_V2 = {
    "version": "4.3.0",
    "schema": {
        "account_dim": {
            "tableName": "account_dim",
            "dw_type": "dimension",
            "incremental": False,
            "columns": [
                {"name": "id", "type": "bigint"},
                {"name": "display_name", "type": "varchar"},
                {"name": "cnt", "type": "bigint"},
                {"name": "extra", "type": "text"},
            ],
        },
    },
}

# non-evolvable: cnt becomes text (cross-family)
SCHEMA_V2_BAD = {
    "version": "4.3.0",
    "schema": {
        "account_dim": {
            "tableName": "account_dim",
            "dw_type": "dimension",
            "incremental": False,
            "columns": [
                {"name": "id", "type": "bigint"},
                {"name": "name", "type": "varchar"},
                {"name": "cnt", "type": "text"},
            ],
        },
    },
}

RENAMES = {"account_dim": {"name": "display_name"}}


def _dump(dump_id, seq, created, version):
    return {
        "dumpId": dump_id,
        "sequence": seq,
        "accountId": "self",
        "numFiles": 1,
        "finished": True,
        "expires": None,
        "createdAt": created,
        "updatedAt": created,
        "schemaVersion": version,
    }


def _files(dump_id, fname):
    return {
        "dumpId": dump_id,
        "artifactsByTable": {
            "account_dim": {
                "partial": False,
                "files": [{"filename": fname, "url": f"u://{dump_id}/{fname}"}],
            }
        },
    }


class TestPipelineEvolution:
    """End-to-end: a Canvas schema VERSION bump between runs evolves
    incremental tables in place (plain and bucketed) instead of
    reloading; non-evolvable changes and schema_evolution=False fall
    back to the reference's full reload. Reruns are idempotent via the
    import ledger."""

    def _run(self, spark, tmp_path, schema_json, dumps, files_by_dump,
             payloads, **cfg_kw):
        from canvas_data_loader_spark.plans.pipeline import (
            ImportPipeline,
            PipelineConfig,
        )
        from canvas_data_loader_spark.sources.api_client import (
            CanvasDataApiClient,
            LocalDirTransport,
        )

        transport = LocalDirTransport(dumps, schema_json, files_by_dump, payloads)
        client = CanvasDataApiClient("key", "secret", transport)
        config = PipelineConfig(
            stage_dir=str(tmp_path / "stage"),
            warehouse_dir=str(tmp_path / "wh"),
            ledger_path=str(tmp_path / "ledger.jsonl"),
            **cfg_kw,
        )
        p = ImportPipeline(spark, client, config)
        p.run()
        return p

    def _v1_then_v2(self, spark, tmp_path, schema_v2=SCHEMA_V2, **cfg_kw):
        from canvas_data_loader_spark.sources.api_client import gzip_tsv

        d1 = [_dump("d1", 1, "2024-01-01T00:00:00Z", "4.2.0")]
        p = self._run(
            spark, tmp_path, SCHEMA_V1, d1,
            {"d1": _files("d1", "account_dim-00000-aaa.gz")},
            {"u://d1/account_dim-00000-aaa.gz": gzip_tsv(
                [[1, "a", 10], [2, "b", 20], [3, "c", 30]]
            )},
            **cfg_kw,
        )
        assert p.ledger.last_version_processed == "4.2.0"
        # run 2: version bump; d2's TSV carries the NEW column set
        d12 = [
            _dump("d1", 1, "2024-01-01T00:00:00Z", "4.2.0"),
            _dump("d2", 2, "2024-01-02T00:00:00Z", "4.3.0"),
        ]
        ncols = len(schema_v2["schema"]["account_dim"]["columns"])
        row2 = [2, "B2", 99, "x"][:ncols] if ncols == 4 else [2, "B2", "99"]
        row4 = [4, "d", 40, None][:ncols] if ncols == 4 else [4, "d", "40"]
        p2 = self._run(
            spark, tmp_path, schema_v2, d12,
            {"d2": _files("d2", "account_dim-00000-bbb.gz")},
            {"u://d2/account_dim-00000-bbb.gz": gzip_tsv([row2, row4])},
            **cfg_kw,
        )
        return p2

    def test_plain_incremental_evolves_in_place(self, spark, tmp_path):
        p2 = self._v1_then_v2(spark, tmp_path, rename_maps=RENAMES)
        df = p2.warehouse.read("account_dim")
        assert dict(df.dtypes) == {
            "id": "bigint",
            "display_name": "string",
            "cnt": "bigint",
            "extra": "string",
        }
        rows = sorted(tuple(r) for r in df.collect())
        # rows 1,3 survived the bump (NOT reloaded away); 2 updated; 4 new
        assert rows == [
            (1, "a", 10, None),
            (2, "B2", 99, "x"),
            (3, "c", 30, None),
            (4, "d", 40, None),
        ]
        assert p2.ledger.last_version_processed == "4.3.0"
        # idempotent rerun: same dumps again -> ledger skips, no change
        p2.run()
        assert sorted(tuple(r) for r in p2.warehouse.read("account_dim").collect()) == rows

    def test_bucketed_incremental_evolves_pruned(self, spark, tmp_path):
        p2 = self._v1_then_v2(
            spark, tmp_path,
            rename_maps=RENAMES,
            bucketed_tables={"account_dim": 4},
        )
        m = p2.warehouse.current_manifest("account_dim")
        assert m["renamed_from"] == {"display_name": ["name"]}
        # pruned evolution: the d1 snapshot still backs untouched buckets
        snaps = set(m["buckets"].values())
        assert "d1" in snaps and len(snaps) == 2
        rows = sorted(tuple(r) for r in p2.warehouse.read("account_dim").collect())
        assert rows == [
            (1, "a", 10, None),
            (2, "B2", 99, "x"),
            (3, "c", 30, None),
            (4, "d", 40, None),
        ]

    def test_non_evolvable_falls_back_to_reload(self, spark, tmp_path):
        p2 = self._v1_then_v2(spark, tmp_path, schema_v2=SCHEMA_V2_BAD)
        df = p2.warehouse.read("account_dim")
        assert dict(df.dtypes)["cnt"] == "string"
        rows = sorted(tuple(r) for r in df.collect())
        # the reference semantics: table == the reloading dump's contents
        assert rows == [(2, "B2", "99"), (4, "d", "40")]

    def test_schema_evolution_disabled_restores_reference_reload(
        self, spark, tmp_path
    ):
        p2 = self._v1_then_v2(
            spark, tmp_path, rename_maps=RENAMES, schema_evolution=False
        )
        rows = sorted(tuple(r) for r in p2.warehouse.read("account_dim").collect())
        # full reload: pre-bump rows are gone (main.rs:188-193)
        assert rows == [(2, "B2", 99, "x"), (4, "d", 40, None)]


class TestDeltaBucketedEvolve:
    """The SAME evolution matrix on the Delta-protocol warehouse —
    ADD / WIDEN / declared RENAME in place, with the rename carried by
    protocol column mapping (mode=name: stable physicalName in field
    metadata; PROTOCOL.md §column-mapping) instead of manifest rename
    chains. Untouched buckets are never rewritten; old files resolve
    through their stable physical names."""

    def _seed(self, spark, tmp_path, n=12, buckets=8):
        from canvas_data_loader_spark.plans.delta import DeltaWarehouse

        wh = DeltaWarehouse(spark, str(tmp_path / "dwh"))
        base = spark.createDataFrame(
            [(i, f"n{i}", i * 10) for i in range(1, n + 1)],
            "id long, name string, cnt int",
        )
        wh.write("t", base, snapshot="s0", bucket=("id", buckets))
        return wh

    def _md5s(self, root):
        import hashlib
        import os

        out = {}
        for dp, _, fs in os.walk(root):
            if "_delta_log" in dp:
                continue
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(dp, f)
                    out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return out

    def test_evolve_merge_add_widen_rename_no_bucket_rewrite(
        self, spark, tmp_path
    ):
        from canvas_data_loader_spark.plans.delta import _cm_mapping

        wh = self._seed(spark, tmp_path)
        before = self._md5s(wh._table_dir("t"))
        batch = spark.createDataFrame(
            [(1, "N1", 999, "x")],
            "id long, display_name string, cnt long, extra string",
        )
        affected = wh.merge_bucketed(
            "t",
            batch,
            snapshot="m1",
            evolve=True,
            renames={"name": "display_name"},
        )
        _, meta, _, _, _ = wh._replay("t")
        # the upgrade recorded mode=name and the renamed column kept
        # its on-disk physical name
        assert meta["configuration"]["delta.columnMapping.mode"] == "name"
        m = _cm_mapping(meta)
        assert m["display_name"] == "name"
        assert m["id"] == "id" and m["cnt"] == "cnt"
        assert m["extra"].startswith("col-")
        df = wh.read("t")
        assert dict(df.dtypes) == {
            "id": "bigint",
            "display_name": "string",
            "cnt": "bigint",
            "extra": "string",
        }
        rows = {
            r["id"]: (r["display_name"], r["cnt"], r["extra"])
            for r in df.collect()
        }
        assert rows[1] == ("N1", 999, "x")
        assert rows[2] == ("n2", 20, None)
        assert len(rows) == 12
        # untouched buckets: byte-identical files (only the affected
        # buckets' files were tombstoned + rewritten)
        after = self._md5s(wh._table_dir("t"))
        touched = {str(b) for b in affected}
        for p, h in before.items():
            if any(f"__kb={b}" in p for b in touched):
                continue
            assert after.get(p) == h, f"rewritten: {p}"

    def test_external_read_matches_spark_after_evolution(
        self, spark, tmp_path
    ):
        import duckdb

        wh = self._seed(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "N1", 999, "x")],
            "id long, display_name string, cnt long, extra string",
        )
        wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True,
            renames={"name": "display_name"},
        )
        duck = duckdb.sql(wh.external_read_sql("t"))
        assert duck.columns == ["id", "display_name", "cnt", "extra"]
        got = sorted(tuple(r) for r in duck.fetchall())
        want = sorted(
            tuple(r)
            for r in wh.read("t")
            .select("id", "display_name", "cnt", "extra")
            .collect()
        )
        assert got == want
        assert [str(t) for t in duck.types][2] == "BIGINT"

    def test_chained_rename_reads_oldest_files(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.delta import _cm_mapping

        wh = self._seed(spark, tmp_path)
        b1 = spark.createDataFrame(
            [(1, "N1", 10)], "id long, display_name string, cnt int"
        )
        wh.merge_bucketed(
            "t", b1, snapshot="m1", evolve=True,
            renames={"name": "display_name"},
        )
        b2 = spark.createDataFrame(
            [(2, "T2", 20)], "id long, title string, cnt int"
        )
        wh.merge_bucketed(
            "t", b2, snapshot="m2", evolve=True,
            renames={"display_name": "title"},
        )
        _, meta, _, _, _ = wh._replay("t")
        # chains COLLAPSE under mapping: the physical name is assigned
        # once (the original on-disk spelling) and never moves again
        assert _cm_mapping(meta)["title"] == "name"
        rows = {r["id"]: r["title"] for r in wh.read("t").collect()}
        assert rows[1] == "N1" and rows[2] == "T2" and rows[3] == "n3"

    def test_bucket_key_type_change_refused(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "x", 1)], "id int, name string, cnt int"
        )
        with pytest.raises(SchemaEvolutionError, match="bucket key"):
            wh.merge_bucketed("t", batch, snapshot="m1", evolve=True)

    def test_bucket_key_rename_keeps_pruning(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "N1", 999)], "account_id long, name string, cnt int"
        )
        affected = wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True,
            renames={"id": "account_id"},
        )
        _, meta, _, _, _ = wh._replay("t")
        assert meta["configuration"]["spark_graft.bucket_key"] == "account_id"
        assert len(affected) == 1
        rows = {
            r["account_id"]: r["cnt"] for r in wh.read("t").collect()
        }
        assert rows[1] == 999 and rows[2] == 20 and len(rows) == 12
        # data skipping answers on the RENAMED key: stats of old files
        # live under the stable physical name
        kept, total = wh.files_for_range("t", "account_id", 1, 1)
        assert 0 < len(kept) < total

    def test_evolve_merge_idempotent_reapply(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "N1", 999, "x")],
            "id long, display_name string, cnt long, extra string",
        )
        for snap in ("m1", "m2"):
            wh.merge_bucketed(
                "t", batch, snapshot=snap, evolve=True,
                renames={"name": "display_name"},
            )
        rows = sorted(tuple(r) for r in wh.read("t").collect())
        assert len(rows) == 12
        assert rows[0] == (1, "N1", 999, "x")

    def test_time_travel_sees_pre_evolution_schema(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "N1", 999, "x")],
            "id long, display_name string, cnt long, extra string",
        )
        wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True,
            renames={"name": "display_name"},
        )
        old = wh.read_at_version("t", 0)
        assert old.columns == ["id", "name", "cnt"]
        assert old.count() == 12

    def test_full_replace_preserves_mapping(self, spark, tmp_path):
        """The protocol forbids un-mapping a table: a volatile full
        reload after an upgrade keeps mode=name, reuses surviving
        columns' physical names, and assigns fresh ids to new ones."""
        from canvas_data_loader_spark.plans.delta import _cm_mapping

        wh = self._seed(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "N1", 999)], "id long, display_name string, cnt int"
        )
        wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True,
            renames={"name": "display_name"},
        )
        _, meta1, _, _, _ = wh._replay("t")
        reload = spark.createDataFrame(
            [(1, "R1", 7, True)],
            "id long, display_name string, cnt int, flag boolean",
        )
        wh.write("t", reload, snapshot="s1", bucket=("id", 8))
        _, meta2, _, _, _ = wh._replay("t")
        m1, m2 = _cm_mapping(meta1), _cm_mapping(meta2)
        assert meta2["configuration"]["delta.columnMapping.mode"] == "name"
        assert m2["display_name"] == m1["display_name"] == "name"
        assert m2["flag"].startswith("col-")
        got = wh.read("t").collect()
        assert len(got) == 1 and got[0]["flag"] is True

    def test_dv_delete_then_rename_keeps_visibility(self, spark, tmp_path):
        """Merge-on-read deletion vectors survive a later rename
        evolution: DV positions key by FILE, mapping renames only the
        schema."""
        wh = self._seed(spark, tmp_path)
        n = wh.delete_where("t", "cnt = 30", mode="mor")
        assert n == 1
        batch = spark.createDataFrame(
            [(1, "N1", 999)], "id long, display_name string, cnt int"
        )
        wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True,
            renames={"name": "display_name"},
        )
        rows = {r["id"]: r["display_name"] for r in wh.read("t").collect()}
        assert 3 not in rows and rows[1] == "N1" and len(rows) == 11


class TestRenamedAwayNameReuse:
    """Round-10 (advisor finding, delta.py _evolved_schema_string): an
    evolve that renames a -> a_old AND adds a NEW column named a must
    give the new field a FRESH identity. Before the fix both logical
    fields resolved to the same prev field and inherited physicalName
    'a' — the delta lane died mid-merge with COLUMN_ALREADY_EXISTS and
    the manifest lane silently aliased old 'a' values into the new
    column on untouched buckets. Now: delta disambiguates via column
    mapping (new field gets a col-uuid physical name); the manifest
    lane — which stores files by logical name and cannot disambiguate
    — REJECTS the re-use up front."""

    def _seed_delta(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.delta import DeltaWarehouse

        wh = DeltaWarehouse(spark, str(tmp_path / "dwh"))
        base = spark.createDataFrame(
            [(i, f"n{i}", i * 10) for i in range(1, 9)],
            "id long, name string, cnt int",
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        return wh

    def test_delta_rename_and_readd_same_name(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.delta import _cm_mapping

        wh = self._seed_delta(spark, tmp_path)
        batch = spark.createDataFrame(
            [(1, "fresh")], "id long, name string"
        )
        wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True,
            renames={"name": "name_old"},
        )
        _, meta, _, _, _ = wh._replay("t")
        m = _cm_mapping(meta)
        # renamed field keeps its on-disk physical name; the RE-USED
        # logical name is a brand-new column with a fresh identity
        assert m["name_old"] == "name"
        assert m["name"].startswith("col-")
        rows = {
            r["id"]: (r["name"], r["name_old"], r["cnt"])
            for r in wh.read("t").collect()
        }
        # untouched old row: old value lives ONLY under name_old — the
        # regression aliased it into the new 'name' column
        assert rows[2] == (None, "n2", 20)
        assert rows[1] == ("fresh", "n1", None) or rows[1][0] == "fresh"
        assert len(rows) == 8

    def test_delta_readd_survives_independent_reader(self, spark, tmp_path):
        """The spec-pure reader decodes the re-used name the same way
        the writer reads it back."""
        import os
        import sys

        import duckdb

        sys.path.insert(0, "/root/repo/tools")
        try:
            import delta_reader
        finally:
            sys.path.pop(0)

        wh = self._seed_delta(spark, tmp_path)
        batch = spark.createDataFrame([(1, "fresh")], "id long, name string")
        wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True,
            renames={"name": "name_old"},
        )
        sql = delta_reader.duckdb_sql(os.path.join(wh.root, "t"))
        rel = duckdb.sql(sql)
        cols = [d[0] for d in rel.description]
        by_id = {
            r[cols.index("id")]: (
                r[cols.index("name")],
                r[cols.index("name_old")],
            )
            for r in rel.fetchall()
        }
        assert by_id[2] == (None, "n2")
        assert by_id[1][0] == "fresh"

    def test_manifest_rejects_consumed_name_reuse(self, spark, tmp_path):
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "mwh"))
        base = spark.createDataFrame(
            [(i, f"n{i}", i * 10) for i in range(1, 9)],
            "id long, name string, cnt int",
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        batch = spark.createDataFrame([(1, "fresh")], "id long, name string")
        with pytest.raises(ValueError, match="consumed by the rename"):
            wh.merge_bucketed(
                "t", batch, snapshot="m1", evolve=True,
                renames={"name": "name_old"},
            )
        # ...including via a LATER evolve, not just the same one
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(1, "d1")], "id long, display string"),
            snapshot="m2", evolve=True, renames={"name": "display"},
        )
        with pytest.raises(ValueError, match="consumed by the rename"):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(2, "zz")], "id long, name string"),
                snapshot="m3", evolve=True,
            )

    def test_manifest_rename_back_stays_legal(self, spark, tmp_path):
        """a -> b -> a is the SAME column round-tripping its name: its
        own chain is not a conflict, and reads resolve every era."""
        from canvas_data_loader_spark.plans.pipeline import Warehouse

        wh = Warehouse(spark, str(tmp_path / "mwh2"))
        base = spark.createDataFrame(
            [(i, f"n{i}") for i in range(1, 5)], "id long, a string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 2))
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, "b1")], "id long, b string"),
            snapshot="m1", evolve=True, renames={"a": "b"},
        )
        wh.merge_bucketed(
            "t", spark.createDataFrame([(2, "a2")], "id long, a string"),
            snapshot="m2", evolve=True, renames={"b": "a"},
        )
        rows = {r["id"]: r["a"] for r in wh.read("t").collect()}
        assert rows == {1: "b1", 2: "a2", 3: "n3", 4: "n4"}

    def test_conform_to_skips_consumed_exact_match(self, spark):
        """Unit: with history {a_old: [a]} and a target that ALSO has
        a field named a, a frame carrying only the historical 'a'
        column resolves it to a_old, and the new 'a' null-pads."""
        from pyspark.sql import types as T

        from canvas_data_loader_spark.operators.merge import conform_to

        target = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("a_old", T.StringType()),
                T.StructField("a", T.StringType()),
            ]
        )
        old_file = spark.createDataFrame([(1, "v1")], "id long, a string")
        out = conform_to(old_file, target, {"a_old": ["a"]}).collect()[0]
        assert out["a_old"] == "v1" and out["a"] is None

    def test_conform_arrow_skips_consumed_exact_match(self):
        """The Arrow twin (stream/arrow-DML read lane) applies the
        same rule: a file column whose name another field's chain
        consumed resolves to THAT field, never to a same-named new
        column (delta lane: old files physically carry 'name' for
        name_old's data while new 'name' lives under its col-uuid)."""
        import pyarrow as pa

        from canvas_data_loader_spark.sources.warehouse_source import (
            _conform_arrow,
        )

        target = pa.schema(
            [("id", pa.int64()), ("name_old", pa.string()), ("name", pa.string())]
        )
        old_file = pa.table({"id": [1], "name": ["v1"]})
        out = _conform_arrow(
            old_file, target, {"name_old": ["name"], "name": ["col-x"]}
        )
        assert out.column("name_old").to_pylist() == ["v1"]
        assert out.column("name").to_pylist() == [None]
        # a NEW file carrying the fresh physical name resolves via the
        # new field's own chain
        new_file = pa.table({"id": [2], "col-x": ["w2"], "name": ["old2"]})
        out2 = _conform_arrow(
            new_file, target, {"name_old": ["name"], "name": ["col-x"]}
        )
        assert out2.column("name").to_pylist() == ["w2"]
        assert out2.column("name_old").to_pylist() == ["old2"]
