"""Row-level DELETE contract: ONE suite, BOTH commit-log impls.

``delete_where`` is the engine's generalization of the reference's
per-row keyed DELETE (src/importer.rs:363-375) to predicate deletes,
with two storage lanes whose semantics must be indistinguishable:

- merge-on-read (deletion vectors — manifest: parquet sidecars;
  delta: inline ``deletionVector`` descriptors per PROTOCOL.md), and
- copy-on-write (pruned rewrite: buckets on the manifest impl, files
  on the delta impl).

Every consumer surface is pinned against deletes: snapshot reads,
time travel, RESTORE, compaction (materialization), the change feed
(table_changes + the cdl_warehouse source), external DuckDB reads,
merges landing after a delete, materialized-view refresh, and
concurrent writers.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from canvas_data_loader_spark.plans.delta import DeltaWarehouse
from canvas_data_loader_spark.plans.pipeline import Warehouse


@pytest.fixture(params=["manifest", "delta"])
def wh_factory(request, tmp_path, spark):
    def build(name="wh"):
        root = str(tmp_path / f"{request.param}-{name}")
        if request.param == "delta":
            return DeltaWarehouse(spark, root)
        return Warehouse(spark, root)

    build.kind = request.param
    return build


def base_df(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )


def make_table(spark, wh, name="t", bucket=("k", 8), n=100):
    wh.write(name, base_df(spark, n), "s0", bucket=bucket)


def keys_of(wh, table="t"):
    return sorted(r.k for r in wh.read(table).collect())


def has_live_dv(wh, table="t") -> bool:
    if isinstance(wh, DeltaWarehouse):
        _, _, live, _, _ = wh._replay(table)
        return any(a.get("deletionVector") for a in live.values())
    return bool((wh.current_manifest(table) or {}).get("dv"))


def surviving(n, *dropped_vs):
    return [i for i in range(n) if i % 7 not in dropped_vs]


class TestDeleteBasics:
    def test_mor_delete_and_count(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        n = wh.delete_where("t", "v = 3", mode="mor")
        assert n == sum(1 for i in range(100) if i % 7 == 3)
        assert keys_of(wh) == surviving(100, 3)
        assert has_live_dv(wh)

    def test_cow_delete_leaves_no_dv(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        n = wh.delete_where("t", "v = 3", mode="cow")
        assert n == sum(1 for i in range(100) if i % 7 == 3)
        assert keys_of(wh) == surviving(100, 3)
        assert not has_live_dv(wh)

    def test_no_match_is_noop_commit_free(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        head = wh.current_version("t")
        assert wh.delete_where("t", "v = 999") == 0
        assert wh.current_version("t") == head

    def test_column_condition_accepted(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        assert wh.delete_where("t", F.col("k") == 5, mode="mor") == 1
        assert 5 not in keys_of(wh)

    def test_null_predicate_keeps_rows(self, spark, wh_factory):
        # SQL DELETE: a NULL predicate result KEEPS the row, on both
        # storage lanes
        for mode in ("mor", "cow"):
            wh = wh_factory(f"null-{mode}")
            df = spark.createDataFrame(
                [(1, None), (2, 5), (3, 5)], "k long, v long"
            )
            wh.write("t", df, "s0", bucket=("k", 4))
            assert wh.delete_where("t", "v = 5", mode=mode) == 2
            assert keys_of(wh) == [1]

    def test_bad_mode_raises(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        with pytest.raises(ValueError, match="mode"):
            wh.delete_where("t", "v = 1", mode="nope")

    def test_missing_table_raises(self, spark, wh_factory):
        wh = wh_factory()
        with pytest.raises(FileNotFoundError):
            wh.delete_where("ghost", "v = 1")

    def test_unbucketed_both_lanes(self, spark, wh_factory):
        wh = wh_factory()
        wh.write("u", base_df(spark), "s0")
        n1 = wh.delete_where("u", "v = 0", mode="mor")
        assert sorted(r.k for r in wh.read("u").collect()) == surviving(
            100, 0
        )
        n2 = wh.delete_where("u", "v = 2", mode="cow")
        assert n1 and n2
        assert sorted(r.k for r in wh.read("u").collect()) == surviving(
            100, 0, 2
        )


class TestDeleteModes:
    def test_auto_sparse_picks_mor(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        wh.delete_where("t", "k = 5", mode="auto")
        assert has_live_dv(wh)

    def test_auto_dense_picks_cow(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        wh.delete_where("t", "v >= 3", mode="auto")  # ~4/7 of rows
        assert not has_live_dv(wh)
        assert keys_of(wh) == [i for i in range(100) if i % 7 < 3]

    def test_delta_mor_above_inline_cap_raises(self, spark, tmp_path):
        wh = DeltaWarehouse(spark, str(tmp_path / "cap"))
        make_table(spark, wh)
        with pytest.raises(ValueError, match="cap"):
            wh.delete_where("t", "v >= 0", mode="mor", dv_inline_max_rows=10)

    def test_delta_auto_respects_inline_cap(self, spark, tmp_path):
        # sparse by fraction but above the inline cap -> cow, not a crash
        wh = DeltaWarehouse(spark, str(tmp_path / "cap2"))
        make_table(spark, wh, n=200)
        wh.delete_where(
            "t", "v = 3", mode="auto", dv_max_fraction=0.5,
            dv_inline_max_rows=5,
        )
        assert not has_live_dv(wh)
        assert keys_of(wh) == [i for i in range(200) if i % 7 != 3]


class TestDvAccumulationAndMerge:
    def test_two_mor_deletes_accumulate(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        wh.delete_where("t", "v = 3", mode="mor")
        wh.delete_where("t", "v = 5", mode="mor")
        assert keys_of(wh) == surviving(100, 3, 5)

    def test_merge_after_delete_no_resurrection(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        wh.delete_where("t", "v = 3", mode="mor")
        new = spark.createDataFrame([(3, 99), (200, 0)], "k long, v long")
        wh.merge_bucketed("t", new, "m1")
        rows = {r.k: r.v for r in wh.read("t").collect()}
        assert rows.get(3) == 99  # re-inserted by the merge
        assert rows.get(200) == 0
        assert 10 not in rows  # 10 % 7 == 3: still deleted
        # a second merge of untouched keys must also not resurrect
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(201, 1)], "k long, v long"),
            "m2",
        )
        assert 10 not in {r.k for r in wh.read("t").collect()}

    def test_rewriting_every_covered_bucket_clears_the_entry(
        self, spark, wh_factory
    ):
        # merge every key -> every bucket rewritten -> no DV survives
        wh = wh_factory()
        make_table(spark, wh)
        wh.delete_where("t", "v = 3", mode="mor")
        kept = wh.read("t")
        wh.merge_bucketed(
            "t", kept.withColumn("v", F.col("v") + 100), "rewrite-all"
        )
        assert not has_live_dv(wh)
        assert sorted(r.k for r in wh.read("t").collect()) == surviving(
            100, 3
        )


class TestDvTimeTravelRestoreCompaction:
    def test_time_travel_sees_pre_delete_rows(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        v0 = wh.current_version("t")
        wh.delete_where("t", "v = 3", mode="mor")
        assert wh.read_at_version("t", v0).count() == 100
        assert wh.read("t").count() == len(surviving(100, 3))

    def test_restore_across_delete_and_forward(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        v0 = wh.current_version("t")
        wh.delete_where("t", "v = 3", mode="mor")
        v_del = wh.current_version("t")
        wh.restore("t", v0)
        assert wh.read("t").count() == 100
        wh.restore("t", v_del)
        assert keys_of(wh) == surviving(100, 3)

    def test_compact_materializes_and_clears_dv(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        wh.delete_where("t", "v = 3", mode="mor")
        before = keys_of(wh)
        wh.compact("t")
        assert not has_live_dv(wh)
        assert keys_of(wh) == before

    def test_compact_materializes_unbucketed(self, spark, wh_factory):
        wh = wh_factory()
        wh.write("u", base_df(spark), "s0")
        wh.delete_where("u", "v = 3", mode="mor")
        before = sorted(r.k for r in wh.read("u").collect())
        wh.compact("u")
        assert not has_live_dv(wh, "u")
        assert sorted(r.k for r in wh.read("u").collect()) == before


class TestDvExternalRead:
    @pytest.mark.parametrize("bucket", [("k", 8), None])
    def test_duckdb_matches_spark_with_live_dv(
        self, spark, wh_factory, bucket
    ):
        import duckdb

        wh = wh_factory(f"ext-{'b' if bucket else 'u'}")
        wh.write("t", base_df(spark), "s0", bucket=bucket)
        wh.delete_where("t", "v = 3", mode="mor")
        wh.delete_where("t", "v = 5", mode="mor")
        duck = duckdb.sql(wh.external_read_sql("t")).df()
        sp = wh.read("t").toPandas()
        assert len(duck) == len(sp)
        assert sorted(duck["k"]) == sorted(sp["k"])
        assert set(duck.columns) == set(sp.columns)


    def test_evolved_schema_plus_dv_external_read(self, spark, tmp_path):
        # the schema-pinned (COALESCE-folded renames) projection and
        # the DV anti-join compose in one emitted statement
        import duckdb

        wh = Warehouse(spark, str(tmp_path / "evodv"))
        old = spark.createDataFrame(
            [(i, i % 5) for i in range(50)], "k long, val int"
        )
        wh.write("t", old, "s0", bucket=("k", 4))
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(100, 1)], "k long, v long"),
            "evo",
            evolve=True,
            renames={"val": "v"},
        )
        wh.delete_where("t", "v = 2", mode="mor")
        duck = duckdb.sql(wh.external_read_sql("t")).df()
        sp = wh.read("t").toPandas()
        assert sorted(duck.k) == sorted(sp.k)
        assert list(duck.columns) == list(sp.columns)


class TestDvChangeFeed:
    def test_feed_emits_exactly_the_deletes(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import (
            apply_changes,
            table_changes,
        )

        wh = wh_factory()
        make_table(spark, wh)
        v0 = wh.current_version("t")
        wh.delete_where("t", "v = 3", mode="mor")
        v1 = wh.current_version("t")
        feed = table_changes(wh, "t", v0, v1)
        rows = feed.collect()
        assert {r["_change_type"] for r in rows} == {"delete"}
        assert sorted(r.k for r in rows) == [
            i for i in range(100) if i % 7 == 3
        ]
        rec = apply_changes(wh.read_at_version("t", v0), feed, "k")
        assert sorted(r.k for r in rec.collect()) == keys_of(wh)

    def test_changed_buckets_sees_dv_only_commit(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        v0 = wh.current_version("t")
        wh.delete_where("t", "k = 5", mode="mor")
        v1 = wh.current_version("t")
        changed = wh.changed_buckets("t", v0, v1)
        assert changed  # the bucket holding k=5, proven without data IO
        assert len(changed) == 1

    def test_rows_changed_true_over_delete(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        v0 = wh.current_version("t")
        wh.delete_where("t", "k = 5", mode="mor")
        assert wh.rows_changed("t", v0, wh.current_version("t")) is True

    def test_source_snapshot_and_cdf_over_delete(self, spark, wh_factory):
        from canvas_data_loader_spark.sources.warehouse_source import (
            SOURCE_NAME,
            register,
        )

        register(spark)
        wh = wh_factory()
        make_table(spark, wh)
        v0 = wh.current_version("t")
        wh.delete_where("t", "v = 3", mode="mor")
        v1 = wh.current_version("t")
        opts = {"root": wh.root, "table": "t"}
        snap = spark.read.format(SOURCE_NAME).options(**opts).load()
        assert sorted(r.k for r in snap.collect()) == surviving(100, 3)
        asof = (
            spark.read.format(SOURCE_NAME)
            .options(**opts)
            .option("version", str(v0))
            .load()
        )
        assert asof.count() == 100
        feed = (
            spark.read.format(SOURCE_NAME)
            .options(**opts)
            .option("feed", "true")
            .option("startingVersion", str(v0 + 1))
            .option("endingVersion", str(v1))
            .load()
        )
        rows = feed.collect()
        assert {r._change_type for r in rows} == {"delete"}
        assert sorted(r.k for r in rows) == [
            i for i in range(100) if i % 7 == 3
        ]

    def test_rollup_view_refresh_over_delete(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import (
            create_rollup_view,
            refresh_rollup_view,
        )

        wh = wh_factory()
        make_table(spark, wh)
        create_rollup_view(
            wh, "t_by_v", "t", group_keys=["v"], sum_cols={"sum_k": "k"}
        )
        wh.delete_where("t", "v = 3", mode="mor")
        refresh_rollup_view(wh, "t_by_v")
        got = {
            r.v: (r.n_rows, int(r.sum_k))
            for r in wh.read("t_by_v").collect()
            if r.n_rows > 0
        }
        exp = {
            v: (
                len([i for i in range(100) if i % 7 == v]),
                sum(i for i in range(100) if i % 7 == v),
            )
            for v in range(7)
            if v != 3
        }
        assert got == exp


class TestDvRetention:
    def test_dv_sidecar_survives_pruning_while_referenced(
        self, spark, tmp_path
    ):
        wh = Warehouse(spark, str(tmp_path / "ret"), retain=2)
        make_table(spark, wh)
        wh.delete_where("t", "v = 3", mode="mor")
        dv_dirs = [
            e["dir"] for e in wh.current_manifest("t").get("dv") or []
        ]
        assert dv_dirs
        # merges on other keys carry the dv forward; pruning runs after
        # each — the sidecar must survive as long as a retained
        # manifest references it
        for i in range(4):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame([(1000 + i, 0)], "k long, v long"),
                f"m{i}",
            )
        for d in dv_dirs:
            assert os.path.isdir(os.path.join(wh.root, "t", d))
        assert keys_of(wh) == surviving(100, 3) + [1000, 1001, 1002, 1003]

    def test_delta_vacuum_keeps_dv_correct(self, spark, tmp_path):
        wh = DeltaWarehouse(spark, str(tmp_path / "vac"))
        make_table(spark, wh)
        wh.delete_where("t", "v = 3", mode="mor")
        wh.merge_bucketed(
            "t", spark.createDataFrame([(1, 50)], "k long, v long"), "m"
        )
        wh.vacuum("t", retention_sec=0)
        assert sorted(r.k for r in wh.read("t").collect()) == surviving(
            100, 3
        )


class TestDeltaDvProtocol:
    def test_protocol_upgrade_and_descriptor_shape(self, spark, tmp_path):
        import json

        wh = DeltaWarehouse(spark, str(tmp_path / "proto"))
        make_table(spark, wh)
        v = wh.current_version("t")
        wh.delete_where("t", "k = 5", mode="mor")
        log = os.path.join(
            wh.root, "t", "_delta_log", f"{v + 1:020d}.json"
        )
        actions = [json.loads(l) for l in open(log) if l.strip()]
        protos = [a["protocol"] for a in actions if "protocol" in a]
        assert protos and protos[0]["minReaderVersion"] == 3
        assert "deletionVectors" in protos[0]["readerFeatures"]
        adds = [a["add"] for a in actions if "add" in a]
        dvs = [a["deletionVector"] for a in adds if a.get("deletionVector")]
        assert len(dvs) == 1
        assert dvs[0]["storageType"] == "i"
        assert dvs[0]["cardinality"] == 1
        assert dvs[0]["sizeInBytes"] > 0
        # remove+add pair for the same path (the protocol's spelling of
        # "this file's visibility changed")
        removes = [a["remove"]["path"] for a in actions if "remove" in a]
        assert removes == [a["path"] for a in adds]

    def test_checkpoint_replay_with_live_dv(self, spark, tmp_path):
        wh = DeltaWarehouse(spark, str(tmp_path / "ckpt"))
        make_table(spark, wh)
        wh.delete_where("t", "v = 3", mode="mor")
        wh.checkpoint("t")
        # fresh handle replays from the checkpoint
        wh2 = DeltaWarehouse(spark, wh.root)
        assert sorted(r.k for r in wh2.read("t").collect()) == surviving(
            100, 3
        )
        # and the checkpoint's protocol row carries the feature gate
        import pyarrow.parquet as pq

        ckpt = [
            f
            for f in os.listdir(os.path.join(wh.root, "t", "_delta_log"))
            if f.endswith(".checkpoint.parquet")
        ]
        t = pq.read_table(
            os.path.join(wh.root, "t", "_delta_log", ckpt[0])
        ).to_pylist()
        protos = [r["protocol"] for r in t if r.get("protocol")]
        assert protos[0]["minReaderVersion"] == 3


class TestUpdateWhere:
    """Predicate UPDATE — the third leg of the DML triad (the
    reference spells every update as DELETE+INSERT per row,
    src/importer.rs:363-389). Delta: merge-on-read (one commit = DV on
    old positions + new data files) or file-granular cow; manifest:
    bucket-granular cow (mor refused with the layout reason)."""

    def test_basic_update(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        n = wh.update_where("t", {"v": "v + 100"}, "v = 3")
        assert n == sum(1 for i in range(100) if i % 7 == 3)
        rows = {r.k: r.v for r in wh.read("t").collect()}
        assert len(rows) == 100
        assert all(rows[i] == 103 for i in range(100) if i % 7 == 3)
        assert all(rows[i] == i % 7 for i in range(100) if i % 7 != 3)

    def test_assignments_see_old_row_simultaneously(
        self, spark, wh_factory
    ):
        wh = wh_factory()
        df = spark.createDataFrame([(1, 10, 20)], "k long, a long, b long")
        wh.write("t", df, "s0", bucket=("k", 2))
        wh.update_where("t", {"a": "b", "b": "a"}, "k = 1")
        r = wh.read("t").collect()[0]
        assert (r.a, r.b) == (20, 10)  # swap, not a=b then b=a

    def test_null_predicate_rows_unchanged(self, spark, wh_factory):
        wh = wh_factory()
        df = spark.createDataFrame([(1, None), (2, 5)], "k long, v long")
        wh.write("t", df, "s0", bucket=("k", 2))
        assert wh.update_where("t", {"v": "0"}, "v = 5") == 1
        rows = {r.k: r.v for r in wh.read("t").collect()}
        assert rows == {1: None, 2: 0}

    def test_bucket_key_update_refused(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        with pytest.raises(ValueError, match="bucket key"):
            wh.update_where("t", {"k": "k + 1"}, "v = 0")

    def test_no_match_is_noop(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        head = wh.current_version("t")
        assert wh.update_where("t", {"v": "0"}, "v = 999") == 0
        assert wh.current_version("t") == head

    def test_feed_emits_update_pre_and_post(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import (
            apply_changes,
            table_changes,
        )

        wh = wh_factory()
        make_table(spark, wh)
        v0 = wh.current_version("t")
        wh.update_where("t", {"v": "v + 100"}, "v = 3")
        feed = table_changes(wh, "t", v0, wh.current_version("t"))
        rows = feed.collect()
        kinds = {r["_change_type"] for r in rows}
        assert kinds == {"update_preimage", "update_postimage"}
        post = {r.k: r.v for r in rows if r["_change_type"] == "update_postimage"}
        assert all(v == 103 for v in post.values()) and len(post) == 14
        rec = apply_changes(wh.read_at_version("t", v0), feed, "k")
        assert sorted(tuple(r) for r in rec.collect()) == sorted(
            tuple(r) for r in wh.read("t").collect()
        )

    def test_manifest_mor_refused_with_reason(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "mmor"))
        make_table(spark, wh)
        with pytest.raises(ValueError, match="merge-on-read UPDATE"):
            wh.update_where("t", {"v": "0"}, "v = 1", mode="mor")

    def test_delta_mor_update_single_commit_dv_plus_adds(
        self, spark, tmp_path
    ):
        import json

        wh = DeltaWarehouse(spark, str(tmp_path / "dmor"))
        make_table(spark, wh)
        v0 = wh.current_version("t")
        wh.update_where("t", {"v": "v + 100"}, "v = 3", mode="mor")
        assert wh.current_version("t") == v0 + 1  # ONE commit
        log = os.path.join(
            wh.root, "t", "_delta_log", f"{v0 + 1:020d}.json"
        )
        actions = [json.loads(l) for l in open(log) if l.strip()]
        adds = [a["add"] for a in actions if "add" in a]
        assert any(a.get("deletionVector") for a in adds)  # old positions
        assert any(not a.get("deletionVector") for a in adds)  # new rows
        # time travel still sees the pre-update values
        assert wh.read_at_version("t", v0).filter("v = 3").count() == 14
        assert wh.read("t").filter("v = 103").count() == 14
        # compaction materializes
        wh.compact("t")
        assert wh.read("t").filter("v = 103").count() == 14

    def test_delta_cow_update_file_granular(self, spark, tmp_path):
        wh = DeltaWarehouse(spark, str(tmp_path / "dcow"))
        make_table(spark, wh)
        wh.update_where("t", {"v": "v + 100"}, "v = 3", mode="cow")
        assert not has_live_dv(wh)
        assert wh.read("t").filter("v = 103").count() == 14

    def test_update_after_mor_delete_no_resurrection(
        self, spark, wh_factory
    ):
        wh = wh_factory()
        make_table(spark, wh)
        wh.delete_where("t", "v = 3", mode="mor")
        wh.update_where("t", {"v": "v + 100"}, "v = 5")
        rows = {r.k: r.v for r in wh.read("t").collect()}
        assert len(rows) == len(surviving(100, 3))
        assert all(rows[i] == 105 for i in range(100) if i % 7 == 5)
        assert all(i not in rows for i in range(100) if i % 7 == 3)

    def test_external_read_after_update(self, spark, wh_factory):
        import duckdb

        wh = wh_factory()
        make_table(spark, wh)
        wh.update_where("t", {"v": "v + 100"}, "v = 3")
        duck = duckdb.sql(wh.external_read_sql("t")).df()
        sp = wh.read("t").toPandas()
        assert sorted(zip(duck.k, duck.v)) == sorted(zip(sp.k, sp.v))

    def test_update_racing_merge(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        errs = []

        def do_update():
            try:
                wh.update_where("t", {"v": "v + 100"}, "v = 3")
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        def do_merge(i):
            try:
                wh.merge_bucketed(
                    "t",
                    spark.createDataFrame(
                        [(3000 + i, 1)], "k long, v long"
                    ),
                    f"urace-{i}",
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=do_update)] + [
            threading.Thread(target=do_merge, args=(i,)) for i in range(3)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        rows = {r.k: r.v for r in wh.read("t").collect()}
        assert all(rows[i] == 103 for i in range(100) if i % 7 == 3)
        assert all(rows[3000 + i] == 1 for i in range(3))


class TestMergeDeleteKeys:
    """merge_bucketed(delete_keys=...): upserts + deletes in ONE
    atomic commit — the CDC-apply primitive streaming replication and
    sync_mirror's incremental mode build on."""

    def test_upserts_and_deletes_one_commit(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        head = wh.current_version("t")
        new = spark.createDataFrame([(0, 99), (200, 1)], "k long, v long")
        dels = spark.createDataFrame([(5,), (10,)], "k long")
        wh.merge_bucketed("t", new, "cdc", delete_keys=dels)
        assert wh.current_version("t") == head + 1
        rows = {r.k: r.v for r in wh.read("t").collect()}
        assert rows[0] == 99 and rows[200] == 1
        assert 5 not in rows and 10 not in rows
        assert len(rows) == 100 - 2 + 1

    def test_key_in_both_frames_lands_on_upsert(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        new = spark.createDataFrame([(7, 777)], "k long, v long")
        dels = spark.createDataFrame([(7,)], "k long")
        wh.merge_bucketed("t", new, "both", delete_keys=dels)
        rows = {r.k: r.v for r in wh.read("t").collect()}
        assert rows[7] == 777 and len(rows) == 100

    def test_delete_only_batch(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        empty = spark.createDataFrame([], "k long, v long")
        dels = spark.createDataFrame([(1,), (2,), (3,)], "k long")
        affected = wh.merge_bucketed("t", empty, "delonly",
                                     delete_keys=dels)
        assert affected  # deleted keys' buckets count as affected
        rows = {r.k for r in wh.read("t").collect()}
        assert rows == set(range(100)) - {1, 2, 3}

    def test_deletes_prune_to_their_buckets(self, spark, wh_factory):
        # a single deleted key must not repoint unrelated buckets
        wh = wh_factory()
        make_table(spark, wh)
        v0 = wh.current_version("t")
        empty = spark.createDataFrame([], "k long, v long")
        dels = spark.createDataFrame([(5,)], "k long")
        affected = wh.merge_bucketed("t", empty, "one", delete_keys=dels)
        assert len(affected) == 1
        changed = wh.changed_buckets("t", v0, wh.current_version("t"))
        assert changed == affected


class TestReviewRegressions:
    """Pinned fixes from the round-8 review of the DML surface."""

    def test_user_columns_named_file_and_pos_survive_mor_delete(
        self, spark, wh_factory
    ):
        # the DV anti-join must live in the reserved __cdl_ namespace:
        # joining on bare file/pos bricked any table with either
        # column the moment a merge-on-read delete landed
        wh = wh_factory()
        df = spark.createDataFrame(
            [(i, f"f{i}", i * 10) for i in range(20)],
            "k long, file string, pos long",
        )
        wh.write("t", df, "s0", bucket=("k", 4))
        n = wh.delete_where("t", "pos >= 150", mode="mor")
        assert n == 5
        rows = sorted(r.k for r in wh.read("t").collect())
        assert rows == list(range(15))
        wh.compact("t")  # the repair path must work too
        assert wh.read("t").count() == 15

    def test_update_unknown_column_rejected_before_commit(
        self, spark, wh_factory
    ):
        # withColumns silently ADDS unknown columns; committed
        # extra-column files brick bucketed reads — validate up front
        wh = wh_factory()
        make_table(spark, wh)
        head = wh.current_version("t")
        with pytest.raises(ValueError, match="typo_col"):
            wh.update_where("t", {"typo_col": "v + 1"}, "k = 3")
        assert wh.current_version("t") == head
        assert wh.read("t").count() == 100

    def test_manifest_mor_above_absolute_cap(self, spark, tmp_path):
        # fraction alone is not a broadcast bound: 20% of a huge table
        # is not a broadcast — the manifest impl needs the same
        # absolute cap the delta impl's inline limit provides
        wh = Warehouse(spark, str(tmp_path / "cap"))
        make_table(spark, wh)
        with pytest.raises(ValueError, match="broadcast"):
            wh.delete_where("t", "v = 3", mode="mor", dv_max_rows=5)
        # auto above the cap falls to cow instead of raising
        wh.delete_where(
            "t", "v = 3", mode="auto", dv_max_fraction=0.9, dv_max_rows=5
        )
        assert not has_live_dv(wh)
        assert keys_of(wh) == surviving(100, 3)

    def test_cumulative_dv_cap_enforced(self, spark, wh_factory):
        # the broadcast-size invariant bounds the LIVE DV set, not a
        # single operation: repeated under-cap deletes must trip it
        wh = wh_factory()
        make_table(spark, wh)
        kw = (
            {"dv_max_rows": 20}
            if wh_factory.kind == "manifest"
            else {"dv_inline_max_rows": 20}
        )
        wh.delete_where("t", "v = 3", mode="mor", **kw)  # 14 <= 20
        with pytest.raises(ValueError, match="compact"):
            wh.delete_where("t", "v = 5", mode="mor", **kw)  # 28 > 20
        # auto falls to cow instead; rows still correct
        wh.delete_where(
            "t", "v = 5", mode="auto", dv_max_fraction=0.9, **kw
        )
        assert keys_of(wh) == surviving(100, 3, 5)
        # compaction clears the backlog; mor works again
        wh.compact("t")
        wh.delete_where("t", "v = 1", mode="mor", **kw)
        assert keys_of(wh) == surviving(100, 3, 5, 1)

    def test_pre_z85_descriptor_still_decodes(self):
        # migration shim: descriptors written with the RFC 1924
        # alphabet (pre-fix) decode via the fallback, CRC-verified
        import base64
        import struct
        import zlib

        from canvas_data_loader_spark.plans.dv import (
            decode_inline_dv,
            serialize_rba,
        )

        data = serialize_rba([3, 8, 100])
        blob = data + struct.pack(">I", zlib.crc32(data))
        legacy = {
            "storageType": "i",
            "pathOrInlineDv": base64.b85encode(blob).decode("ascii"),
            "sizeInBytes": len(data),
            "cardinality": 3,
        }
        assert decode_inline_dv(legacy) == [3, 8, 100]

    def test_z85_alphabet_is_the_spec_alphabet(self):
        # ZeroMQ RFC 32's own test vector — proves the alphabet choice
        # (Python's base64.b85 RFC 1924 alphabet encodes this
        # differently), which is what an external Delta reader decodes
        from canvas_data_loader_spark.plans.dv import z85decode, z85encode

        vector = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
        assert z85encode(vector) == "HelloWorld"
        assert z85decode("HelloWorld") == vector

    def test_zorder_interval_type_guarded(self, spark):
        from canvas_data_loader_spark.plans.cluster import zorder_value

        df = spark.range(3).select(
            F.col("id"), F.expr("make_dt_interval(id)").alias("dur")
        )
        assert dict(df.dtypes)["dur"].startswith("interval")
        with pytest.raises(ValueError, match="approxQuantile"):
            zorder_value(df, ["dur"])


class TestDvMaintenance:
    def test_dv_stats_both_impls(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        assert wh.dv_stats("t") == {
            "positions": 0, "entries": 0, "fraction": None
        }
        wh.delete_where("t", "v = 3", mode="mor")
        st = wh.dv_stats("t")
        assert st["positions"] == 14 and st["entries"] >= 1
        assert st["fraction"] == pytest.approx(14 / 100)
        wh.compact("t")
        assert wh.dv_stats("t")["positions"] == 0

    def test_pipeline_dv_fraction_trigger(self, spark, tmp_path):
        """auto_compact_dv_fraction: a DV-heavy table gets its vectors
        materialized by the pipeline's post-import maintenance hook —
        merge-on-read debt stays self-limiting without anyone running
        OPTIMIZE by hand."""
        from canvas_data_loader_spark.plans.pipeline import (
            ImportPipeline,
            PipelineConfig,
        )

        cfg = PipelineConfig(
            stage_dir=str(tmp_path / "stage"),
            warehouse_dir=str(tmp_path / "wh"),
            ledger_path=str(tmp_path / "ledger.jsonl"),
            auto_compact_dv_fraction=0.05,
        )
        p = ImportPipeline(spark, client=None, config=cfg)
        make_table(spark, p.warehouse)
        p.warehouse.delete_where("t", "v = 3", mode="mor")  # 14% > 5%
        assert p.warehouse.dv_stats("t")["positions"] == 14
        p._maybe_compact("t")
        assert p.warehouse.dv_stats("t")["positions"] == 0
        assert sorted(r.k for r in p.warehouse.read("t").collect()) == (
            surviving(100, 3)
        )
        # below the bound: vectors are left alone (the cheap path)
        p.warehouse.delete_where("t", "k = 5", mode="mor")  # ~1%
        p._maybe_compact("t")
        assert p.warehouse.dv_stats("t")["positions"] == 1


class TestDmlMatrixHoles:
    """DML x evolution x maintenance cross-lanes."""

    def test_delete_on_schema_evolved_table(self, spark, tmp_path):
        # mor delete with the predicate on a RENAMED column: old files
        # carry the old name; the located read conforms before the
        # predicate, and positions stay physical
        wh = Warehouse(spark, str(tmp_path / "evo"))
        old = spark.createDataFrame(
            [(i, i % 5) for i in range(50)], "k long, val int"
        )
        wh.write("t", old, "s0", bucket=("k", 4))
        new = spark.createDataFrame(
            [(100, 1), (101, 2)], "k long, v long"  # renamed + widened
        )
        wh.merge_bucketed(
            "t", new, "evo", evolve=True, renames={"val": "v"}
        )
        n = wh.delete_where("t", "v = 2", mode="mor")
        assert n == 10 + 1  # 10 old rows with val=2, plus k=101
        rows = {r.k for r in wh.read("t").collect()}
        assert 101 not in rows and 2 not in rows and 100 in rows
        # update over the same evolved table
        wh.update_where("t", {"v": "v + 50"}, "v = 1")
        got = {r.k: r.v for r in wh.read("t").collect()}
        assert got[100] == 51
        assert all(v == 51 for k, v in got.items() if k % 5 == 1 and k < 50)

    def test_rebucket_materializes_dv(self, spark, wh_factory):
        from canvas_data_loader_spark.plans.ops import rebucket

        wh = wh_factory()
        make_table(spark, wh)
        wh.delete_where("t", "v = 3", mode="mor")
        before = keys_of(wh)
        rebucket(wh, "t", 16)
        assert wh.dv_stats("t")["positions"] == 0
        assert keys_of(wh) == before
        assert wh.routing_info("t")["n_buckets"] == 16

    def test_unbucketed_update_both_impls(self, spark, wh_factory):
        wh = wh_factory()
        wh.write("u", base_df(spark), "s0")  # no bucket
        n = wh.update_where("u", {"v": "v * 10"}, "v = 2")
        assert n == sum(1 for i in range(100) if i % 7 == 2)
        rows = {r.k: r.v for r in wh.read("u").collect()}
        assert all(rows[i] == 20 for i in range(100) if i % 7 == 2)
        assert len(rows) == 100

    def test_delete_then_restore_then_delete_again(self, spark, wh_factory):
        # DV state machine through a rollback: restore revives rows, a
        # fresh delete on the restored head works from clean state
        wh = wh_factory()
        make_table(spark, wh)
        v0 = wh.current_version("t")
        wh.delete_where("t", "v = 3", mode="mor")
        wh.restore("t", v0)
        assert wh.read("t").count() == 100
        n = wh.delete_where("t", "v = 5", mode="mor")
        assert n == 14
        assert keys_of(wh) == surviving(100, 5)


class TestDeleteConcurrency:
    def test_delete_racing_merges_no_lost_updates(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        errs = []

        def do_delete():
            try:
                wh_factory()  # no-op: keep factory parity
                wh.delete_where("t", "v = 3", mode="mor")
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        def do_merge(i):
            try:
                wh.merge_bucketed(
                    "t",
                    spark.createDataFrame(
                        [(2000 + i, 1)], "k long, v long"
                    ),
                    f"race-{i}",
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=do_delete)] + [
            threading.Thread(target=do_merge, args=(i,)) for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        got = keys_of(wh)
        assert got == surviving(100, 3) + [2000, 2001, 2002]

    def test_two_concurrent_deletes_both_land(self, spark, wh_factory):
        wh = wh_factory()
        make_table(spark, wh)
        errs = []

        def d(pred):
            try:
                wh.delete_where("t", pred, mode="mor")
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [
            threading.Thread(target=d, args=("v = 3",)),
            threading.Thread(target=d, args=("v = 5",)),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        assert keys_of(wh) == surviving(100, 3, 5)
