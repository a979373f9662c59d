"""The ``cdl_warehouse`` Python data source: snapshot reads, batch CDF,
and the streaming change feed whose offsets are commit versions.

The load-bearing test is the EQUIVALENCE pin: the executor-side Arrow
diff must produce row-for-row what the Spark-side
``plans.ops.table_changes`` produces for every retained version step —
one semantics, two execution paths. Both commit protocols run through
the same suite via ``wh_factory``.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from canvas_data_loader_spark.plans.delta import DeltaWarehouse
from canvas_data_loader_spark.plans.ops import apply_changes, table_changes
from canvas_data_loader_spark.plans.pipeline import Warehouse
from canvas_data_loader_spark.sources.warehouse_source import (
    FeedReconstructionError,
    WarehouseDataSource,
    _Meta,
    _plan_range,
    read_changes_stream,
    register,
)


@pytest.fixture(params=["manifest", "delta"])
def wh_factory(request, tmp_path, spark):
    def build(name="wh"):
        root = str(tmp_path / f"{request.param}-{name}")
        if request.param == "delta":
            return DeltaWarehouse(spark, root)
        return Warehouse(spark, root)

    build.kind = request.param
    return build


def canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def genesis_of(wh):
    return -1 if isinstance(wh, DeltaWarehouse) else 0


def expected_feed(spark, wh, table, key=None):
    """The Spark-side ground truth: per retained version step, the
    table_changes feed (first step from genesis = the snapshot as
    inserts), stamped with _commit_version."""
    meta = _Meta(wh.root, table)
    parts = []
    prev = genesis_of(wh)
    for v in meta.retained_versions():
        if v <= genesis_of(wh):
            continue
        if prev == genesis_of(wh):
            step = wh.read_at_version(table, v).withColumn(
                "_change_type", F.lit("insert")
            )
        else:
            step = table_changes(wh, table, prev, v, key=key)
        parts.append(step.withColumn("_commit_version", F.lit(v)))
        prev = v
    out = parts[0]
    for p in parts[1:]:
        # evolved histories: early steps null-pad onto the head schema,
        # exactly what the stream's fixed declared schema does
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def build_history(spark, wh):
    """v1: 12 rows bucketed on id; v2: merge updating 2 + inserting 2;
    v3: full replace dropping 3 (deletes) and changing 1."""
    base = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(1, 13)],
        "id long, v string, x double",
    )
    wh.write("t", base, snapshot="s0", bucket=("id", 4))
    batch = spark.createDataFrame(
        [(1, "NEW1", 1.0), (2, "NEW2", None), (13, "n13", 13.0),
         (14, "n14", float("nan"))],
        "id long, v string, x double",
    )
    wh.merge_bucketed("t", batch, snapshot="m1")
    head = wh.read("t")
    replaced = head.filter(~F.col("id").isin(3, 4, 5)).withColumn(
        "v", F.when(F.col("id") == 6, F.lit("CHANGED")).otherwise(F.col("v"))
    )
    wh.write("t", replaced, snapshot="s2", bucket=("id", 4))


def run_stream(spark, root, table, checkpoint, out_dir, **opts):
    feed = read_changes_stream(spark, root, table, **opts)
    q = (
        feed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.schema(feed.schema).parquet(out_dir)


class TestSnapshotReader:
    def test_matches_warehouse_read(self, spark, wh_factory):
        wh = wh_factory()
        build_history(spark, wh)
        register(spark)
        got = (
            spark.read.format("cdl_warehouse")
            .option("root", wh.root)
            .option("table", "t")
            .load()
        )
        assert canon(got) == canon(wh.read("t"))

    def test_as_of_version(self, spark, wh_factory):
        wh = wh_factory()
        build_history(spark, wh)
        register(spark)
        v_first = min(
            v for v in _Meta(wh.root, "t").retained_versions()
            if v > genesis_of(wh)
        )
        got = (
            spark.read.format("cdl_warehouse")
            .option("root", wh.root)
            .option("table", "t")
            .option("version", v_first)
            .load()
        )
        assert canon(got) == canon(wh.read_at_version("t", v_first))


class TestSnapshotTimestampOption:
    def test_timestamp_as_of_via_source(self, spark, wh_factory):
        import time as _time

        from canvas_data_loader_spark.sources.warehouse_source import (
            SOURCE_NAME,
            register,
        )

        register(spark)
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
            bucket=("id", 2),
        )
        _time.sleep(0.05)
        t_between = _time.time()
        _time.sleep(0.05)
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(2, "b")], "id long, v string"),
            snapshot="m1",
        )
        old = (
            spark.read.format(SOURCE_NAME)
            .option("root", wh.root)
            .option("table", "t")
            .option("timestamp", str(t_between))
            .load()
        )
        assert sorted(tuple(r) for r in old.collect()) == [(1, "a")]
        with pytest.raises(Exception, match="not both"):
            (
                spark.read.format(SOURCE_NAME)
                .option("root", wh.root)
                .option("table", "t")
                .option("timestamp", str(t_between))
                .option("version", "1")
                .load()
                .collect()
            )


class TestStartingTimestamp:
    def test_feed_starts_at_or_after_the_time(self, spark, wh_factory):
        import time as _time

        from canvas_data_loader_spark.sources.warehouse_source import (
            SOURCE_NAME,
            register,
        )

        register(spark)
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
            bucket=("id", 2),
        )
        _time.sleep(0.05)
        t_mid = _time.time()
        _time.sleep(0.05)
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(2, "b")], "id long, v string"),
            snapshot="m1",
        )
        head = wh.current_version("t")
        feed = (
            spark.read.format(SOURCE_NAME)
            .option("root", wh.root)
            .option("table", "t")
            .option("feed", "true")
            .option("startingTimestamp", str(t_mid))
            .option("endingVersion", str(head))
            .load()
        )
        rows = feed.collect()
        # only the post-timestamp commit's changes
        assert sorted((r.id, r._change_type) for r in rows) == [
            (2, "insert")
        ]
        # a timestamp predating history = earliest (full snapshot first)
        full = (
            spark.read.format(SOURCE_NAME)
            .option("root", wh.root)
            .option("table", "t")
            .option("feed", "true")
            .option("startingTimestamp", "1.0")
            .option("endingVersion", str(head))
            .load()
        )
        assert full.count() == 2  # both rows, as inserts across steps

    def test_commit_stamped_exactly_at_the_time_is_delivered(
        self, spark, wh_factory
    ):
        """AT OR AFTER semantics: restarting from a stamp read off the
        commit itself must re-deliver that commit, not skip it."""
        from canvas_data_loader_spark.sources.warehouse_source import (
            SOURCE_NAME,
            register,
        )

        register(spark)
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
            bucket=("id", 2),
        )
        wh.merge_bucketed(
            "t",
            spark.createDataFrame([(2, "b")], "id long, v string"),
            snapshot="m1",
        )
        head = wh.current_version("t")
        # the head commit's own stamp
        if wh_factory.kind == "delta":
            import json as _json
            import os as _os

            log = _os.path.join(
                wh.root, "t", "_delta_log", f"{head:020d}.json"
            )
            stamp = next(
                a["commitInfo"]["timestamp"] / 1000.0
                for a in (_json.loads(l) for l in open(log) if l.strip())
                if "commitInfo" in a
            )
        else:
            stamp = dict(wh._commits("t"))[head]["committed_at"]
        feed = (
            spark.read.format(SOURCE_NAME)
            .option("root", wh.root)
            .option("table", "t")
            .option("feed", "true")
            .option("startingTimestamp", repr(stamp))
            .option("endingVersion", str(head))
            .load()
        )
        assert sorted(r.id for r in feed.collect()) == [2]

    def test_missing_table_raises_not_empty(self, spark, wh_factory):
        from canvas_data_loader_spark.sources.warehouse_source import (
            SOURCE_NAME,
            register,
        )

        register(spark)
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        # a typo'd table must error (schema resolution or the
        # timestamp-start guard — either is loud), never read as an
        # empty feed
        with pytest.raises(Exception, match="typo"):
            (
                spark.read.format(SOURCE_NAME)
                .option("root", wh.root)
                .option("table", "typo")
                .option("feed", "true")
                .option("startingTimestamp", "1.0")
                .load()
                .collect()
            )

    def test_timestamp_after_head_raises_for_batch(
        self, spark, wh_factory
    ):
        import time as _time

        from canvas_data_loader_spark.sources.warehouse_source import (
            SOURCE_NAME,
            register,
        )

        register(spark)
        wh = wh_factory()
        wh.write(
            "t",
            spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        _time.sleep(0.05)
        with pytest.raises(Exception, match="after"):
            (
                spark.read.format(SOURCE_NAME)
                .option("root", wh.root)
                .option("table", "t")
                .option("feed", "true")
                .option("startingTimestamp", str(_time.time()))
                .load()
                .collect()
            )


class TestBatchFeed:
    def test_full_history_matches_spark_feed(self, spark, wh_factory):
        wh = wh_factory()
        build_history(spark, wh)
        register(spark)
        got = (
            spark.read.format("cdl_warehouse")
            .option("root", wh.root)
            .option("table", "t")
            .option("feed", "true")
            .option("startingVersion", "earliest")
            .load()
        )
        assert canon(got) == canon(expected_feed(spark, wh, "t"))

    def test_single_step_matches_table_changes(self, spark, wh_factory):
        wh = wh_factory()
        build_history(spark, wh)
        register(spark)
        vs = [
            v for v in _Meta(wh.root, "t").retained_versions()
            if v > genesis_of(wh)
        ]
        a, b = vs[-2], vs[-1]
        got = (
            spark.read.format("cdl_warehouse")
            .option("root", wh.root)
            .option("table", "t")
            .option("feed", "true")
            .option("startingVersion", b)
            .option("endingVersion", b)
            .load()
        )
        exp = table_changes(wh, "t", a, b).withColumn(
            "_commit_version", F.lit(b)
        )
        assert canon(got) == canon(exp)


class TestStreamingFeed:
    def test_stream_matches_spark_feed_and_reconstructs(
        self, spark, wh_factory, tmp_path
    ):
        wh = wh_factory()
        build_history(spark, wh)
        got = run_stream(
            spark, wh.root, "t",
            str(tmp_path / "ckpt"), str(tmp_path / "out"),
            startingVersion="earliest",
        )
        assert canon(got) == canon(expected_feed(spark, wh, "t"))
        # feed applied step-by-step reconstructs the head table
        empty = wh.read("t").limit(0)
        state = empty
        for v in sorted(
            r["_commit_version"]
            for r in got.select("_commit_version").distinct().collect()
        ):
            state = apply_changes(
                state,
                got.filter(F.col("_commit_version") == v).drop(
                    "_commit_version"
                ),
                "id",
            )
        assert canon(state) == canon(wh.read("t"))

    def test_restart_is_exactly_once(self, spark, wh_factory, tmp_path):
        wh = wh_factory()
        build_history(spark, wh)
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
        first = run_stream(
            spark, wh.root, "t", ckpt, out, startingVersion="earliest"
        )
        n_first = first.count()
        # new commit after the stream stopped
        wh.merge_bucketed(
            "t",
            spark.createDataFrame(
                [(1, "AGAIN", 0.0)], "id long, v string, x double"
            ),
            snapshot="m2",
        )
        second = run_stream(spark, wh.root, "t", ckpt, out)
        assert second.count() > n_first
        # no version delivered twice beyond its own row count: every
        # (version) group appears exactly as the per-step spark feed
        assert canon(second) == canon(expected_feed(spark, wh, "t"))

    def test_default_start_tails_only_new_commits(
        self, spark, wh_factory, tmp_path
    ):
        wh = wh_factory()
        build_history(spark, wh)
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
        # no startingVersion: offset pinned at current head -> nothing
        feed = read_changes_stream(spark, wh.root, "t")
        q = (
            feed.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.read.schema(feed.schema).parquet(out).count() == 0
        wh.merge_bucketed(
            "t",
            spark.createDataFrame(
                [(2, "TAIL", 2.0)], "id long, v string, x double"
            ),
            snapshot="m3",
        )
        got = run_stream(spark, wh.root, "t", ckpt, out)
        vs = _Meta(wh.root, "t").retained_versions()
        exp = table_changes(wh, "t", vs[-2], vs[-1]).withColumn(
            "_commit_version", F.lit(vs[-1])
        )
        assert canon(got) == canon(exp)

    def test_restart_survives_pruned_starting_version_base(
        self, spark, wh_factory, tmp_path
    ):
        """A checkpointed stream must restart even after the commit its
        startingVersion option named has been pruned: the checkpoint
        offset supersedes the option, so reader CONSTRUCTION must not
        validate it (the round-8 review fix)."""
        wh = wh_factory()
        build_history(spark, wh)
        vs = [
            v for v in _Meta(wh.root, "t").retained_versions()
            if v > genesis_of(wh)
        ]
        start_at = vs[1]
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
        first = run_stream(
            spark, wh.root, "t", ckpt, out, startingVersion=start_at
        )
        n_first = first.count()
        assert n_first > 0
        # churn commits until start_at-1 (the option's diff base) and
        # start_at itself are pruned from the manifest log
        for i in range(8):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame(
                    [(5, f"churn{i}", float(i))],
                    "id long, v string, x double",
                ),
                snapshot=f"pr{i}",
            )
        retained_now = _Meta(wh.root, "t").retained_versions()
        if start_at - 1 in retained_now:
            assert wh_factory.kind == "delta"
            pytest.skip("delta log retains all commit entries")
        got = run_stream(spark, wh.root, "t", ckpt, out,
                         startingVersion=start_at)
        assert got.count() > n_first  # restarted and delivered the tail

    def test_max_versions_per_trigger_paces_catchup(
        self, spark, wh_factory, tmp_path
    ):
        wh = wh_factory()
        build_history(spark, wh)  # >= 3 data versions pending
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
        got = run_stream(
            spark, wh.root, "t", ckpt, out,
            startingVersion="earliest", maxVersionsPerTrigger=1,
        )
        # single-batch execution + 1-version clamp: only the FIRST
        # version's changes land in the first run
        assert [
            r["_commit_version"]
            for r in got.select("_commit_version").distinct().collect()
        ] == [min(
            v for v in _Meta(wh.root, "t").retained_versions()
            if v > genesis_of(wh)
        )]
        # each further run advances exactly one version until caught up
        for _ in range(4):
            got = run_stream(spark, wh.root, "t", ckpt, out,
                             maxVersionsPerTrigger=1)
        assert canon(got) == canon(expected_feed(spark, wh, "t"))

    def test_restart_with_rate_limit_never_rewinds(
        self, spark, wh_factory, tmp_path
    ):
        """A RESTARTED run that passes the same startingVersion +
        maxVersionsPerTrigger options (what a real deployment does —
        readStream options live in code and are re-sent every run)
        must never clamp latestOffset below the checkpointed cursor:
        that regresses the offset (Spark treats any different offset
        as new data) and redelivers already-consumed versions. The
        floor re-learns the checkpoint from the engine's
        commit()-replay on recovery, so each restarted run advances
        forward, never backward — pinned by asserting zero duplicate
        (version, key) deliveries across five paced runs."""
        wh = wh_factory()
        build_history(spark, wh)  # >= 3 data versions pending
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
        opts = dict(startingVersion="earliest", maxVersionsPerTrigger=1)
        got = run_stream(spark, wh.root, "t", ckpt, out, **opts)
        first = got.count()
        assert first > 0
        # every further run RE-PASSES the options (the restart case
        # the rewind bug lived in) until caught up
        for _ in range(4):
            got = run_stream(spark, wh.root, "t", ckpt, out, **opts)
        # no (commit_version, key) delivered twice — the cursor only
        # ever moved forward
        from pyspark.sql import functions as F

        dupes = (
            got.groupBy("_commit_version", "id", "_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        assert dupes == 0
        assert canon(got) == canon(expected_feed(spark, wh, "t"))

    def test_unbucketed_full_diff_with_explicit_key(
        self, spark, wh_factory, tmp_path
    ):
        wh = wh_factory()
        wh.write(
            "u",
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "id long, v string"
            ),
            snapshot="s0",
        )
        wh.write(
            "u",
            spark.createDataFrame(
                [(1, "a"), (3, "c")], "id long, v string"
            ),
            snapshot="s1",
        )
        got = run_stream(
            spark, wh.root, "u",
            str(tmp_path / "ckpt"), str(tmp_path / "out"),
            startingVersion="earliest", key="id",
        )
        assert canon(got) == canon(expected_feed(spark, wh, "u", key="id"))

    def test_no_key_unbucketed_raises(self, spark, wh_factory, tmp_path):
        wh = wh_factory()
        wh.write(
            "u", spark.createDataFrame([(1, "a")], "id long, v string"),
            snapshot="s0",
        )
        wh.write(
            "u", spark.createDataFrame([(2, "b")], "id long, v string"),
            snapshot="s1",
        )
        with pytest.raises(Exception, match="key"):
            run_stream(
                spark, wh.root, "u",
                str(tmp_path / "ckpt"), str(tmp_path / "out"),
                startingVersion="earliest",
            )


class TestStreamingDeleteFeed:
    def test_mor_delete_interval_streams_its_deletes(
        self, spark, wh_factory, tmp_path
    ):
        """A merge-on-read DELETE (deletion vectors — no directory or
        file-path change on the manifest impl, descriptor-only add
        actions on delta) must still feed the stream: planning sees the
        DV identity change, the executor masks the deleted positions,
        and the emitted step is pure deletes pinned row-for-row to
        table_changes."""
        wh = wh_factory()
        build_history(spark, wh)
        wh.delete_where("t", "id % 2 = 0", mode="mor")
        v_del = wh.current_version("t")
        got = run_stream(
            spark, wh.root, "t",
            str(tmp_path / "ckpt"), str(tmp_path / "out"),
            startingVersion="earliest",
        )
        assert canon(got) == canon(expected_feed(spark, wh, "t"))
        step = got.filter(F.col("_commit_version") == v_del)
        assert {r["_change_type"] for r in step.collect()} == {"delete"}
        assert sorted(r.id for r in step.collect()) == sorted(
            r.id
            for r in wh.read_at_version("t", v_del - 1)
            .filter("id % 2 = 0")
            .collect()
        )
        # feed applied step-by-step reconstructs the post-delete head
        state = wh.read("t").limit(0)
        for v in sorted(
            r["_commit_version"]
            for r in got.select("_commit_version").distinct().collect()
        ):
            state = apply_changes(
                state,
                got.filter(F.col("_commit_version") == v).drop(
                    "_commit_version"
                ),
                "id",
            )
        assert canon(state) == canon(wh.read("t"))


class TestStreamingReplication:
    def test_feed_drives_a_live_mirror(self, spark, wh_factory, tmp_path):
        """Composition: the change-feed SOURCE + foreachBatch + the
        warehouse merge = streaming replication. An upsert-only
        workload's feed, applied per micro-batch in commit order,
        leaves the mirror equal to the source head — the streaming
        twin of plans.ops.sync_mirror's incremental mode, built
        entirely from public pieces of this stack."""
        from canvas_data_loader_spark.plans.ops import applied_rows

        wh = wh_factory()
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 17)], "id long, v string"
        )
        wh.write("src", base, snapshot="s0", bucket=("id", 4))
        for i in range(3):
            wh.merge_bucketed(
                "src",
                spark.createDataFrame(
                    [(i + 1, f"m{i}"), (16 + i, f"n{i}")],
                    "id long, v string",
                ),
                snapshot=f"m{i}",
            )
        dst = wh_factory("dst")

        def apply_batch(batch_df, batch_id):
            # one delivered batch may span several commits (catch-up):
            # apply in commit order so a key updated twice lands on
            # its latest value, never on a same-batch race
            batch_df = batch_df.localCheckpoint()
            versions = sorted(
                r["_commit_version"]
                for r in batch_df.select("_commit_version")
                .distinct()
                .collect()
            )
            for i, v in enumerate(versions):
                rows = applied_rows(
                    batch_df.filter(
                        F.col("_commit_version") == v
                    ).drop("_commit_version")
                )
                if rows.isEmpty():
                    continue
                if not dst.exists("mirror"):
                    dst.write("mirror", rows, snapshot="init",
                              bucket=("id", 4))
                else:
                    dst.merge_bucketed("mirror", rows,
                                       snapshot=f"b{batch_id}-{i}")

        feed = read_changes_stream(
            spark, wh.root, "src", startingVersion="earliest"
        )
        q = (
            feed.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert canon(dst.read("mirror")) == canon(wh.read("src"))


class TestStreamingReplicationWithDeletes:
    def _source_with_deletes(self, spark, wh):
        wh.write(
            "src",
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(1, 17)], "id long, v string"
            ),
            snapshot="s0",
            bucket=("id", 4),
        )
        wh.merge_bucketed(
            "src",
            spark.createDataFrame(
                [(1, "UPD"), (17, "n17")], "id long, v string"
            ),
            snapshot="m1",
        )
        wh.delete_where("src", "id % 4 = 2", mode="mor")
        wh.update_where("src", {"v": "upper(v)"}, "id = 3")

    def test_feed_with_deletes_drives_mirror(
        self, spark, wh_factory, tmp_path
    ):
        """plans.ops.apply_feed_batch as the foreachBatch body: a
        history containing merges, a merge-on-read DELETE, and an
        UPDATE replicates exactly — deletes ride the same atomic merge
        commit as upserts (delete_keys), one commit per source
        version, epochs recorded alongside."""
        from canvas_data_loader_spark.plans.ops import apply_feed_batch

        wh = wh_factory()
        self._source_with_deletes(spark, wh)
        dst = wh_factory("dst")

        def body(batch_df, batch_id):
            apply_feed_batch(
                dst, "mirror", batch_df, "id", ("id", 4), "repl"
            )

        feed = read_changes_stream(
            spark, wh.root, "src", startingVersion="earliest"
        )
        q = (
            feed.writeStream.foreachBatch(body)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert canon(dst.read("mirror")) == canon(wh.read("src"))
        assert not any(
            r.id % 4 == 2 for r in dst.read("mirror").collect()
        )
        # continue the stream after MORE source commits (incl. another
        # delete): same checkpoint, converges again
        wh.delete_where("src", "id = 7", mode="mor")
        wh.merge_bucketed(
            "src",
            spark.createDataFrame([(18, "n18")], "id long, v string"),
            snapshot="m2",
        )
        q = (
            read_changes_stream(spark, wh.root, "src")
            .writeStream.foreachBatch(body)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert canon(dst.read("mirror")) == canon(wh.read("src"))

    def test_replayed_delivery_skips_applied_versions(
        self, spark, wh_factory, tmp_path
    ):
        """Exactly-once under replay: delivering the same CDF batch
        twice — even AFTER newer versions landed — changes nothing
        (epoch-guarded per source version, not value-idempotence)."""
        from canvas_data_loader_spark.plans.ops import (
            apply_feed_batch,
            table_changes,
        )

        wh = wh_factory()
        self._source_with_deletes(spark, wh)
        dst = wh_factory("dst")
        head = wh.current_version("src")
        # full history as one batch (what a catch-up delivery looks like)
        batch = expected_feed(spark, wh, "src")
        applied = apply_feed_batch(
            dst, "mirror", batch, "id", ("id", 4), "repl"
        )
        assert applied and max(applied) == head
        assert canon(dst.read("mirror")) == canon(wh.read("src"))
        v_before = dst.current_version("mirror")
        # replay an OLD slice (first two versions) after everything
        # landed: zero new commits, zero changes
        old_slice = batch.filter(
            F.col("_commit_version") <= sorted(applied)[1]
        )
        assert apply_feed_batch(
            dst, "mirror", old_slice, "id", ("id", 4), "repl"
        ) == []
        assert dst.current_version("mirror") == v_before
        assert canon(dst.read("mirror")) == canon(wh.read("src"))


class TestDeltaCheckpointReplay:
    def test_feed_reads_through_log_checkpoint(
        self, spark, wh_factory, tmp_path
    ):
        """Past the checkpoint interval the delta log replays from the
        parquet checkpoint + tail commits; the source's metadata path
        must resolve files/changed-buckets identically through it."""
        if wh_factory.kind != "delta":
            pytest.skip("log checkpoints are delta-specific")
        wh = wh_factory()
        build_history(spark, wh)
        # cross the checkpoint_interval (10) so _last_checkpoint exists
        for i in range(12):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame(
                    [(i % 5 + 1, f"ck{i}", float(i))],
                    "id long, v string, x double",
                ),
                snapshot=f"ck{i}",
            )
        assert os.path.isfile(
            os.path.join(wh.root, "t", "_delta_log", "_last_checkpoint")
        )
        got = run_stream(
            spark, wh.root, "t",
            str(tmp_path / "ckpt"), str(tmp_path / "out"),
            startingVersion="earliest",
        )
        assert canon(got) == canon(expected_feed(spark, wh, "t"))


class TestGuardsAndEvolution:
    def test_max_diff_bytes_guard(self, spark, wh_factory, tmp_path):
        wh = wh_factory()
        build_history(spark, wh)
        with pytest.raises(Exception, match="maxDiffBytes"):
            run_stream(
                spark, wh.root, "t",
                str(tmp_path / "ckpt"), str(tmp_path / "out"),
                startingVersion="earliest", maxDiffBytes=10,
            )

    def test_pruned_gap_raises(self, spark, wh_factory):
        wh = wh_factory()
        build_history(spark, wh)
        # churn enough commits that retention prunes the early ones
        for i in range(6):
            wh.merge_bucketed(
                "t",
                spark.createDataFrame(
                    [(1, f"r{i}", float(i))], "id long, v string, x double"
                ),
                snapshot=f"churn{i}",
            )
        meta = _Meta(wh.root, "t")
        vs = meta.retained_versions()
        if vs[0] - 1 <= genesis_of(wh):
            # the delta impl retains every log entry (vacuum removes
            # FILES, not commits) — a pruned COMMIT gap only exists on
            # the manifest protocol
            assert wh_factory.kind == "delta"
            pytest.skip("delta log retains all commit entries")
        with pytest.raises(FeedReconstructionError):
            _plan_range(meta, vs[0] - 1, vs[-1], "id", 1 << 40)

    def test_vacuumed_files_raise_reconstruction_error(
        self, spark, wh_factory
    ):
        if wh_factory.kind != "delta":
            pytest.skip("vacuum-with-retained-log is delta-specific")
        wh = wh_factory()
        build_history(spark, wh)
        wh.vacuum("t", retention_sec=0.0)
        meta = _Meta(wh.root, "t")
        vs = [v for v in meta.retained_versions() if v > genesis_of(wh)]
        with pytest.raises(FeedReconstructionError, match="vacuumed"):
            _plan_range(meta, genesis_of(wh), vs[-1], "id", 1 << 40)

    def test_starting_version_without_base_raises(
        self, spark, wh_factory, tmp_path
    ):
        wh = wh_factory()
        build_history(spark, wh)
        vs = _Meta(wh.root, "t").retained_versions()
        register(spark)
        with pytest.raises(Exception, match="startingVersion"):
            (
                spark.read.format("cdl_warehouse")
                .option("root", wh.root)
                .option("table", "t")
                .option("feed", "true")
                .option("startingVersion", vs[-1] + 10)
                .load()
                .collect()
            )

    def test_additive_evolution_conforms_old_side(
        self, spark, wh_factory, tmp_path
    ):
        wh = wh_factory()
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 9)], "id long, v string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        batch = spark.createDataFrame(
            [(1, "NEW", 7)], "id long, v string, extra int"
        )
        wh.merge_bucketed("t", batch, snapshot="m1", evolve=True)
        got = run_stream(
            spark, wh.root, "t",
            str(tmp_path / "ckpt"), str(tmp_path / "out"),
            startingVersion="earliest",
        )
        assert canon(got) == canon(expected_feed(spark, wh, "t"))

    def test_compaction_interval_advances_with_zero_partitions(
        self, spark, wh_factory, tmp_path
    ):
        """OPTIMIZE repoints every bucket's files without changing
        rows; the data_change=false marker must let the stream advance
        past it with ZERO planned data partitions, not a full diff."""
        wh = wh_factory()
        build_history(spark, wh)
        v_before = wh.current_version("t")
        wh.compact("t")
        meta = _Meta(wh.root, "t")
        v_after = meta.current_version()
        assert v_after > v_before
        assert _plan_range(meta, v_before, v_after, "id", 1 << 40) == []
        # and end-to-end: a stream pinned at v_before delivers nothing
        got = run_stream(
            spark, wh.root, "t",
            str(tmp_path / "ckpt"), str(tmp_path / "out"),
            startingVersion=v_before + 1,
        )
        assert got.count() == 0

    def test_rename_evolution_resolves_via_declared_chains(
        self, spark, wh_factory, tmp_path
    ):
        """Files written BEFORE a rename conform onto the declared
        (post-rename) schema through the head manifest's cumulative
        chains — where the source EXCEEDS plans.ops.table_changes,
        which raises FeedSchemaDrift on rename-crossing intervals."""
        wh = wh_factory()
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 9)], "id long, v string"
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        batch = spark.createDataFrame([(1, "NEW")], "id long, w string")
        wh.merge_bucketed(
            "t", batch, snapshot="m1", evolve=True, renames={"v": "w"}
        )
        got = run_stream(
            spark, wh.root, "t",
            str(tmp_path / "ckpt"), str(tmp_path / "out"),
            startingVersion="earliest",
        )
        assert "w" in got.columns and "v" not in got.columns
        # v1 snapshot rows (written under the OLD name) arrive under
        # the new name; the v2 update shows old->new value under "w"
        inserts = {
            r["id"]: r["w"]
            for r in got.filter(F.col("_change_type") == "insert").collect()
        }
        assert inserts == {i: f"v{i}" for i in range(1, 9)}
        post = got.filter(
            F.col("_change_type") == "update_postimage"
        ).collect()
        assert [(r["id"], r["w"]) for r in post] == [(1, "NEW")]

    def test_maintenance_commit_yields_no_rows(
        self, spark, wh_factory, tmp_path
    ):
        wh = wh_factory()
        build_history(spark, wh)
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
        run_stream(spark, wh.root, "t", ckpt, out, startingVersion="earliest")
        before = spark.read.parquet(out).count()
        wh.set_properties("t", {"owner": "feed-test"})
        got = run_stream(spark, wh.root, "t", ckpt, out)
        assert got.count() == before


class TestStreamWriter:
    """writeStream.format('cdl_warehouse'): the writer half of the
    data source. Executors stage parquet; the driver commit applies
    ONE keyed merge per micro-batch with the (appId, batchId) epoch in
    the same CAS commit — so a replayed batch (crash between warehouse
    commit and Spark checkpoint commit) is skipped, both protocols."""

    SCHEMA = "id long, v string, seq long"

    def _start(self, spark, src_dir, wh, ckpt):
        from pyspark.sql.types import _parse_datatype_string

        stream = (
            spark.readStream.schema(_parse_datatype_string(self.SCHEMA))
            .parquet(src_dir)
        )
        return (
            stream.writeStream.format("cdl_warehouse")
            .option("root", wh.root)
            .option("table", "t")
            .option("key", "id")
            .option("orderCol", "seq")
            .option("appId", "w1")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def test_e2e_upsert_and_replay_skip(self, spark, wh_factory, tmp_path):
        import glob

        from canvas_data_loader_spark.sources.warehouse_source import register

        register(spark)
        wh = wh_factory()
        base = spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(1, 9)], self.SCHEMA
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(
            [(1, "b0", 1), (1, "b0-newer", 2), (20, "NEW", 1)], self.SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        q = self._start(spark, src, wh, ckpt)
        q.awaitTermination(120)
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        # in-batch dups collapse to latest by orderCol; new key inserts
        assert rows[1] == "b0-newer" and rows[20] == "NEW" and len(rows) == 9
        assert wh.last_txn_epoch("w1", "t") == 0
        # second batch through the SAME checkpoint
        spark.createDataFrame(
            [(2, "b1", 3)], self.SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        q = self._start(spark, src, wh, ckpt)
        q.awaitTermination(120)
        rows = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert rows[2] == "b1" and len(rows) == 9
        assert wh.last_txn_epoch("w1", "t") == 1
        v_before = wh.current_version("t")
        # REPLAY: drop the checkpoint's last commit marker — Spark
        # re-runs batch 1; the epoch guard must skip it (no new
        # warehouse commit, same rows)
        commits = sorted(glob.glob(os.path.join(ckpt, "commits", "[0-9]*")))
        os.remove(commits[-1])
        crc = os.path.join(
            os.path.dirname(commits[-1]),
            f".{os.path.basename(commits[-1])}.crc",
        )
        if os.path.exists(crc):
            os.remove(crc)
        q = self._start(spark, src, wh, ckpt)
        q.awaitTermination(120)
        assert wh.current_version("t") == v_before
        rows2 = {r["id"]: r["v"] for r in wh.read("t").collect()}
        assert rows2 == rows
        # staging reclaimed
        stage = os.path.join(wh.root, "t", ".stream-stage", "w1")
        leftovers = glob.glob(os.path.join(stage, "*.parquet"))
        assert leftovers == []

    def test_multi_key_plain_table_upsert(self, spark, wh_factory, tmp_path):
        """Composite-key merge on an UNbucketed table through the
        writer (key='id,v'): rows replace only when BOTH key parts
        match — the plain-table lane of the arrow merge."""
        from canvas_data_loader_spark.sources.warehouse_source import register

        register(spark)
        wh = wh_factory()
        base = spark.createDataFrame(
            [(1, "a", 0), (1, "b", 0), (2, "a", 0)], self.SCHEMA
        )
        wh.write("t", base, snapshot="s0")  # plain, no bucket
        src = str(tmp_path / "srcmk")
        spark.createDataFrame(
            [(1, "a", 5), (3, "c", 5)], self.SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        from pyspark.sql.types import _parse_datatype_string

        stream = (
            spark.readStream.schema(_parse_datatype_string(self.SCHEMA))
            .parquet(src)
        )
        q = (
            stream.writeStream.format("cdl_warehouse")
            .option("root", wh.root)
            .option("table", "t")
            .option("key", "id,v")
            .option("appId", "wmk")
            .option("checkpointLocation", str(tmp_path / "ckptmk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {(r["id"], r["v"]): r["seq"] for r in wh.read("t").collect()}
        # (1,'a') replaced; (1,'b') and (2,'a') untouched; (3,'c') new
        assert rows == {(1, "a"): 5, (1, "b"): 0, (2, "a"): 0, (3, "c"): 5}

    def test_writer_requires_app_id_and_key(self, spark, wh_factory, tmp_path):
        from canvas_data_loader_spark.sources.warehouse_source import (
            WarehouseStreamWriter,
        )
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(self.SCHEMA)
        with pytest.raises(ValueError, match="appId"):
            WarehouseStreamWriter(
                schema, {"root": "/x", "table": "t", "key": "id"}, False
            )
        with pytest.raises(Exception, match="key"):
            WarehouseStreamWriter(
                schema, {"root": "/x", "table": "t", "appId": "a"}, False
            )
        with pytest.raises(ValueError, match="merge-only"):
            WarehouseStreamWriter(
                schema,
                {"root": "/x", "table": "t", "key": "id", "appId": "a"},
                True,
            )

    def test_writer_refuses_wrong_key_on_bucketed(self, spark, wh_factory, tmp_path):
        from canvas_data_loader_spark.sources.warehouse_source import register

        register(spark)
        wh = wh_factory()
        base = spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(1, 5)], self.SCHEMA
        )
        wh.write("t", base, snapshot="s0", bucket=("id", 4))
        src = str(tmp_path / "srcbad")
        spark.createDataFrame([(1, "x", 1)], self.SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        from pyspark.sql.types import _parse_datatype_string

        stream = (
            spark.readStream.schema(_parse_datatype_string(self.SCHEMA))
            .parquet(src)
        )
        q = (
            stream.writeStream.format("cdl_warehouse")
            .option("root", wh.root)
            .option("table", "t")
            .option("key", "v")  # not the bucket key
            .option("appId", "w2")
            .option("checkpointLocation", str(tmp_path / "ckptbad"))
            .trigger(availableNow=True)
            .start()
        )
        from pyspark.errors.exceptions.base import PySparkException

        with pytest.raises(Exception) as ei:
            q.awaitTermination(120)
        assert "bucketed on" in str(ei.value)
