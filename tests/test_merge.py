"""Merge/upsert semantics tests (the heart of the reference, A17-A22)."""

from __future__ import annotations

from pyspark.sql import Row

from canvas_data_loader_spark.operators.merge import (
    dedup_latest,
    merge_upsert,
    merge_upsert_large_batch,
)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestDedupLatest:
    def test_keeps_latest_by_order(self, spark):
        df = spark.createDataFrame(
            [Row(id=1, v="old", seq=1), Row(id=1, v="new", seq=2), Row(id=2, v="x", seq=1)]
        )
        out = dedup_latest(df, "id", "seq")
        assert rows(out.select("id", "v")) == [(1, "new"), (2, "x")]

    def test_composite_key(self, spark):
        df = spark.createDataFrame(
            [
                Row(a=1, b="x", v=1, seq=1),
                Row(a=1, b="x", v=2, seq=2),
                Row(a=1, b="y", v=3, seq=1),
            ]
        )
        out = dedup_latest(df, ["a", "b"], "seq")
        assert rows(out.select("a", "b", "v")) == [(1, "x", 2), (1, "y", 3)]


class TestMergeUpsert:
    def test_replace_and_preserve(self, spark):
        old = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")])
        new = spark.createDataFrame([Row(id=2, v="B"), Row(id=3, v="c")])
        out = merge_upsert(old, new, "id")
        # key 2 replaced (last writer wins), key 1 preserved, key 3 inserted
        assert rows(out) == [(1, "a"), (2, "B"), (3, "c")]

    def test_duplicate_keys_in_batch_latest_wins(self, spark):
        # matches reference sequential-overwrite within a file
        # (importer.rs:345-390): the later row is the survivor
        old = spark.createDataFrame([Row(id=1, v="orig", seq=0)])
        new = spark.createDataFrame(
            [Row(id=1, v="first", seq=1), Row(id=1, v="second", seq=2)]
        )
        out = merge_upsert(old, new, "id", order_col="seq")
        assert rows(out.select("id", "v")) == [(1, "second")]

    def test_idempotent(self, spark):
        old = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")])
        new = spark.createDataFrame([Row(id=2, v="B")])
        once = merge_upsert(old, new, "id")
        twice = merge_upsert(once, new, "id")
        assert rows(once) == rows(twice)

    def test_large_batch_variant_same_result(self, spark):
        old = spark.createDataFrame([Row(id=i, v=f"o{i}") for i in range(50)])
        new = spark.createDataFrame([Row(id=i, v=f"n{i}") for i in range(25, 75)])
        a = merge_upsert(old, new, "id")
        b = merge_upsert_large_batch(old, new, "id")
        assert rows(a) == rows(b)
        assert a.count() == 75


class TestBucketedMerge:
    def test_end_state_and_partition_pruning(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        from canvas_data_loader_spark.operators.merge import (
            BUCKET_COL,
            merge_upsert_bucketed,
            write_bucketed,
        )

        path = str(tmp_path / "orders_bucketed")
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        write_bucketed(o, path, "o_orderkey", n_buckets=8)

        batch = (
            o.filter(F.col("o_orderkey") % 500 == 0)  # 3 keys -> <=3 of 8 buckets
            .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
        )
        # snapshot untouched-partition files before the merge
        def part_files(p):
            out = {}
            for d in os.listdir(p):
                if d.startswith(BUCKET_COL):
                    out[d] = sorted(os.listdir(os.path.join(p, d)))
            return out

        before = part_files(path)
        affected = merge_upsert_bucketed(spark, path, batch, "o_orderkey", 8)
        after = part_files(path)
        untouched = [d for d in before if int(d.split("=")[1]) not in affected]
        assert untouched, "expected some unaffected buckets"
        for d in untouched:
            assert before[d] == after[d], f"unaffected partition {d} was rewritten"

        # end state == plain merge
        got = {
            r.o_orderkey: r.o_totalprice
            for r in spark.read.parquet(path).select("o_orderkey", "o_totalprice").collect()
        }
        expected = {
            r.o_orderkey: (r.o_totalprice + 1.0 if r.o_orderkey % 500 == 0 else r.o_totalprice)
            for r in o.collect()
        }
        assert got == expected

    def test_merge_idempotent(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from canvas_data_loader_spark.operators.merge import (
            merge_upsert_bucketed,
            write_bucketed,
        )

        path = str(tmp_path / "t")
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        write_bucketed(o, path, "o_orderkey", 4)
        batch = o.limit(20).withColumn("o_totalprice", F.lit(0.0))
        merge_upsert_bucketed(spark, path, batch, "o_orderkey", 4)
        first = sorted(tuple(r) for r in spark.read.parquet(path).drop("__kb").collect())
        merge_upsert_bucketed(spark, path, batch, "o_orderkey", 4)
        second = sorted(tuple(r) for r in spark.read.parquet(path).drop("__kb").collect())
        assert first == second


class TestSchemaEvolvingMerge:
    def test_added_column_survives_and_backfills_null(self, spark):
        from canvas_data_loader_spark.operators.merge import merge_upsert_evolve

        old = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        )
        new = spark.createDataFrame(
            [(2, "b2", "extra2"), (3, "c", "extra3")],
            "id long, v string, w string",
        )
        got = sorted(
            tuple(r) for r in merge_upsert_evolve(old, new, "id").collect()
        )
        assert got == [
            (1, "a", None),       # untouched old row, new col null-padded
            (2, "b2", "extra2"),  # updated
            (3, "c", "extra3"),   # inserted
        ]

    def test_dropped_column_preserved_from_old(self, spark):
        from canvas_data_loader_spark.operators.merge import merge_upsert_evolve

        old = spark.createDataFrame([(1, "a", 9)], "id long, v string, legacy long")
        new = spark.createDataFrame([(2, "b")], "id long, v string")
        got = sorted(
            tuple(r) for r in merge_upsert_evolve(old, new, "id").collect()
        )
        assert got == [(1, "a", 9), (2, "b", None)]
