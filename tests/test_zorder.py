"""Z-order clustering contract (plans/cluster.py + both compacts):
multi-dimensional clustering must make per-file stats skipping
effective on EVERY listed column — the property lexicographic
range-clustering cannot provide for non-leading columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canvas_data_loader_spark.plans.cluster import zorder_value
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


def grid_df(spark, n=4096):
    """A full side x side grid (row-major) — two independent uniform
    dimensions, the shape where lexicographic clustering on (x, y)
    leaves y unskippable."""
    side = int(n ** 0.5)
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )


class TestZValue:
    def test_preserves_rows_and_is_deterministic(self, spark):
        df = grid_df(spark, 1024)
        z1 = df.withColumn("z", zorder_value(df, ["x", "y"]))
        z2 = df.withColumn("z", zorder_value(df, ["x", "y"]))
        a = sorted(tuple(r) for r in z1.collect())
        assert a == sorted(tuple(r) for r in z2.collect())
        assert len(a) == 1024
        assert all(r[-1] >= 0 for r in a)

    def test_locality_both_dims(self, spark):
        # nearby (x, y) points share z-prefixes: the z-range spanned by
        # a small rectangle must be far below the z-range of the table
        df = grid_df(spark, 4096)
        z = df.withColumn("z", zorder_value(df, ["x", "y"]))
        full = z.agg(
            (F.max("z") - F.min("z")).alias("span")
        ).collect()[0]["span"]
        rect = z.filter("x < 8 AND y < 8").agg(
            (F.max("z") - F.min("z")).alias("span")
        ).collect()[0]["span"]
        assert rect < full / 4

    def test_string_column_rejected_with_guidance(self, spark):
        df = spark.createDataFrame([(1, "a")], "k long, s string")
        with pytest.raises(ValueError, match="approxQuantile"):
            zorder_value(df, ["s"])

    def test_unknown_column_rejected(self, spark):
        df = grid_df(spark, 64)
        with pytest.raises(ValueError, match="not in the table"):
            zorder_value(df, ["nope"])

    def test_too_many_columns_rejected(self, spark):
        df = grid_df(spark, 64)
        with pytest.raises(ValueError, match="resolution"):
            zorder_value(df, ["x", "y", "k", "x", "y"])

    def test_nulls_rank_lowest(self, spark):
        df = spark.createDataFrame(
            [(None, 1), (0, 1), (100, 1)], "a int, b int"
        )
        z = df.withColumn("z", zorder_value(df, ["a", "b"])).collect()
        by_a = {r.a: r.z for r in z}
        assert by_a[None] <= by_a[0] <= by_a[100]


class TestZorderCompaction:
    def test_zorder_beats_lexicographic_on_second_column(
        self, spark, wh_factory
    ):
        """The load-bearing claim: after OPTIMIZE ZORDER BY (x, y), a
        predicate on y ALONE skips most files; after lexicographic
        clustering on (x, y) it cannot (every file spans y's range)."""
        df = grid_df(spark, 16384)
        side = 128

        wh = wh_factory("lex")
        wh.write("t", df, "s0")
        wh.compact("t", target_bytes=4_000, order_by=["x", "y"])
        kept_lex, total_lex = wh.files_for_range("t", "y", 0, side // 8)

        whz = wh_factory("z")
        whz.write("t", df, "s0")
        whz.compact(
            "t", target_bytes=4_000, order_by=["x", "y"], zorder=True
        )
        kept_z, total_z = whz.files_for_range("t", "y", 0, side // 8)
        assert total_lex > 8 and total_z > 8  # enough files to matter
        # lexicographic: y-only predicate keeps ~every file
        assert len(kept_lex) >= total_lex * 0.9
        # z-order: most files skipped
        assert len(kept_z) <= total_z * 0.6
        # and x-skipping still works on the z layout
        kept_zx, _ = whz.files_for_range("t", "x", 0, side // 8)
        assert len(kept_zx) <= total_z * 0.6

    def test_zorder_rewrite_preserves_rows_and_row_identity(
        self, spark, wh_factory
    ):
        wh = wh_factory()
        df = grid_df(spark, 1024)
        wh.write("t", df, "s0")
        v0 = wh.current_version("t")
        wh.compact("t", target_bytes=8_000, order_by=["x", "y"], zorder=True)
        assert sorted(tuple(r) for r in wh.read("t").collect()) == sorted(
            tuple(r) for r in df.collect()
        )
        # row-preserving: consumers may advance across it with no IO
        assert wh.rows_changed("t", v0, wh.current_version("t")) is False

    def test_zorder_on_bucketed_table_sorts_within_buckets(
        self, spark, wh_factory
    ):
        wh = wh_factory()
        df = grid_df(spark, 1024)
        wh.write("t", df, "s0", bucket=("k", 4))
        wh.compact("t", order_by=["x", "y"], zorder=True)
        assert wh.read("t").count() == 1024
        info = wh.routing_info("t")
        assert info["bucket_key"] == "k"  # layout preserved

    def test_zorder_compaction_materializes_dv(self, spark, wh_factory):
        wh = wh_factory()
        df = grid_df(spark, 1024)
        wh.write("t", df, "s0")
        wh.delete_where("t", "x = 3", mode="mor")
        before = sorted(r.k for r in wh.read("t").collect())
        wh.compact("t", target_bytes=8_000, order_by=["x", "y"], zorder=True)
        assert wh.dv_stats("t")["positions"] == 0
        assert sorted(r.k for r in wh.read("t").collect()) == before
