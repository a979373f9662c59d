"""Spark-free arrow DML lane (plans/arrow_dml.py).

Three contracts, in dependency order:

1. **Hash/bucket routing is bit-identical to Spark.** The arrow lane
   routes rows with a pure-Python xxHash64; if it disagrees with
   ``F.xxhash64`` on even one value, a stream-merged row lands in a
   different bucket than a batch-merged one and the pruned merge
   silently loses it. Pinned across random values of every supported
   type, the NULL rule, and every string-length tail regime.
2. **The arrow helpers implement the Spark operators' semantics**
   (dedup-latest window, null-key-preserving anti-join).
3. **State equivalence with the Spark lane**: the same batch sequence
   through ``streaming.ingest.apply_stream_batch`` (DataFrame) and
   ``plans.arrow_dml.apply_stream_batch_arrow`` (pyarrow, no session)
   produces identical tables, epochs, and replay behavior on BOTH
   commit protocols — including DV-carrying and schema-evolved tables.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from canvas_data_loader_spark.plans.arrow_dml import (
    _anti_join,
    _dedup_latest_arrow,
    apply_stream_batch_arrow,
    bucket_of_value,
    spark_xxhash64,
)
from canvas_data_loader_spark.plans.delta import DeltaWarehouse
from canvas_data_loader_spark.plans.pipeline import Warehouse
from canvas_data_loader_spark.streaming.ingest import apply_stream_batch


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


# ---------------------------------------------------------------------------
# 1. hash / bucket parity
# ---------------------------------------------------------------------------


class TestXxhashParity:
    def _pin(self, spark, spark_type, dtype, vals):
        df = spark.createDataFrame([(v,) for v in vals], f"v {spark_type}")
        got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
        mine = [spark_xxhash64(v, dtype) for v in vals]
        assert got == mine

    def test_long(self, spark):
        rng = random.Random(11)
        vals = [rng.randint(-(2**63), 2**63 - 1) for _ in range(40)]
        vals += [0, 1, -1, 2**63 - 1, -(2**63), None]
        self._pin(spark, "long", "bigint", vals)

    def test_int_family(self, spark):
        rng = random.Random(12)
        vals = [rng.randint(-(2**31), 2**31 - 1) for _ in range(40)]
        vals += [0, 1, -1, 2**31 - 1, -(2**31), None]
        self._pin(spark, "int", "int", vals)
        # byte/short promote through the same 4-byte lane
        self._pin(spark, "smallint", "smallint", [0, 1, -1, 32767, -32768, None])
        self._pin(spark, "tinyint", "tinyint", [0, 1, -1, 127, -128, None])

    def test_string_all_tail_regimes(self, spark):
        """Lengths 0..40 cross every regime of the xxHash64 layout:
        <32 (no stripes), exactly 32, >32, and the 8/4/1-byte tails."""
        rng = random.Random(13)
        vals = [
            "".join(chr(rng.randint(33, 0x2FF)) for _ in range(n))
            for n in range(41)
        ]
        vals += ["", "héllo ✓ ünïcode", "x" * 1000, None]
        self._pin(spark, "string", "string", vals)

    def test_boolean_and_null_rule(self, spark):
        self._pin(spark, "boolean", "boolean", [True, False, None])
        # Catalyst's null rule: NULL leaves the running hash = seed
        assert spark_xxhash64(None, "bigint") == 42

    def test_bucket_pmod_parity(self, spark):
        from canvas_data_loader_spark.operators.merge import bucket_of

        rng = random.Random(14)
        vals = [rng.randint(-(2**63), 2**63 - 1) for _ in range(50)]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        for n in (1, 4, 16, 37):
            got = [r[0] for r in df.select(bucket_of(F.col("v"), n)).collect()]
            mine = [bucket_of_value(v, "bigint", n) for v in vals]
            assert got == mine

    def test_unsupported_type_refused(self):
        with pytest.raises(ValueError, match="unsupported bucket-key type"):
            spark_xxhash64(1.5, "double")


# ---------------------------------------------------------------------------
# 2. arrow helper semantics
# ---------------------------------------------------------------------------


class TestArrowHelpers:
    def test_dedup_latest_by_order(self):
        t = pa.table(
            {"id": [1, 1, 2, 1], "v": ["a", "b", "c", "d"], "seq": [3, 1, 0, 2]}
        )
        out = _dedup_latest_arrow(t, ["id"], "seq")
        rows = sorted(zip(out["id"].to_pylist(), out["v"].to_pylist()))
        assert rows == [(1, "a"), (2, "c")]  # seq=3 wins for id=1

    def test_dedup_no_order_keeps_last(self):
        t = pa.table({"id": [1, 1, 2], "v": ["a", "b", "c"]})
        out = _dedup_latest_arrow(t, ["id"], None)
        rows = sorted(zip(out["id"].to_pylist(), out["v"].to_pylist()))
        assert rows == [(1, "b"), (2, "c")]

    def test_anti_join_preserves_null_keys(self):
        old = pa.table({"id": [1, 2, None], "v": ["a", "b", "n"]})
        batch = pa.table({"id": [2, None], "v": ["B", "N"]})
        out = _anti_join(old, batch, ["id"])
        # Spark's join-on-key never matches NULL: old null-key row stays
        assert sorted(out["v"].to_pylist()) == ["a", "n"]

    def test_anti_join_multi_key(self):
        old = pa.table({"a": [1, 1, 2], "b": ["x", "y", "x"], "v": [1, 2, 3]})
        batch = pa.table({"a": [1], "b": ["y"], "v": [9]})
        out = _anti_join(old, batch, ["a", "b"])
        assert sorted(out["v"].to_pylist()) == [1, 3]


# ---------------------------------------------------------------------------
# 3. state equivalence with the Spark lane
# ---------------------------------------------------------------------------

SCHEMA = "id long, v string, seq long"


def _arrow(rows):
    return pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.string()),
            "seq": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


BATCHES = [
    [(1, "b0", 1), (1, "b0-newer", 2), (20, "new20", 1)],
    [(2, "b1", 3), (21, "new21", 1)],
    [(20, "b2-upd", 5), (3, "b2", 4)],
]


class TestArrowLaneEquivalence:
    def _seed(self, spark, wh, bucket):
        base = spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(1, 9)], SCHEMA
        )
        wh.write("t", base, snapshot="s0", bucket=bucket)

    def _run_both(self, spark, wh_factory, bucket):
        a, b = wh_factory("spark-lane"), wh_factory("arrow-lane")
        self._seed(spark, a, bucket)
        self._seed(spark, b, bucket)
        for i, rows in enumerate(BATCHES):
            apply_stream_batch(
                a, "t", ["id"], "seq", "app", spark.createDataFrame(rows, SCHEMA), i
            )
            assert apply_stream_batch_arrow(
                b.root, "t", ["id"], "seq", "app", _arrow(rows), i
            )
        return a, b

    def test_bucketed_equivalence(self, spark, wh_factory):
        a, b = self._run_both(spark, wh_factory, ("id", 4))
        assert canon(a.read("t")) == canon(b.read("t"))
        assert a.last_txn_epoch("app", "t") == b.last_txn_epoch("app", "t") == 2
        # layout preserved: still bucketed, merge stayed pruned
        info = b.routing_info("t")
        assert info["bucket_key"] == "id" and info["n_buckets"] == 4

    def test_plain_equivalence(self, spark, wh_factory):
        a, b = self._run_both(spark, wh_factory, None)
        assert canon(a.read("t")) == canon(b.read("t"))
        assert b.routing_info("t")["bucket_key"] is None

    def test_replay_skipped(self, spark, wh_factory):
        b = wh_factory("replay")
        self._seed(spark, b, ("id", 4))
        assert apply_stream_batch_arrow(
            b.root, "t", ["id"], "seq", "app", _arrow(BATCHES[0]), 0
        )
        v = b.current_version("t")
        # re-delivery of the same epoch: skipped, no new commit
        assert not apply_stream_batch_arrow(
            b.root, "t", ["id"], "seq", "app", _arrow(BATCHES[0]), 0
        )
        # a STALE epoch after a newer one is also skipped
        assert apply_stream_batch_arrow(
            b.root, "t", ["id"], "seq", "app", _arrow(BATCHES[1]), 1
        )
        assert not apply_stream_batch_arrow(
            b.root, "t", ["id"], "seq", "app", _arrow(BATCHES[0]), 0
        )
        assert b.current_version("t") == v + 1

    def test_create_on_absent(self, spark, wh_factory):
        b = wh_factory("create")
        assert apply_stream_batch_arrow(
            b.root,
            "t",
            ["id"],
            "seq",
            "app",
            _arrow(BATCHES[0]),
            0,
            protocol=wh_factory.kind,
        )
        rows = {r["id"]: r["v"] for r in b.read("t").collect()}
        # in-batch dedup-latest applied even on the create path
        assert rows == {1: "b0-newer", 20: "new20"}
        assert b.last_txn_epoch("app", "t") == 0

    def test_check_constraint_enforced_sessionless(self, spark, wh_factory):
        """A CHECK-constrained table refuses a violating micro-batch on
        the session-less lane too (DuckDB evaluates the same
        expression): nothing committed, nothing written; a passing
        batch then merges normally."""
        from canvas_data_loader_spark.plans.constraints import (
            ConstraintViolation,
            add_constraint,
        )

        b = wh_factory("constr")
        self._seed(spark, b, ("id", 4))
        add_constraint(b, "t", "seq_nonneg", "seq >= 0")
        head = b.current_version("t")
        with pytest.raises(ConstraintViolation, match="seq_nonneg"):
            apply_stream_batch_arrow(
                b.root, "t", ["id"], "seq", "app",
                _arrow([(1, "bad", -1)]), 0,
            )
        assert b.current_version("t") == head
        assert apply_stream_batch_arrow(
            b.root, "t", ["id"], "seq", "app", _arrow([(1, "ok", 3)]), 0
        )
        assert {r["id"]: r["v"] for r in b.read("t").collect()}[1] == "ok"

    def test_wrong_protocol_on_existing_table_refused(
        self, spark, wh_factory
    ):
        """An explicit wrong protocol option must not CAS-create a
        SECOND commit log inside an existing table directory (round-9
        review finding: auto-detecting readers would keep following
        the original log and every streamed row would be invisible)."""
        b = wh_factory("proto")
        self._seed(spark, b, ("id", 4))
        wrong = "manifest" if wh_factory.kind == "delta" else "delta"
        with pytest.raises(ValueError, match="refusing to write"):
            apply_stream_batch_arrow(
                b.root, "t", ["id"], "seq", "app", _arrow(BATCHES[0]), 0,
                protocol=wrong,
            )

    def test_wrong_key_on_bucketed_refused(self, spark, wh_factory):
        b = wh_factory("wrongkey")
        self._seed(spark, b, ("id", 4))
        with pytest.raises(ValueError, match="bucketed on"):
            apply_stream_batch_arrow(
                b.root, "t", ["v"], None, "app", _arrow(BATCHES[0]), 0
            )

    def test_merge_over_deletion_vectors(self, spark, wh_factory):
        """A mor-deleted table merged through the arrow lane: deleted
        rows stay deleted (the bucket read applies the DV before the
        anti-join), and untouched buckets' DVs survive the commit."""
        b = wh_factory("dv")
        self._seed(spark, b, ("id", 4))
        n_del = b.delete_where("t", F.col("id").isin(3, 5), mode="mor")
        assert n_del == 2
        assert apply_stream_batch_arrow(
            b.root, "t", ["id"], "seq", "app", _arrow([(1, "upd", 9)]), 0
        )
        rows = {r["id"]: r["v"] for r in b.read("t").collect()}
        assert 3 not in rows and 5 not in rows
        assert rows[1] == "upd" and len(rows) == 6

    def test_cross_lane_concurrent_merges_no_lost_updates(
        self, spark, wh_factory
    ):
        """The sharpest protocol claim: the Spark lane and the arrow
        lane are two EXECUTION ENGINES over ONE commit protocol, so
        they must interleave safely on the same table. Two threads
        merge disjoint key sets concurrently — every update from both
        lanes must survive (CAS losers re-derive, never clobber), and
        each lane's epochs land intact."""
        import threading

        b = wh_factory("race")
        self._seed(spark, b, ("id", 8))
        errs = []

        def spark_lane():
            try:
                for i in range(3):
                    rows = [(100 + i, f"s{i}", 1)]
                    apply_stream_batch(
                        b, "t", ["id"], "seq", "sparkapp",
                        spark.createDataFrame(rows, SCHEMA), i,
                    )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        def arrow_lane():
            try:
                for i in range(3):
                    apply_stream_batch_arrow(
                        b.root, "t", ["id"], "seq", "arrowapp",
                        _arrow([(200 + i, f"a{i}", 1)]), i,
                        max_commit_retries=25,
                    )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        t1 = threading.Thread(target=spark_lane)
        t2 = threading.Thread(target=arrow_lane)
        t1.start(); t2.start(); t1.join(); t2.join()
        assert errs == []
        rows = {r["id"]: r["v"] for r in b.read("t").collect()}
        for i in range(3):
            assert rows[100 + i] == f"s{i}"  # no spark-lane update lost
            assert rows[200 + i] == f"a{i}"  # no arrow-lane update lost
        assert len(rows) == 8 + 6
        assert b.last_txn_epoch("sparkapp", "t") == 2
        assert b.last_txn_epoch("arrowapp", "t") == 2

    def test_merge_after_evolution_rename(self, spark, wh_factory):
        """Table evolved with ADD + declared RENAME, then an arrow
        batch in the NEW schema: the conform path resolves old files
        through the rename chain / column mapping, and the merged rows
        read back under the declared names on both protocols."""
        b = wh_factory("evolve")
        base = spark.createDataFrame(
            [(i, f"n{i}", 0) for i in range(1, 9)],
            "id long, name string, seq long",
        )
        b.write("t", base, snapshot="s0", bucket=("id", 4))
        evolved = spark.createDataFrame(
            [(1, "N1", 1, "x")],
            "id long, display_name string, seq long, extra string",
        )
        b.merge_bucketed(
            "t",
            evolved,
            snapshot="m1",
            evolve=True,
            renames={"name": "display_name"},
        )
        batch = pa.table(
            {
                "id": pa.array([2, 30], pa.int64()),
                "display_name": pa.array(["D2", "D30"], pa.string()),
                "seq": pa.array([2, 2], pa.int64()),
                "extra": pa.array(["y", "z"], pa.string()),
            }
        )
        assert apply_stream_batch_arrow(
            b.root, "t", ["id"], "seq", "app", batch, 0
        )
        got = {r["id"]: (r["display_name"], r["extra"]) for r in b.read("t").collect()}
        assert got[2] == ("D2", "y") and got[30] == ("D30", "z")
        assert got[3] == ("n3", None)  # old file through the rename chain
        assert len(got) == 9
