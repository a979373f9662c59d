"""Unit tests for the pure ported logic (SURVEY.md §5 item 1).

Table-driven per the reference semantics:
- type mapping        (reference src/type_converter.rs:13-66)
- key inference       (reference src/importer.rs:148-186)
- filename parse      (reference src/importer.rs:66-101)
- historical detect   (reference src/api_client.rs:101-112)
- volatile routing    (reference src/importer.rs:15-49)
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from canvas_data_loader_spark.schema import (
    CANVAS_TO_SPARK,
    UnknownCanvasType,
    canvas_type_to_spark,
    infer_key_column,
    is_historical_refresh,
    is_volatile,
    parse_shard_filename,
)


class TestTypeMap:
    @pytest.mark.parametrize(
        "canvas,spark_t",
        [
            ("bigint", T.LongType()),
            ("boolean", T.BooleanType()),
            ("double precision", T.DoubleType()),
            ("enum", T.StringType()),
            ("int", T.IntegerType()),
            ("integer", T.IntegerType()),
            ("text", T.StringType()),
            ("timestamp", T.TimestampType()),
            ("date", T.DateType()),
            ("varchar", T.StringType()),
            ("guid", T.StringType()),
            ("datetime", T.TimestampType()),
        ],
    )
    def test_known_types(self, canvas, spark_t):
        assert canvas_type_to_spark(canvas) == spark_t

    def test_case_insensitive(self):
        assert canvas_type_to_spark("BigInt") == T.LongType()

    def test_unknown_type_hard_error(self):
        # matches reference: unknown types abort (type_converter.rs:62-64)
        with pytest.raises(UnknownCanvasType):
            canvas_type_to_spark("blob")

    def test_universe_complete(self):
        assert len(CANVAS_TO_SPARK) == 12


class TestKeyInference:
    def test_id_direct(self):
        assert infer_key_column("account_dim", ["id", "name"]) == "id"

    def test_single_strip(self):
        # assignment_fact -> assignment_id (importer.rs:160-170)
        assert (
            infer_key_column("assignment_fact", ["assignment_id", "x"])
            == "assignment_id"
        )

    def test_double_strip(self):
        # assignment_group_fact -> assignment_id after two strips
        assert (
            infer_key_column("assignment_group_fact", ["assignment_id", "x"])
            == "assignment_id"
        )

    def test_prefers_id(self):
        assert infer_key_column("assignment_fact", ["id", "assignment_id"]) == "id"

    def test_none_when_absent(self):
        assert infer_key_column("requests", ["url", "ts"]) is None

    def test_single_word_table(self):
        assert infer_key_column("requests", ["requests_id"]) is None


class TestFilenameRouting:
    def test_standard(self):
        s = parse_shard_filename("account_dim-00000-abc123.gz")
        assert s is not None and s.table_name == "account_dim"
        assert s.shard == "00000"

    def test_with_path(self):
        s = parse_shard_filename("/stage/d1/account_dim-00000-abc123.gz")
        assert s is not None and s.table_name == "account_dim"

    @pytest.mark.parametrize(
        "bad", ["toofew-parts.gz", "a-b-c-d.gz", "noparts.gz", ""]
    )
    def test_reject_malformed(self, bad):
        # exactly 3 '-'-separated parts or rejected (importer.rs:77-101)
        assert parse_shard_filename(bad) is None


class TestHistoricalRefresh:
    def test_requests_only_dump(self):
        assert is_historical_refresh({"requests": ["requests-00000-aaa.gz"]})

    def test_mixed_dump(self):
        assert not is_historical_refresh(
            {
                "requests": ["requests-00000-aaa.gz"],
                "account_dim": ["account_dim-00000-bbb.gz"],
            }
        )

    def test_empty_dump_not_historical(self):
        assert not is_historical_refresh({})


# Literal transcription of reference src/importer.rs:19-48, in the
# reference's own order.  The test below asserts FULL set equality, not
# spot-checks — a single divergent name silently mis-routes that table
# between merge and full-refresh (data corruption the oracle can't see).
REFERENCE_VOLATILE_TABLES = [
    "module_completion_requirement_fact",
    "module_fact",
    "module_item_fact",
    "module_prerequisite_fact",
    "module_progression_completion_requirement_fact",
    "module_progression_fact",
    "quiz_fact",
    "quiz_question_answer_fact",
    "quiz_question_fact",
    "quiz_question_group_fact",
    "quiz_submission_fact",
    "quiz_submission_historical_fact",
    "module_completion_requirement_dim",
    "module_dim",
    "module_item_dim",
    "module_prerequisite_dim",
    "module_progression_completion_requirement_dim",
    "module_progression_dim",
    "quiz_dim",
    "quiz_question_answer_dim",
    "quiz_question_dim",
    "quiz_question_group_dim",
    "quiz_submission_dim",
    "quiz_submission_historical_dim",
    "submission_comment_participant_dim",
    "requests",
    "assignment_override_user_rollup_fact",
    "enrollment_rollup_dim",
]


class TestVolatileRouting:
    def test_full_set_matches_reference_exactly(self):
        from canvas_data_loader_spark.schema import VOLATILE_TABLES

        assert len(REFERENCE_VOLATILE_TABLES) == 28  # importer.rs has 28 entries
        assert VOLATILE_TABLES == frozenset(REFERENCE_VOLATILE_TABLES)

    def test_every_reference_name_routes_volatile(self):
        for name in REFERENCE_VOLATILE_TABLES:
            assert is_volatile(name), name

    def test_non_volatile(self):
        assert not is_volatile("account_dim")
        # Tables that were once wrongly in our list must NOT be volatile:
        # the reference merges these incrementally.
        assert not is_volatile("communication_channel_fact")
        assert not is_volatile("discussion_entry_fact")
        assert not is_volatile("submission_file_fact")

    def test_force_all(self):
        # all_tables_volatile config (settings.rs:103-105)
        assert is_volatile("account_dim", all_tables_volatile=True)


# Reserved-word mangling now has exactly one implementation —
# sinks.sanitize_identifiers (substring containment, matching reference
# db_client.rs:160) — covered by test_ingest.TestJdbcSinkBoundary.
