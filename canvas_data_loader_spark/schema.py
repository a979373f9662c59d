"""Canvas Data schema model: type mapping, key inference, file routing.

Ports the *semantics* (not the code) of the reference's pure logic:

- type map            reference src/type_converter.rs:13-99
- key inference       reference src/importer.rs:148-186
- filename routing    reference src/importer.rs:66-101
- volatile routing    reference src/importer.rs:15-49
- historical detect   reference src/api_client.rs:101-112

The reference maps Canvas schema type names to Postgres/MySQL column
types and cast expressions; here they map to Spark types, which also
makes the TSV reader strongly typed at scan time (no per-row casting —
the single biggest semantic-preserving change vs the reference's
per-value ``::type`` casts at the SQL boundary).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

# --- Type system (reference src/type_converter.rs:13-66) -------------------
# Canvas schema type name -> Spark type. Unknown types are a hard error,
# matching the reference's behavior (type_converter.rs:62-64).
CANVAS_TO_SPARK: dict[str, T.DataType] = {
    "bigint": T.LongType(),
    "boolean": T.BooleanType(),  # real boolean on every sink (ref MySQL used VARCHAR(10))
    "double precision": T.DoubleType(),
    "enum": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "text": T.StringType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "varchar": T.StringType(),  # length hint ignored, as the reference does
    "guid": T.StringType(),
    "datetime": T.TimestampType(),
}


class UnknownCanvasType(ValueError):
    """Raised for a type name outside the Canvas type universe."""


def canvas_type_to_spark(type_name: str) -> T.DataType:
    try:
        return CANVAS_TO_SPARK[type_name.strip().lower()]
    except KeyError:
        raise UnknownCanvasType(f"unknown canvas type: {type_name!r}") from None


@dataclass
class ColumnDef:
    """One column of a Canvas table (reference src/api_client.rs:424-438)."""

    name: str
    type: str
    description: str | None = None
    length: int | None = None
    dimension: dict | None = None  # FK-style link: {name, id, role}


@dataclass
class TableDef:
    """One Canvas table definition (reference src/api_client.rs:405-421)."""

    table_name: str
    columns: list[ColumnDef]
    dw_type: str = "dimension"  # "dimension" | "fact"
    incremental: bool = False
    description: str | None = None
    hints: dict = field(default_factory=dict)

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, canvas_type_to_spark(c.type), True) for c in self.columns]
        )

    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]


@dataclass
class SchemaDef:
    """Versioned catalog (reference src/api_client.rs:395-401)."""

    version: str
    tables: dict[str, TableDef]

    @classmethod
    def from_json(cls, payload: dict) -> "SchemaDef":
        """Build from the Canvas Data API schema JSON shape."""
        tables: dict[str, TableDef] = {}
        for key, tdef in payload.get("schema", {}).items():
            cols = [
                ColumnDef(
                    name=c["name"],
                    type=c["type"],
                    description=c.get("description"),
                    length=c.get("length"),
                    dimension=c.get("dimension"),
                )
                for c in tdef.get("columns", [])
            ]
            tables[tdef.get("tableName", key).lower()] = TableDef(
                table_name=tdef.get("tableName", key).lower(),
                columns=cols,
                dw_type=tdef.get("dw_type", "dimension"),
                incremental=bool(tdef.get("incremental", False)),
                description=tdef.get("description"),
                hints=tdef.get("hints") or {},
            )
        return cls(version=str(payload.get("version", "")), tables=tables)

    def get_table(self, name: str) -> TableDef | None:
        # The reference lowercases and linear-scans (api_client.rs:210-215);
        # we fetch once and dict-lookup.
        return self.tables.get(name.lower())


# --- Filename -> table routing (reference src/importer.rs:66-101) ----------
# Shard filenames are "{table}-{shard}-{hash}.{ext}"; the table name itself
# may contain '-'? No: the reference splits on '-' and requires EXACTLY 3
# parts, rejecting anything else.


@dataclass
class FileNameSplit:
    table_name: str
    shard: str
    hash_and_ext: str


def parse_shard_filename(filename: str) -> FileNameSplit | None:
    """Parse ``{table}-{shard}-{hash}.{ext}``; None if malformed.

    Matches reference semantics (src/importer.rs:77-101): split the
    basename on '-', require exactly 3 parts.
    """
    base = filename.rsplit("/", 1)[-1]
    parts = base.split("-")
    if len(parts) != 3:
        return None
    return FileNameSplit(table_name=parts[0], shard=parts[1], hash_and_ext=parts[2])


# --- Key inference (reference src/importer.rs:148-186) ---------------------


def infer_key_column(table_name: str, columns: list[str] | set[str]) -> str | None:
    """Infer the "id-like" merge key for a table.

    Reference algorithm (src/importer.rs:148-186): use ``id`` if present;
    else strip the last '_'-segment of the table name and try
    ``{prefix}_id`` (assignment_fact -> assignment_id); else strip one
    more segment and retry; else None.
    """
    colset = set(columns)
    if "id" in colset:
        return "id"
    parts = table_name.split("_")
    for strip in (1, 2):
        if len(parts) > strip:
            candidate = "_".join(parts[:-strip]) + "_id"
            if candidate in colset:
                return candidate
    return None


# --- Volatile (full-refresh) routing (reference src/importer.rs:15-49) -----
# Tables with unstable or composite keys: dropped and rebuilt every import
# instead of merged. The exact list from the reference.
VOLATILE_TABLES: frozenset[str] = frozenset(
    {
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
    }
)


def is_volatile(table_name: str, all_tables_volatile: bool = False) -> bool:
    """Full-refresh (overwrite) vs incremental (merge) routing.

    Reference: static list src/importer.rs:15-49; ``all_tables_volatile``
    config src/settings.rs:103-105; a table with no inferrable key is
    also only loadable via overwrite.
    """
    return all_tables_volatile or table_name.lower() in VOLATILE_TABLES


# --- Historical-refresh detection (reference src/api_client.rs:17-19,101-112)
_REQUESTS_RE = re.compile(r"^requests.*?$")


def is_historical_refresh(files_by_table: dict[str, list[str]]) -> bool:
    """True iff every file of every table matches ``^requests.*?$``.

    A requests-only dump is a historical refresh; the pipeline may skip
    it (reference src/main.rs:158-168, setting skip_historical_imports).
    Empty dumps are NOT historical refreshes (vacuous-truth guarded),
    matching the reference's artifact-map iteration which only returns
    true when at least the map is examined with all-matching files.
    """
    saw_any = False
    for files in files_by_table.values():
        for f in files:
            saw_any = True
            base = f.rsplit("/", 1)[-1]
            if not _REQUESTS_RE.match(base):
                return False
    return saw_any


# Reserved-word identifier mangling lives in sinks.sanitize_identifiers
# (the only write-path consumer). One function, one documented policy:
# substring containment, matching the reference (db_client.rs:160).
