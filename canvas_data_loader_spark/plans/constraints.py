"""CHECK constraints on warehouse tables — the public Delta Lake
spelling (table property ``delta.constraints.<name> = <sql expr>``,
PROTOCOL.md writer requirement: "writers must verify CHECK constraints
before committing"), carried identically on BOTH commit protocols
(Delta ``metaData.configuration`` / manifest ``props`` — the property
layer is already contract-shared, so constraints ride every guarantee
properties have: carried across commits, rolled back by RESTORE,
replicated by mirrors).

Semantics are SQL CHECK: a row VIOLATES only when the expression is
FALSE — NULL/unknown passes. Enforcement happens in the writer at
every data-adding path (full write, keyed merge, UPDATE's assigned
rows, the streaming writer's arrow lane) BEFORE any file is written,
so a violating batch leaves the table untouched (stricter than Delta's
mid-job abort, which orphans files). DELETE cannot create violations
and is not checked.

Cost: one aggregate job over the INCOMING batch per write (all
constraints folded into a single pass). That is the price of
constraints everywhere; it is batch-sized, never table-sized.

Cross-engine note: the expression must be valid for every engine that
enforces it — Spark SQL on the DataFrame lanes, DuckDB on the
session-less arrow lane. Stick to the ANSI subset both share
(comparisons, boolean logic, arithmetic, IN, LIKE, IS [NOT] NULL,
CASE); ``add_constraint`` validates the expression against BOTH
engines at creation time so a Spark-only spelling fails fast instead
of bricking the stream writer later.

Known race (documented, same shape as Delta without a commit
coordinator): ``add_constraint`` verifies existing rows, then
publishes the property in a separate metadata commit — a write landing
in between is checked against the pre-add property set.
"""

from __future__ import annotations

import re

CONSTRAINT_PREFIX = "delta.constraints."
_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


class ConstraintViolation(ValueError):
    """A batch carries rows for which a CHECK constraint evaluates to
    FALSE. Nothing was committed; nothing was written."""


def constraints_of(props: dict) -> dict[str, str]:
    """{name: sql expr} from a table-properties map."""
    return {
        k[len(CONSTRAINT_PREFIX):]: v
        for k, v in (props or {}).items()
        if k.startswith(CONSTRAINT_PREFIX)
    }


def validate_name(name: str) -> None:
    if not _NAME_RE.match(name or ""):
        raise ValueError(
            f"invalid constraint name {name!r} (identifier characters "
            "only)"
        )


def _raise_violation(
    bad: dict[str, int], constraints: dict[str, str], table: str
) -> None:
    detail = ", ".join(
        f"{n} CHECK ({constraints[n]}): {c} row(s)"
        for n, c in sorted(bad.items())
    )
    raise ConstraintViolation(
        f"{table}: batch violates CHECK constraint(s) — {detail}; "
        "nothing was committed"
    )


def enforce_spark(df, constraints: dict[str, str], table: str) -> None:
    """Refuse ``df`` if any row violates any constraint. ALL
    constraints fold into ONE aggregate job (a violation count per
    constraint — the error names the offenders and their counts).
    SQL CHECK null rule: only expr IS FALSE violates. An expression
    that no longer resolves against the schema (e.g. smuggled past
    add_constraint via raw set_properties) surfaces as a descriptive
    ValueError naming the constraint, not a bare AnalysisException."""
    if not constraints:
        return
    from pyspark.errors import AnalysisException, ParseException
    from pyspark.sql import functions as F

    try:
        # F.expr parses EAGERLY — construction belongs inside the try
        # so a syntactically invalid smuggled expression gets the
        # descriptive error, not a bare ParseException. The catch is
        # NARROW (analysis/parse only): a runtime failure of the
        # aggregate job (executor loss, pruned base files) must
        # propagate as itself, not as drop-the-constraint advice.
        aggs = [
            F.sum(
                F.when(
                    ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(name)
            for name, expr in constraints.items()
        ]
        row = df.agg(*aggs).collect()[0]
    except (AnalysisException, ParseException) as e:
        raise ValueError(
            f"{table}: a CHECK constraint expression no longer evaluates "
            f"against the batch schema ({constraints}): {e} — drop the "
            "constraint (or fix the expression) before writing"
        ) from e
    bad = {n: int(row[n] or 0) for n in constraints if (row[n] or 0) > 0}
    if bad:
        _raise_violation(bad, constraints, table)


def enforce_arrow(batch, constraints: dict[str, str], table: str) -> None:
    """The session-less twin (the stream writer's commit hook has no
    SparkSession): DuckDB evaluates the SAME expressions over the
    arrow batch, all constraints folded into ONE scan (FILTER
    aggregates). ``NOT (expr)`` matches only expr IS FALSE rows —
    identical null semantics to the Spark lane. A value-dependent
    engine divergence (an expression DuckDB cannot evaluate on these
    rows even though the Spark lane could) surfaces as a descriptive
    error naming the constraint — the documented reason add_constraint
    restricts expressions to the shared ANSI subset."""
    if not constraints or batch.num_rows == 0:
        return
    import duckdb

    names = list(constraints)
    selects = ", ".join(
        f"count(*) FILTER (WHERE NOT ({constraints[n]})) AS c{i}"
        for i, n in enumerate(names)
    )
    con = duckdb.connect()
    try:
        con.register("__cdl_batch", batch)
        try:
            row = con.execute(
                f"SELECT {selects} FROM __cdl_batch"
            ).fetchone()
        except Exception as e:  # noqa: BLE001
            raise ValueError(
                f"{table}: a CHECK constraint could not be evaluated on "
                f"the session-less (DuckDB) lane over this batch "
                f"({constraints}): {e} — keep constraint expressions in "
                "the shared ANSI subset both engines evaluate identically"
            ) from e
        bad = {
            n: int(row[i]) for i, n in enumerate(names) if row[i]
        }
        if bad:
            _raise_violation(bad, constraints, table)
    finally:
        con.close()


def guard_renames(
    constraints: dict[str, str], renames: dict[str, str], table: str
) -> None:
    """Refuse a declared RENAME of a column a CHECK constraint
    references (Delta's rule, for the same reason): the stored
    expression keeps the OLD name, so every subsequent write would die
    unresolved. Conservative word-boundary match — a false positive
    (the name inside a string literal) errs on the safe side; drop the
    constraint first if the rename is intended."""
    for old_name in renames or {}:
        hits = [
            n
            for n, e in constraints.items()
            if re.search(rf"\b{re.escape(old_name)}\b", e)
        ]
        if hits:
            raise ValueError(
                f"{table}: cannot rename column {old_name!r} — it is "
                f"referenced by CHECK constraint(s) {sorted(hits)}; drop "
                "them first and re-add against the new name"
            )


def validate_constraint_props(props: dict | None) -> None:
    """Name-format gate for constraint keys arriving through the raw
    property surface (``set_properties`` / ``write(props=...)``) —
    full validation (existing rows + dual-engine parse) is
    ``add_constraint``'s job, but a malformed NAME must never land."""
    for k, v in (props or {}).items():
        if k.startswith(CONSTRAINT_PREFIX) and v is not None:
            validate_name(k[len(CONSTRAINT_PREFIX):])


def add_constraint(warehouse, table: str, name: str, expr: str) -> None:
    """ALTER TABLE ... ADD CONSTRAINT name CHECK (expr): verify every
    EXISTING row satisfies the expression (the Delta rule — a
    constraint you could not have written under), dry-run the
    expression on the arrow lane's engine too (both engines must agree
    it parses, or the stream writer bricks later), then publish the
    property. Duplicate names are refused."""
    validate_name(name)
    key = CONSTRAINT_PREFIX + name
    props = warehouse.table_properties(table)
    if key in props:
        raise ValueError(
            f"constraint {name!r} already exists on {table!r} "
            f"(CHECK ({props[key]})) — drop it first"
        )
    df = warehouse.read(table)
    # cross-engine parse check on an empty slice of the real schema
    import duckdb

    con = duckdb.connect()
    try:
        con.register(
            "__cdl_schema_probe", df.limit(0).toPandas()
        )
        con.execute(f"SELECT count(*) FROM __cdl_schema_probe WHERE NOT ({expr})")
    except Exception as e:  # noqa: BLE001
        raise ValueError(
            f"constraint expression {expr!r} is not valid on the arrow "
            f"lane's engine (DuckDB): {e} — use the shared ANSI subset"
        ) from e
    finally:
        con.close()
    enforce_spark(df, {name: expr}, table)
    warehouse.set_properties(table, {key: expr})


def drop_constraint(
    warehouse, table: str, name: str, if_exists: bool = False
) -> bool:
    """ALTER TABLE ... DROP CONSTRAINT name. Returns True if dropped."""
    validate_name(name)
    key = CONSTRAINT_PREFIX + name
    if key not in warehouse.table_properties(table):
        if if_exists:
            return False
        raise ValueError(f"no constraint {name!r} on {table!r}")
    warehouse.set_properties(table, {key: None})
    return True
