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


def enforce_spark(df, constraints: dict[str, str], table: str) -> None:
    """Refuse ``df`` if any row violates any constraint. ALL
    constraints fold into ONE aggregate job (a violation count per
    constraint — the error names the offenders and their counts).
    SQL CHECK null rule: only expr IS FALSE violates."""
    if not constraints:
        return
    from pyspark.sql import functions as F

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
    bad = {n: int(row[n] or 0) for n in constraints if (row[n] or 0) > 0}
    if bad:
        detail = ", ".join(
            f"{n} CHECK ({constraints[n]}): {c} row(s)"
            for n, c in sorted(bad.items())
        )
        raise ConstraintViolation(
            f"{table}: batch violates CHECK constraint(s) — {detail}; "
            "nothing was committed"
        )


def enforce_arrow(batch, constraints: dict[str, str], table: str) -> None:
    """The session-less twin (the stream writer's commit hook has no
    SparkSession): DuckDB evaluates the SAME expressions over the
    arrow batch. ``WHERE NOT (expr)`` matches only expr IS FALSE rows
    — identical null semantics to the Spark lane."""
    if not constraints or batch.num_rows == 0:
        return
    import duckdb

    con = duckdb.connect()
    try:
        con.register("__cdl_batch", batch)
        bad = {}
        for name, expr in constraints.items():
            cnt = con.execute(
                f"SELECT count(*) FROM __cdl_batch WHERE NOT ({expr})"
            ).fetchone()[0]
            if cnt:
                bad[name] = int(cnt)
        if bad:
            detail = ", ".join(
                f"{n} CHECK ({constraints[n]}): {c} row(s)"
                for n, c in sorted(bad.items())
            )
            raise ConstraintViolation(
                f"{table}: batch violates CHECK constraint(s) — {detail}; "
                "nothing was committed"
            )
    finally:
        con.close()


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
