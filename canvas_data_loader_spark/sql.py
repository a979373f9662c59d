"""SQL API surface: the engine's tables as Spark SQL views.

The DataFrame registry (queries.py) and SQL are two front-ends to the
same Catalyst plans — registering the fixture/warehouse tables as temp
views makes every capability reachable from ``spark.sql(...)`` too
(the query surface the star-schema dw_type vocabulary of the reference
implies, src/api_client.rs:407-408). Parity between the two front-ends
is pinned by tests/test_sql_surface.py on representative shapes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .queries import load

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (events through the
    nanos-safe reader)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def register_warehouse_views(spark: SparkSession, wh, prefix: str = "") -> None:
    """Register every warehouse table (either commit protocol) as a
    temp view, so the READ surface of a managed warehouse is reachable
    from ``spark.sql`` alongside the fixtures."""
    for t in wh.tables():
        wh.read(t).createOrReplaceTempView(prefix + t)


# ---------------------------------------------------------------------------
# SQL DML front-end: DELETE FROM / UPDATE ... SET / MERGE INTO over
# warehouse tables (both commit protocols). The reference's write path
# is row-at-a-time SQL (src/importer.rs:345-390: DELETE by key +
# INSERT per row); this surface accepts the STATEMENT spelling and
# routes it to the warehouse's set-oriented DML (delete_where /
# update_where / merge_bucketed) so the SQL capability matches the
# Python capability. Statement results are pinned equal to the Python
# API's by tests/test_sql_surface.py.
# ---------------------------------------------------------------------------


class SqlDmlError(ValueError):
    """The statement is not one of the supported DML shapes (the error
    message says which shapes are)."""


def _scan_top_level(stmt: str):
    """Yield (index, char, depth, in_quote) for a SQL string, tracking
    single/double/backtick quotes (with doubled-char escape) and
    parenthesis depth — the primitive under keyword search and comma
    splitting. Backticks are Spark's identifier quoting, so a comma or
    paren inside `a,b` must not split/nest (round-13 ADVICE)."""
    depth = 0
    quote = None
    i = 0
    while i < len(stmt):
        c = stmt[i]
        if quote is not None:
            if c == quote:
                if i + 1 < len(stmt) and stmt[i + 1] == quote:
                    i += 2
                    continue
                quote = None
        elif c in "'\"`":
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        yield i, c, depth, quote is not None
        i += 1


def _find_keyword(stmt: str, keyword: str, start: int = 0) -> int:
    """Index of the first depth-0, unquoted, word-boundary occurrence
    of ``keyword`` (case-insensitive) at or after ``start``; -1 if
    absent."""
    kw = keyword.upper()
    n = len(kw)
    up = stmt.upper()
    for i, _c, depth, quoted in _scan_top_level(stmt):
        if i < start or depth != 0 or quoted:
            continue
        if up[i : i + n] != kw:
            continue
        before_ok = i == 0 or not (up[i - 1].isalnum() or up[i - 1] == "_")
        j = i + n
        after_ok = j >= len(up) or not (up[j].isalnum() or up[j] == "_")
        if before_ok and after_ok:
            return i
    return -1


def _split_top_level(stmt: str, sep: str = ",") -> list[str]:
    """Split on depth-0 unquoted ``sep`` characters."""
    parts, last = [], 0
    for i, c, depth, quoted in _scan_top_level(stmt):
        if c == sep and depth == 0 and not quoted:
            parts.append(stmt[last:i])
            last = i + 1
    parts.append(stmt[last:])
    return [p.strip() for p in parts]


def _ident(tok: str) -> str:
    tok = tok.strip()
    if tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1].replace('""', '"')
    if tok.startswith("`") and tok.endswith("`"):
        # Spark spelling: a literal backtick doubles inside backticks
        return tok[1:-1].replace("``", "`")
    return tok


def _parse_delete(stmt: str):
    import re

    m = re.match(r"\s*DELETE\s+FROM\s+(\S+)\s*(.*)$", stmt, re.I | re.S)
    if not m:
        raise SqlDmlError("malformed DELETE FROM statement")
    table, rest = _ident(m.group(1)), m.group(2).strip()
    if not rest:
        return table, "true"
    mw = re.match(r"WHERE\s+(.*)$", rest, re.I | re.S)
    if not mw:
        raise SqlDmlError(f"unexpected tokens after DELETE FROM: {rest[:40]!r}")
    return table, mw.group(1).strip()


def _parse_update(stmt: str):
    import re

    m = re.match(r"\s*UPDATE\s+(\S+)\s+SET\s+", stmt, re.I)
    if not m:
        raise SqlDmlError("malformed UPDATE statement")
    table = _ident(m.group(1))
    body = stmt[m.end():]
    w = _find_keyword(body, "WHERE")
    set_part, cond = (
        (body[:w], body[w + 5 :].strip()) if w >= 0 else (body, "true")
    )
    assigns = {}
    for item in _split_top_level(set_part):
        if not item:
            continue
        eq = item.find("=")
        if eq <= 0:
            raise SqlDmlError(f"malformed SET assignment {item!r}")
        assigns[_ident(item[:eq])] = item[eq + 1 :].strip()
    if not assigns:
        raise SqlDmlError("UPDATE with empty SET list")
    return table, assigns, cond


def _merge_clause_starts(text: str) -> list[int]:
    """Top-level start offsets of ``WHEN [NOT] MATCHED`` clauses.
    CASE's WHEN is never followed by MATCHED, so requiring the MATCHED
    token disambiguates; a condition that itself contains the literal
    words ``WHEN MATCHED`` (e.g. comparing against a column of that
    name inside CASE) must be parenthesized — depth > 0 is skipped."""
    import re

    starts, pos = [], 0
    while True:
        i = _find_keyword(text, "WHEN", pos)
        if i < 0:
            break
        if re.match(r"WHEN\s+(NOT\s+)?MATCHED\b", text[i:], re.I):
            starts.append(i)
        pos = i + 4
    return starts


def _find_then_action(text: str) -> int:
    """Offset of the top-level THEN that introduces the clause's
    action (THEN followed by DELETE / UPDATE SET / INSERT). A CASE
    expression's THEN inside an unparenthesized condition is skipped
    unless its branch value starts with one of those keywords — wrap
    such conditions in parentheses."""
    import re

    pos = 0
    while True:
        i = _find_keyword(text, "THEN", pos)
        if i < 0:
            return -1
        if re.match(
            r"THEN\s+(DELETE\b|UPDATE\s+SET\b|INSERT\b)", text[i:], re.I
        ):
            return i
        pos = i + 4


def _parse_merge_action(txt: str, kind: str):
    """Parse a MERGE clause's THEN action for ``kind`` in
    {"matched", "not_matched", "nmbs"} (nmbs = NOT MATCHED BY
    SOURCE). Returns one of ``("delete",)``, ``("update_star",)``,
    ``("update", [(col, expr), ...])``, ``("insert_star",)``,
    ``("insert", [col, ...], [expr, ...])``."""
    import re

    t = txt.strip()
    if re.fullmatch(r"DELETE", t, re.I):
        if kind == "not_matched":
            raise SqlDmlError("WHEN NOT MATCHED cannot DELETE")
        return ("delete",)
    m = re.match(r"UPDATE\s+SET\s+", t, re.I)
    if m:
        if kind == "not_matched":
            raise SqlDmlError("WHEN NOT MATCHED cannot UPDATE")
        body = t[m.end():].strip()
        if body == "*":
            if kind == "nmbs":
                raise SqlDmlError(
                    "WHEN NOT MATCHED BY SOURCE cannot UPDATE SET * "
                    "(there is no source row to copy)"
                )
            return ("update_star",)
        assigns = []
        for item in _split_top_level(body):
            if not item:
                continue
            eq = item.find("=")
            if eq <= 0:
                raise SqlDmlError(f"malformed MERGE SET assignment {item!r}")
            assigns.append((item[:eq].strip(), item[eq + 1 :].strip()))
        if not assigns:
            raise SqlDmlError("MERGE UPDATE SET with an empty assignment list")
        return ("update", assigns)
    m = re.match(r"INSERT\b\s*", t, re.I)
    if m:
        if kind != "not_matched":
            raise SqlDmlError(
                "only WHEN NOT MATCHED (by target) can INSERT"
            )
        body = t[m.end():].strip()
        if body == "*":
            return ("insert_star",)
        mi = re.match(r"\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*$", body, re.I | re.S)
        if not mi:
            raise SqlDmlError(
                "malformed MERGE INSERT (want INSERT * or "
                "INSERT (col, ...) VALUES (expr, ...))"
            )
        cols = [_ident(c) for c in _split_top_level(mi.group(1)) if c]
        exprs = [e for e in _split_top_level(mi.group(2)) if e]
        if not cols or len(cols) != len(exprs):
            raise SqlDmlError(
                f"MERGE INSERT arity mismatch: {len(cols)} column(s) for "
                f"{len(exprs)} expression(s)"
            )
        return ("insert", cols, exprs)
    raise SqlDmlError(
        f"unsupported MERGE action {t[:40]!r} (supported: DELETE / "
        "UPDATE SET * / UPDATE SET col = expr, ... / INSERT * / "
        "INSERT (cols) VALUES (exprs))"
    )


def _parse_merge(stmt: str):
    """Supported MERGE shapes (the warehouse's keyed CDC semantics):

        MERGE INTO t [AS a] USING <view | (subquery)> [AS b]
            ON t.<key> = b.<key>                  (equality on the key)
        WHEN MATCHED [AND <cond>] THEN DELETE
        WHEN MATCHED [AND <cond>] THEN UPDATE SET *
        WHEN MATCHED [AND <cond>] THEN UPDATE SET col = expr, ...
        WHEN NOT MATCHED [AND <cond>] THEN INSERT *
        WHEN NOT MATCHED [AND <cond>] THEN INSERT (cols) VALUES (exprs)
        WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE
        WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET col = ...

    Any number of clauses per side; each source row routes to its
    FIRST matching clause (SQL/Delta semantics), so an unconditional
    clause is only allowed LAST on its side. Conditions and update
    expressions evaluate over the JOINED row (target refs via the
    target alias or unambiguous bare names); NOT MATCHED conditions
    and INSERT expressions see the source row only. Returns a dict
    with ``matched`` / ``not_matched`` ordered clause lists."""
    import re

    m = re.match(r"\s*MERGE\s+INTO\s+(\S+)(?:\s+AS\s+(\w+))?\s+USING\s+",
                 stmt, re.I)
    if not m:
        raise SqlDmlError("malformed MERGE INTO statement")
    table = _ident(m.group(1))
    t_alias = m.group(2) or table
    rest = stmt[m.end():]
    if rest.lstrip().startswith("("):
        # (subquery) [AS alias]
        rest_l = rest.lstrip()
        end = None
        for i, c, depth_i, quoted in _scan_top_level(rest_l):
            if quoted:
                continue
            if c == ")" and depth_i == 0:
                end = i
                break
        if end is None:
            raise SqlDmlError("unbalanced parentheses in MERGE source")
        source = ("subquery", rest_l[1:end])
        rest = rest_l[end + 1 :]
    else:
        ms = re.match(r"(\S+)", rest)
        source = ("view", _ident(ms.group(1)))
        rest = rest[ms.end():]
    on_at = _find_keyword(rest, "ON")
    if on_at < 0:
        raise SqlDmlError("MERGE requires an ON clause")
    alias_part = rest[:on_at].strip()
    s_alias = None
    if alias_part:
        mal = re.fullmatch(r"(?:AS\s+)?(\w+)", alias_part, re.I)
        if not mal:
            raise SqlDmlError(f"unexpected tokens before ON: {alias_part!r}")
        s_alias = mal.group(1)
    rest = rest[on_at + 2 :]
    when_at = _find_keyword(rest, "WHEN")
    if when_at < 0:
        raise SqlDmlError("MERGE requires at least one WHEN clause")
    on_expr = rest[:when_at].strip()
    clauses_text = rest[when_at:]
    # ON must be a bare equality between the two sides' key column
    me = re.fullmatch(
        r"(?:(\w+)\.)?(\w+)\s*=\s*(?:(\w+)\.)?(\w+)", on_expr
    )
    if not me:
        raise SqlDmlError(
            f"MERGE ON must be a single key equality, got {on_expr!r}"
        )
    q1, c1, q2, c2 = me.groups()
    if c1 != c2:
        raise SqlDmlError(
            f"MERGE ON must equate the same key column on both sides "
            f"(got {c1!r} = {c2!r})"
        )
    for q in (q1, q2):
        if q is not None and q not in (t_alias, s_alias, table, source[1]):
            raise SqlDmlError(f"unknown qualifier {q!r} in MERGE ON")
    key = c1
    # WHEN clauses — statement order matters: SQL MERGE routes each
    # row to its FIRST matching clause, so an unconditional clause
    # anywhere but last on its side would make every later clause on
    # that side dead (Delta's rule)
    starts = _merge_clause_starts(clauses_text)
    if not starts or clauses_text[: starts[0]].strip():
        raise SqlDmlError(
            "unsupported MERGE clause at: "
            f"{clauses_text[:60]!r} (want WHEN [NOT] MATCHED ...)"
        )
    bounds = starts + [len(clauses_text)]
    matched: list = []
    not_matched: list = []
    nmbs: list = []  # WHEN NOT MATCHED BY SOURCE (target-only rows)
    for a, b in zip(bounds, bounds[1:]):
        clause = clauses_text[a:b].strip()
        mm = re.match(
            r"WHEN\s+(NOT\s+)?MATCHED(\s+BY\s+SOURCE)?\b\s*",
            clause,
            re.I | re.S,
        )
        is_not = bool(mm.group(1))
        by_source = bool(mm.group(2))
        if by_source and not is_not:
            raise SqlDmlError(
                "WHEN MATCHED BY SOURCE is not a MERGE clause (did you "
                "mean WHEN NOT MATCHED BY SOURCE?)"
            )
        kind = "nmbs" if (is_not and by_source) else (
            "not_matched" if is_not else "matched"
        )
        rest = clause[mm.end():]
        t_at = _find_then_action(rest)
        if t_at < 0:
            raise SqlDmlError(
                f"MERGE clause missing THEN <action>: {clause[:60]!r}"
            )
        head, action_txt = rest[:t_at].strip(), rest[t_at + 4 :].strip()
        cond = None
        if head:
            ma = re.match(r"AND\b\s*", head, re.I | re.S)
            if not ma:
                raise SqlDmlError(
                    "unexpected tokens before THEN in MERGE clause: "
                    f"{head[:40]!r}"
                )
            cond = head[ma.end():].strip()
            if not cond:
                raise SqlDmlError("empty AND condition in MERGE clause")
        action = _parse_merge_action(action_txt, kind)
        {"matched": matched, "not_matched": not_matched, "nmbs": nmbs}[
            kind
        ].append((cond, action))
    if not (matched or not_matched or nmbs):
        raise SqlDmlError("MERGE requires at least one WHEN clause")
    for lst, label in (
        (matched, "MATCHED"),
        (not_matched, "NOT MATCHED"),
        (nmbs, "NOT MATCHED BY SOURCE"),
    ):
        for i, (cond, action) in enumerate(lst):
            if cond is None and i < len(lst) - 1:
                raise SqlDmlError(
                    f"WHEN {label} THEN {action[0].split('_')[0].upper()} "
                    "without a condition must be the LAST "
                    f"{label.lower()} clause — each row routes to its "
                    "first matching clause, so an earlier unconditional "
                    f"clause would make every later {label.lower()} "
                    "clause dead; reorder the clauses or add AND "
                    "<condition>"
                )
    return {
        "table": table,
        "source": source,
        "key": key,
        "t_alias": t_alias,
        "s_alias": s_alias,
        "matched": matched,
        "not_matched": not_matched,
        "nmbs": nmbs,
    }


_COND_KEYWORDS = frozenset(
    "and or not null true false is in like rlike between case when then "
    "else end cast as distinct interval div".split()
)


def _scope_merge_cond(
    cond: str,
    t_alias: str,
    s_alias: str | None,
    src_cols: set,
    tgt_cols: set,
    key: str,
    table: str,
) -> str:
    """Rewrite a WHEN MATCHED AND <cond> expression to evaluate over
    the JOINED (source ⋈ target) row — SQL MERGE semantics — instead
    of the source row alone:

    - ``t_alias.col``  -> ``__t_col`` (the target side, joined in by
      the executor under that prefix)
    - ``s_alias.col``  -> ``col`` (the source side)
    - unqualified name -> resolved to whichever side uniquely has it;
      the join key itself stays unqualified (equal on both sides);
      a name present on BOTH sides raises (ambiguous — qualify it)

    String literals pass through untouched; ``name(`` shapes are left
    alone (function calls)."""
    import re

    out = []
    # both quote styles are STRING LITERALS to Spark's parser (double
    # quotes too, under the default conf) — a column name appearing
    # inside either must not be rewritten into a reference
    for idx, part in enumerate(
        re.split(r"('(?:[^']|'')*'|\"(?:[^\"]|\"\")*\")", cond)
    ):
        if idx % 2 == 1:
            out.append(part)
            continue

        def repl(m):
            q, qcol, name = m.group(1), m.group(2), m.group(3)
            if q is not None:  # qualified reference
                if q == t_alias or q == table:
                    if qcol not in tgt_cols:
                        raise SqlDmlError(
                            f"MERGE condition references {q}.{qcol} but "
                            f"{table!r} has no column {qcol!r}"
                        )
                    return qcol if qcol == key else f"__t_{qcol}"
                if s_alias and q == s_alias:
                    return qcol
                raise SqlDmlError(
                    f"unknown qualifier {q!r} in MERGE condition "
                    f"(expected {t_alias!r}"
                    + (f" or {s_alias!r}" if s_alias else "")
                    + ")"
                )
            if name.lower() in _COND_KEYWORDS or name == key:
                return name
            in_s, in_t = name in src_cols, name in tgt_cols
            if in_s and in_t:
                raise SqlDmlError(
                    f"column {name!r} exists on both MERGE sides — "
                    f"qualify it ({t_alias}.{name} for the target row, "
                    + (
                        f"{s_alias}.{name}"
                        if s_alias
                        else "the bare source name"
                    )
                    + " for the source row)"
                )
            if in_t:
                return f"__t_{name}"
            return name  # source column, or a no-arg SQL builtin

        # ONE scan: qualified refs and bare identifiers resolve in the
        # same pass, so a resolved qualifier's output is never re-read
        # as a bare (possibly ambiguous) name
        part = re.sub(
            r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)"
            r"|\b([A-Za-z_]\w*)\b(?!\s*[.(])",
            repl,
            part,
        )
        out.append(part)
    return "".join(out)


def _parse_insert(stmt: str):
    """``INSERT INTO <table> [(col[, ...])] (VALUES ...|SELECT ...|
    WITH ...)`` -> (table, cols|None, body). A parenthesized query
    where the column list would sit is treated as the body — the
    column-list grammar is tried FIRST, so a column literally named
    ``values``/``select``/``with`` (INSERT INTO t (values, x) VALUES
    ...) still parses as a column list when a body follows the close
    paren. The column-list branch only WINS when every comma-separated
    piece is a single plain/quoted identifier: a parenthesized
    WITH-CTE body whose inner ``)`` precedes SELECT/VALUES (INSERT
    INTO t (WITH a AS (SELECT 1 AS x) SELECT x FROM a)) would
    otherwise be split mid-CTE into a bogus column list (the [^)]*
    group stops at the CTE's close paren), so non-identifier pieces
    fall through to the parenthesized-body grammar below."""
    import re

    def _is_plain_ident(piece: str) -> bool:
        piece = piece.strip()
        return bool(
            re.fullmatch(r"[A-Za-z_]\w*|`[^`]+`|\"[^\"]+\"", piece)
        )

    # the table token must not swallow an adjacent column list —
    # INSERT INTO t(id,v) VALUES ... is the standard spelling, and a
    # greedy \S+ would capture 't(id,v)' as the table name (the
    # optional group never forces a backtrack)
    m = re.match(
        r"\s*INSERT\s+INTO\s+(`[^`]+`|\"[^\"]+\"|[^\s(]+)\s*"
        r"(?:\(([^)]*)\)\s*)?"
        r"((?:VALUES|SELECT|WITH)\b.*)$",
        stmt,
        re.I | re.S,
    )
    # the column list splits QUOTE-AWARE (_split_top_level, ADVICE
    # r12): a bare .split(",") would cut a quoted identifier holding a
    # comma ("a,b") mid-name, fail the ident guard, and bounce a valid
    # statement to the parenthesized-body grammar.
    if m and (
        m.group(2) is None
        or all(
            _is_plain_ident(c)
            for c in _split_top_level(m.group(2))
            if c.strip()
        )
    ):
        table, cols, body = _ident(m.group(1)), None, m.group(3)
        if m.group(2) is not None:
            cols = [
                _ident(c) for c in _split_top_level(m.group(2)) if c.strip()
            ]
            if not cols:
                raise SqlDmlError("empty column list in INSERT")
        return table, cols, body
    # a parenthesized BODY (INSERT INTO t (SELECT ...)): Spark SQL
    # accepts the query with its parentheses verbatim, so no
    # balance-matching is needed here
    m = re.match(
        r"\s*INSERT\s+INTO\s+(\S+)\s*"
        r"(\(\s*(?:SELECT|VALUES|WITH)\b.*)$",
        stmt,
        re.I | re.S,
    )
    if m:
        return _ident(m.group(1)), None, m.group(2)
    raise SqlDmlError(
        "malformed INSERT (want INSERT INTO <table> [(cols)] "
        "VALUES ... | SELECT ...)"
    )


def _parse_create_mv(stmt: str):
    """Parse the restricted materialized-view DDL::

        CREATE MATERIALIZED VIEW v AS
          SELECT g1, g2, COUNT(*) AS n_rows,
                 SUM(x) AS total_x | MIN(y) AS lo, MAX(y) AS hi
          FROM source GROUP BY g1, g2

    Returns (view, source, group_keys, sums, minmax) where exactly one
    of sums/minmax is non-empty — the two maintenance lanes
    (plans/ops.py create_rollup_view / create_minmax_view) carry
    different state, so a view is one or the other; mixing SUM with
    MIN/MAX raises with that explanation."""
    import re

    m = re.match(
        r"\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\S+)\s+AS\s+(.*)$",
        stmt,
        re.I | re.S,
    )
    if not m:
        raise SqlDmlError("malformed CREATE MATERIALIZED VIEW statement")
    view, body = _ident(m.group(1)), m.group(2).strip()
    ms = re.match(r"SELECT\s+", body, re.I)
    if not ms:
        raise SqlDmlError("CREATE MATERIALIZED VIEW body must be a SELECT")
    i_from = _find_keyword(body, "FROM")
    if i_from < 0:
        raise SqlDmlError("CREATE MATERIALIZED VIEW: missing FROM")
    select_list = body[ms.end() : i_from]
    tail = body[i_from + len("FROM") :].strip()
    mt = re.match(r"(\S+)\s+GROUP\s+BY\s+(.*)$", tail, re.I | re.S)
    if not mt:
        raise SqlDmlError(
            "CREATE MATERIALIZED VIEW: expected FROM <table> GROUP BY "
            "<cols> (incrementally-maintained views are grouped rollups)"
        )
    source = _ident(mt.group(1))
    group_keys = [_ident(t) for t in _split_top_level(mt.group(2))]
    sums: dict[str, str] = {}
    minmax: dict[str, tuple[str, str]] = {}
    seen_keys: list[str] = []
    for item in _split_top_level(select_list):
        ma = re.match(
            r"(COUNT\s*\(\s*\*\s*\)|(SUM|MIN|MAX)\s*\(\s*([^)]+?)\s*\))"
            r"\s+AS\s+(\S+)\s*$",
            item,
            re.I,
        )
        if ma:
            alias = _ident(ma.group(4))
            fn = (ma.group(2) or "COUNT").upper()
            if fn == "COUNT":
                if alias != "n_rows":
                    raise SqlDmlError(
                        "COUNT(*) must be aliased AS n_rows — the "
                        "maintenance lanes name the maintained count "
                        "column n_rows"
                    )
            elif fn == "SUM":
                sums[alias] = _ident(ma.group(3))
            else:
                minmax[alias] = (_ident(ma.group(3)), fn.lower())
        else:
            seen_keys.append(_ident(item))
    if sums and minmax:
        raise SqlDmlError(
            "a materialized view is either a SUM/COUNT rollup "
            "(delta-maintained) or a MIN/MAX view (partials-maintained) "
            "— create two views instead of mixing aggregate classes"
        )
    if not sums and not minmax:
        raise SqlDmlError(
            "CREATE MATERIALIZED VIEW needs at least one SUM(col) or "
            "MIN/MAX(col) AS alias item"
        )
    if seen_keys != group_keys:
        raise SqlDmlError(
            f"non-aggregate SELECT items {seen_keys!r} must equal the "
            f"GROUP BY list {group_keys!r}, in order"
        )
    return view, source, group_keys, sums, minmax


def _table_history(wh, table: str) -> list[dict]:
    """Retained commits newest-first (the Delta DESCRIBE HISTORY
    shape): version, ISO timestamp, operation, dataChange. Manifest
    commits carry their publish stamp + snapshot name; delta commits
    their commitInfo (mtime fallback for foreign commits)."""
    import datetime
    import json as _json
    import os as _os

    def iso(ts: float | None) -> str | None:
        if ts is None:
            return None
        return datetime.datetime.fromtimestamp(
            ts, tz=datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")

    out: list[dict] = []
    if hasattr(wh, "_log_dir"):  # delta protocol
        from .plans.delta import _LOG_FMT

        ldir = wh._log_dir(table)
        for v in wh._versions_on_disk(table):
            path = _os.path.join(ldir, _LOG_FMT.format(v))
            ts, op, dc = None, None, False
            try:
                with open(path) as fh:
                    for line in fh:
                        if not line.strip():
                            continue
                        a = _json.loads(line)
                        ci = a.get("commitInfo")
                        if ci and ts is None:
                            t = ci.get("timestamp")
                            ts = t / 1000.0 if t is not None else None
                            op = ci.get("operation")
                        if ("add" in a and a["add"].get("dataChange", True)) or (
                            "remove" in a
                            and a["remove"].get("dataChange", True)
                        ):
                            dc = True
            except OSError:
                continue
            if ts is None:
                try:
                    ts = _os.path.getmtime(path)
                except OSError:
                    pass
            out.append(
                {
                    "version": v,
                    "timestamp": iso(ts),
                    "operation": op,
                    "data_change": dc,
                }
            )
    else:
        for v, man in wh._commits(table):
            out.append(
                {
                    "version": v,
                    "timestamp": iso(man.get("committed_at")),
                    "operation": man.get("snapshot"),
                    "data_change": bool(man.get("data_change", True)),
                }
            )
    out.sort(key=lambda r: -r["version"])
    return out


def _scope_source_cond(
    expr: str, t_alias: str, s_alias: str | None, src_cols: set,
    key: str, table: str, what: str,
) -> str:
    """Scope a NOT-MATCHED condition / INSERT expression: it sees the
    SOURCE row only (there is no target row for an unmatched source
    row). Target-qualified references raise a clear error; source
    qualifiers strip; bare names must be source columns or builtins."""
    import re

    if re.search(rf"\b{re.escape(t_alias)}\s*\.", expr) or (
        t_alias != table and re.search(rf"\b{re.escape(table)}\s*\.", expr)
    ):
        raise SqlDmlError(
            f"{what} cannot reference the target row "
            f"({t_alias!r}.<col>) — an unmatched source row has none"
        )
    return _scope_merge_cond(
        expr, t_alias, s_alias, src_cols, set(), key, table
    )


def _scope_target_cond(
    expr: str, t_alias: str, s_alias: str | None, tgt_cols: set,
    key: str, table: str, what: str,
) -> str:
    """Scope a NOT-MATCHED-BY-SOURCE condition / assignment: it sees
    the TARGET row only (these are target rows WITHOUT a source
    match). Source-qualified references raise a clear error; target
    refs resolve to the executor's ``__t_`` frame."""
    import re

    if s_alias and re.search(rf"\b{re.escape(s_alias)}\s*\.", expr):
        raise SqlDmlError(
            f"{what} cannot reference the source row "
            f"({s_alias!r}.<col>) — a NOT MATCHED BY SOURCE row has none"
        )
    return _scope_merge_cond(expr, t_alias, None, set(), tgt_cols, key, table)


def _execute_merge_generic(wh, p: dict, src) -> dict:
    """Clause-routing MERGE executor for the shapes beyond the legacy
    fast path: column-level ``UPDATE SET col = expr``, conditional
    update/insert clauses, multiple WHEN branches per side, and
    ``INSERT (cols) VALUES (exprs)``.

    Each MATCHED source row is routed to its first matching clause by
    a single CASE over the source⋈target join (target columns joined
    in under the ``__t_`` prefix; exactly one target row per key on a
    keyed table, so the inner join IS the matched set); UPDATE clauses
    emit full replacement row images (assigned columns evaluated over
    the joined row, unassigned columns carried from the target),
    DELETE clauses emit keys. NOT-MATCHED rows route the same way over
    the anti-join; INSERT clauses emit images with omitted columns
    NULL-padded. Images and delete keys then ride the SAME
    ``merge_bucketed`` keyed upsert as every other write — CAS,
    constraints, epochs, and DV-awareness are carried unchanged.

    NOT MATCHED BY SOURCE clauses (Delta's reverse side — full-sync
    semantics) route TARGET rows without a source match the same way:
    an anti-join of the target against the batch's keys, conditions
    and assignments over the target row only (source references are
    rejected — there is no source row).

    Scale: the matched join and the not-matched anti-join read the
    target BUCKET-PRUNED to the batch's key buckets (a source key can
    only match inside the bucket it routes to — the same b/N contract
    merge_bucketed itself honors), so a fixed batch's statement cost
    tracks the batch, not the table; the target is never broadcast
    (100 TB side); routing and images are pure expressions. Only a
    NOT MATCHED BY SOURCE clause reads the full target — its
    semantics require examining every target row."""
    from pyspark.sql import functions as F

    key = p["key"]
    table = p["table"]
    tgt = wh.read(table)
    tf = {f.name: f.dataType for f in tgt.schema.fields}
    src_cols, tgt_cols = set(src.columns), set(tgt.columns)
    t_alias, s_alias = p["t_alias"], p["s_alias"]
    if key not in src_cols:
        raise SqlDmlError(f"MERGE source must carry the key {key!r}")
    # src is consumed several times below (bucket routing + joins):
    # cut its lineage once
    src = src.localCheckpoint(eager=False)
    # bucket-pruned target read for the matched/not-matched sides: a
    # source key can only collide inside the bucket it routes to, so
    # only those buckets' files are listed (driver-side bucket-id set
    # bounded by the batch)
    tgt_matchable = tgt
    info = wh.routing_info(table) or {}
    if (
        (p["matched"] or p["not_matched"])
        and info.get("bucket_key") == key
        and info.get("n_buckets")
        and hasattr(wh, "read_buckets")
    ):
        from .operators.merge import bucket_of

        n_b = int(info["n_buckets"])
        bids = sorted(
            r.b
            for r in src.select(bucket_of(F.col(key), n_b).alias("b"))
            .distinct()
            .collect()
        )
        tgt_matchable = wh.read_buckets(table, bids)

    def scope_joined(expr: str) -> str:
        return _scope_merge_cond(
            expr, t_alias, s_alias, src_cols, tgt_cols, key, table
        )

    def assign_target_col(raw: str) -> str:
        parts = raw.split(".")
        if len(parts) == 2:
            q, c = _ident(parts[0]), _ident(parts[1])
            if q not in (t_alias, table):
                raise SqlDmlError(
                    f"MERGE SET target must be a target column, got {raw!r}"
                )
            return c
        if len(parts) != 1:
            raise SqlDmlError(f"malformed MERGE SET target {raw!r}")
        return _ident(raw)

    images = []
    delete_keys = None
    if p["matched"]:
        # validate + precompute per-clause column expressions first, so a
        # malformed statement fails before any job runs
        upd_idx = [
            i for i, (_, a) in enumerate(p["matched"]) if a[0] != "delete"
        ]
        del_idx = [
            i for i, (_, a) in enumerate(p["matched"]) if a[0] == "delete"
        ]
        per_clause: dict[int, dict] = {}
        for i in upd_idx:
            a = p["matched"][i][1]
            if a[0] == "update_star":
                missing = sorted(c for c in tgt_cols if c not in src_cols)
                if missing:
                    raise SqlDmlError(
                        f"MERGE UPDATE SET * needs source column(s) "
                        f"{missing} to build the replacement row"
                    )
                per_clause[i] = {
                    c: F.col(c).cast(tf[c]) for c in tgt.columns
                }
            else:
                assigns: dict = {}
                for raw, expr in a[1]:
                    c = assign_target_col(raw)
                    if c not in tgt_cols:
                        raise SqlDmlError(
                            f"MERGE SET column {c!r} not in {table!r}"
                        )
                    if c == key:
                        raise SqlDmlError(
                            f"MERGE cannot SET the bucket key {key!r} "
                            "(re-keying = DELETE + INSERT)"
                        )
                    if c in assigns:
                        raise SqlDmlError(f"duplicate MERGE SET column {c!r}")
                    assigns[c] = F.expr(scope_joined(expr)).cast(tf[c])
                per_clause[i] = {
                    c: (
                        assigns[c]
                        if c in assigns
                        else (F.col(key) if c == key else F.col(f"__t_{c}"))
                    )
                    for c in tgt.columns
                }
        route = None
        for i, (cond, _a) in enumerate(p["matched"]):
            c = (
                F.expr(scope_joined(cond))
                if cond is not None
                else F.lit(True)
            )
            route = (
                F.when(c, F.lit(i))
                if route is None
                else route.when(c, F.lit(i))
            )
        tgt_pref = tgt_matchable.select(
            key, *[F.col(c).alias(f"__t_{c}") for c in tgt.columns if c != key]
        )
        routed = (
            src.join(tgt_pref, on=key, how="inner")
            .withColumn("__clause", route.otherwise(F.lit(-1)))
            .localCheckpoint(eager=False)  # consumed per branch below
        )
        if del_idx:
            delete_keys = routed.filter(
                F.col("__clause").isin(del_idx)
            ).select(key)
        if upd_idx:
            img = []
            for c in tgt.columns:
                e = None
                for i in upd_idx:
                    v = per_clause[i][c]
                    e = (
                        F.when(F.col("__clause") == i, v)
                        if e is None
                        else e.when(F.col("__clause") == i, v)
                    )
                img.append(e.alias(c))
            images.append(
                routed.filter(
                    F.col("__clause").isin(upd_idx)
                ).select(*img)
            )
    if p["not_matched"]:
        per_ins: dict[int, dict] = {}
        for i, (_c, a) in enumerate(p["not_matched"]):
            if a[0] == "insert_star":
                missing = sorted(c for c in tgt_cols if c not in src_cols)
                if missing:
                    raise SqlDmlError(
                        f"MERGE INSERT * needs source column(s) {missing}"
                    )
                per_ins[i] = {c: F.col(c).cast(tf[c]) for c in tgt.columns}
            else:
                cols, exprs = a[1], a[2]
                unknown = sorted(c for c in cols if c not in tgt_cols)
                if unknown:
                    raise SqlDmlError(
                        f"MERGE INSERT column(s) {unknown} not in {table!r}"
                    )
                if len(set(cols)) != len(cols):
                    raise SqlDmlError(
                        f"duplicate column in MERGE INSERT list: {cols}"
                    )
                if key not in cols:
                    raise SqlDmlError(
                        f"MERGE INSERT must supply the bucket key {key!r}"
                    )
                by_col = {
                    c: F.expr(
                        _scope_source_cond(
                            e, t_alias, s_alias, src_cols, key, table,
                            "MERGE INSERT expression",
                        )
                    ).cast(tf[c])
                    for c, e in zip(cols, exprs)
                }
                per_ins[i] = {
                    c: by_col.get(c, F.lit(None).cast(tf[c]))
                    for c in tgt.columns
                }
        route = None
        for i, (cond, _a) in enumerate(p["not_matched"]):
            c = (
                F.expr(
                    _scope_source_cond(
                        cond, t_alias, s_alias, src_cols, key, table,
                        "MERGE NOT MATCHED condition",
                    )
                )
                if cond is not None
                else F.lit(True)
            )
            route = (
                F.when(c, F.lit(i))
                if route is None
                else route.when(c, F.lit(i))
            )
        # target key set: column-pruned AND bucket-pruned (keys outside
        # the batch's buckets cannot exist in the table for these src
        # keys); deliberately NOT broadcast-hinted; AQE picks strategy
        unmatched = src.join(
            tgt_matchable.select(key).distinct(), on=key, how="left_anti"
        )
        routed_n = unmatched.withColumn("__clause", route.otherwise(F.lit(-1)))
        img = []
        for c in tgt.columns:
            e = None
            for i in range(len(p["not_matched"])):
                v = per_ins[i][c]
                e = (
                    F.when(F.col("__clause") == i, v)
                    if e is None
                    else e.when(F.col("__clause") == i, v)
                )
            img.append(e.alias(c))
        images.append(
            routed_n.filter(F.col("__clause") >= 0).select(*img)
        )
    if p["nmbs"]:
        # target rows WITHOUT a source match: anti-join the (column-
        # pruned, __t_-prefixed) target against the batch's keys —
        # the batch side is small, the target streams
        def scope_nmbs(expr: str, what: str) -> str:
            return _scope_target_cond(
                expr, t_alias, s_alias, tgt_cols, key, table, what
            )

        per_nmbs: dict[int, dict] = {}
        del_idx_n = [
            i for i, (_, a) in enumerate(p["nmbs"]) if a[0] == "delete"
        ]
        upd_idx_n = [
            i for i, (_, a) in enumerate(p["nmbs"]) if a[0] == "update"
        ]
        for i in upd_idx_n:
            assigns: dict = {}
            for raw, expr in p["nmbs"][i][1][1]:
                c = assign_target_col(raw)
                if c not in tgt_cols:
                    raise SqlDmlError(
                        f"MERGE SET column {c!r} not in {table!r}"
                    )
                if c == key:
                    raise SqlDmlError(
                        f"MERGE cannot SET the bucket key {key!r} "
                        "(re-keying = DELETE + INSERT)"
                    )
                if c in assigns:
                    raise SqlDmlError(f"duplicate MERGE SET column {c!r}")
                assigns[c] = F.expr(
                    scope_nmbs(expr, "MERGE NOT MATCHED BY SOURCE SET")
                ).cast(tf[c])
            per_nmbs[i] = {
                c: (
                    assigns[c]
                    if c in assigns
                    else (F.col(key) if c == key else F.col(f"__t_{c}"))
                )
                for c in tgt.columns
            }
        route = None
        for i, (cond, _a) in enumerate(p["nmbs"]):
            c = (
                F.expr(
                    scope_nmbs(cond, "MERGE NOT MATCHED BY SOURCE condition")
                )
                if cond is not None
                else F.lit(True)
            )
            route = (
                F.when(c, F.lit(i))
                if route is None
                else route.when(c, F.lit(i))
            )
        tgt_only = (
            tgt.select(
                key,
                *[
                    F.col(c).alias(f"__t_{c}")
                    for c in tgt.columns
                    if c != key
                ],
            )
            .join(src.select(key).distinct(), on=key, how="left_anti")
            .withColumn("__clause", route.otherwise(F.lit(-1)))
            .localCheckpoint(eager=False)
        )
        if del_idx_n:
            dk = tgt_only.filter(F.col("__clause").isin(del_idx_n)).select(key)
            delete_keys = (
                dk if delete_keys is None else delete_keys.unionByName(dk)
            )
        if upd_idx_n:
            img = []
            for c in tgt.columns:
                e = None
                for i in upd_idx_n:
                    v = per_nmbs[i][c]
                    e = (
                        F.when(F.col("__clause") == i, v)
                        if e is None
                        else e.when(F.col("__clause") == i, v)
                    )
                img.append(e.alias(c))
            images.append(
                tgt_only.filter(F.col("__clause").isin(upd_idx_n)).select(*img)
            )
    upserts = None
    for im in images:
        upserts = im if upserts is None else upserts.unionByName(im)
    if upserts is None:
        # delete-only statement: the empty upsert frame must carry the
        # TARGET's schema (the source may be a bare key feed)
        upserts = tgt.limit(0)
    if delete_keys is not None:
        # in-batch duplicate keys routed to both a DELETE and an
        # UPDATE clause resolve delete-wins, matching the legacy path
        upserts = upserts.join(delete_keys.distinct(), on=key, how="left_anti")
    affected = wh.merge_bucketed(
        table, upserts, snapshot="sql-merge", delete_keys=delete_keys
    )
    return {"operation": "MERGE", "buckets": affected}


def execute_dml(wh, stmt: str) -> dict:
    """Execute one DML statement against a warehouse (either commit
    protocol). Returns {"operation": ..., "rows"/"buckets": ...};
    raises SqlDmlError for unsupported shapes. Semantics are EXACTLY
    the Python API's — delete_where / update_where / merge_bucketed
    (with delete_keys for the DELETE clause) do the work, so every
    guarantee (CAS publish, pruned buckets, DV policy, epochs) carries
    over verbatim."""
    import re

    from pyspark.sql import functions as F

    def _guard_not_mv(table: str, op: str) -> None:
        # statement-side write to a MAINTAINED table would silently
        # break maintained == rebuilt until the next refresh clobbers
        # it — refuse with the maintenance route. (The Python API
        # stays unrestricted: refresh itself writes these tables.)
        try:
            props = wh.table_properties(table)
        except Exception:  # noqa: BLE001 - unknown table: branch handles it
            return
        if "mv.source" in props or "mv.parent" in props:
            raise SqlDmlError(
                f"{table!r} is a materialized view (or its partials "
                f"sidecar) — {op} would desynchronize it from its "
                "source; use REFRESH MATERIALIZED VIEW, or write to "
                "the SOURCE table and refresh"
            )
        if "index.kind" in props:
            raise SqlDmlError(
                f"{table!r} is a maintained {props['index.kind']} index "
                f"— {op} would break maintained == rebuilt; write to "
                f"the SOURCE table ({props.get('index.source')!r}) and "
                "ADVANCE INDEX (or let auto-maintenance run)"
            )

    head = re.match(r"\s*(\w+)", stmt)
    verb = (head.group(1) if head else "").upper()
    if verb == "DELETE":
        table, cond = _parse_delete(stmt)
        _guard_not_mv(table, "DELETE")
        n = wh.delete_where(table, cond)
        return {"operation": "DELETE", "rows": n}
    if verb == "UPDATE":
        table, assigns, cond = _parse_update(stmt)
        _guard_not_mv(table, "UPDATE")
        n = wh.update_where(table, assigns, cond)
        return {"operation": "UPDATE", "rows": n}
    if verb == "MERGE":
        p = _parse_merge(stmt)
        spark = wh.spark
        kind, ref = p["source"]
        src = spark.sql(ref) if kind == "subquery" else spark.table(ref)
        info = wh.routing_info(p["table"])
        if info is None:
            raise SqlDmlError(f"unknown warehouse table {p['table']!r}")
        _guard_not_mv(p["table"], "MERGE")
        if info.get("bucket_key") != p["key"]:
            raise SqlDmlError(
                f"MERGE ON key {p['key']!r} must be the table's bucket "
                f"key ({info.get('bucket_key')!r}) — the keyed upsert "
                "routes by it"
            )
        key = p["key"]
        matched_cl, not_matched_cl = p["matched"], p["not_matched"]
        # the pre-r11 shapes (at most one delete [any condition], one
        # UNCONDITIONAL UPDATE SET *, one UNCONDITIONAL INSERT *) keep
        # their join-minimal executor; everything else — column-level
        # SET, conditional update/insert, multi-branch — routes through
        # the generic clause-routing path below
        legacy = (
            all(
                a[0] == "delete" or (a[0] == "update_star" and c is None)
                for c, a in matched_cl
            )
            and sum(1 for _, a in matched_cl if a[0] == "delete") <= 1
            and sum(1 for _, a in matched_cl if a[0] == "update_star") <= 1
            and all(
                a[0] == "insert_star" and c is None for c, a in not_matched_cl
            )
            and len(not_matched_cl) <= 1
            and not p["nmbs"]
        )
        if not legacy:
            return _execute_merge_generic(wh, p, src)
        has_delete = any(a[0] == "delete" for _, a in matched_cl)
        delete_cond_txt = next(
            (c for c, a in matched_cl if a[0] == "delete"), None
        )
        has_update = any(a[0] == "update_star" for _, a in matched_cl)
        has_insert = bool(not_matched_cl)
        p = dict(
            p,
            delete=has_delete,
            delete_cond=delete_cond_txt,
            update=has_update,
            insert=has_insert,
        )
        delete_keys = None
        upserts = src
        existing = None
        tgt = None
        if p["delete"] or not (p["update"] and p["insert"]):
            # target key set: a column-pruned scan, deliberately NOT
            # broadcast-hinted — the TARGET is the big side at scale
            # (broadcasting a 100 TB table's distinct keys kills the
            # statement); AQE picks the strategy, and bucketed layouts
            # co-locate the join
            tgt = wh.read(p["table"])
            existing = tgt.select(key).distinct()
        if p["delete"]:
            # SQL MERGE routes each source row to its first matching
            # WHEN clause: DELETE consumes only MATCHED rows passing
            # its condition; matched rows failing it fall through to
            # UPDATE, and NOT-matched rows fall through to INSERT —
            # they must never be swallowed by the delete branch
            if p["delete_cond"] is not None:
                # the condition evaluates over the JOINED row: target-
                # qualified (and unambiguous target-only) references
                # read the target's current values, source references
                # the source row — _scope_merge_cond resolves each
                cond_txt = _scope_merge_cond(
                    p["delete_cond"],
                    p["t_alias"],
                    p["s_alias"],
                    set(src.columns),
                    set(tgt.columns),
                    key,
                    p["table"],
                )
                if "__t_" in cond_txt:
                    # join in only the referenced target columns
                    # (keyed table: exactly one target row per key, so
                    # the inner join IS the matched set); column-pruned
                    # scan, big-side rules as above
                    refs = [
                        c for c in tgt.columns if f"__t_{c}" in cond_txt
                    ]
                    tgt_pref = tgt.select(
                        key,
                        *[F.col(c).alias(f"__t_{c}") for c in refs],
                    )
                    matched = src.join(tgt_pref, on=key, how="inner")
                else:
                    matched = src.join(existing, on=key, how="left_semi")
                # NULL condition = not deleted (falls through), per
                # SQL's three-valued WHEN MATCHED AND <cond>
                matched = matched.filter(F.expr(cond_txt))
            else:
                matched = src.join(existing, on=key, how="left_semi")
            delete_keys = matched.select(key)
            upserts = upserts.join(
                delete_keys.distinct(), on=key, how="left_anti"
            )
        if p["update"] and not p["insert"]:
            upserts = upserts.join(existing, on=key, how="left_semi")
        elif p["insert"] and not p["update"]:
            upserts = upserts.join(existing, on=key, how="left_anti")
        elif not p["update"] and not p["insert"]:
            # delete-only statement: the empty upsert frame must carry
            # the TARGET's schema (the source may be a bare key feed)
            upserts = tgt.limit(0)
        affected = wh.merge_bucketed(
            p["table"],
            upserts,
            snapshot="sql-merge",
            delete_keys=delete_keys,
        )
        return {"operation": "MERGE", "buckets": affected}
    if verb == "ALTER":
        from .plans.constraints import add_constraint, drop_constraint

        m = re.match(
            r"\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+CONSTRAINT\s+(\S+)\s+"
            r"CHECK\s*\((.+)\)\s*$",
            stmt,
            re.I | re.S,
        )
        if m:
            table, name = _ident(m.group(1)), _ident(m.group(2))
            add_constraint(wh, table, name, m.group(3).strip())
            return {
                "operation": "ADD CONSTRAINT",
                "table": table,
                "name": name,
            }
        m = re.match(
            r"\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+CONSTRAINT"
            r"(\s+IF\s+EXISTS)?\s+(\S+)\s*$",
            stmt,
            re.I,
        )
        if m:
            table, name = _ident(m.group(1)), _ident(m.group(3))
            dropped = drop_constraint(
                wh, table, name, if_exists=bool(m.group(2))
            )
            return {
                "operation": "DROP CONSTRAINT",
                "table": table,
                "name": name,
                "dropped": dropped,
            }
        raise SqlDmlError(
            "malformed ALTER TABLE (supported: ADD CONSTRAINT <name> "
            "CHECK (<expr>), DROP CONSTRAINT [IF EXISTS] <name>)"
        )
    if verb == "SHOW":
        if not re.match(r"\s*SHOW\s+TABLES\s*$", stmt, re.I):
            raise SqlDmlError("malformed SHOW (want SHOW TABLES)")
        return {"operation": "SHOW TABLES", "tables": sorted(wh.tables())}
    if verb in ("DESCRIBE", "DESC"):
        md = re.match(r"\s*DESC(?:RIBE)?\s+DETAIL\s+(\S+)\s*$", stmt, re.I)
        if md:
            # Delta SQL: DESCRIBE DETAIL t — the table-health shape the
            # CLI --stats probe prints (version, live files, layout,
            # DV load, writer epochs, properties)
            table = _ident(md.group(1))
            info = wh.routing_info(table)
            if info is None:
                raise SqlDmlError(f"unknown warehouse table {table!r}")
            return {
                "operation": "DESCRIBE DETAIL",
                "table": table,
                "version": wh.current_version(table),
                "live_files": wh.live_file_count(table),
                "bucket_key": info.get("bucket_key"),
                "n_buckets": info.get("n_buckets"),
                "dv": wh.dv_stats(table),
                "txn": info.get("txn") or {},
                "properties": wh.table_properties(table),
            }
        mh = re.match(r"\s*DESC(?:RIBE)?\s+HISTORY\s+(\S+)\s*$", stmt, re.I)
        if mh:
            table = _ident(mh.group(1))
            if wh.routing_info(table) is None:
                raise SqlDmlError(f"unknown warehouse table {table!r}")
            return {
                "operation": "DESCRIBE HISTORY",
                "table": table,
                "history": _table_history(wh, table),
            }
        m = re.match(r"\s*DESC(?:RIBE)?\s+(\S+)\s*$", stmt, re.I)
        if not m:
            raise SqlDmlError("malformed DESCRIBE (want DESCRIBE <table>)")
        table = _ident(m.group(1))
        info = wh.routing_info(table)
        if info is None:
            raise SqlDmlError(f"unknown warehouse table {table!r}")
        return {
            "operation": "DESCRIBE",
            "table": table,
            "columns": wh.read(table).dtypes,
            "bucket_key": info.get("bucket_key"),
            "n_buckets": info.get("n_buckets"),
            "version": wh.current_version(table),
        }
    if verb == "INSERT" and re.match(
        r"\s*INSERT\s+OVERWRITE\b", stmt, re.I
    ):
        # full-snapshot replace, keeping the table's bucket layout —
        # the Spark INSERT OVERWRITE idiom mapped onto write()
        # (last-writer-wins by design: state-independent replacement)
        m = re.match(
            r"\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?(\S+)\s+"
            r"((?:\(\s*)?(?:VALUES|SELECT|WITH)\b.*)$",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise SqlDmlError(
                "malformed INSERT OVERWRITE (want INSERT OVERWRITE "
                "[TABLE] <t> SELECT ... | VALUES ...)"
            )
        table = _ident(m.group(1))
        info = wh.routing_info(table)
        if info is None:
            raise SqlDmlError(f"unknown warehouse table {table!r}")
        _guard_not_mv(table, "INSERT OVERWRITE")
        spark = wh.spark
        tgt = wh.read(table)
        src = spark.sql(m.group(2))
        if len(src.columns) != len(tgt.columns):
            raise SqlDmlError(
                f"INSERT OVERWRITE arity mismatch: {len(src.columns)} "
                f"value column(s) for {len(tgt.columns)} target column(s)"
            )
        tf = {f.name: f.dataType for f in tgt.schema.fields}
        rows = (
            src.toDF(*tgt.columns)
            .select(*[F.col(c).cast(tf[c]).alias(c) for c in tgt.columns])
            # materialize ONCE: count + write otherwise evaluate the
            # source query twice, and a non-deterministic body would
            # report a count that diverges from the committed rows
            .localCheckpoint()
        )
        n = rows.count()
        bucket = None
        if info.get("bucket_key") and info.get("n_buckets"):
            bucket = (info["bucket_key"], int(info["n_buckets"]))
        wh.write(table, rows, snapshot="sql-overwrite", bucket=bucket)
        return {"operation": "INSERT OVERWRITE", "rows": n}
    if verb == "INSERT":
        table, cols, body = _parse_insert(stmt)
        spark = wh.spark
        info = wh.routing_info(table)
        if info is None:
            raise SqlDmlError(f"unknown warehouse table {table!r}")
        _guard_not_mv(table, "INSERT")
        src = spark.sql(body)
        tgt = wh.read(table)
        tf = {f.name: f.dataType for f in tgt.schema.fields}
        names = cols if cols is not None else list(tgt.columns)
        if len(src.columns) != len(names):
            raise SqlDmlError(
                f"INSERT arity mismatch: {len(src.columns)} value "
                f"column(s) for {len(names)} target column(s)"
            )
        unknown = sorted(c for c in names if c not in tf)
        if unknown:
            raise SqlDmlError(
                f"INSERT column(s) {unknown} not in {table!r}"
            )
        if len(set(names)) != len(names):
            raise SqlDmlError(
                f"duplicate column in INSERT list: {names}"
            )
        src = src.toDF(*names)
        key = info.get("bucket_key")
        if key and key not in names:
            raise SqlDmlError(
                f"INSERT into {table!r} must supply the bucket key "
                f"{key!r} (rows route by it)"
            )
        # positional values cast to the target types; omitted columns
        # null-padded (SQL INSERT semantics) — CHECK constraints and
        # every other write guarantee ride the underlying API
        rows = tgt.limit(0).unionByName(
            src.select(
                *[
                    (
                        F.col(c).cast(tf[c])
                        if c in names
                        else F.lit(None).cast(tf[c])
                    ).alias(c)
                    for c in tgt.columns
                ]
            )
        )
        # materialize ONCE (same rule as INSERT OVERWRITE): the count
        # and the write must see the same evaluation of the body
        rows = rows.localCheckpoint()
        n = rows.count()
        if key:
            # keyed table: INSERT is the loader's keyed upsert (A17-19
            # delete-by-key + insert), NOT the ANSI pure append —
            # existing rows with matching keys are replaced. The
            # divergence is surfaced in the result's operation string
            # so a standard-SQL caller sees it at the call site; the
            # table has no PK constraint, so in-batch duplicate keys
            # land like any merge batch.
            wh.merge_bucketed(table, rows, snapshot="sql-insert")
            return {"operation": "INSERT (keyed upsert)", "rows": n}
        # unbucketed: append via read-modify-write CAS
        from .plans.pipeline import CommitConflict

        for attempt in range(5):
            base_v, base_df = wh.read_versioned(table)
            try:
                wh.write(
                    table,
                    base_df.unionByName(rows),
                    snapshot=f"sql-insert-{base_v + 1}",
                    expected_version=base_v,
                )
                return {"operation": "INSERT", "rows": n}
            except CommitConflict:
                if attempt == 4:
                    raise
        return {"operation": "INSERT", "rows": n}  # unreachable
    if verb == "CREATE":
        from .plans.ops import create_minmax_view, create_rollup_view

        mi = re.match(
            r"\s*CREATE\s+(NEARDUP|ANN|DECONTAM|BLOOM|IVFPQ)\s+INDEX\s+(\S+)\s+"
            r"ON\s+(\S+)\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)\s*"
            r"(?:OPTIONS\s*\(([^)]*)\)\s*)?$",
            stmt,
            re.I,
        )
        if mi:
            # The maintained-index DDL (round 12): statement-reachable
            # registration of the three index kinds, the CREATE
            # MATERIALIZED VIEW pattern applied to indexes. Column pair
            # is (id, payload): text for neardup/decontam/bloom, the
            # embedding array for ann. OPTIONS keys mirror the Python
            # API's keyword arguments; unknown keys are rejected so a
            # typo can't silently fall back to a default.
            kind = mi.group(1).lower()
            index, table = _ident(mi.group(2)), _ident(mi.group(3))
            id_col, payload = _ident(mi.group(4)), _ident(mi.group(5))
            if wh.routing_info(table) is None:
                raise SqlDmlError(f"unknown warehouse table {table!r}")
            if wh.exists(index):
                raise SqlDmlError(f"table {index!r} already exists")
            opts: dict[str, float] = {}
            for piece in (mi.group(6) or "").split(","):
                piece = piece.strip()
                if not piece:
                    continue
                mkv = re.fullmatch(r"(\w+)\s*=\s*(\d+(?:\.\d+)?)", piece)
                if not mkv:
                    raise SqlDmlError(
                        f"malformed OPTIONS entry {piece!r} (want "
                        "key = number)"
                    )
                val = mkv.group(2)
                opts[mkv.group(1).lower()] = (
                    float(val) if "." in val else int(val)
                )
            allowed = {
                "neardup": {"num_hashes", "band_size", "shingle_n",
                            "n_buckets"},
                "decontam": {"gram_n", "n_buckets"},
                "bloom": {"k", "hex_chars", "n_buckets"},
                "ivfpq": {"n_cells", "m_subs", "n_codes", "refine_iters",
                          "pq_refine_iters", "n_buckets"},
                "ann": {"n_cells", "refine_iters", "n_buckets",
                        "drift_threshold"},
            }[kind]
            unknown = sorted(set(opts) - allowed)
            if unknown:
                raise SqlDmlError(
                    f"unknown OPTIONS {unknown} for a {kind} index "
                    f"(allowed: {sorted(allowed)})"
                )
            snapshot = "sql-create-index"
            if kind == "neardup":
                from .plans.ops import register_neardup_index

                register_neardup_index(
                    wh, index, table, snapshot,
                    id_col=id_col, text_col=payload,
                    num_hashes=int(opts.get("num_hashes", 16)),
                    band_size=int(opts.get("band_size", 4)),
                    shingle_n=int(opts.get("shingle_n", 3)),
                    n_buckets=int(opts.get("n_buckets", 64)),
                )
            elif kind == "decontam":
                from .plans.ops import register_decontam_index

                register_decontam_index(
                    wh, index, table, snapshot,
                    id_col=id_col, text_col=payload,
                    n=int(opts.get("gram_n", 3)),
                    n_buckets=int(opts.get("n_buckets", 64)),
                )
            elif kind == "bloom":
                from .plans.ops import register_bloom_index

                register_bloom_index(
                    wh, index, table, snapshot,
                    id_col=id_col, text_col=payload,
                    k=int(opts.get("k", 3)),
                    hex_chars=int(opts.get("hex_chars", 3)),
                    n_buckets=int(opts.get("n_buckets", 8)),
                )
            elif kind == "ivfpq":
                from .plans.ops import create_ivfpq_index

                create_ivfpq_index(
                    wh, index, None, snapshot,
                    n_cells=int(opts.get("n_cells", 16)),
                    m_subs=int(opts.get("m_subs", 8)),
                    n_codes=int(opts.get("n_codes", 8)),
                    refine_iters=int(opts.get("refine_iters", 0)),
                    pq_refine_iters=int(opts.get("pq_refine_iters", 1)),
                    n_buckets=int(opts.get("n_buckets", 16)),
                    id_col=id_col, vec_col=payload,
                    source=table,
                )
            else:
                from .plans.ops import create_ann_index

                create_ann_index(
                    wh, index, None, snapshot,
                    n_cells=int(opts.get("n_cells", 16)),
                    refine_iters=int(opts.get("refine_iters", 0)),
                    n_buckets=int(opts.get("n_buckets", 16)),
                    id_col=id_col, vec_col=payload,
                    source=table,
                    drift_threshold=opts.get("drift_threshold"),
                )
            return {
                "operation": f"CREATE {kind.upper()} INDEX",
                "index": index,
                "source": table,
                "source_version": wh.current_version(table),
            }
        if re.match(r"\s*CREATE\s+TABLE\b", stmt, re.I):
            m = re.match(
                r"\s*CREATE\s+TABLE\s+(\S+?)\s+"
                r"(?:BUCKETED\s+BY\s*\(\s*(\w+)\s*,\s*(\d+)\s*\)\s+)?"
                r"AS\s+((?:SELECT|WITH|VALUES)\b.*)$",
                stmt,
                re.I | re.S,
            )
            if not m:
                raise SqlDmlError(
                    "malformed CREATE TABLE (want CREATE TABLE <t> "
                    "[BUCKETED BY (key, n)] AS SELECT ...)"
                )
            table = _ident(m.group(1))
            if wh.exists(table):
                raise SqlDmlError(f"table {table!r} already exists")
            df = wh.spark.sql(m.group(4))
            bucket = None
            if m.group(2):
                bkey = _ident(m.group(2))
                if bkey not in df.columns:
                    raise SqlDmlError(
                        f"bucket key {bkey!r} not in the CTAS query's "
                        f"columns {df.columns}"
                    )
                bucket = (bkey, int(m.group(3)))
            wh.write(table, df, snapshot="ctas", bucket=bucket)
            return {
                "operation": "CREATE TABLE",
                "table": table,
                "version": wh.current_version(table),
            }
        mj = re.match(
            r"\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\S+)\s+AS\s+"
            r"SELECT\s+\*\s+FROM\s+(\S+)\s+(?:INNER\s+)?JOIN\s+(\S+)\s+"
            r"ON\s+(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*$",
            stmt,
            re.I | re.S,
        )
        if mj:
            # join-view DDL (round 13): SELECT * FROM fact JOIN dim ON
            # fact.fk = dim.pk — the star-schema view maintained at
            # O(touched buckets) from both sides' change feeds
            # (plans/ops.py create_join_view). The ON sides may come in
            # either order; each qualifier must name one of the two
            # tables.
            from .plans.ops import create_join_view

            view = _ident(mj.group(1))
            fact, dim = _ident(mj.group(2)), _ident(mj.group(3))
            q1, c1, q2, c2 = (
                _ident(mj.group(4)), _ident(mj.group(5)),
                _ident(mj.group(6)), _ident(mj.group(7)),
            )
            if {q1, q2} != {fact, dim}:
                raise SqlDmlError(
                    f"ON clause qualifiers ({q1!r}, {q2!r}) must be the "
                    f"joined tables ({fact!r}, {dim!r})"
                )
            fk = c1 if q1 == fact else c2
            dim_key = c2 if q2 == dim else c1
            out = create_join_view(wh, view, fact, dim, fk=fk, dim_key=dim_key)
            return {
                "operation": "CREATE MATERIALIZED VIEW",
                "view": view,
                "kind": "join",
                **out,
            }
        view, source, keys, sums, minmax = _parse_create_mv(stmt)
        if minmax:
            v_src = create_minmax_view(wh, view, source, keys, minmax)
        else:
            v_src = create_rollup_view(wh, view, source, keys, sums)
        return {
            "operation": "CREATE MATERIALIZED VIEW",
            "view": view,
            "source_version": v_src,
        }
    if verb == "REFRESH":
        from .plans.ops import refresh_view

        m = re.match(
            r"\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\S+?)(\s+FULL)?\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise SqlDmlError("malformed REFRESH MATERIALIZED VIEW statement")
        out = refresh_view(wh, _ident(m.group(1)), full=bool(m.group(2)))
        return {"operation": "REFRESH MATERIALIZED VIEW", **out}
    if verb == "ADVANCE":
        from .plans.ops import advance_index

        m = re.match(r"\s*ADVANCE\s+INDEX\s+(\S+)\s*$", stmt, re.I)
        if not m:
            raise SqlDmlError("malformed ADVANCE (want ADVANCE INDEX <idx>)")
        index = _ident(m.group(1))
        if wh.routing_info(index) is None:
            raise SqlDmlError(f"unknown warehouse table {index!r}")
        if "index.kind" not in wh.table_properties(index):
            raise SqlDmlError(
                f"{index!r} is not a registered index (no index.kind "
                "property — create it with CREATE "
                "NEARDUP|ANN|DECONTAM|BLOOM|IVFPQ "
                "INDEX)"
            )
        out = advance_index(wh, index)
        return {"operation": "ADVANCE INDEX", "index": index, **out}
    if verb == "DROP":
        mi = re.match(r"\s*DROP\s+INDEX\s+(\S+)\s*$", stmt, re.I)
        if mi:
            index = _ident(mi.group(1))
            props = wh.table_properties(index)
            if "index.kind" not in props:
                raise SqlDmlError(
                    f"{index!r} is not a registered index — refusing to "
                    "drop (use the warehouse drop API for plain tables)"
                )
            wh.drop(index)
            return {"operation": "DROP INDEX", "index": index}
        m = re.match(
            r"\s*DROP\s+MATERIALIZED\s+VIEW\s+(\S+)\s*$", stmt, re.I
        )
        if not m:
            raise SqlDmlError("malformed DROP MATERIALIZED VIEW statement")
        view = _ident(m.group(1))
        props = wh.table_properties(view)
        if "mv.source" not in props or "mv.parent" in props:
            raise SqlDmlError(
                f"{view!r} is not a materialized view — refusing to drop "
                "(use the warehouse drop API for plain tables)"
            )
        wh.drop(view)
        # a minmax view's partials sidecar — and a join view's pending
        # sidecar — die with their parent
        from .plans.ops import _jv_pending_table, _minmax_partials_table

        for pt in (_minmax_partials_table(view), _jv_pending_table(view)):
            if (
                wh.exists(pt)
                and wh.table_properties(pt).get("mv.parent") == view
            ):
                wh.drop(pt)
        return {"operation": "DROP MATERIALIZED VIEW", "view": view}
    if verb == "RESTORE":
        # Delta SQL: RESTORE TABLE t TO VERSION AS OF n — publishes the
        # retained commit's state as a NEW head (history moves forward;
        # writer epochs carried, not rewound — the Python API's rules)
        m = re.match(
            r"\s*RESTORE\s+TABLE\s+(\S+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise SqlDmlError(
                "malformed RESTORE (want RESTORE TABLE <t> TO "
                "VERSION AS OF <n>)"
            )
        table = _ident(m.group(1))
        if wh.routing_info(table) is None:
            raise SqlDmlError(f"unknown warehouse table {table!r}")
        _guard_not_mv(table, "RESTORE")
        new_v = wh.restore(table, int(m.group(2)))
        return {
            "operation": "RESTORE",
            "table": table,
            "restored_version": int(m.group(2)),
            "version": new_v,
        }
    if verb == "OPTIMIZE":
        # Delta SQL maintenance verb: OPTIMIZE <t> [ZORDER BY (c, ...)]
        # -> compact (row-preserving; CAS'd so concurrent merges win).
        # Allowed on materialized views too — compaction never changes
        # rows, so maintained == rebuilt is preserved.
        m = re.match(
            r"\s*OPTIMIZE\s+(\S+?)\s*"
            r"(?:ZORDER\s+BY\s*\(([^)]*)\)\s*)?$",
            stmt,
            re.I,
        )
        if not m:
            raise SqlDmlError(
                "malformed OPTIMIZE (want OPTIMIZE <table> "
                "[ZORDER BY (col, ...)])"
            )
        table = _ident(m.group(1))
        if wh.routing_info(table) is None:
            raise SqlDmlError(f"unknown warehouse table {table!r}")
        cols = None
        if m.group(2) is not None:
            cols = [
                _ident(c.strip()) for c in m.group(2).split(",") if c.strip()
            ]
            if not cols:
                raise SqlDmlError("empty ZORDER BY column list")
        # one clustering column = a plain range-sort; 2+ = true Z-order
        # interleaving so stats skipping works on every listed column
        n = wh.compact(
            table, order_by=cols, zorder=bool(cols) and len(cols) > 1
        )
        return {"operation": "OPTIMIZE", "table": table, "files": n}
    if verb == "VACUUM":
        m = re.match(
            r"\s*VACUUM\s+(\S+?)\s*"
            r"(?:RETAIN\s+(\d+(?:\.\d+)?)\s+(HOURS?|SECONDS?)\s*)?$",
            stmt,
            re.I,
        )
        if not m:
            raise SqlDmlError(
                "malformed VACUUM (want VACUUM <table> "
                "[RETAIN <n> HOURS|SECONDS])"
            )
        table = _ident(m.group(1))
        if not hasattr(wh, "vacuum"):
            raise SqlDmlError(
                "VACUUM applies to the delta format (the manifest "
                "warehouse reclaims via its snapshot pruning policy)"
            )
        if wh.routing_info(table) is None:
            raise SqlDmlError(f"unknown warehouse table {table!r}")
        retention = None
        if m.group(2) is not None:
            val = float(m.group(2))
            retention = (
                val * 3600.0
                if m.group(3).upper().startswith("HOUR")
                else val
            )
        n = wh.vacuum(table, retention_sec=retention)
        return {"operation": "VACUUM", "table": table, "deleted": n}
    raise SqlDmlError(
        f"unsupported statement {verb!r} (supported: INSERT INTO, "
        "CREATE TABLE ... AS SELECT, DELETE FROM, UPDATE ... SET, "
        "MERGE INTO, CREATE/REFRESH/DROP MATERIALIZED VIEW, "
        "ALTER TABLE ADD/DROP CONSTRAINT, OPTIMIZE [ZORDER BY], "
        "VACUUM [RETAIN], RESTORE TABLE ... TO VERSION AS OF, "
        "DESCRIBE [HISTORY|DETAIL])"
    )


# ---------------------------------------------------------------------------
# SQL READ surface: SELECT with time travel (VERSION AS OF /
# TIMESTAMP AS OF). register_warehouse_views exposes head snapshots;
# this lane lets a SELECT pin any table reference to a retained
# version or timestamp without dropping to the Python API — the Delta
# SQL spelling, served by read_at_version / read_at_timestamp on both
# commit protocols.
# ---------------------------------------------------------------------------


def _time_travel_view(wh, table: str, version=None, timestamp=None) -> str:
    if wh.routing_info(table) is None:
        raise SqlDmlError(
            f"time travel requires a warehouse table; unknown {table!r}"
        )
    if version is not None:
        df = wh.read_at_version(table, int(version))
        tag = f"v{int(version)}"
    else:
        df = wh.read_at_timestamp(table, timestamp)
        import hashlib

        tag = "t" + hashlib.md5(str(timestamp).encode()).hexdigest()[:10]
    name = f"__tt_{table}_{tag}"
    df.createOrReplaceTempView(name)
    return name


def execute_sql(wh, stmt: str, register: bool = True):
    """One SQL entry point over a warehouse (either commit protocol):

    - SELECT / WITH statements run through ``spark.sql`` after
      rewriting any ``<table> VERSION AS OF <n>`` /
      ``<table> TIMESTAMP AS OF '<ts>'`` reference to a temp view of
      the pinned snapshot (read_at_version / read_at_timestamp — the
      same reads the Python API serves, so retention/vacuum errors
      carry over verbatim). Head-snapshot views for every warehouse
      table are (re-)registered first unless ``register=False``.
      Returns the result DataFrame.
    - every other verb routes to :func:`execute_dml` and returns its
      result dict.
    """
    import re

    head = re.match(r"\s*(\w+)", stmt)
    verb = (head.group(1) if head else "").upper()
    if verb not in ("SELECT", "WITH"):
        # DML bodies can read warehouse tables too (INSERT ... SELECT
        # FROM t, MERGE ... USING t): re-register the head views so
        # the source resolves to the CURRENT snapshot, not whatever a
        # prior registration pinned (same rule as the SELECT path)
        if register:
            register_warehouse_views(wh.spark, wh)
        return execute_dml(wh, stmt)
    spark = wh.spark
    if register:
        register_warehouse_views(spark, wh)
    parts = re.split(r"('(?:[^']|'')*')", stmt)
    out: list[str] = []
    i = 0
    while i < len(parts):
        seg = parts[i]
        if i % 2 == 1:  # string literal: untouchable
            out.append(seg)
            i += 1
            continue
        seg = re.sub(
            r"\b([A-Za-z_]\w*)\s+VERSION\s+AS\s+OF\s+(\d+)\b",
            lambda m: _time_travel_view(wh, m.group(1), version=m.group(2)),
            seg,
            flags=re.I,
        )
        m = re.search(
            r"\b([A-Za-z_]\w*)\s+TIMESTAMP\s+AS\s+OF\s*$", seg, flags=re.I
        )
        if m and i + 1 < len(parts):
            lit = parts[i + 1][1:-1].replace("''", "'")
            out.append(
                seg[: m.start()]
                + _time_travel_view(wh, m.group(1), timestamp=lit)
            )
            i += 2
            continue
        out.append(seg)
        i += 1
    return spark.sql("".join(out))
