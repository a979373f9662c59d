"""URL canonicalization column expressions (all JVM-side builtins).

The RefinedWeb/CCNet-style URL-dedup key: crawl corpora carry the same
page under many spellings (scheme case, ``www.``, default ports,
tracking query params, fragments, duplicate slashes, trailing
slashes, query-param order), and per-URL dedup only works after those
collapse to one canonical string. Every rule here is a deterministic
pure expression — lowercase/regexp/array builtins that stay inside
whole-stage codegen — and each has an exact ANSI-SQL mirror so the
DuckDB oracle can reproduce the canonical form byte-for-byte.

Rules applied (in order):
  1. trim surrounding whitespace; strip the ``#fragment``.
  2. scheme and host:port lowercased (the path/query stay
     case-sensitive per RFC 3986).
  3. ``www.`` prefix stripped from the host.
  4. default ports dropped (``:80`` for http, ``:443`` for https).
  5. duplicate slashes in the PATH collapsed; trailing slash
     stripped; empty path becomes ``/``.
  6. tracking params removed (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``, ``mc_cid``, ``mc_eid``, ``igshid``); the survivors
     are SORTED so param order never splits a URL; an emptied query
     drops its ``?``.
  7. userinfo (``user:pass@``) dropped from the authority — it never
     identifies the PAGE, and leaving it would defeat the www./port
     rules on the rare crawl rows that carry it.

Registrable-domain extraction is PSL-backed (round 11): longest-match
against the vendored public-suffix snapshot in
``functions/psl_snapshot.py`` (multi-label ICANN registry suffixes —
``example.co.uk`` resolves to ``example.co.uk``), rendered as literal
IN expressions so the plan shape (per-row expression work, no
shuffle, no join) is unchanged; the last-two-labels heuristic remains
the fallback for single-label TLDs (where it is exactly correct) and
for hosts under wildcard/exception rules the snapshot does not carry.
Swapping in the FULL list is a one-tuple replacement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one alternation, shared by the Spark and SQL mirrors so the two
# engines cannot disagree about what counts as tracking
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid)(=.*)?$"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_parts(c: Column | str) -> tuple[Column, Column, Column, Column]:
    """(scheme, hostport, path, query) of a trimmed, fragment-free
    URL. scheme/hostport lowercased; path/query verbatim."""
    u = F.regexp_replace(F.trim(_col(c)), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"^[^?]*\?(.*)$", 1)
    return scheme, hostport, path, query


def canonical_url(c: Column | str) -> Column:
    """Canonical form of a URL column (rules in the module docstring).
    Strings without a ``scheme://`` are returned trimmed/fragment-free
    but otherwise untouched (no scheme to anchor host rules on)."""
    scheme, hostport, path, query = url_parts(c)
    host = F.regexp_replace(hostport, r"^.*@", "")
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    path_c = F.regexp_replace(path, r"/{2,}", "/")
    path_c = F.regexp_replace(path_c, r"(.)/$", "$1")
    path_c = F.when(path_c == "", F.lit("/")).otherwise(path_c)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.concat_ws("&", params)
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path_c,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    # re-trim: stripping "#frag" can expose whitespace that preceded it
    raw = F.trim(F.regexp_replace(F.trim(_col(c)), r"#.*$", ""))
    return F.when(scheme == "", raw).otherwise(canon)


def registrable_domain(c: Column | str) -> Column:
    """PSL-backed registrable domain of a CANONICAL url:
    ``https://a.b.example.com/x`` -> ``example.com`` and
    ``https://shop.example.co.uk/x`` -> ``example.co.uk``.

    Longest-match against the vendored public-suffix SNAPSHOT
    (functions/psl_snapshot.py — multi-label ICANN registry suffixes;
    single-label TLDs need no table because the last-two-labels
    heuristic is already correct there, and that heuristic remains the
    fallback for hosts under unlisted/wildcard rules). Pure literal IN
    expressions — no join, no UDF, the q165 plan shape is unchanged
    (golden-pinned); the SQL mirror reads the SAME tuples."""
    from .psl_snapshot import PSL_SUFFIXES_2, PSL_SUFFIXES_3

    _, hostport, _, _ = url_parts(c)
    host = F.regexp_replace(hostport, r"^.*@", "")
    host = F.regexp_replace(
        F.regexp_replace(host, r"^www\.", ""), r":\d+$", ""
    )
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    last4 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$", 1)
    return (
        F.when(
            (last4 != "") & last3.isin(*PSL_SUFFIXES_3), last4
        )
        .when((last3 != "") & last2.isin(*PSL_SUFFIXES_2), last3)
        .when(last2 == "", host)
        .otherwise(last2)
    )


def canonical_url_sql(c: str) -> str:
    """DuckDB mirror of canonical_url() for differential oracles.

    Kept next to the Spark expressions so the rule lists cannot
    drift; the oracle still exercises a fully independent execution
    engine (DuckDB regex/list kernels vs Catalyst codegen)."""
    u = f"REGEXP_REPLACE(TRIM({c}), '#.*$', '')"
    scheme = f"LOWER(REGEXP_EXTRACT({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"REGEXP_REPLACE({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"LOWER(REGEXP_EXTRACT({rest}, '^([^/?]*)', 1))"
    pathq = f"REGEXP_REPLACE({rest}, '^[^/?]*', '')"
    path = f"REGEXP_EXTRACT({pathq}, '^([^?]*)', 1)"
    query = f"REGEXP_EXTRACT({pathq}, '^[^?]*\\?(.*)$', 1)"
    host = f"REGEXP_REPLACE({hostport}, '^.*@', '')"
    host = f"REGEXP_REPLACE({host}, '^www\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN REGEXP_REPLACE({host}, ':80$', '')"
        f" WHEN {scheme} = 'https' THEN REGEXP_REPLACE({host}, ':443$', '')"
        f" ELSE {host} END"
    )
    path_c = f"REGEXP_REPLACE({path}, '/{{2,}}', '/', 'g')"
    path_c = f"REGEXP_REPLACE({path_c}, '(.)/$', '\\1')"
    path_c = f"CASE WHEN {path_c} = '' THEN '/' ELSE {path_c} END"
    params = (
        f"LIST_SORT(LIST_FILTER(STRING_SPLIT({query}, '&'), "
        f"p -> p <> '' AND NOT REGEXP_MATCHES(p, "
        f"'{TRACKING_PARAM_RE}')))"
    )
    # ARRAY_TO_STRING([]) is NULL in DuckDB; Spark's concat_ws is ''
    qs = f"COALESCE(ARRAY_TO_STRING({params}, '&'), '')"
    canon = (
        f"({scheme} || '://' || {host} || {path_c} || "
        f"CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END)"
    )
    return f"CASE WHEN {scheme} = '' THEN TRIM({u}) ELSE {canon} END"


def registrable_domain_sql(c: str) -> str:
    """DuckDB mirror of registrable_domain() — the PSL IN-lists are
    rendered from the SAME vendored tuples, so the engines cannot
    drift on what counts as a public suffix."""
    from .psl_snapshot import PSL_SUFFIXES_2, PSL_SUFFIXES_3

    u = f"REGEXP_REPLACE(TRIM({c}), '#.*$', '')"
    rest = f"REGEXP_REPLACE({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"LOWER(REGEXP_EXTRACT({rest}, '^([^/?]*)', 1))"
    host = f"REGEXP_REPLACE({hostport}, '^.*@', '')"
    host = (
        f"REGEXP_REPLACE(REGEXP_REPLACE({host}, '^www\\.', ''),"
        f" ':[0-9]+$', '')"
    )
    two = f"REGEXP_EXTRACT({host}, '([^.]+\\.[^.]+)$', 1)"
    last3 = f"REGEXP_EXTRACT({host}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    last4 = (
        f"REGEXP_EXTRACT({host}, '([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$', 1)"
    )
    set2 = ", ".join(f"'{s}'" for s in PSL_SUFFIXES_2)
    set3 = ", ".join(f"'{s}'" for s in PSL_SUFFIXES_3)
    return (
        f"CASE WHEN {last4} <> '' AND {last3} IN ({set3}) THEN {last4} "
        f"WHEN {last3} <> '' AND {two} IN ({set2}) THEN {last3} "
        f"WHEN {two} = '' THEN {host} ELSE {two} END"
    )
