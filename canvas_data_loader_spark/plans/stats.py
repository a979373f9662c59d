"""Per-file statistics for commit-log warehouses: numRecords and
per-column min/max read from the parquet FOOTER (metadata only, no
data IO). Shared by the Delta impl (stats ride the add actions, the
protocol's data-skipping field) and the manifest impl (stats ride an
immutable ``_stats.json`` sidecar per snapshot directory)."""

from __future__ import annotations

import json


def _file_stats(path: str) -> str:
    """Per-file statistics for the add action (the protocol's
    data-skipping mechanism): numRecords + per-column min/max, read
    from the parquet FOOTER (metadata only, no data IO). JSON string
    per the protocol. Columns whose physical min/max aren't scalar
    JSON (binary, nested) are omitted — readers treat absence as
    'cannot skip on this column'."""
    import datetime
    import decimal

    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata

    def as_json(v):
        if isinstance(v, (bool, int, float, str)) or v is None:
            return v
        if isinstance(v, (bytes, bytearray)):
            try:
                return v.decode("utf-8")
            except UnicodeDecodeError:
                return None
        if isinstance(v, decimal.Decimal):
            return str(v)
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return None

    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    # Every stat is usable only when EVERY row group records it for the
    # column — a partial sum (nullCount) or partial range (min/max) over
    # only the groups that carry stats would overclaim and mis-prune, so
    # a single non-conforming row group permanently invalidates the
    # column's entry for that stat.
    null_missing: set = set()
    minmax_missing: set = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            name = col.path_in_schema
            if "." in name:
                continue
            if st is None:
                null_missing.add(name)
                nulls.pop(name, None)
                minmax_missing.add(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            if st.has_null_count and name not in null_missing:
                nulls[name] = nulls.get(name, 0) + int(st.null_count)
            else:
                null_missing.add(name)
                nulls.pop(name, None)
            lo = hi = None
            if st.has_min_max:
                lo, hi = as_json(st.min), as_json(st.max)
            if lo is None or hi is None or name in minmax_missing:
                minmax_missing.add(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    return json.dumps(
        {
            "numRecords": md.num_rows,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        },
        separators=(",", ":"),
    )


def stats_disjoint(stats_json: str | None, col: str, lo, hi) -> bool:
    """True when the stats PROVE the file's ``col`` range cannot
    intersect [lo, hi] (either bound may be None = open). False on
    missing/malformed stats or absent column — conservative: only a
    provable miss skips a file."""
    if not stats_json:
        return False
    try:
        s = json.loads(stats_json)
        fmin = s.get("minValues", {}).get(col)
        fmax = s.get("maxValues", {}).get(col)
    except (ValueError, AttributeError, TypeError):
        return False
    if fmin is None or fmax is None:
        return False
    try:
        return (hi is not None and fmin > hi) or (lo is not None and fmax < lo)
    except TypeError:
        return False  # caller passed a bound of a different type


def stats_all_null(stats_json: str | None, col: str) -> bool:
    """True when the stats PROVE every row's ``col`` is NULL (so an
    IS NOT NULL predicate can never match). Conservative on missing
    nullCount (older sidecars/add actions predate the field)."""
    if not stats_json:
        return False
    try:
        s = json.loads(stats_json)
        nc = s.get("nullCount", {}).get(col)
        nr = s.get("numRecords")
    except (ValueError, AttributeError, TypeError):
        return False
    return nc is not None and nr is not None and int(nc) == int(nr) > 0


def stats_no_null(stats_json: str | None, col: str) -> bool:
    """True when the stats PROVE ``col`` has no NULL in the file (so
    an IS NULL predicate can never match). Conservative on missing
    nullCount."""
    if not stats_json:
        return False
    try:
        nc = json.loads(stats_json).get("nullCount", {}).get(col)
    except (ValueError, AttributeError, TypeError):
        return False
    return nc is not None and int(nc) == 0


def prefix_upper_bound(prefix: str) -> str | None:
    """Smallest string that is > every string with this prefix, or
    None when no such bound exists (all chars at the code-point
    ceiling). ``col LIKE 'p%'`` then prunes as the range
    [prefix, upper) — the standard min/max trick for StartsWith."""
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            return prefix[:i] + chr(cp + 1)
    return None
