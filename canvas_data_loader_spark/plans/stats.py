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
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            name = col.path_in_schema
            if st is None or not st.has_min_max or "." in name:
                continue
            lo, hi = as_json(st.min), as_json(st.max)
            if lo is None or hi is None:
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    return json.dumps(
        {"numRecords": md.num_rows, "minValues": mins, "maxValues": maxs},
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
