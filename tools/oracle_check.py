"""Local differential harness: run every registered query in Spark and
DuckDB and compare row count, column names, and order-insensitive
values. Mirrors what the driver's CORRECTNESS gate does so mismatches
surface before a round ends.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from canvas_data_loader_spark import queries as Q
from canvas_data_loader_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(canon_cell(vals[i]) for i in idx))
    out.sort()
    return sorted(c for c in cols), out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    names = sorted(Q.SPARK)
    if only:
        names = [n for n in names if n in only]
    passed = failed = skipped = 0
    for name in names:
        try:
            sdf = Q.SPARK[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed += 1
            continue
        if name not in Q.ORACLE:
            print(f"SKIP {name}: no oracle (rows={len(srows)})")
            skipped += 1
            continue
        try:
            res = con.execute(Q.ORACLE[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed += 1
            continue
        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            failed += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duckdb={len(dr)}")
            failed += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            failed += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} skipped (rows-only)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
