"""Simulate the driver's correctness gate exactly: a VANILLA
SparkSession (no engine tuning — the conf the grading driver builds),
every __spark_entry__.queries() entry at sf0.01, compared against
oracle_sql() via DuckDB with the same canonicalization as
tools/oracle_check.py.

Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

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


def canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(canon_cell(list(r)[i]) for i in idx) for r in rows
    )
    return sorted(cols), out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[8]").getOrCreate()  # vanilla!
    import __spark_entry__ as E

    n = len(E.entry(spark).collect())
    print(f"entry(): {n} rows")

    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    passed = failed = skipped = 0
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            s_cols, s_rows = canon(df.columns, df.collect())
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            failed += 1
            continue
        if name not in osql:
            print(f"SKIP {name}: rows-only ({len(s_rows)} rows)")
            skipped += 1
            continue
        try:
            res = con.execute(osql[name])
            d_cols, d_rows = canon([c[0] for c in res.description], res.fetchall())
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            failed += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} != {d_cols}")
            failed += 1
        elif s_rows != d_rows:
            print(f"FAIL {name}: {len(s_rows)} spark rows != {len(d_rows)} oracle rows (or values)")
            failed += 1
        else:
            passed += 1
    print(f"{passed} passed, {failed} failed, {skipped} skipped")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
