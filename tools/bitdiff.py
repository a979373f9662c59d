"""Bit-exact differ: run registered queries on Spark and their DuckDB
oracles, canonicalize at FULL float precision (repr), and report
divergent cells. Diagnoses driver hash_match failures that the lenient
%.10g canonicalization in oracle_check.py hides.

Usage: python tools/bitdiff.py q24_math_fns [sf_dir]   # verbose single
       python tools/bitdiff.py all [sf_dir]            # strict sweep
"""

from __future__ import annotations

import math
import os
import sys
import time

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
        return repr(v)  # full precision — at least as strict as the driver
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


# Canonical cross-engine type families. The driver's value hash is
# type-sensitive (DuckDB HUGEINT != Spark bigint even when every value
# is equal — q75/q93 shipped that way twice because this differ only
# compared Python values). Map both engines' column types onto one
# vocabulary and fail on width mismatches.
_SPARK_CANON = {
    "tinyint": "i8", "smallint": "i16", "int": "i32", "bigint": "i64",
    "float": "f32", "double": "f64", "string": "str", "boolean": "bool",
    "date": "date", "binary": "bin",
}
_DUCK_CANON = {
    "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "BIGINT": "i64",
    "HUGEINT": "i128", "UTINYINT": "u8", "USMALLINT": "u16",
    "UINTEGER": "u32", "UBIGINT": "u64",
    "FLOAT": "f32", "DOUBLE": "f64", "VARCHAR": "str", "BOOLEAN": "bool",
    "DATE": "date", "BLOB": "bin",
}


def canon_spark_type(dt: str) -> str:
    if dt.startswith("decimal"):
        return "dec" + dt[len("decimal"):]
    if dt.startswith(("array", "struct", "map")):
        return "arr"
    if dt.startswith("timestamp"):
        return "ts"
    return _SPARK_CANON.get(dt, dt)


def canon_duck_type(t) -> str:
    t = str(t)
    if t.startswith("DECIMAL"):
        return "dec" + t[len("DECIMAL"):]
    if t.endswith("[]") or t.startswith(("LIST", "STRUCT", "MAP")):
        return "arr"
    if t.startswith("TIMESTAMP"):
        return "ts"
    return _DUCK_CANON.get(t, t)


def diff_one(spark, con, qs, osql, name, sf_dir, verbose=True):
    """Return (status, n). status: pass|rows-only|spark-error|
    oracle-error|columns|types|rowcount|values."""
    try:
        df = qs[name](spark, sf_dir)
        cols = df.columns
        idx = sorted(range(len(cols)), key=lambda i: cols[i])
        s_rows = sorted(
            tuple(canon_cell(list(r)[i]) for i in idx) for r in df.collect()
        )
    except Exception as ex:  # noqa: BLE001
        if verbose:
            print(f"  spark error: {ex}")
        return "spark-error", -1
    if name not in osql:
        return "rows-only", len(s_rows)
    try:
        res = con.execute(osql[name])
        d_cols = [c[0] for c in res.description]
        d_idx = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        d_rows = sorted(
            tuple(canon_cell(list(r)[i]) for i in d_idx)
            for r in res.fetchall()
        )
    except Exception as ex:  # noqa: BLE001
        if verbose:
            print(f"  duckdb error: {ex}")
        return "oracle-error", -1
    s_names = [cols[i] for i in idx]
    d_names = [d_cols[i] for i in d_idx]
    if s_names != d_names:
        if verbose:
            print(f"  COLUMN MISMATCH: {s_names} vs {d_names}")
        return "columns", -1
    s_dtypes = dict(df.dtypes)
    s_types = [canon_spark_type(s_dtypes[c]) for c in s_names]
    types_checked = True
    try:
        rel = con.sql(osql[name])  # plans only; types come from the plan
        d_type_map = dict(zip(rel.columns, (canon_duck_type(t) for t in rel.types)))
        d_types = [d_type_map[c] for c in d_names]
    except Exception as ex:  # noqa: BLE001 — fall back to value-only compare
        # A silently-disabled type check would let the q75/q93 bug class
        # (Spark LONG vs DuckDB DOUBLE) through unnoticed — say so loudly.
        print(f"  WARNING {name}: type check SKIPPED (duckdb plan error: {ex})")
        d_types = s_types
        types_checked = False
    if not types_checked and verbose:
        print("  (values still compared; types not)")
    if s_types != d_types:
        bad_cols = [
            f"{c}: spark={a} duckdb={b}"
            for c, a, b in zip(s_names, s_types, d_types)
            if a != b
        ]
        if verbose:
            print("  TYPE MISMATCH: " + "; ".join(bad_cols))
        return "types", len(bad_cols)
    if len(s_rows) != len(d_rows):
        if verbose:
            print(f"  ROWCOUNT MISMATCH: {len(s_rows)} vs {len(d_rows)}")
        return "rowcount", abs(len(s_rows) - len(d_rows))
    ndiff = 0
    for a, b in zip(s_rows, d_rows):
        if a != b:
            for j, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    ndiff += 1
                    if verbose and ndiff <= 30:
                        print(f"  col={s_names[j]}: spark={x} duckdb={y}")
    return ("pass", 0) if ndiff == 0 else ("values", ndiff)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    if name == "all":
        bad = []
        for qname in qs:
            t0 = time.time()
            status, n = diff_one(spark, con, qs, osql, qname, sf_dir, verbose=False)
            dt = time.time() - t0
            tag = "OK " if status in ("pass", "rows-only") else "BAD"
            print(f"{tag} {qname:34s} {status:12s} {dt:5.1f}s"
                  + (f" ({n} diffs)" if status == "values" else ""), flush=True)
            if tag == "BAD":
                bad.append(qname)
        print(f"\n{len(qs) - len(bad)}/{len(qs)} strict-pass; failing: {bad}")
        sys.exit(1 if bad else 0)
    status, n = diff_one(spark, con, qs, osql, name, sf_dir, verbose=True)
    print(f"{name}: {status}" + (f" ({n} divergent cells)" if n > 0 else ""))


if __name__ == "__main__":
    main()
