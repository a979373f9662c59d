"""Independent Delta Lake log reader — a from-scratch replay of the
PUBLIC Delta protocol (PROTOCOL.md), deliberately sharing NO code with
``canvas_data_loader_spark.plans.delta``. Exists to prove the writer's
claim the honest way: a second implementation, written only from the
protocol, resolves the same live file set and reads the same rows.

Replay rules implemented (the reader half of the protocol):
- state = fold of ``_delta_log/<20-digit>.json`` actions in version
  order; ``add`` makes a path live, ``remove`` tombstones it; the last
  ``metaData`` wins; ``txn`` tracks per-app versions;
- if ``_delta_log/_last_checkpoint`` exists, load the parquet
  checkpoint it names and fold only the JSON commits AFTER it;
- a ``VERSION AS OF v`` read folds commits ``0..v`` (ignoring any
  checkpoint newer than v).

Usage:
  python tools/delta_reader.py <table_dir>            # print live files
  python tools/delta_reader.py <table_dir> --sql      # DuckDB statement
  python tools/delta_reader.py <table_dir> --version N
"""

from __future__ import annotations

import json
import os
import sys


def _log_entries(table_dir: str) -> list[tuple[int, str]]:
    ldir = os.path.join(table_dir, "_delta_log")
    out = []
    for name in os.listdir(ldir):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and len(stem) == 20 and stem.isdigit():
            out.append((int(stem), os.path.join(ldir, name)))
    return sorted(out)


def _fold(state: dict, action: dict) -> None:
    if "add" in action:
        a = action["add"]
        state["files"][a["path"]] = a
        state["tombstones"].pop(a["path"], None)
    elif "remove" in action:
        r = action["remove"]
        state["tombstones"][r["path"]] = r
        state["files"].pop(r["path"], None)
    elif "metaData" in action:
        state["metaData"] = action["metaData"]
    elif "protocol" in action:
        state["protocol"] = action["protocol"]
    elif "txn" in action:
        t = action["txn"]
        prev = state["txn"].get(t["appId"], -1)
        state["txn"][t["appId"]] = max(prev, int(t["version"]))


def replay(table_dir: str, version: int | None = None) -> dict:
    """Fold the log into {version, protocol, metaData, files, txn}."""
    entries = _log_entries(table_dir)
    if version is not None:
        entries = [(v, p) for v, p in entries if v <= version]
        if not entries or entries[-1][0] != version:
            raise FileNotFoundError(
                f"version {version} not present in {table_dir}"
            )
    if not entries:
        raise FileNotFoundError(f"no delta log in {table_dir}")
    state: dict = {
        "version": entries[-1][0],
        "protocol": None,
        "metaData": None,
        "files": {},
        "tombstones": {},
        "txn": {},
    }
    start = 0
    lc_path = os.path.join(table_dir, "_delta_log", "_last_checkpoint")
    if os.path.isfile(lc_path):
        try:
            ckpt_v = int(json.load(open(lc_path))["version"])
        except (ValueError, KeyError):
            ckpt_v = -1
        if 0 <= ckpt_v <= entries[-1][0]:
            ckpt_file = os.path.join(
                table_dir, "_delta_log", f"{ckpt_v:020d}.checkpoint.parquet"
            )
            if os.path.isfile(ckpt_file):
                import pyarrow.parquet as pq

                for row in pq.read_table(ckpt_file).to_pylist():
                    for kind in ("protocol", "metaData", "add", "remove", "txn"):
                        if row.get(kind) is not None:
                            _fold(state, {kind: row[kind]})
                start = ckpt_v + 1
    for v, path in entries:
        if v < start:
            continue
        with open(path) as fh:
            for line in fh:
                if line.strip():
                    _fold(state, json.loads(line))
    return state


def live_files(table_dir: str, version: int | None = None) -> list[str]:
    state = replay(table_dir, version)
    return [
        os.path.join(table_dir, p) for p in sorted(state["files"])
    ]


def duckdb_sql(table_dir: str, version: int | None = None) -> str:
    files = live_files(table_dir, version)
    if not files:
        raise FileNotFoundError(f"no live files in {table_dir}")
    lits = ", ".join("'" + f.replace("'", "''") + "'" for f in files)
    return (
        f"SELECT * FROM read_parquet([{lits}], "
        "hive_partitioning=false, union_by_name=true)"
    )


def main() -> None:
    args = [a for a in sys.argv[1:]]
    version = None
    if "--version" in args:
        i = args.index("--version")
        version = int(args[i + 1])
        del args[i : i + 2]
    want_sql = "--sql" in args
    if want_sql:
        args.remove("--sql")
    if not args:
        print(__doc__)
        sys.exit(2)
    table_dir = args[0]
    if want_sql:
        print(duckdb_sql(table_dir, version))
    else:
        state = replay(table_dir, version)
        print(f"version: {state['version']}")
        print(f"txn: {state['txn']}")
        for p in sorted(state["files"]):
            print(p)


if __name__ == "__main__":
    main()
