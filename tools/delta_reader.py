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
  checkpoint newer than v);
- an ``add`` carrying a ``deletionVector`` descriptor (inline storage)
  has those row positions logically deleted — the emitted SQL
  anti-joins the independently-decoded (file, position) pairs.

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
            lc = json.load(open(lc_path))
            ckpt_v = int(lc["version"])
            n_parts = int(lc["parts"]) if lc.get("parts") else None
        except (ValueError, KeyError):
            ckpt_v, n_parts = -1, None
        if 0 <= ckpt_v <= entries[-1][0]:
            ldir = os.path.join(table_dir, "_delta_log")
            if n_parts:
                # multi-part classic checkpoint (PROTOCOL.md):
                # {v:020}.checkpoint.{part:010}.{parts:010}.parquet —
                # ALL named parts must exist, else fall back to the
                # full JSON replay
                ckpt_files = [
                    os.path.join(
                        ldir,
                        f"{ckpt_v:020d}.checkpoint."
                        f"{p:010d}.{n_parts:010d}.parquet",
                    )
                    for p in range(1, n_parts + 1)
                ]
            else:
                ckpt_files = [
                    os.path.join(ldir, f"{ckpt_v:020d}.checkpoint.parquet")
                ]
            if all(os.path.isfile(f) for f in ckpt_files):
                import pyarrow.parquet as pq

                for ckpt_file in ckpt_files:
                    for row in pq.read_table(ckpt_file).to_pylist():
                        for kind in (
                            "protocol", "metaData", "add", "remove", "txn",
                        ):
                            if row.get(kind) is not None:
                                _fold(state, {kind: row[kind]})
                start = ckpt_v + 1
            elif n_parts is None:
                # V2 SPEC checkpoint (PROTOCOL.md §v2-spec-checkpoints):
                # {v:020}.checkpoint.{uniqueId}.parquet manifest with
                # protocol/metaData/txn/checkpointMetadata/sidecar rows;
                # add/remove actions live in the named sidecar parquets
                # under _delta_log/_sidecars/. Every sidecar must exist,
                # else fall back to full JSON replay.
                import glob as _glob
                import re as _re

                part_re = _re.compile(
                    r"\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet"
                )
                cands = sorted(
                    p
                    for p in _glob.glob(
                        os.path.join(
                            ldir, f"{ckpt_v:020d}.checkpoint.*.parquet"
                        )
                    )
                    if not part_re.fullmatch(os.path.basename(p))
                )
                if cands:
                    import pyarrow.parquet as pq

                    top_actions = []
                    sidecars = []
                    for row in pq.read_table(cands[0]).to_pylist():
                        for kind in ("protocol", "metaData", "txn"):
                            if row.get(kind) is not None:
                                top_actions.append({kind: row[kind]})
                        if row.get("sidecar") is not None:
                            sidecars.append(row["sidecar"]["path"])
                    spaths = [
                        os.path.join(ldir, "_sidecars", s) for s in sidecars
                    ]
                    if all(os.path.isfile(p) for p in spaths):
                        for a in top_actions:
                            _fold(state, a)
                        for sp in spaths:
                            for row in pq.read_table(sp).to_pylist():
                                for kind in ("add", "remove"):
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


def decode_deletion_vector(descriptor: dict) -> list[int]:
    """Deleted row positions from an INLINE ``deletionVector``
    descriptor — an independent decode, written from the documented
    format (Z85-encoded blob, trimmed to ``sizeInBytes``; the bitmap =
    int32 magic, int64 bitmap count, then per bitmap an int32 high key
    + a standard portable 32-bit roaring bitmap: cookie 12346,
    descriptive headers, offsets, array/bitmap containers; a trailing
    big-endian CRC32 after ``sizeInBytes`` is verified when present).
    Shares no code with plans/dv.py — same reasoning as the rest of
    this file."""
    import struct
    import zlib

    if descriptor.get("storageType") != "i":
        raise ValueError(
            f"unsupported DV storageType {descriptor.get('storageType')!r}"
        )
    z85 = (
        "0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
    )
    inv = {c: i for i, c in enumerate(z85)}
    text = descriptor["pathOrInlineDv"]
    if len(text) % 5:
        raise ValueError("Z85 payload length not a multiple of 5")
    blob = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            if c not in inv:
                raise ValueError(f"invalid Z85 character {c!r}")
            word = word * 85 + inv[c]
        if word > 0xFFFFFFFF:
            raise ValueError("Z85 group overflows 32 bits")
        blob += struct.pack(">I", word)
    size = int(descriptor["sizeInBytes"])
    data = bytes(blob[:size])
    if len(blob) >= size + 4:
        (crc,) = struct.unpack(">I", bytes(blob[size : size + 4]))
        if zlib.crc32(data) != crc:
            raise ValueError("deletion vector failed its CRC32 check")
    magic, n_bitmaps = struct.unpack_from("<iq", data, 0)
    if magic != 1681511377:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        (high,) = struct.unpack_from("<I", data, pos)
        pos += 4
        cookie, n_containers = struct.unpack_from("<ii", data, pos)
        if cookie != 12346:
            raise ValueError(f"unsupported roaring cookie {cookie}")
        headers = [
            struct.unpack_from("<HH", data, pos + 8 + 4 * i)
            for i in range(n_containers)
        ]
        body = pos + 8 + 4 * n_containers + 4 * n_containers  # skip offsets
        for key, card_m1 in headers:
            card = card_m1 + 1
            base = (high << 32) | (key << 16)
            if card <= 4096:
                lows = struct.unpack_from(f"<{card}H", data, body)
                body += 2 * card
            else:
                words = struct.unpack_from("<1024Q", data, body)
                body += 8192
                lows = [
                    (wi << 6) | b
                    for wi, w in enumerate(words)
                    if w
                    for b in range(64)
                    if w >> b & 1
                ]
            out.extend(base | lo for lo in lows)
        pos = body
    return sorted(out)


# Delta schema-serialization primitive type -> DuckDB type (from
# PROTOCOL.md's Schema Serialization Format table). None = emit no
# cast (complex types ride union_by_name's own unification).
_DUCK_TYPES = {
    "long": "BIGINT",
    "integer": "INTEGER",
    "short": "SMALLINT",
    "byte": "TINYINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "binary": "BLOB",
    "date": "DATE",
    "timestamp": "TIMESTAMP WITH TIME ZONE",
    "timestamp_ntz": "TIMESTAMP",
}


def schema_projection(state: dict) -> str | None:
    """The SELECT list the metaData's schemaString pins: declared
    column order and types, and — when the table uses column mapping
    (``delta.columnMapping.mode = name``) — each field's stored
    PHYSICAL name (field metadata ``delta.columnMapping.physicalName``)
    aliased back to its logical name. None when the table carries no
    metaData (pre-protocol test dirs)."""
    meta = state.get("metaData")
    if not meta or not meta.get("schemaString"):
        return None
    mapped = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode"
    ) == "name"
    exprs = []
    for f in json.loads(meta["schemaString"])["fields"]:
        phys = f["name"]
        if mapped:
            phys = (f.get("metadata") or {}).get(
                "delta.columnMapping.physicalName", phys
            )
        qname = '"' + f["name"].replace('"', '""') + '"'
        qphys = '"' + phys.replace('"', '""') + '"'
        duck_t = (
            _DUCK_TYPES.get(f["type"]) if isinstance(f["type"], str) else None
        )
        expr = f"CAST({qphys} AS {duck_t})" if duck_t else qphys
        exprs.append(f"{expr} AS {qname}")
    return ", ".join(exprs)


def duckdb_sql(table_dir: str, version: int | None = None) -> str:
    state = replay(table_dir, version)
    files = [os.path.join(table_dir, p) for p in sorted(state["files"])]
    if not files:
        raise FileNotFoundError(f"no live files in {table_dir}")
    lits = ", ".join("'" + f.replace("'", "''") + "'" for f in files)
    proj = schema_projection(state) or "*"
    # deletion vectors: anti-join the decoded (file, position) pairs
    dv_values = [
        (os.path.join(table_dir, p), pos)
        for p, a in sorted(state["files"].items())
        if a.get("deletionVector")
        for pos in decode_deletion_vector(a["deletionVector"])
    ]
    if not dv_values:
        return (
            f"SELECT {proj} FROM read_parquet([{lits}], "
            "hive_partitioning=false, union_by_name=true)"
        )
    vals = ", ".join(
        "('" + f.replace("'", "''") + "', " + str(pos) + ")"
        for f, pos in dv_values
    )
    if proj == "*":
        proj = "* EXCLUDE (filename, file_row_number)"
    return (
        f"SELECT {proj} FROM "
        f"read_parquet([{lits}], hive_partitioning=false, "
        "union_by_name=true, filename=true, file_row_number=true) r "
        f"WHERE NOT EXISTS (SELECT 1 FROM (VALUES {vals}) d(file, pos) "
        "WHERE d.file = r.filename AND d.pos = r.file_row_number)"
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
