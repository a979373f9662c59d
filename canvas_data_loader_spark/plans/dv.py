"""Deletion vectors: merge-on-read row-level deletes for both
warehouse implementations.

A deletion vector (DV) marks individual ROWS of an immutable parquet
file as deleted without rewriting the file — the fix for the worst
write-amplification case a copy-on-write table has at 100 TB: a
delete matching 0.01% of rows scattered across every file otherwise
rewrites the entire table. With DVs the delete commit writes only the
deleted rows' (file, position) pairs; readers apply them as a
broadcast anti-join (verified to stay inside WholeStageCodegen — one
BroadcastHashJoin LeftAnti over the scan, no shuffle); the next
compaction materializes them physically and clears the vectors.

Two storage spellings, one semantics:

- the manifest warehouse stores DV entries as plain parquet sidecars
  (``file`` = path relative to the table dir, ``pos`` = row index in
  that physical file), written distributed by Spark — readable by any
  parquet engine, including the DuckDB statement
  ``external_read_sql`` emits;
- the Delta warehouse stores the protocol's ``deletionVector``
  descriptor on the ``add`` action, inline (``storageType "i"``):
  Z85-encoded (ZeroMQ Base85 — the alphabet the protocol names, NOT
  RFC 1924) serialized RoaringBitmapArray, per PROTOCOL.md's
  deletion-vector format. The bitmap serialization below follows the
  public RoaringFormatSpec (portable 32-bit format: cookie 12346,
  array + bitmap containers) wrapped in the 64-bit RoaringBitmapArray
  layout the Delta spec describes. Byte-level fidelity to external
  Delta readers cannot be verified in this container (no delta-spark /
  delta-rs / duckdb-delta available); the writer/reader pair here is
  round-trip property-tested, and the descriptor fields (storageType,
  pathOrInlineDv, sizeInBytes, cardinality) follow the spec text.

Row positions use ``_metadata.row_index`` (Spark's per-file physical
row position, stable because parquet files are immutable) on the
write side and the same column on the read side; DuckDB's
``file_row_number`` is the identical notion for the external-read
statement.

Reference tie: the reference's only row-level mutation is the per-row
DELETE of its keyed upsert (src/importer.rs:363-375, one statement per
row). ``delete_where`` generalizes that to predicate deletes, and the
merge-on-read lane is what makes them affordable at scale.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Z85 (ZeroMQ RFC 32) — the Base85 variant the Delta protocol uses for
# deletion-vector encodings. NOT Python's base64.b85* (RFC 1924): the
# two alphabets differ, and an external Delta reader decodes with Z85.
_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85encode(data: bytes) -> str:
    """Z85-encode, zero-padding to a 4-byte multiple (the descriptor's
    ``sizeInBytes`` carries the true length, so decoders trim)."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            chunk.append(_Z85[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 text length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            try:
                word = word * 85 + _Z85_INV[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if word > 0xFFFFFFFF:
            raise ValueError("Z85 group overflows 32 bits")
        out += struct.pack(">I", word)
    return bytes(out)

# column names carried through located reads (never user-visible: both
# warehouses drop them before returning frames to callers)
FILE_COL = "__cdl_file"
POS_COL = "__cdl_pos"

# RoaringFormatSpec cookies (https://github.com/RoaringBitmap/RoaringFormatSpec)
_SERIAL_COOKIE_NO_RUNCONTAINER = 12346
# Delta PROTOCOL.md deletion-vector constants: the RoaringBitmapArray
# "portable" magic and the DV-blob format version marker. Values per
# the public spec as of this writer's knowledge; self-consistency is
# property-tested, external-reader verification unavailable offline.
_RBA_MAGIC = 1681511377
_ARRAY_CONTAINER_MAX = 4096


def serialize_rbm32(values: list[int]) -> bytes:
    """Serialize a sorted list of uint32 values in the standard
    RoaringBitmap portable format (no run containers: cookie 12346,
    descriptive headers, offsets, then array/bitmap container data)."""
    # group by high-16 key
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUNCONTAINER, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offsets: byte position of each container's data from stream start
    header_len = 8 + 4 * len(keys) + 4 * len(keys)
    offsets, pos = [], header_len
    bodies = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_CONTAINER_MAX:
            body = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            body = struct.pack("<1024Q", *words)
        offsets.append(pos)
        bodies.append(body)
        pos += len(body)
    out += struct.pack(f"<{len(keys)}i", *offsets)
    for b in bodies:
        out += b
    return bytes(out)


def deserialize_rbm32(buf: bytes, offset: int = 0) -> tuple[list[int], int]:
    """Inverse of :func:`serialize_rbm32`. Returns (sorted values,
    bytes consumed)."""
    cookie, n = struct.unpack_from("<ii", buf, offset)
    if cookie != _SERIAL_COOKIE_NO_RUNCONTAINER:
        raise ValueError(f"unsupported roaring cookie {cookie}")
    keys_cards = [
        struct.unpack_from("<HH", buf, offset + 8 + 4 * i) for i in range(n)
    ]
    # skip the offsets block (we read containers sequentially)
    pos = offset + 8 + 4 * n + 4 * n
    values: list[int] = []
    for key, card_m1 in keys_cards:
        card = card_m1 + 1
        if card <= _ARRAY_CONTAINER_MAX:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            lows = [
                (w_i << 6) | b
                for w_i, w in enumerate(words)
                if w
                for b in range(64)
                if w >> b & 1
            ]
        base = key << 16
        values.extend(base | lo for lo in lows)
    return values, pos - offset


def serialize_rba(positions: list[int]) -> bytes:
    """64-bit RoaringBitmapArray (Delta's DV bitmap): magic, int64
    count of 32-bit bitmaps, then per bitmap its uint32 high key +
    standard portable serialization."""
    positions = sorted(set(int(p) for p in positions))
    if positions and (positions[0] < 0 or positions[-1] > (1 << 63) - 1):
        raise ValueError("row positions must be non-negative int64")
    by_high: dict[int, list[int]] = {}
    for p in positions:
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", _RBA_MAGIC, len(by_high)))
    for high in sorted(by_high):
        out += struct.pack("<I", high)
        out += serialize_rbm32(by_high[high])
    return bytes(out)


def deserialize_rba(buf: bytes) -> list[int]:
    """Inverse of :func:`serialize_rba`."""
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != _RBA_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for _ in range(n):
        (high,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lows, used = deserialize_rbm32(buf, pos)
        pos += used
        base = high << 32
        out.extend(base | lo for lo in lows)
    return out


def encode_inline_dv(positions: list[int]) -> dict:
    """Delta ``deletionVector`` descriptor, inline storage: the
    serialized RoaringBitmapArray, Z85-encoded, with ``sizeInBytes``
    naming the true (pre-padding) bitmap length per the spec. A CRC32
    (big-endian) of the bitmap rides AFTER ``sizeInBytes`` bytes — a
    spec-pure reader trims at ``sizeInBytes`` and never sees it; our
    decoder verifies it when present."""
    data = serialize_rba(positions)
    blob = data + struct.pack(">I", zlib.crc32(data))
    return {
        "storageType": "i",
        "pathOrInlineDv": z85encode(blob),
        "sizeInBytes": len(data),
        "cardinality": len(set(int(p) for p in positions)),
    }


def decode_inline_dv(descriptor: dict) -> list[int]:
    """Positions from an inline ``deletionVector`` descriptor. The
    bitmap is the first ``sizeInBytes`` bytes of the Z85-decoded blob
    (the rest is zero padding, plus — for descriptors this module
    wrote — a trailing CRC32 that is verified when the blob is long
    enough to carry one)."""
    st = descriptor.get("storageType")
    if st != "i":
        raise ValueError(
            f"unsupported deletionVector storageType {st!r} (this reader "
            "implements inline DVs; on-disk DV files are not written here)"
        )
    import base64

    size = int(descriptor["sizeInBytes"])
    last_err: Exception | None = None
    # Z85 first (the spec alphabet); Python's RFC 1924 base85 second —
    # a migration shim for descriptors written before the Z85 fix. A
    # string valid in BOTH alphabets decodes to different bytes under
    # each, so the full validation chain (size bound, CRC when
    # present, bitmap magic) disambiguates.
    for decoder in (z85decode, lambda t: base64.b85decode(t)):
        try:
            blob = decoder(descriptor["pathOrInlineDv"])
            if size > len(blob):
                raise ValueError(
                    f"deletionVector sizeInBytes {size} exceeds "
                    f"payload {len(blob)}"
                )
            data = blob[:size]
            if len(blob) >= size + 4:
                (crc,) = struct.unpack(">I", blob[size : size + 4])
                if zlib.crc32(data) != crc:
                    raise ValueError(
                        "deletionVector inline payload failed CRC32 check"
                    )
            return deserialize_rba(data)
        except ValueError as e:
            # report the SPEC attempt's error (the Z85 one) when both
            # alphabets fail — the shim's failure is never the story
            if last_err is None:
                last_err = e
    raise last_err


def merge_inline_dv(old: dict | None, new_positions: list[int]) -> dict:
    """Union an add action's existing inline DV (if any) with newly
    deleted positions — repeated deletes against one file accumulate."""
    merged = list(new_positions)
    if old is not None:
        merged.extend(decode_inline_dv(old))
    return encode_inline_dv(merged)


# --------------------------------------------------------------------------
# Spark-side helpers shared by both warehouse read paths
# --------------------------------------------------------------------------


def locate_columns(df: DataFrame, table_dir: str) -> DataFrame:
    """Attach ``__cdl_file`` (path relative to ``table_dir``) and
    ``__cdl_pos`` (physical row index in that file) from Spark's
    hidden ``_metadata`` column. Must be applied directly on a file
    scan (before any projection that drops ``_metadata``)."""
    marker = table_dir.rstrip("/") + "/"
    fp = F.col("_metadata.file_path")
    start = F.locate(marker, fp) + F.lit(len(marker))
    return df.withColumn(
        FILE_COL, fp.substr(start, F.lit(1 << 30))
    ).withColumn(POS_COL, F.col("_metadata.row_index"))


def apply_dv(df: DataFrame, dv_df: DataFrame) -> DataFrame:
    """Drop rows whose (``__cdl_file``, ``__cdl_pos``) appear in
    ``dv_df`` (columns ``file``, ``pos``). ``df`` must already carry
    the location columns (``locate_columns``). Broadcast anti-join:
    the DV set is small by contract (compaction materializes it, and
    the delete paths cap it), so this never shuffles the table side.

    The DV frame's columns are renamed onto the reserved ``__cdl_``
    namespace before the join — joining on bare ``file``/``pos`` would
    make any table with a user column of either name unreadable
    (AMBIGUOUS_REFERENCE) the moment a merge-on-read delete landed."""
    dv = dv_df.select(
        F.col("file").alias("__cdl_dv_file"),
        F.col("pos").alias("__cdl_dv_pos"),
    )
    return df.join(
        F.broadcast(dv),
        (F.col(FILE_COL) == F.col("__cdl_dv_file"))
        & (F.col(POS_COL) == F.col("__cdl_dv_pos")),
        "left_anti",
    )
