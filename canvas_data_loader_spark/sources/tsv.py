"""TSV-gz ingest: the Spark-native version of the reference's row loop.

The reference read each whole shard into memory, gunzipped it, split
lines on \\t and decoded \\N to NULL (src/importer.rs:276-327). Spark's
CSV reader does all of that natively — decompression, splitting,
null decode, typed binding to an external schema — per input split,
streamed, vectorized, and in parallel:

    spark.read.csv(paths, sep="\\t", nullValue="\\\\N", schema=st)

At 100 TB: .gz is NOT splittable, so one shard = one task; Canvas dumps
already shard tables into many files, which preserves parallelism.
For re-staged data prefer parquet (splittable + columnar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import TableDef


def read_tsv_shards(
    spark: SparkSession,
    paths: list[str] | str,
    table_def: TableDef,
    fail_fast: bool = True,
) -> DataFrame:
    """Read gzipped TSV shards with the externally declared schema.

    Semantics matched to the reference (src/importer.rs:316-327):
    - tab separator, positional bind to schema column order
    - literal ``\\N`` decodes to NULL
    - no header row
    - NO quote handling: the reference raw-splits each line on tabs,
      so ``"`` is an ordinary character. Spark's CSV default treats a
      leading ``"`` as an opening quote and mangles the field
      (hypothesis-found: ``"0`` read back as ``0``); quote="" turns
      quoting off entirely and every byte survives verbatim.
    - typed at scan time (vs the reference's cast-at-SQL-boundary, A12)

    ``fail_fast=True`` mirrors the reference's abort-on-bad-row; pass
    False for PERMISSIVE (bad rows -> nulls) at scale.
    """
    return (
        spark.read.schema(table_def.to_struct_type())
        .options(
            sep="\t",
            nullValue="\\N",
            header="false",
            mode="FAILFAST" if fail_fast else "PERMISSIVE",
            emptyValue="",
            quote="",
        )
        .csv(paths)
    )


def stage_glob(stage_dir: str, dump_id: str, table_name: str) -> str:
    """Glob for a table's staged shards (reference src/importer.rs:198-199
    globs ``{save}/{dump_id}/*.gz``; we narrow per table since Spark
    routes by path, not by post-hoc filename parsing)."""
    return f"{stage_dir}/{dump_id}/{table_name}-*"


def read_tsv_shards_quarantine(
    spark: SparkSession,
    paths: list[str] | str,
    table_def: TableDef,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE read with a bad-row quarantine channel.

    The reference hard-fails the whole import on one malformed row
    (src/importer.rs error paths poison the rayon pool via the shared
    AtomicBool, 203/234). At 100 TB that is operationally wrong: one
    corrupt shard among thousands should not kill a day of ingest.
    This variant binds rows PERMISSIVEly and routes failures to a
    quarantine DataFrame via the ``columnNameOfCorruptRecord`` side
    channel: returns (good_rows, quarantined_raw_lines). The
    quarantine is written next to the warehouse for replay after the
    upstream fix — count it, alert on it, never silently drop it.
    """
    st = table_def.to_struct_type().add("_corrupt", "string")
    df = (
        spark.read.schema(st)
        .options(
            sep="\t",
            nullValue="\\N",
            header="false",
            mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt",
            emptyValue="",
            quote="",
        )
        .csv(paths)
        .cache()  # one scan feeds both channels
    )
    good = df.filter(df["_corrupt"].isNull()).drop("_corrupt")
    bad = df.filter(df["_corrupt"].isNotNull()).select(
        df["_corrupt"].alias("raw_line")
    )
    return good, bad
