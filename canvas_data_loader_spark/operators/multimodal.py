"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a typed metadata
struct alongside. The Spark-side machinery — schema, batching,
``mapInPandas`` signatures, partition sizing — is real and tested; the
actual media decode is stubbed (decode libs are not in this container)
behind ``decode_stub`` which raises, and ``fake_decode`` which produces
deterministic features so the pipeline shape is exercisable end-to-end.

Scale notes: media rows are WIDE — repartition by row count, not
bytes, before a decode pass (``rows_per_batch``), and keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low so a single Arrow
batch of decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def to_media_table(df: DataFrame, id_col: str, text_col: str, source_col: str) -> DataFrame:
    """Wrap a text corpus as a media table (payload = utf-8 bytes).

    Stands in for real image/audio ingestion; exercises the binary
    column + metadata-struct layout end-to-end.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> dict:
    """Real media decode — requires PIL/ffmpeg, not in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; use fake_decode for pipeline testing"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("byte_sum_mod", T.LongType(), True),
    ]
)


def extract_features(media: DataFrame, rows_per_batch: int = 1024) -> DataFrame:
    """Feature-extraction pass over binary payloads via mapInPandas.

    The decode step is a deterministic fake (byte stats) — the Arrow
    batch shape, schema, and partitioning are the real contract. A
    production decode swaps the inner function only.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if b else None
                    ).astype("Int32"),
                    "byte_sum_mod": payloads.map(
                        lambda b: int(sum(b) % 1_000_003) if b is not None else None
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, rows_per_batch: int = 256
) -> DataFrame:
    """Image-resize pass: mapInPandas over binary payloads.

    The resize itself is stubbed deterministically (payload truncated
    to width*height bytes, dimensions echoed) — a real build swaps in
    PIL/libvips inside the batch function. Batches are re-chunked to
    ``rows_per_batch`` rows so a batch of decoded images bounds Arrow
    memory regardless of upstream partition sizes — the contract that
    matters at scale, where one parquet row group can hold thousands
    of multi-MB payloads.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "payload": chunk["payload"].map(
                            lambda b: bytes(b[: width * height])
                            if b is not None
                            else None
                        ),
                        "width": width,
                        "height": height,
                    }
                )

    return media.select("media_id", "payload").mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling pass: one input row fans out to N frame
    rows (explode-shaped mapInPandas). The 'frame' is a deterministic
    byte slice standing in for an ffmpeg keyframe grab; the fan-out
    schema (media_id, frame_no, frame) and batch amplification are the
    real contract — downstream per-frame ops join/aggregate on
    (media_id, frame_no)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None:
                    continue
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(bytes(b[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.select("media_id", "payload").mapInPandas(batches, FRAME_SCHEMA)
