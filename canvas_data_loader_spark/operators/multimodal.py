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


def media_capabilities() -> dict[str, bool]:
    """Which real decoders are importable here. The Spark plumbing
    never depends on these — they only select real-vs-stub decode, so
    the same pipeline code runs in a bare container (stub, tests skip)
    and a full image (PIL present, tests run)."""
    caps = {}
    try:
        import PIL.Image  # noqa: F401

        caps["image"] = True
    except ImportError:
        caps["image"] = False
    return caps


IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
    ]
)


def decode_image(payload: bytes) -> dict:
    """Real image decode when PIL is importable; otherwise the honest
    NotImplementedError (this container has no imaging libraries).
    Callers that want the pipeline shape without the capability use
    ``extract_features``'s deterministic byte stats instead."""
    if not media_capabilities()["image"]:
        raise NotImplementedError(
            "media decode requires image libraries (PIL) not present in "
            "this environment; use extract_features for pipeline testing"
        )
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(payload)) as im:
        return {"width": im.width, "height": im.height, "mode": im.mode}


def decode_images(media: DataFrame, rows_per_batch: int = 256) -> DataFrame:
    """Real image-decode pass (PIL) over binary payloads — the
    production counterpart of ``extract_features``. Raises at plan
    build when the capability is missing so the failure is immediate
    and driver-side, not a per-task executor crash loop."""
    if not media_capabilities()["image"]:
        raise NotImplementedError(
            "decode_images needs PIL on driver and executors; "
            "media_capabilities()['image'] is False here"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                rows = {"media_id": [], "width": [], "height": [], "mode": []}
                for mid, b in zip(chunk["media_id"], chunk["payload"]):
                    rows["media_id"].append(mid)
                    if b is None:
                        rows["width"].append(None)
                        rows["height"].append(None)
                        rows["mode"].append(None)
                    else:
                        d = decode_image(bytes(b))
                        rows["width"].append(d["width"])
                        rows["height"].append(d["height"])
                        rows["mode"].append(d["mode"])
                yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        batches, IMAGE_DECODE_SCHEMA
    )


def decode_stub(payload: bytes) -> dict:
    """Backwards-compatible alias for the no-capability path."""
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
