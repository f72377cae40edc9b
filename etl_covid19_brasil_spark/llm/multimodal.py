"""Multimodal column plumbing (SURVEY.md §2.10 / BASELINE.json north star).

Images/audio/video are carried as opaque ``binary`` columns plus a typed
metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` stages so each Python worker touches a whole batch at a
time (the only sane shape for media decoding on a cluster — per-row UDFs
pay the serialization tax per record).

The actual media codecs (PIL/ffmpeg/torchaudio) are NOT present in this
environment, so the decode kernel is stubbed: ``decode_image_stub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it emits a
deterministic fake feature vector derived from the payload bytes. The
Spark-side plumbing — schema, batching, partitioning — is real and tested
(tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: wrap the documents table as a media table (text payload as
    bytes) so the plumbing is exercised on driver test data."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.col("n_chars").alias("meta_width"),
        F.lit(1).cast("long").alias("meta_height"),
    )


def decode_image_stub(payload: bytes, fake: bool) -> list[float]:
    """Decode kernel placeholder. Real deployments swap in PIL/libvips here.

    With ``fake=True`` emits a deterministic 8-dim byte-histogram feature
    so the distributed plumbing can be tested end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not installed in this environment; "
            "pass fake=True to exercise the pipeline with stub features"
        )
    hist = [0.0] * 8
    for byte in payload:
        hist[byte % 8] += 1.0
    total = max(len(payload), 1)
    return [h / total for h in hist]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` receives an iterator of record batches — the kernel
    processes whole batches, and output rows stream back without
    materializing the partition.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": pdf["payload"].map(lambda p: decode_image_stub(bytes(p), fake)),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize stage: same schema in and out, meta updated to the target
    dimensions. The pixel work is stubbed (no codecs here — a real
    deployment decodes, resamples, re-encodes inside this kernel); the
    fake path truncates/pads the payload to width*height bytes so output
    size actually tracks the requested dimensions and downstream stages
    see realistic batch shapes.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs are not installed; pass fake=True"
                )
            out = pdf.copy()
            out["payload"] = out["payload"].map(
                lambda p: bytes(p)[:target].ljust(target, b"\0")
            )
            out["meta_width"] = width
            out["meta_height"] = height
            yield out

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def register_frame_sampler(spark, n_default: int = 4) -> None:
    """Register ``sample_frames`` — a Python UDTF (SURVEY.md §2.11 tier 4:
    one-to-many expansion) that splits a video payload into n evenly-
    spaced "frames". Stub decode: frames are contiguous byte slices (a
    real deployment seeks keyframes via ffmpeg here); the one-to-many
    relational shape, lateral-join usage, and frame indexing are the real
    100 TB plumbing.

    SQL usage::

        SELECT m.media_id, f.frame_idx, f.frame_bytes
        FROM media m, LATERAL sample_frames(m.payload, 4) f
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="frame_idx int, n_frames int, frame_bytes binary")
    class SampleFrames:
        def eval(self, payload, n):  # noqa: ANN001
            n = int(n) if n is not None else n_default
            if payload is None or n <= 0:
                return
            data = bytes(payload)
            step = max(len(data) // n, 1)
            for i in range(min(n, len(data))):
                yield i, n, data[i * step : (i + 1) * step]

    spark.udtf.register("sample_frames", SampleFrames)
