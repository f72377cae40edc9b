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
