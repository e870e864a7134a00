"""Multimodal (binary) column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested; the actual codec work is stubbed
behind ``DECODERS`` because media libraries are not available in this
environment (documented contract: swap in PIL/torchaudio/ffmpeg decoders
without touching the plan).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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
        StructField("modality", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_s", DoubleType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def _fake_feature(buf: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: byte
    histogram moments. Replace with a real decode+embed when codecs exist."""
    if buf is None or len(buf) == 0:
        return [0.0] * dim
    arr = np.frombuffer(buf, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return [float(c.mean()) if len(c) else 0.0 for c in chunks]


def decode_image(buf: bytes) -> "np.ndarray":
    """Image decode stub — plug PIL/opencv here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "extract_features() uses a deterministic fake feature instead"
    )


DECODERS = {"image": decode_image}


def extract_features(media: DataFrame, batch_feature_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow-batched: each pandas batch holds whole binary payloads; partition
    sizing should target ~64-128 MB of media per task (set
    ``spark.sql.files.maxPartitionBytes`` accordingly when the source is a
    binary-file datasource). The feature computation is the stubbed part;
    the distribution plan is production-shaped.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [
                _fake_feature(b, batch_feature_dim) for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["content"]],
                    "content_hash": [
                        hashlib.md5(b).hexdigest() if b else None
                        for b in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def read_binary_files(spark, path: str, modality: str) -> DataFrame:
    """Binary-file datasource -> MEDIA_SCHEMA shape. ``binaryFile`` is the
    built-in scalable reader (no driver-side file listing bottleneck when
    paired with a partitioned layout)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.col("content"),
        F.lit(None).cast("string").alias("mime_type"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("double").alias("duration_s"),
    )
