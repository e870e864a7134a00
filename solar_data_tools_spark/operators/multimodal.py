"""Multimodal (binary) column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch
shape, UDF signatures — is real and tested, and so is CONTAINER-level
media inspection: ``sniff_media`` parses PNG / JPEG / GIF / BMP headers
and WAV fmt chunks in pure Python (format magics are public file-format
specs), giving true mime type, dimensions, bit depth, sample rate, and
duration without any codec library. Only PIXEL/PCM decoding is stubbed
behind ``DECODERS`` (media codec libraries are not available in this
environment; swap in PIL/torchaudio/ffmpeg without touching the plan).
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
        StructField("sniffed_mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("sample_rate_hz", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def sniff_media(buf: bytes) -> dict:
    """Parse container headers of common media formats (pure stdlib).

    Returns {mime_type, width, height, duration_s, bit_depth,
    sample_rate_hz, channels} with None where not applicable/parseable.
    Formats: PNG (IHDR), JPEG (SOF0/1/2 markers), GIF (logical screen
    descriptor), BMP (BITMAPINFOHEADER), WAV (RIFF fmt + data chunks).
    """
    import struct

    out = {
        "mime_type": None,
        "width": None,
        "height": None,
        "duration_s": None,
        "bit_depth": None,
        "sample_rate_hz": None,
        "channels": None,
    }
    if not buf or len(buf) < 12:
        return out
    # PNG: 8-byte signature, IHDR is the first chunk
    if buf[:8] == b"\x89PNG\r\n\x1a\n" and len(buf) >= 26:
        out["mime_type"] = "image/png"
        w, h = struct.unpack(">II", buf[16:24])
        out["width"], out["height"] = int(w), int(h)
        out["bit_depth"] = int(buf[24])
        return out
    # JPEG: scan markers for a start-of-frame segment
    if buf[:2] == b"\xff\xd8":
        out["mime_type"] = "image/jpeg"
        i = 2
        while i + 9 < len(buf):
            if buf[i] != 0xFF:
                i += 1
                continue
            marker = buf[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > len(buf):
                break
            seg_len = struct.unpack(">H", buf[i + 2 : i + 4])[0]
            # SOF0..SOF15 except DHT(C4)/DAC(CC)/RST
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(buf):
                    out["bit_depth"] = int(buf[i + 4])
                    h, w = struct.unpack(">HH", buf[i + 5 : i + 9])
                    out["width"], out["height"] = int(w), int(h)
                return out
            i += 2 + seg_len
        return out
    # GIF: logical screen descriptor right after the 6-byte signature
    if buf[:6] in (b"GIF87a", b"GIF89a") and len(buf) >= 10:
        out["mime_type"] = "image/gif"
        w, h = struct.unpack("<HH", buf[6:10])
        out["width"], out["height"] = int(w), int(h)
        return out
    # BMP: BITMAPINFOHEADER at offset 14
    if buf[:2] == b"BM" and len(buf) >= 26:
        out["mime_type"] = "image/bmp"
        w, h = struct.unpack("<ii", buf[18:26])
        out["width"], out["height"] = int(w), abs(int(h))
        return out
    # WAV: RIFF container, fmt chunk carries rate/channels/depth, data
    # chunk length gives the duration
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        out["mime_type"] = "audio/wav"
        i = 12
        byte_rate = None
        data_len = None
        while i + 8 <= len(buf):
            cid = buf[i : i + 4]
            clen = struct.unpack("<I", buf[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(buf):
                (_fmt, ch, rate, brate, _ba, depth) = struct.unpack(
                    "<HHIIHH", buf[i + 8 : i + 24]
                )
                out["channels"] = int(ch)
                out["sample_rate_hz"] = int(rate)
                out["bit_depth"] = int(depth)
                byte_rate = brate
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen % 2)
        if byte_rate and data_len is not None:
            out["duration_s"] = float(data_len) / float(byte_rate)
        return out
    return out


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
            sniffed = [sniff_media(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["content"]],
                    "content_hash": [
                        hashlib.md5(b).hexdigest() if b else None
                        for b in pdf["content"]
                    ],
                    "sniffed_mime": [s["mime_type"] for s in sniffed],
                    "width": pd.array(
                        [s["width"] for s in sniffed], dtype="Int64"
                    ),
                    "height": pd.array(
                        [s["height"] for s in sniffed], dtype="Int64"
                    ),
                    "duration_s": [s["duration_s"] for s in sniffed],
                    "sample_rate_hz": pd.array(
                        [s["sample_rate_hz"] for s in sniffed], dtype="Int64"
                    ),
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
