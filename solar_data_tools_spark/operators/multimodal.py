"""Multimodal (binary) column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch
shape, UDF signatures — is real and tested, and so is the decode layer
for formats that need no codec library:

- CONTAINER inspection (``sniff_media``): PNG / JPEG / GIF / BMP
  headers and WAV fmt chunks parsed in pure Python (public file-format
  specs) — true mime type, dimensions, bit depth, sample rate, duration.
- PIXEL decode (``decode_png``): full PNG decode in pure stdlib — zlib
  inflate + per-scanline unfilter (all five PNG filters) — for 8-bit
  gray/RGB/palette/alpha, feeding real pixel-statistics features.
- PCM decode (``decode_wav_pcm``): 8/16-bit PCM WAV to float samples,
  feeding real waveform features.
- BMP decode (``decode_bmp``): uncompressed 8/24/32-bit BI_RGB rows
  (bottom-up or top-down, 4-byte row padding, palette lookup).
- GIF decode (``decode_gif``): first-frame LZW decompression with
  variable code width, clear/EOI codes, global/local color tables and
  Adam-style interlace reordering.

Only genuinely codec-bound formats (JPEG entropy decode, video) fall
back to a deterministic byte-histogram feature; swap PIL/ffmpeg into
``DECODERS``/``media_feature`` without touching the Spark plan.
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
    """Deterministic fallback feature for payloads no stdlib decoder
    covers (JPEG/GIF/video): byte histogram moments. Decodable payloads
    (PNG pixels, WAV PCM) get REAL content features — see
    ``image_feature`` / ``audio_feature``."""
    if buf is None or len(buf) == 0:
        return [0.0] * dim
    arr = np.frombuffer(buf, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return [float(c.mean()) if len(c) else 0.0 for c in chunks]


def decode_png(buf: bytes) -> np.ndarray:
    """Pure-stdlib PNG pixel decode: chunk walk -> zlib inflate ->
    per-scanline unfilter (None/Sub/Up/Average/Paeth, PNG spec §9) ->
    (h, w, channels) uint8 array. Supports 8-bit depth, color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
    non-interlaced. Raises ValueError on anything else (16-bit,
    Adam7) — callers fall back to the byte-histogram feature."""
    import struct
    import zlib

    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while i + 8 <= len(buf):
        clen = struct.unpack(">I", buf[i : i + 4])[0]
        ctype = buf[i + 4 : i + 8]
        data = buf[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if nch is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = nch
    for row in range(h):
        off = row * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:
            rec = line.copy()
        elif ftype == 1:  # Sub: per-channel prefix sum mod 256
            rec = line.reshape(-1, bpp).astype(np.uint64)
            rec = np.cumsum(rec, axis=0).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            rec = line + prev
        elif ftype == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[row] = rec
        prev = rec
    img = out.reshape(h, w, nch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def decode_bmp(buf: bytes) -> np.ndarray:
    """Pure-stdlib BMP pixel decode: BITMAPINFOHEADER, uncompressed
    BI_RGB, 8-bit palette / 24-bit BGR / 32-bit BGRA, bottom-up or
    top-down rows, 4-byte row padding -> (h, w, channels) uint8 RGB.
    Raises ValueError on RLE/bitfield compression or other depths."""
    import struct

    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", buf[10:14])[0]
    hdr_size = struct.unpack("<I", buf[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack("<ii", buf[18:26])
    planes, depth = struct.unpack("<HH", buf[26:30])
    compression = struct.unpack("<I", buf[30:34])[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if depth not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {depth}")
    if w <= 0 or h_signed == 0:
        raise ValueError("bad BMP dimensions")
    h = abs(h_signed)
    bottom_up = h_signed > 0
    palette = None
    if depth == 8:
        n_colors = struct.unpack("<I", buf[46:50])[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            buf, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(-1, 4)
        palette = pal[:, [2, 1, 0]].copy()  # BGRA entries -> RGB
    bytes_per_px = depth // 8
    stride = (w * bytes_per_px + 3) & ~3  # rows padded to 4 bytes
    if len(buf) < data_off + stride * h:
        raise ValueError("truncated BMP data")
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * bytes_per_px]
    if bottom_up:
        rows = rows[::-1]
    if depth == 8:
        return palette[rows]
    px = rows.reshape(h, w, bytes_per_px)
    # stored as BGR(A); drop alpha, reorder to RGB
    return px[:, :, [2, 1, 0]].copy()


def _gif_lzw_decode(data: bytes, min_code_size: int) -> np.ndarray:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    clear/EOI codes, dictionary capped at 4096 entries -> uint8 indices."""
    clear_code = 1 << min_code_size
    eoi_code = clear_code + 1
    # bit reader: GIF packs codes little-endian, LSB first
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    pos = 0
    n_bits = len(bits)

    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(clear_code)] + [b"", b""]

    table = fresh_table()
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    while pos + code_size <= n_bits:
        code = 0
        for k in range(code_size):
            code |= int(bits[pos + k]) << k
        pos += code_size
        if code == clear_code:
            table = fresh_table()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi_code:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        prev = entry
        if len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
    return np.frombuffer(bytes(out), dtype=np.uint8)


def decode_gif(buf: bytes) -> np.ndarray:
    """Pure-stdlib GIF decode of the FIRST image frame: logical screen
    descriptor, global/local color table, sub-block reassembly, LZW
    decompression (variable code width, clear/EOI), interlace
    reordering -> (h, w, 3) uint8 RGB. Raises ValueError on truncated
    or malformed streams."""
    import struct

    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = buf[10]
    gct = None
    i = 13
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        gct = np.frombuffer(
            buf, dtype=np.uint8, count=gct_size * 3, offset=13
        ).reshape(-1, 3)
        i = 13 + gct_size * 3
    while i < len(buf):
        block = buf[i]
        if block == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(buf) and buf[i] != 0:
                i += 1 + buf[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h = struct.unpack("<HHHH", buf[i + 1 : i + 9])
            img_flags = buf[i + 9]
            i += 10
            table = gct
            if img_flags & 0x80:
                lct_size = 2 << (img_flags & 0x07)
                table = np.frombuffer(
                    buf, dtype=np.uint8, count=lct_size * 3, offset=i
                ).reshape(-1, 3)
                i += lct_size * 3
            if table is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = buf[i]
            i += 1
            lzw = bytearray()
            while i < len(buf) and buf[i] != 0:
                n = buf[i]
                lzw.extend(buf[i + 1 : i + 1 + n])
                i += 1 + n
            idx = _gif_lzw_decode(bytes(lzw), min_code_size)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            idx = idx[: w * h].reshape(h, w)
            if img_flags & 0x40:  # interlaced: 4-pass row shuffle
                deinter = np.empty_like(idx)
                rows = np.concatenate(
                    [
                        np.arange(0, h, 8),
                        np.arange(4, h, 8),
                        np.arange(2, h, 4),
                        np.arange(1, h, 2),
                    ]
                )
                deinter[rows] = idx
                idx = deinter
            if int(idx.max(initial=0)) >= len(table):
                raise ValueError("GIF palette index out of range")
            return table[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def decode_wav_pcm(buf: bytes) -> tuple[np.ndarray, int]:
    """Pure-stdlib WAV decode: RIFF chunk walk -> PCM frames as a MONO
    float64 array in [-1, 1] (16-bit and 8-bit PCM; multi-channel audio
    is de-interleaved and averaged to mono so waveform statistics and
    duration are channel-count independent), plus the sample rate.
    Raises ValueError on compressed/float WAV."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(buf):
        cid = buf[i : i + 4]
        clen = struct.unpack("<I", buf[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(buf):
            fmt = struct.unpack("<HHIIHH", buf[i + 8 : i + 24])
        elif cid == b"data":
            data = buf[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen % 2)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data")
    audio_fmt, n_ch, rate, _brate, _ba, depth = fmt
    if audio_fmt != 1:
        raise ValueError(f"unsupported WAV format {audio_fmt}")
    n_ch = int(n_ch)
    if not (1 <= n_ch <= 64):
        # corrupt fmt chunk: raise so media_feature routes the payload
        # to the byte-histogram fallback instead of emitting an
        # all-zeros "real" feature (zero decodable frames)
        raise ValueError(f"implausible WAV channel count {n_ch}")
    if depth == 16:
        samples = np.frombuffer(
            data[: len(data) - (len(data) % 2)], dtype="<i2"
        ).astype(np.float64) / 32768.0
    elif depth == 8:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {depth}")
    if n_ch > 1:
        n_frames = len(samples) // n_ch
        samples = samples[: n_frames * n_ch].reshape(-1, n_ch).mean(axis=1)
    return samples, int(rate)


def image_feature(img: np.ndarray, dim: int = 8) -> list[float]:
    """Deterministic 8-dim feature from decoded pixels: per-channel
    means, gray mean/std, horizontal edge energy, aspect ratio, fill."""
    h, w = img.shape[:2]
    px = img.reshape(h, w, -1).astype(np.float64)
    nch = px.shape[2]
    chan_means = [float(px[:, :, c].mean()) for c in range(min(nch, 3))]
    while len(chan_means) < 3:
        chan_means.append(chan_means[-1])
    gray = px[:, :, : min(nch, 3)].mean(axis=2)
    edge = float(np.abs(np.diff(gray, axis=1)).mean()) if w > 1 else 0.0
    feat = [
        chan_means[0],
        chan_means[1],
        chan_means[2],
        float(gray.mean()),
        float(gray.std()),
        edge,
        float(w) / float(h) if h else 0.0,
        float((gray > 127.5).mean()),
    ]
    return feat[:dim] + [0.0] * max(0, dim - len(feat))


def audio_feature(samples: np.ndarray, rate: int, dim: int = 8) -> list[float]:
    """Deterministic 8-dim feature from decoded PCM: rms, peak, mean,
    zero-crossing rate, mean abs delta (spectral-tilt proxy), duration,
    rate, dynamic range."""
    if len(samples) == 0:
        return [0.0] * dim
    zc = float(np.mean(np.abs(np.diff(np.sign(samples))) > 0)) if len(samples) > 1 else 0.0
    mad = float(np.abs(np.diff(samples)).mean()) if len(samples) > 1 else 0.0
    feat = [
        float(np.sqrt(np.mean(samples**2))),
        float(np.abs(samples).max()),
        float(samples.mean()),
        zc,
        mad,
        float(len(samples)) / float(rate) if rate else 0.0,
        float(rate),
        float(samples.max() - samples.min()),
    ]
    return feat[:dim] + [0.0] * max(0, dim - len(feat))


def media_feature(buf: bytes, dim: int = 8) -> list[float]:
    """Content feature: REAL pixel/PCM statistics for formats the pure-
    stdlib decoders cover (PNG, BMP, GIF, PCM WAV), byte-histogram
    fallback for the rest (JPEG/video). Deterministic either way."""
    import struct
    import zlib

    if buf:
        try:
            if buf[:8] == b"\x89PNG\r\n\x1a\n":
                return image_feature(decode_png(buf), dim)
            if buf[:2] == b"BM":
                return image_feature(decode_bmp(buf), dim)
            if buf[:6] in (b"GIF87a", b"GIF89a"):
                return image_feature(decode_gif(buf), dim)
            if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
                samples, rate = decode_wav_pcm(buf)
                return audio_feature(samples, rate, dim)
        except (ValueError, IndexError, struct.error, zlib.error):
            # corrupt container/stream (bad IDAT, truncated header,
            # palette index out of range, ...): one malformed file must
            # degrade to the fallback feature, never fail the task
            pass
    return _fake_feature(buf, dim)


DECODERS = {
    "image/png": decode_png,
    "image/bmp": decode_bmp,
    "image/gif": decode_gif,
    "audio/wav": decode_wav_pcm,
}


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
                media_feature(b, batch_feature_dim) for b in pdf["content"]
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
