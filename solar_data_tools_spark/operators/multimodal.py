"""Multimodal (binary) column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch
shape, UDF signatures — is real and tested, and so is the decode layer
for formats that need no codec library:

- CONTAINER inspection (``sniff_media``): PNG / JPEG / GIF / BMP /
  WebP headers, WAV fmt chunks, and MP4/ISO-BMFF box trees (moov ->
  mvhd duration, trak -> tkhd dimensions) parsed in pure Python (public
  file-format specs) — true mime type, dimensions, bit depth, sample
  rate, duration.
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

Transform stages (``resize_media``: bilinear resize to fixed RGB24
buffers; ``sample_frames``: uniform temporal sampling with REAL
animated-GIF frame decode + composition, metadata-true MP4 timestamps)
run as the same Arrow-batched mapInPandas plan. JPEG decode covers
baseline (SOF0/1) AND progressive (SOF2, full successive-approximation
refinement). VIDEO decode is real for Motion-JPEG in AVI
(``decode_avi_mjpeg_frames``: RIFF walk -> per-frame JPEG decode, with
an ``encode_avi_mjpeg`` writer for synthesis); the ONLY remaining
fallback is inter-frame video-codec entropy decode (H.264 etc. —
genuinely impossible without a codec library), which degrades to a
deterministic byte-histogram feature; swap ffmpeg into
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
    BooleanType,
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
    descriptor), BMP (BITMAPINFOHEADER), WAV (RIFF fmt + data chunks),
    WebP (RIFF; VP8/VP8L/VP8X headers), MP4/ISO-BMFF (ftyp; moov/mvhd
    duration, trak/tkhd dimensions).
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
    # WebP: RIFF container; dimensions from VP8 (lossy keyframe), VP8L
    # (lossless) or VP8X (extended canvas) chunk headers
    if buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        out["mime_type"] = "image/webp"
        i = 12
        while i + 8 <= len(buf):
            cid = buf[i : i + 4]
            clen = struct.unpack("<I", buf[i + 4 : i + 8])[0]
            body = i + 8
            if cid == b"VP8X" and body + 10 <= len(buf):
                w = int.from_bytes(buf[body + 4 : body + 7], "little") + 1
                h = int.from_bytes(buf[body + 7 : body + 10], "little") + 1
                out["width"], out["height"] = w, h
                return out
            if cid == b"VP8 " and body + 10 <= len(buf):
                # keyframe: 3-byte frame tag, 0x9d012a start code, then
                # 14-bit width / height (low 14 of the 16-bit LE fields)
                if buf[body + 3 : body + 6] == b"\x9d\x01\x2a":
                    w = struct.unpack("<H", buf[body + 6 : body + 8])[0]
                    h = struct.unpack("<H", buf[body + 8 : body + 10])[0]
                    out["width"], out["height"] = w & 0x3FFF, h & 0x3FFF
                return out
            if cid == b"VP8L" and body + 5 <= len(buf):
                if buf[body] == 0x2F:  # lossless signature byte
                    bits = int.from_bytes(buf[body + 1 : body + 5], "little")
                    out["width"] = (bits & 0x3FFF) + 1
                    out["height"] = ((bits >> 14) & 0x3FFF) + 1
                return out
            i += 8 + clen + (clen % 2)
        return out
    # AVI: RIFF container; avih (main header) carries frame period,
    # frame count, and canvas dimensions
    if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        out["mime_type"] = "video/avi"
        try:
            mspf, n_frames, w, h, _ = _avi_parse(buf, want_frames=False)
            out["width"], out["height"] = w, h
            if mspf and n_frames:
                out["duration_s"] = mspf * n_frames / 1e6
        except (ValueError, IndexError, struct.error):
            pass
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
    # MP4 / ISO-BMFF: ftyp box first, then walk moov -> mvhd (timescale,
    # duration) and trak -> tkhd (16.16 fixed-point width/height; audio
    # tracks carry 0x0 so the max over tracks is the video size)
    if len(buf) >= 12 and buf[4:8] == b"ftyp":
        out["mime_type"] = "video/mp4"

        def walk(lo: int, hi: int):
            i = lo
            while i + 8 <= hi:
                size = struct.unpack(">I", buf[i : i + 4])[0]
                btype = buf[i + 4 : i + 8]
                body = i + 8
                if size == 1:  # 64-bit largesize follows the type
                    if i + 16 > hi:
                        return
                    size = struct.unpack(">Q", buf[i + 8 : i + 16])[0]
                    body = i + 16
                elif size == 0:  # box extends to end of enclosing scope
                    size = hi - i
                if size < 8 or i + size > hi:
                    return
                yield btype, body, i + size
                i += size

        for btype, body, end in walk(0, len(buf)):
            if btype != b"moov":
                continue
            for ctype, cbody, cend in walk(body, end):
                if ctype == b"mvhd" and cbody + 4 <= cend:
                    ver = buf[cbody]
                    if ver == 1 and cbody + 32 <= cend:
                        ts, dur = struct.unpack(
                            ">IQ", buf[cbody + 20 : cbody + 32]
                        )
                    elif cbody + 20 <= cend:
                        ts, dur = struct.unpack(
                            ">II", buf[cbody + 12 : cbody + 20]
                        )
                    else:
                        continue
                    if ts:
                        out["duration_s"] = float(dur) / float(ts)
                elif ctype == b"trak":
                    for ttype, tbody, tend in walk(cbody, cend):
                        if ttype != b"tkhd":
                            continue
                        off = tbody + (88 if buf[tbody] == 1 else 76)
                        if off + 8 <= tend:
                            w_fp, h_fp = struct.unpack(
                                ">II", buf[off : off + 8]
                            )
                            w, h = w_fp >> 16, h_fp >> 16
                            if w and h:
                                out["width"] = max(out["width"] or 0, w)
                                out["height"] = max(out["height"] or 0, h)
        return out
    return out


def _fake_feature(buf: bytes, dim: int = 8) -> list[float]:
    """Deterministic fallback feature for payloads no stdlib decoder
    covers (video codecs, corrupt streams): byte histogram moments.
    Decodable payloads (PNG/JPEG/BMP/GIF pixels, WAV PCM) get REAL
    content features — see ``image_feature`` / ``audio_feature``."""
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


def _jpeg_zigzag() -> np.ndarray:
    """Standard JPEG zigzag order, generated by the diagonal walk (no
    hand-transcribed table): zz[k] = linear index into the 8x8 block of
    the k-th coefficient in transmission order."""
    order = []
    for s in range(15):  # anti-diagonals r+c = s
        rng = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(s - c, c) for c in rng]  # ascending column
        if s % 2 == 1:
            diag = diag[::-1]  # odd diagonals run top-right -> bottom-left
        order.extend(r * 8 + c for r, c in diag)
    return np.array(order, dtype=np.int64)


_JPEG_ZZ = _jpeg_zigzag()
# orthonormal DCT-II basis: IDCT(block) = C.T @ block @ C
_DCT_C = np.array(
    [
        [
            (1.0 / np.sqrt(8.0) if k == 0 else 0.5)
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


class _JpegBitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    byte-stuffing removal and restart-marker awareness."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.i = start
        self.bit = 0

    def read_bit(self) -> int:
        d = self.data
        if self.i >= len(d):
            raise ValueError("JPEG entropy data exhausted")
        byte = d[self.i]
        if byte == 0xFF:
            nxt = d[self.i + 1] if self.i + 1 < len(d) else None
            if nxt != 0x00:
                raise ValueError("marker inside entropy data")
        b = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.i += 1 + (1 if byte == 0xFF else 0)  # skip stuffed 0x00
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self) -> None:
        if self.bit != 0:
            self.bit = 0
            self.i += 1 + (1 if self.data[self.i] == 0xFF else 0)
        if not (
            self.i + 1 < len(self.data)
            and self.data[self.i] == 0xFF
            and 0xD0 <= self.data[self.i + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        self.i += 2


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, size: int) -> int:
    # magnitude category decode: leading 0 bit means negative
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Pure-stdlib JPEG decode, BASELINE (SOF0/1) and PROGRESSIVE
    (SOF2, ITU T.81 Annex G): marker walk -> DQT/DHT/SOF/SOS(+DRI) ->
    Huffman entropy decode (byte-stuffing, restart markers, DC
    prediction; for progressive: spectral-selection bands, EOB runs,
    and successive-approximation first/refinement passes accumulated
    into persistent coefficient planes across scans) -> dequantize ->
    de-zigzag -> vectorized orthonormal IDCT -> chroma upsample (any
    integer sampling factors incl. 4:2:0/4:2:2) -> YCbCr->RGB ->
    (h, w, channels) uint8. Raises ValueError on arithmetic-coded,
    hierarchical, 12-bit, or truncated streams — callers fall back
    to the byte-histogram feature. JPEG is lossy: output equals the
    encoder's pixels only to quantization tolerance."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    coef = None  # progressive: per-comp zigzag coefficient planes
    ri = 0
    i = 2
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = buf[i + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(buf[i + 2 : i + 4], "big")
        seg = buf[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit JPEG quant table unsupported")
                q = np.frombuffer(seg, np.uint8, 64, j + 1).astype(np.int32)
                tbl = np.zeros(64, np.int32)
                tbl[_JPEG_ZZ] = q  # DQT is stored in zigzag order
                qtables[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = seg[j + 1 : j + 17]
                vals = seg[j + 17 : j + 17 + sum(counts)]
                table: dict[tuple[int, int], int] = {}
                code, vi = 0, 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                htables[(tc, th)] = table
                j += 17 + len(vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if seg[0] != 8:
                raise ValueError("non-8-bit JPEG unsupported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
            if marker == 0xC2:
                progressive = True
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                frame["hmax"], frame["vmax"] = hmax, vmax
                frame["mcux"], frame["mcuy"] = mcux, mcuy
                coef = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            ri = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}
            order = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 0x0F)
                order.append(cid)
            if not progressive:
                return _jpeg_decode_scan(
                    buf, i + 2 + seg_len, frame, sel, qtables, htables, ri
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            end = _jpeg_progressive_scan(
                buf, i + 2 + seg_len, frame, order, sel, ss, se,
                ahal >> 4, ahal & 0x0F, htables, ri, coef,
            )
            i = end
            continue
        i += 2 + seg_len
    if progressive and coef is not None:
        return _jpeg_reconstruct(frame, coef, qtables)
    raise ValueError("JPEG has no scan")


def _jpeg_decode_scan(buf, start, frame, sel, qtables, htables, ri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _JpegBitReader(buf, start)
    # coefficient storage per component: (blocks_y, blocks_x, 8, 8)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"], mcux * c["h"], 8, 8), np.float64)
        )
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and n_mcu and n_mcu % ri == 0:
                reader.align_and_expect_rst()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = htables.get((0, sel[c["id"]][0]))
                ac_t = htables.get((1, sel[c["id"]][1]))
                if dc_t is None or ac_t is None:
                    raise ValueError("missing JPEG Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, np.float64)
                        s = _jpeg_huff_decode(reader, dc_t)
                        diff = _jpeg_extend(reader.read_bits(s), s)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _jpeg_huff_decode(reader, ac_t)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coeffs[k] = _jpeg_extend(
                                reader.read_bits(size), size
                            )
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[_JPEG_ZZ] = coeffs
                        planes[ci][
                            my * c["v"] + by, mx * c["h"] + bx
                        ] = block.reshape(8, 8)
            n_mcu += 1
    # dequantize + IDCT, vectorized per component
    out_planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("missing JPEG quant table")
        blk = planes[ci] * q[None, None]
        px = np.einsum("ij,abjk,kl->abil", _DCT_C.T, blk, _DCT_C) + 128.0
        by, bx = px.shape[:2]
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full resolution and crop
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )[:h, :w]
        out_planes.append(plane)
    return _jpeg_planes_to_rgb(out_planes)


def _jpeg_planes_to_rgb(out_planes: list) -> np.ndarray:
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _jpeg_refine_nonzero(reader, vec, k, al):
    """Successive-approximation correction bit for an already-nonzero
    coefficient (T.81 G.1.2.3: append bit Al if the stream says so,
    pushing the magnitude away from zero)."""
    if reader.read_bit() and (int(vec[k]) & (1 << al)) == 0:
        vec[k] += (1 << al) if vec[k] >= 0 else -(1 << al)


def _jpeg_comp_blocks(frame, c):
    """Non-interleaved block grid of one component (T.81 A.1.1/A.2.4):
    ceil over the component's own sample dimensions."""
    comp_h = -(-frame["h"] * c["v"] // frame["vmax"])
    comp_w = -(-frame["w"] * c["h"] // frame["hmax"])
    return -(-comp_h // 8), -(-comp_w // 8)


def _jpeg_progressive_scan(
    buf, start, frame, order, sel, ss, se, ah, al, htables, ri, coef
):
    """Decode ONE progressive scan (T.81 Annex G) into the persistent
    per-component zigzag coefficient planes ``coef``. Four scan kinds:
    DC first / DC refine (Ss=0, possibly interleaved), AC first / AC
    refine (spectral band of a single component, EOB-run coded).
    Returns the buffer offset of the next marker after the scan."""
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    reader = _JpegBitReader(buf, start)
    scan_ci = [next(i for i, c in enumerate(comps) if c["id"] == cid)
               for cid in order]
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        pred = [0] * len(scan_ci)
        if len(scan_ci) > 1:  # interleaved DC scan: MCU order
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    mcu = []
                    for si, ci in enumerate(scan_ci):
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                mcu.append(
                                    (si, ci, my * c["v"] + by, mx * c["h"] + bx)
                                )
                    units.append(mcu)
        else:
            ci = scan_ci[0]
            c = comps[ci]
            nby, nbx = _jpeg_comp_blocks(frame, c)
            units = [[(0, ci, by, bx)] for by in range(nby) for bx in range(nbx)]
        n_unit = 0
        for mcu in units:
            if ri and n_unit and n_unit % ri == 0:
                reader.align_and_expect_rst()
                pred = [0] * len(scan_ci)
            for si, ci, by, bx in mcu:
                vec = coef[ci][by, bx]
                if ah == 0:  # DC first: Huffman diff, shifted by Al
                    dc_t = htables.get((0, sel[comps[ci]["id"]][0]))
                    if dc_t is None:
                        raise ValueError("missing JPEG Huffman table")
                    s = _jpeg_huff_decode(reader, dc_t)
                    pred[si] += _jpeg_extend(reader.read_bits(s), s)
                    vec[0] = pred[si] << al
                else:  # DC refine: one appended bit per block
                    if reader.read_bit():
                        vec[0] = int(vec[0]) | (1 << al)
            n_unit += 1
    else:
        if len(scan_ci) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci = scan_ci[0]
        c = comps[ci]
        ac_t = htables.get((1, sel[c["id"]][1]))
        if ac_t is None:
            raise ValueError("missing JPEG Huffman table")
        nby, nbx = _jpeg_comp_blocks(frame, c)
        eobrun = 0
        n_blk = 0
        for by in range(nby):
            for bx in range(nbx):
                if ri and n_blk and n_blk % ri == 0:
                    reader.align_and_expect_rst()
                    eobrun = 0
                n_blk += 1
                vec = coef[ci][by, bx]
                if ah == 0:  # AC first pass over the band
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _jpeg_huff_decode(reader, ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:  # EOBn: run of end-of-bands
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC index overflow")
                        vec[k] = _jpeg_extend(reader.read_bits(s), s) << al
                        k += 1
                else:  # AC refinement pass (T.81 G.1.2.3)
                    if eobrun > 0:
                        eobrun -= 1
                        for k in range(ss, se + 1):
                            if vec[k] != 0:
                                _jpeg_refine_nonzero(reader, vec, k, al)
                        continue
                    k = ss
                    while k <= se:
                        rs = _jpeg_huff_decode(reader, ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:  # EOBn: refine the rest, then run
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read_bits(r)
                                while k <= se:
                                    if vec[k] != 0:
                                        _jpeg_refine_nonzero(reader, vec, k, al)
                                    k += 1
                                break
                            # r == 15: ZRL — skip 16 zero-history slots
                        elif s == 1:
                            newval = (1 << al) if reader.read_bit() else -(1 << al)
                        else:
                            raise ValueError("bad AC refinement size")
                        # advance past r zero-history coefficients,
                        # refining the nonzero ones passed over
                        while k <= se:
                            if vec[k] != 0:
                                _jpeg_refine_nonzero(reader, vec, k, al)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            vec[k] = newval
                        k += 1
    # scan forward from the reader position to the next true marker
    # (skipping stuffed 0xFF00 and any RSTn the loop didn't consume)
    i = reader.i
    while i + 1 < len(buf):
        if (
            buf[i] == 0xFF
            and buf[i + 1] != 0x00
            and not (0xD0 <= buf[i + 1] <= 0xD7)
        ):
            return i
        i += 1
    return len(buf)


def _jpeg_reconstruct(frame, coef, qtables):
    """Progressive finish: de-zigzag + dequantize the accumulated
    coefficient planes, IDCT, upsample, color-convert (same math as the
    baseline path)."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    out_planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("missing JPEG quant table")
        by, bx = coef[ci].shape[:2]
        blk = np.zeros((by, bx, 64), np.float64)
        blk[:, :, _JPEG_ZZ] = coef[ci]
        blk = blk.reshape(by, bx, 8, 8) * q[None, None]
        px = np.einsum("ij,abjk,kl->abil", _DCT_C.T, blk, _DCT_C) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )[:h, :w]
        out_planes.append(plane)
    return _jpeg_planes_to_rgb(out_planes)


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


def _gif_parse(buf: bytes):
    """Shared GIF block walk: logical screen + every frame.

    Returns (screen_w, screen_h, bg_index, gct, frames) where each frame
    is a dict {x, y, w, h, idx (h x w palette indices, de-interlaced),
    table (n x 3 uint8), delay_cs, transparent_idx, disposal} with the
    animation attributes taken from the frame's preceding Graphic
    Control Extension (delay in 1/100 s). Raises ValueError on
    truncated or malformed streams."""
    import struct

    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    screen_w, screen_h = struct.unpack("<HH", buf[6:10])
    flags = buf[10]
    bg_index = buf[11]
    gct = None
    i = 13
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        gct = np.frombuffer(
            buf, dtype=np.uint8, count=gct_size * 3, offset=13
        ).reshape(-1, 3)
        i = 13 + gct_size * 3
    frames = []
    gce = {"delay_cs": 0, "transparent_idx": None, "disposal": 0}
    while i < len(buf):
        block = buf[i]
        if block == 0x21:  # extension: label + sub-blocks
            label = buf[i + 1] if i + 1 < len(buf) else 0
            i += 2
            if label == 0xF9 and i + 5 <= len(buf) and buf[i] >= 4:
                packed = buf[i + 1]
                delay = struct.unpack("<H", buf[i + 2 : i + 4])[0]
                gce = {
                    "delay_cs": delay,
                    "transparent_idx": buf[i + 4] if packed & 0x01 else None,
                    "disposal": (packed >> 2) & 0x07,
                }
            while i < len(buf) and buf[i] != 0:
                i += 1 + buf[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            x, y, w, h = struct.unpack("<HHHH", buf[i + 1 : i + 9])
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
            i += 1  # block terminator
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
            frames.append({"x": x, "y": y, "w": w, "h": h, "idx": idx,
                           "table": table, **gce})
            gce = {"delay_cs": 0, "transparent_idx": None, "disposal": 0}
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    return screen_w, screen_h, bg_index, gct, frames


def decode_gif(buf: bytes) -> np.ndarray:
    """Pure-stdlib GIF decode of the FIRST image frame: logical screen
    descriptor, global/local color table, sub-block reassembly, LZW
    decompression (variable code width, clear/EOI), interlace
    reordering -> (h, w, 3) uint8 RGB. Raises ValueError on truncated
    or malformed streams."""
    _sw, _sh, _bg, _gct, frames = _gif_parse(buf)
    if not frames:
        raise ValueError("GIF contains no image frame")
    f = frames[0]
    return f["table"][f["idx"]]


def decode_gif_frames(buf: bytes) -> list[tuple[float, np.ndarray]]:
    """Decode EVERY frame of a (possibly animated) GIF, composed onto
    the logical screen per the GIF89a animation model: frames draw at
    their (x, y) offset, transparent palette indices leave the canvas
    untouched, and disposal methods 2 (restore-to-background) and 3
    (restore-to-previous) reset the frame rect before the next draw.

    Returns [(t_seconds, canvas_rgb)] where t is the frame's display
    START time (cumulative preceding delays; Graphic Control Extension
    delay is in 1/100 s)."""
    screen_w, screen_h, bg_index, gct, frames = _gif_parse(buf)
    if not frames:
        raise ValueError("GIF contains no image frame")
    bg_rgb = (
        gct[bg_index] if gct is not None and bg_index < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (screen_h, screen_w, 3)).copy()
    out = []
    t_cs = 0
    for f in frames:
        y0, y1 = f["y"], min(f["y"] + f["h"], screen_h)
        x0, x1 = f["x"], min(f["x"] + f["w"], screen_w)
        prev_rect = canvas[y0:y1, x0:x1].copy()
        idx = f["idx"][: y1 - y0, : x1 - x0]
        rgb = f["table"][idx]
        if f["transparent_idx"] is not None:
            keep = idx == f["transparent_idx"]
            rgb = np.where(keep[:, :, None], canvas[y0:y1, x0:x1], rgb)
        canvas[y0:y1, x0:x1] = rgb
        out.append((t_cs / 100.0, canvas.copy()))
        t_cs += f["delay_cs"]
        if f["disposal"] == 2:
            canvas[y0:y1, x0:x1] = bg_rgb
        elif f["disposal"] == 3:
            canvas[y0:y1, x0:x1] = prev_rect
    return out


def _gif_lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW compression (GIF89a spec appendix): variable code
    width growing at table-full, clear + end-of-information codes,
    LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for v in indices.astype(np.uint8).tobytes():
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        run = bytes([v])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif_animation(
    frames: list[np.ndarray], delays_cs: list[int] | None = None
) -> bytes:
    """Re-encode RGB frames as an animated GIF89a (the write-side
    partner of ``decode_gif_frames`` — e.g. a thumbnail sink after
    ``resize_media``). Full-screen frames, one global color table built
    from the union of frame colors (<= 256 distinct colors required),
    per-frame Graphic Control Extension delays in 1/100 s. Pure stdlib."""
    import struct

    if not frames:
        raise ValueError("no frames to encode")
    delays = delays_cs or [0] * len(frames)
    if len(delays) != len(frames):
        raise ValueError("delays_cs length must match frames")
    h, w = frames[0].shape[:2]
    stacked = np.stack(
        [f.reshape(h, w, -1)[:, :, :3] for f in frames]
    ).reshape(-1, 3)
    colors, inv = np.unique(stacked, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors exceed GIF's 256")
    table = np.zeros((256, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    idx_frames = inv.reshape(len(frames), h, w).astype(np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    out += table.tobytes()
    for fi, idx in enumerate(idx_frames):
        out += struct.pack("<BBBBHB", 0x21, 0xF9, 4, 0, delays[fi], 0)
        out.append(0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(8)
        lzw = _gif_lzw_compress(idx.reshape(-1), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def _avi_parse(
    buf: bytes, want_frames: bool = True
) -> tuple[int, int, int, int, list[bytes]]:
    """Minimal RIFF-AVI walk: returns (microsec_per_frame, total_frames,
    width, height, video_frame_chunks). Frame chunks are the raw
    ``NNdc``/``NNdb`` payloads from the ``movi`` list in file order —
    for an MJPEG stream each one is a complete JPEG."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    mspf = n_frames = width = height = 0
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal mspf, n_frames, width, height
        i = lo
        while i + 8 <= hi:
            cid = buf[i : i + 4]
            clen = struct.unpack("<I", buf[i + 4 : i + 8])[0]
            body = i + 8
            end = min(body + clen, hi)
            if cid == b"LIST" and end - body >= 4:
                ltype = buf[body : body + 4]
                if ltype in (b"hdrl", b"movi", b"strl"):
                    if ltype != b"movi" or want_frames:
                        walk(body + 4, end)
            elif cid == b"avih" and end - body >= 40:
                mspf = struct.unpack("<I", buf[body : body + 4])[0]
                n_frames = struct.unpack("<I", buf[body + 16 : body + 20])[0]
                width = struct.unpack("<I", buf[body + 32 : body + 36])[0]
                height = struct.unpack("<I", buf[body + 36 : body + 40])[0]
            elif (
                len(cid) == 4
                and cid[2:4] in (b"dc", b"db")
                and cid[:2].isdigit()
            ):
                frames.append(buf[body:end])
            i = body + clen + (clen % 2)

    walk(12, len(buf))
    return mspf, n_frames, width, height, frames


def decode_avi_mjpeg_frames(buf: bytes) -> list[tuple[float, np.ndarray]]:
    """REAL video decode for the one codec the pure-stdlib stack can
    honestly cover: Motion-JPEG in AVI — every ``00dc`` chunk is an
    independent JPEG, fed through the same baseline/progressive JPEG
    decoder the image path uses. Returns [(t_seconds, HxWx3 uint8)] in
    stream order; raises ValueError when the stream isn't MJPEG (frames
    that don't start with the JPEG SOI marker), so callers degrade to
    the byte-histogram fallback exactly like any other unsupported
    codec."""
    mspf, _n, _w, _h, chunks = _avi_parse(buf)
    if not chunks:
        raise ValueError("AVI has no video frame chunks")
    out = []
    for k, chunk in enumerate(chunks):
        if chunk[:2] != b"\xff\xd8":
            raise ValueError("AVI video stream is not MJPEG")
        out.append((k * (mspf or 0) / 1e6, decode_jpeg(chunk)))
    return out


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], fps: float, width: int, height: int
) -> bytes:
    """Minimal spec-shaped MJPEG/AVI writer (test + synthesis sink,
    mirroring ``encode_gif_animation``): RIFF(AVI ) -> LIST hdrl
    (avih + one 'vids'/'MJPG' strl) -> LIST movi of ``00dc`` chunks."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    mspf = int(round(1e6 / fps)) if fps > 0 else 0
    n = len(jpeg_frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        mspf, 0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, int(round(fps)), 0, n,
                      0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl", chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


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


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bilinear resize to (out_h, out_w[, C]) uint8.

    Pixel centers are aligned (the `(i + 0.5) * scale - 0.5` convention,
    matching OpenCV/PIL bilinear), edges clamped. Pure numpy — one
    gather of the four neighbor grids plus two lerps, no Python loop
    over pixels."""
    if out_h <= 0 or out_w <= 0:
        raise ValueError("resize target must be positive")
    h, w = img.shape[:2]
    px = img.reshape(h, w, -1).astype(np.float64)
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = px[y0[:, None], x0[None, :]] * (1 - wx) + px[y0[:, None], x1[None, :]] * wx
    bot = px[y1[:, None], x0[None, :]] * (1 - wx) + px[y1[:, None], x1[None, :]] * wx
    out = top * (1 - wy) + bot * wy
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out.reshape((out_h, out_w) + img.shape[2:])


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
    """Deterministic feature from decoded PCM.

    Dims 0-7 (the stable 8-dim contract): rms, peak, mean, zero-crossing
    rate, mean abs delta (spectral-tilt proxy), duration, rate, dynamic
    range. Dims 8-11, filled only when ``dim > 8``: spectral centroid
    (Hz), spectral bandwidth (Hz), 85% rolloff (Hz), spectral flatness —
    computed from one rfft over the first 65 536 samples (cost cap; a
    one-hour file costs the same as a two-second clip)."""
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
    if dim > 8 and rate and len(samples) > 1:
        win = samples[:65536].astype(np.float64)
        win = win - win.mean()  # drop DC so centroid reflects content
        power = np.abs(np.fft.rfft(win)) ** 2
        freqs = np.fft.rfftfreq(len(win), d=1.0 / rate)
        total = power.sum()
        if total > 0:
            centroid = float((freqs * power).sum() / total)
            bandwidth = float(np.sqrt((power * (freqs - centroid) ** 2).sum() / total))
            rolloff = float(freqs[np.searchsorted(np.cumsum(power), 0.85 * total)])
            nz = power[power > 0]
            flatness = float(np.exp(np.mean(np.log(nz))) / np.mean(power))
            feat += [centroid, bandwidth, rolloff, flatness]
    return feat[:dim] + [0.0] * max(0, dim - len(feat))


def media_feature(buf: bytes, dim: int = 8) -> list[float]:
    """Content feature: REAL pixel/PCM statistics for formats the pure-
    stdlib decoders cover (PNG, baseline + progressive JPEG, BMP, GIF,
    PCM WAV); byte-histogram fallback for the rest (video codecs).
    Deterministic either way."""
    import struct
    import zlib

    if buf:
        try:
            if buf[:8] == b"\x89PNG\r\n\x1a\n":
                return image_feature(decode_png(buf), dim)
            if buf[:2] == b"\xff\xd8":
                return image_feature(decode_jpeg(buf), dim)
            if buf[:2] == b"BM":
                return image_feature(decode_bmp(buf), dim)
            if buf[:6] in (b"GIF87a", b"GIF89a"):
                return image_feature(decode_gif(buf), dim)
            if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
                samples, rate = decode_wav_pcm(buf)
                return audio_feature(samples, rate, dim)
            if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
                # MJPEG: real first-frame pixels (same convention as
                # GIF's composed first frame); other codecs raise and
                # fall through to the byte-histogram fallback
                return image_feature(decode_avi_mjpeg_frames(buf)[0][1], dim)
        except (ValueError, IndexError, struct.error, zlib.error):
            # corrupt container/stream (bad IDAT, truncated header,
            # palette index out of range, ...): one malformed file must
            # degrade to the fallback feature, never fail the task
            pass
    return _fake_feature(buf, dim)


DECODERS = {
    "image/png": decode_png,
    "image/jpeg": decode_jpeg,
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

    from solar_data_tools_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sniffed_mime", StringType()),
        StructField("decoded", BooleanType()),
        StructField("height", LongType()),
        StructField("width", LongType()),
        StructField("pixels", BinaryType()),  # raw RGB24, row-major
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def resize_media(
    media: DataFrame, out_h: int, out_w: int, feature_dim: int = 8
) -> DataFrame:
    """Decode -> bilinear-resize -> re-emit as raw RGB24 bytes + a
    content feature computed at the TARGET resolution (mapInPandas,
    Arrow-batched — same distribution plan as ``extract_features``).

    Formats the pure-stdlib decoders cover (PNG, baseline JPEG, BMP,
    GIF, see module docstring) are resized for real; undecodable
    payloads yield decoded=false with NULL pixels and the byte-histogram
    fallback feature, so one bad file degrades instead of failing the
    task. Output pixel buffers are fixed-size (out_h*out_w*3), making
    downstream batch shapes predictable regardless of source sizes —
    the property a training-data pipeline needs from a resize stage."""
    import struct
    import zlib

    from solar_data_tools_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def _resize_one(buf):
        if not buf:
            return None
        try:
            for magic, dec in (
                (b"\x89PNG\r\n\x1a\n", decode_png),
                (b"\xff\xd8", decode_jpeg),
                (b"BM", decode_bmp),
                (b"GIF8", decode_gif),
            ):
                if buf[: len(magic)] == magic:
                    img = dec(buf)
                    if img.ndim == 2:
                        img = img[:, :, None]
                    if img.shape[2] == 1:
                        img = img.repeat(3, axis=2)
                    return resize_image(img[:, :, :3], out_h, out_w)
        except (ValueError, IndexError, struct.error, zlib.error):
            return None
        return None

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                img = _resize_one(buf)
                sniffed = sniff_media(buf)["mime_type"]
                if img is None:
                    rows.append(
                        (mid, sniffed, False, None, None, None,
                         _fake_feature(buf, feature_dim))
                    )
                else:
                    rows.append(
                        (mid, sniffed, True, out_h, out_w,
                         img.tobytes(), image_feature(img, feature_dim))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sniffed_mime", "decoded",
                    "height", "width", "pixels", "feature",
                ],
            )

    return media.mapInPandas(_gen, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_frames_total", LongType()),
        StructField("t_s", DoubleType()),
        StructField("decoded", BooleanType()),
        StructField("height", LongType()),
        StructField("width", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, feature_dim: int = 8
) -> DataFrame:
    """Uniform temporal frame sampling over time-based media
    (mapInPandas; one input row fans out to <= n_frames output rows, so
    a task's output stays bounded by n_frames x its input rows — safe to
    size partitions by input bytes exactly as for ``extract_features``).

    - Animated GIF: REAL — every frame is LZW-decoded and composed per
      the GIF89a animation model (``decode_gif_frames``), n_frames
      sampled uniformly by index, t_s from the cumulative GCE delays,
      per-frame pixel features.
    - MP4 video: container metadata (duration via mvhd) is real; frame
      TIMESTAMPS are spaced uniformly across that duration, but the
      codec decode is stubbed (decoded=false, byte-histogram feature) —
      swap a real decoder into ``_video_frames`` without touching the
      plan.
    - Still images: a single frame at t=0 (their own pixels, real
      features where decodable).
    """

    from solar_data_tools_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                rows.extend(_frame_rows(mid, buf, n_frames, feature_dim))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "n_frames_total", "t_s",
                    "decoded", "height", "width", "feature",
                ],
            )

    return media.mapInPandas(_gen, schema=FRAME_SCHEMA)


def _frame_rows(mid, buf, n_frames: int, dim: int) -> list[tuple]:
    """Per-payload frame rows for ``sample_frames`` (see its contract)."""
    import struct
    import zlib

    if not buf:
        return [(mid, 0, 0, 0.0, False, None, None, _fake_feature(buf, dim))]
    if buf[:4] == b"GIF8":
        try:
            frames = decode_gif_frames(buf)
            total = len(frames)
            picks = np.unique(
                np.linspace(0, total - 1, min(n_frames, total)).round()
            ).astype(int)
            return [
                (mid, int(k), total, frames[k][0], True,
                 frames[k][1].shape[0], frames[k][1].shape[1],
                 image_feature(frames[k][1], dim))
                for k in picks
            ]
        except (ValueError, IndexError, struct.error, zlib.error):
            return [(mid, 0, 0, 0.0, False, None, None, _fake_feature(buf, dim))]
    if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        try:
            frames = decode_avi_mjpeg_frames(buf)
            total = len(frames)
            picks = np.unique(
                np.linspace(0, total - 1, min(n_frames, total)).round()
            ).astype(int)
            return [
                (mid, int(k), total, frames[k][0], True,
                 frames[k][1].shape[0], frames[k][1].shape[1],
                 image_feature(frames[k][1], dim))
                for k in picks
            ]
        except (ValueError, IndexError, struct.error, zlib.error):
            # non-MJPEG AVI: container metadata only, stub feature
            return [(mid, 0, 0, 0.0, False, None, None, _fake_feature(buf, dim))]
    info = sniff_media(buf)
    if info["mime_type"] == "video/mp4":
        dur = info["duration_s"] or 0.0
        ts = np.linspace(0.0, dur, n_frames + 1)[:-1] if dur > 0 else [0.0]
        return [
            (mid, int(k), len(ts), float(t), False,
             info["height"], info["width"], _fake_feature(buf, dim))
            for k, t in enumerate(ts)
        ]
    # still image / audio / unknown: one frame at t=0
    return [
        (mid, 0, 1, 0.0,
         info["mime_type"] in DECODERS, info["height"], info["width"],
         media_feature(buf, dim))
    ]


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
