"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side design is real and tested — schema contracts, Arrow-batched
``mapInPandas`` signatures, partition-size control.  Three media formats are
decoded FOR REAL with pure-python/numpy parsers (no media libs needed):
uncompressed 24/32-bit **BMP** and 8-bit **PNG** (stdlib zlib inflate +
scanline unfilter; pixel stats + nearest-neighbor resize) and 8/16-bit PCM
**WAV** (sample stats).  Every other format falls back to a deterministic
stub "decode" deriving features from the payload bytes, so the full
pipeline stays exercisable end-to-end; ``strict=True`` raises at that stub
boundary instead (JPEG/MP3/video genuinely need PIL/torchaudio/ffmpeg).
Swap the fallback for a real decoder in production; nothing else changes.

Scale notes:
- media rows are wide (MBs): ``repartition`` by byte budget before the decode
  stage so one Arrow batch stays in worker memory
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps rows per batch).
- decode is ``mapInPandas`` (iterator form) so a partition streams through in
  batches instead of materializing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic media table for pipeline tests.  Image rows carry REAL
    payloads — even ids uncompressed BMP, odd ids 8-bit PNG — and audio rows
    REAL PCM WAV (all a deterministic function of media_id), so the
    decode/resize stages exercise both pure-python image codecs end-to-end;
    video rows carry opaque bytes (stub path)."""
    import numpy as np

    def payload(i: int, w: int, h: int, duration_ms: int) -> bytes:
        if kind == "image":
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (xx * 7 + i * 31) % 256,
                    (yy * 11 + i * 13) % 256,
                    (xx + yy + i) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            return encode_bmp(px) if i % 2 == 0 else encode_png(px)
        if kind == "audio":
            rate = 8000
            t = np.arange(rate * duration_ms // 1000, dtype=np.float64)
            freq = 100.0 + (i % 16) * 25.0
            return encode_wav(0.5 * np.sin(2 * np.pi * freq * t / rate), rate)
        return bytes(((i * 31 + j * 7) % 251) for j in range(128 + (i % 32)))

    def mime(i: int) -> str:
        if kind == "image":
            return "image/bmp" if i % 2 == 0 else "image/png"
        return {"audio": "audio/wav"}.get(kind, f"{kind}/fake")

    rows = [
        (
            i,
            kind,
            payload(i, 64 + i % 16, 48 + i % 12, 1000 + i),
            mime(i),
            64 + i % 16,
            48 + i % 12,
            1000 + i,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# --- real pure-python codecs: uncompressed BMP, PCM WAV ---------------------


def encode_bmp(pixels) -> bytes:
    """(H, W, 3) uint8 array → uncompressed 24-bit bottom-up BMP bytes."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    data_size = stride * h
    header = (
        b"BM"
        + (54 + data_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")  # pixel data offset
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + data_size.to_bytes(4, "little")
        + b"\x00" * 16
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + rows.tobytes()


def decode_bmp(payload: bytes | None):
    """Uncompressed 24/32-bit BMP → (H, W, 3) uint8 RGB array, else None."""
    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    offset = int.from_bytes(payload[10:14], "little")
    header_size = int.from_bytes(payload[14:18], "little")
    if header_size < 40:
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    bottom_up, h = h > 0, abs(h)
    nchan = bpp // 8
    stride = (w * nchan + 3) & ~3
    if len(payload) < offset + stride * h:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)
    px = rows[:, : w * nchan].reshape(h, w, nchan)[:, :, :3][:, :, ::-1]  # BGR→RGB
    return px[::-1] if bottom_up else px


def encode_png(pixels) -> bytes:
    """(H, W[, C]) uint8 array (C in 1/2/3/4) → 8-bit PNG bytes (filter 0,
    stdlib zlib — no media libraries)."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]  # gray, gray+alpha, RGB, RGBA

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes | None):
    """8-bit non-interlaced PNG (gray / gray+alpha / RGB / RGBA) →
    (H, W, 3) uint8 RGB array, else None.

    Pure python + stdlib ``zlib``: chunk walk → concatenated-IDAT inflate →
    per-scanline unfilter (None/Sub/Up/Average/Paeth per the PNG spec §9).
    None/Sub/Up rows unfilter vectorized (Sub is a per-channel cumulative
    sum); Average/Paeth carry a true left-to-right data dependence and fall
    back to a per-byte loop — fine for metadata-scale thumbnails, and the
    whole decode runs inside the Arrow-batched ``mapInPandas`` stage either
    way.  Palette (color type 3), 16-bit, and interlaced images return None
    (→ stub/strict boundary), as do malformed payloads."""
    import zlib

    import numpy as np

    if payload is None or len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            return None  # truncated chunk
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if (
        channels is None
        or depth != 8
        or comp != 0
        or filt != 0
        or interlace != 0
        or w <= 0
        or h <= 0
        # dimension sanity bound: untrusted corpora can declare absurd IHDR
        # dims; 2^26 pixels (64 MP ≈ 256 MB decoded RGBA) is far beyond any
        # metadata-scale image this stage handles
        or w * h > (1 << 26)
    ):
        return None
    stride = w * channels
    need = h * (stride + 1)
    try:
        # cap the inflate at exactly the pixel-buffer size derived from the
        # IHDR: a zlib bomb in a small IDAT must not allocate unbounded
        # executor memory before the length check can reject it
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), need)
    except zlib.error:
        return None
    if len(raw) < need:
        return None
    raw = np.frombuffer(raw, dtype=np.uint8)[: h * (stride + 1)].reshape(
        h, stride + 1
    )
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        up = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            rec = line.copy()
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(rec[c::bpp], dtype=np.int64) & 0xFF
        elif f == 2:  # Up
            rec = (line + up) & 0xFF
        elif f == 3:  # Average
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + ((left + up[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = np.empty(stride, np.int32)
            prev = out[y - 1] if y else None
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(up[x])
                c = int(prev[x - bpp]) if (prev is not None and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            return None
        out[y] = rec.astype(np.uint8)
    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray + alpha: replicate the gray plane
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """float array in [-1, 1] → mono 16-bit PCM WAV bytes."""
    import numpy as np

    pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1, 1) * 32767).astype(
        "<i2"
    )
    data = pcm.tobytes()
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(payload: bytes | None):
    """8/16-bit PCM WAV → (samples float64 in [-1,1], sample_rate, channels),
    else None."""
    import numpy as np

    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF":
        return None
    if payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or channels < 1 or bits not in (8, 16):
        return None
    if bits == 16:
        # tolerate truncated payloads (data chunk shorter than its declared
        # size, odd byte count): decode the complete samples instead of
        # letting frombuffer raise and fail the whole Spark stage
        data = data[: len(data) // 2 * 2]
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    return samples, sample_rate, channels


def _stats_feature(base: list[float], values, dim: int) -> list[float]:
    """``base`` metadata + histogram of ``values`` padded/trimmed to ``dim``."""
    import numpy as np

    v = np.asarray(values, dtype=np.float64).ravel()
    feat = list(base)
    if v.size:
        feat += [float(v.mean()), float(v.std()), float(v.min()), float(v.max())]
        nbins = dim - len(feat)
        if nbins > 0:
            lo, hi = float(v.min()), float(v.max())
            hist, _ = np.histogram(v, bins=nbins, range=(lo, hi if hi > lo else lo + 1))
            feat += (hist / v.size).tolist()
    feat = feat[:dim] + [0.0] * max(0, dim - len(feat))
    return [round(float(x), 6) for x in feat]


def decode_image(payload: bytes | None):
    """Any supported still-image container → (H, W, 3) uint8 RGB, else None
    (currently: uncompressed 24/32-bit BMP; 8-bit PNG)."""
    img = decode_bmp(payload)
    return img if img is not None else decode_png(payload)


def decode_real(payload: bytes | None, dim: int) -> list[float] | None:
    """Real feature extraction for the supported formats, else None.

    BMP/PNG: [width, height, gray mean/std/min/max, gray histogram...];
    WAV: [sample_rate/1e4, duration_s, amp mean/std/min/max, histogram...]."""
    img = decode_image(payload)
    if img is not None:
        gray = img.astype("float64").mean(axis=2) / 255.0
        return _stats_feature(
            [float(img.shape[1]), float(img.shape[0])], gray, dim
        )
    wav = decode_wav(payload)
    if wav is not None:
        samples, rate, channels = wav
        duration = len(samples) / max(channels, 1) / max(rate, 1)
        return _stats_feature([rate / 1e4, round(duration, 6)], samples, dim)
    return None


def _decode_stub(payload: bytes | None, dim: int) -> list[float] | None:
    """Deterministic fake feature extraction (stands in for a real decoder).

    Real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload)).convert("RGB").resize(...)
        feature = model(img)

    which is unavailable here; raise-for-real behavior is provided by
    ``decode_features(..., strict=True)``."""
    if payload is None:
        return None
    acc = [0.0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += float(b)
    norm = max(sum(x * x for x in acc) ** 0.5, 1e-12)
    return [round(x / norm, 6) for x in acc]


def decode_features(
    df: DataFrame, dim: int = 8, batch_rows: int = 256, strict: bool = False
) -> DataFrame:
    """media table → (media_id, n_bytes, feature[dim]) via mapInPandas.

    Uncompressed BMP and PCM WAV payloads decode FOR REAL (pixel / sample
    statistics, :func:`decode_real`).  Other formats use the deterministic
    byte stub; ``strict=True`` raises NotImplementedError at that boundary
    instead (compressed formats require PIL/torchaudio/ffmpeg, not present
    in this environment)."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def one(p):
            feat = decode_real(p, dim)
            if feat is not None:
                return feat
            if strict and p is not None:
                raise NotImplementedError(
                    "payload is not an uncompressed BMP, 8-bit PNG, or PCM "
                    "WAV; decoding other formats (JPEG/MP3/...) requires "
                    "PIL/torchaudio/ffmpeg, not present in this environment "
                    "(use strict=False for the byte stub)"
                )
            return _decode_stub(p, dim)

        for batch in batches:
            payloads = batch["payload"]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "feature": payloads.map(one),
                }
            )

    narrowed = df.select("media_id", "payload")
    return narrowed.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts).
    The frame extraction itself is the stubbed decode; the row fan-out and
    timestamp arithmetic are real Spark (sequence + explode, no Python)."""
    return (
        # duration 0 (or null) means NO frames — without the filter the
        # greatest(...)-clamp turns it into one phantom frame at ts=0
        df.where((F.col("kind") == "video") & (F.col("duration_ms") > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    target_width: int = 32,
    target_height: int = 32,
    strict: bool = False,
) -> DataFrame:
    """Image resize stage: (media_id, new dims, resized payload).

    Uncompressed BMP payloads resize FOR REAL (numpy nearest-neighbor over
    the decoded pixel array, re-encoded as BMP).  Other formats use a
    deterministic byte down/up-sampling stub; ``strict=True`` raises at that
    boundary (compressed formats require PIL).  The Spark plumbing — binary
    in/out schema, iterator ``mapInPandas`` batching, metadata rewrite — is
    the production shape either way."""

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        target_len = target_width * target_height // 64  # fake byte budget

        def one(p):
            if p is None:
                return None
            is_png = len(p) >= 8 and p[:8] == b"\x89PNG\r\n\x1a\n"
            img = decode_image(p)
            if img is not None:
                h, w = img.shape[:2]
                rows = (np.arange(target_height) * h) // target_height
                cols = (np.arange(target_width) * w) // target_width
                resized = img[rows][:, cols]
                # stay in the input container: PNG in → PNG out, BMP → BMP
                return encode_png(resized) if is_png else encode_bmp(resized)
            if strict:
                raise NotImplementedError(
                    "payload is not an uncompressed BMP or 8-bit PNG; "
                    "resizing other formats requires PIL, not present in "
                    "this environment (use strict=False for the byte stub)"
                )
            if len(p) >= target_len:
                return bytes(p[:target_len])
            return bytes((p * (target_len // max(len(p), 1) + 1))[:target_len])

        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "width": target_width,
                    "height": target_height,
                    "payload": batch["payload"].map(one),
                }
            )

    return df.where(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(resize, schema=RESIZED_SCHEMA)
