"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side design is real and tested — schema contracts, Arrow-batched
``mapInPandas`` signatures, partition-size control.  Four media formats are
decoded FOR REAL with pure-python/numpy parsers (no media libs needed):
uncompressed 24/32-bit **BMP**, 8-bit **PNG** (stdlib zlib inflate +
scanline unfilter), **JPEG** — baseline AND progressive per ITU T.81
(huffman + matrix IDCT, 4:2:0/4:2:2 subsampling, restart markers,
spectral-selection and successive-approximation scans) — **GIF** (LZW,
interlacing, transparency, animated frame sequences with disposal
compositing — real frame extraction via ``extract_gif_frames``), and
8/16-bit PCM **WAV** (sample stats).  Every other format (MP3, video,
arithmetic-coded JPEG) falls back to a deterministic stub "decode"
deriving features from
the payload bytes, so the full pipeline stays exercisable end-to-end;
``strict=True`` raises at that stub boundary instead (those genuinely need
torchaudio/ffmpeg).  Swap the fallback for a real decoder in production;
nothing else changes.

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
    payloads — media_id mod 3 selects uncompressed BMP / 8-bit PNG / JPEG
    (every other JPEG progressive) — audio rows REAL PCM WAV / FLAC (rotating), animation rows
    REAL animated GIF, and video rows REAL AVI/MJPEG (all a deterministic
    function of media_id), so the decode/resize/frame stages exercise every
    pure-python codec end-to-end; any other ``kind`` (e.g. ``"opaque"``)
    carries opaque bytes — the honest stub/strict boundary."""
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
            if i % 3 == 2:
                return encode_jpeg(px, quant=1, progressive=(i % 6 == 5))
            return (encode_bmp if i % 3 == 0 else encode_png)(px)
        if kind == "audio":
            rate = 8000
            t = np.arange(rate * duration_ms // 1000, dtype=np.float64)
            freq = 100.0 + (i % 16) * 25.0
            sig = 0.5 * np.sin(2 * np.pi * freq * t / rate)
            if i % 2 == 1:
                from .flac import encode_flac

                return encode_flac(sig, rate)
            return encode_wav(sig, rate)
        if kind == "animation":
            # REAL animated GIF: 3 solid frames at 100ms whose colors are a
            # deterministic function of media_id
            frames = [
                np.full((h, w, 3), ((i * 37 + f * 85) % 256, (i * 11) % 256, f * 100), np.uint8)
                for f in range(3)
            ]
            return encode_gif(frames, delays_ms=[100, 100, 100])
        if kind == "video":
            # REAL AVI/MJPEG: 4 solid frames at 10 fps, colors a
            # deterministic function of media_id (solid colors survive the
            # flat-quant JPEG exactly)
            frames = [
                np.full(
                    (h, w, 3),
                    ((i * 53 + f * 61) % 256, (i * 17 + f * 29) % 256, (f * 83) % 256),
                    np.uint8,
                )
                for f in range(4)
            ]
            return encode_avi(frames, fps=10)
        return bytes(((i * 31 + j * 7) % 251) for j in range(128 + (i % 32)))

    def mime(i: int) -> str:
        if kind == "image":
            return ["image/bmp", "image/png", "image/jpeg"][i % 3]
        if kind == "audio":
            return ["audio/wav", "audio/flac"][i % 2]
        return {
            "animation": "image/gif",
            "video": "video/x-msvideo",
        }.get(kind, f"{kind}/fake")

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


# --- JPEG (baseline sequential DCT, ITU T.81) --------------------------------
#
# Pure python/numpy per the published spec: no media libraries.  The decoder
# handles what real-world baseline files contain — arbitrary DQT/DHT tables
# from the stream, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, grayscale,
# restart markers, byte stuffing.  Progressive (SOF2), arithmetic coding,
# and 12-bit precision return None (stub/strict boundary, like interlaced
# PNG).  The encoder emits spec-conformant baseline JFIF with its tables in
# the stream (any valid Huffman/quant table is legal; it uses simple
# fixed-length canonical tables rather than reproducing Annex K).

import numpy as _np

# zigzag scan: position k in the stream -> flattened (row*8+col) index.
# Generated, not transcribed: diagonal s runs row-ascending when s is odd,
# row-descending when even ((0,0),(0,1),(1,0),(2,0),(1,1),(0,2),...).
_ZIGZAG: list[int] = []
for _s in range(15):
    _pts = [(_y, _s - _y) for _y in range(max(0, _s - 7), min(_s, 7) + 1)]
    if _s % 2 == 0:
        _pts.reverse()
    _ZIGZAG += [_y * 8 + _x for (_y, _x) in _pts]

# orthonormal 8x8 DCT-II basis: F = A @ f @ A.T, f = A.T @ F @ A
_DCT_A = _np.array(
    [
        [
            (1.0 / _np.sqrt(2.0) if u == 0 else 1.0)
            * 0.5
            * _np.cos((2 * x + 1) * u * _np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _huff_decode_table(counts: list[int], symbols: list[int]) -> dict:
    """(BITS, HUFFVAL) → {(length, code): symbol} via the spec's canonical
    code assignment (T.81 Annex C) — shared by encoder and decoder."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def huff(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise EOFError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes | None):
    """Baseline AND progressive JPEG → (H, W, 3) uint8 RGB array, else None.

    Marker walk → DQT/DHT/SOF/DRI parse; every SOS scan accumulates huffman-
    decoded coefficients into per-component block arrays (baseline full
    scans, interleaved or not; progressive spectral-selection and
    successive-approximation scans per T.81 G.2 — DC/AC first and refine
    passes with EOB-run handling); at EOI the accumulated coefficients
    dequantize through one vectorized IDCT, upsample, and convert
    YCbCr→RGB (BT.601 as T.81/JFIF specify).  Arithmetic coding,
    hierarchical/lossless frames, and 12-bit precision return None.
    Dimension cap 4 MP: entropy decode is a per-bit python loop, right for
    the metadata-scale thumbnails this stage handles (the surrounding
    ``mapInPandas`` batching is the production shape regardless)."""
    import numpy as np

    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
        frame = None
        restart_interval = 0
        coefs = None  # cid -> (blocks_y, blocks_x, 64) int32
        pos = 2
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xFF:  # T.81 B.1.1.2: 0xFF fill bytes before markers
                pos += 1
                continue
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                pos += 2
                continue
            if marker == 0xD9:  # EOI: reconstruct what the scans built
                return (
                    _jpeg_reconstruct(frame, qt, coefs) if coefs is not None else None
                )
            if pos + 4 > len(payload):
                return None
            ln = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            seg = payload[pos + 4 : pos + 2 + ln]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 15
                    i += 1
                    n = 64 * (2 if pq else 1)
                    raw = seg[i : i + n]
                    i += n
                    vals = (
                        np.frombuffer(raw, ">u2").astype(np.int32)
                        if pq
                        else np.frombuffer(raw, np.uint8).astype(np.int32)
                    )
                    tbl = np.zeros(64, np.int32)
                    tbl[_ZIGZAG] = vals  # stored in zigzag order
                    qt[tq] = tbl.reshape(8, 8)
            elif marker == 0xC4:  # DHT
                i = 0
                while i + 17 <= len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 15
                    counts = list(seg[i + 1 : i + 17])
                    n = sum(counts)
                    symbols = list(seg[i + 17 : i + 17 + n])
                    huff[(tc, th)] = _huff_decode_table(counts, symbols)
                    i += 17 + n
            elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
                prec = seg[0]
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                ncomp = seg[5]
                if prec != 8 or w <= 0 or h <= 0 or w * h > (1 << 22):
                    return None
                comps = []
                for c in range(ncomp):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 15, tq))
                frame = (h, w, comps, marker == 0xC2)
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                return None  # lossless / differential / arithmetic
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                    scan.append((cs, tda >> 4, tda & 15))
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 15
                if frame[3]:
                    # T.81 G.1: a progressive DC scan is exactly the 0..0
                    # band; AC bands exclude DC and are single-component;
                    # point transforms are bounded (13) so `<< al` cannot
                    # overflow the int32 coefficient store
                    if se > 63 or ss > se or (ss == 0) != (se == 0):
                        return None
                    if ss > 0 and ns != 1:
                        return None
                    if ah > 13 or al > 13:
                        return None
                elif (ss, se, ah, al) != (0, 63, 0, 0):
                    return None  # malformed sequential scan header
                if coefs is None:
                    coefs = _jpeg_alloc(frame)
                segments, pos = _jpeg_entropy_segments(payload, pos + 2 + ln)
                _jpeg_apply_scan(
                    segments, frame, scan, ss, se, ah, al, huff,
                    restart_interval, coefs,
                )
                continue
            pos += 2 + ln
        # stream ended without EOI: every applied scan completed cleanly
        # (a truncated scan raises), so reconstruct what we have — files
        # cut right before FFD9 are a common real-world corruption
        return _jpeg_reconstruct(frame, qt, coefs) if coefs is not None else None
    except (EOFError, IndexError, KeyError, ValueError, OverflowError):
        return None


def _jpeg_geometry(frame):
    h, w, comps, _prog = frame
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _jpeg_alloc(frame):
    import numpy as np

    _, _, comps, _ = frame
    hmax, vmax, mcus_x, mcus_y = _jpeg_geometry(frame)
    return {
        cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), np.int32)
        for cid, hi, vi, _ in comps
    }


def _jpeg_entropy_segments(payload, start):
    """Entropy-coded bytes from ``start``: unstuff 0xFF00, split at RSTn,
    tolerate fill bytes; returns (segments, position of the next marker)."""
    segments, cur = [], bytearray()
    i = start
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if nxt == 0xFF:  # fill byte preceding a marker
                i += 1
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker header
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def _jpeg_apply_scan(
    segments, frame, scan, ss, se, ah, al, huff, restart_interval, coefs
):
    """Apply one scan's coefficients.  Baseline scans carry the full band
    (ss=0, se=63, ah=al=0); progressive scans carry a spectral band at one
    bit of precision (T.81 G.2).  Interleaved scans traverse MCUs; a
    single-component scan traverses that component's own block grid."""
    h, w, comps, progressive = frame
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax, vmax, mcus_x, mcus_y = _jpeg_geometry(frame)
    interleaved = len(scan) > 1

    # traversal: closed-form unit -> blocks (no per-scan materialization of
    # hundreds of thousands of index tuples on the decode hot path)
    if interleaved:
        template = []  # per-MCU block layout: (cid, td, ta, vi, hi, dy, dx)
        for cid, td, ta in scan:
            hi, vi, _ = by_id[cid]
            for dy in range(vi):
                for dx in range(hi):
                    template.append((cid, td, ta, vi, hi, dy, dx))
        n_units = mcus_x * mcus_y

        def unit_blocks(m):
            my, mx = divmod(m, mcus_x)
            for cid, td, ta, vi, hi, dy, dx in template:
                yield cid, td, ta, my * vi + dy, mx * hi + dx
    else:
        cid0, td0, ta0 = scan[0]
        hi0, vi0, _ = by_id[cid0]
        cw = -(-(w * hi0) // hmax)  # component resolution (T.81 A.1.1)
        ch = -(-(h * vi0) // vmax)
        bx_n, by_n = -(-cw // 8), -(-ch // 8)
        n_units = by_n * bx_n

        def unit_blocks(m):
            yield cid0, td0, ta0, m // bx_n, m % bx_n

    per_seg = restart_interval or n_units
    unit_idx = 0
    for seg in segments:
        rd = _BitReader(seg)
        preds = dict.fromkeys(by_id, 0)  # DC predictors reset at restarts
        eobrun = 0
        for _ in range(min(per_seg, n_units - unit_idx)):
            for cid, td, ta, by, bx in unit_blocks(unit_idx):
                coef = coefs[cid][by, bx]
                if not progressive:
                    _block_baseline(rd, coef, huff[(0, td)], huff[(1, ta)], preds, cid)
                elif ss == 0 and ah == 0:  # DC first
                    s = rd.huff(huff[(0, td)])
                    diff = _extend(rd.receive(s), s) if s else 0
                    preds[cid] += diff
                    coef[0] = preds[cid] << al
                elif ss == 0:  # DC refine: one bit per block
                    if rd.read_bit():
                        coef[0] |= 1 << al
                elif ah == 0:  # AC first
                    eobrun = _block_ac_first(
                        rd, coef, huff[(1, ta)], ss, se, al, eobrun
                    )
                else:  # AC refine
                    eobrun = _block_ac_refine(
                        rd, coef, huff[(1, ta)], ss, se, al, eobrun
                    )
            unit_idx += 1
        if unit_idx >= n_units:
            break
    if unit_idx < n_units:
        raise EOFError("truncated scan")


def _block_baseline(rd, coef, dc_tbl, ac_tbl, preds, cid):
    s = rd.huff(dc_tbl)
    diff = _extend(rd.receive(s), s) if s else 0
    preds[cid] += diff
    coef[0] = preds[cid]
    k = 1
    while k < 64:
        rs = rd.huff(ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run overflows block")
        coef[_ZIGZAG[k]] = _extend(rd.receive(s), s)
        k += 1


def _block_ac_first(rd, coef, ac_tbl, ss, se, al, eobrun):
    """T.81 G.2.2: first pass of an AC band — EOB runs + coefficients
    scaled by the point transform."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.huff(ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rd.receive(r)
                return eobrun
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("AC run overflows band")
        coef[_ZIGZAG[k]] = _extend(rd.receive(s), s) << al
        k += 1
    return 0


def _block_ac_refine(rd, coef, ac_tbl, ss, se, al, eobrun):
    """T.81 G.2.3 / libjpeg decode_mcu_AC_refine: correction bits for
    already-nonzero coefficients, newly-significant ±1<<al insertions, and
    EOB runs that still carry correction bits."""
    p1, m1 = 1 << al, -1 << al

    def refine_nonzero(z):
        if rd.read_bit() and (coef[z] & p1) == 0:
            coef[z] += p1 if coef[z] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.huff(ac_tbl)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.receive(r)
                    break  # remaining coefficients handled below
                # r == 15: skip 16 zero-history coefficients
            else:
                # s is 1 by spec; sign bit chooses ±1<<al
                newval = p1 if rd.read_bit() else m1
            while k <= se:
                z = _ZIGZAG[k]
                if coef[z] != 0:
                    refine_nonzero(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[_ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            z = _ZIGZAG[k]
            if coef[z] != 0:
                refine_nonzero(z)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_reconstruct(frame, qt, coefs):
    """Accumulated coefficients → RGB: vectorized dequant + IDCT over every
    block at once, then upsample / crop / color-convert."""
    import numpy as np

    h, w, comps, _ = frame
    hmax, vmax, _, _ = _jpeg_geometry(frame)
    full = {}
    for cid, hi, vi, tq in comps:
        c = coefs[cid]  # (by, bx, 64) in NATURAL order (filled via _ZIGZAG)
        by_n, bx_n = c.shape[:2]
        blocks = c.reshape(by_n, bx_n, 8, 8).astype(np.float64) * qt[tq][
            None, None
        ]
        px = np.einsum("ui,yxuv,vj->yxij", _DCT_A, blocks, _DCT_A) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(by_n * 8, bx_n * 8)
        if hi < hmax or vi < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        full[cid] = plane[:h, :w]
    if len(comps) == 1:
        g = np.clip(np.round(full[comps[0][0]]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(comps) != 3:
        return None  # CMYK etc: out of scope
    yid, cbid, crid = (c[0] for c in comps)
    Y, Cb, Cr = full[yid], full[cbid] - 128.0, full[crid] - 128.0
    rgb = np.stack(
        [
            Y + 1.402 * Cr,
            Y - 0.344136 * Cb - 0.714136 * Cr,
            Y + 1.772 * Cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)




class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def restart(self, n: int) -> None:
        """Byte-align with 1-fill (stuffed like any data) then emit RSTn raw."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)
        return bytes(self.out)


# encoder tables: simple CANONICAL fixed-length codes (any valid table is
# legal baseline JPEG — the tables travel in DHT; Annex K's are merely the
# suggested ones).  DC: all 12 categories at 4 bits; AC: all 162 (run,size)
# symbols at 9 bits.  Both satisfy Kraft with room to spare.
_ENC_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_SYMBOLS = list(range(12))
# 162 standard (run,size) symbols + EOB_n run-length symbols 0x10..0xE0
# (progressive EOB runs) = 176, all at 9 bits (Kraft: 176/512)
_ENC_AC_COUNTS = [0] * 8 + [176] + [0] * 7
_ENC_AC_SYMBOLS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(1, 15)]
)
_ENC_DC = {
    sym: (ln, code)
    for (ln, code), sym in _huff_decode_table(
        _ENC_DC_COUNTS, _ENC_DC_SYMBOLS
    ).items()
}
_ENC_AC = {
    sym: (ln, code)
    for (ln, code), sym in _huff_decode_table(
        _ENC_AC_COUNTS, _ENC_AC_SYMBOLS
    ).items()
}


def encode_jpeg(
    pixels,
    subsampling: str = "444",
    quant: int = 2,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(H, W[, 3]) uint8 array → JFIF bytes (baseline or progressive).

    ``subsampling``: '444' (full-res chroma) or '420' (2x2 mean-pooled).
    ``quant``: uniform quantization step for every coefficient (1 ≈
    near-lossless apart from DCT rounding; larger = lossier/smaller) — a
    flat table is spec-legal and keeps the fixture math analyzable.
    ``restart_interval``: emit DRI + RSTn every N MCUs (0 = none; baseline
    only).  ``progressive=True`` emits a spectral-selection progressive
    stream (SOF2: one interleaved DC scan, then one full AC band scan per
    component with EOB-run coding) — same decoded pixels, different scan
    structure."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None].repeat(3, axis=2)
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, got {subsampling!r}")
    if progressive and restart_interval:
        raise ValueError("restart_interval is supported for baseline only")
    h, w = px.shape[:2]
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    Cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    sub = 2 if subsampling == "420" else 1
    mcu = 8 * sub

    def pad(plane, m):
        ph = -(-plane.shape[0] // m) * m
        pw = -(-plane.shape[1] // m) * m
        return np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")

    Yp = pad(Y, mcu)
    if sub == 2:
        Cbp = pad(Cb, mcu).reshape(-1, 2, Yp.shape[1] // 2, 2).mean(axis=(1, 3))
        Crp = pad(Cr, mcu).reshape(-1, 2, Yp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        Cbp, Crp = pad(Cb, 8), pad(Cr, 8)
    q = np.full((8, 8), int(quant), np.int32)
    planes = [Yp, Cbp, Crp]
    mcus_y, mcus_x = Yp.shape[0] // mcu, Yp.shape[1] // mcu

    def block_zz(ci, by, bx):
        plane = planes[ci]
        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        coef = np.round((_DCT_A @ block @ _DCT_A.T) / q).astype(np.int64)
        return coef.reshape(64)[_ZIGZAG]

    def mag(v):
        s = int(abs(v)).bit_length()
        return s, (v if v >= 0 else v + (1 << s) - 1)

    def emit_dc(wr, v):
        s, bits = mag(v)
        ln, code = _ENC_DC[s]
        wr.write(code, ln)
        if s:
            wr.write(bits & ((1 << s) - 1), s)

    # interleaved MCU traversal (baseline scan + progressive DC scan)
    def mcu_blocks():
        for m in range(mcus_y * mcus_x):
            my, mx = divmod(m, mcus_x)
            for by in range(sub):
                for bx in range(sub):
                    yield 0, my * sub + by, mx * sub + bx
            yield 1, my, mx
            yield 2, my, mx

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = bytes(int(quant) for _ in range(64))
    out = b"\xff\xd8"
    out += seg(0xDB, b"\x00" + zz_q)  # DQT id 0 (luma)
    out += seg(0xDB, b"\x01" + zz_q)  # DQT id 1 (chroma)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (sub << 4) | sub, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC2 if progressive else 0xC0, sof)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    dht = bytes([0x00]) + bytes(_ENC_DC_COUNTS) + bytes(_ENC_DC_SYMBOLS)
    dht += bytes([0x10]) + bytes(_ENC_AC_COUNTS) + bytes(_ENC_AC_SYMBOLS)
    dht += bytes([0x01]) + bytes(_ENC_DC_COUNTS) + bytes(_ENC_DC_SYMBOLS)
    dht += bytes([0x11]) + bytes(_ENC_AC_COUNTS) + bytes(_ENC_AC_SYMBOLS)
    out += seg(0xC4, dht)

    if not progressive:
        wr = _BitWriter()
        pred = [0, 0, 0]
        n_done, n_rst = 0, 0
        for ci, by, bx in mcu_blocks():
            if (
                ci == 0
                and by % sub == 0
                and bx % sub == 0
                and restart_interval
                and n_done
                and n_done % restart_interval == 0
            ):
                wr.restart(n_rst)
                n_rst += 1
                pred[:] = [0, 0, 0]
            if ci == 0 and by % sub == 0 and bx % sub == 0:
                n_done += 1
            zz = block_zz(ci, by, bx)
            emit_dc(wr, int(zz[0]) - pred[ci])
            pred[ci] = int(zz[0])
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    ln, code = _ENC_AC[0xF0]
                    wr.write(code, ln)
                    run -= 16
                s, bits = mag(v)
                ln, code = _ENC_AC[(run << 4) | s]
                wr.write(code, ln)
                wr.write(bits & ((1 << s) - 1), s)
                run = 0
            if run:
                ln, code = _ENC_AC[0x00]
                wr.write(code, ln)
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        return out + wr.flush() + b"\xff\xd9"

    # progressive: cache quantized blocks (each visited by two scans)
    zz_cache: dict[tuple[int, int, int], "np.ndarray"] = {}

    def zz_of(ci, by, bx):
        key = (ci, by, bx)
        if key not in zz_cache:
            zz_cache[key] = block_zz(ci, by, bx)
        return zz_cache[key]

    # scan 1: interleaved DC, Ss=0 Se=0 Ah=0 Al=0
    wr = _BitWriter()
    pred = [0, 0, 0]
    for ci, by, bx in mcu_blocks():
        zz = zz_of(ci, by, bx)
        emit_dc(wr, int(zz[0]) - pred[ci])
        pred[ci] = int(zz[0])
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0]))
    out += wr.flush()

    # scans 2-4: one AC band (1..63) per component, EOB-run coded
    for ci, comp_id in ((0, 1), (1, 2), (2, 3)):
        wr = _BitWriter()
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                ln, code = _ENC_AC[nbits << 4]
                wr.write(code, ln)
                if nbits:
                    wr.write(eobrun - (1 << nbits), nbits)
                eobrun = 0

        # T.81 A.2.2: non-interleaved scans traverse the component's OWN
        # block grid ceil(ch/8) x ceil(cw/8) — for 4:2:0 luma that is fewer
        # rows/cols than the padded MCU grid when h or w mod 16 is in 1..8
        ch = h if ci == 0 else -(-h // sub)
        cw = w if ci == 0 else -(-w // sub)
        grid_y, grid_x = -(-ch // 8), -(-cw // 8)
        for by in range(grid_y):
            for bx in range(grid_x):
                zz = zz_of(ci, by, bx)
                nz = [k for k in range(1, 64) if zz[k]]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
                    continue
                flush_eobrun()
                run = 0
                for k in range(1, nz[-1] + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        ln, code = _ENC_AC[0xF0]
                        wr.write(code, ln)
                        run -= 16
                    s, bits = mag(v)
                    ln, code = _ENC_AC[(run << 4) | s]
                    wr.write(code, ln)
                    wr.write(bits & ((1 << s) - 1), s)
                    run = 0
                if nz[-1] < 63:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
        flush_eobrun()
        td_ta = 0x00 if ci == 0 else 0x11
        out += seg(0xDA, bytes([1, comp_id, td_ta, 1, 63, 0]))
        out += wr.flush()
    return out + b"\xff\xd9"


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
    """WAV → (samples float64 in [-1,1], sample_rate, channels), else None.

    Formats: integer PCM 8/16-bit (format 1), IEEE float 32/64-bit
    (format 3), and the G.711 telephony codecs µ-law (7) / A-law (6) —
    the four encodings that actually occur in speech/audio corpora;
    anything else (ADPCM, MP3-in-WAV) returns None."""
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
    if channels < 1:
        return None
    # tolerate truncated payloads (data chunk shorter than its declared
    # size, odd byte count): decode the complete samples instead of
    # letting frombuffer raise and fail the whole Spark stage
    if audio_format == 1 and bits == 16:
        data = data[: len(data) // 2 * 2]
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_format == 1 and bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    elif audio_format == 3 and bits in (32, 64):  # IEEE float
        width = bits // 8
        data = data[: len(data) // width * width]
        # NaN/Inf are VALID float encodings (unlike PCM) and hot-mastered
        # files exceed 1.0 — enforce the documented [-1, 1] contract so
        # downstream stats never go NaN
        samples = np.clip(
            np.nan_to_num(np.frombuffer(data, dtype=f"<f{width}").astype(np.float64)),
            -1.0,
            1.0,
        )
    elif audio_format == 7 and bits == 8:  # G.711 µ-law
        u = ~np.frombuffer(data, dtype=np.uint8)
        sign = np.where(u & 0x80, -1.0, 1.0)
        exp = (u >> 4) & 7
        mant = (u & 0x0F).astype(np.int64)
        mag = ((mant << 3) + 0x84 << exp) - 0x84
        samples = sign * mag / 32124.0  # full-scale µ-law magnitude
    elif audio_format == 6 and bits == 8:  # G.711 A-law (sun g711.c
        # alaw2linear; NB: the A-law sign bit SET means positive)
        a = np.frombuffer(data, dtype=np.uint8).astype(np.int64) ^ 0x55
        t = (a & 0x0F) << 4
        exp = (a >> 4) & 7
        mag = np.where(
            exp == 0, t + 8, np.where(exp == 1, t + 0x108, (t + 0x108) << (exp - 1))
        )
        samples = np.where(a & 0x80, mag, -mag) / 32768.0
    else:
        return None
    return samples, sample_rate, channels


# --- GIF (87a/89a, LZW) ------------------------------------------------------
#
# Pure python per the published GIF spec: LZW-compressed indexed frames with
# global/local palettes, interlacing, transparency, and the GIF89a graphic-
# control extension (per-frame delay + disposal), so ANIMATED gifs decode to
# real frame sequences — the first real frame-extraction path for the
# pipeline's video-ish rows.


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    if not 1 <= min_code_size <= 11:
        # GIF codes are at most 12 bits; a crafted byte here would otherwise
        # allocate a 2^N-entry table (hang/OOM, not a typed refusal)
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1

    width = 0
    reset()
    acc = nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out
            if code < len(table) and table[code]:
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + [prev[0]]
            else:
                raise ValueError("bad LZW code")
            out.extend(entry)
            if prev is not None:
                table.append(prev + [entry[0]])
                # GIF caps the table at 4096; width grows just below a power
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _lzw_encode(indexes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # dict keyed on (prefix CODE, next symbol) — constant-size keys, not
    # ever-growing index tuples (O(chain) hashing per pixel on solid areas)
    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = -1
    for idx in indexes:
        idx = int(idx)
        if cur < 0:
            cur = idx
            continue
        nxt = table.get((cur, idx))
        if nxt is not None:
            cur = nxt
            continue
        emit(cur, width)
        table[(cur, idx)] = next_code
        # the decoder adds its mirror entry as it consumes this code, so
        # width must grow one step ahead of the table size boundary
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, width)
            table = {}
            next_code = end + 1
            width = min_code_size + 1
        cur = idx
    if cur >= 0:
        emit(cur, width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(frames, delays_ms=None, transparent_idx: int | None = None) -> bytes:
    """List of (H, W, 3) uint8 frames (same dims) → GIF89a bytes with one
    shared global palette (unique colors; > 256 falls back to a 6x7x6
    uniform quantization).  ``delays_ms`` per frame makes it animated."""
    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError(
            f"all GIF frames must share one size; got "
            f"{sorted({f.shape[:2] for f in frames})}"
        )
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        # uniform 6x7x6 cube (252 colors) — documented lossy fallback
        # (int32 first: uint8 * 6 would wrap mod 256 before the division)
        f32 = flat.astype(np.int32)
        q = np.stack(
            [f32[:, 0] * 6 // 256, f32[:, 1] * 7 // 256, f32[:, 2] * 6 // 256],
            axis=1,
        )
        colors = np.stack(
            [
                (np.arange(252) // 42) * 51,
                ((np.arange(252) // 6) % 7) * 42,
                (np.arange(252) % 6) * 51,
            ],
            axis=1,
        ).astype(np.uint8)
        inverse = q[:, 0] * 42 + q[:, 1] * 6 + q[:, 2]
    pal_bits = max(1, (max(len(colors) - 1, 1)).bit_length())
    pal_size = 1 << pal_bits
    palette = np.zeros((pal_size, 3), np.uint8)
    palette[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (pal_bits - 1), 0, 0])  # GCT flag+size, bg, aspect
    out += palette.tobytes()
    n_px = h * w
    splits = np.split(inverse, len(frames)) if len(frames) > 1 else [inverse]
    for fi, frame_idx in enumerate(splits):
        if delays_ms is not None or transparent_idx is not None:
            delay_cs = int(delays_ms[fi]) // 10 if delays_ms is not None else 0
            # disposal 1 (do not dispose): frames composite cumulatively,
            # so transparent pixels show the PREVIOUS frame — the standard
            # choice for delta-frame animations
            flags = 0x04 if transparent_idx is None else 0x05
            out += bytes([0x21, 0xF9, 4, flags])
            out += delay_cs.to_bytes(2, "little")
            out += bytes([transparent_idx or 0, 0])
        out += bytes([0x2C]) + b"\x00\x00\x00\x00"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0])  # no LCT, not interlaced
        min_code = max(2, pal_bits)
        out += bytes([min_code])
        data = _lzw_encode([int(i) for i in frame_idx[:n_px]], min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes | None, max_frames: int = 64):
    """GIF87a/89a → list of (timestamp_ms, (H, W, 3) uint8 RGB) frames with
    compositing (disposal none/keep/background/previous, transparency,
    interlacing, local palettes), else None."""
    import numpy as np

    if payload is None or len(payload) < 13 or payload[:4] != b"GIF8":
        return None
    try:
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        flags, bg_idx = payload[10], payload[11]
        if w <= 0 or h <= 0 or w * h > (1 << 22):
            return None
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 7)
            gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        canvas = np.zeros((h, w, 3), np.uint8)
        if gct is not None and bg_idx < len(gct):
            canvas[:] = gct[bg_idx]
        bg = canvas.copy()
        frames = []
        t_ms = 0
        delay_ms, transparent, disposal = 0, None, 0
        while pos < len(payload):
            block = payload[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension
                label = payload[pos]
                pos += 1
                if label == 0xF9 and payload[pos] >= 4:
                    sz = payload[pos]
                    gce = payload[pos + 1 : pos + 1 + sz]
                    disposal = (gce[0] >> 2) & 7
                    delay_ms = int.from_bytes(gce[1:3], "little") * 10
                    transparent = gce[3] if gce[0] & 1 else None
                while payload[pos]:  # skip (sub-)blocks to the 0 terminator
                    pos += payload[pos] + 1
                pos += 1
                continue
            if block != 0x2C:  # unknown block type
                return None
            il = int.from_bytes(payload[pos : pos + 2], "little")
            it = int.from_bytes(payload[pos + 2 : pos + 4], "little")
            iw = int.from_bytes(payload[pos + 4 : pos + 6], "little")
            ih = int.from_bytes(payload[pos + 6 : pos + 8], "little")
            iflags = payload[pos + 8]
            pos += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(
                    n, 3
                )
                pos += 3 * n
            if pal is None or il + iw > w or it + ih > h:
                return None
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                sz = payload[pos]
                data += payload[pos + 1 : pos + 1 + sz]
                pos += 1 + sz
            pos += 1
            idx = _lzw_decode(bytes(data), min_code)
            if len(idx) < iw * ih:
                return None
            idx = np.asarray(idx[: iw * ih], np.int32).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: reorder rows by pass
                de = np.zeros_like(idx)
                src = 0
                for first, step in _GIF_INTERLACE_PASSES:
                    rows = range(first, ih, step)
                    de[list(rows)] = idx[src : src + len(rows)]
                    src += len(rows)
                idx = de
            if (idx >= len(pal)).any():
                return None
            prev = canvas.copy()
            region = canvas[it : it + ih, il : il + iw]
            px = pal[idx]
            if transparent is not None:
                mask = (idx != transparent)[:, :, None]
                region[:] = np.where(mask, px, region)
            else:
                region[:] = px
            frames.append((t_ms, canvas.copy()))
            t_ms += delay_ms
            if disposal == 2:  # restore background in the frame rect
                canvas[it : it + ih, il : il + iw] = bg[it : it + ih, il : il + iw]
            elif disposal == 3:  # restore previous
                canvas = prev
            delay_ms, transparent, disposal = 0, None, 0
            if len(frames) >= max_frames:
                break
        return frames or None
    except (ValueError, IndexError):
        return None


def decode_gif(payload: bytes | None):
    """GIF → first composited frame as (H, W, 3) uint8 RGB, else None."""
    frames = decode_gif_frames(payload, max_frames=1)
    return frames[0][1] if frames else None


GIF_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("frame_png", BinaryType(), True),
    ]
)


def _extract_frames(
    df: DataFrame, decoder, every_ms: int, max_frames: int
) -> DataFrame:
    """Shared distributed frame-extraction plumbing for the animation/video
    containers: ``decoder(payload, max_frames)`` → (ts_ms, RGB) list per row,
    each kept frame re-encoded as PNG, optionally thinned to at most one
    frame per ``every_ms``.

    Scale: ``mapInPandas`` over repartitioned payload batches — each worker
    decodes its own rows; no frame data ever collects to the driver."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            rows = []
            for mid, p in zip(batch["media_id"], batch["payload"]):
                frames = decoder(
                    bytes(p) if p is not None else None, max_frames
                )
                if not frames:
                    continue
                last_kept = None
                for fi, (ts, px) in enumerate(frames):
                    if (
                        every_ms
                        and last_kept is not None
                        and ts - last_kept < every_ms
                    ):
                        continue
                    last_kept = ts
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": fi,
                            "ts_ms": ts,
                            "width": px.shape[1],
                            "height": px.shape[0],
                            "frame_png": encode_png(px),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "ts_ms", "width", "height",
                    "frame_png",
                ],
            )

    return (
        df.select("media_id", "payload")
        .repartition(max(df.sparkSession.sparkContext.defaultParallelism, 1))
        .mapInPandas(extract, schema=GIF_FRAMES_SCHEMA)
    )


def extract_gif_frames(
    df: DataFrame, every_ms: int = 0, max_frames: int = 64
) -> DataFrame:
    """REAL frame extraction for animated-GIF rows: one output row per
    decoded frame (composited RGB re-encoded as PNG), optionally thinned to
    at most one frame per ``every_ms``.  Complements ``frame_sample_plan``
    (the timestamp fan-out for formats whose decoder is stubbed) with the
    actual decode for the animation container this repo reads natively."""
    return _extract_frames(df, decode_gif_frames, every_ms, max_frames)



# --- AVI/MJPEG video container ---------------------------------------------


def encode_avi(frames, fps: int = 25, quant: int = 1) -> bytes:
    """Minimal AVI/MJPEG writer: RIFF('AVI ') → hdrl (avih + one 'vids'
    stream, handler MJPG) → movi (one baseline-JPEG '00dc' chunk per frame)
    → idx1 index.  The compressed-frames-in-an-uncompressed-container layout
    MJPEG cameras and ``ffmpeg -c:v mjpeg`` emit; each frame is this module's
    own :func:`encode_jpeg`."""
    import numpy as np

    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi requires at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    if fps <= 0:
        raise ValueError("fps must be positive")
    jpegs = [encode_jpeg(f, quant=quant) for f in frames]

    def u32(v: int) -> bytes:
        return int(v).to_bytes(4, "little")

    def u16(v: int) -> bytes:
        return int(v).to_bytes(2, "little")

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + u32(len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    max_bytes = max(len(j) for j in jpegs)
    avih = b"".join(
        [
            u32(1_000_000 // fps),  # dwMicroSecPerFrame
            u32(max_bytes * fps),  # dwMaxBytesPerSec
            u32(0),  # dwPaddingGranularity
            u32(0x10),  # dwFlags: AVIF_HASINDEX
            u32(len(jpegs)),  # dwTotalFrames
            u32(0),  # dwInitialFrames
            u32(1),  # dwStreams
            u32(max_bytes),  # dwSuggestedBufferSize
            u32(w),
            u32(h),
            u32(0), u32(0), u32(0), u32(0),  # dwReserved
        ]
    )
    strh = b"".join(
        [
            b"vids", b"MJPG",
            u32(0),  # dwFlags
            u16(0), u16(0),  # wPriority, wLanguage
            u32(0),  # dwInitialFrames
            u32(1),  # dwScale
            u32(fps),  # dwRate (fps = rate/scale)
            u32(0),  # dwStart
            u32(len(jpegs)),  # dwLength (frames)
            u32(max_bytes),  # dwSuggestedBufferSize
            u32(0),  # dwQuality
            u32(0),  # dwSampleSize
            u16(0), u16(0), u16(w), u16(h),  # rcFrame
        ]
    )
    strf = b"".join(
        [
            u32(40), u32(w), u32(h), u16(1), u16(24), b"MJPG",
            u32(w * h * 3), u32(0), u32(0), u32(0), u32(0),
        ]
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = b""
    index = b""
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        index += b"00dc" + u32(0x10) + u32(4 + len(movi_body)) + u32(len(j))
        movi_body += chunk(b"00dc", j)
    movi = lst(b"movi", movi_body)
    idx1 = chunk(b"idx1", index)
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + u32(len(riff_body)) + riff_body


def _avi_scan(payload: bytes | None, max_frames: int):
    """Walk an AVI's RIFF tree → (video chunks, frame_ms, dims), else None.

    Finds the FIRST 'vids' stream by its strl position (not hard-coded to
    stream 00 — an AVI listing audio first carries video as stream 01), binds
    the strf dimensions to THAT stream's strl, and collects its 'NNdc'/'NNdb'
    chunks from movi (incl. nested 'rec ' lists).  frame_ms comes from the
    vids strh scale/rate, with avih micro-seconds-per-frame as fallback."""
    if (
        payload is None
        or len(payload) < 24
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        return None
    try:
        us_per_frame = 40_000
        scale_rate = None
        dims = None
        chunks: list[bytes] = []
        stream_no = 0  # running strh counter (stream numbering = strl order)
        vids_prefix: bytes | None = None
        last_strh_was_vids = False

        def walk(data: bytes, pos: int, end: int, in_movi: bool) -> None:
            nonlocal us_per_frame, scale_rate, dims
            nonlocal stream_no, vids_prefix, last_strh_was_vids
            while pos + 8 <= end and len(chunks) < max_frames:
                fourcc = data[pos : pos + 4]
                size = int.from_bytes(data[pos + 4 : pos + 8], "little")
                body_start = pos + 8
                body_end = min(body_start + size, end)
                if fourcc == b"LIST" and size >= 4:
                    ltype = data[body_start : body_start + 4]
                    walk(
                        data,
                        body_start + 4,
                        body_end,
                        in_movi or ltype in (b"movi", b"rec "),
                    )
                elif fourcc == b"avih" and size >= 4:
                    us_per_frame = int.from_bytes(
                        data[body_start : body_start + 4], "little"
                    )
                elif fourcc == b"strh" and size >= 32:
                    last_strh_was_vids = (
                        data[body_start : body_start + 4] == b"vids"
                    )
                    if last_strh_was_vids and vids_prefix is None:
                        vids_prefix = b"%02d" % stream_no
                        scale = int.from_bytes(
                            data[body_start + 20 : body_start + 24], "little"
                        )
                        rate = int.from_bytes(
                            data[body_start + 24 : body_start + 28], "little"
                        )
                        if scale and rate:
                            scale_rate = (scale, rate)
                    stream_no += 1
                elif (
                    fourcc == b"strf"
                    and size >= 16
                    and dims is None
                    and last_strh_was_vids  # bind dims to the vids strl only
                ):
                    bw = int.from_bytes(
                        data[body_start + 4 : body_start + 8], "little", signed=True
                    )
                    bh = int.from_bytes(
                        data[body_start + 8 : body_start + 12], "little", signed=True
                    )
                    dims = (bw, bh)
                elif (
                    in_movi
                    and len(fourcc) == 4
                    and fourcc[:2] == (vids_prefix or b"00")
                    and fourcc[2:] in (b"dc", b"db")
                ):
                    chunks.append(bytes(data[body_start:body_end]))
                pos = body_end + (size & 1)

        walk(
            payload,
            12,
            min(8 + int.from_bytes(payload[4:8], "little"), len(payload)),
            False,
        )
        if not chunks:
            return None
        if scale_rate:
            frame_ms = 1000.0 * scale_rate[0] / scale_rate[1]
        else:
            frame_ms = us_per_frame / 1000.0
        return chunks, frame_ms, dims
    except (ValueError, IndexError):
        return None


def _avi_frame_ms(payload: bytes | None) -> float | None:
    """The container's authoritative per-frame duration (ms), else None."""
    scan = _avi_scan(payload, max_frames=1)
    return scan[1] if scan else None


def decode_avi_frames(payload: bytes | None, max_frames: int = 64):
    """AVI → list of (timestamp_ms, (H, W, 3) uint8 RGB) frames, else None.

    Reads the MJPEG profile this repo can decode natively: 'NNdc' chunks
    holding baseline/progressive JPEG (via :func:`decode_jpeg`) and 'NNdb'
    chunks holding raw bottom-up 24-bit DIB rows, for the first 'vids'
    stream; frames inside 'rec ' LISTs are found too.  Timestamps come from
    the video stream's scale/rate, with the avih micro-seconds-per-frame as
    fallback."""
    import numpy as np

    scan = _avi_scan(payload, max_frames)
    if scan is None:
        return None
    chunks, frame_ms, dims = scan
    try:
        frames = []
        for i, raw in enumerate(chunks):
            img = None
            if raw[:2] == b"\xff\xd8":
                img = decode_jpeg(raw)
            elif dims and dims[0] > 0:
                bw, bh = dims[0], abs(dims[1])
                stride = (bw * 3 + 3) & ~3
                if len(raw) >= stride * bh:
                    rows = np.frombuffer(
                        raw[: stride * bh], np.uint8
                    ).reshape(bh, stride)[:, : bw * 3].reshape(bh, bw, 3)
                    # bottom-up BGR → top-down RGB (negative height = top-down)
                    img = rows[::-1][:, :, ::-1] if dims[1] > 0 else rows[:, :, ::-1]
            if img is None:
                return None
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=2)
            frames.append((int(round(i * frame_ms)), img))
        return frames or None
    except (ValueError, IndexError):
        return None


def extract_video_frames(
    df: DataFrame, every_ms: int = 0, max_frames: int = 64
) -> DataFrame:
    """REAL frame extraction for AVI/MJPEG video rows: one output row per
    decoded frame (RGB re-encoded as PNG), optionally thinned to at most one
    frame per ``every_ms`` — the video analog of :func:`extract_gif_frames`,
    sharing its output schema and distributed plumbing."""
    return _extract_frames(df, decode_avi_frames, every_ms, max_frames)


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


def decode_avi(payload: bytes | None):
    """AVI → first decoded frame as (H, W, 3) uint8 RGB, else None."""
    frames = decode_avi_frames(payload, max_frames=1)
    return frames[0][1] if frames else None


def decode_image(payload: bytes | None):
    """Any supported image-bearing container → (H, W, 3) uint8 RGB, else
    None (currently: uncompressed 24/32-bit BMP; 8-bit PNG; baseline +
    progressive JPEG; GIF first frame; AVI/MJPEG first frame)."""
    for codec in (decode_bmp, decode_png, decode_jpeg, decode_gif, decode_avi):
        img = codec(payload)
        if img is not None:
            return img
    return None


def decode_audio(payload: bytes | None):
    """Any supported audio container → (samples float64 in [-1,1],
    sample_rate, channels), else None (PCM/float/G.711 WAV; FLAC)."""
    out = decode_wav(payload)
    if out is not None:
        return out
    from .flac import decode_flac

    return decode_flac(payload)


def decode_real(payload: bytes | None, dim: int) -> list[float] | None:
    """Real feature extraction for the supported formats, else None.

    BMP/PNG/JPEG: [width, height, gray mean/std/min/max, gray histogram...];
    WAV/FLAC: [sample_rate/1e4, duration_s, amp mean/std/min/max, histogram...]."""
    img = decode_image(payload)
    if img is not None:
        gray = img.astype("float64").mean(axis=2) / 255.0
        return _stats_feature(
            [float(img.shape[1]), float(img.shape[0])], gray, dim
        )
    wav = decode_audio(payload)
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

    BMP/PNG/JPEG/GIF images, AVI/MJPEG video (first frame), and WAV/FLAC
    audio decode FOR REAL (pixel / sample statistics, :func:`decode_real`).
    Other formats use the deterministic byte stub; ``strict=True`` raises
    NotImplementedError at that boundary instead.  MP3 stays refused on
    purpose: unlike JPEG (tables in-file) or FLAC (parametric Rice codes),
    a Layer III decoder needs ISO/IEC 11172-3's normative FIXED tables (34
    Huffman code tables, the 512-coefficient synthesis window) which this
    container has no way to source or verify — an unverifiable
    transcription would risk silently wrong samples, so the honest
    boundary is the typed refusal plus full header triage
    (``operators/probe.py``, incl. VBR-exact durations)."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def one(p):
            feat = decode_real(p, dim)
            if feat is not None:
                return feat
            if strict and p is not None:
                raise NotImplementedError(
                    "payload is not a BMP/PNG/JPEG/GIF image, AVI/MJPEG "
                    "video, or WAV/FLAC audio; decoding other formats (MP3, "
                    "non-MJPEG video, ...) requires PIL/torchaudio/ffmpeg, "
                    "not present in this environment (use strict=False for "
                    "the byte stub)"
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


# resize decodes at most this many frames per animated/video payload — a
# per-task memory bound (1024 × a 4 MP RGB frame ≈ 12 GB worst case is
# already the w*h decode cap's job; this bounds frame COUNT)
_RESIZE_MAX_FRAMES = 1024

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

    BMP / PNG / JPEG payloads resize FOR REAL (numpy nearest-neighbor
    over the decoded pixel array, re-encoded in the input container); GIF
    animations and AVI/MJPEG videos resize EVERY frame and stay in their
    container.  Other formats use a deterministic byte down/up-sampling
    stub; ``strict=True`` raises at that boundary.  The Spark plumbing —
    binary in/out schema, iterator ``mapInPandas`` batching, metadata
    rewrite — is the production shape either way."""

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        target_len = target_width * target_height // 64  # fake byte budget

        def one(p):
            if p is None:
                return None
            is_png = len(p) >= 8 and p[:8] == b"\x89PNG\r\n\x1a\n"
            is_jpeg = len(p) >= 2 and p[:2] == b"\xff\xd8"
            is_gif = len(p) >= 4 and p[:4] == b"GIF8"
            is_avi = len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"AVI "
            if is_avi:
                # resize EVERY frame (up to the documented 1024-frame bound)
                # and stay in the AVI container at the container's own rate
                frames = decode_avi_frames(p, max_frames=_RESIZE_MAX_FRAMES)
                if frames is not None:
                    frame_ms = _avi_frame_ms(p) or 40.0
                    fps = max(int(round(1000.0 / frame_ms)), 1)
                    out = []
                    for _, img in frames:
                        h, w = img.shape[:2]
                        rows = (np.arange(target_height) * h) // target_height
                        cols = (np.arange(target_width) * w) // target_width
                        out.append(img[rows][:, cols])
                    return encode_avi(out, fps=fps)
            if is_gif:
                # resize EVERY frame — an animated input must not silently
                # collapse to its first frame
                frames = decode_gif_frames(p, max_frames=_RESIZE_MAX_FRAMES)
                if frames is not None:
                    ts = [t for t, _ in frames]
                    delays = (
                        [b - a for a, b in zip(ts, ts[1:])] + [ts[-1] - ts[-2]]
                        if len(ts) > 1
                        else None
                    )
                    out = []
                    for _, img in frames:
                        h, w = img.shape[:2]
                        rows = (np.arange(target_height) * h) // target_height
                        cols = (np.arange(target_width) * w) // target_width
                        out.append(img[rows][:, cols])
                    return encode_gif(out, delays_ms=delays)
            img = decode_image(p)
            if img is not None:
                h, w = img.shape[:2]
                rows = (np.arange(target_height) * h) // target_height
                cols = (np.arange(target_width) * w) // target_width
                resized = img[rows][:, cols]
                # stay in the input container: PNG→PNG, JPEG→JPEG, BMP→BMP
                if is_png:
                    return encode_png(resized)
                if is_jpeg:
                    return encode_jpeg(resized, quant=2)
                return encode_bmp(resized)
            if strict:
                raise NotImplementedError(
                    "payload is not a BMP/PNG/JPEG image, GIF animation, or "
                    "AVI/MJPEG video; resizing other formats requires "
                    "PIL/ffmpeg, not present in this environment (use "
                    "strict=False for the byte stub)"
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

    return df.where(
        F.col("kind").isin("image", "animation", "video")
    ).select("media_id", "payload").mapInPandas(resize, schema=RESIZED_SCHEMA)
