"""Header-only media probing — container triage WITHOUT decoding.

The first thing a 100 TB multimodal intake does is ROUTE: which rows are
images vs audio vs video, what are their real dimensions/durations (claimed
metadata lies), which are decodable at all.  Full decode for that answer
wastes ~1000× the IO-adjacent CPU; every published pipeline probes headers
first and decodes only what survives the routing filters.

``probe_media`` reads only the fixed-size header region of each payload:

- **BMP / PNG / GIF / JPEG** — dimensions from the container header (JPEG
  walks markers to the first SOF, skipping entropy data by segment lengths).
- **WAV / FLAC** — sample rate, channels, exact duration from fmt/STREAMINFO.
- **AVI** — dimensions, frame count and duration from avih alone (no movi
  walk, no frame decode).
- **MP3 (MPEG-1/2 audio layer I-III)** — the one format whose PCM decode
  this repo honestly refuses: a conformant Layer III decoder requires the
  normative fixed tables of ISO/IEC 11172-3 (34 Huffman code tables, the
  512-coefficient synthesis window) which cannot be re-derived or verified
  in this container — an unverifiable from-memory transcription would risk
  silently wrong samples, the worst defect class, so the boundary stays a
  typed refusal.  The header layer IS fully implemented: version, layer,
  bitrate, sample rate, channel mode, and duration — EXACT for VBR files
  via the Xing/Info/VBRI frame-count headers (flagged ``,vbr`` in the
  container string), CBR-extrapolated otherwise — so MP3 rows route,
  filter, and account at scale even though decoding them needs
  torchaudio/ffmpeg.

Everything runs in one ``mapInPandas`` pass over (media_id, payload); per
row only a few hundred header bytes are touched.  Unknown containers probe
to ``container='unknown'`` rather than failing the stage.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("container", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("bitrate_kbps", IntegerType(), True),
    ]
)

# MPEG-1 audio bitrate tables (kbps; index 0 = free, 15 = bad) and the
# MPEG-2/2.5 halved table — ISO/IEC 11172-3 / 13818-3
_MP3_BITRATES_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_MP3_BITRATES_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def _probe_mp3(p: bytes) -> dict | None:
    """First valid MPEG audio frame header → metadata, else None.

    Scans up to 4 KiB for the sync pattern (files often lead with an ID3v2
    tag, which is skipped by its declared size).  A match only counts when a
    SECOND frame header with the same version/layer sits exactly one frame
    length later (or the payload ends inside the first frame) — a lone
    4-byte sync coincidence in arbitrary binary must not classify as mp3."""
    pos = 0
    if p[:3] == b"ID3" and len(p) >= 10:
        # syncsafe 28-bit tag size
        size = (p[6] << 21) | (p[7] << 14) | (p[8] << 7) | p[9]
        pos = 10 + size
    end = min(len(p) - 4, pos + 4096)
    while pos <= end:
        if p[pos] == 0xFF and (p[pos + 1] & 0xE0) == 0xE0:
            version = (p[pos + 1] >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer_code = (p[pos + 1] >> 1) & 3  # 3=L1, 2=L2, 1=L3
            br_idx = (p[pos + 2] >> 4) & 0xF
            sr_idx = (p[pos + 2] >> 2) & 3
            if version == 1 or layer_code == 0 or br_idx in (0, 15) or sr_idx == 3:
                pos += 1
                continue
            layer = 4 - layer_code  # 1, 2, 3
            table = _MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2
            bitrate = table[layer][br_idx]
            rate = _MP3_RATES[version][sr_idx]
            mode = (p[pos + 3] >> 6) & 3  # 3 = mono
            channels = 1 if mode == 3 else 2
            padding = (p[pos + 2] >> 1) & 1
            if layer == 1:
                frame_len = (12 * bitrate * 1000 // rate + padding) * 4
            else:
                per_frame = 144 if (version == 3 or layer == 2) else 72
                frame_len = per_frame * bitrate * 1000 // rate + padding
            nxt = pos + frame_len
            if nxt + 2 <= len(p):
                same_vl = (p[nxt + 1] >> 1) & 0xF == (p[pos + 1] >> 1) & 0xF
                if not (p[nxt] == 0xFF and (p[nxt + 1] & 0xE0) == 0xE0 and same_vl):
                    pos += 1
                    continue
            # else: payload ends inside the first frame — accept

            # VBR headers (Xing/Info in the first frame's side-info gap,
            # or Fraunhofer's VBRI 32 bytes in) carry the EXACT frame
            # count — the CBR extrapolation below is wildly wrong for VBR
            # files, which are the common case for LAME-era encodes.
            spf = (
                384
                if layer == 1
                else (1152 if (layer == 2 or version == 3) else 576)
            )
            vbr_frames = vbr_bytes = None
            is_vbr = False
            if layer == 3:
                side = (17 if mode == 3 else 32) if version == 3 else (
                    9 if mode == 3 else 17
                )
                tag = pos + 4 + side
                magic = p[tag : tag + 4]
                if magic in (b"Xing", b"Info") and tag + 8 <= len(p):
                    flags = int.from_bytes(p[tag + 4 : tag + 8], "big")
                    q = tag + 8
                    if flags & 1 and q + 4 <= len(p):
                        vbr_frames = int.from_bytes(p[q : q + 4], "big")
                        q += 4
                    if flags & 2 and q + 4 <= len(p):
                        vbr_bytes = int.from_bytes(p[q : q + 4], "big")
                    is_vbr = magic == b"Xing"
                else:
                    v = pos + 4 + 32
                    if p[v : v + 4] == b"VBRI" and v + 18 <= len(p):
                        vbr_bytes = int.from_bytes(p[v + 10 : v + 14], "big")
                        vbr_frames = int.from_bytes(p[v + 14 : v + 18], "big")
                        is_vbr = True
            if vbr_frames:
                duration_ms = int(vbr_frames * spf * 1000 / rate)
                if vbr_bytes and duration_ms > 0:
                    # average bitrate over the whole stream, not frame 1's
                    bitrate = int(round(vbr_bytes * 8 / duration_ms))
            else:
                # CBR estimate: audio bytes (tag excluded) at this rate
                duration_ms = int((len(p) - pos) * 8 / bitrate)
            tag_suffix = ",vbr" if is_vbr else ""
            return {
                "container": (
                    f"mp3(v{ {3: 1, 2: 2, 0: 2.5}[version] }L{layer}"
                    f"{tag_suffix})"
                ),
                "sample_rate": rate,
                "channels": channels,
                "duration_ms": duration_ms,
                "bitrate_kbps": bitrate,
            }
        pos += 1
    return None


def _probe_jpeg(p: bytes) -> dict | None:
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            return None
        # T.81 allows fill bytes: any number of 0xFF before the marker code
        while pos + 1 < len(p) and p[pos + 1] == 0xFF:
            pos += 1
        marker = p[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = int.from_bytes(p[pos + 2 : pos + 4], "big")
        is_sof = 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC)
        if is_sof and pos + 9 <= len(p):
            h = int.from_bytes(p[pos + 5 : pos + 7], "big")
            w = int.from_bytes(p[pos + 7 : pos + 9], "big")
            return {"container": "jpeg", "width": w, "height": h}
        if marker == 0xDA:  # start of scan — SOF should have come first
            return None
        pos += 2 + seg_len
    return None


def _probe_one(p: bytes | None) -> dict:
    out: dict = {"container": "unknown"}
    if p is None or len(p) < 8:
        return out
    try:
        if p[:2] == b"BM" and len(p) >= 26:
            dib = int.from_bytes(p[14:18], "little")
            out["container"] = "bmp"
            if dib >= 40:  # BITMAPINFOHEADER and successors: 32-bit dims
                out.update(
                    width=int.from_bytes(p[18:22], "little", signed=True),
                    height=abs(int.from_bytes(p[22:26], "little", signed=True)),
                )
            elif dib == 12:  # OS/2 BITMAPCOREHEADER: 16-bit dims
                out.update(
                    width=int.from_bytes(p[18:20], "little"),
                    height=int.from_bytes(p[20:22], "little"),
                )
        elif p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
            out.update(
                container="png",
                width=int.from_bytes(p[16:20], "big"),
                height=int.from_bytes(p[20:24], "big"),
            )
        elif p[:4] == b"GIF8" and len(p) >= 10:
            out.update(
                container="gif",
                width=int.from_bytes(p[6:8], "little"),
                height=int.from_bytes(p[8:10], "little"),
            )
        elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            pos = 12
            fmt = None
            data_len = None
            while pos + 8 <= len(p):
                cid = p[pos : pos + 4]
                size = int.from_bytes(p[pos + 4 : pos + 8], "little")
                if cid == b"fmt ":
                    fmt = p[pos + 8 : pos + 8 + size]
                elif cid == b"data":
                    data_len = size
                pos += 8 + size + (size & 1)
            # the magic is unambiguous even when the fmt chunk is missing
            # or short — params stay null, same contract as the AVI branch
            out["container"] = "wav"
            if fmt is not None and len(fmt) >= 16:
                channels = int.from_bytes(fmt[2:4], "little")
                rate = int.from_bytes(fmt[4:8], "little")
                byte_rate = int.from_bytes(fmt[8:12], "little")
                out.update(sample_rate=rate, channels=channels)
                if data_len and byte_rate:
                    out["duration_ms"] = int(data_len * 1000 / byte_rate)
        elif p[:4] == b"RIFF" and p[8:12] == b"AVI " and len(p) >= 88:
            # avih is the first chunk of the first LIST(hdrl):
            # RIFF(12) LIST hdr(8) 'hdrl'(4) 'avih'(4) size(4) body
            if p[12:16] == b"LIST" and p[20:24] == b"hdrl" and p[24:28] == b"avih":
                body = p[32:]
                us_per_frame = int.from_bytes(body[0:4], "little")
                n_frames = int.from_bytes(body[16:20], "little")
                out.update(
                    container="avi",
                    width=int.from_bytes(body[32:36], "little"),
                    height=int.from_bytes(body[36:40], "little"),
                    duration_ms=int(n_frames * us_per_frame / 1000),
                )
            else:
                out["container"] = "avi"
        elif p[:4] == b"fLaC" and len(p) >= 42:
            body = p[8:42]
            rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            channels = ((body[12] >> 1) & 7) + 1
            total = ((body[13] & 0xF) << 32) | int.from_bytes(body[14:18], "big")
            out.update(container="flac", sample_rate=rate, channels=channels)
            if rate:
                out["duration_ms"] = int(total * 1000 / rate)
        else:
            probed = _probe_jpeg(p) or _probe_mp3(p)
            if probed:
                out.update(probed)
    except (ValueError, IndexError):
        out = {"container": "malformed"}
    return out


def probe_media(df: DataFrame) -> DataFrame:
    """(media_id, payload) → per-row container metadata, header-only.

    Scale shape: one narrow ``mapInPandas`` projection; only the first few
    hundred bytes of each payload are inspected (MP3 sync scan capped at
    4 KiB), no decode, no shuffle — the routing stage that decides what the
    expensive decode operators ever see."""

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = [f.name for f in PROBE_SCHEMA.fields]
        for batch in batches:
            rows = []
            for mid, p in zip(batch["media_id"], batch["payload"]):
                p = bytes(p) if p is not None else None
                info = _probe_one(p)
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(p) if p is not None else 0,
                        **{
                            k: info.get(k)
                            for k in (
                                "container", "width", "height", "sample_rate",
                                "channels", "duration_ms", "bitrate_kbps",
                            )
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "payload").mapInPandas(probe, schema=PROBE_SCHEMA)
