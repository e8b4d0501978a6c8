"""Header-only media probing (operators/probe.py)."""

from __future__ import annotations

import numpy as np

from buzz_rust_spark.operators import multimodal as M
from buzz_rust_spark.operators.flac import encode_flac
from buzz_rust_spark.operators.probe import _probe_one, probe_media


def _mp3_frame_len(hdr: bytes) -> int:
    """Frame length per the same ISO arithmetic the probe uses."""
    version = (hdr[1] >> 3) & 3
    layer = 4 - ((hdr[1] >> 1) & 3)
    br_idx = (hdr[2] >> 4) & 0xF
    sr_idx = (hdr[2] >> 2) & 3
    from buzz_rust_spark.operators.probe import (
        _MP3_BITRATES_V1,
        _MP3_BITRATES_V2,
        _MP3_RATES,
    )

    table = _MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2
    bitrate, rate = table[layer][br_idx], _MP3_RATES[version][sr_idx]
    if layer == 1:
        return (12 * bitrate * 1000 // rate) * 4
    return (144 if (version == 3 or layer == 2) else 72) * bitrate * 1000 // rate


def _mp3(n_bytes=10_000, with_id3=True, hdr=b"\xff\xfb\x90\x00"):
    """A CBR stream: consecutive frames (header + zero body) — the probe
    demands a second frame header one frame length after the first."""
    id3 = (
        b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 10]) + b"\x00" * 10
        if with_id3
        else b""
    )
    fl = _mp3_frame_len(hdr)
    frame = hdr + b"\x00" * (fl - 4)
    n_frames = max((n_bytes + 4 + fl - 1) // fl, 2)
    body = (frame * n_frames)[: n_bytes + 4]
    return id3 + body


def test_probe_every_supported_container():
    px = np.zeros((10, 14, 3), np.uint8)
    assert _probe_one(M.encode_bmp(px)) == {
        "container": "bmp", "width": 14, "height": 10,
    }
    assert _probe_one(M.encode_png(px)) == {
        "container": "png", "width": 14, "height": 10,
    }
    for progressive in (False, True):
        assert _probe_one(M.encode_jpeg(px, progressive=progressive)) == {
            "container": "jpeg", "width": 14, "height": 10,
        }
    assert _probe_one(M.encode_gif([px, px], delays_ms=[50, 50])) == {
        "container": "gif", "width": 14, "height": 10,
    }
    wav = _probe_one(M.encode_wav(np.zeros(8000), 8000))
    assert wav["container"] == "wav" and wav["sample_rate"] == 8000
    assert wav["channels"] == 1 and wav["duration_ms"] == 1000
    flac = _probe_one(encode_flac(np.zeros(16000, np.int16), 16000, 1))
    assert flac["container"] == "flac" and flac["duration_ms"] == 1000
    avi = _probe_one(M.encode_avi([px] * 5, fps=10))
    assert avi == {
        "container": "avi", "width": 14, "height": 10, "duration_ms": 500,
    }


def test_probe_mp3_header_with_id3_tag():
    """MPEG-1 Layer III, 128 kbps, 44.1 kHz stereo behind an ID3v2 tag —
    metadata triage for the one audio format whose decode is refused."""
    info = _probe_one(_mp3())
    assert info["container"] == "mp3(v1L3)"
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert info["bitrate_kbps"] == 128
    # CBR estimate over the post-tag bytes: 10004 B * 8 / 128 kbps ≈ 625 ms
    assert abs(info["duration_ms"] - 625) <= 2


def test_probe_mp3_variants():
    # MPEG-2 Layer III 64 kbps @ 22050, mono: FF F3 (v2 L3), idx 8, sr 0, mode 3
    info = _probe_one(_mp3(with_id3=False, hdr=b"\xff\xf3\x80\xc0"))
    assert info["container"] == "mp3(v2L3)"
    assert info["sample_rate"] == 22050
    assert info["channels"] == 1
    assert info["bitrate_kbps"] == 64
    # MPEG-1 Layer I: 0xFE = sync tail + version 3 + layer code 3 + noprot;
    # bitrate idx 4 → 128 kbps in the L1 table
    info = _probe_one(_mp3(with_id3=False, hdr=b"\xff\xfe\x40\x00"))
    assert info["container"] == "mp3(v1L1)"
    assert info["bitrate_kbps"] == 128


def test_probe_rejects_free_and_bad_bitrates():
    # bitrate index 0 (free) and 15 (bad) must not match as a frame
    for hdr in (b"\xff\xfb\x00\x00", b"\xff\xfb\xf0\x00"):
        assert _probe_one(hdr + b"\x00" * 5000)["container"] == "unknown"


def test_probe_rejects_lone_sync_coincidence():
    """Arbitrary binary containing one 4-byte sync pattern must NOT classify
    as mp3 — a second frame header one frame length later is required."""
    blob = b"\x37" * 700 + b"\xff\xfb\x90\x00" + b"\x37" * 5000
    assert _probe_one(blob)["container"] == "unknown"


def test_probe_unknown_and_null():
    assert _probe_one(b"\x00" * 64) == {"container": "unknown"}
    assert _probe_one(None) == {"container": "unknown"}
    assert _probe_one(b"short") == {"container": "unknown"}


def test_probe_media_distributed(spark):
    """The routing stage end-to-end: mixed media rows probe to the right
    container with no decode (and unknown payloads survive as rows)."""
    imgs = M.synthetic_media(spark, n=6, kind="image")
    auds = M.synthetic_media(spark, n=4, kind="audio")
    vids = M.synthetic_media(spark, n=2, kind="video")
    opaque = M.synthetic_media(spark, n=2, kind="opaque")
    all_media = (
        imgs.unionByName(
            auds.withColumn("media_id", auds.media_id + 100)
        )
        .unionByName(vids.withColumn("media_id", vids.media_id + 200))
        .unionByName(opaque.withColumn("media_id", opaque.media_id + 300))
    )
    rows = {r["media_id"]: r for r in probe_media(all_media).collect()}
    assert len(rows) == 14
    assert [rows[i]["container"] for i in range(6)] == [
        "bmp", "png", "jpeg", "bmp", "png", "jpeg",
    ]
    assert rows[100]["container"] == "wav" and rows[101]["container"] == "flac"
    assert rows[200]["container"] == "avi"
    # synthetic dims: width 64+i%16, height 48+i%12
    assert rows[0]["width"] == 64 and rows[0]["height"] == 48
    assert rows[200]["duration_ms"] == 400  # 4 frames at 10 fps
    assert rows[300]["container"] == "unknown"
    assert rows[300]["n_bytes"] > 0


# --- property test (hypothesis): the router must never fail the stage -------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_property_probe_never_raises_on_fuzz(blob):
    for payload in (
        blob,
        b"BM" + blob,
        b"RIFF" + blob,
        b"\x89PNG\r\n\x1a\n" + blob,
        b"\xff\xd8" + blob,
        b"fLaC" + blob,
        b"ID3" + blob,
        b"GIF8" + blob,
    ):
        info = _probe_one(payload)
        assert isinstance(info, dict) and "container" in info

def _mp3_with_xing(magic=b"Xing", frames=100, nbytes=50_000,
                   hdr=b"\xff\xfb\x90\x00"):
    """First frame carrying a Xing/Info VBR header (frames+bytes flags) in
    the side-info gap, followed by two plain frames."""
    fl = _mp3_frame_len(hdr)
    first = bytearray(hdr + b"\x00" * (fl - 4))
    tag = 4 + 32  # MPEG-1 stereo side-info length
    first[tag:tag + 4] = magic
    first[tag + 4:tag + 8] = (3).to_bytes(4, "big")  # frames | bytes
    first[tag + 8:tag + 12] = frames.to_bytes(4, "big")
    first[tag + 12:tag + 16] = nbytes.to_bytes(4, "big")
    frame = hdr + b"\x00" * (fl - 4)
    return bytes(first) + frame * 2


def test_probe_mp3_xing_vbr_exact_duration():
    """A Xing header's exact frame count replaces the CBR extrapolation:
    duration = frames * 1152 / rate, bitrate = stream average."""
    info = _probe_one(_mp3_with_xing())
    assert info["container"] == "mp3(v1L3,vbr)"
    want_ms = int(100 * 1152 * 1000 / 44100)  # 2612
    assert info["duration_ms"] == want_ms
    assert info["bitrate_kbps"] == round(50_000 * 8 / want_ms)

    # "Info" magic = LAME's CBR marker: exact duration, no vbr flag
    info = _probe_one(_mp3_with_xing(magic=b"Info"))
    assert info["container"] == "mp3(v1L3)"
    assert info["duration_ms"] == want_ms


def test_probe_mp3_vbri_header():
    hdr = b"\xff\xfb\x90\x00"
    fl = _mp3_frame_len(hdr)
    first = bytearray(hdr + b"\x00" * (fl - 4))
    v = 4 + 32  # VBRI sits 32 bytes after the frame header
    first[v:v + 4] = b"VBRI"
    first[v + 10:v + 14] = (40_000).to_bytes(4, "big")   # bytes
    first[v + 14:v + 18] = (200).to_bytes(4, "big")      # frames
    frame = hdr + b"\x00" * (fl - 4)
    info = _probe_one(bytes(first) + frame * 2)
    assert info["container"] == "mp3(v1L3,vbr)"
    assert info["duration_ms"] == int(200 * 1152 * 1000 / 44100)
