"""AVI/MJPEG video container codec + distributed frame extraction."""

from __future__ import annotations

import numpy as np
import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from buzz_rust_spark.operators import multimodal as M


def _solid(c, h=20, w=28):
    return np.full((h, w, 3), c, np.uint8)


def test_avi_roundtrip_solid_frames_exact():
    frames = [_solid((10, 200, 60)), _solid((250, 5, 120)), _solid((33, 44, 55))]
    avi = M.encode_avi(frames, fps=10)
    out = M.decode_avi_frames(avi)
    assert [t for t, _ in out] == [0, 100, 200]
    for (_, img), ref in zip(out, frames):
        assert np.array_equal(img, ref)


def test_avi_gradient_close_under_flat_quant():
    yy, xx = np.mgrid[0:24, 0:24]
    g = np.stack([xx * 10 % 256, yy * 10 % 256, np.full_like(xx, 128)], 2).astype(
        np.uint8
    )
    img = M.decode_avi_frames(M.encode_avi([g], fps=25, quant=1))[0][1]
    assert np.abs(img.astype(int) - g.astype(int)).max() <= 2


def test_avi_timestamps_follow_stream_rate():
    avi = M.encode_avi([_solid((1, 2, 3))] * 5, fps=40)
    assert [t for t, _ in M.decode_avi_frames(avi)] == [0, 25, 50, 75, 100]


def test_avi_raw_dib_chunks_decode():
    """A hand-built AVI whose frames are '00db' raw bottom-up BGR DIBs (the
    uncompressed profile) decodes without any JPEG involvement."""
    h, w = 4, 5
    px = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    stride = (w * 3 + 3) & ~3
    dib = np.zeros((h, stride), np.uint8)
    dib[:, : w * 3] = px[::-1][:, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    raw = dib.tobytes()

    def u32(v):
        return int(v).to_bytes(4, "little")

    def u16(v):
        return int(v).to_bytes(2, "little")

    def chunk(fourcc, data):
        return fourcc + u32(len(data)) + data + (b"\x00" if len(data) % 2 else b"")

    def lst(fourcc, data):
        return chunk(b"LIST", fourcc + data)

    strh = (
        b"vids" + b"DIB " + u32(0) + u16(0) + u16(0) + u32(0)
        + u32(1) + u32(10) + u32(0) + u32(1) + u32(len(raw))
        + u32(0) + u32(0) + u16(0) + u16(0) + u16(w) + u16(h)
    )
    strf = (
        u32(40) + u32(w) + u32(h) + u16(1) + u16(24) + b"\x00\x00\x00\x00"
        + u32(len(raw)) + u32(0) * 4
    )
    hdrl = lst(b"hdrl", chunk(b"avih", u32(100_000) + u32(0) * 13)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", chunk(b"00db", raw))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + u32(len(body)) + body

    out = M.decode_avi_frames(avi)
    assert len(out) == 1 and out[0][0] == 0
    assert np.array_equal(out[0][1], px)


def test_avi_rejects_garbage_and_wave():
    assert M.decode_avi_frames(None) is None
    assert M.decode_avi_frames(b"RIFF\x04\x00\x00\x00AVI ") is None
    assert M.decode_avi_frames(b"not avi at all") is None
    # a WAV is RIFF too — must not be claimed by the AVI decoder
    wav = M.encode_wav(np.linspace(-1, 1, 50), 8000)
    assert M.decode_avi_frames(wav) is None


def test_avi_second_stream_chunks_ignored():
    frames = [_solid((9, 9, 9))]
    avi = bytearray(M.encode_avi(frames, fps=10))
    # append a bogus '01dc' chunk inside a fresh movi LIST at the end; the
    # decoder must only read stream 00
    extra = b"01dc" + (4).to_bytes(4, "little") + b"\xde\xad\xbe\xef"
    movi = b"LIST" + (4 + len(extra)).to_bytes(4, "little") + b"movi" + extra
    avi = bytes(avi[:4]) + (len(avi) + len(movi) - 8).to_bytes(4, "little") + bytes(
        avi[8:]
    ) + movi
    out = M.decode_avi_frames(avi)
    assert len(out) == 1


def test_avi_video_stream_not_first():
    """An AVI listing its audio stream first (video = stream 01) must still
    decode: the stream prefix comes from the strl order, not hard-coded 00,
    and the strf dims bind to the vids strl (not the audio WAVEFORMATEX)."""
    base = M.encode_avi([_solid((7, 70, 170))], fps=10)

    def u32(v):
        return int(v).to_bytes(4, "little")

    def u16(v):
        return int(v).to_bytes(2, "little")

    def chunk(fourcc, data):
        return fourcc + u32(len(data)) + data + (b"\x00" if len(data) % 2 else b"")

    def lst(fourcc, data):
        return chunk(b"LIST", fourcc + data)

    # pull the pieces out of the known-good file
    hdrl_start = base.index(b"hdrl") - 8
    movi_start = base.index(b"movi") - 8
    avih = base[base.index(b"avih") : base.index(b"avih") + 8 + 56]
    strh = base[base.index(b"strh") : base.index(b"strh") + 8 + 56]
    strf = base[base.index(b"strf") : base.index(b"strf") + 8 + 40]
    jpeg_start = base.index(b"00dc")
    jpeg_size = int.from_bytes(base[jpeg_start + 4 : jpeg_start + 8], "little")
    jpeg = base[jpeg_start + 8 : jpeg_start + 8 + jpeg_size]

    auds_strh = (
        b"auds" + b"\x00" * 4 + u32(0) + u16(0) + u16(0) + u32(0)
        + u32(1) + u32(8000) + u32(0) + u32(8000) + u32(0)
        + u32(0) + u32(1) + u16(0) + u16(0) + u16(0) + u16(0)
    )
    # WAVEFORMATEX-ish strf whose fields would be nonsense as biWidth/biHeight
    auds_strf = u16(1) + u16(1) + u32(8000) + u32(8000) + u16(1) + u16(8)
    hdrl = lst(
        b"hdrl",
        avih
        + lst(b"strl", chunk(b"strh", auds_strh) + chunk(b"strf", auds_strf))
        + lst(b"strl", strh + strf),
    )
    movi = lst(b"movi", chunk(b"01dc", jpeg) + chunk(b"00wb", b"\x80" * 100))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + u32(len(body)) + body

    out = M.decode_avi_frames(avi)
    assert out is not None and len(out) == 1
    assert np.array_equal(out[0][1], _solid((7, 70, 170)))


def test_resize_uses_container_rate_for_single_frame():
    """A one-frame 10 fps AVI must keep its rate through resize (fps comes
    from strh scale/rate, not reconstructed from one timestamp)."""
    avi = M.encode_avi([_solid((5, 6, 7), 16, 16)], fps=10)
    assert M._avi_frame_ms(avi) == 100.0


def test_extract_video_frames_distributed(spark):
    media = M.synthetic_media(spark, n=6, kind="video")
    rows = M.extract_video_frames(media).collect()
    # 4 frames per video
    assert len(rows) == 24
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    for i, frs in by_id.items():
        frs.sort(key=lambda r: r["frame_idx"])
        assert [r["ts_ms"] for r in frs] == [0, 100, 200, 300]
        for f, r in enumerate(frs):
            px = M.decode_png(bytes(r["frame_png"]))
            expect = (
                (i * 53 + f * 61) % 256,
                (i * 17 + f * 29) % 256,
                (f * 83) % 256,
            )
            assert tuple(px[0, 0]) == expect
            assert (px == px[0, 0]).all()


def test_extract_video_frames_every_ms_thinning(spark):
    media = M.synthetic_media(spark, n=2, kind="video")
    rows = M.extract_video_frames(media, every_ms=200).collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["ts_ms"])
    for ts in per.values():
        assert sorted(ts) == [0, 200]


def test_resize_preserves_avi_container(spark):
    media = M.synthetic_media(spark, n=3, kind="video")
    out = {r["media_id"]: r for r in M.resize_images(media, 8, 6).collect()}
    for i in range(3):
        p = bytes(out[i]["payload"])
        assert p[:4] == b"RIFF" and p[8:12] == b"AVI "
        frames = M.decode_avi_frames(p)
        assert len(frames) == 4
        assert frames[0][1].shape == (6, 8, 3)
        # solid colors survive the resize+re-encode exactly
        assert tuple(frames[1][1][0, 0]) == (
            (i * 53 + 61) % 256,
            (i * 17 + 29) % 256,
            83 % 256,
        )


def test_video_features_are_real_first_frame_stats(spark):
    media = M.synthetic_media(spark, n=2, kind="video")
    feats = {r["media_id"]: r["feature"] for r in M.decode_features(media).collect()}
    for i in range(2):
        w, h = 64 + i % 16, 48 + i % 12
        assert feats[i][0] == w and feats[i][1] == h
        c = ((i * 53) % 256, (i * 17) % 256, 0)
        gray = sum(c) / 3.0 / 255.0
        assert feats[i][2] == pytest.approx(gray, abs=1e-6)  # mean
        assert feats[i][3] == pytest.approx(0.0, abs=1e-9)  # std (solid)


def test_encode_avi_validation():
    with pytest.raises(ValueError):
        M.encode_avi([])
    with pytest.raises(ValueError):
        M.encode_avi([_solid((1, 1, 1), 4, 4), _solid((1, 1, 1), 5, 4)])
    with pytest.raises(ValueError):
        M.encode_avi([_solid((1, 1, 1))], fps=0)
