"""Pure-python FLAC codec (operators/flac.py) + multimodal wiring."""

from __future__ import annotations

import numpy as np
import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from buzz_rust_spark.operators import multimodal as M
from buzz_rust_spark.operators.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_code,
    decode_flac,
    encode_flac,
)


def _roundtrip(sig, rate, ch):
    out = decode_flac(encode_flac(sig, rate, ch))
    assert out is not None
    samples, r, c = out
    assert (r, c) == (rate, ch)
    back = np.round(np.asarray(samples) * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(back, np.asarray(sig, dtype=np.int64))


def test_lossless_roundtrip_mono_multiblock():
    """>1 block (4096 fixed blocking) with tonal + noise content — FLAC is
    lossless, so the round-trip must be EXACT, not approximate."""
    rng = np.random.RandomState(3)
    t = np.arange(10_000)
    sig = (
        8000 * np.sin(2 * np.pi * 440 * t / 16000)
        + rng.randint(-200, 200, t.size)
    ).astype(np.int16)
    _roundtrip(sig, 16000, 1)


def test_lossless_roundtrip_stereo_interleaved():
    rng = np.random.RandomState(5)
    st = np.empty(5000 * 2, np.int16)
    st[0::2] = (3000 * np.sin(2 * np.pi * 220 * np.arange(5000) / 8000)).astype(
        np.int16
    )
    st[1::2] = rng.randint(-100, 100, 5000).astype(np.int16)
    _roundtrip(st, 8000, 2)


def test_lossless_roundtrip_extremes_and_partial_block():
    sig = np.array([32767, -32768, 0, 1, -1] * 31, np.int16)  # 155 samples
    _roundtrip(sig, 44100, 1)


def test_constant_block_compresses_hard():
    sig = np.full(8192, 1234, np.int16)
    flac = encode_flac(sig, 16000, 1)
    assert len(flac) < 200  # two CONSTANT subframes + headers
    _roundtrip(sig, 16000, 1)


def test_compression_beats_raw_on_tonal_audio():
    t = np.arange(16000)
    sig = (6000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    assert len(encode_flac(sig, 16000, 1)) < sig.size * 2 * 0.8


def test_crc_tamper_returns_none_not_wrong_audio():
    sig = (1000 * np.sin(np.arange(6000) / 7.0)).astype(np.int16)
    flac = bytearray(encode_flac(sig, 16000, 1))
    flac[len(flac) // 2] ^= 0x01
    assert decode_flac(bytes(flac)) is None


def test_md5_tamper_detected():
    """Flipping a bit of the STREAMINFO MD5 makes an otherwise-valid stream
    fail the final integrity check."""
    sig = np.arange(-500, 500, dtype=np.int16)
    flac = bytearray(encode_flac(sig, 8000, 1))
    # STREAMINFO md5 sits at bytes 8+34-16 .. 8+34 of the file (fLaC + block
    # header + 34-byte body, md5 = last 16 body bytes)
    flac[8 + 34 - 16] ^= 0xFF
    assert decode_flac(bytes(flac)) is None


def test_rejects_garbage():
    assert decode_flac(None) is None
    assert decode_flac(b"fLaC") is None
    assert decode_flac(b"not flac") is None
    assert decode_flac(M.encode_wav(np.zeros(10), 8000)) is None


def test_hand_built_lpc_and_midside_subframes():
    """Decoder paths the encoder never emits, driven by a hand-assembled
    frame: an order-1 LPC subframe (coef=1, shift=0 → same as FIXED-1) and
    mid/side stereo decorrelation."""
    # --- LPC: mono, blocksize 8, bps 16 ---
    samples = [100, 103, 101, 99, 104, 102, 98, 105]
    wr = _BitWriter()
    wr.write(0b11111111111110, 14)
    wr.write(0, 1)
    wr.write(0, 1)
    wr.write(0b0110, 4)      # 8-bit blocksize-1 follows
    wr.write(0, 4)           # rate from streaminfo
    wr.write(0, 4)           # mono
    wr.write(0b100, 3)       # 16-bit
    wr.write(0, 1)
    wr.align()
    hdr = bytearray(wr.bytes())
    hdr += _utf8_code(0)
    hdr += bytes([8 - 1])
    hdr.append(_crc8(bytes(hdr)))

    body = _BitWriter()
    body.write(0, 1)
    body.write(0b100000, 6)  # LPC order 1
    body.write(0, 1)
    body.write_signed(samples[0], 16)  # warmup
    body.write(2 - 1, 4)     # precision 2 bits
    body.write_signed(0, 5)  # shift 0
    body.write_signed(1, 2)  # coefficient +1
    body.write(0, 2)         # rice method 0
    body.write(0, 4)         # partition order 0
    body.write(2, 4)         # rice param 2
    for i in range(1, 8):
        r = samples[i] - samples[i - 1]
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        body.write_unary(u >> 2)
        body.write(u & 3, 2)
    body.align()
    frame = bytes(hdr) + body.bytes()
    frame += _crc16(frame).to_bytes(2, "big")

    si = _BitWriter()
    si.write(8, 16); si.write(8, 16); si.write(0, 24); si.write(0, 24)
    si.write(16000, 20); si.write(0, 3); si.write(15, 5); si.write(8, 36)
    stream = (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si.bytes()
        + b"\x00" * 16 + frame
    )
    out = decode_flac(stream)
    assert out is not None
    got = np.round(out[0] * 32768).astype(int)
    np.testing.assert_array_equal(got, samples)

    # --- mid/side: blocksize 4, constant mid + constant side ---
    left = [500, 500, 500, 500]
    right = [200, 200, 200, 200]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    side = [l - r for l, r in zip(left, right)]
    wr = _BitWriter()
    wr.write(0b11111111111110, 14)
    wr.write(0, 1); wr.write(0, 1)
    wr.write(0b0110, 4)
    wr.write(0, 4)
    wr.write(10, 4)          # mid/side
    wr.write(0b100, 3)
    wr.write(0, 1)
    wr.align()
    hdr = bytearray(wr.bytes())
    hdr += _utf8_code(0)
    hdr += bytes([4 - 1])
    hdr.append(_crc8(bytes(hdr)))
    body = _BitWriter()
    body.write(0, 1); body.write(0, 6); body.write(0, 1)
    body.write_signed(mid[0], 16)       # mid subframe: 16 bits
    body.write(0, 1); body.write(0, 6); body.write(0, 1)
    body.write_signed(side[0], 17)      # side subframe: bps+1 bits
    body.align()
    frame = bytes(hdr) + body.bytes()
    frame += _crc16(frame).to_bytes(2, "big")
    si = _BitWriter()
    si.write(4, 16); si.write(4, 16); si.write(0, 24); si.write(0, 24)
    si.write(16000, 20); si.write(1, 3); si.write(15, 5); si.write(4, 36)
    stream = (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si.bytes()
        + b"\x00" * 16 + frame
    )
    out = decode_flac(stream)
    assert out is not None
    got = np.round(out[0] * 32768).astype(int)
    np.testing.assert_array_equal(got[0::2], left)
    np.testing.assert_array_equal(got[1::2], right)


def test_empty_input_encodes_frameless_stream():
    f = encode_flac(np.array([], dtype=np.int16), 8000, 1)
    out = decode_flac(f)
    assert out is not None
    samples, rate, ch = out
    assert samples.size == 0 and rate == 8000 and ch == 1


def test_integer_input_clips_instead_of_wrapping():
    """int32 input beyond int16 range must clip (like the float path), not
    wrap modulo 2^16 into sign-flipped garbage."""
    s2, _, _ = decode_flac(encode_flac(np.array([40000, -40000, 100]), 8000, 1))
    np.testing.assert_array_equal(
        np.round(s2 * 32768).astype(int), [32767, -32768, 100]
    )


def test_malicious_lpc_overflow_returns_none_not_crash():
    """A CRC-valid stream whose LPC coefficients blow samples past any bound
    must return None (the decode contract), never raise into the Spark
    task."""
    wr = _BitWriter()
    wr.write(0b11111111111110, 14)
    wr.write(0, 1); wr.write(0, 1)
    wr.write(0b0110, 4)      # 8-bit blocksize-1
    wr.write(0, 4); wr.write(0, 4)  # rate from SI, mono
    wr.write(0b100, 3); wr.write(0, 1)
    wr.align()
    hdr = bytearray(wr.bytes())
    hdr += _utf8_code(0)
    hdr += bytes([255])      # blocksize 256
    hdr.append(_crc8(bytes(hdr)))
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b100000, 6)  # LPC order 1
    body.write(0, 1)
    body.write_signed(20000, 16)   # warmup
    body.write(15 - 1, 4)    # precision 15
    body.write_signed(0, 5)  # shift 0 → x[i] = 16383 * x[i-1]
    body.write_signed(16383, 15)
    body.write(0, 2)         # rice method 0
    body.write(0, 4)         # partition order 0
    body.write(15, 4)        # ESCAPE
    body.write(0, 5)         # 0 raw bits → all residuals zero
    body.align()
    frame = bytes(hdr) + body.bytes()
    frame += _crc16(frame).to_bytes(2, "big")
    si = _BitWriter()
    si.write(256, 16); si.write(256, 16); si.write(0, 24); si.write(0, 24)
    si.write(16000, 20); si.write(0, 3); si.write(15, 5); si.write(256, 36)
    stream = (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si.bytes()
        + b"\x00" * 16 + frame
    )
    assert decode_flac(stream) is None  # must not raise


def test_frame_rate_code_contradicting_streaminfo_rejected():
    sig = np.arange(100, dtype=np.int16)
    flac = bytearray(encode_flac(sig, 16000, 1))
    # frame header starts right after fLaC + 4 + 34 metadata; its 3rd byte
    # holds blocksize/samplerate codes — force sr code 9 (44.1k) ≠ 16k
    fh = 4 + 4 + 34
    assert flac[fh] == 0xFF
    old = flac[fh + 2]
    flac[fh + 2] = (old & 0xF0) | 0x09
    # fix the header CRC-8 so ONLY the contradiction is tested
    from buzz_rust_spark.operators.flac import _crc8 as crc8
    # header = sync..utf8(0)..(crc8) → bytes fh..fh+4 + frame number byte
    hdr = bytes(flac[fh : fh + 5])
    flac[fh + 5] = crc8(hdr)
    assert decode_flac(bytes(flac)) is None


def test_bitio_roundtrip_and_utf8():
    wr = _BitWriter()
    wr.write(0b101, 3); wr.write_signed(-5, 7); wr.write_unary(11); wr.align()
    rd = _BitReader(wr.bytes())
    assert rd.read(3) == 0b101
    assert rd.read_signed(7) == -5
    assert rd.read_unary() == 11
    for n in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF, 12345678):
        rd = _BitReader(_utf8_code(n))
        from buzz_rust_spark.operators.flac import _utf8_decode

        assert _utf8_decode(rd) == n


def test_audio_features_flac_equals_wav(spark):
    """synthetic_media audio now rotates WAV/FLAC; features must be the real
    decoded stats for BOTH containers (same signal → same stats)."""
    media = M.synthetic_media(spark, n=4, kind="audio")
    feats = {r["media_id"]: r["feature"] for r in M.decode_features(media).collect()}
    mimes = {r["media_id"]: r["mime"] for r in media.collect()}
    assert mimes[0] == "audio/wav" and mimes[1] == "audio/flac"
    for i in range(4):
        assert feats[i][0] == pytest.approx(0.8, abs=1e-6)  # 8000 Hz / 1e4
        assert abs(feats[i][2]) < 0.01                      # sine mean ~0
        assert feats[i][5] == pytest.approx(0.5, abs=0.01)  # amplitude
    # and the FLAC payload really is FLAC
    row1 = media.where("media_id = 1").collect()[0]
    assert bytes(row1["payload"])[:4] == b"fLaC"


def test_flac_strict_decode_features(spark):
    media = M.synthetic_media(spark, n=4, kind="audio")
    assert len(M.decode_features(media, strict=True).collect()) == 4


# --- property tests (hypothesis): losslessness over arbitrary input ---------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=2000),
    st.sampled_from([8000, 16000, 22050, 44100]),
)
def test_property_flac_roundtrip_lossless_mono(samples, rate):
    sig = np.asarray(samples, dtype=np.int16)
    out = decode_flac(encode_flac(sig, rate, 1))
    assert out is not None
    back = np.round(np.asarray(out[0]) * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(back, sig.astype(np.int64))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=2, max_size=1000)
    .filter(lambda x: len(x) % 2 == 0)
)
def test_property_flac_roundtrip_lossless_stereo(samples):
    sig = np.asarray(samples, dtype=np.int16)
    out = decode_flac(encode_flac(sig, 16000, 2))
    assert out is not None
    back = np.round(np.asarray(out[0]) * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(back, sig.astype(np.int64))


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_property_flac_decoder_never_raises_on_fuzz(blob):
    # arbitrary bytes (incl. ones starting with the magic) → None or a
    # valid tuple, never an exception into the caller
    for payload in (b"fLaC" + blob, blob):
        out = decode_flac(payload)
        assert out is None or len(out) == 3
