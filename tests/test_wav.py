"""operators/wav.py PCM codec pins: decode against independently
hand-built RIFF bytes, hypothesis roundtrips, exact feature values on
known waveforms, and the q126 registry surface."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesyslog_spark.operators.wav import (
    audio_features,
    decode_wav_samples,
    encode_wav,
)


def _riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WAVE"
    for cid, data in chunks:
        body += cid + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            body += b"\x00"  # word alignment pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_handbuilt_stereo16():
    # independent construction: 2ch 16-bit, 3 frames, interleaved LE
    frames = struct.pack("<6h", 100, -100, 200, -200, 300, -300)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    payload = _riff([(b"fmt ", fmt), (b"data", frames)])
    rate, bits, chans = decode_wav_samples(payload)
    assert (rate, bits) == (44100, 16)
    assert chans == [[100, 200, 300], [-100, -200, -300]]


def test_decode_8bit_centering():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    payload = _riff([(b"fmt ", fmt), (b"data", bytes([128, 255, 0, 130]))])
    rate, bits, chans = decode_wav_samples(payload)
    assert (rate, bits) == (8000, 8)
    assert chans == [[0, 127, -128, 2]]


def test_decode_rejects_non_pcm_and_malformed():
    # a genuinely exotic tag (MPEG Layer 3) stays behind the seam;
    # GSM 6.10 (0x31) is a real decode path now (tests/test_gsm610.py)
    fmt_mp3 = struct.pack("<HHIIHH", 0x55, 1, 8000, 1000, 1, 0)
    with pytest.raises(NotImplementedError):
        decode_wav_samples(_riff([(b"fmt ", fmt_mp3), (b"data", b"")]))
    with pytest.raises(ValueError):
        decode_wav_samples(b"not riff at all")
    with pytest.raises(ValueError):
        decode_wav_samples(_riff([(b"data", b"\x00\x00")]))  # no fmt


def test_decode_alaw_reference_points():
    # G.711 A-law expansion pinned at the canonical extremes: 0xD5 -> +8
    # (quietest positive), 0x55 -> -8, 0xAA -> +32256 (max), 0x2A -> min.
    fmt = struct.pack("<HHIIHH", 6, 1, 8000, 8000, 1, 8)
    data = bytes([0xD5, 0x55, 0xAA, 0x2A, 0x95, 0x15])
    rate, bits, chans = decode_wav_samples(
        _riff([(b"fmt ", fmt), (b"data", data)])
    )
    assert (rate, bits) == (8000, 16)
    got = chans[0]
    assert got[:4] == [8, -8, 32256, -32256]
    assert got[4] == -got[5]  # sign symmetry at an interior code
    # segment monotonicity: positive codes span strictly rising magnitude
    _, _, (mono,) = decode_wav_samples(
        _riff([(b"fmt ", fmt), (b"data", bytes(b ^ 0x55 for b in range(0x80, 0x100)))])
    )
    assert mono == sorted(mono) and mono[0] > 0  # strictly positive, rising


def test_decode_extensible_pcm_roundtrip():
    from kinesyslog_spark.operators.wav import encode_wav_extensible

    chans = [[100, -200, 300], [-100, 200, -300]]
    rate, bits, got = decode_wav_samples(
        encode_wav_extensible(chans, 22050, 16)
    )
    assert (rate, bits) == (22050, 16)
    assert got == chans


def test_decode_24_and_32bit_pcm():
    # 24-bit: 3-byte little-endian two's complement, mono
    vals24 = [0, 1, -1, 8388607, -8388608, -40000]
    data24 = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals24
    )
    fmt24 = struct.pack("<HHIIHH", 1, 1, 48000, 48000 * 3, 3, 24)
    rate, bits, chans = decode_wav_samples(
        _riff([(b"fmt ", fmt24), (b"data", data24)])
    )
    assert (rate, bits) == (48000, 24)
    assert chans == [vals24]
    # 32-bit stereo interleaved
    vals32 = [2147483647, -2147483648, 70000, -70000]
    data32 = b"".join(struct.pack("<i", v) for v in vals32)
    fmt32 = struct.pack("<HHIIHH", 1, 2, 96000, 96000 * 8, 8, 32)
    rate, bits, chans = decode_wav_samples(
        _riff([(b"fmt ", fmt32), (b"data", data32)])
    )
    assert (rate, bits) == (96000, 32)
    assert chans == [[2147483647, 70000], [-2147483648, -70000]]


def _ext_fmt(tag: int, ch: int, rate: int, block: int, bits: int,
             samples_field: int) -> bytes:
    from kinesyslog_spark.operators.wav import _KSDATAFORMAT_TAIL

    return struct.pack(
        "<HHIIHH", 0xFFFE, ch, rate, rate * block, block, bits
    ) + struct.pack("<HHI", 22, samples_field, (1 << ch) - 1) \
        + struct.pack("<I", tag) + _KSDATAFORMAT_TAIL


def test_decode_extensible_reduced_valid_bits():
    # 20 valid bits left-justified in a 24-bit container: the decoder
    # re-justifies (arithmetic >> 4) and reports the VALID depth.
    vals20 = [0, 1, -1, 524287, -524288, -12345]
    data = b"".join(
        ((v << 4) & 0xFFFFFF).to_bytes(3, "little") for v in vals20
    )
    fmt = _ext_fmt(1, 1, 48000, 3, 24, 20)
    rate, bits, chans = decode_wav_samples(
        _riff([(b"fmt ", fmt), (b"data", data)])
    )
    assert (rate, bits) == (48000, 20)
    assert chans == [vals20]


def test_decode_extensible_compressed_samples_field_not_bit_depth():
    # For a compressed SubFormat the extensible Samples union field is
    # wSamplesPerBlock, NOT wValidBitsPerSample — it must not trip the
    # re-justification path. IMA ADPCM, 505 samples per block.
    from kinesyslog_spark.operators.wav import encode_ima_adpcm

    sig = [((i * 37) % 200) - 100 for i in range(1009)]
    plain = encode_ima_adpcm(sig, 8000, block_frames=504)
    # lift the data chunk out of the mono writer's container
    _, _, expect = decode_wav_samples(plain)
    data = plain[plain.index(b"data") + 8:]
    fmt = _ext_fmt(0x11, 1, 8000, 4 + 504 // 2, 4, 505)
    rate, bits, chans = decode_wav_samples(
        _riff([(b"fmt ", fmt), (b"data", data)])
    )
    assert (rate, bits) == (8000, 16)
    assert chans == expect


def test_decode_extensible_bad_guid_rejected():
    fmt = struct.pack(
        "<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16
    ) + struct.pack("<HHI", 22, 16, 1) + b"\x01\x00\x00\x00" + b"\xde" * 12
    with pytest.raises(ValueError):
        decode_wav_samples(
            _riff([(b"fmt ", fmt), (b"data", b"\x00\x00")])
        )


def test_decode_float32_scaled_and_clamped():
    # IEEE float WAV (tag 3): real decode, truncation toward zero,
    # clamped to int16 — round-5 seam closure.
    vals = [0.0, 0.5, -0.5, 1.0, -1.0, 1.5, -1.5, 0.25]
    fmt = struct.pack("<HHIIHH", 3, 2, 8000, 64000, 8, 32)
    data = b"".join(struct.pack("<f", v) for v in vals)
    rate, bits, chans = decode_wav_samples(
        _riff([(b"fmt ", fmt), (b"data", data)])
    )
    assert (rate, bits, len(chans)) == (8000, 16, 2)
    # interleaved stereo: ch0 = vals[0::2], ch1 = vals[1::2]
    expect = [int(v * 32767.0) for v in vals]
    expect = [max(-32768, min(32767, s)) for s in expect]
    assert chans[0] == expect[0::2]
    assert chans[1] == expect[1::2]


def test_decode_mulaw_reference_points():
    # G.711 mu-law expansion pinned at the table's canonical extremes
    # and zeros (0x00 -> -32124, 0x80 -> +32124, 0xFF/0x7F -> 0).
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    data = bytes([0x00, 0x80, 0xFF, 0x7F, 0x10, 0x90])
    rate, bits, chans = decode_wav_samples(
        _riff([(b"fmt ", fmt), (b"data", data)])
    )
    assert (rate, bits) == (8000, 16)
    got = chans[0]
    assert got[:4] == [-32124, 32124, 0, 0]
    assert got[4] == -got[5]  # sign symmetry
    # monotone: decreasing byte in [0x00..0x7F] is increasing magnitude
    fmt1 = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    seq = bytes(range(0x00, 0x80))
    _, _, (mono,) = decode_wav_samples(
        _riff([(b"fmt ", fmt1), (b"data", seq)])
    )
    assert all(a < b <= 0 for a, b in zip(mono, mono[1:])) or all(
        a <= b for a, b in zip(mono, mono[1:])
    )
    assert mono == sorted(mono)  # negative, rising toward zero


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 50),
    ch=st.integers(1, 3),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_random(n, ch, bits, seed):
    import random

    rnd = random.Random(seed)
    lo, hi = (0, 255) if bits == 8 else (-32768, 32767)
    chans = [[rnd.randint(lo, hi) for _ in range(n)] for _ in range(ch)]
    rate, dbits, got = decode_wav_samples(encode_wav(chans, 16000, bits))
    assert (rate, dbits) == (16000, bits)
    expect = ([[v - 128 for v in c] for c in chans] if bits == 8
              else chans)
    assert got == expect


def test_features_known_square_wave():
    # +500/-500 alternating, 8 samples: zc = 7, peak = 500,
    # sum_sq = 8 * 250000, rms = 500 exactly
    mono = [500, -500] * 4
    f = audio_features(encode_wav([mono], 8000))
    assert f["n_samples"] == 8 and f["peak"] == 500
    assert f["sum_sq"] == 8 * 250_000
    assert f["rms"] == 500.0
    assert f["zero_crossings"] == 7


def test_features_zero_samples_carry_sign():
    # 5, 0, -5: one crossing (zero carries the previous +); 0-lead
    # samples establish no sign
    f = audio_features(encode_wav([[0, 5, 0, -5, 0, 5]], 8000))
    assert f["zero_crossings"] == 2
    assert f["peak"] == 5
    assert f["rms"] == round(math.sqrt((25 * 3) / 6), 4)


def test_q126_registry(spark, sf_dir):
    from kinesyslog_spark.queries import QUERIES

    rows = QUERIES["q126_audio_features"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_samples > 0 and r.peak > 0
        assert r.rms > 0 and r.sum_sq > 0
        assert 0 <= r.zero_crossings < r.n_samples


def test_decode_float64():
    vals = [0.0, 0.25, -0.5, 1.5, -2.0]
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 8, 8, 64)
    data = b"".join(struct.pack("<d", v) for v in vals)
    rate, bits, chans = decode_wav_samples(
        _riff([(b"fmt ", fmt), (b"data", data)])
    )
    assert (rate, bits) == (8000, 16)
    expect = [max(-32768, min(32767, int(v * 32767.0))) for v in vals]
    assert chans[0] == expect


def test_decode_float_inf_nan_contained():
    # Adversarial float WAV: ±inf used to hit int(inf * 32767.0) ->
    # OverflowError, which is NOT in multimodal.DECODE_ERRORS, so one
    # corrupt blob escaped the containment catch and killed the task
    # (round-5 ADVICE). Clamp happens in the float domain now: inf ->
    # ±32767/-32768 saturation, NaN -> 0, never an exception.
    vals_bits = [0x7F800000, 0xFF800000, 0x7FC00000, 0x3F000000]
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    data = b"".join(struct.pack("<I", b) for b in vals_bits)
    rate, bits, chans = decode_wav_samples(
        _riff([(b"fmt ", fmt), (b"data", data)])
    )
    assert (rate, bits) == (8000, 16)
    assert chans[0] == [32767, -32768, 0, int(0.5 * 32767.0)]
