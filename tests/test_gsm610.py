"""operators/gsm610.py GSM 06.10 (RPE-LTP) codec pins.

ETSI's official test sequences aren't available in this container, so
decoder bit-exactness against reference vectors is not pinned (the
documented posture, same as the other zero-dep codecs); what IS pinned:
WAV49 bitstream pack/unpack bit-exactness (hypothesis property over the
full parameter space), encoder/decoder round-trip SNR on tonal and
speech-like signals, saturation stress (full-scale square hits the
exp=6 APCM path), out-of-range LTP-lag fallback, garbage-block
containment, and the WAV container dispatch (tag 0x31) end-to-end
through decode_wav_samples/audio_features."""

from __future__ import annotations

import math
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesyslog_spark.operators.gsm610 import (
    FRAME_SAMPLES,
    Gsm610Decoder,
    Gsm610Encoder,
    decode_gsm_wav49,
    encode_gsm_wav49,
    pack_wav49,
    unpack_wav49,
)
from kinesyslog_spark.operators.multimodal import DECODE_ERRORS
from kinesyslog_spark.operators.wav import (
    audio_features,
    decode_wav_samples,
    encode_wav_gsm,
)


def _sine(n: int, freq: float = 440.0, amp: int = 9000) -> list[int]:
    return [int(amp * math.sin(2 * math.pi * freq * i / 8000))
            for i in range(n)]


def _speechlike(n: int) -> list[int]:
    # harmonic stack under a slow envelope — LPC-friendly like voiced
    # speech, unlike white noise (which RPE decimation cannot carry)
    return [
        int((6000 + 3000 * math.sin(2 * math.pi * i / 800)) * (
            0.6 * math.sin(2 * math.pi * 150 * i / 8000)
            + 0.3 * math.sin(2 * math.pi * 300 * i / 8000)
            + 0.1 * math.sin(2 * math.pi * 450 * i / 8000)))
        for i in range(n)
    ]


def _snr_db(ref: list[int], out: list[int], skip: int = 320) -> float:
    a, b = ref[skip:], out[skip:len(ref)]
    es = sum((x - y) ** 2 for x, y in zip(a, b))
    ss = sum(x * x for x in a)
    return 10 * math.log10(ss / es) if es else 99.0


# --- bitstream ---------------------------------------------------------

_frame_st = st.fixed_dictionaries({
    "larc": st.tuples(*[st.integers(0, (1 << b) - 1)
                        for b in (6, 6, 5, 5, 4, 4, 3, 3)]).map(list),
    "nc": st.lists(st.integers(0, 127), min_size=4, max_size=4),
    "bc": st.lists(st.integers(0, 3), min_size=4, max_size=4),
    "mc": st.lists(st.integers(0, 3), min_size=4, max_size=4),
    "xmaxc": st.lists(st.integers(0, 63), min_size=4, max_size=4),
    "xmc": st.lists(
        st.lists(st.integers(0, 7), min_size=13, max_size=13),
        min_size=4, max_size=4,
    ),
})


@settings(max_examples=50, deadline=None)
@given(f1=_frame_st, f2=_frame_st)
def test_wav49_pack_unpack_bitexact(f1, f2):
    blk = pack_wav49(f1, f2)
    assert len(blk) == 65
    g1, g2 = unpack_wav49(blk)
    assert g1 == f1 and g2 == f2


def test_pack_rejects_out_of_range():
    f = {"larc": [0] * 8, "nc": [0] * 4, "bc": [0] * 4, "mc": [0] * 4,
         "xmaxc": [64] + [0] * 3, "xmc": [[0] * 13] * 4}
    with pytest.raises(ValueError):
        pack_wav49(f, f)


def test_unpack_truncated_raises():
    with pytest.raises(ValueError):
        unpack_wav49(b"\x00" * 30)


# --- codec round trips -------------------------------------------------

def test_roundtrip_sine_snr():
    sig = _sine(8000)
    out = decode_gsm_wav49(encode_gsm_wav49(sig))
    assert len(out) == 8000
    assert _snr_db(sig, out) > 25.0


def test_roundtrip_speechlike_snr():
    sig = _speechlike(3200)
    out = decode_gsm_wav49(encode_gsm_wav49(sig))
    assert _snr_db(sig, out) > 20.0


def test_silence_stays_silent():
    out = decode_gsm_wav49(encode_gsm_wav49([0] * 640))
    assert max(abs(v) for v in out) < 64


def test_fullscale_square_saturation_path():
    # xmax saturates -> exp=6 -> the spec's asl(1, -1)=0 branch in APCM
    # inverse quantization; must decode bounded, not raise.
    sig = [32767 if (i // 40) % 2 else -32768 for i in range(1600)]
    out = decode_gsm_wav49(encode_gsm_wav49(sig))
    assert len(out) == 1600
    assert all(-32768 <= v <= 32767 for v in out)
    # the decoded square keeps most of its energy (it is tonal enough)
    assert max(abs(v) for v in out[320:]) > 16000


def test_encoder_parameter_ranges():
    enc = Gsm610Encoder()
    sig = _speechlike(320)
    for off in (0, 160):
        p = enc.encode_frame(sig[off:off + 160])
        for i, b in enumerate((6, 6, 5, 5, 4, 4, 3, 3)):
            assert 0 <= p["larc"][i] < (1 << b)
        for j in range(4):
            assert 40 <= p["nc"][j] <= 120
            assert 0 <= p["bc"][j] <= 3
            assert 0 <= p["mc"][j] <= 3
            assert 0 <= p["xmaxc"][j] <= 63
            assert all(0 <= c <= 7 for c in p["xmc"][j])


def test_encode_frame_wrong_length():
    with pytest.raises(ValueError):
        Gsm610Encoder().encode_frame([0] * 100)


def test_decoder_out_of_range_lag_falls_back():
    # spec 4.3.2: a transmitted Nc outside [40, 120] reuses the previous
    # valid lag (nrp) instead of indexing outside the residual history
    dec = Gsm610Decoder()
    p = {"larc": [32, 32, 16, 16, 8, 8, 4, 4],
         "nc": [127, 0, 39, 121], "bc": [1] * 4, "mc": [0] * 4,
         "xmaxc": [20] * 4, "xmc": [[4] * 13] * 4}
    out = dec.decode_frame(p)
    assert len(out) == FRAME_SAMPLES
    assert all(-32768 <= v <= 32767 for v in out)
    assert dec.nrp == 40  # never adopted an invalid lag


def test_garbage_blocks_contained():
    rng = random.Random(1)
    for _ in range(25):
        blob = bytes(rng.randrange(256) for _ in range(65 * 3))
        out = decode_gsm_wav49(blob)
        assert len(out) == 6 * FRAME_SAMPLES
        assert all(-32768 <= v <= 32767 for v in out)


def test_bad_block_align_raises_within_decode_errors():
    with pytest.raises(DECODE_ERRORS):
        decode_gsm_wav49(b"\x00" * 65, block_align=64)


# --- WAV container dispatch (tag 0x31) ---------------------------------

def test_wav_container_roundtrip():
    sig = _sine(1600, freq=220)
    payload = encode_wav_gsm(sig, 8000)
    rate, bits, chans = decode_wav_samples(payload)
    assert (rate, bits) == (8000, 16)
    assert len(chans) == 1
    assert chans[0] == decode_gsm_wav49(encode_gsm_wav49(sig))
    assert _snr_db(sig, chans[0]) > 25.0


def test_wav_container_stereo_gsm_rejected():
    sig = _sine(320)
    payload = bytearray(encode_wav_gsm(sig, 8000))
    # flip nChannels (offset 12 RIFF + 8 fmt header + 2 into fmt) to 2
    struct.pack_into("<H", payload, 12 + 8 + 2, 2)
    with pytest.raises(ValueError):
        decode_wav_samples(bytes(payload))


def test_audio_features_on_gsm():
    sig = _sine(3200)
    f = audio_features(encode_wav_gsm(sig, 8000))
    assert f["sample_rate"] == 8000 and f["n_channels"] == 1
    assert f["n_samples"] == 3200
    # 9000-amp sine through the codec; quantization overshoots ~10%
    assert 6000 < f["peak"] <= 11000
    # a 440 Hz sine at 8 kHz crosses zero ~2x440/sec * 0.4 s = ~352
    assert 300 < f["zero_crossings"] < 400
