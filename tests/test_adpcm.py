"""IMA-ADPCM codec (operators/wav.py): golden-vector decode pin,
encode/decode roundtrip error bound, container dispatch, and the
multi-channel nibble-group interleave (stereo decode must bit-match a
per-channel mono decode)."""

from __future__ import annotations

import math
import struct

import pytest

from kinesyslog_spark.operators.wav import (
    decode_ima_adpcm,
    decode_wav_samples,
    encode_ima_adpcm,
)


def test_golden_vector_decode():
    """One hand-walkable block: predictor 0, index 0 (step 7), nibbles
    [2, 4, 8, 0]. Per the spec: diff = step>>3 (+step>>2 if b0)
    (+step>>1 if b1) (+step if b2), sign = b3, index += table[nib]."""
    # nibble 2 -> diff = 0 + 3(step>>1) wait: step=7: base 7>>3=0, b1 set: +7>>1=3 -> +3
    # pack nibbles [2, 4] -> byte 0x42, [8, 0] -> byte 0x08
    blk = struct.pack("<hBB", 0, 0, 0) + bytes([0x42, 0x08])
    got = decode_ima_adpcm(blk, len(blk))
    # walk: start p=0, i=0 (step 7)
    # nib 2: diff=0+3=3 -> p=3;  i=0+(-1)->0           (step 7)
    # nib 4: diff=0+7=7 -> p=10; i=0+2=2               (step 9)
    # nib 8: diff=9>>3=1, sign -> p=9; i=2-1=1         (step 8)
    # nib 0: diff=8>>3=1 -> p=10; i=1-1=0
    assert got == [0, 3, 10, 9, 10]


def _sine(n, amp=12000, period=50):
    return [int(amp * math.sin(2 * math.pi * i / period)) for i in range(n)]


def test_roundtrip_error_bounded():
    samples = _sine(2000)
    payload = encode_ima_adpcm(samples, 8000)
    rate, bits, chans = decode_wav_samples(payload)
    assert (rate, bits, len(chans)) == (8000, 16, 1)
    got = chans[0][: len(samples)]
    assert got[0] == samples[0]  # block header carries the exact sample
    # after the step-size adaptation transient (~first 100 samples from
    # index 0) the tracker stays within a few steps of the signal
    max_err = max(abs(a - b) for a, b in zip(got[100:], samples[100:]))
    assert max_err <= 1000
    # and the reconstruction correlates strongly
    num = sum(a * b for a, b in zip(got, samples))
    den = math.sqrt(sum(a * a for a in got) * sum(b * b for b in samples))
    assert num / den > 0.99


def test_multi_block_stream():
    samples = _sine(1300, period=37)  # > 2 blocks at 505 frames/block
    payload = encode_ima_adpcm(samples, 16000)
    _, _, chans = decode_wav_samples(payload)
    assert len(chans[0]) >= len(samples)
    err = max(
        abs(a - b)
        for a, b in zip(chans[0][100: len(samples)], samples[100:])
    )
    assert err <= 1000  # post-adaptation tracking bound


def test_corrupt_index_raises():
    blk = struct.pack("<hBB", 0, 99, 0) + b"\x00\x00"  # index 99 > 88
    with pytest.raises(ValueError):
        decode_ima_adpcm(blk, len(blk))


def test_stereo_matches_per_channel_mono():
    """The channel-interleave identity: each channel of a multi-channel
    IMA stream runs its OWN predictor/index state machine, so stereo
    decode of channel c must be bit-identical to a mono encode+decode
    of that channel alone (same block_frames => same nibble sequence)."""
    from kinesyslog_spark.operators.wav import encode_ima_adpcm_multi

    left = _sine(500, amp=9000, period=41)
    right = _sine(500, amp=15000, period=23)
    stereo = encode_ima_adpcm_multi([left, right], 8000, block_frames=64)
    rate, bits, chans = decode_wav_samples(stereo)
    assert (rate, bits, len(chans)) == (8000, 16, 2)
    for c, src in enumerate((left, right)):
        mono = decode_wav_samples(
            encode_ima_adpcm(src, 8000, block_frames=64)
        )[2][0]
        assert chans[c] == mono


def test_three_channel_roundtrip_tracks():
    from kinesyslog_spark.operators.wav import encode_ima_adpcm_multi

    srcs = [_sine(800, amp=a, period=p)
            for a, p in ((8000, 31), (12000, 47), (5000, 19))]
    _, _, chans = decode_wav_samples(
        encode_ima_adpcm_multi(srcs, 16000, block_frames=32)
    )
    assert len(chans) == 3
    for got, src in zip(chans, srcs):
        err = max(abs(a - b) for a, b in zip(got[100:len(src)], src[100:]))
        assert err <= 1200  # post-adaptation tracking bound


def test_audio_features_flow_through_adpcm():
    from kinesyslog_spark.operators.wav import audio_features

    payload = encode_ima_adpcm(_sine(600), 8000)
    feats = audio_features(payload)
    assert feats["sample_rate"] == 8000
    assert feats["n_samples"] >= 600
    assert feats["peak"] > 8000  # sine amplitude mostly preserved
    assert feats["zero_crossings"] > 10


def test_hypothesis_decode_total_on_random_blocks():
    """decode_ima_adpcm never crashes on arbitrary well-framed blocks
    (any nibble stream is valid IMA data) and output length is exact:
    1 header sample + 2 per data byte per block."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        nblocks=st.integers(1, 3),
        body=st.integers(1, 16),
        data=st.data(),
    )
    def run(nblocks, body, data):
        align = 4 + body
        blob = bytearray()
        for _ in range(nblocks):
            pred = data.draw(st.integers(-32768, 32767))
            idx = data.draw(st.integers(0, 88))
            blob += struct.pack("<hBB", pred, idx, 0)
            blob += bytes(
                data.draw(st.lists(st.integers(0, 255), min_size=body,
                                   max_size=body))
            )
        out = decode_ima_adpcm(bytes(blob), align)
        assert len(out) == nblocks * (1 + 2 * body)
        assert all(-32768 <= v <= 32767 for v in out)

    run()


# ---------------------------------------------------------------------------
# MS ADPCM (tag 0x02)
# ---------------------------------------------------------------------------


def test_ms_golden_vector_decode():
    """Hand-walked block: predictor 0 (c1=256, c2=0), delta 16,
    s1=100, s2=50, nibble byte 0x21 (high-first: 2 then 1).
      out seeds: [50, 100]
      nib 2: pred=100, sample=100+2*16=132, delta=max(16,(230*16)>>8)=16
      nib 1: pred=132, sample=132+16=148"""
    from kinesyslog_spark.operators.wav import decode_ms_adpcm

    blk = bytes([0]) + struct.pack("<hhh", 16, 100, 50) + bytes([0x21])
    assert decode_ms_adpcm(blk, len(blk), 1) == [[50, 100, 132, 148]]


def test_ms_golden_negative_nibble():
    from kinesyslog_spark.operators.wav import decode_ms_adpcm

    # nib 9 -> signed -7; nib 0xF -> signed -1
    blk = bytes([0]) + struct.pack("<hhh", 20, 0, 0) + bytes([0x9F])
    # nib 9: pred=0, sample=0-7*20=-140, delta=max(16,(614*20)>>8=47)=47
    # nib F: pred=-140, sample=-140-47=-187, delta=max(16,(230*47)>>8)=42
    assert decode_ms_adpcm(blk, len(blk), 1) == [[0, 0, -140, -187]]


def test_ms_roundtrip_tracks_mono_and_stereo():
    from kinesyslog_spark.operators.wav import encode_ms_adpcm

    mono = _sine(500, amp=9000, period=40)
    _, bits, chans = decode_wav_samples(encode_ms_adpcm([mono], 8000))
    assert bits == 16
    err = max(abs(a - b) for a, b in zip(chans[0][4:len(mono)], mono[4:]))
    assert err <= 600
    right = _sine(500, amp=5000, period=23)
    _, _, st = decode_wav_samples(encode_ms_adpcm([mono, right], 8000))
    for got, src in zip(st, (mono, right)):
        err = max(abs(a - b) for a, b in zip(got[4:len(src)], src[4:]))
        assert err <= 800


def test_ms_corrupt_predictor_raises():
    from kinesyslog_spark.operators.wav import decode_ms_adpcm

    blk = bytes([9]) + struct.pack("<hhh", 16, 0, 0) + bytes([0x00])
    with pytest.raises(ValueError):
        decode_ms_adpcm(blk, len(blk), 1)


def test_ms_hypothesis_decode_total():
    """decode_ms_adpcm never crashes on well-framed blocks with valid
    predictor bytes; output length is exact: 2 seeds + 2 nibbles/byte."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesyslog_spark.operators.wav import decode_ms_adpcm

    @settings(max_examples=25, deadline=None)
    @given(body=st.integers(1, 12), data=st.data())
    def run(body, data):
        blk = bytes([data.draw(st.integers(0, 6))])
        blk += struct.pack(
            "<hhh",
            data.draw(st.integers(-32768, 32767)),
            data.draw(st.integers(-32768, 32767)),
            data.draw(st.integers(-32768, 32767)),
        )
        blk += bytes(data.draw(
            st.lists(st.integers(0, 255), min_size=body, max_size=body)
        ))
        out = decode_ms_adpcm(blk, len(blk), 1)
        assert len(out[0]) == 2 + 2 * body
        assert all(-32768 <= v <= 32767 for v in out[0])

    run()
