"""operators/avi.py: AVI bytes are assembled INDEPENDENTLY here (RIFF
writer + the test-side JPEG encoder from test_jpeg.py); the container
walk, header facts, MJPEG frame extraction, and the real
frame-sampling operator path must all invert them."""

from __future__ import annotations

import struct

import pytest

from kinesyslog_spark.operators.avi import extract_frames, parse_avi
from tests.test_jpeg import encode_jpeg


def _chunk(cid: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return cid + struct.pack("<I", len(data)) + data + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def make_avi(frames: list[bytes], w: int, h: int,
             us_per_frame: int = 40000, fourcc: bytes = b"MJPG") -> bytes:
    # AVIMAINHEADER: usPerFrame, maxBytesPerSec, padding, flags,
    # totalFrames, initialFrames, streams, suggestedBufSize, w, h
    avih = struct.pack(
        "<IIIII", us_per_frame, 0, 0, 0, len(frames)
    ) + struct.pack("<III", 0, 1, 0) + struct.pack("<II", w, h)
    # avih is 56 bytes in real files; the walker reads the first 40
    avih += b"\x00" * (56 - len(avih))
    strh = b"vids" + fourcc + b"\x00" * 48
    strl = _list(b"strl", _chunk(b"strh", strh))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _gray_frame(w: int, h: int, base: int) -> bytes:
    return bytes(min(255, base + x + y) for y in range(h) for x in range(w))


def _frames(w=16, h=8, n=6):
    return [
        encode_jpeg(_gray_frame(w, h, 20 * i + 10), w, h, 1, quality=95)
        for i in range(n)
    ]


def test_parse_avi_header_and_frames():
    frames = _frames()
    payload = make_avi(frames, 16, 8, us_per_frame=40000)
    meta = parse_avi(payload)
    assert meta["codec"] == "mjpg"
    assert (meta["width"], meta["height"]) == (16, 8)
    assert meta["n_frames"] == 6
    assert meta["fps"] == 25.0
    assert meta["duration_s"] == round(6 * 40000 / 1e6, 6)
    assert meta["frames"] == frames


def test_extract_frames_even_sampling_and_decode():
    frames = _frames(n=6)
    payload = make_avi(frames, 16, 8)
    got = extract_frames(payload, 3)
    assert [g[0] for g in got] == [0, 2, 4]  # evenly spaced indices
    for idx, w, h, px in got:
        assert (w, h) == (16, 8)
        # decoded pixels approximate the known source frame
        src = _gray_frame(16, 8, 20 * idx + 10)
        assert max(abs(a - b) for a, b in zip(px, src)) <= 8
    # k > n clamps to one row per frame
    assert len(extract_frames(payload, 99)) == 6


def test_non_mjpeg_raises_named():
    fake = [b"\x00\x01\x02\x03" * 10] * 3
    payload = make_avi(fake, 4, 4, fourcc=b"H264")
    with pytest.raises(NotImplementedError):
        extract_frames(payload, 2)
    with pytest.raises(ValueError):
        parse_avi(b"RIFFxxxxWAVE")  # not AVI
    with pytest.raises(ValueError):
        # AVI fourcc but no avih header
        parse_avi(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_video_header_avi_branch():
    from kinesyslog_spark.operators.multimodal import parse_video_header

    payload = make_avi(_frames(n=4), 16, 8, us_per_frame=50000)
    meta = parse_video_header(payload)
    assert meta == {
        "codec": "mjpg", "brand": "avi",
        "duration_s": round(4 * 50000 / 1e6, 6),
    }


def test_frame_sample_batches_real_path():
    import hashlib

    import pandas as pd

    from kinesyslog_spark.operators.jpeg import decode_jpeg
    from kinesyslog_spark.operators.multimodal import frame_sample_batches

    frames = _frames(n=6)
    payload = make_avi(frames, 16, 8)
    [out] = list(frame_sample_batches(iter([
        pd.DataFrame({"doc_id": [1, 2], "payload": [payload, b"not a video"]})
    ])))
    real = out[out.doc_id == 1]
    assert len(real) == 4  # MJPEG_SAMPLE_FRAMES
    # digests are over DECODED pixels of the sampled frames (0,1,3,4)
    expect0 = hashlib.md5(decode_jpeg(frames[0])[3]).hexdigest()
    assert real.iloc[0].frame_md5 == expect0
    # the stub path still emits rows for non-video payloads
    assert (out.doc_id == 2).sum() >= 1


def test_dib_avi_roundtrip_and_scene_cuts():
    from kinesyslog_spark.operators.avi import (
        decode_dib,
        encode_dib_avi,
        scene_cut_l1,
    )

    W, H = 18, 16  # W*3 = 54 -> 2 pad bytes per row
    def grad(g):
        return bytes(b for y in range(H) for _ in range(W) for b in ((g + y) % 256,) * 3)

    frames = [grad(10), grad(11), grad(120), grad(121)]
    avi = encode_dib_avi(W, H, frames)
    meta = parse_avi(avi)
    assert (meta["codec"], meta["width"], meta["height"], meta["bpp"]) == (
        "dib", W, H, 24,
    )
    assert meta["n_frames"] == 4
    for i, fr in enumerate(meta["frames"]):
        assert decode_dib(fr, W, H, 24) == frames[i]
    # extract_frames takes the DIB path (no NotImplementedError)
    got = extract_frames(avi, 2)
    assert [g[0] for g in got] == [0, 2]
    # histogram L1: delta 1 -> 2*W*1; delta 109 -> capped 2*W*H
    assert scene_cut_l1(avi) == [
        (1, 2 * W * 1), (2, 2 * W * H), (3, 2 * W * 1),
    ]


def test_decode_dib_8bit_and_truncated():
    from kinesyslog_spark.operators.avi import decode_dib

    # 8-bit: 5-wide rows pad to 8 bytes; bottom-up order
    W, H = 5, 2
    rows = [bytes(range(10, 15)) + b"\x00" * 3, bytes(range(20, 25)) + b"\x00" * 3]
    frame = rows[1] + rows[0]  # bottom-up: last row stored first
    rgb = decode_dib(frame, W, H, 8)
    assert rgb[:3] == bytes((10, 10, 10)) and rgb[15:18] == bytes((20, 20, 20))
    with pytest.raises(ValueError):
        decode_dib(frame[:-1], W, H, 8)
    with pytest.raises(NotImplementedError):
        decode_dib(frame, W, H, 16)


def test_hypothesis_dib_avi_roundtrip_random_videos():
    """Random multi-frame RGB videos survive the full container
    roundtrip: encode_dib_avi -> parse_avi -> decode_dib is the
    identity on pixels, dims, and frame count/order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesyslog_spark.operators.avi import decode_dib, encode_dib_avi

    @settings(max_examples=20, deadline=None)
    @given(
        w=st.integers(1, 10),
        h=st.integers(1, 8),
        nf=st.integers(1, 4),
        data=st.data(),
    )
    def run(w, h, nf, data):
        frames = [
            bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255),
                        min_size=w * h * 3,
                        max_size=w * h * 3,
                    )
                )
            )
            for _ in range(nf)
        ]
        meta = parse_avi(encode_dib_avi(w, h, frames))
        assert (meta["width"], meta["height"], meta["bpp"]) == (w, h, 24)
        assert meta["n_frames"] == nf
        for i, fr in enumerate(meta["frames"]):
            assert decode_dib(fr, w, h, 24) == frames[i]

    run()
