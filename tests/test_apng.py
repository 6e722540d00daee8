"""operators/apng.py pins: an INDEPENDENT in-test APNG writer (RGBA
frames, real CRCs, fdAT sequence numbering) that the decoder must
invert, with hand-composed expectations per blend/dispose mode —
the tests/test_gif.py strategy applied to PNG animation."""

from __future__ import annotations

import struct
import zlib

import pytest

from kinesyslog_spark.operators.apng import decode_apng_frames

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _idat_stream(w: int, h: int, rgba: bytes) -> bytes:
    raw = b"".join(
        b"\x00" + rgba[r * w * 4:(r + 1) * w * 4] for r in range(h)
    )
    return zlib.compress(raw)


def apng_bytes(sw: int, sh: int, frames: list[dict],
               default_in_anim: bool = True) -> bytes:
    """Independent APNG writer. Each frame dict: x, y, w, h,
    rgba (bytes), dispose, blend."""
    out = _SIG + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", sw, sh, 8, 6, 0, 0, 0)
    )
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for k, f in enumerate(frames):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, f["w"], f["h"], f.get("x", 0),
            f.get("y", 0), 1, 10, f.get("dispose", 0), f.get("blend", 0),
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        stream = _idat_stream(f["w"], f["h"], f["rgba"])
        if k == 0 and default_in_anim:
            out += _chunk(b"IDAT", stream)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + stream)
            seq += 1
    return out + _chunk(b"IEND", b"")


def _solid(w, h, rgba):
    return bytes(rgba) * (w * h)


def _rgb_of(canvas_rgba: bytes, sw: int, sh: int) -> bytes:
    return bytes(
        b for p in range(sw * sh) for b in canvas_rgba[p * 4:p * 4 + 3]
    )


RED = (255, 0, 0, 255)
GREEN = (0, 255, 0, 255)
BLUE_HALF = (0, 0, 255, 128)
CLEAR = (0, 0, 0, 0)


def test_blend_source_and_over():
    payload = apng_bytes(2, 2, [
        {"w": 2, "h": 2, "rgba": _solid(2, 2, RED)},
        # 1x1 at (1,1), half-transparent blue OVER red
        {"x": 1, "y": 1, "w": 1, "h": 1,
         "rgba": bytes(BLUE_HALF), "blend": 1},
    ])
    w, h, ch, frames = decode_apng_frames(payload)
    assert (w, h, ch, len(frames)) == (2, 2, 3, 2)
    assert frames[0] == _rgb_of(_solid(2, 2, RED), 2, 2)
    # integer Porter-Duff over opaque red: out = (src*sa*255 + dst*255*(255-sa)) / (255*255)
    r = (255 * 255 * (255 - 128)) // (255 * 255)
    b = (255 * 128 * 255) // (255 * 255)
    px = frames[1]
    assert px[(1 * 2 + 1) * 3:(1 * 2 + 1) * 3 + 3] == bytes((r, 0, b))
    # other pixels untouched
    assert px[:3] == bytes((255, 0, 0))


def test_blend_source_replaces_alpha():
    # SOURCE blend of a transparent pixel ERASES (unlike OVER)
    payload = apng_bytes(2, 1, [
        {"w": 2, "h": 1, "rgba": _solid(2, 1, GREEN)},
        {"x": 0, "y": 0, "w": 1, "h": 1,
         "rgba": bytes(CLEAR), "blend": 0},
    ])
    _, _, _, frames = decode_apng_frames(payload)
    assert frames[1][:3] == b"\x00\x00\x00"  # transparent reads black
    assert frames[1][3:6] == bytes((0, 255, 0))


def test_dispose_background_and_previous():
    payload = apng_bytes(2, 2, [
        {"w": 2, "h": 2, "rgba": _solid(2, 2, RED)},
        {"w": 2, "h": 2, "rgba": _solid(2, 2, GREEN), "dispose": 2},
        {"x": 0, "y": 0, "w": 1, "h": 1, "rgba": bytes(GREEN)},
        {"x": 1, "y": 1, "w": 1, "h": 1,
         "rgba": bytes(GREEN), "dispose": 1},
        {"x": 0, "y": 1, "w": 1, "h": 1, "rgba": bytes(GREEN)},
    ])
    _, _, _, frames = decode_apng_frames(payload)
    assert frames[1] == _rgb_of(_solid(2, 2, GREEN), 2, 2)
    # frame 3: dispose=2 restored pre-frame-2 canvas (red), then 1x1 green
    exp3 = bytearray(_rgb_of(_solid(2, 2, RED), 2, 2))
    exp3[0:3] = bytes((0, 255, 0))
    assert frames[2] == bytes(exp3)
    # frame 5: frame 4's dispose=1 cleared (1,1) to transparent black
    px = frames[4]
    assert px[(1 * 2 + 1) * 3:(1 * 2 + 1) * 3 + 3] == b"\x00\x00\x00"
    assert px[(1 * 2 + 0) * 3:(1 * 2 + 0) * 3 + 3] == bytes((0, 255, 0))


def test_default_image_outside_animation():
    # fcTL only after IDAT: the default image is NOT an animation frame
    f1 = _solid(1, 1, GREEN)
    out = _SIG + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    )
    out += _chunk(b"acTL", struct.pack(">II", 1, 0))
    out += _chunk(b"IDAT", _idat_stream(1, 1, _solid(1, 1, RED)))
    out += _chunk(
        b"fcTL",
        struct.pack(">IIIIIHHBB", 0, 1, 1, 0, 0, 1, 10, 0, 0),
    )
    out += _chunk(b"fdAT", struct.pack(">I", 1) + _idat_stream(1, 1, f1))
    out += _chunk(b"IEND", b"")
    _, _, _, frames = decode_apng_frames(out)
    assert len(frames) == 1
    assert frames[0] == bytes((0, 255, 0))


def test_max_frames_and_malformed():
    payload = apng_bytes(1, 1, [
        {"w": 1, "h": 1, "rgba": bytes(RED)},
        {"w": 1, "h": 1, "rgba": bytes(GREEN)},
    ])
    assert len(decode_apng_frames(payload, max_frames=1)[3]) == 1
    with pytest.raises(ValueError):
        decode_apng_frames(b"not a png")
    # plain PNG (no acTL) is rejected by the ANIMATION decoder
    from kinesyslog_spark.operators.png import encode_png

    with pytest.raises(ValueError):
        decode_apng_frames(encode_png(b"\x00" * 4, 2, 2))
    # frame rect escaping the canvas
    bad = apng_bytes(1, 1, [
        {"w": 1, "h": 1, "rgba": bytes(RED)},
        {"x": 1, "y": 0, "w": 1, "h": 1, "rgba": bytes(GREEN)},
    ])
    with pytest.raises(ValueError):
        decode_apng_frames(bad)


def test_frame_sampler_takes_apng_real_path():
    import hashlib

    import pandas as pd

    from kinesyslog_spark.operators.multimodal import frame_sample_batches

    payload = apng_bytes(2, 2, [
        {"w": 2, "h": 2, "rgba": _solid(2, 2, RED)},
        {"x": 0, "y": 1, "w": 2, "h": 1,
         "rgba": _solid(2, 1, GREEN), "dispose": 1},
        {"w": 2, "h": 2, "rgba": _solid(2, 2, GREEN)},
    ])
    [out] = list(frame_sample_batches(iter([
        pd.DataFrame({"doc_id": [3], "payload": [payload]})
    ])))
    frames = decode_apng_frames(payload)[3]
    assert len(out) == len(frames) == 3
    for j, px in enumerate(frames):
        assert out.iloc[j].frame_md5 == hashlib.md5(px).hexdigest()


def test_random_animation_matches_independent_compositor():
    """Property: random frame sequences (regions, disposal, blend,
    alpha) decode to exactly what an INDEPENDENT numpy RGBA compositor
    produces (integer Porter-Duff, same spec semantics)."""
    import random

    import numpy as np

    def compose(sw, sh, frames):
        canvas = np.zeros((sh, sw, 4), dtype=np.int64)
        out = []
        for k, f in enumerate(frames):
            x, y, w, h = f.get("x", 0), f.get("y", 0), f["w"], f["h"]
            src = np.frombuffer(f["rgba"], dtype=np.uint8).astype(
                np.int64
            ).reshape(h, w, 4)
            disp = f.get("dispose", 0)
            if k == 0 and disp == 2:
                disp = 1
            saved = canvas.copy() if disp == 2 else None
            reg = canvas[y:y + h, x:x + w]
            if f.get("blend", 0) == 0:
                reg[:] = src
            else:
                sa = src[..., 3:4]
                da = reg[..., 3:4]
                oa255 = sa * 255 + da * (255 - sa)
                num = src[..., :3] * sa * 255 + reg[..., :3] * da * (255 - sa)
                rgb = np.where(oa255 > 0, num // np.maximum(oa255, 1), 0)
                a = (oa255 + 127) // 255
                full = sa == 255
                reg[..., :3] = np.where(full, src[..., :3], rgb)
                reg[..., 3:4] = np.where(full, 255, np.where(sa == 0, da, a))
                zero = (sa == 0)
                reg[..., :3] = np.where(zero, canvas[y:y + h, x:x + w][..., :3], reg[..., :3])
            out.append(canvas[..., :3].astype(np.uint8).tobytes())
            if disp == 1:
                canvas[y:y + h, x:x + w] = 0
            elif disp == 2:
                canvas = saved
        return out

    rnd = random.Random(11)
    for trial in range(8):
        sw, sh = rnd.randint(2, 6), rnd.randint(2, 6)
        frames = [{
            "w": sw, "h": sh,
            "rgba": bytes(rnd.randrange(256) for _ in range(sw * sh * 4)),
        }]
        for _ in range(rnd.randint(1, 5)):
            w = rnd.randint(1, sw)
            h = rnd.randint(1, sh)
            frames.append({
                "x": rnd.randint(0, sw - w), "y": rnd.randint(0, sh - h),
                "w": w, "h": h,
                "rgba": bytes(
                    rnd.randrange(256) for _ in range(w * h * 4)
                ),
                "dispose": rnd.choice([0, 1, 2]),
                "blend": rnd.choice([0, 1]),
            })
        payload = apng_bytes(sw, sh, frames)
        _, _, _, got = decode_apng_frames(payload)
        expect = compose(sw, sh, frames)
        assert len(got) == len(expect), trial
        for k, (g, e) in enumerate(zip(got, expect)):
            assert g == e, (trial, k, sw, sh)
