"""operators/gif.py decode pins: an INDEPENDENT spec-faithful GIF-LZW
compressor + container writer live in this test; the decoder must
invert them across random index streams (hypothesis), KwKwK-triggering
runs, width-growth streams, interlace, local color tables, and
extension blocks. Error paths are driven with malformed bytes."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesyslog_spark.operators.gif import decode_gif


def lzw_compress(min_code_size: int, indices: bytes) -> bytes:
    """Reference GIF-LZW compressor (dictionary form, width growth,
    4096-entry cap with CLEAR reset)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def reset():
        return {bytes([c]): c for c in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = reset()
    out_bits.append((clear, width))
    w = b""
    for k in bytes(indices):
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        out_bits.append((table[w], width))
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # dictionary full: emit CLEAR and start over
            out_bits.append((clear, width))
            table, next_code, width = reset()
        w = bytes([k])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((end, width))
    # LSB-first bit packing
    acc = nbits = 0
    data = bytearray()
    for code, cw in out_bits:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _pal_bits(n_colors: int) -> int:
    bits = 1
    while (1 << bits) < n_colors:
        bits += 1
    return bits


def gif_bytes(w: int, h: int, palette: list[tuple[int, int, int]],
              indices: bytes, interlace: bool = False,
              local_table: bool = False,
              with_extension: bool = False) -> bytes:
    bits = max(1, _pal_bits(len(palette)))
    size = 1 << bits
    pal = b"".join(bytes(c) for c in palette)
    pal += b"\x00" * (3 * size - len(pal))
    min_code = max(2, bits)

    out = b"GIF89a" + struct.pack("<HHBBB", w, h,
                                  0 if local_table else 0x80 | (bits - 1),
                                  0, 0)
    if not local_table:
        out += pal
    if with_extension:  # a graphic-control extension to skip over
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    iflags = (0x80 | (bits - 1) if local_table else 0) | (
        0x40 if interlace else 0
    )
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    if local_table:
        out += pal
    out += bytes([min_code])
    data = lzw_compress(min_code, indices)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00\x3b"


PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]


def _rgb(palette, indices):
    return b"".join(bytes(palette[i]) for i in indices)


def test_simple_decode_and_extension_skip():
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0])
    payload = gif_bytes(4, 2, PAL4, idx, with_extension=True)
    dw, dh, ch, rgb = decode_gif(payload)
    assert (dw, dh, ch) == (4, 2, 3)
    assert rgb == _rgb(PAL4, idx)


def test_kwkwk_case():
    # long runs of one symbol force the cW == next_code special case
    idx = bytes([1] * 40 + [2] * 40)
    payload = gif_bytes(8, 10, PAL4, idx)
    assert decode_gif(payload)[3] == _rgb(PAL4, idx)


def test_width_growth_many_colors():
    # 200-color palette -> 8-bit codes; mixed stream grows the dict
    palette = [(i, 255 - i, (i * 7) % 256) for i in range(200)]
    idx = bytes((i * 37 + (i % 13)) % 200 for i in range(4000))
    payload = gif_bytes(80, 50, palette, idx)
    assert decode_gif(payload)[3] == _rgb(palette, idx)


def test_interlaced_rows_restored():
    h = 11  # odd height exercises all four passes unevenly
    idx = bytes((r * 4 + c) % 4 for r in range(h) for c in range(4))
    # write rows in interlace order: passes 0,8.. / 4,12.. / 2,6.. / 1,3..
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    rows = [idx[r * 4:(r + 1) * 4] for r in range(h)]
    shuffled = b"".join(rows[r] for r in order)
    payload = gif_bytes(4, h, PAL4, shuffled, interlace=True)
    assert decode_gif(payload)[3] == _rgb(PAL4, idx)


def test_local_color_table_wins():
    idx = bytes([0, 1, 1, 0])
    payload = gif_bytes(2, 2, PAL4, idx, local_table=True)
    assert decode_gif(payload)[3] == _rgb(PAL4, idx)


def test_malformed_inputs():
    with pytest.raises(ValueError):
        decode_gif(b"PNG not gif")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 4)  # truncated LSD
    # valid header, no frame
    payload = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b"
    with pytest.raises(ValueError):
        decode_gif(payload)
    # LZW stream shorter than the frame: build a 2x2 GIF's stream but
    # claim 4x2 in both descriptors
    short = gif_bytes(2, 2, PAL4, bytes([0] * 4)).replace(
        struct.pack("<HHHHB", 0, 0, 2, 2, 0),
        struct.pack("<HHHHB", 0, 0, 4, 2, 0),
    ).replace(
        b"GIF89a" + struct.pack("<HH", 2, 2),
        b"GIF89a" + struct.pack("<HH", 4, 2),
    )
    with pytest.raises(ValueError):
        decode_gif(short)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 16), h=st.integers(1, 16),
    ncol=st.integers(2, 16), seed=st.integers(0, 2**31 - 1),
    interlace=st.booleans(),
)
def test_roundtrip_random(w, h, ncol, seed, interlace):
    import random

    rnd = random.Random(seed)
    palette = [
        (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
        for _ in range(ncol)
    ]
    idx = bytes(rnd.randrange(ncol) for _ in range(w * h))
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = [idx[r * w:(r + 1) * w] for r in range(h)]
        stream = b"".join(rows[r] for r in order)
    else:
        stream = idx
    payload = gif_bytes(w, h, palette, stream, interlace=interlace)
    dw, dh, ch, rgb = decode_gif(payload)
    assert (dw, dh, ch) == (w, h, 3)
    assert rgb == _rgb(palette, idx)


def test_resize_batches_gif_real_pixels():
    """The q61 operator's GIF branch digests REAL downscaled pixels."""
    import hashlib

    import pandas as pd

    from kinesyslog_spark.operators.multimodal import resize_batches
    from kinesyslog_spark.operators.png import box_downscale, to_gray

    palette = [(i, i, i) for i in range(128)]
    w, h = 100, 80
    idx = bytes((x * 127) // (w * h - 1) for x in range(w * h))
    payload = gif_bytes(w, h, palette, idx)
    [out] = list(resize_batches(iter([
        pd.DataFrame({"doc_id": [1], "payload": [payload]})
    ])))
    row = out.iloc[0]
    assert (row.out_w, row.out_h) == (64, 51)
    rgb = _rgb(palette, idx)
    gray = to_gray(rgb, 3)
    expect = hashlib.md5(box_downscale(gray, w, h, 64, 51)).hexdigest()
    assert row.thumb_md5 == expect


# ---------------------------------------------------------------------------
# Animated-GIF composition (decode_gif_frames)
# ---------------------------------------------------------------------------


def animated_gif_bytes(sw, sh, palette, frames, bg=0):
    """Independent multi-frame GIF writer. Each frame is a dict:
    left/top/w/h, indices (bytes), disposal (int), tindex (int or None).
    """
    bits = max(1, _pal_bits(len(palette)))
    size = 1 << bits
    pal = b"".join(bytes(c) for c in palette)
    pal += b"\x00" * (3 * size - len(pal))
    min_code = max(2, bits)
    out = b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), bg, 0)
    out += pal
    for f in frames:
        packed = (f.get("disposal", 0) & 0x07) << 2
        tindex = f.get("tindex")
        if tindex is not None:
            packed |= 0x01
        out += b"\x21\xf9\x04" + bytes([packed, 0, 0, tindex or 0, 0])
        out += b"\x2c" + struct.pack(
            "<HHHHB", f.get("left", 0), f.get("top", 0), f["w"], f["h"], 0
        )
        out += bytes([min_code])
        data = lzw_compress(min_code, f["indices"])
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    return out + b"\x3b"


def _canvas(palette, sw, sh, fill):
    return bytearray(bytes(palette[fill]) * (sw * sh))


def _paint(canvas, palette, sw, left, top, w, h, indices, tindex=None):
    for r in range(h):
        for c in range(w):
            ci = indices[r * w + c]
            if ci == tindex:
                continue
            o = ((top + r) * sw + left + c) * 3
            canvas[o:o + 3] = bytes(palette[ci])


def test_animation_overlay_with_transparency():
    from kinesyslog_spark.operators.gif import decode_gif_frames

    sw, sh = 4, 3
    f1 = bytes([0] * 12)                       # full red
    f2 = bytes([1, 3, 3, 1])                   # 2x2 at (1,1), index 3 clear
    payload = animated_gif_bytes(sw, sh, PAL4, [
        {"w": 4, "h": 3, "indices": f1},
        {"left": 1, "top": 1, "w": 2, "h": 2, "indices": f2, "tindex": 3},
    ])
    w, h, ch, frames = decode_gif_frames(payload)
    assert (w, h, ch, len(frames)) == (4, 3, 3, 2)
    exp1 = _canvas(PAL4, sw, sh, 0)
    assert frames[0] == bytes(exp1)
    exp2 = bytearray(exp1)
    _paint(exp2, PAL4, sw, 1, 1, 2, 2, f2, tindex=3)
    assert frames[1] == bytes(exp2)
    # transparent cells kept frame-1 red
    assert frames[1][(1 * 4 + 2) * 3:(1 * 4 + 2) * 3 + 3] == bytes(PAL4[0])


def test_animation_disposal_background():
    from kinesyslog_spark.operators.gif import decode_gif_frames

    sw, sh = 4, 2
    f1 = bytes([1] * 8)                        # full green
    f2 = bytes([2, 2])                         # 2x1 at (0,0), disposal 2
    f3 = bytes([3])                            # 1x1 at (3,1)
    payload = animated_gif_bytes(sw, sh, PAL4, [
        {"w": 4, "h": 2, "indices": f1},
        {"w": 2, "h": 1, "indices": f2, "disposal": 2},
        {"left": 3, "top": 1, "w": 1, "h": 1, "indices": f3},
    ], bg=0)
    _, _, _, frames = decode_gif_frames(payload)
    exp2 = _canvas(PAL4, sw, sh, 1)
    _paint(exp2, PAL4, sw, 0, 0, 2, 1, f2)
    assert frames[1] == bytes(exp2)
    # frame 3: the disposal-2 rect went back to BACKGROUND red, then f3 drew
    exp3 = _canvas(PAL4, sw, sh, 1)
    _paint(exp3, PAL4, sw, 0, 0, 2, 1, bytes([0, 0]))
    _paint(exp3, PAL4, sw, 3, 1, 1, 1, f3)
    assert frames[2] == bytes(exp3)


def test_animation_disposal_previous():
    from kinesyslog_spark.operators.gif import decode_gif_frames

    sw, sh = 3, 3
    f1 = bytes([0] * 9)
    f2 = bytes([2] * 9)                        # full blue, disposal 3
    f3 = bytes([1])                            # 1x1 green at (2,2)
    payload = animated_gif_bytes(sw, sh, PAL4, [
        {"w": 3, "h": 3, "indices": f1},
        {"w": 3, "h": 3, "indices": f2, "disposal": 3},
        {"left": 2, "top": 2, "w": 1, "h": 1, "indices": f3},
    ])
    _, _, _, frames = decode_gif_frames(payload)
    assert frames[1] == bytes(_canvas(PAL4, sw, sh, 2))
    # frame 3 starts from the PRE-frame-2 canvas (all red), then draws f3
    exp3 = _canvas(PAL4, sw, sh, 0)
    _paint(exp3, PAL4, sw, 2, 2, 1, 1, f3)
    assert frames[2] == bytes(exp3)


def test_animation_max_frames_and_first_frame_parity():
    from kinesyslog_spark.operators.gif import decode_gif_frames

    idx = bytes([0, 1, 2, 3])
    payload = animated_gif_bytes(2, 2, PAL4, [
        {"w": 2, "h": 2, "indices": idx},
        {"w": 2, "h": 2, "indices": bytes([3, 2, 1, 0])},
    ])
    _, _, _, one = decode_gif_frames(payload, max_frames=1)
    assert len(one) == 1
    # no transparency => composed frame 0 == the single-frame decoder
    assert one[0] == decode_gif(payload)[3]


def test_animation_malformed():
    from kinesyslog_spark.operators.gif import decode_gif_frames

    with pytest.raises(ValueError):
        decode_gif_frames(b"GIF89a" + b"\x00" * 3)
    # frame rect escaping the logical screen
    bad = animated_gif_bytes(2, 2, PAL4, [
        {"left": 1, "top": 1, "w": 2, "h": 2, "indices": bytes(4)},
    ])
    with pytest.raises(ValueError):
        decode_gif_frames(bad)
    with pytest.raises(ValueError):
        decode_gif_frames(animated_gif_bytes(2, 2, PAL4, []))


def test_frame_sample_batches_gif_real_frames():
    """The q62 fan-out operator digests REAL composed animation frames
    for GIF payloads (not the byte-slice stub)."""
    import hashlib

    import pandas as pd

    from kinesyslog_spark.operators.gif import decode_gif_frames
    from kinesyslog_spark.operators.multimodal import frame_sample_batches

    payload = animated_gif_bytes(3, 2, PAL4, [
        {"w": 3, "h": 2, "indices": bytes([0, 1, 2, 3, 0, 1])},
        {"left": 1, "top": 0, "w": 2, "h": 2,
         "indices": bytes([2, 3, 3, 2]), "tindex": 3},
        {"w": 1, "h": 1, "indices": bytes([1]), "disposal": 2},
    ])
    [out] = list(frame_sample_batches(iter([
        pd.DataFrame({"doc_id": [7], "payload": [payload]})
    ])))
    frames = decode_gif_frames(payload)[3]
    assert len(out) == len(frames) == 3
    for j, px in enumerate(frames):
        row = out.iloc[j]
        assert (row.doc_id, row.frame_idx) == (7, j)
        assert row.frame_md5 == hashlib.md5(px).hexdigest()
