"""BMP codec (operators/bmp.py): roundtrip against the encoder,
hand-built palette/top-down forms, header parse, malformed rejection,
and the resize-path wiring."""

from __future__ import annotations

import struct

import pytest

from kinesyslog_spark.operators.bmp import decode_bmp, encode_bmp, parse_bmp_header


def _gradient(w, h):
    return bytes(
        c
        for y in range(h)
        for x in range(w)
        for c in ((x * 37) % 256, (y * 91) % 256, (x + y) % 256)
    )


def test_roundtrip_24bit():
    for w, h in ((1, 1), (3, 2), (5, 7), (8, 8)):
        rgb = _gradient(w, h)
        ww, hh, ch, px = decode_bmp(encode_bmp(w, h, rgb))
        assert (ww, hh, ch) == (w, h, 3)
        assert px == rgb


def test_row_padding_respected():
    # width 3 -> 9-byte rows padded to 12; a decoder ignoring stride
    # shears the image.
    rgb = _gradient(3, 4)
    _, _, _, px = decode_bmp(encode_bmp(3, 4, rgb))
    assert px == rgb


def _palette_bmp(w, h, indices, palette, top_down=False):
    off = 14 + 40 + 4 * len(palette)
    stride = (w + 3) & ~3
    body = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for y in rows:
        row = bytes(indices[y * w: (y + 1) * w]) + b"\x00" * (stride - w)
        body += row
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 8, 0, len(body),
        0, 0, len(palette), 0,
    )
    pal = b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
    return hdr + info + pal + bytes(body)


def test_palette_decode_and_topdown():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0]  # 4x2
    want = bytes(c for i in idx for c in pal[i])
    for td in (False, True):
        w_, h_, ch, px = decode_bmp(_palette_bmp(4, 2, idx, pal, top_down=td))
        assert (w_, h_, ch) == (4, 2, 3)
        assert px == want


def test_header_parse_and_dispatch():
    payload = encode_bmp(6, 4, _gradient(6, 4))
    assert parse_bmp_header(payload) == {"codec": "bmp", "width": 6, "height": 4}
    from kinesyslog_spark.operators.multimodal import parse_image_header

    assert parse_image_header(payload) == {"codec": "bmp", "width": 6, "height": 4}


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_bmp(b"BMxx")
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(3, 3, _gradient(3, 3))[:30])  # truncated
    rle = bytearray(encode_bmp(2, 2, _gradient(2, 2)))
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8 on 24-bit: illegal
    with pytest.raises(ValueError):
        decode_bmp(bytes(rle))
    bf = bytearray(encode_bmp(2, 2, _gradient(2, 2)))
    struct.pack_into("<I", bf, 30, 3)  # BI_BITFIELDS on 24-bit: illegal
    with pytest.raises(ValueError):
        decode_bmp(bytes(bf))


def test_resize_path_uses_real_pixels():
    import hashlib

    import pandas as pd

    from kinesyslog_spark.operators.multimodal import resize_batches
    from kinesyslog_spark.operators.png import (
        box_downscale, thumbnail_dims, to_gray,
    )

    w, h = 100, 40
    rgb = _gradient(w, h)
    payload = encode_bmp(w, h, rgb)
    pdf = pd.DataFrame({"doc_id": [7], "payload": [payload]})
    out = pd.concat(list(resize_batches(iter([pdf]))))
    row = out.iloc[0]
    ow, oh = thumbnail_dims(w, h, 64)
    assert (row["out_w"], row["out_h"]) == (ow, oh)
    want = hashlib.md5(
        bytes(box_downscale(to_gray(rgb, 3), w, h, ow, oh))
    ).hexdigest()
    assert row["thumb_md5"] == want


def test_hypothesis_roundtrip_random_images():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        data=st.data(),
    )
    def run(w, h, data):
        rgb = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
                )
            )
        )
        ww, hh, ch, px = decode_bmp(encode_bmp(w, h, rgb))
        assert (ww, hh, ch, px) == (w, h, 3, rgb)

    run()


# ---------------------------------------------------------------------------
# Round-5 continuation: 1/4/16/32-bit + RLE8/RLE4
# ---------------------------------------------------------------------------


def _bmp(w, h, bits, comp, body, palette=()):
    off = 14 + 40 + 4 * len(palette)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bits, comp, len(body),
        0, 0, len(palette), 0,
    )
    pal = b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
    return hdr + info + pal + bytes(body)


PAL4C = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]


def test_decode_32bit_drops_filler():
    w, h = 3, 2
    # stored bottom-up BGRX
    body = bytearray()
    for y in (1, 0):
        for x in range(w):
            body += bytes((10 + x, 20 + y, 30, 0xEE))  # B, G, R, X
    ww, hh, ch, px = decode_bmp(_bmp(w, h, 32, 0, body))
    assert (ww, hh, ch) == (w, h, 3)
    # top row of output is stored LAST (y=0)
    assert px[:3] == bytes((30, 20, 10))
    assert px[3:6] == bytes((30, 20, 11))


def test_decode_16bit_rgb555():
    w, h = 2, 1
    v1 = (31 << 10) | (0 << 5) | 15   # r=31, g=0, b=15
    v2 = (1 << 10) | (16 << 5) | 31
    body = struct.pack("<HH", v1, v2)  # stride 4, already aligned
    _, _, _, px = decode_bmp(_bmp(w, h, 16, 0, body))
    assert px[:3] == bytes((255, 0, 15 * 255 // 31))
    assert px[3:6] == bytes((1 * 255 // 31, 16 * 255 // 31, 255))


def test_decode_1bit_and_4bit_packed():
    # 1-bit: 9 pixels per row -> 2 bytes data + pad to 4
    w, h = 9, 2
    row0 = bytes((0b10110001, 0b10000000)) + b"\x00\x00"
    row1 = bytes((0b01001110, 0b00000000)) + b"\x00\x00"
    body = row1 + row0  # bottom-up
    _, _, _, px = decode_bmp(
        _bmp(w, h, 1, 0, body, palette=PAL4C[:2])
    )
    bits0 = [1, 0, 1, 1, 0, 0, 0, 1, 1]
    assert px[:27] == b"".join(bytes(PAL4C[b]) for b in bits0)
    # 4-bit: 3 pixels -> 2 bytes (nibbles MSB-first) + pad
    w2 = 3
    body4 = bytes((0x01, 0x20)) + b"\x00\x00"
    _, _, _, px4 = decode_bmp(_bmp(w2, 1, 4, 0, body4, palette=PAL4C))
    assert px4 == bytes(PAL4C[0]) + bytes(PAL4C[1]) + bytes(PAL4C[2])


def test_decode_rle8():
    w, h = 6, 2
    # bottom row: 3x idx1 then absolute literals (2,3,2); top: 6x idx2
    stream = bytes((
        3, 1,              # run of 3 idx1
        0, 3, 2, 3, 2, 0,  # absolute mode: 3 literals + 1 pad byte
        0, 0,              # EOL
        6, 2,              # top row run
        0, 1,              # EOB
    ))
    _, _, _, px = decode_bmp(_bmp(w, h, 8, 1, stream, palette=PAL4C))
    top = px[:w * 3]
    bot = px[w * 3:]
    assert top == bytes(PAL4C[2]) * 6
    assert bot == b"".join(bytes(PAL4C[i]) for i in (1, 1, 1, 2, 3, 2))


def test_decode_rle4_and_delta_skip():
    w, h = 6, 2
    stream = bytes((
        4, 0x12,        # run of 4 alternating 1,2,1,2
        0, 2, 2, 1,     # delta: skip 2 right, 1 up
        3, 0x33,        # on top row at x=... 4+2=6?? -> new row x=6 invalid
    ))
    # the delta lands x=6 == width -> next run overflows -> ValueError
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_bmp(_bmp(w, h, 4, 2, stream, palette=PAL4C))
    ok = bytes((
        4, 0x12,
        0, 0,           # EOL
        2, 0x30,        # top row: 3,0
        0, 1,           # EOB
    ))
    _, _, _, px = decode_bmp(_bmp(w, h, 4, 2, ok, palette=PAL4C))
    top = px[:w * 3]
    bot = px[w * 3:]
    assert bot[:12] == b"".join(bytes(PAL4C[i]) for i in (1, 2, 1, 2))
    assert bot[12:] == bytes(PAL4C[0]) * 2  # undefined cells -> entry 0
    assert top[:6] == bytes(PAL4C[3]) + bytes(PAL4C[0])


def test_rle_with_topdown_rejected():
    body = bytes((1, 0, 0, 1))
    buf = bytearray(_bmp(2, 2, 8, 1, body, palette=PAL4C))
    struct.pack_into("<i", buf, 22, -2)  # height = -2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_bmp(bytes(buf))


def _bmp_bitfields(w, h, bits, body, rm, gm, bm, v2_header=False):
    """BI_BITFIELDS container: masks as 3 DWORDs after a 40-byte
    BITMAPINFOHEADER, or as header FIELDS of a 52-byte V2 header."""
    hdr_size = 52 if v2_header else 40
    off = 14 + hdr_size + (0 if v2_header else 12)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", hdr_size, w, h, 1, bits, 3, len(body), 0, 0, 0, 0,
    ) + struct.pack("<III", rm, gm, bm)
    return hdr + info + bytes(body)


def test_bitfields_rgb565():
    w, h = 2, 1
    v1 = (31 << 11) | (0 << 5) | 15        # r=31/31, g=0, b=15/31
    v2 = (1 << 11) | (63 << 5) | 31
    body = struct.pack("<HH", v1, v2)
    for v2h in (False, True):
        _, _, _, px = decode_bmp(
            _bmp_bitfields(w, h, 16, body, 0xF800, 0x07E0, 0x001F,
                           v2_header=v2h)
        )
        assert px[:3] == bytes((255, 0, 15 * 255 // 31))
        assert px[3:6] == bytes((1 * 255 // 31, 255, 255))


def test_bitfields_argb1555_and_32bit():
    # 16-bit 1555: alpha bit ignored, channels 5/5/5
    v = (1 << 15) | (31 << 10) | (7 << 5) | 0
    _, _, _, px = decode_bmp(
        _bmp_bitfields(1, 1, 16, struct.pack("<HH", v, 0)[:4],
                       0x7C00, 0x03E0, 0x001F)
    )
    assert px[:3] == bytes((255, 7 * 255 // 31, 0))
    # 32-bit RGBA8888-style masks (non-BGRX layout a BI_RGB decode
    # would misread): R in the LOW byte
    v32 = (10) | (200 << 8) | (255 << 16)
    _, _, _, px = decode_bmp(
        _bmp_bitfields(1, 1, 32, struct.pack("<I", v32),
                       0x000000FF, 0x0000FF00, 0x00FF0000)
    )
    assert px[:3] == bytes((10, 200, 255))
    # 32-bit 10-10-10: channel wider than 8 bits scales DOWN
    v10 = (1023 << 20) | (512 << 10) | 0
    _, _, _, px = decode_bmp(
        _bmp_bitfields(1, 1, 32, struct.pack("<I", v10),
                       0x3FF << 20, 0x3FF << 10, 0x3FF)
    )
    assert px[:3] == bytes((255, 512 * 255 // 1023, 0))


def test_bitfields_bottom_up_and_stride():
    # 3px-wide 16-bit rows: 6 bytes padded to 8; two rows bottom-up
    w, h = 3, 2
    def row(vals):
        return struct.pack("<HHH", *vals) + b"\x00\x00"
    top = [(31 << 11), (63 << 5), 31]        # red, green, blue
    bot = [0, (31 << 11), (31 << 11) | 31]
    body = row(bot) + row(top)
    _, _, _, px = decode_bmp(
        _bmp_bitfields(w, h, 16, body, 0xF800, 0x07E0, 0x001F)
    )
    assert px[0:9] == bytes((255, 0, 0, 0, 255, 0, 0, 0, 255))
    assert px[9:12] == bytes((0, 0, 0))


def test_bitfields_malformed_rejected():
    body = struct.pack("<I", 0)
    # non-contiguous mask
    with pytest.raises(ValueError, match="non-contiguous"):
        decode_bmp(_bmp_bitfields(1, 1, 32, body, 0b101, 0b010, 0x3F000))
    # overlapping masks
    with pytest.raises(ValueError, match="overlapping"):
        decode_bmp(_bmp_bitfields(1, 1, 32, body, 0xFF, 0xFF, 0xFF00))
    # zero mask
    with pytest.raises(ValueError, match="bad bitfield mask"):
        decode_bmp(_bmp_bitfields(1, 1, 32, body, 0, 0xFF, 0xFF00))
    # mask wider than a 16-bit pixel
    with pytest.raises(ValueError, match="wider"):
        decode_bmp(_bmp_bitfields(1, 1, 16, body, 0xF8000, 0x7E0, 0x1F))
    # BI_BITFIELDS only legal at 16/32 bpp
    with pytest.raises(ValueError, match="illegal"):
        decode_bmp(_bmp_bitfields(1, 1, 24, body, 0xF800, 0x7E0, 0x1F))
    # truncated mask block
    raw = _bmp_bitfields(1, 1, 32, body, 0xFF, 0xFF00, 0xFF0000)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(raw[:14 + 40 + 8])
