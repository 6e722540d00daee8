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
    struct.pack_into("<I", rle, 30, 1)  # compression = BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(rle))


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
