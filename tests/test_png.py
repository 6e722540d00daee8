"""operators/png.py codec pins: decode is exercised against an
INDEPENDENT forward-filter encoder written here (all five PNG filter
types, all supported color types), round-trip properties run under
hypothesis, and the pHash layer is checked for its structural
guarantees (bit layout, DC exclusion, locality)."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesyslog_spark.operators.png import (
    box_downscale,
    decode_png,
    encode_png,
    phash_blocks,
    thumbnail_dims,
    to_gray,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def reference_encode(pixels: bytes, w: int, h: int, colortype: int,
                     filter_type: int, plte: bytes = b"") -> bytes:
    """Independent encoder: forward-applies the given filter to every
    scanline (the inverse of what decode_png must undo)."""
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = pixels[y * stride:(y + 1) * stride]
        raw.append(filter_type)
        for x in range(stride):
            left = line[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if filter_type == 0:
                f = line[x]
            elif filter_type == 1:
                f = (line[x] - left) & 0xFF
            elif filter_type == 2:
                f = (line[x] - up) & 0xFF
            elif filter_type == 3:
                f = (line[x] - ((left + up) >> 1)) & 0xFF
            else:
                f = (line[x] - _paeth_ref(left, up, ul)) & 0xFF
            raw.append(f)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if colortype == 3:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def _pat(n: int) -> bytes:
    return bytes((i * 37 + (i * i) % 251) % 256 for i in range(n))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("colortype,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_decode_all_filters_and_colortypes(ftype, colortype, ch):
    w, h = 7, 5
    pixels = _pat(w * h * ch)
    payload = reference_encode(pixels, w, h, colortype, ftype)
    dw, dh, dch, px = decode_png(payload)
    assert (dw, dh, dch) == (w, h, ch)
    assert px == pixels


def test_decode_palette_expands_to_rgb():
    w, h = 4, 3
    idx = bytes([0, 1, 2, 3] * 3)
    plte = bytes(range(12))  # 4 RGB entries
    payload = reference_encode(idx, w, h, 3, 1, plte=plte)
    dw, dh, dch, px = decode_png(payload)
    assert (dw, dh, dch) == (w, h, 3)
    assert px == b"".join(plte[i * 3:i * 3 + 3] for i in idx)


def test_decode_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # truncated streams (no IDAT payload) -> ValueError, any depth
    for depth, interlace in ((16, 0), (8, 1)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, 0, 0, 0, interlace)
        buf = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        with pytest.raises(ValueError):
            decode_png(buf + _chunk(b"IEND", b""))
    # illegal depth/type combination (16-bit palette)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    with pytest.raises(ValueError):
        decode_png(
            b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IEND", b"")
        )


# ---------------------------------------------------------------------------
# Adam7 interlace + non-8 bit depths (round-5 seam closures)
# ---------------------------------------------------------------------------

_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _filter_rows(rows: list[bytes], stride: int, bpp: int,
                 filter_type: int) -> bytearray:
    raw = bytearray()
    prev = bytes(stride)
    for line in rows:
        raw.append(filter_type)
        for x in range(stride):
            left = line[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if filter_type == 0:
                f = line[x]
            elif filter_type == 1:
                f = (line[x] - left) & 0xFF
            elif filter_type == 2:
                f = (line[x] - up) & 0xFF
            elif filter_type == 3:
                f = (line[x] - ((left + up) >> 1)) & 0xFF
            else:
                f = (line[x] - _paeth_ref(left, up, ul)) & 0xFF
            raw.append(f)
        prev = line
    return raw


def adam7_encode(pixels: bytes, w: int, h: int, colortype: int,
                 filter_type: int = 4) -> bytes:
    """Independent Adam7 encoder (depth 8): split into the seven
    passes, filter each pass independently, concat."""
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        rows = []
        for r in range(ph):
            y = y0 + r * dy
            line = bytearray()
            for c in range(pw):
                x = x0 + c * dx
                o = (y * w + x) * ch
                line += pixels[o:o + ch]
            rows.append(bytes(line))
        raw += _filter_rows(rows, pw * ch, ch, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("w,h", [(1, 1), (3, 3), (8, 8), (9, 5), (17, 11)])
@pytest.mark.parametrize("colortype,ch", [(0, 1), (6, 4)])
def test_decode_adam7(w, h, colortype, ch):
    pixels = _pat(w * h * ch)
    got = decode_png(adam7_encode(pixels, w, h, colortype))
    assert got == (w, h, ch, pixels)


def _pack_bits(vals: list[int], depth: int) -> bytes:
    out = bytearray()
    acc = nbits = 0
    for v in vals:
        acc = (acc << depth) | v
        nbits += depth
        if nbits == 8:
            out.append(acc)
            acc = nbits = 0
    if nbits:
        out.append(acc << (8 - nbits))
    return bytes(out)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_decode_low_bitdepth_gray(depth):
    w, h = 9, 3  # non-byte-aligned rows
    maxv = (1 << depth) - 1
    vals = [(x * 7 + y) % (maxv + 1) for y in range(h) for x in range(w)]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += _pack_bits(vals[y * w:(y + 1) * w], depth)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    dw, dh, dch, px = decode_png(payload)
    assert (dw, dh, dch) == (w, h, 1)
    assert list(px) == [v * 255 // maxv for v in vals]


def test_decode_low_bitdepth_palette_unscaled():
    w, h, depth = 5, 2, 2
    idx = [0, 1, 2, 3, 0, 3, 2, 1, 0, 1]
    plte = bytes(range(12))
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += _pack_bits(idx[y * w:(y + 1) * w], depth)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    dw, dh, dch, px = decode_png(payload)
    assert (dw, dh, dch) == (w, h, 3)
    assert px == b"".join(plte[i * 3:i * 3 + 3] for i in idx)


@pytest.mark.parametrize("colortype,ch", [(0, 1), (2, 3)])
def test_decode_16bit_keeps_high_byte(colortype, ch):
    w, h = 4, 3
    his = _pat(w * h * ch)
    samples = bytearray()
    for k, hi in enumerate(his):
        samples += bytes((hi, (k * 37) & 0xFF))  # low byte is noise
    stride = w * ch * 2
    rows = [bytes(samples[y * stride:(y + 1) * stride]) for y in range(h)]
    raw = _filter_rows(rows, stride, ch * 2, 2)  # Up filter, 16-bit bpp
    ihdr = struct.pack(">IIBBBBB", w, h, 16, colortype, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    dw, dh, dch, px = decode_png(payload)
    assert (dw, dh, dch) == (w, h, ch)
    assert px == his


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24), h=st.integers(1, 24),
    ftype=st.integers(0, 4), seed=st.integers(0, 2**31 - 1),
)
def test_adam7_roundtrip_random(w, h, ftype, seed):
    import random

    rnd = random.Random(seed)
    pixels = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    got = decode_png(adam7_encode(pixels, w, h, 2, filter_type=ftype))
    assert got == (w, h, 3, pixels)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40), h=st.integers(1, 40),
    seed=st.integers(0, 2**32 - 1),
)
def test_roundtrip_random_gray(w, h, seed):
    import random

    rnd = random.Random(seed)
    gray = bytes(rnd.randrange(256) for _ in range(w * h))
    dw, dh, ch, px = decode_png(encode_png(gray, w, h))
    assert (dw, dh, ch) == (w, h, 1)
    assert px == gray


def test_to_gray_luma():
    # (77*R + 150*G + 29*B) >> 8
    assert to_gray(bytes([255, 0, 0]), 3) == bytes([(77 * 255) >> 8])
    assert to_gray(bytes([0, 255, 0, 7]), 4) == bytes([(150 * 255) >> 8])
    assert to_gray(bytes([10, 20]), 2) == bytes([10])  # gray+alpha
    assert to_gray(b"\x42", 1) == b"\x42"


def test_box_downscale_exact():
    # 4x2 -> 2x1: each cell is the floor-mean of a 2x2 block
    g = bytes([10, 20, 30, 40,
               50, 60, 70, 80])
    assert box_downscale(g, 4, 2, 2, 1) == bytes([35, 55])
    # identity
    assert box_downscale(g, 4, 2, 4, 2) == g
    # upscale-ish (degenerate blocks clamp to >=1 pixel)
    assert len(box_downscale(g, 4, 2, 8, 4)) == 32


def test_thumbnail_dims():
    assert thumbnail_dims(32, 32) == (32, 32)       # never upscales
    assert thumbnail_dims(128, 64) == (64, 32)
    assert thumbnail_dims(64, 128) == (32, 64)
    assert thumbnail_dims(1000, 10) == (64, 1)  # extreme aspect clamps to 1


def test_phash_structure():
    flat = bytes(1024)
    b0 = phash_blocks(flat)
    assert len(b0) == 8 and all(0 <= b <= 255 for b in b0)
    # flat raster: all non-DC coeffs are 0 == median -> every bit 0
    assert b0 == [0] * 8
    with pytest.raises(ValueError):
        phash_blocks(bytes(100))


def test_phash_locality():
    """Small pixel edits move the hash a little; unrelated rasters are
    far — the property the near-dup join rides on."""
    import random

    rnd = random.Random(7)
    base = bytes(rnd.randrange(256) for _ in range(1024))
    near = bytearray(base)
    for _ in range(5):  # perturb 5 of 1024 cells
        near[rnd.randrange(1024)] = rnd.randrange(256)
    far = bytes(rnd.randrange(256) for _ in range(1024))

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    hb, hn, hf = phash_blocks(base), phash_blocks(bytes(near)), phash_blocks(far)
    assert ham(hb, hn) <= 8
    assert ham(hb, hf) > 8


def test_resize_batches_png_real_pixels():
    """The q61 operator's PNG branch digests REAL downscaled pixels."""
    import hashlib

    import pandas as pd

    from kinesyslog_spark.operators.multimodal import resize_batches

    gray = _pat(128 * 96)
    payload = encode_png(gray, 128, 96)
    [out] = list(resize_batches(iter([
        pd.DataFrame({"doc_id": [1], "payload": [payload]})
    ])))
    row = out.iloc[0]
    assert (row.out_w, row.out_h) == (64, 48)
    expect = hashlib.md5(box_downscale(gray, 128, 96, 64, 48)).hexdigest()
    assert row.thumb_md5 == expect


def test_q124_registry(spark, sf_dir):
    from kinesyslog_spark.queries import QUERIES

    rows = QUERIES["q124_image_phash_neardup"](spark, sf_dir).collect()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 7


def test_phash256_dct_table_matches_independent_recompute():
    """PHASH_DCT_T16 rows re-derived with a 50-digit Decimal Taylor
    cosine (no libm) must reproduce every hardcoded value — and its
    first 8 rows must BE the original PHASH_DCT_T (the 64-bit hash's
    table is a strict prefix of the 256-bit one)."""
    from decimal import ROUND_HALF_UP, Decimal, getcontext

    from kinesyslog_spark.operators.png import PHASH_DCT_T, PHASH_DCT_T16

    getcontext().prec = 50
    pi = Decimal("3.14159265358979323846264338327950288419716939937510")

    def dcos(x):
        x = x % (2 * pi)
        s, term, n = Decimal(1), Decimal(1), 0
        while True:
            n += 2
            term *= -x * x / (n * (n - 1))
            s += term
            if abs(term) < Decimal("1e-40"):
                return s

    for u in range(16):
        for x in range(32):
            val = Decimal(1024) * dcos(pi * Decimal(2 * x + 1) * u / Decimal(64))
            want = int(val.quantize(Decimal("1"), rounding=ROUND_HALF_UP))
            assert PHASH_DCT_T16[u][x] == want, (u, x)
    assert PHASH_DCT_T16[:8] == PHASH_DCT_T


def test_phash256_structure_and_locality():
    import random

    from kinesyslog_spark.operators.png import phash256_blocks

    assert phash256_blocks(bytes(1024)) == [0] * 16
    with pytest.raises(ValueError):
        phash256_blocks(bytes(100))
    rnd = random.Random(7)
    base = bytes(rnd.randrange(256) for _ in range(1024))
    near = bytearray(base)
    for _ in range(5):
        near[rnd.randrange(1024)] = rnd.randrange(256)
    far = bytes(rnd.randrange(256) for _ in range(1024))

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    hb = phash256_blocks(base)
    assert all(0 <= b <= 0xFFFF for b in hb)
    assert ham(hb, phash256_blocks(bytes(near))) <= 32
    assert ham(hb, phash256_blocks(far)) > 32


def test_phash256_batch_stage_matches_pure_python():
    """The vectorized Arrow stage must be bit-identical to the
    pure-Python reference through the real PNG roundtrip."""
    import random

    import pandas as pd

    from kinesyslog_spark.operators.png import phash256_blocks
    from kinesyslog_spark.queries.imagehash import phash256_block_batches

    rnd = random.Random(11)
    rasters = [
        bytes(rnd.randrange(256) for _ in range(1024)) for _ in range(4)
    ]
    pdf = pd.DataFrame({
        "doc_id": list(range(4)),
        "payload": [encode_png(r, 32, 32) for r in rasters],
    })
    [out] = list(phash256_block_batches(iter([pdf])))
    got = {
        d: [int(r) for _, r in sub.sort_values("j")[["j", "bv"]].itertuples(index=False)]
        for d, sub in out.groupby("doc_id")
    }
    for i, raster in enumerate(rasters):
        assert got[i] == phash256_blocks(raster), i


def test_q174_registry(spark, sf_dir):
    from kinesyslog_spark.queries import QUERIES
    from kinesyslog_spark.queries.imagehash import HAM_T256

    rows = QUERIES["q174_image_phash256_neardup"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= HAM_T256
