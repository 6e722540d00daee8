"""operators/jpeg.py decode pins: an INDEPENDENT baseline JPEG encoder
(forward DCT, quality-scaled Annex-K quant tables, two-pass canonical
Huffman, byte stuffing, restart markers, 4:2:0 subsampling) lives in
this test; the decoder must reconstruct its output within analytic
error bounds — exactly for flat blocks (bound derived from the quant
step, independent of the decoder's code), tightly for smooth
gradients, across gray/4:4:4/4:2:0, restart intervals, and multi-MCU
dimensions that exercise edge padding."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesyslog_spark.operators.jpeg import ZIGZAG, decode_jpeg

QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32


def _scaled(base: list[int], quality: int) -> list[int]:
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (b * s + 50) // 100)) for b in base]


_FDCT_C = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _fdct_quant(block: list[int], q_nat: list[int]) -> list[int]:
    """Forward DCT (natural-order output) quantized, returned in
    ZIGZAG scan order (what the entropy coder consumes)."""
    C = _FDCT_C
    g = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for v in range(8):
            g[y][v] = sum((block[y * 8 + x] - 128) * C[v][x] for x in range(8))
    nat = [0] * 64
    for u in range(8):
        for v in range(8):
            f = sum(g[y][v] * C[u][y] for y in range(8)) / 4.0
            qi = q_nat[u * 8 + v]
            nat[u * 8 + v] = int(round(f / qi))
    return [nat[ZIGZAG[k]] for k in range(64)]


def _category(v: int) -> int:
    return abs(v).bit_length()


class _SymbolRun:
    """Collects per-block (symbol, extra-bit) streams per table class,
    then emits canonical fixed-length Huffman tables and the bitstream."""

    def __init__(self):
        self.blocks: list[tuple[int, list[tuple[str, int, int, int]]]] = []
        self.symbols: dict[tuple[int, str], set[int]] = {}

    def add_block(self, table_id: int, zz: list[int], pred: int) -> int:
        ops: list[tuple[str, int, int, int]] = []
        diff = zz[0] - pred
        t = _category(diff)
        ops.append(("dc", t, diff, t))
        self.symbols.setdefault((table_id, "dc"), set()).add(t)
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, 64):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ops.append(("ac", 0xF0, 0, 0))
                self.symbols.setdefault((table_id, "ac"), set()).add(0xF0)
                run -= 16
            s = _category(v)
            sym = (run << 4) | s
            ops.append(("ac", sym, v, s))
            self.symbols.setdefault((table_id, "ac"), set()).add(sym)
            run = 0
        if last_nz < 63:
            ops.append(("ac", 0x00, 0, 0))
            self.symbols.setdefault((table_id, "ac"), set()).add(0x00)
        self.blocks.append((table_id, ops))
        return zz[0]

    def build_tables(self):
        """Fixed-length canonical tables: all symbols at one length L
        with 2^L > count (so the all-ones code is never assigned)."""
        tables = {}
        for key, syms in self.symbols.items():
            vals = sorted(syms)
            L = max(2, (len(vals)).bit_length())
            if (1 << L) <= len(vals):
                L += 1
            bits = [0] * 16
            bits[L - 1] = len(vals)
            codes = {v: (L, i) for i, v in enumerate(vals)}
            tables[key] = (bits, vals, codes)
        return tables


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)  # pad with 1s


def encode_jpeg(pixels: bytes, w: int, h: int, channels: int,
                quality: int = 90, subsample: bool = False,
                restart: int = 0) -> bytes:
    qly = _scaled(QT_LUMA, quality)
    qlc = _scaled(QT_CHROMA, quality)
    if channels == 1:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "td": 0, "ta": 0}]
    else:
        cs = 2 if subsample else 1
        comps = [
            {"id": 1, "h": cs, "v": cs, "tq": 0, "td": 0, "ta": 0},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "td": 1, "ta": 1},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "td": 1, "ta": 1},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # build component sample planes (YCbCr int, edge-replicated)
    def sample(plane, pw, ph, x, y):
        return plane[min(y, ph - 1) * pw + min(x, pw - 1)]

    if channels == 1:
        planes = [(bytes(pixels), w, h)]
    else:
        ybuf = bytearray(w * h)
        cbb = bytearray(w * h)
        crb = bytearray(w * h)
        for p in range(w * h):
            r, g, b = pixels[3 * p], pixels[3 * p + 1], pixels[3 * p + 2]
            yy = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
            cb = 128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16)
            cr = 128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16)
            ybuf[p] = min(255, max(0, yy))
            cbb[p] = min(255, max(0, cb))
            crb[p] = min(255, max(0, cr))
        if subsample:
            cw, chh = (w + 1) // 2, (h + 1) // 2
            def shrink(src):
                out = bytearray(cw * chh)
                for yy2 in range(chh):
                    for xx in range(cw):
                        acc = cnt = 0
                        for dy in range(2):
                            for dx in range(2):
                                sx, sy = 2 * xx + dx, 2 * yy2 + dy
                                if sx < w and sy < h:
                                    acc += src[sy * w + sx]
                                    cnt += 1
                        out[yy2 * cw + xx] = acc // cnt
                return bytes(out)
            planes = [(bytes(ybuf), w, h), (shrink(cbb), cw, chh),
                      (shrink(crb), cw, chh)]
        else:
            planes = [(bytes(ybuf), w, h), (bytes(cbb), w, h),
                      (bytes(crb), w, h)]

    run = _SymbolRun()
    q_nat = {0: qly, 1: qlc}
    pred = [0] * len(comps)
    mcu_seq = []  # block order with component table ids
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and (my * mcux + mx) and (my * mcux + mx) % restart == 0:
                pred = [0] * len(comps)
                mcu_seq.append(("RST",))
            for ci, c in enumerate(comps):
                plane, pw, ph = planes[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = [
                            sample(plane, pw, ph,
                                   (mx * c["h"] + bx) * 8 + xx,
                                   (my * c["v"] + by) * 8 + yy)
                            for yy in range(8) for xx in range(8)
                        ]
                        zz = _fdct_quant(block, q_nat[c["tq"]])
                        pred[ci] = run.add_block(c["tq"], zz, pred[ci])
                        mcu_seq.append(("B",))
    tables = run.build_tables()

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    for tid, q in q_nat.items():
        if channels == 1 and tid == 1:
            continue
        seg(0xDB, bytes([tid]) + bytes(q[ZIGZAG[k]] for k in range(64)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    seg(0xC0, sof)
    for (tid, cls), (bits, vals, _codes) in sorted(tables.items()):
        seg(0xC4, bytes([(0 if cls == "dc" else 0x10) | tid])
            + bytes(bits) + bytes(vals))
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], (c["td"] << 4) | c["ta"]])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    rst_n = 0
    bi = 0
    for entry in mcu_seq:
        if entry[0] == "RST":
            bw.flush()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + (rst_n % 8)]))
            rst_n += 1
            continue
        tid, ops = run.blocks[bi]
        bi += 1
        for kind, sym, v, nbits in ops:
            L, code = tables[(tid, kind)][2][sym]
            bw.put(code, L)
            if nbits:
                enc = v if v > 0 else v + (1 << nbits) - 1
                bw.put(enc, nbits)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _maxdiff(a: bytes, b: bytes) -> int:
    return max(abs(x - y) for x, y in zip(a, b))


def test_flat_gray_analytic_bound():
    """Flat block: reconstruction = round(8*(V-128)/q00)*q00/8 + 128,
    computable WITHOUT the decoder — the decoded plane must equal the
    analytic value exactly, for several V and qualities."""
    for quality in (50, 90, 100):
        q00 = _scaled(QT_LUMA, quality)[0]
        for v in (0, 77, 128, 200, 255):
            payload = encode_jpeg(bytes([v] * 64), 8, 8, 1, quality)
            w, h, ch, px = decode_jpeg(payload)
            assert (w, h, ch) == (8, 8, 1)
            coef = round(8 * (v - 128) / q00) * q00
            expect = max(0, min(255, int(math.floor(coef * 0.125 + 0.5)) + 128))
            assert set(px) == {expect}, (quality, v, set(px), expect)


def test_gradient_gray_roundtrip_bound():
    w, h = 24, 16
    gray = bytes(
        min(255, 40 + 5 * x + 6 * y) for y in range(h) for x in range(w)
    )
    payload = encode_jpeg(gray, w, h, 1, quality=95)
    dw, dh, ch, px = decode_jpeg(payload)
    assert (dw, dh, ch) == (w, h, 1)
    assert _maxdiff(px, gray) <= 6


def test_color_444_and_420_roundtrip():
    w, h = 16, 16
    rgb = bytes(
        c
        for y in range(h) for x in range(w)
        for c in (100 + 3 * x, 80 + 4 * y, 120)
    )
    for sub in (False, True):
        payload = encode_jpeg(rgb, w, h, 3, quality=95, subsample=sub)
        dw, dh, ch, px = decode_jpeg(payload)
        assert (dw, dh, ch) == (w, h, 3)
        bound = 14 if sub else 8  # replication upsampling is lossier
        assert _maxdiff(px, rgb) <= bound, (sub, _maxdiff(px, rgb))


def test_restart_intervals():
    w, h = 32, 8  # 4 MCUs, restart after every MCU
    gray = bytes((x * 7 + y * 11) % 200 + 20 for y in range(h) for x in range(w))
    payload = encode_jpeg(gray, w, h, 1, quality=95, restart=1)
    assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
    dw, dh, ch, px = decode_jpeg(payload)
    assert (dw, dh, ch) == (w, h, 1)
    assert _maxdiff(px, gray) <= 8


def test_non_multiple_of_8_dims():
    w, h = 13, 11
    gray = bytes(30 + 9 * (x % 5) + 7 * (y % 3) for y in range(h) for x in range(w))
    payload = encode_jpeg(gray, w, h, 1, quality=95)
    dw, dh, ch, px = decode_jpeg(payload)
    assert (dw, dh) == (w, h) and len(px) == w * h
    assert _maxdiff(px, gray) <= 10


def test_unsupported_raise():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not jpeg")
    # arithmetic coding SOF9 stays behind the named seam
    arith = (b"\xff\xd8\xff\xc9" + struct.pack(">H", 11)
             + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(NotImplementedError):
        decode_jpeg(arith + b"\xff\xd9")
    # progressive SOF2 with no scan at all is malformed, not unsupported
    prog = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError):
        decode_jpeg(prog + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no frame/scan


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(8, 24), h=st.integers(8, 24),
    quality=st.sampled_from([85, 95, 100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_smooth_random_gray_bound(w, h, quality, seed):
    import random

    rnd = random.Random(seed)
    a, b, c = rnd.randint(0, 4), rnd.randint(0, 4), rnd.randint(30, 180)
    gray = bytes(
        min(255, c + a * x + b * y) for y in range(h) for x in range(w)
    )
    payload = encode_jpeg(gray, w, h, 1, quality=quality)
    dw, dh, ch, px = decode_jpeg(payload)
    assert (dw, dh, ch) == (w, h, 1)
    assert _maxdiff(px, gray) <= 8


def test_resize_batches_jpeg_real_pixels():
    """The q61 operator's JPEG branch digests REAL decoded pixels."""
    import hashlib

    import pandas as pd

    from kinesyslog_spark.operators.jpeg import decode_jpeg as dj
    from kinesyslog_spark.operators.multimodal import resize_batches
    from kinesyslog_spark.operators.png import box_downscale, to_gray

    w, h = 96, 72
    gray = bytes(min(255, 30 + x + y) for y in range(h) for x in range(w))
    payload = encode_jpeg(gray, w, h, 1, quality=95)
    [out] = list(resize_batches(iter([
        pd.DataFrame({"doc_id": [1], "payload": [payload]})
    ])))
    row = out.iloc[0]
    assert (row.out_w, row.out_h) == (64, 48)
    _, _, ch, px = dj(payload)
    expect = hashlib.md5(
        box_downscale(to_gray(px, ch), w, h, 64, 48)
    ).hexdigest()
    assert row.thumb_md5 == expect
