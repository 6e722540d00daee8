"""Progressive-JPEG decode pins (operators/jpeg.py SOF2 path).

An INDEPENDENT progressive encoder lives in this test: it takes raw
quantized coefficient blocks and emits (a) a baseline SOF0 stream and
(b) a progressive SOF2 stream — spectral-selection bands, successive
approximation (DC arithmetic-shift bits, AC magnitude correction bits
emitted by mirroring T.81 G.1.2.3 symbol-by-symbol), EOB run
accumulation, and ZRL inside refinement scans. Both streams carry the
SAME coefficients, so the decoder must produce BIT-IDENTICAL pixels:
any defect in scan accumulation, EOBRUN, refinement bit order, or the
non-interleaved geometry breaks exact equality."""

from __future__ import annotations

import random
import struct

import pytest

from kinesyslog_spark.operators.jpeg import ZIGZAG, decode_jpeg
from kinesyslog_spark.operators.multimodal import DECODE_ERRORS

Q_FLAT = [16] * 64  # flat quant keeps the pin about entropy coding


class _W:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bit(self, b: int) -> None:
        self.acc = (self.acc << 1) | (b & 1)
        self.n += 1
        if self.n == 8:
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def flush(self) -> None:
        while self.n:
            self.bit(1)


def _cat(v: int) -> int:
    return abs(v).bit_length()


def _tables(symbols: set[int]):
    """Canonical fixed-length table: (bits16, vals, code_of)."""
    vals = sorted(symbols)
    L = max(2, len(vals).bit_length())
    if (1 << L) <= len(vals):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(vals)
    return bits, vals, {v: (L, i) for i, v in enumerate(vals)}


def _seg(out: bytearray, marker: int, payload: bytes) -> None:
    out.extend(bytes([0xFF, marker]))
    out.extend(struct.pack(">H", len(payload) + 2))
    out.extend(payload)


def _headers(w, h, comps, sof_marker, dc_syms, ac_syms):
    out = bytearray(b"\xff\xd8")
    _seg(out, 0xDB, bytes([0]) + bytes(Q_FLAT[ZIGZAG[k]] for k in range(64)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    _seg(out, sof_marker, sof)
    dct = _tables(dc_syms)
    act = _tables(ac_syms)
    _seg(out, 0xC4, bytes([0x00]) + bytes(dct[0]) + bytes(dct[1]))
    _seg(out, 0xC4, bytes([0x10]) + bytes(act[0]) + bytes(act[1]))
    return out, dct[2], act[2]


def _sos(out, comp_specs, ss, se, ah, al):
    p = bytes([len(comp_specs)])
    for cid in comp_specs:
        p += bytes([cid, 0x00])  # dc/ac table 0
    p += bytes([ss, se, (ah << 4) | al])
    _seg(out, 0xDA, p)


def _put_sym(w, code_of, sym):
    L, code = code_of[sym]
    w.bits(code, L)


def _put_signed(w, v, n):
    w.bits(v if v > 0 else v + (1 << n) - 1, n)


# ---------------------------------------------------------------------------
# baseline emitter (coefficients -> SOF0 single interleaved scan)
# ---------------------------------------------------------------------------

def _baseline_symbols(blocks_by_comp, comps):
    dc_syms, ac_syms = set(), set()
    for ci in range(len(comps)):
        pred = 0
        for zz in blocks_by_comp[ci]:
            dc_syms.add(_cat(zz[0] - pred))
            pred = zz[0]
            run = 0
            last = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.add(0xF0)
                    run -= 16
                ac_syms.add((run << 4) | _cat(zz[k]))
                run = 0
            if last < 63:
                ac_syms.add(0x00)
    return dc_syms, ac_syms


def _encode_baseline(w_px, h_px, comps, blocks_by_comp, mcu_order):
    dc_syms, ac_syms = _baseline_symbols(blocks_by_comp, comps)
    out, dc_of, ac_of = _headers(w_px, h_px, comps, 0xC0, dc_syms, ac_syms)
    _sos(out, [c["id"] for c in comps], 0, 63, 0, 0)
    wtr = _W()
    pred = [0] * len(comps)
    for ci, bi in mcu_order:
        zz = blocks_by_comp[ci][bi]
        d = zz[0] - pred[ci]
        pred[ci] = zz[0]
        t = _cat(d)
        _put_sym(wtr, dc_of, t)
        if t:
            _put_signed(wtr, d, t)
        run = 0
        last = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                _put_sym(wtr, ac_of, 0xF0)
                run -= 16
            s = _cat(zz[k])
            _put_sym(wtr, ac_of, (run << 4) | s)
            _put_signed(wtr, zz[k], s)
            run = 0
        if last < 63:
            _put_sym(wtr, ac_of, 0x00)
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive emitters
# ---------------------------------------------------------------------------

def _shift_ac(v: int, al: int) -> int:
    """AC point transform: divide with truncation toward zero."""
    return -((-v) >> al) if v < 0 else v >> al


def _dc_first_scan(wtr, dc_of, blocks_seq, al, pred):
    for ci, zz in blocks_seq:
        s = zz[0] >> al  # arithmetic shift (T.81 DC point transform)
        d = s - pred[ci]
        pred[ci] = s
        t = _cat(d)
        _put_sym(wtr, dc_of, t)
        if t:
            _put_signed(wtr, d, t)


def _dc_refine_scan(wtr, blocks_seq, al):
    for _ci, zz in blocks_seq:
        wtr.bit((zz[0] >> al) & 1)  # two's-complement bit


def _flush_eobrun(wtr, ac_of, state):
    n = state["eob"]
    if not n:
        return
    r = n.bit_length() - 1
    _put_sym(wtr, ac_of, r << 4)
    if r:
        wtr.bits(n - (1 << r), r)
    state["eob"] = 0


def _ac_first_scan(wtr, ac_of, blocks, ss, se, al):
    state = {"eob": 0}
    for zz in blocks:
        band = [(k, _shift_ac(zz[k], al)) for k in range(ss, se + 1)]
        if all(v == 0 for _, v in band):
            state["eob"] += 1
            if state["eob"] == 0x7FFF:
                _flush_eobrun(wtr, ac_of, state)
            continue
        _flush_eobrun(wtr, ac_of, state)
        run = 0
        last = max(i for i, (_, v) in enumerate(band) if v != 0)
        for i, (_k, v) in enumerate(band):
            if i > last:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                _put_sym(wtr, ac_of, 0xF0)
                run -= 16
            s = _cat(v)
            _put_sym(wtr, ac_of, (run << 4) | s)
            _put_signed(wtr, v, s)
            run = 0
        if last < len(band) - 1:
            state["eob"] += 1
            if state["eob"] == 0x7FFF:
                _flush_eobrun(wtr, ac_of, state)
    _flush_eobrun(wtr, ac_of, state)


def _ac_refine_scan(wtr, ac_of, blocks, ss, se, al):
    """Mirror of the decoder's G.1.2.3 walk, emitting instead of
    reading. t1 = value known before this scan (shifted left once more),
    target bit = bit `al` of |v|."""
    for zz in blocks:
        t1 = {k: _shift_ac(zz[k], al + 1) for k in range(ss, se + 1)}
        cur = {k: zz[k] for k in range(ss, se + 1)}
        k = ss

        def history(j):
            return t1[j] != 0

        newly = [j for j in range(ss, se + 1)
                 if not history(j) and _shift_ac(cur[j], al) != 0]
        for nxt in newly:
            # count zero-history zeros between k and nxt
            r = sum(
                1 for j in range(k, nxt)
                if not history(j) and _shift_ac(cur[j], al) == 0
            )
            while r > 15:
                _put_sym(wtr, ac_of, 0xF0)
                c = 16
                while k <= se:
                    if history(k):
                        wtr.bit((abs(cur[k]) >> al) & 1)
                        k += 1
                        continue
                    k += 1
                    c -= 1
                    if c == 0:
                        break
                r -= 16
            v = _shift_ac(cur[nxt], al)
            assert abs(v) == 1, "newly-nonzero must be +-1 in refinement"
            _put_sym(wtr, ac_of, (r << 4) | 1)
            wtr.bit(1 if v > 0 else 0)
            while k <= se:
                if history(k):
                    wtr.bit((abs(cur[k]) >> al) & 1)
                    k += 1
                    continue
                stop = k == nxt
                k += 1
                if stop:
                    break
        if k <= se:
            _put_sym(wtr, ac_of, 0x00)  # EOB (run length 1)
            for j in range(k, se + 1):
                if history(j):
                    wtr.bit((abs(cur[j]) >> al) & 1)


def _prog_symbols_gray(blocks, bands, al_first):
    """Collect every Huffman symbol the grayscale scan plan will emit by
    doing a dry-run emission into throwaway writers with permissive
    identity tables."""
    dc_syms, ac_syms = set(), set()
    for zz in blocks:
        for alx in (al_first,):
            s = zz[0] >> alx
            dc_syms.add(_cat(s))  # superset: diffs have <= this category
    # brute force: emit with a recording table
    class _Rec(dict):
        def __init__(self, sink):
            self.sink = sink

        def __getitem__(self, sym):
            self.sink.add(sym)
            return (2, 0)

    wtr = _W()
    pred = [0] * 1
    _dc_first_scan(wtr, _Rec(dc_syms), [(0, zz) for zz in blocks],
                   al_first, pred)
    for ss, se in bands:
        _ac_first_scan(wtr, _Rec(ac_syms), blocks, ss, se, al_first)
        for al in range(al_first - 1, -1, -1):
            _ac_refine_scan(wtr, _Rec(ac_syms), blocks, ss, se, al)
    return dc_syms, ac_syms


def _encode_progressive_gray(w_px, h_px, blocks, bands, al_first=1):
    comps = [{"id": 1, "h": 1, "v": 1}]
    dc_syms, ac_syms = _prog_symbols_gray(blocks, bands, al_first)
    out, dc_of, ac_of = _headers(w_px, h_px, comps, 0xC2, dc_syms, ac_syms)
    # scan 1: DC first at Al=al_first
    _sos(out, [1], 0, 0, 0, al_first)
    wtr = _W()
    _dc_first_scan(wtr, dc_of, [(0, zz) for zz in blocks], al_first, [0])
    wtr.flush()
    out.extend(wtr.out)
    # AC first scans per band at Al=al_first
    for ss, se in bands:
        _sos(out, [1], ss, se, 0, al_first)
        wtr = _W()
        _ac_first_scan(wtr, ac_of, blocks, ss, se, al_first)
        wtr.flush()
        out.extend(wtr.out)
    # successive approximation down to Al=0
    for al in range(al_first - 1, -1, -1):
        _sos(out, [1], 0, 0, al + 1, al)
        wtr = _W()
        _dc_refine_scan(wtr, [(0, zz) for zz in blocks], al)
        wtr.flush()
        out.extend(wtr.out)
        for ss, se in bands:
            _sos(out, [1], ss, se, al + 1, al)
            wtr = _W()
            _ac_refine_scan(wtr, ac_of, blocks, ss, se, al)
            wtr.flush()
            out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _rand_blocks(n, seed, dense=False):
    rnd = random.Random(seed)
    blocks = []
    for _ in range(n):
        zz = [0] * 64
        zz[0] = rnd.randint(-60, 60)
        for k in range(1, 64):
            roll = rnd.random()
            if roll < (0.25 if dense else 0.12):
                zz[k] = rnd.randint(-15, 15)
            elif roll < (0.32 if dense else 0.2):
                zz[k] = rnd.choice([-1, 1, -2, 2, -3, 3])
        blocks.append(zz)
    # make sure edge shapes occur: an all-zero-AC block and a
    # high-frequency-only block (long ZRL runs + EOBRUN)
    z0 = [0] * 64
    z0[0] = 17
    blocks[0] = z0
    zh = [0] * 64
    zh[0] = -9
    zh[60] = 5
    zh[63] = -1
    blocks[-1] = zh
    return blocks


@pytest.mark.parametrize("seed,bands,al", [
    (1, [(1, 63)], 1),
    (2, [(1, 5), (6, 63)], 1),
    (3, [(1, 20), (21, 63)], 2),
    (4, [(1, 2), (3, 9), (10, 63)], 0),
])
def test_progressive_equals_baseline_gray(seed, bands, al):
    w_px, h_px = 24, 16  # 3x2 blocks
    blocks = _rand_blocks(6, seed, dense=(seed == 3))
    base = _encode_baseline(
        w_px, h_px, [{"id": 1, "h": 1, "v": 1}], [blocks],
        [(0, i) for i in range(6)],
    )
    if al == 0:
        # spectral selection only (no successive approximation)
        prog = _encode_progressive_gray(w_px, h_px, blocks, bands, 1)
    else:
        prog = _encode_progressive_gray(w_px, h_px, blocks, bands, al)
    got_b = decode_jpeg(base)
    got_p = decode_jpeg(prog)
    assert got_b[:3] == got_p[:3] == (w_px, h_px, 1)
    assert got_b[3] == got_p[3], "progressive pixels differ from baseline"


def test_progressive_color_interleaved_dc():
    # 16x16 4:2:0: Y 2x2 blocks + Cb + Cr; DC scan interleaved in MCU
    # order, AC scans per component (the only legal progressive layout)
    rnd = random.Random(9)
    yb = _rand_blocks(4, 11)
    cb = _rand_blocks(1, 12)
    cr = _rand_blocks(1, 13)
    comps = [
        {"id": 1, "h": 2, "v": 2},
        {"id": 2, "h": 1, "v": 1},
        {"id": 3, "h": 1, "v": 1},
    ]
    blocks_by_comp = [yb, cb, cr]
    mcu_order = [(0, 0), (0, 1), (0, 2), (0, 3), (1, 0), (2, 0)]
    base = _encode_baseline(16, 16, comps, blocks_by_comp, mcu_order)

    # progressive: DC interleaved then one full AC band per component
    dc_syms, ac_syms = set(), set()

    class _Rec(dict):
        def __init__(self, sink):
            self.sink = sink

        def __getitem__(self, sym):
            self.sink.add(sym)
            return (2, 0)

    seq = [(ci, blocks_by_comp[ci][bi]) for ci, bi in mcu_order]
    _dc_first_scan(_W(), _Rec(dc_syms), seq, 0, [0, 0, 0])
    for ci in range(3):
        _ac_first_scan(_W(), _Rec(ac_syms), blocks_by_comp[ci], 1, 63, 0)
    out, dc_of, ac_of = _headers(16, 16, comps, 0xC2, dc_syms, ac_syms)
    _sos(out, [1, 2, 3], 0, 0, 0, 0)
    wtr = _W()
    _dc_first_scan(wtr, dc_of, seq, 0, [0, 0, 0])
    wtr.flush()
    out.extend(wtr.out)
    for ci, cid in ((0, 1), (1, 2), (2, 3)):
        _sos(out, [cid], 1, 63, 0, 0)
        wtr = _W()
        _ac_first_scan(wtr, ac_of, blocks_by_comp[ci], 1, 63, 0)
        wtr.flush()
        out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    prog = bytes(out)

    got_b = decode_jpeg(base)
    got_p = decode_jpeg(prog)
    assert got_b[:3] == got_p[:3] == (16, 16, 3)
    assert got_b[3] == got_p[3]
    assert rnd  # keep the seeded generator referenced


def test_progressive_truncation_is_contained():
    blocks = _rand_blocks(6, 5)
    prog = _encode_progressive_gray(24, 16, blocks, [(1, 63)], 1)
    full = decode_jpeg(prog)
    assert full[:3] == (24, 16, 1)
    for frac in (0.1, 0.4, 0.7, 0.95):
        blob = prog[:max(4, int(len(prog) * frac))]
        try:
            decode_jpeg(blob)
        except DECODE_ERRORS:
            pass  # dispatch sites catch exactly this tuple


def test_q61_thumbnail_path_decodes_progressive():
    """The q61 resize stage must take the REAL-decode branch for a
    progressive JPEG (it used to fall through to the stub): the thumb
    digest must equal the digest of the decoded-gray pixels, not the
    raw-bytes stub digest."""
    import hashlib

    import pandas as pd

    from kinesyslog_spark.operators.multimodal import (
        THUMB_BYTES,
        resize_batches,
    )
    from kinesyslog_spark.operators.png import to_gray

    blocks = _rand_blocks(6, 21)
    prog = _encode_progressive_gray(24, 16, blocks, [(1, 10), (11, 63)], 1)
    w, h, ch, px = decode_jpeg(prog)
    expected = hashlib.md5(to_gray(px, ch)).hexdigest()  # 24x16 <= 64: no scale
    out = pd.concat(resize_batches(
        iter([pd.DataFrame({"doc_id": [3], "payload": [prog]})])
    ))
    row = out.iloc[0]
    assert (row["out_w"], row["out_h"]) == (24, 16)
    assert row["thumb_md5"] == expected
    assert row["thumb_md5"] != hashlib.md5(prog[:THUMB_BYTES]).hexdigest()
