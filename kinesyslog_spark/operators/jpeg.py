"""Zero-dependency baseline JPEG pixel decode.

Completes the image-pixel matrix (PNG: operators/png.py, GIF:
operators/gif.py): baseline DCT JPEG needs no external codec — Huffman
entropy decoding, dequantization, the 2-D inverse DCT, chroma
upsampling, and YCbCr->RGB are all integer/float arithmetic over the
marker-segment structures `parse_image_header` already walks.

Scope (and the documented seam that remains):
- SOF0 (baseline) and SOF1 (extended sequential) scans, 8-bit samples,
  grayscale or 3-component YCbCr with sampling factors in {1, 2}
  (4:4:4, 4:2:2, 4:1:1, 4:2:0), interleaved single-scan images,
  restart intervals.
- SOF2 progressive (round-5): multi-scan coefficient accumulation with
  spectral selection AND successive approximation — DC first/refine
  (two's-complement bit append per T.81 G.1.2.1), AC first/refine
  (EOBRUN + the magnitude correction-bit algorithm, G.1.2.3),
  interleaved DC scans and single-component AC scans, restart
  intervals resetting predictors and EOB run.
- Arithmetic coding (SOF9+), 12-bit, and CMYK raise
  NotImplementedError — named, not silently wrong.

Determinism: the IDCT is the separable float form evaluated in a fixed
loop order with one final round-half-away + clamp per sample; every
input to it is an exact integer (dequantized coefficients), so results
are identical across platforms (IEEE doubles, fixed op order). The
YCbCr->RGB step uses the integer BT.601 fixed-point form.

Pinned in tests/test_jpeg.py against an INDEPENDENT baseline encoder
written there (forward DCT + Annex-K tables + standard Huffman): flat
blocks decode exactly, smooth gradients round-trip within a tight
error bound, restart markers and 4:2:0 assembly are exercised, and a
hand-assembled single-MCU bitstream decodes to hand-computed pixels.
"""

from __future__ import annotations

import math
import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# IDCT basis: C[u][x] = cn(u) * cos((2x+1)u*pi/16), cn(0)=1/sqrt(2)
_IDCT_C = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; RSTn markers are consumed by `sync_restart`."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    return  # restart marker: stop at the boundary
                else:
                    return  # EOI or next segment
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0  # spec: pad with zeros past the end
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Drop to a byte boundary and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, per the canonical JPEG code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude value (JPEG F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coef: list[int]) -> list[int]:
    """8x8 inverse DCT -> clamped samples (level-shifted +128)."""
    C = _IDCT_C
    # separable transform; coefficient rows are u (vertical freq)
    # stage 1: for each coefficient row u, transform along v -> g[u][x]
    g = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        base = u * 8
        for x in range(8):
            s = 0.0
            for v in range(8):
                c = coef[base + v]
                if c:
                    s += c * C[v][x]
            g[u][x] = s
    # stage 2: transform along u -> f[y][x]
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                gv = g[u][x]
                if gv:
                    s += gv * C[u][y]
            val = int(math.floor(s / 4.0 + 0.5)) + 128
            out[y * 8 + x] = 0 if val < 0 else (255 if val > 255 else val)
    return out


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL baseline JPEG decode: (width, height, channels, pixels).

    channels = 1 (grayscale) or 3 (RGB from YCbCr). Raises ValueError on
    malformed input, NotImplementedError for progressive/arithmetic/
    12-bit/CMYK (the documented seam).
    """
    buf = bytes(payload)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    coefs = None
    saw_scan = False
    i = 2
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError("marker desync")
        marker = buf[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", buf[i + 2:i + 4])
        seg = buf[i + 4:i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if prec == 0:
                    tbl = list(seg[j:j + 64])
                    j += 64
                else:
                    tbl = [
                        struct.unpack(">H", seg[j + 2 * k:j + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    j += 128
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                n = sum(bits)
                vals = list(seg[j + 17:j + 17 + n])
                tbl = _build_huffman(bits, vals)
                (huff_dc if cls == 0 else huff_ac)[tid] = tbl
                j += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit samples")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component (CMYK?)")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(f"sampling {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                coefs = _alloc_coefs(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"SOF marker 0x{marker:02x}")
        elif marker == 0xDA:  # SOS: scan header then entropy data
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            order = []
            for c in range(ns):
                cs, td_ta = seg[1 + 2 * c:3 + 2 * c]
                scan[cs] = (td_ta >> 4, td_ta & 0x0F)
                order.append(cs)
            data_start = i + 2 + seg_len
            if not frame["progressive"]:
                return _decode_scan(
                    buf[data_start:], frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            data_end = _entropy_end(buf, data_start)
            _decode_progressive_scan(
                buf[data_start:data_end], frame, order, scan,
                ss, se, ah_al >> 4, ah_al & 0x0F,
                coefs, huff_dc, huff_ac, restart_interval,
            )
            saw_scan = True
            i = data_end
            continue
        i += 2 + seg_len
    if frame is not None and frame.get("progressive") and saw_scan:
        return _assemble_progressive(frame, coefs, qt)
    raise ValueError("no scan found")


def _entropy_end(buf: bytes, pos: int) -> int:
    """First offset >= pos of a marker that terminates entropy data
    (anything but stuffed 0xFF00 and RSTn)."""
    i = pos
    n = len(buf)
    while i + 1 < n:
        if buf[i] == 0xFF and buf[i + 1] != 0x00 and not (
            0xD0 <= buf[i + 1] <= 0xD7
        ):
            return i
        i += 1
    return n


def _comp_geometry(frame: dict, c: dict) -> tuple[int, int, int, int]:
    """(padded_blocks_w, padded_blocks_h, true_blocks_w, true_blocks_h)
    for one component — padded to full MCUs (interleaved traversal),
    true counts for non-interleaved scans (T.81 A.2.2)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    cw = (w * c["h"] + hmax - 1) // hmax
    ch = (h * c["v"] + vmax - 1) // vmax
    return (mcux * c["h"], mcuy * c["v"],
            (cw + 7) // 8, (ch + 7) // 8)


def _alloc_coefs(frame: dict) -> list[list[list[int]]]:
    """Per component: padded_blocks_w x padded_blocks_h coefficient
    blocks (natural order, NOT dequantized) accumulated across scans."""
    out = []
    for c in frame["comps"]:
        pbw, pbh, _, _ = _comp_geometry(frame, c)
        out.append([[0] * 64 for _ in range(pbw * pbh)])
    return out


def _decode_progressive_scan(
    data, frame, order, scan, ss, se, ah, al,
    coefs, huff_dc, huff_ac, restart_interval,
):
    comps = frame["comps"]
    by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}
    r = _BitReader(bytes(data))
    state = {"eobrun": 0}
    pred = [0] * len(comps)

    def dc_block(ci, blk):
        if ah == 0:
            td = scan[comps[ci]["id"]][0]
            t = _decode_huff(r, huff_dc[td])
            pred[ci] += _extend(r.read_bits(t), t)
            blk[0] = pred[ci] << al
        elif r.read_bit():
            blk[0] |= 1 << al  # two's-complement bit append (G.1.2.1)

    def ac_first(ci, blk):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        ta = scan[comps[ci]["id"]][1]
        tbl = huff_ac[ta]
        k = ss
        while k <= se:
            rs = _decode_huff(r, tbl)
            rr, sz = rs >> 4, rs & 0x0F
            if sz == 0:
                if rr < 15:
                    state["eobrun"] = (1 << rr) - 1
                    if rr:
                        state["eobrun"] += r.read_bits(rr)
                    return
                k += 16  # ZRL
            else:
                k += rr
                if k > se:
                    raise ValueError("AC index overflow")
                blk[ZIGZAG[k]] = _extend(r.read_bits(sz), sz) << al
                k += 1

    def ac_refine(ci, blk):
        # T.81 G.1.2.3 correction-bit algorithm (libjpeg jdphuff form)
        p1, m1 = 1 << al, -1 << al

        def correct(z):
            if r.read_bit() and (blk[z] & p1) == 0:
                blk[z] += p1 if blk[z] > 0 else m1

        ta = scan[comps[ci]["id"]][1]
        tbl = huff_ac[ta]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _decode_huff(r, tbl)
                rr, sz = rs >> 4, rs & 0x0F
                val = 0
                if sz == 0:
                    if rr < 15:
                        state["eobrun"] = 1 << rr
                        if rr:
                            state["eobrun"] += r.read_bits(rr)
                        break
                    # rr == 15: skip 16 zero-history coefficients
                elif sz == 1:
                    val = p1 if r.read_bit() else m1
                else:
                    raise ValueError("bad AC refinement size")
                while k <= se:
                    z = ZIGZAG[k]
                    if blk[z] != 0:
                        correct(z)
                    else:
                        if rr == 0:
                            if val:
                                blk[z] = val
                            k += 1
                            break
                        rr -= 1
                    k += 1
        if state["eobrun"] > 0:
            while k <= se:
                z = ZIGZAG[k]
                if blk[z] != 0:
                    correct(z)
                k += 1
            state["eobrun"] -= 1

    def unit(ci, blk):
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan with Se != 0")
            dc_block(ci, blk)
        else:
            if ah == 0:
                ac_first(ci, blk)
            else:
                ac_refine(ci, blk)

    def restart():
        r.sync_restart()
        pred[:] = [0] * len(comps)
        state["eobrun"] = 0

    if len(order) == 1:
        ci, c = by_id[order[0]]
        pbw, _, tbw, tbh = _comp_geometry(frame, c)
        n = 0
        for byy in range(tbh):
            for bxx in range(tbw):
                if restart_interval and n and n % restart_interval == 0:
                    restart()
                unit(ci, coefs[ci][byy * pbw + bxx])
                n += 1
    else:
        hmax = max(x["h"] for x in comps)
        vmax = max(x["v"] for x in comps)
        mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
        mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n and n % restart_interval == 0:
                    restart()
                for cid in order:
                    ci, c = by_id[cid]
                    pbw = _comp_geometry(frame, c)[0]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            idx = ((my * c["v"] + by) * pbw
                                   + mx * c["h"] + bx)
                            unit(ci, coefs[ci][idx])
                n += 1


def _assemble_progressive(frame, coefs, qt):
    """Dequantize + IDCT the accumulated coefficient blocks, then run the
    same plane-assembly as the baseline path."""
    comps = frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        pbw, pbh, _, _ = _comp_geometry(frame, c)
        q = qt[c["tq"]]
        pw = pbw * 8
        plane = bytearray(pw * pbh * 8)
        for bi, raw in enumerate(coefs[ci]):
            # stored in natural order; quant table is in zigzag order
            deq = [0] * 64
            for k in range(64):
                z = ZIGZAG[k]
                if raw[z]:
                    deq[z] = raw[z] * q[k]
            block = _idct_block(deq)
            ox = (bi % pbw) * 8
            oy = (bi // pbw) * 8
            for yy in range(8):
                row = (oy + yy) * pw + ox
                plane[row:row + 8] = bytes(block[yy * 8:yy * 8 + 8])
        planes.append(plane)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    return _assemble(frame, planes, mcux)


def _decode_scan(data, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component sample planes at full MCU-padded resolution
    planes = []
    for c in comps:
        pw, ph = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes.append(bytearray(pw * ph))
    r = _BitReader(bytes(data))
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_tbl, ac_tbl = huff_dc[td], huff_ac[ta]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0] * 64
                        t = _decode_huff(r, dc_tbl)
                        diff = _extend(r.read_bits(t), t)
                        pred[ci] += diff
                        coef[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, ac_tbl)
                            rrrr, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if rrrr == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise ValueError("AC index overflow")
                            val = _extend(r.read_bits(ssss), ssss)
                            coef[ZIGZAG[k]] = val * q[k]
                            k += 1
                        block = _idct_block(coef)
                        plane = planes[ci]
                        pw = mcux * c["h"] * 8
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        for yy in range(8):
                            row = (oy + yy) * pw + ox
                            plane[row:row + 8] = bytes(
                                block[yy * 8:yy * 8 + 8]
                            )
            mcu_count += 1
    return _assemble(frame, planes, mcux)


def _assemble(frame, planes, mcux):
    """Crop/upsample decoded sample planes into the output pixel buffer
    (shared by the baseline and progressive paths)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        pw = mcux * 8
        gray = bytearray(w * h)
        for y in range(h):
            gray[y * w:(y + 1) * w] = planes[0][y * pw:y * pw + w]
        return w, h, 1, bytes(gray)
    # upsample chroma by replication and convert to RGB (BT.601 int)
    out = bytearray(w * h * 3)
    pws = [mcux * c["h"] * 8 for c in comps]
    for y in range(h):
        for x in range(w):
            yy = planes[0][(y * comps[0]["v"] // vmax) * pws[0]
                           + (x * comps[0]["h"] // hmax)]
            cb = planes[1][(y * comps[1]["v"] // vmax) * pws[1]
                           + (x * comps[1]["h"] // hmax)]
            cr = planes[2][(y * comps[2]["v"] // vmax) * pws[2]
                           + (x * comps[2]["h"] // hmax)]
            cbd, crd = cb - 128, cr - 128
            rr = yy + ((91881 * crd + 32768) >> 16)
            gg = yy - ((22554 * cbd + 46802 * crd + 32768) >> 16)
            bb = yy + ((116130 * cbd + 32768) >> 16)
            o = (y * w + x) * 3
            out[o] = 0 if rr < 0 else (255 if rr > 255 else rr)
            out[o + 1] = 0 if gg < 0 else (255 if gg > 255 else gg)
            out[o + 2] = 0 if bb < 0 else (255 if bb > 255 else bb)
    return w, h, 3, bytes(out)
