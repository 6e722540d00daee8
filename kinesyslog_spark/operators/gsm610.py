"""Zero-dependency GSM 06.10 full-rate (RPE-LTP) codec — the WAV
format-tag 0x31 seam (round-6 verdict #7).

Implemented from the public ETSI GSM 06.10 specification's fixed-point
pseudocode (EN 300 961): 160-sample frames at 8 kHz encoded as 260-bit
parameter blocks — 8 log-area ratios (Schur recursion LPC, 6/6/5/5/
4/4/3/3-bit quantization), and per 40-sample subframe a 7-bit LTP lag,
2-bit LTP gain, 2-bit RPE grid position, 6-bit block amplitude, and
thirteen 3-bit RPE pulses. The decoder runs APCM inverse quantization,
RPE grid placement, long-term synthesis, the reflection-coefficient
lattice synthesis filter with the spec's 4-zone LAR interpolation, and
de-emphasis; the encoder runs the full analysis chain (offset
compensation, pre-emphasis, autocorrelation + Schur, short-term
analysis lattice, LTP search, weighting filter + RPE grid selection,
APCM) and exists primarily to make round-trip fixtures possible in
this sandbox.

Packing: WAV containers use the Microsoft WAV49 layout — two frames
per 65-byte block, every parameter written LSB-first into a
little-endian bitstream. `pack_wav49`/`unpack_wav49` round-trip
bit-exactly (pinned in tests). ETSI's official test sequences are not
available in this container, so decoder bit-exactness against the
reference vectors is NOT pinned; correctness evidence is the
spec-table implementation plus encoder/decoder round-trip SNR and
structural tests (tests/test_gsm610.py) — the same posture as the
other zero-dep codecs, documented in ROADMAP's seam list.

All arithmetic is the spec's saturated 16/32-bit integer kind; Python
ints emulate it exactly (SASR is plain >> on negatives).

Reference parity: none (the reference relay has no media surface);
closes the GSM seam in operators/wav.py's decode_wav_samples.
"""

from __future__ import annotations

FRAME_SAMPLES = 160
SUB = 40

# --- spec quantization tables (GSM 06.10 section 4/annex) -------------
_A = (20480, 20480, 20480, 20480, 13964, 15360, 8534, 9036)
_B = (0, 0, 2048, -2560, 94, -1792, -341, -1144)
_MIC = (-32, -32, -16, -16, -8, -8, -4, -4)
_MAC = (31, 31, 15, 15, 7, 7, 3, 3)
_INVA = (13107, 13107, 13107, 13107, 19223, 17476, 31454, 29708)
_DLB = (6554, 16384, 26214, 32767)
_QLB = (3277, 11469, 21299, 32767)
_H = (-134, -374, 0, 2054, 5741, 8192, 5741, 2054, 0, -374, -134)
_NRFAC = (29128, 26215, 23832, 21846, 20165, 18725, 17476, 16384)
_FAC = (18431, 20479, 22527, 24575, 26623, 28671, 30719, 32767)
_LAR_BITS = (6, 6, 5, 5, 4, 4, 3, 3)

# --- saturated fixed-point primitives ---------------------------------


def _add(a: int, b: int) -> int:
    s = a + b
    return 32767 if s > 32767 else (-32768 if s < -32768 else s)


def _sub(a: int, b: int) -> int:
    return _add(a, -b if b != -32768 else 32767) if False else (
        32767 if a - b > 32767 else (-32768 if a - b < -32768 else a - b)
    )


def _mult(a: int, b: int) -> int:
    if a == -32768 and b == -32768:
        return 32767
    return (a * b) >> 15


def _mult_r(a: int, b: int) -> int:
    if a == -32768 and b == -32768:
        return 32767
    return (a * b + 16384) >> 15


def _l_add(a: int, b: int) -> int:
    s = a + b
    if s > 2147483647:
        return 2147483647
    if s < -2147483648:
        return -2147483648
    return s


def _abs(a: int) -> int:
    return 32767 if a == -32768 else (a if a >= 0 else -a)


def _norm(l: int) -> int:
    """Left shifts to normalize a nonzero 32-bit value to bit 30."""
    if l < 0:
        if l <= -1073741824:
            return 0
        l = ~l
    n = 0
    while l < 0x40000000:
        l <<= 1
        n += 1
    return n


def _div(num: int, denum: int) -> int:
    """15-bit fractional division, 0 <= num <= denum, denum > 0."""
    if num == 0:
        return 0
    div = 0
    l_num, l_denum = num, denum
    for _ in range(15):
        div <<= 1
        l_num <<= 1
        if l_num >= l_denum:
            l_num -= l_denum
            div += 1
    return div


# --- shared parameter machinery ---------------------------------------


def _larc_to_larpp(larc: list[int]) -> list[int]:
    """Inverse LAR quantization (decoder 4.3.1 / encoder feedback)."""
    out = []
    for i in range(8):
        t1 = _add(larc[i], _MIC[i]) << 10
        t2 = _B[i] << 1
        t1 = _sub(t1, t2)
        t1 = _mult_r(_INVA[i], t1)
        out.append(_add(t1, t1))
    return out


def _interpolate_larp(prev: list[int], cur: list[int],
                      zone: int) -> list[int]:
    """4-zone LAR interpolation (spec table: k 0-12, 13-26, 27-39,
    40-159)."""
    if zone == 0:
        return [
            _add(_add(prev[i] >> 2, cur[i] >> 2), prev[i] >> 1)
            for i in range(8)
        ]
    if zone == 1:
        return [_add(prev[i] >> 1, cur[i] >> 1) for i in range(8)]
    if zone == 2:
        return [
            _add(_add(prev[i] >> 2, cur[i] >> 2), cur[i] >> 1)
            for i in range(8)
        ]
    return list(cur)


def _larp_to_rp(larp: list[int]) -> list[int]:
    """LAR -> reflection coefficient (piecewise, spec 4.3.3)."""
    out = []
    for v in larp:
        t = _abs(v)
        if t < 11059:
            t <<= 1
        elif t < 20070:
            t = _add(t, 11059)
        else:
            t = _add(t >> 2, 26112)
        out.append(t if v >= 0 else -t)
    return out


_ZONES = ((0, 13), (13, 27), (27, 40), (40, 160))


def _xmaxc_to_exp_mant(xmaxc: int) -> tuple[int, int]:
    exp = 0
    if xmaxc > 15:
        exp = (xmaxc >> 3) - 1
    mant = xmaxc - (exp << 3)
    if mant == 0:
        exp, mant = -4, 7
    else:
        while mant <= 7:
            mant = (mant << 1) | 1
            exp -= 1
        mant -= 8
    return exp, mant


def _apcm_inverse(xmc: list[int], exp: int, mant: int) -> list[int]:
    t1 = _FAC[mant]
    t2 = _sub(6, exp)
    # spec: temp3 = asl(1, sub(temp2, 1)); asl by a negative count is an
    # arithmetic right shift, so exp=6 (full-scale xmaxc) gives 0.
    t3 = (1 << (t2 - 1)) if t2 > 0 else 0
    out = []
    for c in xmc:
        t = (c << 1) - 7       # -7..7 odd
        t <<= 12
        t = _mult_r(t1, t)
        t = _add(t, t3)
        out.append(t >> t2)
    return out


# --- decoder ----------------------------------------------------------


class Gsm610Decoder:
    """Stateful frame decoder (state: LARpp of the previous frame, the
    120+40 long-term residual history, post-filter memory, last lag)."""

    def __init__(self) -> None:
        self.larpp_prev = [0] * 8
        self.drp = [0] * 160      # last 120 residuals + current subframe
        self.nrp = 40
        self.msr = 0
        self.v = [0] * 9

    def decode_frame(self, p: dict) -> list[int]:
        larpp = _larc_to_larpp(list(p["larc"]))
        erp_all: list[int] = []
        for j in range(4):
            exp, mant = _xmaxc_to_exp_mant(p["xmaxc"][j])
            xmp = _apcm_inverse(list(p["xmc"][j]), exp, mant)
            ep = [0] * SUB
            for i in range(13):
                ep[p["mc"][j] + 3 * i] = xmp[i]
            # long-term synthesis
            ncr = p["nc"][j]
            nr = ncr if 40 <= ncr <= 120 else self.nrp
            self.nrp = nr
            brp = _QLB[p["bc"][j]]
            for k in range(SUB):
                drpp = _mult_r(brp, self.drp[120 + k - nr])
                self.drp[120 + k] = _add(ep[k], drpp)
            # shift history left by one subframe
            self.drp[:120] = self.drp[40:160]
            erp_all.extend(self.drp[80:120])
        # short-term synthesis over the 4 interpolation zones
        out = []
        for zone, (k0, k1) in enumerate(_ZONES):
            rrp = _larp_to_rp(
                _interpolate_larp(self.larpp_prev, larpp, zone)
            )
            for k in range(k0, k1):
                sri = erp_all[k]
                for i in range(8, 0, -1):
                    sri = _sub(sri, _mult_r(rrp[i - 1], self.v[i - 1]))
                    self.v[i] = _add(
                        self.v[i - 1], _mult_r(rrp[i - 1], sri)
                    )
                self.v[0] = sri
                # de-emphasis + upscale + 3-LSB truncation
                self.msr = _add(sri, _mult_r(self.msr, 28180))
                out.append(_add(self.msr, self.msr) & ~7)
        self.larpp_prev = larpp
        return out


# --- encoder ----------------------------------------------------------


class Gsm610Encoder:
    def __init__(self) -> None:
        self.z1 = 0
        self.l_z2 = 0
        self.mp = 0
        self.larpp_prev = [0] * 8
        self.u = [0] * 8
        self.dp = [0] * 160       # reconstructed residual history
        self.decoder_like_nrp = 40

    # 4.2.1/4.2.2/4.2.3: downscale, offset compensation, pre-emphasis
    def _preprocess(self, sop: list[int]) -> list[int]:
        out = []
        for s in sop:
            so = (s >> 3) << 2
            s1 = _sub(so, self.z1)
            self.z1 = so
            l_s2 = s1 << 15
            msp = self.l_z2 >> 15
            lsp = self.l_z2 - (msp << 15)
            l_s2 = _l_add(l_s2, _mult_r(lsp, 32735))
            self.l_z2 = _l_add((msp * 32735 * 2) >> 1, l_s2)
            sof = min(32767, max(-32768, (self.l_z2 + 16384) >> 15))
            sf = _add(sof, _mult_r(self.mp, -28180))
            self.mp = sof
            out.append(sf)
        return out

    @staticmethod
    def _lpc_larc(s: list[int]) -> list[int]:
        # autocorrelation with dynamic scaling
        smax = 0
        for v in s:
            a = _abs(v)
            if a > smax:
                smax = a
        if smax == 0:
            scal = 0
        else:
            scal = 4 - _norm(smax << 16)
        scaled = [v >> scal for v in s] if scal > 0 else list(s)
        l_acf = [0] * 9
        for i, sl in enumerate(scaled):
            for k in range(min(9, i + 1)):
                l_acf[k] += sl * scaled[i - k]
        # Schur recursion -> reflection coefficients
        r = [0] * 8
        if l_acf[0] != 0:
            t = _norm(l_acf[0])
            acf = [(v << t) >> 16 for v in l_acf]
            p = acf[:9]
            kk = [0] * 9
            for m in range(1, 8):
                kk[9 - m] = acf[m]
            for n in range(1, 9):
                tmp = _abs(p[1])
                if p[0] < tmp:
                    break
                rn = _div(tmp, p[0])
                if p[1] > 0:
                    rn = -rn
                r[n - 1] = rn
                if n == 8:
                    break
                p[0] = _add(p[0], _mult_r(p[1], rn))
                for m in range(1, 9 - n):
                    p[m] = _add(p[m + 1], _mult_r(kk[9 - m], rn))
                    kk[9 - m] = _add(kk[9 - m], _mult_r(p[m + 1], rn))
        # reflection -> LAR
        larc = []
        for i in range(8):
            t = _abs(r[i])
            if t < 22118:
                t >>= 1
            elif t < 31130:
                t = _sub(t, 11059)
            else:
                t = _sub(t, 26112) << 2
            lar = t if r[i] >= 0 else -t
            # quantize
            t = _mult(_A[i], lar)
            t = _add(t, _B[i])
            t = _add(t, 256)
            t >>= 9
            t = min(_MAC[i], max(_MIC[i], t))
            larc.append(t - _MIC[i])
        return larc

    def _short_term_analysis(self, s: list[int],
                             larc: list[int]) -> list[int]:
        larpp = _larc_to_larpp(larc)
        d = []
        for zone, (k0, k1) in enumerate(_ZONES):
            rp = _larp_to_rp(
                _interpolate_larp(self.larpp_prev, larpp, zone)
            )
            for k in range(k0, k1):
                di = sav = s[k]
                for i in range(8):
                    temp = _add(self.u[i], _mult_r(rp[i], di))
                    di = _add(di, _mult_r(rp[i], self.u[i]))
                    self.u[i] = sav
                    sav = temp
                d.append(di)
        self.larpp_prev = larpp
        return d

    def _ltp(self, d: list[int]) -> tuple[int, int, list[int]]:
        """(Nc, bc, e) for one subframe; updates nothing (caller feeds
        the reconstructed residual back via _feedback)."""
        dmax = 0
        for v in d:
            a = _abs(v)
            if a > dmax:
                dmax = a
        temp = 0 if dmax == 0 else _norm(dmax << 16)
        scal = 0 if temp > 6 else 6 - temp
        wt = [v >> scal for v in d]
        l_max, nc = 0, 40
        for lam in range(40, 121):
            acc = 0
            for k in range(SUB):
                acc += wt[k] * self.dp[120 + k - lam] * 2
            if acc > l_max:
                l_max, nc = acc, lam
        l_max >>= 1
        l_max >>= 6 - scal
        l_power = 0
        for k in range(SUB):
            t = self.dp[120 + k - nc] >> 3
            l_power += t * t * 2
        l_power >>= 1  # match l_max's >>1 normalization
        if l_max <= 0:
            bc = 0
        elif l_max >= l_power:
            bc = 3
        else:
            t = _norm(l_power)
            rr = (l_max << t) >> 16
            ss = (l_power << t) >> 16
            for bc in range(4):
                if bc == 3 or rr <= _mult(ss, _DLB[bc]):
                    break
        bp = _QLB[bc]
        e = [
            _sub(d[k], _mult_r(bp, self.dp[120 + k - nc]))
            for k in range(SUB)
        ]
        return nc, bc, e

    def _rpe(self, e: list[int]) -> tuple[int, int, list[int], list[int]]:
        """(Mc, xmaxc, xMc, ep') — grid select + APCM + local decode."""
        # weighting filter (11-tap H, 5 zeros padded each side)
        padded = [0] * 5 + e + [0] * 5
        x = []
        for k in range(SUB):
            acc = 8192
            for i in range(11):
                acc += _H[i] * padded[k + i]
            acc = min(2147483647, max(-2147483648, acc))
            v = acc >> 13
            x.append(min(32767, max(-32768, v)))
        # grid selection: best of 4 decimated sub-sequences
        best_m, best_em = 0, -1
        for m in range(4):
            em = 0
            for i in range(13):
                t = x[m + 3 * i] >> 2
                em += t * t * 2
            if em > best_em:
                best_em, best_m = em, m
        xm = [x[best_m + 3 * i] for i in range(13)]
        # APCM quantization of the block maximum
        xmax = 0
        for v in xm:
            a = _abs(v)
            if a > xmax:
                xmax = a
        exp = 0
        temp = xmax >> 9
        itest = 0
        for _ in range(6):
            if temp <= 0:
                itest = 1
            temp >>= 1
            if itest == 0:
                exp += 1
        xmaxc = _add(xmax >> (exp + 5), exp << 3)
        expd, mantd = _xmaxc_to_exp_mant(xmaxc)
        # quantize the 13 pulses against the decoded max
        t1 = 6 - expd
        t2 = _NRFAC[mantd]
        xmc = []
        for v in xm:
            t = v << t1
            t = _mult(t, t2)
            xmc.append(max(0, min(7, (t >> 12) + 4)))
        ep = _apcm_inverse(xmc, expd, mantd)
        return best_m, xmaxc, xmc, ep

    def encode_frame(self, samples: list[int]) -> dict:
        if len(samples) != FRAME_SAMPLES:
            raise ValueError("GSM frame needs exactly 160 samples")
        s = self._preprocess(samples)
        larc = self._lpc_larc(s)
        d = self._short_term_analysis(s, larc)
        ncs, bcs, mcs, xmaxcs, xmcs = [], [], [], [], []
        for j in range(4):
            sub = d[j * SUB:(j + 1) * SUB]
            nc, bc, e = self._ltp(sub)
            mc, xmaxc, xmc, epp = self._rpe(e)
            # feedback: reconstruct dp the way the decoder will
            bp = _QLB[bc]
            grid = [0] * SUB
            for i in range(13):
                grid[mc + 3 * i] = epp[i]
            for k in range(SUB):
                self.dp[120 + k] = _add(
                    grid[k], _mult_r(bp, self.dp[120 + k - nc])
                )
            self.dp[:120] = self.dp[40:160]
            ncs.append(nc)
            bcs.append(bc)
            mcs.append(mc)
            xmaxcs.append(xmaxc)
            xmcs.append(xmc)
        return {
            "larc": larc, "nc": ncs, "bc": bcs, "mc": mcs,
            "xmaxc": xmaxcs, "xmc": xmcs,
        }


# --- WAV49 (Microsoft) 65-byte block packing --------------------------


def _frame_fields(p: dict):
    for i in range(8):
        yield p["larc"][i], _LAR_BITS[i]
    for j in range(4):
        yield p["nc"][j], 7
        yield p["bc"][j], 2
        yield p["mc"][j], 2
        yield p["xmaxc"][j], 6
        for i in range(13):
            yield p["xmc"][j][i], 3


def pack_wav49(f1: dict, f2: dict) -> bytes:
    """Two frames -> one 65-byte MS-GSM block (LSB-first bitstream)."""
    acc = 0
    nbits = 0
    out = bytearray()
    for frame in (f1, f2):
        for val, width in _frame_fields(frame):
            if not 0 <= val < (1 << width):
                raise ValueError(f"parameter {val} out of {width}-bit range")
            acc |= val << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    if len(out) != 65:
        raise AssertionError("WAV49 block must be 65 bytes")
    return bytes(out)


def unpack_wav49(block: bytes) -> tuple[dict, dict]:
    if len(block) < 65:
        raise ValueError("truncated WAV49 GSM block")
    acc = int.from_bytes(block[:65], "little")
    pos = 0

    def take(width: int) -> int:
        nonlocal pos
        v = (acc >> pos) & ((1 << width) - 1)
        pos += width
        return v

    frames = []
    for _ in range(2):
        larc = [take(_LAR_BITS[i]) for i in range(8)]
        nc, bc, mc, xmaxc, xmc = [], [], [], [], []
        for _j in range(4):
            nc.append(take(7))
            bc.append(take(2))
            mc.append(take(2))
            xmaxc.append(take(6))
            xmc.append([take(3) for _ in range(13)])
        frames.append({
            "larc": larc, "nc": nc, "bc": bc, "mc": mc,
            "xmaxc": xmaxc, "xmc": xmc,
        })
    return frames[0], frames[1]


def decode_gsm_wav49(data: bytes, block_align: int = 65) -> list[int]:
    """Decode a WAV 'data' chunk of MS-GSM blocks to 16-bit samples."""
    if block_align != 65:
        raise ValueError(f"MS-GSM block align {block_align} (65 expected)")
    dec = Gsm610Decoder()
    out: list[int] = []
    for off in range(0, len(data) - 64, 65):
        f1, f2 = unpack_wav49(data[off:off + 65])
        out.extend(dec.decode_frame(f1))
        out.extend(dec.decode_frame(f2))
    return out


def encode_gsm_wav49(samples: list[int]) -> bytes:
    """Encode 16-bit samples to MS-GSM blocks (fixture path; pads the
    tail with zeros to a whole 320-sample block pair)."""
    enc = Gsm610Encoder()
    pad = (-len(samples)) % (2 * FRAME_SAMPLES)
    samples = list(samples) + [0] * pad
    out = bytearray()
    for off in range(0, len(samples), 2 * FRAME_SAMPLES):
        f1 = enc.encode_frame(samples[off:off + FRAME_SAMPLES])
        f2 = enc.encode_frame(
            samples[off + FRAME_SAMPLES:off + 2 * FRAME_SAMPLES]
        )
        out += pack_wav49(f1, f2)
    return bytes(out)
