"""Zero-dependency WAV/PCM sample codec + integer audio features.

PCM needs no codec library — samples are raw little-endian integers in
the RIFF `data` chunk — so, like PNG in operators/png.py, the audio
modality's SAMPLE-level path can be real in this container:

- `encode_wav`  — minimal PCM writer (8-bit unsigned / 16-bit signed,
  any channel count / rate).
- `decode_wav_samples` — RIFF chunk walk -> per-channel int sample
  matrix; PCM (tag 1, 8/16/24/32-bit integer), MS ADPCM (tag 2,
  predictor/coefficient codec), IEEE float32/64 (tag 3), G.711 A-law
  (tag 6) and mu-law (tag 7), IMA ADPCM mono AND multi-channel
  (tag 0x11, real integer state-machine decode with the 4-byte
  nibble-group channel interleave), GSM 6.10 (tag 0x31, full RPE-LTP
  decode via operators/gsm610.py, MS WAV49 two-frames-per-65-byte-
  block packing), and WAVE_FORMAT_EXTENSIBLE (0xFFFE, SubFormat GUID
  resolution to any of the above, including reduced-valid-bits PCM
  re-justification — left-justified samples shifted down to
  valid_bits scale) are all decoded for real; remaining exotic tags
  (e.g. MP3-in-WAV) raise NotImplementedError; malformed containers
  raise ValueError.
- `audio_features` — the feature-extraction step of a training
  pipeline, all exactly reproducible in SQL: sample/channel counts,
  integer peak (max |s|), sum of squared samples (exact int; RMS is
  derived as ROUND(sqrt(ssq/n), 4) — IEEE sqrt and one division are
  both correctly rounded, so both engines produce the identical
  double), and zero-crossing count on channel 0 (sign-change count,
  zeros carry the previous sign — an exact integer).

Reference parity: none (no media surface in kinesyslog); narrows the
multimodal seam from VERDICT r3 (audio was metadata-only).
"""

from __future__ import annotations

import math
import struct

from .gsm610 import decode_gsm_wav49, encode_gsm_wav49


def encode_wav(samples: list[list[int]], sample_rate: int,
               bits: int = 16) -> bytes:
    """samples = one list per channel, equal lengths; 16-bit signed or
    8-bit unsigned PCM, interleaved little-endian."""
    if bits not in (8, 16):
        raise ValueError("PCM writer supports 8/16 bits")
    ch = len(samples)
    n = len(samples[0]) if ch else 0
    if any(len(s) != n for s in samples):
        raise ValueError("channels must be equal length")
    frames = bytearray()
    for i in range(n):
        for c in range(ch):
            v = samples[c][i]
            frames += (
                struct.pack("<h", v) if bits == 16
                else struct.pack("<B", v)
            )
    block_align = ch * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + bytes(frames)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_samples(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """REAL PCM sample decode: (sample_rate, bits, per-channel ints).

    16-bit -> signed [-32768, 32767]; 8-bit -> CENTERED (v - 128) so
    both depths share the signed convention downstream.
    """
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(buf):
        cid = buf[i:i + 4]
        (clen,) = struct.unpack("<I", buf[i + 4:i + 8])
        chunk = buf[i + 8:i + 8 + clen]
        if cid == b"fmt " and len(chunk) >= 16:
            tag, ch, rate, _br, ba, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            fmt = (tag, ch, rate, bits, ba, chunk)
        elif cid == b"data":
            data = chunk
        i += 8 + clen + (clen & 1)  # word-aligned chunks
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, bits, ba, fmt_chunk = fmt
    shift = 0  # right-shift for left-justified reduced-valid-bits PCM
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE — resolve the SubFormat
        if len(fmt_chunk) < 40:
            raise ValueError("extensible fmt chunk shorter than 40 bytes")
        (samples_field,) = struct.unpack("<H", fmt_chunk[18:20])
        guid = fmt_chunk[24:40]
        if guid[4:] != _KSDATAFORMAT_TAIL:
            raise ValueError("SubFormat GUID is not in the KSDATAFORMAT family")
        (tag,) = struct.unpack("<I", guid[:4])
        # The Samples union field is wValidBitsPerSample only for the
        # uncompressed subformats; for compressed ones (ADPCM, GSM) it
        # is wSamplesPerBlock and must not be read as a bit depth.
        if tag in (0x01, 0x03) and samples_field not in (0, bits):
            valid_bits = samples_field
            if tag != 0x01 or valid_bits > bits:
                raise NotImplementedError(
                    f"extensible audio with {valid_bits} valid of {bits} "
                    "container bits (non-PCM sample re-justification)"
                )
            # PCM samples are left-justified in their container: drop
            # the padding LSBs so values are valid_bits-scaled ints.
            shift = bits - valid_bits
    if tag == 0x11:  # IMA ADPCM — real integer state-machine decode
        if ch < 1:
            raise ValueError("zero channels")
        if ch == 1:
            return rate, 16, [decode_ima_adpcm(data, ba)]
        return rate, 16, decode_ima_adpcm_multi(data, ba, ch)
    if tag in (0x06, 0x07):  # G.711 A-law / mu-law — real expansion
        if ch < 1:
            raise ValueError("zero channels")
        expand = _alaw_expand if tag == 0x06 else _mulaw_expand
        out = [[] for _ in range(ch)]
        for idx, byte in enumerate(data):
            out[idx % ch].append(expand(byte))
        return rate, 16, out
    if tag == 0x03:  # IEEE float32/float64 — real decode, 16-bit ints
        if bits not in (32, 64):
            raise NotImplementedError(f"float WAV with {bits}-bit samples")
        if ch < 1:
            raise ValueError("zero channels")
        width_f, code = (4, "<f") if bits == 32 else (8, "<d")
        n = len(data) // (ch * width_f)
        out = [[] for _ in range(ch)]
        for f in range(n):
            base = f * ch * width_f
            for c in range(ch):
                o = base + c * width_f
                (v,) = struct.unpack(code, data[o:o + width_f])
                # Clamp in the FLOAT domain: int(inf * 32767.0) raises
                # OverflowError, which is not a DECODE_ERRORS member, so an
                # adversarial ±inf payload would escape the containment
                # catch and kill the task. NaN compares false → map to 0.
                f_scaled = v * 32767.0
                if f_scaled != f_scaled:  # NaN
                    s = 0
                else:
                    s = int(max(-32768.0, min(32767.0, f_scaled)))
                out[c].append(s)
        return rate, 16, out
    if tag == 0x02:  # MS ADPCM — real predictor/coefficient decode
        if ch < 1:
            raise ValueError("zero channels")
        return rate, 16, decode_ms_adpcm(data, ba, ch)
    if tag == 0x31:  # GSM 6.10 — real RPE-LTP decode (WAV49 blocks)
        if ch != 1:
            raise ValueError("GSM 6.10 WAV must be mono")
        return rate, 16, [decode_gsm_wav49(data, ba)]
    if tag != 1:
        raise NotImplementedError(
            f"format tag {tag} (PCM=1, MS ADPCM=2, float=3, A-law=6, "
            "mu-law=7, IMA ADPCM=0x11, GSM=0x31, extensible=0xFFFE are "
            "the real decode paths)"
        )
    if bits not in (8, 16, 24, 32):
        raise NotImplementedError(f"bit depth {bits} (only 8/16/24/32)")
    if ch < 1:
        raise ValueError("zero channels")
    width = bits // 8
    n = len(data) // (ch * width)
    out: list[list[int]] = [[] for _ in range(ch)]
    for f in range(n):
        base = f * ch * width
        for c in range(ch):
            o = base + c * width
            if bits == 8:
                v = data[o] - 128
            else:
                v = int.from_bytes(data[o:o + width], "little", signed=True)
            out[c].append(v >> shift)
    return rate, bits - shift, out


# WAVE_FORMAT_EXTENSIBLE SubFormat GUIDs: Data1 = the classic format
# tag; Data2..Data4 are this fixed KSDATAFORMAT tail.
_KSDATAFORMAT_TAIL = b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def _alaw_expand(byte: int) -> int:
    """G.711 A-law byte -> linear 16-bit sample (ITU-T G.711 / CCITT
    alaw2linear: XOR 0x55, segment shift; sign bit SET means positive)."""
    a = byte ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


def _mulaw_expand(byte: int) -> int:
    """G.711 mu-law byte -> linear 16-bit sample (ITU-T G.711 decoder
    expansion; the exact integer form used by libsndfile/CCITT)."""
    u = ~byte & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    sample = ((mantissa << 3) + 0x84) << exponent
    sample -= 0x84
    return -sample if sign else sample


def audio_features(payload: bytes) -> dict:
    """Exact-integer features of a PCM WAV payload (see module doc)."""
    rate, bits, chans = decode_wav_samples(payload)
    n = len(chans[0]) if chans else 0
    flat = [v for c in chans for v in c]
    peak = max((abs(v) for v in flat), default=0)
    ssq = sum(v * v for v in flat)
    total = len(flat)
    rms = round(math.sqrt(ssq / total), 4) if total else 0.0
    zc = 0
    prev_sign = 0
    for v in chans[0] if chans else []:
        sign = 1 if v > 0 else (-1 if v < 0 else prev_sign)
        if prev_sign != 0 and sign != 0 and sign != prev_sign:
            zc += 1
        if sign != 0:
            prev_sign = sign
    return {
        "sample_rate": rate,
        "bits": bits,
        "n_channels": len(chans),
        "n_samples": n,
        "peak": peak,
        "sum_sq": ssq,
        "rms": rms,
        "zero_crossings": zc,
    }


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format tag 0x11) — integer state-machine codec
# ---------------------------------------------------------------------------
#
# The classic 4-bit DVI/IMA ADPCM: each nibble adjusts a predictor by a
# table-stepped delta. Pure integer arithmetic end-to-end, so decode is
# bit-exact and container-independent. Mono blocks only (stereo IMA
# interleaves 4-byte nibble groups per channel — behind the seam).

IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8,
                   -1, -1, -1, -1, 2, 4, 6, 8)
IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else 32767 if v > 32767 else v


def _ima_decode_nibble(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = _clamp16(predictor - diff if nibble & 8 else predictor + diff)
    index = max(0, min(88, index + IMA_INDEX_TABLE[nibble]))
    return predictor, index


def _ima_encode_sample(sample: int, predictor: int, index: int) -> tuple[int, int, int]:
    step = IMA_STEP_TABLE[index]
    delta = sample - predictor
    nibble = 8 if delta < 0 else 0
    if delta < 0:
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    predictor, index = _ima_decode_nibble(nibble, predictor, index)
    return nibble, predictor, index


def encode_ima_adpcm(samples: list[int], sample_rate: int,
                     block_frames: int = 504) -> bytes:
    """Mono IMA-ADPCM WAV writer (format tag 0x11). Each block: 4-byte
    header (initial int16 sample + step index) + 4-bit nibbles for the
    remaining block_frames samples (must be even)."""
    if block_frames % 2 != 0 or block_frames < 2:
        raise ValueError("block_frames must be even and >= 2")
    block_align = 4 + block_frames // 2
    blocks = []
    index = 0
    i = 0
    n = len(samples)
    while i < n:
        chunk = samples[i:i + 1 + block_frames]
        first = _clamp16(chunk[0])
        blk = bytearray(struct.pack("<hBB", first, index, 0))
        predictor = first
        nibbles = []
        for s in chunk[1:]:
            nib, predictor, index = _ima_encode_sample(_clamp16(s), predictor, index)
            nibbles.append(nib)
        while len(nibbles) < block_frames:  # pad the final block
            nib, predictor, index = _ima_encode_sample(predictor, predictor, index)
            nibbles.append(nib)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            blk.append(lo | (hi << 4))
        blocks.append(bytes(blk))
        i += 1 + block_frames
    data = b"".join(blocks)
    frames_per_block = block_frames + 1
    fmt = struct.pack(
        "<HHIIHH", 0x11, 1, sample_rate,
        sample_rate * block_align // frames_per_block, block_align, 4,
    ) + struct.pack("<HH", 2, frames_per_block)  # cbSize + samples/block
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_ima_adpcm(data: bytes, block_align: int) -> list[int]:
    """Mono IMA-ADPCM `data` chunk -> int16 samples (bit-exact integer
    state machine)."""
    if block_align < 5:
        raise ValueError("block_align too small for IMA ADPCM")
    out: list[int] = []
    for b in range(0, len(data) - (len(data) % block_align), block_align):
        blk = data[b:b + block_align]
        predictor, index, _res = struct.unpack("<hBB", blk[:4])
        if index > 88:
            raise ValueError("corrupt IMA block (step index > 88)")
        out.append(predictor)
        for byte in blk[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                predictor, index = _ima_decode_nibble(nib, predictor, index)
                out.append(predictor)
    return out


def decode_ima_adpcm_multi(data: bytes, block_align: int,
                           ch: int) -> list[list[int]]:
    """Multi-channel IMA-ADPCM `data` chunk -> per-channel int16 samples.

    Block layout per the Microsoft WAV mapping (format tag 0x11): one
    4-byte header per channel (int16 predictor, step index, reserved),
    then 4-byte nibble GROUPS round-robin across channels — each group
    carries 8 consecutive samples of ITS channel (low nibble first).
    The decoded stream for each channel is therefore bit-identical to a
    mono decode of that channel's own header + regrouped nibbles — the
    identity tests/test_adpcm.py pins.
    """
    if ch < 2:
        raise ValueError("use decode_ima_adpcm for mono")
    if block_align < 4 * ch or (block_align - 4 * ch) % (4 * ch):
        raise ValueError("block_align not a whole nibble-group multiple")
    out: list[list[int]] = [[] for _ in range(ch)]
    for b in range(0, len(data) - (len(data) % block_align), block_align):
        blk = data[b:b + block_align]
        preds: list[int] = []
        idxs: list[int] = []
        for c in range(ch):
            predictor, index, _res = struct.unpack(
                "<hBB", blk[4 * c:4 * c + 4]
            )
            if index > 88:
                raise ValueError("corrupt IMA block (step index > 88)")
            preds.append(predictor)
            idxs.append(index)
            out[c].append(predictor)
        for g, off in enumerate(range(4 * ch, block_align, 4)):
            c = g % ch
            predictor, index = preds[c], idxs[c]
            for byte in blk[off:off + 4]:
                for nib in (byte & 0x0F, byte >> 4):
                    predictor, index = _ima_decode_nibble(
                        nib, predictor, index
                    )
                    out[c].append(predictor)
            preds[c], idxs[c] = predictor, index
    return out


def encode_ima_adpcm_multi(channels: list[list[int]], sample_rate: int,
                           block_frames: int = 64) -> bytes:
    """Multi-channel IMA-ADPCM WAV writer (format tag 0x11). Per block:
    one 4-byte header per channel, then 4-byte nibble groups round-robin
    (block_frames samples per channel after the header sample; must be a
    multiple of 8 for whole groups)."""
    ch = len(channels)
    if ch < 2:
        raise ValueError("use encode_ima_adpcm for mono")
    if block_frames % 8 != 0 or block_frames < 8:
        raise ValueError("block_frames must be a positive multiple of 8")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channels must be equal length")
    block_align = 4 * ch + block_frames * ch // 2
    blocks = []
    idxs = [0] * ch
    i = 0
    while i < n:
        hdr = bytearray()
        nibs: list[list[int]] = []
        preds: list[int] = []
        for c in range(ch):
            chunk = channels[c][i:i + 1 + block_frames]
            first = _clamp16(chunk[0])
            hdr += struct.pack("<hBB", first, idxs[c], 0)
            predictor = first
            cn: list[int] = []
            for s in chunk[1:]:
                nib, predictor, idxs[c] = _ima_encode_sample(
                    _clamp16(s), predictor, idxs[c]
                )
                cn.append(nib)
            while len(cn) < block_frames:  # pad the final block
                nib, predictor, idxs[c] = _ima_encode_sample(
                    predictor, predictor, idxs[c]
                )
                cn.append(nib)
            nibs.append(cn)
            preds.append(predictor)
        body = bytearray(hdr)
        for g in range(block_frames // 8):
            for c in range(ch):
                grp = nibs[c][g * 8:(g + 1) * 8]
                for lo, hi in zip(grp[0::2], grp[1::2]):
                    body.append(lo | (hi << 4))
        blocks.append(bytes(body))
        i += 1 + block_frames
    data = b"".join(blocks)
    frames_per_block = block_frames + 1
    fmt = struct.pack(
        "<HHIIHH", 0x11, ch, sample_rate,
        sample_rate * block_align // frames_per_block, block_align, 4,
    ) + struct.pack("<HH", 2, frames_per_block)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def encode_wav_gsm(samples: list[int], sample_rate: int) -> bytes:
    """Mono GSM 6.10 WAV writer (format tag 0x31, MS WAV49 layout:
    block_align 65, 320 samples per two-frame block). Fixture path for
    the tag-0x31 decode seam; the codec lives in operators/gsm610.py."""
    data = encode_gsm_wav49(samples)
    frames_per_block = 320
    block_align = 65
    fmt = struct.pack(
        "<HHIIHH", 0x31, 1, sample_rate,
        sample_rate * block_align // frames_per_block, block_align, 0,
    ) + struct.pack("<HH", 2, frames_per_block)  # cbSize + samples/block
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def encode_wav_extensible(samples: list[list[int]], sample_rate: int,
                          bits: int = 16) -> bytes:
    """PCM writer using the WAVE_FORMAT_EXTENSIBLE (0xFFFE) container —
    same frames as encode_wav, fmt chunk carries the SubFormat GUID."""
    plain = encode_wav(samples, sample_rate, bits)
    ch = len(samples)
    block_align = ch * bits // 8
    # data chunk starts after RIFF(12) + "fmt "(8+16) in the plain writer
    data_chunk = plain[12 + 8 + 16:]
    guid = struct.pack("<I", 1) + _KSDATAFORMAT_TAIL
    fmt = struct.pack(
        "<HHIIHH", 0xFFFE, ch, sample_rate, sample_rate * block_align,
        block_align, bits,
    ) + struct.pack("<HHI", 22, bits, (1 << ch) - 1) + guid
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + data_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# MS ADPCM (WAV format tag 0x02) — predictor/coefficient codec
# ---------------------------------------------------------------------------
#
# The other classic 4-bit WAV codec: each block opens with a per-channel
# coefficient-pair index + initial delta + two seed samples; every later
# sample is pred = (s1*c1 + s2*c2) >> 8 plus a signed nibble scaled by
# the adapting delta. Pure integer arithmetic — bit-exact decode.
# Nibbles run HIGH-first within each byte and interleave one nibble per
# channel per sample frame (unlike IMA's 4-byte per-channel groups).

MS_COEFFS = ((256, 0), (512, -256), (0, 0), (192, 64),
             (240, 0), (460, -208), (392, -232))
MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
            768, 614, 512, 409, 307, 230, 230, 230)


def _ms_step(nib: int, s1: int, s2: int, c1: int, c2: int,
             delta: int) -> tuple[int, int]:
    """One MS-ADPCM sample from a 4-bit code: (sample, next_delta)."""
    signed = nib - 16 if nib & 8 else nib
    pred = (s1 * c1 + s2 * c2) >> 8
    sample = _clamp16(pred + signed * delta)
    delta = max(16, (MS_ADAPT[nib] * delta) >> 8)
    return sample, delta


def decode_ms_adpcm(data: bytes, block_align: int,
                    ch: int) -> list[list[int]]:
    """MS-ADPCM `data` chunk -> per-channel int16 samples (bit-exact)."""
    header = 7 * ch  # per channel: predictor byte + 3 int16s
    if block_align <= header:
        raise ValueError("block_align too small for MS ADPCM")
    out: list[list[int]] = [[] for _ in range(ch)]
    for b in range(0, len(data) - (len(data) % block_align), block_align):
        blk = data[b:b + block_align]
        preds = []
        for c in range(ch):
            p = blk[c]
            if p >= len(MS_COEFFS):
                raise ValueError(f"MS ADPCM predictor {p} out of range")
            preds.append(MS_COEFFS[p])
        deltas = [
            struct.unpack("<h", blk[ch + 2 * c:ch + 2 * c + 2])[0]
            for c in range(ch)
        ]
        s1 = [
            struct.unpack("<h", blk[3 * ch + 2 * c:3 * ch + 2 * c + 2])[0]
            for c in range(ch)
        ]
        s2 = [
            struct.unpack("<h", blk[5 * ch + 2 * c:5 * ch + 2 * c + 2])[0]
            for c in range(ch)
        ]
        for c in range(ch):
            out[c] += [s2[c], s1[c]]
        frame = 0  # one nibble per channel per frame, high nibble first
        for byte in blk[header:]:
            for nib in (byte >> 4, byte & 0x0F):
                c = frame % ch
                samp, deltas[c] = _ms_step(
                    nib, s1[c], s2[c], preds[c][0], preds[c][1], deltas[c]
                )
                s2[c], s1[c] = s1[c], samp
                out[c].append(samp)
                frame += 1
    return out


def encode_ms_adpcm(channels: list[list[int]], sample_rate: int,
                    block_frames: int = 64) -> bytes:
    """MS-ADPCM WAV writer (format tag 0x02): per block, per channel the
    best coefficient pair is chosen by trial encode (the spec's
    recommendation); block_frames is the nibble-coded samples per
    channel after the two seeds (ch*block_frames must be even)."""
    ch = len(channels)
    n = len(channels[0]) if ch else 0
    if ch < 1 or any(len(c) != n for c in channels):
        raise ValueError("channels must be non-empty and equal length")
    if (ch * block_frames) % 2:
        raise ValueError("ch * block_frames must be even")
    block_align = 7 * ch + ch * block_frames // 2
    blocks = []
    i = 0
    while i < n:
        seg = [c[i:i + 2 + block_frames] for c in channels]
        seg = [s + [s[-1] if s else 0] * (2 + block_frames - len(s))
               for s in seg]
        chosen = []  # (pred_idx, delta0, nibbles, err)
        for c in range(ch):
            best = None
            for pi, (c1, c2) in enumerate(MS_COEFFS):
                s2v, s1v = _clamp16(seg[c][0]), _clamp16(seg[c][1])
                delta = max(16, abs(s1v - s2v) // 4)
                d0 = delta
                nibs, err = [], 0
                for t in seg[c][2:]:
                    pred = (s1v * c1 + s2v * c2) >> 8
                    diff = _clamp16(t) - pred
                    nib = max(-8, min(7, int(round(diff / delta))
                                      if delta else 0)) & 0x0F
                    samp, delta = _ms_step(nib, s1v, s2v, c1, c2, delta)
                    err += (samp - _clamp16(t)) ** 2
                    s2v, s1v = s1v, samp
                    nibs.append(nib)
                if best is None or err < best[3]:
                    best = (pi, d0, nibs, err)
            chosen.append(best)
        blk = bytearray(bytes(b[0] for b in chosen))
        for c in range(ch):
            blk += struct.pack("<h", chosen[c][1])
        for c in range(ch):
            blk += struct.pack("<h", _clamp16(seg[c][1]))  # sample1
        for c in range(ch):
            blk += struct.pack("<h", _clamp16(seg[c][0]))  # sample2
        stream = []
        for f in range(block_frames):
            for c in range(ch):
                stream.append(chosen[c][2][f])
        for hi, lo in zip(stream[0::2], stream[1::2]):
            blk.append((hi << 4) | lo)
        blocks.append(bytes(blk))
        i += 2 + block_frames
    data = b"".join(blocks)
    frames_per_block = block_frames + 2
    fmt = struct.pack(
        "<HHIIHH", 0x02, ch, sample_rate,
        sample_rate * block_align // frames_per_block, block_align, 4,
    ) + struct.pack("<HH", 32, frames_per_block)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
