"""Zero-dependency WAV/PCM sample codec + integer audio features.

PCM needs no codec library — samples are raw little-endian integers in
the RIFF `data` chunk — so, like PNG in operators/png.py, the audio
modality's SAMPLE-level path can be real in this container:

- `encode_wav`  — minimal PCM writer (8-bit unsigned / 16-bit signed,
  any channel count / rate).
- `decode_wav_samples` — RIFF chunk walk -> per-channel int sample
  matrix; PCM (tag 1) and mono IMA ADPCM (tag 0x11, real integer
  state-machine decode below) are decoded for real; IEEE float,
  mu-law, and stereo ADPCM raise NotImplementedError (the documented
  codec seam) and malformed containers raise ValueError.
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
            fmt = (tag, ch, rate, bits, ba)
        elif cid == b"data":
            data = chunk
        i += 8 + clen + (clen & 1)  # word-aligned chunks
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, bits, ba = fmt
    if tag == 0x11:  # IMA ADPCM — real integer state-machine decode
        if ch != 1:
            raise NotImplementedError(
                "stereo IMA ADPCM (per-channel nibble-group interleave)"
            )
        return rate, 16, [decode_ima_adpcm(data, ba)]
    if tag == 0x07:  # G.711 mu-law — real table-free expansion
        if ch < 1:
            raise ValueError("zero channels")
        out = [[] for _ in range(ch)]
        for idx, byte in enumerate(data):
            out[idx % ch].append(_mulaw_expand(byte))
        return rate, 16, out
    if tag == 0x03:  # IEEE float32 — real decode, scaled to 16-bit ints
        if bits != 32:
            raise NotImplementedError(f"float WAV with {bits}-bit samples")
        if ch < 1:
            raise ValueError("zero channels")
        n = len(data) // (ch * 4)
        out = [[] for _ in range(ch)]
        for f in range(n):
            base = f * ch * 4
            for c in range(ch):
                (v,) = struct.unpack("<f", data[base + c * 4:base + c * 4 + 4])
                s = int(v * 32767.0)  # truncate toward zero (deterministic)
                out[c].append(max(-32768, min(32767, s)))
        return rate, 16, out
    if tag != 1:
        raise NotImplementedError(
            f"format tag {tag} (PCM=1, float=3, mu-law=7, IMA ADPCM=0x11; "
            "A-law/extensible need codecs)"
        )
    if bits not in (8, 16):
        raise NotImplementedError(f"bit depth {bits} (only 8/16)")
    if ch < 1:
        raise ValueError("zero channels")
    width = bits // 8
    n = len(data) // (ch * width)
    out: list[list[int]] = [[] for _ in range(ch)]
    for f in range(n):
        base = f * ch * width
        for c in range(ch):
            o = base + c * width
            if bits == 16:
                (v,) = struct.unpack("<h", data[o:o + 2])
            else:
                v = data[o] - 128
            out[c].append(v)
    return rate, bits, out


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
