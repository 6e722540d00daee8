"""Zero-dependency WAV/PCM sample codec + integer audio features.

PCM needs no codec library — samples are raw little-endian integers in
the RIFF `data` chunk — so, like PNG in operators/png.py, the audio
modality's SAMPLE-level path can be real in this container:

- `encode_wav`  — minimal PCM writer (8-bit unsigned / 16-bit signed,
  any channel count / rate).
- `decode_wav_samples` — RIFF chunk walk -> per-channel int sample
  matrix; raises NotImplementedError for non-PCM formats (IEEE float,
  ADPCM, mu-law stay behind the documented codec seam) and ValueError
  for malformed containers.
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
            tag, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            fmt = (tag, ch, rate, bits)
        elif cid == b"data":
            data = chunk
        i += 8 + clen + (clen & 1)  # word-aligned chunks
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, bits = fmt
    if tag != 1:
        raise NotImplementedError(
            f"format tag {tag} (only PCM=1; float/ADPCM need codecs)"
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
