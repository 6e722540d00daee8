"""The 'a bad blob must never kill the query' contract: payloads that
pass the magic-byte sniff but are truncated/corrupt mid-structure raise
only DECODE_ERRORS from the pure-Python decoders, so every dispatch site
(batch mapInPandas stages AND the streaming imagedup/scenecut loops)
falls through to its stub/skip path instead of dying with an uncaught
struct.error/IndexError (round-4 ADVICE fix)."""

from __future__ import annotations

import pandas as pd
import pytest

from kinesyslog_spark.operators.avi import encode_dib_avi, parse_avi
from kinesyslog_spark.operators.bmp import decode_bmp
from kinesyslog_spark.operators.gif import decode_gif
from kinesyslog_spark.operators.multimodal import (
    DECODE_ERRORS,
    resize_batches,
)
from kinesyslog_spark.operators.png import decode_png, encode_png
from kinesyslog_spark.operators.wav import audio_features, encode_wav


def _png_payload() -> bytes:
    return encode_png(bytes(range(64)), 8, 8)


def _wav_payload() -> bytes:
    return encode_wav([[i % 251 - 125 for i in range(800)]], 8000)


def _avi_payload() -> bytes:
    frames = [bytes((x + y + f) % 256 for y in range(8) for x in range(8) for _ in range(3)) for f in range(3)]
    return encode_dib_avi(8, 8, frames)


def _truncations(payload: bytes):
    # cut inside the header, inside the structure tables, inside the data
    for frac in (0.05, 0.2, 0.5, 0.9):
        n = max(3, int(len(payload) * frac))
        yield payload[:n]
    # and bit-flip damage that keeps the magic intact
    b = bytearray(payload)
    for i in range(12, min(len(b), 200), 7):
        b[i] ^= 0xFF
    yield bytes(b)


@pytest.mark.parametrize(
    "decoder,payload",
    [
        (decode_png, _png_payload()),
        (audio_features, _wav_payload()),
        (parse_avi, _avi_payload()),
        (decode_bmp, b"BM" + bytes(40)),
        (decode_gif, b"GIF89a" + bytes(20)),
    ],
    ids=["png", "wav", "avi", "bmp", "gif"],
)
def test_corrupt_payloads_raise_only_decode_errors(decoder, payload):
    for blob in _truncations(payload):
        try:
            decoder(blob)
        except DECODE_ERRORS:
            pass  # the contract: dispatch sites catch exactly this tuple
        # a truncation that still parses is fine too


def test_resize_batches_survives_truncated_png():
    # end-to-end dispatch site: the truncated-but-PNG-magic payload must
    # take the stub fallback row, never propagate an exception
    blob = _png_payload()[:20]  # magic + partial IHDR
    out = list(
        resize_batches(iter([pd.DataFrame({"doc_id": [7], "payload": [blob]})]))
    )
    rows = pd.concat(out)
    assert len(rows) == 1 and int(rows.iloc[0]["doc_id"]) == 7


def test_new_decoders_corrupt_payloads_raise_only_decode_errors():
    """Round-5-continuation decode paths under the same contract:
    animated GIF, APNG, RLE BMP, MS/multi-channel ADPCM WAV, and the
    low-depth/interlaced PNG paths survive truncation + bit flips."""
    import struct
    import zlib

    from kinesyslog_spark.operators.apng import decode_apng_frames
    from kinesyslog_spark.operators.gif import decode_gif_frames
    from kinesyslog_spark.operators.wav import (
        decode_wav_samples,
        encode_ima_adpcm_multi,
        encode_ms_adpcm,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    apng = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0))
        + chunk(b"acTL", struct.pack(">II", 1, 0))
        + chunk(b"fcTL", struct.pack(">IIIIIHHBB", 0, 4, 4, 0, 0, 1, 10, 0, 0))
        + chunk(b"IDAT", zlib.compress(
            b"".join(b"\x00" + bytes(16) for _ in range(4))
        ))
        + chunk(b"IEND", b"")
    )
    # interlaced PNG with real pass data
    adam = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 5, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(bytes(80)))
        + chunk(b"IEND", b"")
    )
    rle_bmp = (
        b"BM" + struct.pack("<IHHI", 200, 0, 0, 70)
        + struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 1, 100, 0, 0, 4, 0)
        + bytes(16)  # palette
        + bytes((4, 1, 0, 0, 4, 2, 0, 1))
    )
    ms = encode_ms_adpcm([[i % 199 - 99 for i in range(300)]], 8000)
    ima2 = encode_ima_adpcm_multi(
        [[i % 99 for i in range(200)], [-(i % 77) for i in range(200)]],
        8000,
    )
    cases = [
        (lambda b: decode_gif_frames(b), b"GIF89a" + bytes(30)),
        (lambda b: decode_apng_frames(b), apng),
        (decode_png, adam),
        (decode_bmp, rle_bmp),
        (decode_wav_samples, ms),
        (decode_wav_samples, ima2),
    ]
    for decoder, payload in cases:
        for bad in _truncations(payload):
            try:
                decoder(bad)
            except DECODE_ERRORS:
                pass  # contained — the dispatch sites catch these


def test_float_wav_inf_nan_never_escapes():
    """Round-5 ADVICE: ±inf float samples raised OverflowError (not a
    DECODE_ERRORS member) out of the float-WAV path. The decoder now
    saturates in the float domain, so the adversarial blob decodes."""
    import struct

    from kinesyslog_spark.operators.wav import decode_wav_samples

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    data = b"".join(
        struct.pack("<I", b)
        for b in (0x7F800000, 0xFF800000, 0x7FC00000, 0xFFC00000)
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, bits, chans = decode_wav_samples(blob)  # must not raise
    assert chans[0] == [32767, -32768, 0, 0]
    # and the feature path survives it too
    feats = audio_features(blob)
    assert feats["n_samples"] == 4


def test_gif_truncated_gce_raises_valueerror():
    """Round-5 ADVICE: a GIF cut inside the Graphic Control Extension
    raised IndexError (contained only by luck); the documented contract
    is ValueError on malformed input."""
    from kinesyslog_spark.operators.gif import decode_gif_frames

    import struct as _s

    # header + logical screen descriptor + 2-entry GCT, then an
    # extension introducer + GCE label + size byte 4 — and nothing else.
    blob = (
        b"GIF89a" + _s.pack("<HHBBB", 2, 2, 0x80, 0, 0)
        + bytes(6)  # 2-entry global color table
        + b"\x21\xf9\x04"  # extension, GCE, block size 4, TRUNCATED
    )
    with pytest.raises(ValueError):
        decode_gif_frames(blob)
