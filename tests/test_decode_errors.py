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
