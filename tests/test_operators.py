"""Unit tests for operator building blocks (non-oracle behaviors)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


import base64

# Real 1x1 PNG (full valid file).
PNG_1x1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
    "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)
# Minimal JPEG: SOI + APP0(JFIF) + SOF0 declaring 3x2 px, then EOI.
JPEG_3x2 = (
    b"\xff\xd8"
    b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    b"\xff\xc0\x00\x11\x08\x00\x02\x00\x03\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    b"\xff\xd9"
)
# Minimal GIF89a header declaring a 7x9 logical screen.
GIF_7x9 = b"GIF89a\x07\x00\x09\x00\x00\x00\x00;"


def test_parse_image_header_real_formats():
    from kinesyslog_spark.operators.multimodal import parse_image_header

    assert parse_image_header(PNG_1x1) == {
        "codec": "png", "width": 1, "height": 1,
    }
    assert parse_image_header(JPEG_3x2) == {
        "codec": "jpeg", "width": 3, "height": 2,
    }
    assert parse_image_header(GIF_7x9) == {
        "codec": "gif", "width": 7, "height": 9,
    }
    # truncated/garbage -> None, never an exception
    assert parse_image_header(b"") is None
    assert parse_image_header(b"\x89PNG...") is None
    assert parse_image_header(PNG_1x1[:10]) is None
    assert parse_image_header(b"\xff\xd8\xff\xd9") is None
    assert parse_image_header(b"not an image at all") is None


def test_decode_media_real_images_stubbed_av():
    from kinesyslog_spark.operators.multimodal import decode_media

    meta = decode_media(JPEG_3x2, "image")
    assert (meta["codec"], meta["width"], meta["height"]) == ("jpeg", 3, 2)
    assert meta["n_bytes"] == len(JPEG_3x2)
    # pixel-level / av decode still needs absent codec libs
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG but not really", "image")
    with pytest.raises(NotImplementedError):
        decode_media(b"RIFF....WAVE", "audio")  # no fmt/data chunks
    # ISO-BMFF headers now parse (brand sniff; no moov -> no duration)
    v = decode_media(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00", "video")
    assert v["codec"] == "mp4" and v["brand"] == "isom"
    assert v["duration_s"] is None


def test_image_meta_mapinpandas(spark):
    """The real header parser through actual Spark mapInPandas plumbing:
    mixed valid/garbage payloads, nulls instead of task failures."""
    from kinesyslog_spark.operators.multimodal import (
        IMAGE_META_SCHEMA,
        image_meta_batches,
    )

    df = spark.createDataFrame(
        [(1, bytearray(PNG_1x1)), (2, bytearray(JPEG_3x2)),
         (3, bytearray(GIF_7x9)), (4, bytearray(b"garbage"))],
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r
        for r in df.mapInPandas(
            image_meta_batches, schema=IMAGE_META_SCHEMA
        ).collect()
    }
    assert (out[1]["codec"], out[1]["width"], out[1]["height"]) == ("png", 1, 1)
    assert (out[2]["codec"], out[2]["width"], out[2]["height"]) == ("jpeg", 3, 2)
    assert (out[3]["codec"], out[3]["width"], out[3]["height"]) == ("gif", 7, 9)
    assert out[4]["codec"] is None and out[4]["n_bytes"] == 7


def test_fake_decode_meta_deterministic():
    from kinesyslog_spark.operators.multimodal import fake_decode_meta

    a = fake_decode_meta(b"x" * 123, 6)
    assert a == fake_decode_meta(b"y" * 123, 9)  # same length + modality class
    assert a["modality"] == "image" and a["n_bytes"] == 123


def test_release_hot_unpersists_and_rebuilds(spark):
    from kinesyslog_spark import tables as T

    sf = "/root/testdata/sf0.001"
    df = T.hot_table(spark, sf, "region")
    assert df.storageLevel.useMemory
    released = T.release_hot(spark, sf)
    assert released >= 1
    assert not df.storageLevel.useMemory
    # next access rebuilds a fresh persisted copy
    df2 = T.hot_table(spark, sf, "region")
    assert df2.storageLevel.useMemory and df2.count() == 5


def test_frame_sample_fanout_shape():
    """frame_sample_batches emits k = n%4+1 rows per input row, with
    deterministic per-frame digests, preserving batch boundaries."""
    import pandas as pd

    from kinesyslog_spark.operators.multimodal import frame_sample_batches

    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"a" * 10, b"b" * 13]})
    out = pd.concat(list(frame_sample_batches(iter([pdf]))))
    # n=10 -> k=3 frames; n=13 -> k=2 frames
    assert list(out.groupby("doc_id").size()) == [3, 2]
    assert list(out["frame_idx"][:3]) == [0, 1, 2]
    again = pd.concat(list(frame_sample_batches(iter([pdf]))))
    assert out.equals(again)


def test_word_shingles(spark):
    from kinesyslog_spark.operators.text import tokens, word_shingles

    df = spark.createDataFrame([("the quick brown fox the quick brown",)], ["text"])
    out = df.select(
        word_shingles(tokens(F.col("text")), 3).alias("sh")
    ).head()["sh"]
    assert sorted(out) == sorted(
        {"the quick brown", "quick brown fox", "brown fox the", "fox the quick"}
    )


def test_simhash_matches_reference_impl(spark):
    from kinesyslog_spark.operators.text import simhash_fingerprint, tokens

    text = "alpha beta gamma alpha"
    toks = text.split()
    scores = [0] * 64
    for t in toks:
        h = hashlib.sha256(t.encode()).hexdigest()
        for j in range(64):
            scores[j] += 1 if h[j] in "89abcdef" else -1
    expect = "".join("1" if s > 0 else "0" for s in scores)

    df = spark.createDataFrame([(text,)], ["text"])
    got = df.select(simhash_fingerprint(tokens(F.col("text"))).alias("fp")).head()["fp"]
    assert got == expect


def test_winnow_fingerprints_subset_of_gram_hashes(spark):
    from kinesyslog_spark.operators.text import winnow_fingerprints

    text = "abcdefghijklmnop"
    grams = [text[i:i + 8] for i in range(len(text) - 7)]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    expect = sorted({min(hs[i:i + 4]) for i in range(len(hs) - 3)})

    df = spark.createDataFrame([(text,)], ["text"])
    got = df.select(winnow_fingerprints(F.col("text"), 8, 4).alias("fp")).head()["fp"]
    assert sorted(got) == expect


def test_q50_sketch_error_bounded(spark, sf_dir):
    """Self-validating HLL row: in_bounds certifies |approx-exact|/exact
    within 5x the configured 2% rsd (the oracle twin emits TRUE)."""
    from kinesyslog_spark.queries import QUERIES

    rows = QUERIES["q50_approx_distinct_sketch"](spark, sf_dir).collect()
    assert rows and all(r["in_bounds"] for r in rows)
    assert all(r["exact_parts"] > 0 for r in rows)


def test_parse_audio_header_wav():
    import io
    import wave

    from kinesyslog_spark.operators.multimodal import (
        decode_media,
        parse_audio_header,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 2 * 8000)  # exactly 1 s of stereo
    data = buf.getvalue()
    meta = parse_audio_header(data)
    assert meta == {
        "codec": "wav", "channels": 2, "sample_rate": 8000, "bits": 16,
        "duration_s": 1.0,
    }
    full = decode_media(data, "audio")
    assert full["codec"] == "wav" and full["duration_s"] == 1.0
    assert parse_audio_header(b"RIFFxxxxWAVE") is None  # no chunks
    assert parse_audio_header(b"\x00" * 40) is None


def test_parse_video_header_mp4_and_matroska():
    import struct

    from kinesyslog_spark.operators.multimodal import (
        decode_media,
        parse_video_header,
    )

    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    # mvhd v0: ver/flags + ctime + mtime + timescale(1000) + duration(2500)
    mvhd_payload = (
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + struct.pack(">II", 1000, 2500) + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_payload)) + b"mvhd" + mvhd_payload
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    meta = parse_video_header(ftyp + moov)
    assert meta == {"codec": "mp4", "brand": "isom", "duration_s": 2.5}
    full = decode_media(ftyp + moov, "video")
    assert full["brand"] == "isom" and full["duration_s"] == 2.5

    assert parse_video_header(b"\x1a\x45\xdf\xa3rest")["codec"] == "matroska"
    assert parse_video_header(b"\x00" * 40) is None

    # mvhd v1 with full 8-byte fields: timescale 1000, duration 4500
    v1_payload = (
        b"\x01\x00\x00\x00" + b"\x00" * 16
        + struct.pack(">IQ", 1000, 4500) + b"\x00" * 80
    )
    v1 = struct.pack(">I", 8 + len(v1_payload)) + b"mvhd" + v1_payload
    moov1 = struct.pack(">I", 8 + len(v1)) + b"moov" + v1
    assert parse_video_header(ftyp + moov1)["duration_s"] == 4.5
    # TRUNCATED v1 mvhd (36-39 bytes available): must neither raise
    # struct.error nor fall back to the v0 field offsets — duration None
    for cut in (36, 37, 38, 39):
        trunc = (ftyp + moov1)[: len(ftyp) + 8 + cut]
        meta_t = parse_video_header(trunc)
        assert meta_t == {"codec": "mp4", "brand": "isom", "duration_s": None}
    import pytest

    with pytest.raises(NotImplementedError):
        decode_media(b"\x00" * 40, "video")
