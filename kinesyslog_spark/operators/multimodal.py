r"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw media as an
opaque `binary` column next to typed metadata, and run decode / feature
extraction / resize / frame-sampling as Arrow-batched pandas functions via
`mapInPandas` — one Python worker per partition, one Arrow batch per
~10k rows, never a row-at-a-time UDF.

MEDIA METADATA decode is real — pure header parsing, zero deps:
JPEG/PNG/GIF width-height-codec (`parse_image_header`), WAV/RIFF
channels-rate-bits-duration (`parse_audio_header`), and ISO-BMFF (MP4)
brand + mvhd duration / Matroska sniff (`parse_video_header`).

PIXELS and SAMPLES are real for the stdlib-feasible codecs: PNG
(zlib + unfilter at every legal depth + Adam7, operators/png.py), GIF
incl. animation (LZW + GCE composition, gif.py), APNG (apng.py),
baseline + progressive JPEG (Huffman + IDCT, jpeg.py), BMP incl. RLE
(bmp.py), WAV PCM/float/G.711/IMA/MS-ADPCM (wav.py), and MJPEG/DIB-AVI
frame extraction (avi.py). What remains behind the clearly-marked
seam: arithmetic-coded JPEG, inter-frame video codecs (H.264 etc.),
GSM audio — those paths raise NotImplementedError or run
`fake_decode_meta`, a deterministic pure function of the payload bytes
that a SQL oracle can reproduce. Everything Spark-side (schema,
batching, partition behavior) is real either way.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

# What a corrupt-but-magic-byte-plausible payload can raise inside the
# pure-Python decoders (PNG/GIF/JPEG/BMP/WAV/AVI): explicit validation
# errors (ValueError), documented format seams (NotImplementedError),
# truncated header reads (struct.error), short pixel/sample buffers
# (IndexError), and damaged deflate streams (zlib.error). The "a bad
# blob must never kill the query" contract means every decode dispatch
# site catches exactly this tuple and falls through to its stub/skip
# path (round-4 ADVICE: struct.error from a truncated payload was
# killing the Spark task, and in streaming the whole query).
DECODE_ERRORS = (
    ValueError,
    NotImplementedError,
    struct.error,
    IndexError,
    zlib.error,
    EOFError,
)

META_SCHEMA = (
    "doc_id long, modality string, n_bytes long, "
    "width long, height long, duration_s double"
)

_MODALITIES = ("image", "audio", "video")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF0-SOF15 carry frame dims, except DHT(C4)/JPG(C8)/DAC(CC).
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes) -> dict | None:
    """(codec, width, height) from raw image bytes via pure header
    parsing — PNG IHDR, GIF logical-screen descriptor, JPEG SOF scan.
    Returns None for anything unrecognized/truncated (caller decides
    whether that is an error). No image library involved.
    """
    buf = bytes(payload)
    # PNG (spec: 8-byte signature, IHDR is always the first chunk;
    # width/height are the first two big-endian u32 of its data).
    if buf[:8] == _PNG_SIG and len(buf) >= 24 and buf[12:16] == b"IHDR":
        w, h = struct.unpack(">II", buf[16:24])
        return {"codec": "png", "width": w, "height": h}
    # GIF (87a/89a: logical screen width/height, little-endian u16).
    if buf[:6] in (b"GIF87a", b"GIF89a") and len(buf) >= 10:
        w, h = struct.unpack("<HH", buf[6:10])
        return {"codec": "gif", "width": w, "height": h}
    # BMP (BITMAPINFOHEADER width/height; |height| — top-down is negative).
    if buf[:2] == b"BM":
        from kinesyslog_spark.operators.bmp import parse_bmp_header

        return parse_bmp_header(buf)
    # JPEG: walk marker segments from SOI to the first SOF.
    if buf[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(buf):
            if buf[i] != 0xFF:
                return None  # desynced: not a well-formed segment stream
            marker = buf[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers have no length field
                continue
            if marker == 0xD9:  # EOI before any SOF
                return None
            (seg_len,) = struct.unpack(">H", buf[i + 2:i + 4])
            if marker in _JPEG_SOF:
                if i + 9 > len(buf):
                    return None
                h, w = struct.unpack(">HH", buf[i + 5:i + 9])
                return {"codec": "jpeg", "width": w, "height": h}
            if marker == 0xDA:  # SOS: entropy-coded data, no SOF seen
                return None
            i += 2 + seg_len
    return None


def parse_audio_header(payload: bytes) -> dict | None:
    """(codec, channels, sample_rate, duration_s) from raw audio bytes —
    WAV/RIFF chunk walk, zero deps. None for unrecognized/truncated."""
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    i = 12
    fmt, data_size = None, None
    while i + 8 <= len(buf):
        cid = buf[i:i + 4]
        (clen,) = struct.unpack("<I", buf[i + 4:i + 8])
        if cid == b"fmt " and i + 8 + 16 <= len(buf):
            _fmt, ch, rate, byte_rate, _ba, bits = struct.unpack(
                "<HHIIHH", buf[i + 8:i + 24]
            )
            fmt = {"channels": ch, "sample_rate": rate,
                   "byte_rate": byte_rate, "bits": bits}
        elif cid == b"data":
            data_size = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_size is None or not fmt["byte_rate"]:
        return None
    return {
        "codec": "wav",
        "channels": fmt["channels"],
        "sample_rate": fmt["sample_rate"],
        "bits": fmt["bits"],
        "duration_s": data_size / fmt["byte_rate"],
    }


def parse_video_header(payload: bytes) -> dict | None:
    """(codec/container brand, duration_s) from raw video bytes —
    ISO-BMFF (MP4) box walk reading ftyp major_brand and moov/mvhd
    timescale+duration; RIFF/AVI via the avih header (real frame
    counts); Matroska sniffed by EBML magic. Zero deps."""
    buf = bytes(payload)
    if buf[:4] == b"\x1a\x45\xdf\xa3":  # EBML → Matroska/WebM
        return {"codec": "matroska", "brand": None, "duration_s": None}
    if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        from kinesyslog_spark.operators.avi import parse_avi

        try:
            meta = parse_avi(buf)
        except ValueError:
            return None
        return {
            "codec": meta["codec"] or "avi",
            "brand": "avi",
            "duration_s": meta["duration_s"],
        }
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        return None
    brand = buf[8:12].decode("latin-1")
    duration_s = None
    i = 0
    while i + 8 <= len(buf):
        (size,) = struct.unpack(">I", buf[i:i + 4])
        btype = buf[i + 4:i + 8]
        if size < 8:
            break
        if btype == b"moov":
            j = i + 8
            end = min(i + size, len(buf))
            while j + 8 <= end:
                (csize,) = struct.unpack(">I", buf[j:j + 4])
                ctype = buf[j + 4:j + 8]
                if csize < 8:
                    break
                if ctype == b"mvhd" and j + 8 + 20 <= len(buf):
                    ver = buf[j + 8]
                    ts = dur = None
                    if ver == 1:
                        # v1 layout: 8-byte times; a truncated v1 box
                        # must NOT fall back to the v0 field offsets.
                        if j + 40 <= len(buf):
                            ts, dur = struct.unpack(
                                ">IQ", buf[j + 28:j + 40]
                            )
                    elif j + 28 <= len(buf):
                        ts, dur = struct.unpack(
                            ">II", buf[j + 20:j + 28]
                        )
                    if ts:
                        duration_s = dur / ts
                j += csize
        i += size
    return {"codec": "mp4", "brand": brand, "duration_s": duration_s}


def decode_media(payload: bytes, modality: str) -> dict:
    """REAL decode entry point.

    Image metadata (JPEG/PNG/GIF dims + codec) is parsed from the
    headers with zero dependencies. Pixel decode and audio/video need
    codecs not installed in this container — a production deployment
    plugs PIL/torchaudio/pyav in here; the signature (bytes in,
    metadata dict out) and the mapInPandas batch shape are what the
    engine guarantees.
    """
    if modality == "image":
        meta = parse_image_header(payload)
        if meta is not None:
            return {
                "modality": "image",
                "n_bytes": len(payload),
                "width": meta["width"],
                "height": meta["height"],
                "codec": meta["codec"],
                "duration_s": None,
            }
        raise NotImplementedError(
            "unrecognized image container (only JPEG/PNG/GIF headers are "
            "parseable without codec libraries)"
        )
    if modality == "audio":
        meta = parse_audio_header(payload)
        if meta is not None:
            return {
                "modality": "audio",
                "n_bytes": len(payload),
                "width": None,
                "height": None,
                "codec": meta["codec"],
                "channels": meta["channels"],
                "sample_rate": meta["sample_rate"],
                "duration_s": meta["duration_s"],
            }
        raise NotImplementedError(
            "unrecognized audio container (only WAV/RIFF headers are "
            "parseable without codec libraries)"
        )
    if modality == "video":
        meta = parse_video_header(payload)
        if meta is not None:
            return {
                "modality": "video",
                "n_bytes": len(payload),
                "width": None,
                "height": None,
                "codec": meta["codec"],
                "brand": meta["brand"],
                "duration_s": meta["duration_s"],
            }
        raise NotImplementedError(
            "unrecognized video container (only ISO-BMFF/Matroska headers "
            "are parseable without codec libraries)"
        )
    raise NotImplementedError(
        f"{modality} decode requires media codecs not present in this "
        "environment; use fake_decode_meta for deterministic testing"
    )


def fake_decode_meta(payload: bytes, doc_id: int) -> dict:
    """Deterministic stand-in for decode_media: metadata derived purely
    from the payload length (so a SQL oracle can reproduce it)."""
    n = len(payload)
    return {
        "modality": _MODALITIES[doc_id % 3],
        "n_bytes": n,
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
        "duration_s": round((n % 10000) / 100.0, 4),
    }


IMAGE_META_SCHEMA = (
    "doc_id long, codec string, width long, height long, n_bytes long"
)


def image_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body for the REAL image-metadata path: (doc_id,
    payload) -> IMAGE_META_SCHEMA rows via `parse_image_header`.
    Unrecognized/truncated payloads yield codec=NULL instead of failing
    the task — at corpus scale a malformed blob must never kill a
    partition; filter `codec IS NOT NULL` downstream."""
    cols = ["doc_id", "codec", "width", "height", "n_bytes"]
    for pdf in batches:
        rows = []
        for p, d in zip(pdf["payload"], pdf["doc_id"]):
            raw = bytes(p)
            meta = parse_image_header(raw) or {}
            rows.append({
                "doc_id": d,
                "codec": meta.get("codec"),
                "width": meta.get("width"),
                "height": meta.get("height"),
                "n_bytes": len(raw),
            })
        yield pd.DataFrame(rows, columns=cols)


THUMB_BYTES = 64          # stub "resize": first 64 payload bytes
FRAME_SLICE = 16          # stub "frame": 16-byte slice per sampled frame

RESIZE_SCHEMA = (
    "doc_id long, out_w long, out_h long, thumb_md5 string"
)
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_md5 string"


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for the resize/thumbnail step: (doc_id, payload)
    -> one row per image with the downsampled dims and a digest of the
    thumbnail bytes.

    PNG, GIF, JPEG (baseline AND progressive), and BMP payloads take
    the REAL pixel path
    (operators/png.py / gif.py / jpeg.py / bmp.py: zero-dep decode -> integer
    luma -> aspect-preserving box downscale into 64x64; thumb_md5
    digests the actual downscaled gray pixels). Everything else keeps
    the deterministic stub (thumb = first THUMB_BYTES of the payload;
    dims = fake_decode_meta dims clamped to 64) behind the remaining
    codec seam (arithmetic-coded JPEG, exotic formats). Either way the batch
    shape — 1 row in, 1 row out, bounded memory per Arrow batch — is
    exactly what a PIL `Image.thumbnail` implementation drops into."""
    import hashlib

    from kinesyslog_spark.operators.bmp import decode_bmp
    from kinesyslog_spark.operators.gif import decode_gif
    from kinesyslog_spark.operators.jpeg import decode_jpeg
    from kinesyslog_spark.operators.png import (
        box_downscale,
        decode_png,
        thumbnail_dims,
        to_gray,
    )

    for pdf in batches:
        rows = []
        for p, d in zip(pdf["payload"], pdf["doc_id"]):
            raw = bytes(p)
            decoder = (
                decode_png if raw[:8] == _PNG_SIG
                else decode_gif if raw[:6] in (b"GIF87a", b"GIF89a")
                else decode_jpeg if raw[:2] == b"\xff\xd8"
                else decode_bmp if raw[:2] == b"BM"
                else None
            )
            if decoder is not None:
                try:
                    w, h, ch, px = decoder(raw)
                    gray = to_gray(px, ch)
                    ow, oh = thumbnail_dims(w, h, 64)
                    thumb = (
                        gray if (ow, oh) == (w, h)
                        else box_downscale(gray, w, h, ow, oh)
                    )
                    rows.append({
                        "doc_id": d,
                        "out_w": ow,
                        "out_h": oh,
                        "thumb_md5": hashlib.md5(thumb).hexdigest(),
                    })
                    continue
                except DECODE_ERRORS:
                    pass  # malformed/unsupported: fall through to stub
            meta = fake_decode_meta(raw, d)
            rows.append({
                "doc_id": d,
                "out_w": min(meta["width"], 64),
                "out_h": min(meta["height"], 64),
                "thumb_md5": hashlib.md5(raw[:THUMB_BYTES]).hexdigest(),
            })
        yield pd.DataFrame(rows, columns=["doc_id", "out_w", "out_h", "thumb_md5"])


MJPEG_SAMPLE_FRAMES = 4  # frames sampled per video on the real path


def frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for video frame sampling: (doc_id, payload) ->
    N rows per video (the 1-to-N fan-out shape).

    MJPEG AVI payloads take the REAL path (operators/avi.py +
    operators/jpeg.py): up to MJPEG_SAMPLE_FRAMES evenly spaced frames
    are container-extracted and pixel-decoded; frame_md5 digests the
    DECODED pixels (any codec bug changes the digest). Animated GIFs
    take the same real path through decode_gif_frames (composed RGB
    frames, GCE disposal/transparency applied). Other payloads keep the
    stub (k = n_bytes % 4 + 1 evenly-spaced FRAME_SLICE-byte windows);
    a pyav implementation replaces that slicing for inter-frame codecs
    at the same sample positions."""
    import hashlib

    from kinesyslog_spark.operators.avi import extract_frames
    from kinesyslog_spark.operators.gif import decode_gif_frames

    for pdf in batches:
        rows = []
        for p, d in zip(pdf["payload"], pdf["doc_id"]):
            raw = bytes(p)
            if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                try:
                    for j, (_idx, _w, _h, px) in enumerate(
                        extract_frames(raw, MJPEG_SAMPLE_FRAMES)
                    ):
                        rows.append({
                            "doc_id": d,
                            "frame_idx": j,
                            "frame_md5": hashlib.md5(px).hexdigest(),
                        })
                    continue
                except DECODE_ERRORS:
                    pass  # malformed/non-MJPEG: fall through to stub
            elif raw[:6] in (b"GIF87a", b"GIF89a"):
                try:
                    frames = decode_gif_frames(raw, MJPEG_SAMPLE_FRAMES)[3]
                    for j, px in enumerate(frames):
                        rows.append({
                            "doc_id": d,
                            "frame_idx": j,
                            "frame_md5": hashlib.md5(px).hexdigest(),
                        })
                    continue
                except DECODE_ERRORS:
                    pass  # malformed GIF: fall through to stub
            elif raw[:8] == _PNG_SIG:
                try:
                    from kinesyslog_spark.operators.apng import (
                        decode_apng_frames,
                    )

                    frames = decode_apng_frames(raw, MJPEG_SAMPLE_FRAMES)[3]
                    for j, px in enumerate(frames):
                        rows.append({
                            "doc_id": d,
                            "frame_idx": j,
                            "frame_md5": hashlib.md5(px).hexdigest(),
                        })
                    continue
                except DECODE_ERRORS:
                    pass  # plain/malformed PNG: fall through to stub
            n = len(raw)
            k = n % 4 + 1
            step = max(n // k, 1)
            for j in range(k):
                off = j * step
                rows.append({
                    "doc_id": d,
                    "frame_idx": j,
                    "frame_md5": hashlib.md5(raw[off:off + FRAME_SLICE]).hexdigest(),
                })
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])


def extract_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, payload) -> META_SCHEMA rows.

    Vectorized per Arrow batch; emits one output frame per input frame
    (bounded memory regardless of partition size).
    """
    for pdf in batches:
        meta = [fake_decode_meta(p, d) for p, d in zip(pdf["payload"], pdf["doc_id"])]
        out = pd.DataFrame(meta)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out[["doc_id", "modality", "n_bytes", "width", "height", "duration_s"]]
