r"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw media as an
opaque `binary` column next to typed metadata, and run decode / feature
extraction / resize / frame-sampling as Arrow-batched pandas functions via
`mapInPandas` — one Python worker per partition, one Arrow batch per
~10k rows, never a row-at-a-time UDF.

The actual codecs (PIL / libav / ffmpeg) are NOT in this container, so
`decode_media` is a clearly-marked stub (`NotImplementedError`) and the
pipeline runs `fake_decode_meta` instead — a deterministic pure function
of the payload bytes. Everything Spark-side (schema, batching, partition
behavior) is real and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

META_SCHEMA = (
    "doc_id long, modality string, n_bytes long, "
    "width long, height long, duration_s double"
)

_MODALITIES = ("image", "audio", "video")


def decode_media(payload: bytes, modality: str) -> dict:
    """REAL decode entry point — stubbed: media codecs are not installed.

    A production deployment plugs PIL/torchaudio/pyav in here; the
    signature (bytes in, metadata dict out) and the mapInPandas batch
    shape are what the engine guarantees.
    """
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


THUMB_BYTES = 64          # stub "resize": first 64 payload bytes
FRAME_SLICE = 16          # stub "frame": 16-byte slice per sampled frame

RESIZE_SCHEMA = (
    "doc_id long, out_w long, out_h long, thumb_md5 string"
)
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_md5 string"


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for the resize/thumbnail step: (doc_id, payload)
    -> one row per image with the downsampled dims and a digest of the
    thumbnail bytes. The codec is stubbed (thumb = first THUMB_BYTES of
    the payload; dims = fake_decode_meta dims clamped to 64) but the
    batch shape — 1 row in, 1 row out, bounded memory per Arrow batch —
    is exactly what a PIL `Image.thumbnail` implementation drops into."""
    import hashlib

    for pdf in batches:
        rows = []
        for p, d in zip(pdf["payload"], pdf["doc_id"]):
            meta = fake_decode_meta(p, d)
            thumb = bytes(p)[:THUMB_BYTES]
            rows.append({
                "doc_id": d,
                "out_w": min(meta["width"], 64),
                "out_h": min(meta["height"], 64),
                "thumb_md5": hashlib.md5(thumb).hexdigest(),
            })
        yield pd.DataFrame(rows, columns=["doc_id", "out_w", "out_h", "thumb_md5"])


def frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for video frame sampling: (doc_id, payload) ->
    N rows per video (the 1-to-N fan-out shape). The stub samples
    k = n_bytes % 4 + 1 evenly-spaced FRAME_SLICE-byte windows standing
    in for decoded frames; a pyav implementation replaces the slicing
    with `container.decode(video=0)` at the same sample positions."""
    import hashlib

    for pdf in batches:
        rows = []
        for p, d in zip(pdf["payload"], pdf["doc_id"]):
            raw = bytes(p)
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
