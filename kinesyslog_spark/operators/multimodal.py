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
