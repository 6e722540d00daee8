"""Q126 — audio feature extraction over a REAL PCM sample path
(operators/wav.py: zero-dep WAV encode/decode + exact-integer
features).

The audio twin of q124's design: each document is rendered to a
deterministic 16-bit mono PCM waveform (sample i = (byte[i mod n] - 96)
* 256 — the text wrapped twice, so every char contributes exactly two
samples), written as a REAL RIFF/WAVE payload, decoded back through the
real PCM reader, and feature-extracted: peak amplitude, exact integer
energy (sum of squares), RMS, and zero-crossing count — the standard
cheap audio-quality/VAD features of a speech-data pipeline.

The ORACLE rebuilds every number straight from `text` in SQL: counts
and sums are exact integers; RMS = ROUND(sqrt(sum_sq / n), 4) is
bit-identical because IEEE division and sqrt are correctly rounded
single operations in both engines; zero crossings = adjacent sign
changes over the nonzero sample subsequence (zeros carry the previous
sign), an exact window count. So the driver verifies the WHOLE chain —
WAV writer, RIFF chunk walk, sample unpacking — end to end.

Scale posture: two Arrow-batched map-only Python stages (render +
decode/featurize; sample decode has no Catalyst form), zero shuffles
except the final presentation sort. At 100 TB of real audio the same
plan holds: binaryFile scan -> mapInPandas featurize -> columnar
features.

Reference parity: none (no media surface in the reference); multimodal
north-star (VERDICT r3: audio was metadata-only before this).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.multimodal import DECODE_ERRORS
from kinesyslog_spark.operators.wav import audio_features, encode_wav
from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import load_table

WAV_RATE = 8000
WAV_GAIN = 256   # 16-bit scale for the (byte - 96) waveform
WAV_WRAPS = 2    # text wrapped twice -> every char yields 2 samples


def render_wav_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas 1->1: (doc_id, text) -> (doc_id, payload) real WAV."""
    for pdf in batches:
        rows = []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            b = t.encode("utf-8")
            n = len(b)
            mono = [
                (b[i % n] - 96) * WAV_GAIN for i in range(WAV_WRAPS * n)
            ] if n else []
            rows.append({
                "doc_id": d,
                "payload": encode_wav([mono], WAV_RATE, bits=16),
            })
        yield pd.DataFrame(rows, columns=["doc_id", "payload"])


FEATURE_SCHEMA = (
    "doc_id long, n_samples long, peak long, sum_sq long, "
    "rms double, zero_crossings long"
)


def audio_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas 1->1: (doc_id, payload) -> features via the REAL
    decode path; non-PCM/malformed payloads are skipped."""
    cols = ["doc_id", "n_samples", "peak", "sum_sq", "rms",
            "zero_crossings"]
    for pdf in batches:
        rows = []
        for d, p in zip(pdf["doc_id"], pdf["payload"]):
            try:
                f = audio_features(bytes(p))
            except DECODE_ERRORS:
                continue
            rows.append({
                "doc_id": d,
                "n_samples": f["n_samples"],
                "peak": f["peak"],
                "sum_sq": f["sum_sq"],
                "rms": f["rms"],
                "zero_crossings": f["zero_crossings"],
            })
        yield pd.DataFrame(rows, columns=cols)


def _q126_oracle() -> str:
    g = WAV_GAIN
    w = WAV_WRAPS
    return f"""
    WITH b AS (
      SELECT doc_id, text, strlen(text) AS n FROM documents
      WHERE strlen(text) >= 1
    ), samples AS (
      -- the wrapped stream: sample j = (ascii(text[j mod n]) - 96) * gain
      SELECT doc_id, j,
             (ascii(substring(text, (j % n) + 1, 1)) - 96) AS v
      FROM (SELECT doc_id, text, n, unnest(range(0, {w} * n)) AS j FROM b)
    ), agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_samples,
             CAST(MAX(ABS(v)) * {g} AS BIGINT) AS peak,
             CAST(SUM(CAST(v * {g} AS BIGINT) * (v * {g})) AS BIGINT)
               AS sum_sq
      FROM samples GROUP BY doc_id
    ), nz AS (
      SELECT doc_id, j, CASE WHEN v > 0 THEN 1 ELSE -1 END AS sgn
      FROM samples WHERE v <> 0
    ), zc AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND sgn <> prev
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS zero_crossings
      FROM (
        SELECT doc_id, sgn,
               LAG(sgn) OVER (PARTITION BY doc_id ORDER BY j) AS prev
        FROM nz
      ) GROUP BY doc_id
    )
    SELECT a.doc_id, a.n_samples, a.peak, a.sum_sq,
           ROUND(SQRT(CAST(a.sum_sq AS DOUBLE) / a.n_samples), 4) AS rms,
           COALESCE(z.zero_crossings, 0) AS zero_crossings
    FROM agg a LEFT JOIN zc z ON z.doc_id = a.doc_id
    ORDER BY a.doc_id
    """


@query("q126_audio_features", oracle=_q126_oracle())
def q126_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") >= 1)
        # single-split test parquet: spread the Python stages (no-op at
        # corpus scale where the input has thousands of splits)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    payloads = docs.mapInPandas(
        render_wav_batches, schema="doc_id long, payload binary"
    )
    return (
        payloads.mapInPandas(audio_feature_batches, schema=FEATURE_SCHEMA)
        .orderBy("doc_id")
    )
