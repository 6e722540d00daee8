"""Q141 — video scene-cut (shot boundary) detection over a REAL
uncompressed-AVI frame path.

The video member of the multimodal family: q62 samples frames, q124
near-dups images — this one segments a video into shots by luma-
histogram differencing, the classic shot-boundary signal. The decode
path is real end-to-end: RIFF walk -> raw 24-bit DIB frames
(bottom-up BGR rows, 4-byte padding) -> integer BT.601 luma -> 256-bin
histograms -> L1 distance per consecutive-frame transition
(`operators/avi.py: scene_cut_l1`); a transition is a cut when
L1 >= SC_THR.

Fixture synthesis (the q124 pattern — the container ships no video
fixtures): each document renders to a deterministic DIB AVI whose
frame f is a vertical gradient anchored at

    g(f) = (doc_id + 97*scene(f) + f%3) % 256,

where scene(f) increments exactly when the doc's f-th character code
is divisible by 3 — so scene boundaries are data-dependent, non-cut
transitions still jitter (f%3 wobbles g by <= 2), and the analytic L1
between gradient frames is 2*W*min(cyclic_delta(g), H). The DuckDB
oracle replays those integers straight from `text`/`doc_id` — any bug
in the RIFF writer, the DIB row/padding/BGR handling, the luma, or the
histogram math perturbs the L1 and fails the hash gate.

Scale posture: synthesis and detection are the two intended Arrow-
batched Python stages (1->1 and 1->N map-only — the same economics as
q61/q124: no shuffle until the tiny cut rows); the JVM side is a
filter + sort over (doc, transition) rows, O(total frames) not
O(pixels).

Reference parity: none (video analytics is the Spark-side multimodal
extension; SURVEY §2 training-data-ops family).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.avi import encode_dib_avi, scene_cut_l1
from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import load_table

SC_W, SC_H = 18, 16   # frame dims: W odd-multiple-of-3 rows exercise DIB padding
SC_JUMP = 97          # scene-to-scene anchor jump (cyclic distance >= 95)
SC_THR = 2 * SC_W * 8  # cut iff L1 >= this (cyclic delta >= 8)


def _synth_frames(doc_id: int, text: str) -> list[bytes]:
    """Deterministic gradient frames; scene boundaries from char codes."""
    ln = max(len(text), 1)
    n = ln % 12 + 4
    frames = []
    scene = 0
    for f in range(n):
        if f >= 1 and ord(text[f % ln] if text else " ") % 3 == 0:
            scene += 1
        g = (doc_id + SC_JUMP * scene + f % 3) % 256
        row_of = lambda y: bytes(((g + y) % 256,)) * (SC_W * 3)  # noqa: E731
        frames.append(b"".join(row_of(y) for y in range(SC_H)))
    return frames


def _synth_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": [
                    encode_dib_avi(SC_W, SC_H, _synth_frames(int(d), t))
                    for d, t in zip(pdf["doc_id"], pdf["text"])
                ],
            }
        )


def _detect_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids, fis, l1s = [], [], []
        for d, payload in zip(pdf["doc_id"], pdf["payload"]):
            for fi, l1 in scene_cut_l1(bytes(payload)):
                ids.append(int(d))
                fis.append(fi)
                l1s.append(l1)
        yield pd.DataFrame({"doc_id": ids, "frame_idx": fis, "l1": l1s})


_Q141_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text, strlen(text) AS ln, strlen(text) % 12 + 4 AS n
  FROM documents
),
f AS (
  SELECT doc_id, text, ln, unnest(range(1, n)) AS fi FROM b
),
c AS (
  SELECT doc_id, fi,
         CASE WHEN ascii(substr(text, (fi % ln) + 1, 1)) % 3 = 0
              THEN 1 ELSE 0 END AS cond
  FROM f
),
s AS (
  SELECT doc_id, fi, cond,
         SUM(cond) OVER (PARTITION BY doc_id ORDER BY fi) AS scene
  FROM c
),
g AS (
  SELECT doc_id, fi,
         (doc_id + {SC_JUMP} * scene + fi % 3) % 256 AS gc,
         (doc_id + {SC_JUMP} * (scene - cond) + (fi - 1) % 3) % 256 AS gp
  FROM s
),
d AS (
  SELECT doc_id, fi,
         LEAST((gc - gp + 256) % 256, (gp - gc + 256) % 256) AS dmin
  FROM g
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(fi AS BIGINT) AS cut_idx,
       CAST(2 * {SC_W} * LEAST(dmin, {SC_H}) AS BIGINT) AS l1
FROM d
WHERE 2 * {SC_W} * LEAST(dmin, {SC_H}) >= {SC_THR}
ORDER BY doc_id, cut_idx
"""


@query("q141_scene_cuts", oracle=_Q141_ORACLE)
def q141_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # the test parquet is one split; spread the CPU-bound Python
        # synth/decode stages across the executor cores (the
        # hot_phash_vectors pattern). At corpus scale the input
        # already has thousands of splits and this is a near-no-op.
        .repartition(spark.sparkContext.defaultParallelism)
    )
    videos = docs.mapInPandas(_synth_batches, schema="doc_id long, payload binary")
    trans = videos.mapInPandas(
        _detect_batches, schema="doc_id long, frame_idx int, l1 long"
    )
    return (
        trans.filter(F.col("l1") >= SC_THR)
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("cut_idx"),
            "l1",
        )
        .orderBy("doc_id", "cut_idx")
    )
