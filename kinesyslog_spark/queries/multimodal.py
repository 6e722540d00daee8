r"""Q34 — multimodal metadata extraction over opaque binary payloads.

`documents.text` is re-encoded as UTF-8 bytes to stand in for raw media
blobs (the container ships no image/audio fixtures); the decode step runs
through the engine's real `mapInPandas` plumbing (operators/multimodal.py)
with the codec itself stubbed deterministically, so the DuckDB oracle can
verify the whole pipeline byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.multimodal import (
    FRAME_SCHEMA,
    META_SCHEMA,
    RESIZE_SCHEMA,
    THUMB_BYTES,
    extract_meta_batches,
    frame_sample_batches,
    resize_batches,
)
from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import load_table

_Q34_ORACLE = """
WITH b AS (
  SELECT doc_id, strlen(text) AS n FROM documents
)
SELECT doc_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
  CAST(n AS BIGINT) AS n_bytes,
  CAST(n % 640 + 1 AS BIGINT) AS width,
  CAST((n * 7) % 480 + 1 AS BIGINT) AS height,
  ROUND((n % 10000) / 100.0, 4) AS duration_s
FROM b ORDER BY doc_id
"""


@query("q34_multimodal_meta", oracle=_Q34_ORACLE)
def q34_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Natural parquet splits, not the 32-way spread hot_table: the decode
    # is map-only, so partitioning should follow the input (thousands of
    # splits at corpus scale; locally this avoids spawning a Python
    # worker per forced partition for a trivial batch each).
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(extract_meta_batches, schema=META_SCHEMA).orderBy(
        "doc_id"
    )


# Thumbnails: stubbed codec, real 1->1 mapInPandas plumbing; the oracle
# reproduces the stub arithmetic + md5 over the same bytes (text is
# ASCII in the fixture corpus, so byte slices == char slices).
_Q61_ORACLE = f"""
WITH b AS (
  SELECT doc_id, strlen(text) AS n, text FROM documents
)
SELECT doc_id,
  CAST(LEAST(n % 640 + 1, 64) AS BIGINT) AS out_w,
  CAST(LEAST((n * 7) % 480 + 1, 64) AS BIGINT) AS out_h,
  md5(substring(text, 1, {THUMB_BYTES})) AS thumb_md5
FROM b ORDER BY doc_id
"""


@query("q61_multimodal_thumbs", oracle=_Q61_ORACLE)
def q61_multimodal_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(resize_batches, schema=RESIZE_SCHEMA).orderBy("doc_id")


# Frame sampling: the 1->N fan-out batch shape (k frames per video).
_Q62_ORACLE = """
WITH b AS (
  SELECT doc_id, strlen(text) AS n, text FROM documents
), f AS (
  SELECT doc_id, n, text, unnest(range(n % 4 + 1)) AS frame_idx
  FROM b
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
  md5(substring(text, 1 + frame_idx * GREATEST(n // (n % 4 + 1), 1), 16)) AS frame_md5
FROM f ORDER BY doc_id, frame_idx
"""


@query("q62_multimodal_frames", oracle=_Q62_ORACLE)
def q62_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(frame_sample_batches, schema=FRAME_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )
