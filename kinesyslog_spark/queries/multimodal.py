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

from kinesyslog_spark.operators.multimodal import META_SCHEMA, extract_meta_batches
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
