r"""Deterministic corpus sampling / data-mixing over `documents`
(north star): the "mix weights" step of a training-data pipeline, where
each source contributes a configured fraction of its documents.

q44 — source-stratified deterministic sample. Every document gets a
uniform u in [0, 1) derived from a 60-bit md5 hash of its doc_id (no
rand(): SURVEY §2b determinism rules, and reproducible sampling is a
feature — re-running the pipeline selects the same rows). The per-source
keep rate is a function of the source index (a stand-in for a mix-weight
config table); a document is kept iff u < rate(source).

Scale notes (100 TB posture):
- Pure map-side: hash + compare per row, no shuffle, no state; the
  filter runs inside whole-stage codegen and composes with parquet
  partition pruning on `source` when the corpus is source-partitioned.
- A real deployment swaps the CASE expression for a broadcast-joined
  mix-weight dimension table — same plan shape, still shuffle-free.

Reference parity: no sampling surface in the reference; north-star
extension (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.text import md5_int60
from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import load_table

U_BUCKETS = 10_000  # u resolution: h % 10000 / 10000


def _rate_sql() -> str:
    # rate(srcK) = 1 / (1 + K % 4)  -> 1.0, 0.5, 0.3333, 0.25 cycling.
    # CAST to DOUBLE: bare 1.0 is DECIMAL in DuckDB and its division
    # rounds differently from Spark's double arithmetic.
    return "CAST(1 AS DOUBLE) / (1 + CAST(substring(source, 4) AS INT) % 4)"


def _q44_oracle() -> str:
    return f"""
    WITH u AS (
      SELECT doc_id, source,
             (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
              % {U_BUCKETS}) / CAST({U_BUCKETS} AS DOUBLE) AS u,
             {_rate_sql()} AS rate
      FROM documents
    )
    SELECT doc_id, source, ROUND(u, 4) AS u, ROUND(rate, 4) AS rate
    FROM u WHERE u < rate ORDER BY doc_id
    """


@query("q44_stratified_sample", oracle=_q44_oracle())
def q44_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Direct parquet read, NOT the spread/persisted hot_table: sampling is
    # a pure map-side filter, so the scan should prune to (doc_id, source)
    # and run with zero exchanges — the cached copy would cost a
    # round-robin shuffle and read all five columns.
    docs = load_table(spark, sf_dir, "documents")
    u = (md5_int60(F.col("doc_id").cast("string")) % U_BUCKETS) / F.lit(
        float(U_BUCKETS)
    )
    rate = F.lit(1.0) / (
        1 + F.substring("source", 4, 10).cast("int") % 4
    )
    return (
        docs.select(
            "doc_id",
            "source",
            u.alias("_u"),
            rate.alias("_rate"),
        )
        .filter(F.col("_u") < F.col("_rate"))
        .select(
            "doc_id",
            "source",
            F.round("_u", 4).alias("u"),
            F.round("_rate", 4).alias("rate"),
        )
        .orderBy("doc_id")
    )
