"""Q71 — the composed filter-pipeline verdict.

Every training-data pipeline ends in exactly this table: one row per
candidate document with each filter's signal and a single keep/drop
decision plus the FIRST reject reason (fixed rule priority), so curation
changes are diffable run-over-run. The components are the engine's own
oracle-checked filters, reused verbatim:

- q42 decontamination   (8-gram eval-set collision, PaLM-style)
- q43 repetition        (Gopher A1.1 top-word / dup-3-gram rules)
- q54 boilerplate       (cross-doc 5-gram document frequency)
- q69 token entropy     (degenerate-unigram-distribution floor)

Rule priority: contaminated > repetition > boilerplate > low_entropy >
none. A document absent from a component's domain (e.g. q54 skips docs
under 5 tokens) defaults to PASS for that rule — absence of evidence,
explicitly encoded as COALESCE(keep, 1) on both engines.

The DuckDB oracle is built by embedding the component ORACLE strings as
CTEs, so the two sides can never drift: q71's twin is definitionally the
composition of the component twins.

Scale: the expensive work is the components', all of which share
hot_tokens and broadcast their small sides; the composition itself is
three doc_id equi-joins on already-small per-doc outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import ORACLE, query
from kinesyslog_spark.queries.decontam import (
    q42_decontaminate,
    q43_repetition_filter,
)
from kinesyslog_spark.queries.pipeline_ext import q54_boilerplate_passages
from kinesyslog_spark.queries.retrieval import q69_entropy_filter


def _q71_oracle() -> str:
    return f"""
    WITH c42 AS ({ORACLE["q42_decontaminate"]}),
         c43 AS ({ORACLE["q43_repetition_filter"]}),
         c54 AS ({ORACLE["q54_boilerplate_passages"]}),
         c69 AS ({ORACLE["q69_entropy_filter"]})
    SELECT c42.doc_id,
           c42.contam_frac,
           CAST(COALESCE(c43.keep, 1) AS INT) AS rep_keep,
           CAST(COALESCE(c54.keep, 1) AS INT) AS boiler_keep,
           CAST(COALESCE(c69.keep, 1) AS INT) AS entropy_keep,
           CASE WHEN c42.contaminated = 1 THEN 'contaminated'
                WHEN COALESCE(c43.keep, 1) = 0 THEN 'repetition'
                WHEN COALESCE(c54.keep, 1) = 0 THEN 'boilerplate'
                WHEN COALESCE(c69.keep, 1) = 0 THEN 'low_entropy'
                ELSE 'none' END AS reject_reason,
           CAST(CASE WHEN c42.contaminated = 0
                      AND COALESCE(c43.keep, 1) = 1
                      AND COALESCE(c54.keep, 1) = 1
                      AND COALESCE(c69.keep, 1) = 1
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM c42
    LEFT JOIN c43 USING (doc_id)
    LEFT JOIN c54 USING (doc_id)
    LEFT JOIN c69 USING (doc_id)
    ORDER BY c42.doc_id
    """


@query("q71_filter_pipeline", oracle=_q71_oracle())
def q71_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    c42 = q42_decontaminate(spark, sf_dir).select(
        "doc_id", "contam_frac", "contaminated"
    )
    c43 = q43_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rk")
    )
    c54 = q54_boilerplate_passages(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("bk")
    )
    c69 = q69_entropy_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("ek")
    )
    rep_keep = F.coalesce(F.col("rk"), F.lit(1))
    boiler_keep = F.coalesce(F.col("bk"), F.lit(1))
    entropy_keep = F.coalesce(F.col("ek"), F.lit(1))
    reason = (
        F.when(F.col("contaminated") == 1, "contaminated")
        .when(rep_keep == 0, "repetition")
        .when(boiler_keep == 0, "boilerplate")
        .when(entropy_keep == 0, "low_entropy")
        .otherwise("none")
    )
    return (
        c42.join(c43, "doc_id", "left")
        .join(c54, "doc_id", "left")
        .join(c69, "doc_id", "left")
        .select(
            "doc_id",
            "contam_frac",
            rep_keep.cast("int").alias("rep_keep"),
            boiler_keep.cast("int").alias("boiler_keep"),
            entropy_keep.cast("int").alias("entropy_keep"),
            reason.alias("reject_reason"),
            (reason == "none").cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )
