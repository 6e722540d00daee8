"""End-to-end training-data materialization: the composed LLM pipeline
as one artifact-producing job (`kinesyslog-spark pipeline`).

Stages (all reuse the oracle-checked query components — this module
adds NO new semantics, only composition + storage):
1. FILTER  — q71's composed verdict (decontamination, repetition,
   boilerplate, token entropy; fixed rule priority).
2. DEDUP   — q40's MinHash-LSH connected components; each near-dup
   cluster keeps its best-q31-quality member (q107's survivor rule,
   tie-break min doc_id).
3. CUT     — q125's ExactSubstr application: duplicated >= k-token
   spans detected over and removed inside the SURVIVING set (`clean_text`
   column; Lee et al.'s NearDup + ExactSubstr recipe, both halves —
   span detection runs post-filter/post-dedup so content shared only
   with dropped near-dup twins is not cut).
4. WEIGHT  — q103's DSIR importance weight attached per document
   (downstream mixture sampling reads it off the artifact).
5. SHARD   — q84's curriculum order (token-count proxy, unique
   tie-break) dealt into N contiguous shards via NTILE.
6. WRITE   — shard-partitioned parquet via the dynamic-overwrite sink
   (sinks/partitioned.py), sorted by doc_id within shards.

Scale notes: every stage is the already-plan-guarded distributed form
(broadcast filter stats, bucket-bounded pair generation, O(log d)
pointer-jumping components, range-partitioned sort). The composition
adds two doc_id-keyed joins (keep-set, drop-set) — dimension-sized
semi/anti joins against the corpus scan.

Reference parity: the reference relay materializes record spools; this
is the analogous batch artifact for the LLM-data side of the engine
(SURVEY §2b extension), exercised end-to-end by tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesyslog_spark.operators.ranking import with_ntile
from kinesyslog_spark.queries.cluster import q40_dedup_clusters
from kinesyslog_spark.queries.dsir import q103_dsir_weights
from kinesyslog_spark.queries.llm import q31_quality_score
from kinesyslog_spark.queries.substring import cut_spans
from kinesyslog_spark.queries.verdict import q71_filter_pipeline
from kinesyslog_spark.sinks.partitioned import write_partitioned
from kinesyslog_spark.tables import hot_table, hot_tokens


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_shards: int = 16,
) -> dict:
    """Materialize the filtered/deduped/sharded corpus; returns stats."""
    docs = hot_table(spark, sf_dir, "documents")
    n_total = docs.count()

    # 1. composed filter verdict (q71): keep-set
    verdict = q71_filter_pipeline(spark, sf_dir)
    keep = verdict.filter(F.col("keep") == 1).select("doc_id")

    # 2. near-dup clusters (q40): keep each cluster's best-quality
    # member (q107's survivor rule — quality DESC, doc_id tie-break)
    clusters = q40_dedup_clusters(spark, sf_dir)
    qual = q31_quality_score(spark, sf_dir).select("doc_id", "quality")
    surv = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    drops = (
        clusters.join(qual, "doc_id")
        .withColumn("rn", F.row_number().over(surv))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )

    kept = (
        docs.join(keep, "doc_id", "left_semi")
        .join(drops, "doc_id", "left_anti")
    )

    # 3. ExactSubstr cut (q125's operator): remove duplicated >= k-token
    # spans INSIDE the surviving documents — Lee et al.'s full recipe is
    # NearDup across docs (stage 2) + ExactSubstr within WHAT REMAINS, so
    # duplicate detection runs on the post-filter/post-dedup set (spans
    # shared only between a survivor and its dropped twins are NOT dups
    # of the surviving corpus — round-4 ADVICE fix).
    # clean_text carries the cut token stream; text stays for provenance.
    cut = cut_spans(kept).select(
        "doc_id",
        F.array_join("kept", " ").alias("clean_text"),
        (F.col("n_tokens") - F.size("kept")).cast("long")
        .alias("dup_tokens_cut"),
    )
    kept = kept.join(cut, "doc_id", "left").withColumn(
        "clean_text", F.coalesce("clean_text", F.col("text"))
    ).withColumn(
        "dup_tokens_cut", F.coalesce("dup_tokens_cut", F.lit(0))
    )

    # 4. DSIR importance weight (q103) on the artifact
    weights = q103_dsir_weights(spark, sf_dir).select("doc_id", "dsir_weight")
    kept = kept.join(weights, "doc_id", "left").withColumn(
        "dsir_weight", F.coalesce("dsir_weight", F.lit(0.0))
    )

    # 5. curriculum shard assignment (q84's order) — distributed NTILE
    # (operators/ranking.py), never a single-partition window. Rank on
    # the NARROW (doc_id, n_tokens) projection and join the shard map
    # back: with_ntile's boundary-sampling pass re-executes its input,
    # and re-running the CUT/WEIGHT stages for two columns would double
    # the pipeline cost (the left joins can't be pruned away because
    # Catalyst can't prove the right sides are unique-keyed).
    toks = hot_tokens(spark, sf_dir).select("doc_id", F.size("toks").alias("n_tokens"))
    order_base = (
        kept.select("doc_id")
        .join(toks, "doc_id", "left")
        .withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0)))
    )
    shard_map = with_ntile(
        order_base, ["n_tokens", "doc_id"], n_shards, "shard"
    )
    sharded = kept.join(shard_map, "doc_id")

    # 6. shard-partitioned artifact
    write_partitioned(sharded, out_dir, ["shard"], sort_within=["doc_id"])

    n_kept = kept.count()
    n_dropped_dup = drops.count()
    n_tokens_cut = int(
        sharded.agg(F.sum("dup_tokens_cut")).collect()[0][0] or 0
    )
    return {
        "n_total": n_total,
        "n_filtered_out": n_total - verdict.filter(F.col("keep") == 1).count(),
        "n_dropped_dup": n_dropped_dup,
        "n_kept": n_kept,
        "n_tokens_cut": n_tokens_cut,
        "n_shards": n_shards,
        "out_dir": out_dir,
    }
