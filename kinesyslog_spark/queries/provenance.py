"""Q177/Q178 — dedup provenance analytics: who copies from whom, and
what dedup actually saves.

Two composition queries over the near-dup machinery that a
training-data curation team reads weekly:

- q177 cross-source near-dup contamination matrix: verified MinHash
  near-dup pairs (q26's vpairs) bucketed by the (source, source) pair
  they straddle. Off-diagonal mass = syndication/mirroring between
  sources (double-counted training mass, eval-set leakage risk);
  diagonal mass = within-source boilerplate. Similarity mass is
  reported as an exact integer (sum of the 4-dp jaccard x 10000) so
  both engines aggregate identically in any order.
- q178 dedup token savings per source: the q40 clusters with q107's
  quality-rule survivors — every non-survivor member is a dropped doc;
  group the dropped docs' canonical-tokenizer ([a-z0-9]+ over
  lower(text), the hot_tokens stream both engines count) token counts
  by source. THE number a dedup deployment is judged on (tokens saved
  vs corpus).

Scale notes: both ride the session-memoized family artifacts
(hot_shingle_sigs / cluster_labels) — the pair graph and clusters are
orders of magnitude below the corpus, and the only corpus-sized input
(token counts) is one map-side-combined aggregate joined by doc_id.

Reference parity: none (no corpus surface in the reference relay);
SURVEY §2b LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import ORACLE, query
from kinesyslog_spark.queries.dedup import hot_minhash_pairs, minhash_vpairs_cte
from kinesyslog_spark.tables import hot_table, hot_tokens


def _q177_oracle() -> str:
    return f"""
    WITH {minhash_vpairs_cte()},
    src AS (SELECT doc_id, source FROM documents),
    tagged AS (
      SELECT LEAST(a.source, b.source) AS src_lo,
             GREATEST(a.source, b.source) AS src_hi,
             CAST(FLOOR(v.jaccard * 10000 + 0.5) AS BIGINT) AS j4
      FROM vpairs v
      JOIN src a ON a.doc_id = v.doc_a
      JOIN src b ON b.doc_id = v.doc_b
    )
    SELECT src_lo, src_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(j4) AS BIGINT) AS sum_j4,
           CAST(SUM(CASE WHEN src_lo = src_hi THEN 0 ELSE 1 END) AS BIGINT)
             AS cross_source
    FROM tagged
    GROUP BY src_lo, src_hi
    ORDER BY src_lo, src_hi
    """


@query("q177_cross_source_neardup", oracle=_q177_oracle())
def q177_cross_source_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = hot_minhash_pairs(spark, sf_dir)
    src = hot_table(spark, sf_dir, "documents").select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    b = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    # Broadcast the PAIR side, stream the corpus: the verified pair
    # graph is orders of magnitude below the corpus, while (doc_id,
    # source) is corpus-cardinality — broadcasting it would ship the
    # whole documents table to every executor at 100 TB. Each join's
    # output stays pair-sized, so the second hop broadcasts too.
    t1 = a.join(F.broadcast(pairs), "doc_a").select("doc_b", "sa", "jaccard")
    tagged = b.join(F.broadcast(t1), "doc_b").select(
        F.least("sa", "sb").alias("src_lo"),
        F.greatest("sa", "sb").alias("src_hi"),
        F.floor(F.col("jaccard") * 10000 + 0.5).cast("long").alias("j4"),
    )
    return (
        tagged.groupBy("src_lo", "src_hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("j4").cast("long").alias("sum_j4"),
            F.sum(
                F.when(F.col("src_lo") == F.col("src_hi"), 0).otherwise(1)
            ).cast("long").alias("cross_source"),
        )
        .orderBy("src_lo", "src_hi")
    )


def _q178_oracle() -> str:
    return f"""
    WITH clus AS (
      SELECT doc_id, cluster_id FROM ({ORACLE["q40_dedup_clusters"]})
    ), surv AS (
      SELECT cluster_id, survivor_doc
      FROM ({ORACLE["q107_dedup_survivors"]})
    ), dropped AS (
      SELECT c.doc_id
      FROM clus c JOIN surv s USING (cluster_id)
      WHERE c.doc_id <> s.survivor_doc
    ), tk AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                  AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT t.source,
           CAST(COUNT(d.doc_id) AS BIGINT) AS docs_dropped,
           CAST(COALESCE(SUM(CASE WHEN d.doc_id IS NOT NULL
                                  THEN t.n_tokens END), 0) AS BIGINT)
             AS tokens_dropped,
           CAST(SUM(t.n_tokens) AS BIGINT) AS tokens_total
    FROM tk t LEFT JOIN dropped d ON d.doc_id = t.doc_id
    GROUP BY t.source
    ORDER BY t.source
    """


@query("q178_dedup_token_savings", oracle=_q178_oracle())
def q178_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesyslog_spark.queries.cluster import cluster_labels
    from kinesyslog_spark.queries.resolution import q107_dedup_survivors

    clus = cluster_labels(spark, sf_dir).select("doc_id", "cluster_id")
    surv = q107_dedup_survivors(spark, sf_dir).select(
        "cluster_id", "survivor_doc"
    )
    dropped = (
        clus.join(F.broadcast(surv), "cluster_id")
        .filter(F.col("doc_id") != F.col("survivor_doc"))
        .select("doc_id", F.lit(1).alias("_d"))
    )
    docs = hot_table(spark, sf_dir, "documents").select("doc_id", "source")
    tk = (
        hot_tokens(spark, sf_dir)
        .select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(docs, "doc_id")
        .join(F.broadcast(dropped), "doc_id", "left")
    )
    return (
        tk.groupBy("source")
        .agg(
            F.count(F.col("_d")).cast("long").alias("docs_dropped"),
            F.coalesce(
                F.sum(F.when(F.col("_d").isNotNull(), F.col("n_tokens"))),
                F.lit(0),
            ).cast("long").alias("tokens_dropped"),
            F.sum("n_tokens").cast("long").alias("tokens_total"),
        )
        .orderBy("source")
    )


def _q180_oracle() -> str:
    return f"""
    WITH clus AS (
      SELECT doc_id, cluster_id, cluster_size
      FROM ({ORACLE["q40_dedup_clusters"]})
    ), per AS (
      SELECT cluster_id, MAX(cluster_size) AS sz FROM clus GROUP BY cluster_id
    )
    SELECT sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS docs_in_clusters,
           CAST(SUM(sz - 1) AS BIGINT) AS docs_removable
    FROM per
    GROUP BY sz
    ORDER BY sz
    """


@query("q180_cluster_size_spectrum", oracle=_q180_oracle())
def q180_cluster_size_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup report's first chart: how large do near-dup clusters
    get, how many docs sit in clusters, and how many are removable
    (size - 1 per cluster under any one-survivor rule). A heavy tail
    here means boilerplate families that the hot-bucket cap and exact
    dedup should be catching instead — the number that decides whether
    to tighten the LSH threshold before a 100 TB run."""
    from kinesyslog_spark.queries.cluster import cluster_labels

    per = (
        cluster_labels(spark, sf_dir)
        .groupBy("cluster_id")
        .agg(F.max("cluster_size").alias("sz"))
    )
    return (
        per.groupBy("sz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("docs_in_clusters"),
            F.sum(F.col("sz") - 1).cast("long").alias("docs_removable"),
        )
        .select(
            F.col("sz").alias("cluster_size"),
            "n_clusters", "docs_in_clusters", "docs_removable",
        )
        .orderBy("cluster_size")
    )
