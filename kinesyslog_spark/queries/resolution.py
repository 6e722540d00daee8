"""Q107 — dedup resolution: one survivor per near-dup cluster (the step
after q40's clustering — keep the best-quality member, drop the rest).
Registered late so the frozen 50-query driver window is untouched
(tests/test_registry_window.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.cluster import q40_dedup_clusters


# ---------------------------------------------------------------------------
# Q107 — dedup resolution: one survivor per near-dup cluster. The step
# AFTER clustering — each cluster keeps its best-quality member (q31's
# score; tie-break min doc_id) and reports how many copies it removed.
# Composed from the same component plans as its oracle is from the
# component oracles (the q71 composition pattern), so the pair graph,
# the clustering, and the quality scores are definitionally shared.
#
# Scale: adds one doc_id hash join (clustered docs x quality) and one
# window over cluster_id on top of q40 — both bounded by the CLUSTERED
# population, which is orders of magnitude below the corpus.
# ---------------------------------------------------------------------------


def _q107_oracle() -> str:
    from kinesyslog_spark.queries import ORACLE

    return f"""
    WITH clus AS (
      SELECT doc_id, cluster_id, cluster_size FROM ({ORACLE["q40_dedup_clusters"]})
    ), qual AS (
      SELECT doc_id, quality FROM ({ORACLE["q31_quality_score"]})
    )
    SELECT cluster_id, survivor_doc, survivor_quality, n_members, n_removed
    FROM (
      SELECT c.cluster_id, c.doc_id AS survivor_doc, q.quality AS survivor_quality,
             c.cluster_size AS n_members, c.cluster_size - 1 AS n_removed,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.quality DESC, c.doc_id) AS rn
      FROM clus c JOIN qual q USING (doc_id)
    ) WHERE rn = 1
    ORDER BY cluster_id
    """


@query("q107_dedup_survivors", oracle=_q107_oracle())
def q107_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesyslog_spark.queries.llm import q31_quality_score

    clusters = q40_dedup_clusters(spark, sf_dir)
    qual = q31_quality_score(spark, sf_dir).select("doc_id", "quality")
    w = W.partitionBy("cluster_id").orderBy(F.desc("quality"), "doc_id")
    return (
        clusters.join(qual, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("survivor_doc"),
            F.col("quality").alias("survivor_quality"),
            F.col("cluster_size").alias("n_members"),
            (F.col("cluster_size") - 1).alias("n_removed"),
        )
        .orderBy("cluster_id")
    )
