"""Q148 — hard-negative mining for contrastive embedding training.

The pair-construction op an embedding-model pipeline runs over its
corpus: for each anchor, the POSITIVE is the nearest neighbor sharing
its label, and the HARD NEGATIVE is the nearest neighbor with a
DIFFERENT label — the pair whose margin (pos_sim - neg_sim) the
training loss pushes apart. Low/negative margin = the pair worth
mining (the "hard" in hard negatives).

Spark shape (scale lens): anchors are a bounded probe set that
BROADCASTS into one scan of the corpus (the q21 posture — at 100 TB
the anchor batch rides the fact scan, never a shuffle of the corpus);
the per-anchor per-class top-1 is a WindowGroupLimit rank<=1 window
keyed (anchor, is_same_label), so the map-side top-k filter runs
before the exchange. In a full training job the anchor set sweeps the
corpus in batches; each batch is this exact plan.

Determinism: cosine ROUND(x, 4) before ranking, ties by vec_id; the
margin is a difference of two round-4 doubles, rounded again to 4.

Reference parity: none (training-data-ops family; composes with
q21/q35 search and q77's label clustering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.llm import EMB_DIM
from kinesyslog_spark.tables import hot_vectors

HN_ANCHORS = 12  # anchor probe batch (vec_id < this)

_DOT = "list_sum(list_transform(range(1, {d}), i -> {a}[i] * {b}[i]))"

_Q148_ORACLE = f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
), a AS (
  SELECT vec_id AS aid, label AS alabel, emb AS aemb
  FROM e WHERE vec_id < {HN_ANCHORS}
), pairs AS (
  SELECT a.aid, a.alabel, e.vec_id, e.label,
         CASE WHEN e.label = a.alabel THEN 1 ELSE 0 END AS same_label,
         ROUND({_DOT.format(d=EMB_DIM + 1, a='a.aemb', b='e.emb')}
           / (sqrt({_DOT.format(d=EMB_DIM + 1, a='a.aemb', b='a.aemb')})
              * sqrt({_DOT.format(d=EMB_DIM + 1, a='e.emb', b='e.emb')})),
           4) AS sim
  FROM a CROSS JOIN e
  WHERE e.vec_id <> a.aid
), best AS (
  SELECT aid, alabel, vec_id, same_label, sim,
         ROW_NUMBER() OVER (PARTITION BY aid, same_label
                            ORDER BY sim DESC, vec_id) AS rn
  FROM pairs
), pos AS (
  SELECT aid, alabel, vec_id AS pos_id, sim AS pos_sim
  FROM best WHERE same_label = 1 AND rn = 1
), neg AS (
  SELECT aid, vec_id AS neg_id, sim AS neg_sim
  FROM best WHERE same_label = 0 AND rn = 1
)
SELECT CAST(p.aid AS BIGINT) AS anchor_id, p.alabel AS anchor_label,
       CAST(p.pos_id AS BIGINT) AS pos_id, p.pos_sim,
       CAST(n.neg_id AS BIGINT) AS neg_id, n.neg_sim,
       ROUND(p.pos_sim - n.neg_sim, 4) AS margin,
       CAST(CASE WHEN n.neg_sim >= p.pos_sim THEN 1 ELSE 0 END AS INTEGER)
         AS is_hard
FROM pos p JOIN neg n ON n.aid = p.aid
ORDER BY anchor_id
"""


@query("q148_hard_negatives", oracle=_Q148_ORACLE)
def q148_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = hot_vectors(spark, sf_dir)
    anchors = emb.filter(F.col("vec_id") < HN_ANCHORS).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("alabel"),
        F.col("emb").alias("aemb"),
        F.col("nrm").alias("anrm"),
    )
    dot = F.aggregate(
        F.zip_with("aemb", "emb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("aid"))
        .select(
            "aid", "alabel", "vec_id",
            (F.col("label") == F.col("alabel")).cast("int")
            .alias("same_label"),
            F.round(dot / (F.col("anrm") * F.col("nrm")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("aid", "same_label").orderBy(
        F.desc("sim"), "vec_id"
    )
    best = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    pos = best.filter(F.col("same_label") == 1).select(
        "aid", "alabel",
        F.col("vec_id").alias("pos_id"), F.col("sim").alias("pos_sim"),
    )
    neg = best.filter(F.col("same_label") == 0).select(
        F.col("aid").alias("aid2"),
        F.col("vec_id").alias("neg_id"), F.col("sim").alias("neg_sim"),
    )
    return (
        pos.join(F.broadcast(neg), F.col("aid") == F.col("aid2"))
        .select(
            F.col("aid").cast("long").alias("anchor_id"),
            F.col("alabel").alias("anchor_label"),
            F.col("pos_id").cast("long").alias("pos_id"),
            "pos_sim",
            F.col("neg_id").cast("long").alias("neg_id"),
            "neg_sim",
            F.round(F.col("pos_sim") - F.col("neg_sim"), 4).alias("margin"),
            (F.col("neg_sim") >= F.col("pos_sim")).cast("int")
            .alias("is_hard"),
        )
        .orderBy("anchor_id")
    )
