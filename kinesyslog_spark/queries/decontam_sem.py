"""Q108 — semantic (embedding-space) decontamination: flag corpus
vectors whose cosine similarity to ANY evaluation-set embedding crosses
a threshold. The embedding-space counterpart of q42's n-gram benchmark
decontamination — paraphrased eval items that share no 8-gram still sit
next to their source in embedding space.

Eval set: vec_id % 97 == 0 (the held-out suite); corpus: the rest.
Cosine rounded to 4 dp BEFORE max/count aggregation (the q21 rule), so
both engines aggregate identical values. THR = 0.3 sits at ~p98 of the
corpus max-sim distribution (measured at sf0.01).

Scale notes (100 TB posture): eval suites are small and static (the
q42 argument), so the eval side BROADCASTS into a map-only scoring
pass; the per-vector aggregate combines map-side. The corpus is never
shuffled on a similarity key. Registered late — the frozen 50-query
driver window is untouched.

Reference parity: north-star extension (no reference analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.ann import EMB_DIM, _dot
from kinesyslog_spark.tables import hot_vectors

SEM_EVAL_MOD = 97
SEM_THR = 0.3


def _q108_oracle() -> str:
    dot = f"list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> ev.emb[i] * c.emb[i]))"
    nrm = "sqrt(list_sum(list_transform({v}.emb, x -> x * x)))"
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), ev AS (
      SELECT vec_id, emb FROM e WHERE vec_id % {SEM_EVAL_MOD} = 0
    ), c AS (
      SELECT vec_id, emb FROM e WHERE vec_id % {SEM_EVAL_MOD} <> 0
    ), sims AS (
      SELECT c.vec_id,
             ROUND({dot} / ({nrm.format(v='ev')} * {nrm.format(v='c')}), 4) AS sim
      FROM c CROSS JOIN ev
    )
    SELECT vec_id, MAX(sim) AS max_sim,
           CAST(SUM(CASE WHEN sim >= {SEM_THR} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hits
    FROM sims
    GROUP BY vec_id
    HAVING MAX(sim) >= {SEM_THR}
    ORDER BY vec_id
    """


@query("q108_semantic_decontam", oracle=_q108_oracle())
def q108_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = hot_vectors(spark, sf_dir)  # (vec_id, label, emb, nrm)
    ev = e.filter(F.col("vec_id") % SEM_EVAL_MOD == 0).select(
        F.col("emb").alias("ev_emb"), F.col("nrm").alias("ev_nrm")
    )
    corpus = e.filter(F.col("vec_id") % SEM_EVAL_MOD != 0).select(
        "vec_id", "emb", "nrm"
    )
    sim = F.round(
        _dot(F.col("emb"), F.col("ev_emb")) / (F.col("nrm") * F.col("ev_nrm")), 4
    )
    return (
        corpus.crossJoin(F.broadcast(ev))
        .select("vec_id", sim.alias("sim"))
        .groupBy("vec_id")
        .agg(
            F.max("sim").alias("max_sim"),
            F.sum(F.when(F.col("sim") >= SEM_THR, 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
        )
        .filter(F.col("max_sim") >= SEM_THR)
        .orderBy("vec_id")
    )
