"""Q143 — IVF-PQ: coarse list routing + asymmetric-distance scoring
over PQ codes (the production vector-index shape — FAISS `IVFPQ` with
by_residual=false).

Composition of the two halves the registry already proves separately:
q35/q47's IVF routing (probe -> nprobe nearest coarse centroids,
scan only those lists) and q105's product quantization (corpus stored
as PQ_M one-byte codes, probes scored by two table lookups). Together
they are the memory-bound AND compute-bound answer at 100 TB: the
index holds codes-partitioned-by-list — a 64-dim float vector becomes
PQ_M bytes living in exactly one list partition — and a query touches
nprobe lists' codes with a broadcast distance table, never a vector.

Plan shape: the coarse-centroid table and the probes' ADC tables
(PQ_M x PQ_K doubles per probe) broadcast; the corpus-side work is one
map-side scoring pass over the routed lists' code rows plus the
per-probe top-k (WindowGroupLimit). The list join (codes ⋈ labels) is
the one-time index build, session-memoized like the IVF centroids.

Determinism: routing replays q35's ROUND(cos,4) + label tie-break;
ADC replays q105's exact-integer scaled distances — both engines walk
bit-identical numbers end to end. The oracle composes the same two
proven CTE bodies.

Reference parity: north-star extension (no reference analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesyslog_spark.operators.topk import topk_per_key
from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.ann import (
    _ORACLE_DOT,
    N_PROBES,
    _dot,
    _ivf_centroids,
    _norm,
)
from kinesyslog_spark.queries.pq import (
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    PQ_ITERS,
    PQ_TOPK,
    _adc_map,
    _pq_ctes,
)
from kinesyslog_spark.queries.semantic import _D2_SCALE
from kinesyslog_spark.queries.semantic import kmeans_assignments, kmeans_centroids
from kinesyslog_spark.tables import hot_vectors

IVFPQ_NPROBE = 2


def _q143_oracle() -> str:
    dot_pc = _ORACLE_DOT.format(a="p.emb", b="c.cvec")
    return f"""
    WITH {_pq_ctes()},
    el AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
    ), cpos AS (
      SELECT label, i.i AS pos, emb[i.i] AS v
      FROM el CROSS JOIN (SELECT unnest(range(1, {PQ_SUBDIM * PQ_M + 1})) AS i) i
    ), cent AS (
      SELECT label, list(m ORDER BY pos) AS cvec
      FROM (SELECT label, pos, avg(v) AS m FROM cpos GROUP BY label, pos)
      GROUP BY label
    ), pfull AS (
      SELECT vec_id AS pid, emb FROM el WHERE vec_id < {N_PROBES}
    ), routed AS (
      SELECT pid, target_label FROM (
        SELECT p.pid, c.label AS target_label,
               ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY
                 ROUND({dot_pc} / (sqrt(list_sum(list_transform(p.emb, v -> v*v)))
                   * sqrt(list_sum(list_transform(c.cvec, v -> v*v)))), 4) DESC,
                 c.label) AS rn
        FROM pfull p CROSS JOIN cent c
      ) WHERE rn <= {IVFPQ_NPROBE}
    ), cand AS (
      SELECT r.pid, el.vec_id
      FROM routed r
      JOIN el ON el.label = r.target_label AND el.vec_id <> r.pid
    ), ivfscored AS (
      SELECT c.pid, c.vec_id, s.ad2
      FROM cand c
      JOIN scored s ON s.pid = c.pid AND s.vec_id = c.vec_id
    )
    SELECT pid, vec_id, ad2, rank FROM (
      SELECT pid, vec_id, ad2,
             CAST(ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ad2, vec_id)
                  AS BIGINT) AS rank
      FROM ivfscored
    ) WHERE rank <= {PQ_TOPK}
    ORDER BY pid, rank
    """


@query("q143_ivfpq_topk", oracle=_q143_oracle())
def q143_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = hot_vectors(spark, sf_dir)

    # index build (session-memoized halves): PQ codes per vector +
    # per-subspace codebooks; list partitioning comes from `label`.
    codes = None
    dts = []
    for m in range(PQ_M):
        lo = m * PQ_SUBDIM + 1
        sub_base = e.select("vec_id", F.slice("emb", lo, PQ_SUBDIM).alias("emb"))
        cm = kmeans_assignments(
            spark, sf_dir, PQ_K, PQ_ITERS, base=sub_base, tag=f"pq{m}"
        ).select("vec_id", F.col("cid").alias(f"c{m}"))
        codes = cm if codes is None else codes.join(cm, "vec_id")
        cents = kmeans_centroids(
            spark, sf_dir, PQ_K, PQ_ITERS, base=sub_base, tag=f"pq{m}"
        )
        dts.append(_adc_map(cents, lo))
    listed = codes.join(e.select("vec_id", "label"), "vec_id")

    # query: route probes on the broadcast coarse centroids (q35), carry
    # their ADC tables, scan only the routed lists' CODES.
    cent = _ivf_centroids(spark, sf_dir)
    probes = e.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"),
        F.col("emb").alias("pemb"),
        F.col("nrm").alias("pnrm"),
        *[dt.alias(f"dt{m}") for m, dt in enumerate(dts)],
    )
    routed = (
        probes.crossJoin(F.broadcast(cent))
        .select(
            "pid",
            *[f"dt{m}" for m in range(PQ_M)],
            F.col("label").alias("target_label"),
            F.round(
                _dot(F.col("pemb"), F.col("cvec"))
                / (F.col("pnrm") * _norm(F.col("cvec"))),
                4,
            ).alias("csim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("pid").orderBy(F.desc("csim"), F.asc("target_label"))
            ),
        )
        .filter(F.col("rn") <= IVFPQ_NPROBE)
        .select("pid", *[f"dt{m}" for m in range(PQ_M)], "target_label")
    )
    ad2 = sum(F.element_at(f"dt{m}", F.col(f"c{m}")) for m in range(PQ_M))
    scored = listed.join(
        F.broadcast(routed),
        (listed["label"] == routed["target_label"])
        & (listed["vec_id"] != routed["pid"]),
    ).select("pid", "vec_id", ad2.alias("ad2"))
    return (
        topk_per_key(
            scored, "pid", [F.asc("ad2"), F.asc("vec_id")], PQ_TOPK,
            rank_col="rank",
        )
        .withColumn("rank", F.col("rank").cast("long"))
        .orderBy("pid", "rank")
    )


# ---------------------------------------------------------------------------
# Q144 — IVF-PQ recall@k against the exact (non-self) L2 ground truth:
# the quality gate for the composed index, as q106 gates PQ alone. The
# routing loss (neighbors living outside the nprobe lists) now shows up
# in the recall number — the knob IVF tuning actually turns.
# ---------------------------------------------------------------------------


def _q144_oracle() -> str:
    return f"""
    WITH {_pq_ctes()},
    exd AS (
      SELECT p.pid, d.vec_id,
             SUM(FLOOR((p.x - d.x) * (p.x - d.x) * {_D2_SCALE} + 0.5)) AS d2
      FROM probes p JOIN dims d ON p.d = d.d AND d.vec_id <> p.pid
      GROUP BY p.pid, d.vec_id
    ),
    ex AS (
      SELECT pid, vec_id FROM (
        SELECT pid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d2, vec_id) AS rn
        FROM exd
      ) WHERE rn <= {PQ_TOPK}
    ),
    pqk AS (
      SELECT pid, vec_id FROM ({_q143_oracle()})
    )
    SELECT ex.pid,
           CAST(COUNT(pqk.vec_id) AS BIGINT) AS n_overlap,
           CAST(COUNT(pqk.vec_id) AS DOUBLE) / {PQ_TOPK} AS recall
    FROM ex LEFT JOIN pqk ON ex.pid = pqk.pid AND ex.vec_id = pqk.vec_id
    GROUP BY ex.pid
    ORDER BY ex.pid
    """


@query("q144_ivfpq_recall", oracle=_q144_oracle())
def q144_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = hot_vectors(spark, sf_dir)
    probes = e.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"), F.col("emb").alias("pemb")
    )
    d2 = F.aggregate(
        F.zip_with(
            "pemb", "emb",
            lambda x, y: F.floor((x - y) * (x - y) * F.lit(_D2_SCALE) + F.lit(0.5)),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    exact = topk_per_key(
        e.select("vec_id", "emb")
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("pid"))
        .select("pid", "vec_id", d2.alias("d2")),
        "pid", [F.asc("d2"), F.asc("vec_id")], PQ_TOPK,
    ).select("pid", "vec_id")
    pqk = q143_ivfpq_topk(spark, sf_dir).select(
        "pid", "vec_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(pqk, ["pid", "vec_id"], "left_outer")
        .groupBy("pid")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_overlap"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double") / PQ_TOPK
            ).alias("recall"),
        )
        .orderBy("pid")
    )
