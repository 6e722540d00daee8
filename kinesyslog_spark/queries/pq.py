"""q105 — Product-Quantization ANN (Jégou et al. 2011) over the
embedding corpus: split each 64-dim vector into PQ_M subvectors, train
a PQ_K-codeword codebook per subspace with the shared exact-integer
Lloyd machinery (queries/semantic.py), encode the corpus as PQ_M small
codes, and answer top-k by Asymmetric Distance Computation — the probe
computes one distance table per subspace against the codebook, and
every corpus vector is scored by TWO table lookups instead of a 64-dim
distance.

This completes the ANN family's technique coverage: q21 brute-force,
q29/q38 sign-LSH, q35/q47 IVF (+ the persisted IVF index in
operators/vector_index.py), q46 scalar int8 quantization, q105 PQ —
the memory-bound path (a 64-dim float vector becomes PQ_M bytes of
codes; at 100 TB of embeddings the codes fit where the vectors never
could).

Cross-engine float determinism (q77 conventions): all distances are
SUM(FLOOR((x-c)^2 * 1e10 + 0.5)) — exact integer-valued doubles, so
ADC sums and rank orderings are bit-identical on both engines;
centroids quantized to 1e-9 every update (see semantic.py module doc).
Tie-break (ad2, vec_id).

Scale notes (100 TB posture):
- Codebook training: two subspace k-means runs = 2 * (map-only assign +
  one (cid, dim) partial-sum shuffle) per round — the corpus is never
  joined (semantic.py scale note). Codebooks are K*D/M doubles on the
  driver.
- Encoding: map-only against broadcast centroid literals.
- Query: the probe's distance tables are PQ_M * PQ_K doubles — they
  broadcast as literal maps into a map-only scoring pass; per-probe
  top-k ranks via operators/topk.py (Spark 4's WindowGroupLimit keeps
  the shuffle to per-partition survivors, not |corpus| * n_probes
  scored rows). The corpus-side input is the CODES table (PQ_M
  ints/row), not the vectors — PQ's entire point.

Reference parity: north-star extension (no reference analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.operators.topk import topk_per_key
from kinesyslog_spark.queries.ann import N_PROBES
from kinesyslog_spark.queries.semantic import (
    _C_SCALE,
    _D2_SCALE,
    kmeans_assignments,
    kmeans_centroids,
)
from kinesyslog_spark.tables import hot_vectors

PQ_M = 2  # subspaces
PQ_DIM = 64  # embedding dim (asserted against the data at runtime)
PQ_SUBDIM = PQ_DIM // PQ_M
PQ_K = 8  # codewords per subspace
PQ_ITERS = 2  # Lloyd rounds per codebook
PQ_TOPK = 10


def _pq_chain(m: int, k: int, iters: int) -> str:
    """DuckDB CTE chain for subspace m's codebook: s{m}c0 .. s{m}a{iters}
    (mirrors semantic._kmeans_ctes, restricted to the subspace dims)."""
    lo, hi = m * PQ_SUBDIM + 1, (m + 1) * PQ_SUBDIM
    parts = [
        """
    s{m}c0 AS (
      SELECT s.cid, dims.d, FLOOR(dims.x * {cs} + 0.5) / {cs} AS c
      FROM dims JOIN seeds s USING (vec_id)
      WHERE dims.d BETWEEN {lo} AND {hi}
    )""".format(m=m, cs=_C_SCALE, lo=lo, hi=hi)
    ]
    for i in range(1, iters + 1):
        parts.append(
            """
    s{m}a{i} AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT dims.vec_id, c.cid,
               SUM(FLOOR((dims.x - c.c) * (dims.x - c.c) * {ds} + 0.5)) AS d2
        FROM dims JOIN s{m}c{p} c ON dims.d = c.d
        GROUP BY dims.vec_id, c.cid
      ) t
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    )""".format(m=m, i=i, p=i - 1, ds=_D2_SCALE)
        )
        if i < iters:
            parts.append(
                """
    s{m}c{i} AS (
      SELECT a.cid, dims.d,
             FLOOR(SUM(FLOOR(dims.x * {cs} + 0.5)) / COUNT(*) + 0.5) / {cs} AS c
      FROM dims JOIN s{m}a{i} a ON dims.vec_id = a.vec_id
      WHERE dims.d BETWEEN {lo} AND {hi}
      GROUP BY a.cid, dims.d
    )""".format(m=m, i=i, cs=_C_SCALE, lo=lo, hi=hi)
            )
    return ",".join(parts)


def _pq_ctes() -> str:
    """Shared WITH-body: codebooks, codes, probe tables, ADC `scored`."""
    final_c = PQ_ITERS - 1
    return f"""
    v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    dims AS (
      SELECT vec_id, generate_subscripts(emb, 1) AS d, unnest(emb) AS x FROM v
    ),
    seeds AS (
      SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
      FROM (SELECT vec_id FROM v ORDER BY vec_id LIMIT {PQ_K})
    ),
    {_pq_chain(0, PQ_K, PQ_ITERS)},
    {_pq_chain(1, PQ_K, PQ_ITERS)},
    probes AS (
      SELECT vec_id AS pid, d, x FROM dims WHERE vec_id < {N_PROBES}
    ),
    dt0 AS (
      SELECT p.pid, c.cid,
             SUM(FLOOR((p.x - c.c) * (p.x - c.c) * {_D2_SCALE} + 0.5)) AS pd2
      FROM probes p JOIN s0c{final_c} c ON p.d = c.d
      GROUP BY p.pid, c.cid
    ),
    dt1 AS (
      SELECT p.pid, c.cid,
             SUM(FLOOR((p.x - c.c) * (p.x - c.c) * {_D2_SCALE} + 0.5)) AS pd2
      FROM probes p JOIN s1c{final_c} c ON p.d = c.d
      GROUP BY p.pid, c.cid
    ),
    scored AS (
      SELECT dt0.pid, a0.vec_id, dt0.pd2 + dt1.pd2 AS ad2
      FROM s0a{PQ_ITERS} a0
      JOIN s1a{PQ_ITERS} a1 ON a0.vec_id = a1.vec_id
      JOIN dt0 ON dt0.cid = a0.cid
      JOIN dt1 ON dt1.cid = a1.cid AND dt1.pid = dt0.pid
    )"""


def _q105_oracle() -> str:
    return f"""
    WITH {_pq_ctes()}
    SELECT pid, vec_id, ad2, rank FROM (
      SELECT pid, vec_id, ad2,
             CAST(ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ad2, vec_id)
                  AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= {PQ_TOPK}
    ORDER BY pid, rank
    """


def _adc_map(cents: list[tuple[int, list[float]]], lo: int):
    """Literal map cid -> exact scaled d2(probe_subvector, centroid)."""
    sub = F.slice("emb", lo, PQ_SUBDIM)
    keys, vals = [], []
    for cid, cent in cents:
        arr = F.array(*[F.lit(float(c)) for c in cent])
        terms = F.zip_with(
            sub, arr,
            lambda x, c: F.floor((x - c) * (x - c) * F.lit(_D2_SCALE) + F.lit(0.5)),
        )
        keys.append(F.lit(cid))
        vals.append(F.aggregate(terms, F.lit(0.0), lambda a, x: a + x))
    return F.map_from_arrays(F.array(*keys), F.array(*vals))


@query("q105_pq_ann", oracle=_q105_oracle())
def q105_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = hot_vectors(spark, sf_dir)
    codes, dts = None, []
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
        dts.append((_adc_map(cents, lo), lo))
    probes = e.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"),
        *[dt.alias(f"dt{m}") for m, (dt, _) in enumerate(dts)],
    )
    ad2 = sum(
        F.element_at(f"dt{m}", F.col(f"c{m}")) for m in range(PQ_M)
    )
    scored = (
        codes.crossJoin(F.broadcast(probes))
        .select("pid", "vec_id", ad2.alias("ad2"))
    )
    # Ranked via operators/topk.py — WindowGroupLimit keeps the ranking
    # shuffle to per-partition survivors, not |corpus| * probes rows.
    return (
        topk_per_key(
            scored, "pid", [F.asc("ad2"), F.asc("vec_id")], PQ_TOPK,
            rank_col="rank",
        )
        .withColumn("rank", F.col("rank").cast("long"))
        .orderBy("pid", "rank")
    )


# ---------------------------------------------------------------------------
# Q106 — PQ recall@k against the exact L2 ground truth. The standard ANN
# quality gate: how many of the true top-k does ADC-over-codes recover?
# Exact side reuses the brute-force broadcast-probe shape (q21) with the
# same integer-exact distances, so ground truth is deterministic too.
# ---------------------------------------------------------------------------


def _q106_oracle() -> str:
    return f"""
    WITH {_pq_ctes()},
    exd AS (
      SELECT p.pid, d.vec_id,
             SUM(FLOOR((p.x - d.x) * (p.x - d.x) * {_D2_SCALE} + 0.5)) AS d2
      FROM probes p JOIN dims d ON p.d = d.d
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
      SELECT pid, vec_id FROM (
        SELECT pid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ad2, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {PQ_TOPK}
    )
    SELECT ex.pid,
           CAST(COUNT(pqk.vec_id) AS BIGINT) AS n_overlap,
           CAST(COUNT(pqk.vec_id) AS DOUBLE) / {PQ_TOPK} AS recall
    FROM ex LEFT JOIN pqk ON ex.pid = pqk.pid AND ex.vec_id = pqk.vec_id
    GROUP BY ex.pid
    ORDER BY ex.pid
    """


@query("q106_pq_recall", oracle=_q106_oracle())
def q106_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .select("pid", "vec_id", d2.alias("d2")),
        "pid", [F.asc("d2"), F.asc("vec_id")], PQ_TOPK,
    ).select("pid", "vec_id")
    pqk = q105_pq_ann(spark, sf_dir).select("pid", "vec_id", F.lit(1).alias("hit"))
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


# ---------------------------------------------------------------------------
# Q120 — nDCG@5 of the IVF ranking against the exact cosine ground
# truth: the graded complement of q106's recall@k (recall says WHETHER
# true neighbors were found; nDCG says whether they landed in the right
# ORDER). Graded gain = 6 - exact_rank for vectors in the exact top-5,
# 0 otherwise; position discounts 1/log2(p+1) are FIXED 6-dp decimal
# literals on both engines, so every DCG is an exact decimal sum and
# the only double step is the final normalized ratio (floor-quantized).
# Composed from the q21/q35 plans and oracles (the q71 pattern).
# ---------------------------------------------------------------------------

_DCG_W = ("1.0", "0.63093", "0.5", "0.430677", "0.386853")  # 1/log2(p+1), 6dp
_IDCG = "10.271927"  # sum((6-p) * w_p), exact decimal


def _q120_oracle() -> str:
    from kinesyslog_spark.queries import ORACLE

    wvals = ", ".join(f"CAST({w} AS DECIMAL(8,6))" for w in _DCG_W)
    return f"""
    WITH ex AS (
      SELECT pid, vec_id, rn FROM ({ORACLE["q21_cosine_topk"]})
    ), iv AS (
      SELECT pid, vec_id, rn FROM ({ORACLE["q35_ann_ivf_topk"]})
    ), w AS (
      SELECT unnest(range(1, 6)) AS p, unnest([{wvals}]) AS wp
    ), g AS (
      SELECT iv.pid, iv.rn AS p,
             CAST(COALESCE(6 - ex.rn, 0) AS DECIMAL(8,0)) AS gain
      FROM iv LEFT JOIN ex ON iv.pid = ex.pid AND iv.vec_id = ex.vec_id
    )
    SELECT g.pid,
           CAST(SUM(g.gain * w.wp) AS DOUBLE) AS dcg,
           FLOOR(CAST(SUM(g.gain * w.wp) AS DOUBLE) / {_IDCG}
                 * 10000 + 0.5) / 10000 AS ndcg
    FROM g JOIN w ON w.p = g.p
    GROUP BY g.pid
    ORDER BY g.pid
    """


@query("q120_ndcg_ivf", oracle=_q120_oracle())
def q120_ndcg_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesyslog_spark.queries.ann import q35_ann_ivf_topk
    from kinesyslog_spark.queries.llm import q21_cosine_topk

    ex = q21_cosine_topk(spark, sf_dir).select(
        "pid", "vec_id", F.col("rn").alias("ex_rn")
    )
    iv = q35_ann_ivf_topk(spark, sf_dir).select("pid", "vec_id", "rn")
    wp = F.lit(None).cast("decimal(8,6)")
    for p, w in enumerate(_DCG_W, start=1):
        wp = F.when(F.col("rn") == p, F.lit(w).cast("decimal(8,6)")).otherwise(wp)
    gain = F.coalesce(F.lit(6) - F.col("ex_rn"), F.lit(0)).cast("decimal(8,0)")
    scored = (
        iv.join(ex, ["pid", "vec_id"], "left")
        .select("pid", (gain * wp).alias("contrib"))
    )
    dcg = F.sum("contrib").cast("double")
    return (
        scored.groupBy("pid")
        .agg(
            dcg.alias("dcg"),
            (F.floor(dcg / float(_IDCG) * 10000 + F.lit(0.5)) / 10000)
            .alias("ndcg"),
        )
        .orderBy("pid")
    )
