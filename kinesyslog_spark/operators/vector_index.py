"""Persistable IVF vector index — build once at ingest, probe per query.

The session-memoized IVF of `queries/ann.py` rebuilds per Spark session;
a production vector store persists the index as TABLES and lets every
later session (or engine) probe it. This module materializes exactly
that:

- `postings/` — the corpus (vec_id, emb, nrm) PARTITIONED BY list id
  (`cid`): probing nprobe lists reads only those directories — the
  routing decision becomes parquet PartitionFilters, verified by test.
- `centroids/` — one row per list: the coarse centroid vector + list
  size (the stats a query planner needs to budget nprobe).

List assignment is the engine's shared k-means
(`queries/semantic.py:kmeans_assignments` — Lloyd rounds with
scaled-integer determinism), so the index agrees with the q77/q78
clustering surface.

Scale posture (100 TB):
- Build: one k-means pass + one partitioned write (shuffle on cid).
  List sizes are bounded by k-means balance; a skewed list shows up in
  `centroids.n` and can be split by raising k — observable, not silent.
- Search: centroids are list-cardinality (broadcast); the routed list
  ids collect to the driver (nprobe x #probes ints — the planning step
  every vector store runs) and prune the postings scan to the probed
  partitions; within lists the scan is a broadcast-probe cosine + per
  probe top-k, never a corpus shuffle.

Reference parity: none (north-star extension; the reference has no
vector surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(c):
    return F.sqrt(_dot(c, c))


def build_ivf_index(spark: SparkSession, sf_dir: str, path: str,
                    k: int | None = None, iters: int | None = None) -> dict:
    """Materialize the IVF index for `sf_dir`'s embeddings under `path`.

    Returns {"lists": k, "vectors": n} build stats."""
    from kinesyslog_spark.queries.semantic import (
        KMEANS_ITERS,
        KMEANS_K,
        kmeans_assignments,
    )
    from kinesyslog_spark.tables import hot_vectors

    k = KMEANS_K if k is None else k
    iters = KMEANS_ITERS if iters is None else iters
    assigned = kmeans_assignments(spark, sf_dir, k, iters)
    base = hot_vectors(spark, sf_dir)
    postings = base.join(assigned.select("vec_id", "cid"), "vec_id").select(
        "cid", "vec_id", "emb", "nrm"
    )
    postings.write.mode("overwrite").partitionBy("cid").parquet(f"{path}/postings")

    stored = spark.read.parquet(f"{path}/postings")
    cent = (
        stored.select("cid", F.posexplode("emb").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.avg("v").alias("m"), F.count(F.lit(1)).alias("n"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cvec"),
            F.max("n").alias("n"),
        )
    )
    cent.write.mode("overwrite").parquet(f"{path}/centroids")
    n = stored.count()
    return {"lists": k, "vectors": n}


def ivf_search(spark: SparkSession, path: str, probes: DataFrame,
               nprobe: int = 1, topk: int = 5) -> DataFrame:
    """Top-k cosine neighbors from a PERSISTED index.

    `probes` must carry (pid, pemb double[]); returns
    (pid, vec_id, sim, rn) like q35. The postings scan is pruned to the
    routed lists via a literal cid filter (PartitionFilters)."""
    cent = spark.read.parquet(f"{path}/centroids")
    probes = probes.select("pid", "pemb", _norm(F.col("pemb")).alias("pnrm"))
    routed = (
        probes.crossJoin(F.broadcast(cent))
        .select(
            "pid", "pemb", "pnrm", "cid",
            (_dot(F.col("pemb"), F.col("cvec"))
             / (F.col("pnrm") * _norm(F.col("cvec")))).alias("csim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("pid").orderBy(F.desc("csim"), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("pid", "pemb", "pnrm", "cid")
    )
    # Planning step: the routed list ids (nprobe x #probes ints) come to
    # the driver so the scan below carries a LITERAL partition predicate.
    cids = sorted({int(r["cid"]) for r in routed.select("cid").distinct().collect()})
    stored = spark.read.parquet(f"{path}/postings").filter(F.col("cid").isin(cids))
    scanned = (
        stored.join(
            F.broadcast(routed),
            (stored["cid"] == routed["cid"]) & (stored["vec_id"] != routed["pid"]),
        )
        .select(
            "pid", "vec_id",
            F.round(
                _dot(F.col("pemb"), F.col("emb")) / (F.col("pnrm") * F.col("nrm")), 4
            ).alias("sim"),
        )
    )
    w = W.partitionBy("pid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scanned.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= topk)
        .orderBy("pid", "rn")
    )
