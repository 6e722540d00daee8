"""W26: continuous vector-index ingestion (streaming/vecingest.py) —
streamed (list, codes) rows must be bit-identical to the batch
artifacts: PQ codes equal `kmeans_assignments` re-encode, coarse
routing equals an independent pure-Python nearest-centroid pass."""

from __future__ import annotations

import math
import os
import time
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from kinesyslog_spark.queries.pq import PQ_ITERS, PQ_K, PQ_M, PQ_SUBDIM
from kinesyslog_spark.queries.semantic import kmeans_assignments, kmeans_centroids
from kinesyslog_spark.streaming.vecingest import streaming_index_ingest
from kinesyslog_spark.tables import hot_vectors

N_INGEST = 40  # vectors streamed in the replay test


def _artifacts(spark, sf_dir):
    e = hot_vectors(spark, sf_dir)
    books = []
    for m in range(PQ_M):
        sub = e.select(
            "vec_id", F.slice("emb", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("emb")
        )
        books.append(
            kmeans_centroids(spark, sf_dir, PQ_K, PQ_ITERS, base=sub, tag=f"pq{m}")
        )
    coarse = [
        (r["label"], list(r["cvec"]))
        for r in e.select("label", F.posexplode("emb").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cvec")
        )
        .collect()
    ]
    return sorted(coarse), books


def _route_reference(sf_dir, coarse):
    """Independent nearest-coarse-centroid pass (pure Python)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q4 = Decimal("0.0001")
    out = {}
    for vid, emb in zip(
        t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()
    ):
        if vid >= N_INGEST:
            continue
        e = [float(v) for v in emb]
        nrm = math.sqrt(sum(x * x for x in e))
        best = None
        for lab, c in coarse:
            dot = 0.0
            for x, cc in zip(e, c):
                dot += x * cc
            cn = math.sqrt(sum(cc * cc for cc in c))
            sim = float(
                Decimal(dot / (nrm * cn)).quantize(q4, rounding=ROUND_HALF_UP)
            )
            cand = (-sim, lab)
            if best is None or cand < best:
                best = cand
        out[vid] = best[1]
    return out


def test_streaming_ingest_matches_batch(spark, sf_dir, tmp_path):
    coarse, books = _artifacts(spark, sf_dir)
    e = hot_vectors(spark, sf_dir)

    # batch truth: PQ codes from the shared k-means machinery
    batch_codes = {}
    for m in range(PQ_M):
        sub = e.select(
            "vec_id", F.slice("emb", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("emb")
        )
        for r in kmeans_assignments(
            spark, sf_dir, PQ_K, PQ_ITERS, base=sub, tag=f"pq{m}"
        ).collect():
            batch_codes.setdefault(r["vec_id"], {})[m] = r["cid"]
    route_ref = _route_reference(sf_dir, coarse)

    # stream the first N_INGEST vectors through the ingest operator
    in_dir = str(tmp_path / "emb_in")
    os.makedirs(in_dir)
    e.filter(F.col("vec_id") < N_INGEST).select("vec_id", "emb").coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema("vec_id long, emb array<double>").parquet(in_dir)
    q = (
        streaming_index_ingest(stream, coarse, books, PQ_SUBDIM)
        .writeStream.format("memory")
        .queryName("vecingest_sink")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline and len(rows) < N_INGEST:
            rows = spark.sql("SELECT * FROM vecingest_sink").collect()
            time.sleep(0.5)
        assert len(rows) == N_INGEST
        for r in rows:
            vid = r["vec_id"]
            assert r["list_label"] == route_ref[vid], f"routing differs at {vid}"
            for m in range(PQ_M):
                assert r[f"c{m}"] == batch_codes[vid][m], (
                    f"code {m} differs at {vid}"
                )
    finally:
        q.stop()
