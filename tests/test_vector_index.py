"""Persisted IVF index (operators/vector_index.py): build artifacts,
partition-pruned probing, and exact parity with an independent
numpy-computed answer over the routed lists."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from kinesyslog_spark.operators.vector_index import build_ivf_index, ivf_search
from kinesyslog_spark.plans.checks import facts
from kinesyslog_spark.tables import hot_vectors

NPROBE = 2
TOPK = 5


def _build(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ivf")
    stats = build_ivf_index(spark, sf_dir, path)
    return path, stats


def _probes(spark, sf_dir, n=3):
    return (
        hot_vectors(spark, sf_dir)
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("pid"), F.col("emb").alias("pemb"))
    )


def test_build_artifacts(spark, sf_dir, tmp_path):
    path, stats = _build(spark, sf_dir, tmp_path)
    post = spark.read.parquet(f"{path}/postings")
    cent = spark.read.parquet(f"{path}/centroids")
    assert stats["vectors"] == post.count() > 0
    assert cent.count() <= stats["lists"]
    # every vector in exactly one list; centroid dims match embedding dims
    assert post.select("vec_id").distinct().count() == post.count()
    dim = len(post.select("emb").head()["emb"])
    assert len(cent.select("cvec").head()["cvec"]) == dim
    assert cent.filter(F.col("n") <= 0).count() == 0


def test_search_matches_numpy_over_routed_lists(spark, sf_dir, tmp_path):
    path, _ = _build(spark, sf_dir, tmp_path)
    probes = _probes(spark, sf_dir)
    got = ivf_search(spark, path, probes, nprobe=NPROBE, topk=TOPK).collect()

    post = spark.read.parquet(f"{path}/postings").collect()
    cent = spark.read.parquet(f"{path}/centroids").collect()
    pr = {r["pid"]: np.array(r["pemb"]) for r in probes.collect()}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    for pid, pv in pr.items():
        ranked = sorted(
            ((cos(pv, np.array(c["cvec"])), c["cid"]) for c in cent),
            key=lambda t: (-t[0], t[1]),
        )
        lists = {cid for _, cid in ranked[:NPROBE]}
        cands = [
            (round(cos(pv, np.array(r["emb"])), 4), r["vec_id"])
            for r in post
            if r["cid"] in lists and r["vec_id"] != pid
        ]
        expect = sorted(cands, key=lambda t: (-t[0], t[1]))[:TOPK]
        mine = [(r["sim"], r["vec_id"]) for r in got if r["pid"] == pid]
        assert len(mine) == TOPK
        for (es, ev), (gs, gv) in zip(expect, mine):
            assert ev == gv and math.isclose(es, gs, abs_tol=1e-9), (
                pid, expect, mine
            )


def test_search_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    path, _ = _build(spark, sf_dir, tmp_path)
    probes = _probes(spark, sf_dir, n=1)
    df = ivf_search(spark, path, probes, nprobe=1, topk=TOPK)
    f = facts(df)
    pf = f.partition_filters("postings")
    assert pf and any("cid" in p for p in pf), (
        f"postings scan must carry a cid PartitionFilter:\n{f.text[:800]}"
    )
    assert "CartesianProduct" not in f.text
