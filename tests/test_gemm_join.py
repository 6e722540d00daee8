"""Blocked-GEMM exact similarity join (q38/q78 kernels) — block
invariance and cross-block coverage.

The oracle gate runs at sf0.01, where the whole corpus fits ONE
2048-row block, so the multi-block path (hash-assigned blocks, pair
canonicalization when a cross-block pair arrives with the larger id on
the a-side) is never driver-exercised. These tests force many tiny
blocks over the same data and pin the results equal to the
single-block run — a partitioning choice must never change an EXACT
join's output. (The canonicalization bug this pins: blocks are
hash-assigned, so ~half of all cross-block pairs arrive id-reversed;
dropping them loses pairs silently.)"""

from __future__ import annotations

import pytest


def _q38_rows(spark, sf_dir):
    from kinesyslog_spark.queries import QUERIES

    return sorted(
        (r.vec_a, r.vec_b, r.sim)
        for r in QUERIES["q38_embedding_neardup"](spark, sf_dir).collect()
    )


def test_q38_block_partitioning_invariance(spark, sf_dir, monkeypatch):
    import kinesyslog_spark.queries.ann as ann

    single = _q38_rows(spark, sf_dir)  # default block: one block at test SF
    monkeypatch.setattr(ann, "_Q38_BLOCK", 16)  # force many blocks
    multi = _q38_rows(spark, sf_dir)
    assert multi == single
    assert len(single) > 0  # the corpus plants near-dup vectors


def _q78_rows(spark, sf_dir):
    from kinesyslog_spark.queries import QUERIES

    return sorted(
        (r.vec_a, r.vec_b, r.cluster_id, r.sim)
        for r in QUERIES["q78_semantic_neardup"](spark, sf_dir).collect()
    )


def test_q78_block_partitioning_invariance(spark, sf_dir, monkeypatch):
    # q78 tiles each k-means cluster with the same hash-block machinery
    # (block count sized off the largest cluster); forcing tiny blocks
    # must not change the exact verify's output — including cross-block
    # pairs arriving id-reversed.
    import kinesyslog_spark.queries.ann as ann

    single = _q78_rows(spark, sf_dir)  # default block: one block at test SF
    monkeypatch.setattr(ann, "_Q38_BLOCK", 4)  # force many blocks per cluster
    multi = _q78_rows(spark, sf_dir)
    assert multi == single
    assert len(single) > 0
    assert all(a < b for a, b, _, _ in multi)


def test_q38_cross_block_pairs_survive_id_reversal(spark, sf_dir, monkeypatch):
    # With 2-row blocks nearly every matching pair is cross-block, and
    # hash assignment puts the larger id on the a-side for ~half of
    # them; all must still appear, canonicalized to vec_a < vec_b.
    import kinesyslog_spark.queries.ann as ann

    single = _q38_rows(spark, sf_dir)
    monkeypatch.setattr(ann, "_Q38_BLOCK", 2)
    multi = _q38_rows(spark, sf_dir)
    assert multi == single
    assert all(a < b for a, b, _ in multi)
