"""Giant-component governance (q183/q184): star-verify refinement of
the dedup survivor queries — round-12 verdict task #1.

The load-bearing property: a planted transitive chain A~B, B~C, A!~C
must KEEP both A and C (q182's min-id rule would drop C against a
survivor it is not a near-dup of)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kinesyslog_spark.queries.govern import (
    refine_star_assignments,
    refined_survivor_frame,
)

PAIRS_SCHEMA = "doc_a long, doc_b long, hamming int"


def _pairs(spark, rows):
    return spark.createDataFrame(rows, PAIRS_SCHEMA)


def _clusters(asg):
    out = {}
    for r in asg.collect():
        out.setdefault(r.cluster_id, set()).add(r.doc_id)
    return out


def test_planted_chain_keeps_both_ends(spark):
    """A-B-C chain (A~B, B~C, A!~C): refinement yields {A,B} + {C} —
    both chain ends survive, and C's removal is never certified
    against a non-neighbor."""
    asg = refine_star_assignments(
        _pairs(spark, [(1, 2, 2), (2, 3, 3)])
    )
    assert _clusters(asg) == {1: {1, 2}, 3: {3}}
    stages = {r.doc_id: r.stage for r in asg.collect()}
    assert stages == {1: 1, 2: 1, 3: 0}  # C is singleton fallout
    # every node still maps back to the one original component
    assert {r.orig_cluster_id for r in asg.collect()} == {1}


def test_long_chain_fragments_into_stars(spark):
    """1-2-3-4-5 path: stage 1 takes {1,2}; the evicted residue
    {3,4,5} re-clusters to a star {3,4} + singleton {5}."""
    asg = refine_star_assignments(
        _pairs(spark, [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)])
    )
    assert _clusters(asg) == {1: {1, 2}, 3: {3, 4}, 5: {5}}
    stages = {r.doc_id: r.stage for r in asg.collect()}
    assert stages == {1: 1, 2: 1, 3: 2, 4: 2, 5: 0}


def test_clique_stays_whole(spark):
    """Mutual near-dups (a triangle) are untouched by refinement —
    every member has a direct edge to the min."""
    asg = refine_star_assignments(
        _pairs(spark, [(10, 20, 0), (10, 30, 0), (20, 30, 0)])
    )
    assert _clusters(asg) == {10: {10, 20, 30}}
    assert {r.stage for r in asg.collect()} == {1}


def test_evicted_mutual_dups_regroup(spark):
    """Two docs far from the survivor but near each OTHER must land in
    one stage-2 cluster, not two singletons (the naive star-verify
    fallout would lose their mutual duplication)."""
    # star around 1 = {1,2}; 8 and 9 are adjacent to 2 only, and to
    # each other
    asg = refine_star_assignments(
        _pairs(spark, [(1, 2, 1), (2, 8, 2), (2, 9, 2), (8, 9, 0)])
    )
    assert _clusters(asg) == {1: {1, 2}, 8: {8, 9}}
    stages = {r.doc_id: r.stage for r in asg.collect()}
    assert stages[8] == 2 and stages[9] == 2


def test_survivor_frame_governance_rollup(spark):
    """The per-cluster frame carries the original component and sizes
    so the before/after drop-set arithmetic is one aggregate."""
    out = refined_survivor_frame(
        _pairs(spark, [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)])
    ).collect()
    rows = {r.cluster_id: r for r in out}
    assert set(rows) == {1, 3, 5}
    assert all(r.orig_cluster_id == 1 and r.orig_n_members == 5
               for r in out)
    assert [rows[c].n_members for c in (1, 3, 5)] == [2, 2, 1]
    assert [rows[c].n_removed for c in (1, 3, 5)] == [1, 1, 0]
    assert [rows[c].stage for c in (1, 3, 5)] == [1, 2, 0]
    assert all(r.survivor_doc == r.cluster_id for r in out)
    # governance arithmetic: refined drop-set 2 vs closure drop-set 4
    assert sum(r.n_removed for r in out) == 2


@pytest.mark.slow
def test_refined_drop_set_is_certified(spark, sf_dir):
    """On the real corpus: every removed doc has a DIRECT pair-graph
    edge to its survivor (the star property), and the refined drop-set
    is never larger than q182's closure drop-set."""
    from kinesyslog_spark.queries.simresolve import hot_simhash_pairs

    pairs = hot_simhash_pairs(spark, sf_dir)
    asg = refine_star_assignments(pairs).persist()
    removed = asg.filter(F.col("doc_id") != F.col("cluster_id"))
    edges = pairs.select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("cluster_id")
    ).unionByName(pairs.select(
        F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("cluster_id")
    ))
    uncertified = removed.join(edges, ["doc_id", "cluster_id"], "left_anti")
    assert uncertified.count() == 0
    n_nodes = asg.count()
    n_orig_clusters = asg.select("orig_cluster_id").distinct().count()
    n_final_clusters = asg.select("cluster_id").distinct().count()
    assert n_final_clusters >= n_orig_clusters  # refinement only splits
    assert (n_nodes - n_final_clusters) <= (n_nodes - n_orig_clusters)
    asg.unpersist()
