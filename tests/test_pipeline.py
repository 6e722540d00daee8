"""End-to-end training-data pipeline artifact (pipeline.py + CLI)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kinesyslog_spark.pipeline import run_pipeline
from kinesyslog_spark.queries import QUERIES
from kinesyslog_spark.sinks.partitioned import read_partitioned


@pytest.mark.slow
def test_pipeline_materializes_consistent_artifact(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    stats = run_pipeline(spark, sf_dir, out, n_shards=4)

    table = read_partitioned(spark, out)
    rows = table.collect()
    assert len(rows) == stats["n_kept"] > 0
    assert stats["n_total"] >= stats["n_kept"]

    # kept set == verdict keeps minus non-survivor dup-cluster members
    # (survivor = best q31 quality, tie-break min doc_id — q107's rule)
    verdict = QUERIES["q71_filter_pipeline"](spark, sf_dir)
    keeps = {r.doc_id for r in verdict.filter(F.col("keep") == 1).collect()}
    quality = {
        r.doc_id: r.quality
        for r in QUERIES["q31_quality_score"](spark, sf_dir).collect()
    }
    clusters = QUERIES["q40_dedup_clusters"](spark, sf_dir).collect()
    by_cluster: dict[int, list[int]] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    dup_drops = set()
    for members in by_cluster.values():
        survivor = min(members, key=lambda d: (-quality[d], d))
        dup_drops.update(d for d in members if d != survivor)
    assert {r.doc_id for r in rows} == keeps - dup_drops

    # DSIR weight rides the artifact (q103; 0.0 for featureless docs)
    weights = {
        r.doc_id: r.dsir_weight
        for r in QUERIES["q103_dsir_weights"](spark, sf_dir).collect()
    }
    for r in rows:
        assert r.dsir_weight == weights.get(r.doc_id, 0.0)

    # shard assignment is the q84 curriculum order over the KEPT set
    kept_sorted = sorted(rows, key=lambda r: (r.n_tokens, r.doc_id))
    n = len(kept_sorted)
    for rank, r in enumerate(kept_sorted):
        # NTILE semantics: first (n % 4) shards get ceil(n/4) rows
        big, rem = divmod(n, 4)
        boundary = rank // (big + 1) if rank < (big + 1) * rem else (
            rem + (rank - (big + 1) * rem) // big
        )
        assert r.shard == boundary + 1, (rank, r.shard)

    # partition layout: one directory per shard, hive-style
    import os

    shards = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert shards == {f"shard={r.shard}" for r in rows}


@pytest.mark.slow
def test_pipeline_cli(spark, sf_dir, tmp_path, capsys):
    import json

    from kinesyslog_spark.cli import main

    out = str(tmp_path / "cli_corpus")
    rc = main(["pipeline", out, "--sf-dir", sf_dir, "--shards", "2",
               "--cpus", "4"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_kept"] > 0 and stats["n_shards"] == 2
    assert read_partitioned(spark, out).count() == stats["n_kept"]


def test_explain_cli(spark, sf_dir, capsys):
    from kinesyslog_spark.cli import main

    rc = main(["explain", "q04_customers_per_region", "--sf-dir", sf_dir,
               "--cpus", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "# executed-plan:" in out
    assert main(["explain", "nope", "--sf-dir", sf_dir]) == 2


@pytest.mark.slow
def test_pipeline_exactsubstr_cut_stage(spark, sf_dir, tmp_path):
    """The artifact carries clean_text with ExactSubstr spans computed on
    the SURVIVING set (Lee et al.'s 'within what remains' — spans shared
    only with filtered/deduped-away docs must NOT be cut; round-4 ADVICE
    fix), and the cut totals agree with cut_spans over that set."""
    from kinesyslog_spark.queries.substring import cut_spans
    from kinesyslog_spark.tables import hot_table

    out = str(tmp_path / "corpus_cut")
    stats = run_pipeline(spark, sf_dir, out, n_shards=2)
    table = read_partitioned(spark, out)
    rows = table.select("doc_id", "text", "clean_text",
                        "dup_tokens_cut").collect()
    assert rows and stats["n_tokens_cut"] >= 0
    kept_ids = [r.doc_id for r in rows]
    surviving = hot_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isin(kept_ids)
    )
    expected = {
        r.doc_id: (r.n_tokens - len(r.kept), len(r.kept))
        for r in cut_spans(surviving).collect()
    }
    total_cut = 0
    for r in rows:
        dup, kept_n = expected[r.doc_id]
        assert r.dup_tokens_cut == dup
        assert len(r.clean_text.split()) == (kept_n if kept_n else 0) or (
            r.clean_text == "" and kept_n == 0
        )
        total_cut += r.dup_tokens_cut
    assert stats["n_tokens_cut"] == total_cut
