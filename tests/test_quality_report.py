"""quality-report artifact (report.py:quality_report + CLI)."""

from __future__ import annotations


def test_quality_report_artifacts(spark, sf_dir, tmp_path):
    from kinesyslog_spark.report import quality_report

    out = str(tmp_path / "quality")
    summary = quality_report(spark, sf_dir, out)
    assert summary["tables"] == {
        "constraints": spark.read.parquet(f"{out}/constraints").count(),
        "group_cardinality": spark.read.parquet(
            f"{out}/group_cardinality"
        ).count(),
    }
    assert summary["checks_total"] == 9
    assert summary["checks_passed"] == summary["checks_total"]
    assert summary["all_passed"] is True
    assert summary["checks_failing"] == []
    assert summary["hll_merge_identical"] is True


def test_quality_report_cli(spark, sf_dir, tmp_path, capsys):
    import json

    from kinesyslog_spark.cli import main

    out = str(tmp_path / "qr")
    rc = main(["quality-report", out, "--sf-dir", sf_dir])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["all_passed"] is True


def test_training_report_artifacts(spark, sf_dir, tmp_path):
    from kinesyslog_spark.report import training_report

    out = str(tmp_path / "training")
    s = training_report(spark, sf_dir, out)
    assert set(s["tables"]) == {
        "split_leakage", "cluster_split", "cdc_dedup", "classifier_gd",
        "calibration", "auc", "split_auc", "spectrum", "benford",
        "snapshot_diff",
    }
    assert 0.0 <= s["auc_train"] <= 1.0
    assert 0.0 <= s["auc_heldout"] <= 1.0
    assert s["benford_worst_chi2"] >= 0.0
    assert s["snapshot_changed_users"] >= 0
    assert all(n > 0 for n in s["tables"].values())
    assert s["cluster_split_leak_pairs"] == 0
    assert s["leakage_eliminated"] is True
    assert s["doc_split_leak_pairs"] >= 0
    assert 0.0 < s["dedup_ratio"] <= 1.0
    assert 0.0 <= s["gd_accuracy"] <= 1.0
    assert 0.0 <= s["auc_exact"] <= 1.0
    assert s["auc_binned_abs_err"] < 0.05
    assert 0.0 <= s["ece"] <= 1.0
    assert 0.0 < s["top_component_evr"] <= 1.0


def test_training_report_cli(spark, sf_dir, tmp_path, capsys):
    import json

    from kinesyslog_spark.cli import main

    out = str(tmp_path / "tr")
    rc = main(["training-report", out, "--sf-dir", sf_dir])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["leakage_eliminated"] is True
