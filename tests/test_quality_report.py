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
