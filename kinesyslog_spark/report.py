"""Corpus health report: materialize the curation family (q127-q136)
as one parquet artifact tree + a JSON headline summary.

The operational wrapper a data-engineering team runs nightly over a
corpus snapshot: per-doc repetition flags, source overlap/divergence,
the frequency spectrum, Zipf fit, dispersion, fertility, cardinality
and quantile sketches — each table lands under `<out_dir>/<name>/` and
the scalar indicators (zipf alpha, worst source drift, most-overlapping
source pair, HLL estimate error) come back as a dict for alerting.

Every table here is an already-oracle-checked registered query — the
report only composes and materializes them, so its correctness is the
registry's. Writes go through one shared SparkSession; each table is
an independent job (no cross-table barrier), so a long table doesn't
stall the others' scheduling at cluster scale.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

# (registered query, artifact name) — registry order is report order.
REPORT_TABLES = (
    ("q127_gopher_repetition", "repetition"),
    ("q128_source_overlap", "source_overlap"),
    ("q129_freq_spectrum", "freq_spectrum"),
    ("q130_source_divergence", "source_divergence"),
    ("q131_zipf_fit", "zipf_fit"),
    ("q132_token_dispersion", "token_dispersion"),
    ("q133_bpe_fertility", "bpe_fertility"),
    ("q134_hll_cardinality", "hll_cardinality"),
    ("q135_histogram_quantiles", "quantiles"),
)


def corpus_report(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, Any]:
    """Run every report table, write `<out_dir>/<name>/`, return the
    headline indicator dict."""
    from kinesyslog_spark.queries import QUERIES

    counts: dict[str, int] = {}
    for qname, art in REPORT_TABLES:
        df = QUERIES[qname](spark, sf_dir)
        df.write.mode("overwrite").parquet(f"{out_dir}/{art}")
        counts[art] = spark.read.parquet(f"{out_dir}/{art}").count()

    zipf = spark.read.parquet(f"{out_dir}/zipf_fit").collect()[0]
    div = spark.read.parquet(f"{out_dir}/source_divergence").collect()
    worst = max(div, key=lambda r: r["tv_dist"])
    ov = spark.read.parquet(f"{out_dir}/source_overlap").collect()
    top_pair = max(ov, key=lambda r: r["jaccard"])
    hll = spark.read.parquet(f"{out_dir}/hll_cardinality").collect()[0]
    rep = spark.read.parquet(f"{out_dir}/repetition")
    from pyspark.sql import functions as F

    flagged = rep.filter(
        (F.col("top2_share") > 0.2) | (F.col("dup3_frac") > 0.5)
    ).count()

    return {
        "tables": counts,
        "zipf_alpha": zipf["zipf_alpha"],
        "zipf_r2": zipf["r2"],
        "worst_drift_source": worst["source"],
        "worst_drift_tv": worst["tv_dist"],
        "top_overlap_pair": [top_pair["src_a"], top_pair["src_b"]],
        "top_overlap_jaccard": top_pair["jaccard"],
        "hll_est": hll["est_raw"],
        "hll_exact": hll["n_exact"],
        "repetition_flagged_docs": flagged,
    }


def privacy_report(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, Any]:
    """Privacy/compliance posture in one artifact tree: the PII scrub
    audit (q41) and the k-anonymity risk audit (q139), with the
    headline indicators an erasure/retention review needs. The purge
    operator (operators/purge.py, `purge` CLI) is the remediation arm
    of the same family."""
    from pyspark.sql import functions as F

    from kinesyslog_spark.queries import QUERIES

    counts: dict[str, int] = {}
    for qname, art in (
        ("q41_pii_scrub", "pii_scrub"),
        ("q139_k_anonymity", "k_anonymity"),
    ):
        QUERIES[qname](spark, sf_dir).write.mode("overwrite").parquet(
            f"{out_dir}/{art}"
        )
        counts[art] = spark.read.parquet(f"{out_dir}/{art}").count()

    pii = spark.read.parquet(f"{out_dir}/pii_scrub")
    pii_totals = pii.agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_ips").alias("i"),
        F.sum("n_phones").alias("p"),
    ).collect()[0]
    ka = spark.read.parquet(f"{out_dir}/k_anonymity")
    ka_sum = ka.agg(
        F.count(F.lit(1)).alias("classes"),
        F.sum("class_n").alias("people"),
        F.sum("n_orders").alias("orders"),
        F.min("class_n").alias("worst"),
    ).collect()[0]
    return {
        "tables": counts,
        "pii_emails": int(pii_totals["e"]),
        "pii_ips": int(pii_totals["i"]),
        "pii_phones": int(pii_totals["p"]),
        "risky_classes": int(ka_sum["classes"]),
        "risky_customers": int(ka_sum["people"] or 0),
        "exposed_orders": int(ka_sum["orders"] or 0),
        "smallest_class": int(ka_sum["worst"] or 0),
    }


def quality_report(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, Any]:
    """Data-quality posture in one artifact tree: the q145 constraint
    audit (completeness / PK / FK / ranges / domains / statistical
    bands) plus the q146 grouped-cardinality report, with the headline
    pass/fail indicators a pipeline gate reads before trusting a drop.
    W27 (streaming/quality.py) is the continuous form of the same
    checks."""
    from pyspark.sql import functions as F

    from kinesyslog_spark.queries import QUERIES

    counts: dict[str, int] = {}
    for qname, art in (
        ("q145_data_quality_audit", "constraints"),
        ("q146_grouped_hll_merge", "group_cardinality"),
    ):
        QUERIES[qname](spark, sf_dir).write.mode("overwrite").parquet(
            f"{out_dir}/{art}"
        )
        counts[art] = spark.read.parquet(f"{out_dir}/{art}").count()

    cons = spark.read.parquet(f"{out_dir}/constraints")
    agg = cons.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("passed")).alias("ok"),
    ).collect()[0]
    failing = sorted(
        r.check_name for r in cons.filter(F.col("passed") == 0).collect()
    )
    card = spark.read.parquet(f"{out_dir}/group_cardinality")
    merge_ok = card.agg(F.min("merge_identical")).collect()[0][0]
    return {
        "tables": counts,
        "checks_total": int(agg["n"]),
        "checks_passed": int(agg["ok"]),
        "checks_failing": failing,
        "all_passed": int(agg["n"]) == int(agg["ok"]),
        "hll_merge_identical": bool(merge_ok == 1),
    }


def training_report(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, Any]:
    """Training-data readiness in one artifact tree: the split-leakage
    audit (q163) and its cluster-aware fix (q165), CDC dedup-store
    statistics (q162), the in-engine classifier + its calibration
    (q161/q164) and AUC (q159), and the embedding spectrum (q166) —
    the numbers a dataset card / training gate reads before a run.
    Headline indicators: leakage before vs after the cluster fix, the
    corpus dedup ratio, model accuracy/AUC/ECE, and the top component's
    explained-variance ratio."""
    from pyspark.sql import functions as F

    from kinesyslog_spark.queries import QUERIES

    counts: dict[str, int] = {}
    for qname, art in (
        ("q163_split_leakage", "split_leakage"),
        ("q165_cluster_split", "cluster_split"),
        ("q162_cdc_chunk_dedup", "cdc_dedup"),
        ("q161_logreg_gd", "classifier_gd"),
        ("q164_calibration_bins", "calibration"),
        ("q159_binned_auc", "auc"),
        ("q169_split_disciplined_auc", "split_auc"),
        ("q166_power_iteration_pc", "spectrum"),
        ("q168_benford_audit", "benford"),
        ("q170_snapshot_diff", "snapshot_diff"),
    ):
        QUERIES[qname](spark, sf_dir).write.mode("overwrite").parquet(
            f"{out_dir}/{art}"
        )
        counts[art] = spark.read.parquet(f"{out_dir}/{art}").count()

    leak = spark.read.parquet(f"{out_dir}/split_leakage").agg(
        F.sum("n_leak_pairs").alias("n")
    ).collect()[0]
    cleak = spark.read.parquet(f"{out_dir}/cluster_split").agg(
        F.max("n_leak_pairs").alias("n")
    ).collect()[0]
    dd = spark.read.parquet(f"{out_dir}/cdc_dedup").agg(
        F.sum("unique_bytes").alias("u"), F.sum("total_bytes").alias("t")
    ).collect()[0]
    gd = spark.read.parquet(f"{out_dir}/classifier_gd").collect()[0]
    cal = spark.read.parquet(f"{out_dir}/calibration").agg(
        F.sum("ece_contrib").alias("ece"),
        F.max(F.abs(F.col("mean_conf") - F.col("emp_rate"))).alias("worst"),
    ).collect()[0]
    auc = spark.read.parquet(f"{out_dir}/auc").collect()[0]
    spec = spark.read.parquet(f"{out_dir}/spectrum").collect()[0]
    sauc = {
        r["split"]: float(r["auc_binned"])
        for r in spark.read.parquet(f"{out_dir}/split_auc").collect()
    }
    chi = {
        r["src"]: float(r["chi2"])
        for r in spark.read.parquet(f"{out_dir}/benford").collect()
    }
    snap = {
        r["diff_class"]: int(r["n_users"])
        for r in spark.read.parquet(f"{out_dir}/snapshot_diff").collect()
    }
    return {
        "tables": counts,
        "doc_split_leak_pairs": int(leak["n"]),
        "cluster_split_leak_pairs": int(cleak["n"]),
        "leakage_eliminated": int(cleak["n"]) == 0,
        "dedup_ratio": round(float(dd["u"]) / float(dd["t"]), 6),
        "gd_accuracy": float(gd["accuracy"]),
        "auc_exact": float(auc["auc_exact"]),
        "auc_binned_abs_err": float(auc["abs_err"]),
        "auc_train": sauc.get("train", 0.0),
        "auc_heldout": round(
            (sauc.get("val", 0.0) + sauc.get("test", 0.0)) / 2, 6
        ),
        "ece": round(float(cal["ece"]), 6),
        "worst_bin_gap": float(cal["worst"]),
        "top_component_evr": float(spec["evr"]),
        "benford_worst_chi2": max(chi.values()) if chi else 0.0,
        "snapshot_changed_users": snap.get("changed", 0),
    }
