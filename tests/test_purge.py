"""Targeted key deletion (operators/purge.py): only affected
partitions are rewritten, fully-purged partitions are dropped, the
result table is exactly (original MINUS keys), and re-purging is a
no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kinesyslog_spark.operators.purge import affected_partitions, purge_keys
from kinesyslog_spark.sinks.partitioned import read_partitioned, write_partitioned


def _build(spark, tmp_path):
    path = str(tmp_path / "purge_tbl")
    rows = [
        # (user_id, event_date, payload)
        (u, d, f"{u}:{d}")
        for d in ("2024-01-01", "2024-01-02", "2024-01-03")
        for u in range(10)
    ] + [
        # a partition that will be ENTIRELY purged
        (99, "2024-01-04", "99:2024-01-04"),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_date string, payload string")
    write_partitioned(df, path, ["event_date"])
    return path, df


def _files_mtimes(path, leaf):
    d = os.path.join(path, leaf)
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_purge_removes_keys_and_preserves_rest(spark, tmp_path):
    path, df = _build(spark, tmp_path)
    untouched_before = _files_mtimes(path, "event_date=2024-01-03")

    # keys 3 and 5 live in every date partition except 01-04; key 99
    # is the only row of 01-04.
    stats = purge_keys(spark, path, "user_id", [3, 5, 99], ["event_date"])

    assert stats["rows_deleted"] == 7  # 2 keys x 3 dates + 1
    assert stats["partitions_dropped"] == 1
    assert stats["partitions_rewritten"] == 3
    assert not os.path.exists(os.path.join(path, "event_date=2024-01-04"))

    got = read_partitioned(spark, path)
    assert got.filter(F.col("user_id").isin([3, 5, 99])).count() == 0
    expect = df.filter(~F.col("user_id").isin([3, 5, 99]))
    assert got.count() == expect.count() == 24
    assert (
        got.exceptAll(expect.select(*got.columns)).count() == 0
        and expect.select(*got.columns).exceptAll(got).count() == 0
    )

    # Untouched partitions were neither rewritten nor re-listed into
    # new files: same parquet files, same mtimes.
    # (2024-01-03 WAS affected; 2024-01-03 had keys 3,5 -> rewritten.
    #  Use a partition with no purge keys instead.)


def test_untouched_partition_files_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "purge_tbl2")
    rows = [(u, d, "x") for d in ("2024-02-01", "2024-02-02") for u in range(5)]
    df = spark.createDataFrame(rows, "user_id int, event_date string, payload string")
    write_partitioned(df, path, ["event_date"])

    # key 101 exists only in 02-01 (append it there)
    extra = spark.createDataFrame(
        [(101, "2024-02-01", "x")], "user_id int, event_date string, payload string"
    )
    write_partitioned(
        extra.unionByName(df.filter(F.col("event_date") == "2024-02-01")),
        path,
        ["event_date"],
    )
    before = _files_mtimes(path, "event_date=2024-02-02")

    stats = purge_keys(spark, path, "user_id", [101], ["event_date"])
    assert stats["rows_deleted"] == 1
    assert stats["partitions_rewritten"] == 1
    assert stats["partitions_dropped"] == 0

    after = _files_mtimes(path, "event_date=2024-02-02")
    assert before == after  # untouched directory: byte-identical file set


def test_purge_is_idempotent(spark, tmp_path):
    path, _ = _build(spark, tmp_path)
    purge_keys(spark, path, "user_id", [3], ["event_date"])
    again = purge_keys(spark, path, "user_id", [3], ["event_date"])
    assert again == {
        "partitions_rewritten": 0,
        "partitions_dropped": 0,
        "rows_deleted": 0,
        "per_partition": {},
    }


def test_affected_partitions_discovery(spark, tmp_path):
    path, _ = _build(spark, tmp_path)
    table = read_partitioned(spark, path)
    parts = affected_partitions(table, "user_id", [99], ["event_date"])
    assert [str(p["event_date"]) for p in parts] == ["2024-01-04"]


def test_privacy_report_artifacts(spark, sf_dir, tmp_path):
    from kinesyslog_spark.report import privacy_report

    out = str(tmp_path / "privacy")
    summary = privacy_report(spark, sf_dir, out)
    assert summary["tables"] == {
        "pii_scrub": spark.read.parquet(f"{out}/pii_scrub").count(),
        "k_anonymity": spark.read.parquet(f"{out}/k_anonymity").count(),
    }
    assert summary["pii_emails"] == summary["tables"]["pii_scrub"]  # one planted each
    assert summary["risky_classes"] == summary["tables"]["k_anonymity"]
    assert summary["smallest_class"] >= 1


def test_purge_escaped_partition_values(spark, tmp_path):
    """Partition values with '/', spaces, and ':' must purge the RIGHT
    directory (Hive path escaping, same as Spark's committer), and a
    fully-purged escaped partition's directory is dropped — not a
    sibling's (round-4 ADVICE: raw f-string paths fed a recursive
    delete)."""
    import os

    from kinesyslog_spark.operators.purge import (
        _partition_path_segment,
        purge_keys,
    )

    path = str(tmp_path / "tbl")
    rows = [
        (1, "a/b"), (2, "a/b"),       # slash — escapes to a%2Fb
        (3, "plain"), (4, "plain"),
        (5, "x y:z"),                  # space + colon
    ]
    df = spark.createDataFrame(rows, "user_id long, src string")
    df.write.mode("overwrite").partitionBy("src").parquet(path)
    seg = _partition_path_segment(spark, "src", "a/b")
    assert "/" not in seg.split("=", 1)[1], seg
    assert os.path.isdir(os.path.join(path, seg))

    # purge every row of the slash partition + one row of 'plain'
    stats = purge_keys(spark, path, "user_id", [1, 2, 3], ["src"])
    assert stats["rows_deleted"] == 3
    assert stats["partitions_dropped"] == 1
    assert not os.path.isdir(os.path.join(path, seg)), (
        "escaped directory must be the one dropped"
    )
    left = spark.read.parquet(path)
    got = {(r.user_id, r.src) for r in left.collect()}
    assert got == {(4, "plain"), (5, "x y:z")}
