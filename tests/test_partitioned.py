"""Partitioned-layout guardrails: date/type predicates must prune
directories (PartitionFilters), and dynamic overwrite must only replace
the partitions present in the incoming batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesyslog_spark.plans.checks import facts
from kinesyslog_spark.sinks.partitioned import (
    events_by_day,
    read_partitioned,
    write_partitioned,
)
from kinesyslog_spark.tables import load_table


def _write_events(spark, sf_dir, path):
    ev = events_by_day(load_table(spark, sf_dir, "events"))
    write_partitioned(ev, path, ["event_date"], sort_within=["user_id"])
    return ev


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = _write_events(spark, sf_dir, path)
    some_date = ev.select(F.min("event_date")).first()[0]

    q = read_partitioned(spark, path).filter(F.col("event_date") == F.lit(some_date))
    f = facts(q)
    assert f.partition_filters("events_by_day"), (
        "date predicate must appear as PartitionFilters on the scan "
        "(directory pruning), not a post-scan filter"
    )

    # All dates still readable, and the partition column round-trips.
    n_all = read_partitioned(spark, path).count()
    assert n_all == ev.count()
    assert q.count() == ev.filter(F.col("event_date") == F.lit(some_date)).count()


def test_dynamic_overwrite_replaces_only_present_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_dyn")
    ev = _write_events(spark, sf_dir, path)
    dates = sorted(r[0] for r in ev.select("event_date").distinct().collect())
    assert len(dates) >= 2
    target, untouched = dates[0], dates[1:]

    # Re-write ONE day's partition with a single marker row.
    marker = (
        ev.filter(F.col("event_date") == F.lit(target))
        .limit(1)
        .withColumn("user_id", F.lit(-1).cast(dict(ev.dtypes)["user_id"]))
    )
    write_partitioned(marker, path, ["event_date"])

    after = read_partitioned(spark, path)
    got_target = after.filter(F.col("event_date") == F.lit(target)).count()
    got_rest = after.filter(F.col("event_date") != F.lit(target)).count()
    assert got_target == 1, "overwritten partition must contain only the new batch"
    assert got_rest == ev.filter(F.col("event_date") != F.lit(target)).count(), (
        "partitions absent from the batch must be untouched"
    )


def test_compact_partitioned(spark, tmp_path):
    """Fragmented partitions merge to few files; healthy partitions are
    untouched (file identity preserved); data survives byte-for-byte."""
    import os

    from kinesyslog_spark.sinks.partitioned import (
        compact_partitioned,
        partition_file_stats,
    )

    path = str(tmp_path / "tbl")
    # day=a: fragmented (8 tiny files); day=b: healthy single file
    frag = spark.range(0, 800).selectExpr(
        "id", "'a' AS day", "id * 2 AS v"
    ).repartition(8)
    frag.write.partitionBy("day").parquet(path)
    healthy = spark.range(1000, 1100).selectExpr(
        "id", "'b' AS day", "id * 2 AS v"
    ).coalesce(1)
    healthy.write.mode("append").partitionBy("day").parquet(path)

    before = partition_file_stats(path)
    assert before["day=a"][0] == 8 and before["day=b"][0] == 1
    b_files = set(os.listdir(os.path.join(path, "day=b")))
    rows_before = {
        (r["id"], r["day"], r["v"])
        for r in spark.read.parquet(path).collect()
    }

    n = compact_partitioned(spark, path, ["day"], target_file_bytes=1 << 30)
    assert n == 1, "only the fragmented partition should be rewritten"

    after = partition_file_stats(path)
    assert after["day=a"][0] == 1, f"day=a not compacted: {after}"
    assert set(os.listdir(os.path.join(path, "day=b"))) == b_files, \
        "healthy partition must keep its exact files"
    rows_after = {
        (r["id"], r["day"], r["v"])
        for r in spark.read.parquet(path).collect()
    }
    assert rows_after == rows_before

    # idempotent: nothing left to do
    assert compact_partitioned(spark, path, ["day"]) == 0


def test_compact_noncanonical_partition_dirs(spark, tmp_path):
    """A zero-padded partition dir (hour=05) compacts to the canonical
    dir (hour=5) WITHOUT leaving the old directory behind — raw
    dir-name string matching against type-inferred columns used to
    write the rows back under the canonical name and double every
    subsequent read."""
    import os

    from kinesyslog_spark.sinks.partitioned import compact_partitioned

    path = str(tmp_path / "tbl")
    os.makedirs(path)
    # Write fragmented files directly under a NON-canonical dir name, as
    # an external writer (hive, manual copy) would.
    frag = spark.range(0, 200).selectExpr("id", "id * 3 AS v").repartition(4)
    frag.write.parquet(os.path.join(path, "hour=05"))
    for f in os.listdir(os.path.join(path, "hour=05")):
        if not f.endswith(".parquet"):
            os.remove(os.path.join(path, "hour=05", f))
    rows_before = {
        (r["id"], r["hour"], r["v"])
        for r in spark.read.parquet(path).collect()
    }
    assert {r[1] for r in rows_before} == {5}

    n = compact_partitioned(spark, path, ["hour"], target_file_bytes=1 << 30)
    assert n == 1

    # old non-canonical dir removed; rows identical (no duplication)
    assert not os.path.isdir(os.path.join(path, "hour=05"))
    rows_after = {
        (r["id"], r["hour"], r["v"])
        for r in spark.read.parquet(path).collect()
    }
    assert rows_after == rows_before
