r"""Partitioned-table layout — directory-level pruning for time/source
queries.

The complement of `sinks/bucketed.py`: bucketing co-locates *join/agg
keys*, partitioning prunes *scan ranges*. A relay corpus at 100 TB is
overwhelmingly queried by time window and source — laid out as
`date=.../dest=.../part-*.parquet`, those predicates skip whole
directories before a single byte is read (`PartitionFilters` in the
scan, checked by tests/test_partitioned.py).

Guidance baked into the helpers:
- Partition columns must be LOW cardinality (date × dest ~ 10^3-10^4
  dirs/year). Never partition by a high-cardinality key (source IP can
  be 10^6+ — that's a bucketing or sort-within-partition concern).
- `sort_within` orders rows inside each file so min/max row-group
  statistics make *non-partition* predicates (e.g. source) cheap too —
  parquet row-group skipping, the poor man's z-order.
- Writes go through the same dynamic-overwrite idiom the streaming sink
  uses: `partitionOverwriteMode=dynamic` replaces only the partitions
  present in the batch — idempotent micro-batch replays (reference
  at-least-once semantics, spool.py:199-210, without double data).

Reference parity: the reference's only layout is flat spool files
(spool.py:25-36); partitioned tables are the Spark-native extension for
the repeated-analytics posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a partitioned parquet table at `path`.

    With mode='overwrite' and dynamic partition overwrite, only the
    partitions present in `df` are replaced — safe for incremental /
    replayed batch appends of new time windows."""
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    # Writer-level option, not session conf: a shared session's other
    # writers must not silently inherit dynamic overwrite.
    (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )


def events_by_day(events: DataFrame) -> DataFrame:
    """The relay's canonical layout columns: event date + event_type.

    (On the record pipeline the analogous key is (date, dest) — the same
    `logGroup` axis the reference groups by, sink.py:162.)"""
    return events.withColumn("event_date", F.to_date("ts"))


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; partition columns come back as regular
    columns and predicates on them prune directories (PartitionFilters)."""
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Small-file compaction — the operational counterpart of partitioned
# ingest. Micro-batch streaming writes (trigger cadence x partitions)
# accumulate files far below the parquet sweet spot; at corpus scale the
# resulting footer/open overhead dominates scans. The compactor:
#
# 1. discovers per-partition (file count, bytes) with a driver-side
#    metadata walk (no data read);
# 2. selects ONLY partitions that are actually fragmented (>= min_files
#    and mean file size < target/2) — untouched partitions are never
#    rewritten (their files keep their identity, verified by test);
# 3. reads the fragmented partitions via a partition-pruned filter,
#    rewrites them with dynamic partition overwrite, one task per
#    partition value, `maxRecordsPerFile` derived from the measured
#    bytes/row so oversized partitions still split near the target.
#
# The read is materialized (localCheckpoint) before the overwrite —
# Spark refuses to overwrite a path it is lazily reading from. At
# cluster scale the same job writes to a temp prefix and swaps; the
# partition-selection and sizing logic is identical.
# ---------------------------------------------------------------------------


def partition_file_stats(path: str) -> dict[str, tuple[int, int]]:
    """Leaf-partition -> (n_files, total_bytes), driver-side metadata
    walk (the compactor's discovery step; no Spark job)."""
    import os

    stats: dict[str, tuple[int, int]] = {}
    for root, _dirs, files in os.walk(path):
        pq = [f for f in files if f.endswith(".parquet")]
        if pq:
            rel = os.path.relpath(root, path)
            total = sum(os.path.getsize(os.path.join(root, f)) for f in pq)
            stats[rel] = (len(pq), total)
    return stats


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 << 20,
    min_files: int = 2,
) -> int:
    """Compact fragmented partitions of a partitioned parquet table in
    place. Returns the number of partitions rewritten."""
    import os
    import shutil

    stats = partition_file_stats(path)
    todo = {
        rel: s
        for rel, s in stats.items()
        if s[0] >= min_files and s[1] / s[0] < target_file_bytes / 2
    }
    if not todo:
        return 0

    # Read ONLY the fragmented leaf directories, with basePath so SPARK
    # parses the dir names into partition values (its own unescaping +
    # type inference). String-equality predicates against inferred
    # columns mis-select non-canonical dir values — zero-padded ints
    # (hour=05), URL-escaped specials, __HIVE_DEFAULT_PARTITION__ nulls.
    sel = spark.read.option("basePath", path).parquet(
        *[os.path.join(path, rel) for rel in todo]
    )

    total_bytes = sum(b for _, b in todo.values())
    n_rows = sel.count()
    if n_rows == 0:
        return 0
    max_records = max(1, int(n_rows * target_file_bytes / max(total_bytes, 1)))

    sel = sel.localCheckpoint(eager=True)  # break lineage to the files
    before = {
        rel: set(os.listdir(os.path.join(path, rel))) for rel in todo
    }
    (
        sel.repartition(*partition_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records)
        .parquet(path)
    )
    # Dynamic overwrite lands rows under CANONICAL dir names; a source
    # dir spelled non-canonically (hour=05 -> rows now under hour=5) is
    # untouched by the write and would double every read — detect (file
    # set unchanged) and remove it.
    for rel in todo:
        dirp = os.path.join(path, rel)
        if os.path.isdir(dirp) and set(os.listdir(dirp)) == before[rel]:
            shutil.rmtree(dirp)
    return len(todo)
