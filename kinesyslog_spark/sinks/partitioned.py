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
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def events_by_day(events: DataFrame) -> DataFrame:
    """The relay's canonical layout columns: event date + event_type.

    (On the record pipeline the analogous key is (date, dest) — the same
    `logGroup` axis the reference groups by, sink.py:162.)"""
    return events.withColumn("event_date", F.to_date("ts"))


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; partition columns come back as regular
    columns and predicates on them prune directories (PartitionFilters)."""
    return spark.read.parquet(path)
