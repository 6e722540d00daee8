"""Bucketed-table maintenance — the co-located (shuffle-free) join path.

At 100 TB the fact-fact equi-joins (orders ⋈ lineitem on orderkey, the
dedup family's verify joins on doc_id) shuffle both sides on every run.
Spark-native bucketing (`write.bucketBy(n, keys).sortBy(keys)
.saveAsTable`) bakes the hash partitioning into the table layout: every
later equi-join or aggregation keyed on the bucket columns reads
co-located buckets and skips the Exchange entirely — and with `sortBy`,
the per-partition sort too. The write costs one shuffle, repaid on the
first re-read; for repeated-analytics workloads this is the single
biggest shuffle eliminator available.

Sizing: pick `buckets` so one bucket of the *largest* table at target
scale is a few hundred MB (e.g. ~30 TB of lineitem → 65536 buckets).
Both sides of a join must use the same bucket count (or a multiple,
with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).

Reference parity: the reference has no table-maintenance surface — its
spool is write-once gzip blobs (spool.py:56-78); bucketing is a
Spark-native extension for the repeated-query posture this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Bucket keys for the hot join/agg columns of each table. Counts are
# caller-supplied: correct sizing is a function of target-scale bytes,
# not of the table name.
DEFAULT_SPECS: dict[str, list[str]] = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Persist `df` as a bucketed (optionally sort-bucketed) table and
    return a reader for it.

    `path` makes the table external (data at `path`, metadata in the
    session catalog) — pass an object-store URI in production."""
    writer = df.write.format("parquet").mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer = writer.bucketBy(buckets, keys[0], *keys[1:])
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def bucketize(
    spark: SparkSession,
    sf_dir: str,
    buckets: int,
    tables: dict[str, list[str]] | None = None,
    base_path: str | None = None,
    prefix: str = "b_",
) -> dict[str, DataFrame]:
    """Bucketize the hot tables of `sf_dir` (one shuffle each, one-time).

    Returns `{table_name: bucketed_reader}`; readers join/aggregate on
    their bucket keys without an Exchange."""
    from kinesyslog_spark.tables import load_table

    out: dict[str, DataFrame] = {}
    for name, keys in (tables or DEFAULT_SPECS).items():
        path = f"{base_path}/{name}" if base_path else None
        out[name] = write_bucketed(
            load_table(spark, sf_dir, name), f"{prefix}{name}", keys, buckets, path
        )
    return out
