"""Targeted key deletion over a partitioned parquet table (the
GDPR/right-to-erasure rewrite).

At 100 TB you cannot rewrite the table to delete a handful of keys —
the operator must touch ONLY the partitions that actually contain
them:

1. discovery: scan WITH the key predicate pushed down and project the
   partition columns — partition pruning makes untouched directories
   free and parquet row-group stats make the key predicate cheap —
   collecting the (tiny, low-cardinality by layout contract) set of
   affected leaf partitions;
2. rewrite: re-read JUST those partitions (the partition-tuple
   predicate becomes `PartitionFilters`, so no other directory is
   listed or read), anti-filter the purge keys, and commit through
   dynamic partition overwrite — the same idempotent-replace idiom as
   `sinks/partitioned.py` writes, and filesystem-agnostic (no
   driver-side rename choreography, so the same code runs on HDFS/S3
   committers, unlike a local `os.rename` swap);
3. partitions whose every row is purged are absent from the rewrite
   DataFrame (dynamic overwrite would leave them stale), so their
   directories are dropped explicitly via the Hadoop FileSystem API —
   a metadata operation, also FS-agnostic.

Cost scales with the keys' partition locality, not the table size.
Purging is idempotent: a second purge of the same keys finds no
affected partitions and rewrites nothing.

The rewrite materializes the kept rows of the affected partitions via
`localCheckpoint` before writing: it breaks lineage so the commit does
not read the path it overwrites (Spark rejects self-overwrite plans),
and it bounds memory by the affected partitions only — which the
layout contract (low-cardinality partition columns,
sinks/partitioned.py docstring) already requires to be a small slice
of the table.

Reference parity: none (the reference spool, spool.py:25-36, has no
deletion story); this is the operational complement of
sinks/partitioned.py's compactor.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def affected_partitions(
    df: DataFrame, key_col: str, keys: list, part_cols: list[str]
) -> list[dict]:
    """Distinct partition-column tuples containing any of the keys.

    The key predicate reaches the scan (pushed filter + row-group
    stats), and only partition columns are projected, so this is the
    cheap discovery pass."""
    rows = (
        df.filter(F.col(key_col).isin(keys))
        .select(*part_cols)
        .distinct()
        .collect()
    )
    return [r.asDict() for r in rows]


def _partition_predicate(parts: list[dict], part_cols: list[str]):
    """OR-of-ANDs over partition columns — Catalyst turns this into
    PartitionFilters, pruning every unaffected directory. eqNullSafe so
    a NULL partition value (__HIVE_DEFAULT_PARTITION__ directory)
    matches instead of vanishing from the rewrite (round-4 ADVICE)."""
    return functools.reduce(
        operator.or_,
        (
            functools.reduce(
                operator.and_,
                (F.col(c).eqNullSafe(F.lit(p[c])) for c in part_cols),
            )
            for p in parts
        ),
    )


_HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _partition_path_segment(spark: SparkSession, col: str, value) -> str:
    """One `col=value` path segment escaped EXACTLY as Spark's committer
    writes it: delegate to ExternalCatalogUtils.getPartitionPathString
    (Hive path escaping, '%XX' for '/', ':', '#', control chars, …;
    null/empty value → __HIVE_DEFAULT_PARTITION__). Building the raw
    f"{col}={value}" string instead deleted the WRONG (or no) directory
    for values with slashes or spaces — and this path feeds a recursive
    delete (round-4 ADVICE)."""
    sval = None if value is None else str(value)
    try:
        return spark._jvm.org.apache.spark.sql.catalyst.catalog.\
            ExternalCatalogUtils.getPartitionPathString(col, sval)
    except Exception:
        # very defensive fallback: replicate the Hive escaping rules
        if sval is None or sval == "":
            return f"{col}={_HIVE_DEFAULT_PARTITION}"
        needs = set('"#%\'*/:=?\\{[]^') | {chr(i) for i in range(0x20)} | {
            chr(0x7F)
        }
        esc = "".join(
            f"%{ord(ch):02X}" if ch in needs else ch for ch in sval
        )
        return f"{col}={esc}"


def _delete_dir(spark: SparkSession, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API (works on
    local FS, HDFS, and object-store committers alike)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(jpath, True)


def purge_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: list,
    part_cols: list[str],
) -> dict:
    """Delete every row whose `key_col` is in `keys` from the
    partitioned table at `path`, rewriting only affected partitions.

    Returns ``{"partitions_rewritten", "partitions_dropped",
    "rows_deleted", "per_partition": {tuple-str: [before, after]}}``.
    """
    from kinesyslog_spark.sinks.partitioned import read_partitioned

    table = read_partitioned(spark, path)
    parts = affected_partitions(table, key_col, keys, part_cols)
    if not parts:
        return {
            "partitions_rewritten": 0,
            "partitions_dropped": 0,
            "rows_deleted": 0,
            "per_partition": {},
        }

    pred = _partition_predicate(parts, part_cols)
    affected = table.filter(pred)
    # One aggregate job for all before/after counts — not a count()
    # pair per partition.
    hit = F.col(key_col).isin(keys).cast("long")
    counts = {
        tuple(str(r[c]) for c in part_cols): (r["before"], r["after"])
        for r in affected.groupBy(*part_cols)
        .agg(
            F.count(F.lit(1)).alias("before"),
            (F.count(F.lit(1)) - F.sum(hit)).alias("after"),
        )
        .collect()
    }

    keep = affected.filter(~F.col(key_col).isin(keys)).localCheckpoint()
    (
        keep.write.mode("overwrite")
        .partitionBy(*part_cols)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )

    dropped = 0
    for p in parts:
        key = tuple(str(p[c]) for c in part_cols)
        if counts.get(key, (0, 0))[1] == 0:
            leaf = "/".join(
                _partition_path_segment(spark, c, p[c]) for c in part_cols
            )
            _delete_dir(spark, f"{path}/{leaf}")
            dropped += 1

    return {
        "partitions_rewritten": len(parts) - dropped,
        "partitions_dropped": dropped,
        "rows_deleted": sum(b - a for b, a in counts.values()),
        "per_partition": {
            "/".join(k): [b, a] for k, (b, a) in counts.items()
        },
    }
