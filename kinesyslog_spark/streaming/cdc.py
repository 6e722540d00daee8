"""W12 — incremental SCD2 maintenance (CDC upsert) on a micro-batch
stream: the streaming twin of q81's batch history build.

Each micro-batch of change events is FOLDED into the existing SCD2
table: closed runs are untouched, each affected key's open run is
stitched with the batch's within-batch runs (same-state extension keeps
the original valid_from and accumulates n_events; a state change closes
the open run at the new run's first timestamp), and the last run per
key stays open (is_current). Batches must arrive per-key event-time
ordered — the CDC contract every log-compacted change feed satisfies.

Storage is snapshot-versioned parquet with an atomic pointer (the K1
temp+rename pattern lifted to table level): every epoch writes
`snap-<epoch>/` then atomically publishes `_CURRENT`. Replayed epochs
(foreachBatch at-least-once) are detected by an existing snapshot dir
and skipped — upsert idempotence without a transaction log.

Scale notes: the merge shuffles only on user_id and touches
(closed ∪ open ∪ batch) rows — the dimension table, not the fact
stream. The window functions run per key over run-count-sized
partitions. The whole-snapshot layout still REWRITES the full table
every epoch (O(store)/epoch, and an SCD2 store grows with epochs as
closed runs accumulate); `apply_epoch_bucketed` / `start_scd2_stream(
n_buckets=...)` switch to the bucket-manifest layout
(streaming/bucketstore.py) where only the batch's dirty key-buckets
are read and rewritten — the round-11 compaction lever, parity pinned
per-epoch in tests/test_streaming_compaction.py and measured across
30+ epochs in tools/probe_history_folds.py.

Reference parity: the reference relay has no dimension maintenance; this
extends the declared streaming surface (SURVEY §2c) with the standard
warehouse CDC operator (DBT snapshots / Delta MERGE shape) re-expressed
on checkpointed foreachBatch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

SCD2_SCHEMA = (
    "user_id long, run_id long, tier string, valid_from_ms long, "
    "valid_to_ms long, n_events long, is_current boolean"
)

_ORD_SEED = -(1 << 62)  # seeds sort before any real event_id


def _runs_from_timeline(tl: DataFrame) -> DataFrame:
    """(user_id, ts_ms, ord, tier, w, base) timeline -> SCD2 rows.
    `w` is the event weight a row contributes to its run's n_events
    (seeds carry their accumulated count); `base` is the per-user run_id
    offset (0 for fresh keys)."""
    w = Window.partitionBy("user_id").orderBy("ts_ms", "ord")
    runs = tl.withColumn(
        "chg",
        F.when(~F.lag("tier").over(w).eqNullSafe(F.col("tier")), 1).otherwise(0),
    ).withColumn(
        "run_idx",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agg = runs.groupBy("user_id", "base", "run_idx", "tier").agg(
        F.min("ts_ms").alias("valid_from_ms"), F.sum("w").alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("run_idx")
    nxt = F.lead("valid_from_ms").over(w2)
    return agg.select(
        "user_id",
        (F.col("base") + F.col("run_idx")).alias("run_id"),
        "tier",
        "valid_from_ms",
        nxt.alias("valid_to_ms"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


def scd2_apply_batch(cur: DataFrame | None, changes: DataFrame) -> DataFrame:
    """Fold a change batch into an SCD2 table (pure batch transform).

    `changes`: (user_id long, ts_ms long, ord long, tier string) —
    per-key event-time ordered vs. everything already applied.
    `cur`: existing SCD2 table (SCD2_SCHEMA) or None for the first batch.
    """
    batch_tl = changes.select(
        "user_id", "ts_ms", "ord", "tier", F.lit(1).cast("long").alias("w")
    )
    if cur is None:
        tl = batch_tl.withColumn("base", F.lit(0).cast("long"))
        return _runs_from_timeline(tl)

    keys = changes.select("user_id").distinct()
    open_rows = cur.filter("is_current")
    untouched = cur.join(keys, "user_id", "left_anti")
    closed_affected = (
        cur.filter(~F.col("is_current")).join(keys, "user_id", "left_semi")
    )
    # the affected open run re-enters the timeline as a weighted seed
    seeds = open_rows.join(keys, "user_id", "left_semi").select(
        "user_id",
        F.col("valid_from_ms").alias("ts_ms"),
        F.lit(_ORD_SEED).alias("ord"),
        "tier",
        F.col("n_events").alias("w"),
        (F.col("run_id") - 1).alias("base"),
    )
    base_by_key = seeds.select("user_id", "base")
    batch_affected = (
        batch_tl.join(base_by_key, "user_id", "left")
        .withColumn("base", F.coalesce("base", F.lit(0)))
    )
    tl = seeds.unionByName(batch_affected)
    recomputed = _runs_from_timeline(tl)
    return untouched.unionByName(
        closed_affected.unionByName(recomputed, allowMissingColumns=False)
    )


# ---------------------------------------------------------------------------
# snapshot-versioned storage with an atomic pointer
# ---------------------------------------------------------------------------

def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_CURRENT")


def current_snapshot(table_dir: str) -> str | None:
    try:
        with open(_pointer_path(table_dir)) as fh:
            name = fh.read().strip()
    except FileNotFoundError:
        return None
    return os.path.join(table_dir, name) if name else None


def read_scd2(spark: SparkSession, table_dir: str) -> DataFrame | None:
    snap = current_snapshot(table_dir)
    if snap is None:
        return None
    return spark.read.schema(SCD2_SCHEMA).parquet(snap)


def publish_snapshot(table_dir: str, name: str) -> None:
    """K1 atomic publish: write pointer to a temp file, rename over."""
    tmp = _pointer_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(name)
    os.replace(tmp, _pointer_path(table_dir))


SNAPSHOT_RETENTION = 3  # published + this many predecessors survive vacuum


def vacuum_snapshots(table_dir: str, keep: int = SNAPSHOT_RETENTION) -> int:
    """Delete snapshot dirs older than the last `keep` BEFORE the
    published one (the pointer target itself is never removed, and
    newer-than-published snapshots — a concurrent writer's in-flight
    epoch — are left alone). Returns the number removed."""
    import shutil

    cur = current_snapshot(table_dir)
    if cur is None:
        return 0
    cur_name = os.path.basename(cur)
    older = sorted(
        d
        for d in os.listdir(table_dir)
        if d.startswith("snap-") and d < cur_name
    )
    doomed = older[:-keep] if keep else older
    for d in doomed:
        shutil.rmtree(os.path.join(table_dir, d), ignore_errors=True)
    return len(doomed)


def apply_epoch(
    spark: SparkSession, table_dir: str, epoch_id: int, changes: DataFrame
) -> bool:
    """Merge one micro-batch into the table; returns False for a replayed
    (already-applied) epoch. Idempotence: the snapshot dir is the marker.
    Old snapshots beyond SNAPSHOT_RETENTION are vacuumed after publish
    (replayed epochs older than the retention horizon are impossible:
    the checkpoint only replays the LAST epoch)."""
    os.makedirs(table_dir, exist_ok=True)
    snap_name = f"snap-{epoch_id:020d}"
    snap_dir = os.path.join(table_dir, snap_name)
    if os.path.isdir(snap_dir):
        cur = current_snapshot(table_dir)
        if cur is None or os.path.basename(cur) < snap_name:
            publish_snapshot(table_dir, snap_name)  # crash between write+publish
        return False
    merged = scd2_apply_batch(read_scd2(spark, table_dir), changes)
    merged.write.mode("overwrite").parquet(snap_dir)
    publish_snapshot(table_dir, snap_name)
    vacuum_snapshots(table_dir)
    return True


# ---------------------------------------------------------------------------
# bucket-manifest layout — the compaction lever (round-10 verdict #3)
# ---------------------------------------------------------------------------
# The unpartitioned apply_epoch rewrites the WHOLE table every epoch,
# and an SCD2 table grows with epochs (closed runs accumulate), so the
# total work is quadratic in stream length. The bucketed layout keys
# the store by hash(user_id) % B and folds ONLY the buckets the batch
# touches — the epoch's dirty buckets are known before the fold, the
# untouched buckets ride the manifest unread and unwritten. Parity
# with apply_epoch is pinned per-epoch in
# tests/test_streaming_compaction.py.

def apply_epoch_bucketed(
    spark: SparkSession,
    table_dir: str,
    epoch_id: int,
    changes: DataFrame,
    n_buckets: int = None,
) -> bool:
    """Bucket-manifest twin of apply_epoch: reads/writes only the
    batch's dirty key-buckets. Returns False for a replayed epoch."""
    from kinesyslog_spark.streaming import bucketstore as bs

    if n_buckets is None:
        n_buckets = bs.DEFAULT_BUCKETS
    os.makedirs(table_dir, exist_ok=True)
    if bs.has_epoch(table_dir, epoch_id):
        return False
    changes = changes.withColumn(
        "bucket", bs.bucket_col(F.col("user_id"), n_buckets)
    )
    dirty = [
        r["bucket"]
        for r in changes.select("bucket").distinct().collect()
    ]
    cur = bs.read_buckets(spark, table_dir, SCD2_SCHEMA, buckets=dirty)
    merged = scd2_apply_batch(
        cur.drop("bucket") if bs.current_manifest(table_dir) else None,
        changes.drop("bucket"),
    ).withColumn("bucket", bs.bucket_col(F.col("user_id"), n_buckets))
    bs.write_dirty_snapshot(merged, table_dir, epoch_id, n_buckets,
                            dirty=dirty)
    # publish the DECLARED dirty set, not the snapshot listing — a
    # dirty bucket the fold emptied must remap (to empty), not keep its
    # stale mapping (bucketstore.publish_epoch docstring)
    bs.publish_epoch(table_dir, epoch_id, dirty, n_buckets)
    return True


def read_scd2_bucketed(spark: SparkSession, table_dir: str) -> DataFrame:
    """Full current table under the bucket-manifest layout."""
    from kinesyslog_spark.streaming import bucketstore as bs

    return bs.read_buckets(spark, table_dir, SCD2_SCHEMA).drop("bucket")


def start_scd2_stream(
    spark: SparkSession,
    changes_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    n_buckets: int | None = None,
) -> StreamingQuery:
    """W12 entry: maintain an SCD2 table from a streaming change feed.
    `changes_stream` columns: user_id, ts_ms, ord, tier.

    n_buckets selects the bucket-manifest layout (per-epoch cost ~
    dirty buckets, not table size); None keeps the original
    whole-snapshot layout."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if n_buckets is not None:
            apply_epoch_bucketed(
                batch_df.sparkSession, table_dir, epoch_id, batch_df,
                n_buckets=n_buckets,
            )
        else:
            apply_epoch(batch_df.sparkSession, table_dir, epoch_id, batch_df)

    writer = changes_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
