"""W28 — continuous materialized view with RETRACTION changelog.

The missing half of CDC: W12 consumes a changelog (upsert IN); this
emits one (changelog OUT) — the Flink "retract stream" primitive that
lets any downstream consumer maintain an exact copy of a continuously
aggregated view without ever rescanning it. Per micro-batch the grouped
count/sum view merges into its snapshot and the DIFF leaves as
changelog rows with the standard op kinds:

    +I  key first appears          (insert,        old null)
    -U  pre-update image           (update_before, the old row)
    +U  post-update image          (update_after,  the new row)

(Deletes don't arise for monotone count/sum merges; a consumer applies
-U/+U pairs atomically per key.)

THE defining contract — replaying the changelog reconstructs the view:
  apply(epoch 0..N changelogs) == snapshot N, exactly —
is pinned in tests/test_streaming_changelog.py.

State/exactly-once: the W27 epoch-snapshot pattern — snapshot under
state_dir/epoch=N (latest-complete _SUCCESS resolution via Hadoop FS),
changelog under out_dir/epoch_id=N by overwrite. Merge is SUM (NOT
retry-idempotent), so a retried epoch reads the snapshot strictly
BEFORE its own epoch id and pruning keeps that predecessor alive.

Scale posture: per-batch work is one map-side-combined aggregate over
the batch plus a key-partitioned outer join against the (view-sized)
snapshot; changelog volume is bounded by keys TOUCHED per batch, not
view size. The whole-snapshot fold still merges and rewrites the FULL
view every epoch; `make_fold_bucketed` / `streaming_changelog(
n_buckets=...)` switch to the bucket-manifest layout
(streaming/bucketstore.py) where only the batch keys' buckets are
merged and rewritten — changelog identical by construction (untouched
keys emit no rows in either layout); parity + retry pinned in
tests/test_streaming_compaction.py.

Reference parity: none; §2c extension (the emit twin of W12's consume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesyslog_spark.streaming.epoch_state import (
    latest_state_epoch,
    prune_state_epochs,
)

_VIEW_SCHEMA = "key string, cnt long, total long"


def batch_view(batch: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """One grouped (key, cnt, total) row set for a micro-batch."""
    return (
        batch.groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # per-ROW integer truncation, so batch-then-merge equals
            # any other grouping of the same rows (associative exactly)
            F.coalesce(F.sum(F.col(val_col).cast("long")), F.lit(0))
            .cast("long").alias("total"),
        )
    )


def merge_view(snapshot: DataFrame, delta: DataFrame) -> DataFrame:
    """SUM-merge a batch view into the snapshot (associative)."""
    return (
        snapshot.unionByName(delta)
        .groupBy("key")
        .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
    )


def changelog_rows(
    old: DataFrame, new: DataFrame, epoch_id: int
) -> DataFrame:
    """Retraction changelog between two snapshots, restricted to
    changed keys: +I for new keys, -U/+U pairs for updated keys."""
    o = old.select(
        F.col("key"),
        F.col("cnt").alias("old_cnt"),
        F.col("total").alias("old_total"),
    )
    n = new.select(
        F.col("key").alias("nkey"),
        F.col("cnt").alias("new_cnt"),
        F.col("total").alias("new_total"),
    )
    j = n.join(o, F.col("nkey") == F.col("key"), "left")
    inserts = j.filter(F.col("key").isNull()).select(
        F.lit(int(epoch_id)).alias("epoch"),
        F.col("nkey").alias("key"),
        F.lit("+I").alias("op"),
        F.col("new_cnt").alias("cnt"),
        F.col("new_total").alias("total"),
    )
    changed = j.filter(
        F.col("key").isNotNull()
        & (
            (F.col("new_cnt") != F.col("old_cnt"))
            | (F.col("new_total") != F.col("old_total"))
        )
    )
    before = changed.select(
        F.lit(int(epoch_id)).alias("epoch"),
        F.col("nkey").alias("key"),
        F.lit("-U").alias("op"),
        F.col("old_cnt").alias("cnt"),
        F.col("old_total").alias("total"),
    )
    after = changed.select(
        F.lit(int(epoch_id)).alias("epoch"),
        F.col("nkey").alias("key"),
        F.lit("+U").alias("op"),
        F.col("new_cnt").alias("cnt"),
        F.col("new_total").alias("total"),
    )
    return inserts.unionByName(before).unionByName(after)


def apply_changelog(log: DataFrame) -> DataFrame:
    """Reconstruct the view from a changelog (the consumer side, used
    by the reconstruction pin): the LAST +I/+U image per key wins."""
    latest = (
        log.filter(F.col("op") != "-U")
        .groupBy("key")
        .agg(F.max(F.struct("epoch", "cnt", "total")).alias("s"))
    )
    return latest.select(
        "key", F.col("s.cnt").alias("cnt"), F.col("s.total").alias("total")
    )


def make_fold(out_dir: str, state_dir: str, key_col: str, val_col: str):
    """foreachBatch body, exposed for direct retry-contract tests."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = batch_view(batch, key_col, val_col)
        # strictly-before: SUM-merge is not retry-idempotent (W27 rule)
        latest = latest_state_epoch(spark, state_dir, before=int(epoch_id))
        if latest is not None:
            old = spark.read.parquet(f"{state_dir}/epoch={latest}")
        else:
            old = spark.createDataFrame([], _VIEW_SCHEMA)
        new = merge_view(old, delta).localCheckpoint()
        log = changelog_rows(old, new, int(epoch_id))
        new.write.mode("overwrite").parquet(f"{state_dir}/epoch={epoch_id}")
        prune_state_epochs(
            spark, state_dir,
            keep=latest if latest is not None else int(epoch_id),
        )
        log.write.mode("overwrite").parquet(f"{out_dir}/epoch_id={epoch_id}")

    return fold


# ---------------------------------------------------------------------------
# bucket-manifest layout — the compaction lever (round-10 verdict #3)
# ---------------------------------------------------------------------------
# make_fold merges the batch delta against the WHOLE view snapshot and
# rewrites all of it — O(view) per epoch even when the batch touches 3
# keys. The bucketed fold reads/merges/writes only the batch keys'
# hash buckets; untouched buckets ride the manifest. The changelog is
# unchanged by construction: keys outside the batch emit no rows in
# either layout. Retry keeps the W27 strictly-before rule — a replayed
# epoch sees its own manifest marker and skips (SUM-merge never
# double-applies).

def make_fold_bucketed(out_dir: str, state_dir: str, key_col: str,
                       val_col: str, n_buckets: int = None):
    """foreachBatch body for the bucket-manifest layout."""
    from kinesyslog_spark.streaming import bucketstore as bs

    if n_buckets is None:
        n_buckets = bs.DEFAULT_BUCKETS

    def fold(batch: DataFrame, epoch_id: int) -> None:
        import os

        spark = batch.sparkSession
        os.makedirs(state_dir, exist_ok=True)
        if bs.has_epoch(state_dir, epoch_id):
            return  # replayed epoch: manifest is the applied marker
        delta = batch_view(batch, key_col, val_col).withColumn(
            "bucket", bs.bucket_col(F.col("key"), n_buckets)
        ).localCheckpoint()
        dirty = [
            r["bucket"] for r in delta.select("bucket").distinct().collect()
        ]
        old = bs.read_buckets(
            spark, state_dir, _VIEW_SCHEMA, buckets=dirty
        ).drop("bucket")
        new = merge_view(old, delta.drop("bucket")).localCheckpoint()
        log = changelog_rows(old, new, int(epoch_id))
        bs.write_dirty_snapshot(
            new.withColumn(
                "bucket", bs.bucket_col(F.col("key"), n_buckets)
            ),
            state_dir, int(epoch_id), n_buckets, dirty=dirty,
        )
        log.write.mode("overwrite").parquet(f"{out_dir}/epoch_id={epoch_id}")
        # publish the DECLARED dirty set, not the snapshot listing
        # (bucketstore.publish_epoch docstring)
        bs.publish_epoch(state_dir, int(epoch_id), dirty, n_buckets)

    return fold


def read_view_bucketed(spark: SparkSession, state_dir: str) -> DataFrame:
    """Full current view under the bucket-manifest layout."""
    from kinesyslog_spark.streaming import bucketstore as bs

    return bs.read_buckets(spark, state_dir, _VIEW_SCHEMA).drop("bucket")


def streaming_changelog(
    events: DataFrame, out_dir: str, state_dir: str, checkpoint_dir: str,
    key_col: str = "event_type", val_col: str = "value",
    trigger: str = "1 second",
    n_buckets: int | None = None,
) -> StreamingQuery:
    """Maintain the grouped view continuously; retraction changelog rows
    land under out_dir/epoch_id=N per micro-batch. n_buckets selects
    the bucket-manifest state layout (per-epoch cost ~ dirty buckets,
    not view size); None keeps the whole-snapshot layout."""
    fold = (
        make_fold_bucketed(out_dir, state_dir, key_col, val_col, n_buckets)
        if n_buckets is not None
        else make_fold(out_dir, state_dir, key_col, val_col)
    )
    return (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )
