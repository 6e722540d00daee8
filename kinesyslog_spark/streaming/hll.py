"""W22 — continuous cardinality estimation (streaming HyperLogLog).

The streaming form of q134: each micro-batch folds its keys into the
64-register HLL sketch and the running distinct-count estimate is
readable after every epoch. The state is the 64-row register table
itself, persisted as parquet and MAX-merged per batch — and because
MAX-merge is IDEMPOTENT (max(a, max(a, b)) = max(a, b)), a retried
micro-batch re-merging the same keys cannot corrupt the sketch:
at-least-once delivery gives exactly-once *state* for free. That is
the property that makes HLL the canonical streaming-distinct design —
no per-key state, no dedup buffer, O(m) bytes forever.

Scale posture (100 TB / continuous):
- State is exactly HLL_M rows regardless of stream volume; the
  per-batch work is one map-side-combined (register, rank) aggregate
  over the batch plus a 64-row merge. Nothing grows.
- Sharded ingest merges the same way (tests pin register-set MAX-merge
  == whole-corpus sketch in tests/test_estimators.py).

Reference parity: none; streaming counterpart of q134
(queries/estimators.py). Replay-tested in tests/test_streaming_hll.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesyslog_spark.operators.text import md5_int60
from kinesyslog_spark.queries.estimators import HLL_ALPHA, HLL_M
from kinesyslog_spark.streaming.epoch_state import (
    latest_state_epoch,
    prune_state_epochs,
)


def batch_registers(batch: DataFrame, key_col: str) -> DataFrame:
    """(j, m_j) register rows for one batch of keys — the q134 hash
    (md5_int60 'hll:' prefix), register = low 6 bits, rank = exact
    bit_length leading-zero count. Only registers the batch touched
    are emitted; merge fills the rest."""
    h = batch.select(
        md5_int60(F.col(key_col).cast("string"), prefix="hll:").alias("hv")
    )
    return (
        h.select(
            (F.col("hv") % HLL_M).alias("j"),
            F.when(F.expr("shiftright(hv, 6)") == 0, F.lit(55))
            .otherwise(55 - F.length(F.expr("bin(shiftright(hv, 6))")))
            .alias("r"),
        )
        .groupBy("j")
        .agg(F.max("r").alias("m_j"))
    )


def merge_registers(a: DataFrame, b: DataFrame) -> DataFrame:
    """MAX-merge two register tables (idempotent, commutative,
    associative — the sketch's semilattice)."""
    return (
        a.unionByName(b)
        .groupBy("j")
        .agg(F.max("m_j").alias("m_j"))
    )


def estimate(spark: SparkSession, regs: DataFrame) -> float:
    """Raw HLL estimate from a (possibly sparse) register table."""
    grid = spark.range(HLL_M).select(F.col("id").alias("j"))
    full = (
        grid.join(regs, "j", "left")
        .select(F.coalesce("m_j", F.lit(0)).alias("m_j"))
    )
    zs = full.agg(
        F.sum(F.expr("shiftleft(1L, cast(55 - m_j as int))")).alias("zs")
    ).collect()[0]["zs"]
    return HLL_ALPHA * HLL_M * HLL_M * (1 << 55) / zs


def streaming_hll(
    docs: DataFrame,
    key_col: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger: str = "1 second",
) -> StreamingQuery:
    """Fold a key stream into the register state continuously; after
    each epoch the running estimate lands under out_dir/epoch_id=N and
    the merged registers are written as an EPOCH-VERSIONED snapshot
    under state_dir/epoch=N, resolved at read time by latest-complete
    (_SUCCESS) epoch. No rename choreography: a crash at any point
    leaves the previous complete snapshot readable (the round-4 ADVICE
    two-step-rename could strand a state-less window and a stale .prev
    that broke the NEXT rotation), a retried epoch overwrites its own
    snapshot (MAX-merge makes the re-merge idempotent anyway), and
    stale snapshots are pruned best-effort through the Hadoop
    FileSystem API — so state_dir may live on HDFS/object storage,
    matching the checkpointed-stream posture, not just the driver's
    local disk."""
    return (
        docs.writeStream.foreachBatch(make_fold(state_dir, out_dir, key_col))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )


def make_fold(state_dir: str, out_dir: str, key_col: str):
    """The W22 foreachBatch body (exposed like the other folds, for the
    retry tests and the decade probe, which drives it availableNow)."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        new = batch_registers(batch, key_col)
        # strictly-before (the epoch_state.py predecessor-retry rule):
        # MAX-merge makes re-merging the predecessor equally correct, and
        # reading this epoch's OWN completed snapshot while overwriting
        # the same path is an error Spark rejects ("Cannot overwrite a
        # path that is also being read from") — the one consumer that
        # omitted `before` was this module.
        latest = latest_state_epoch(spark, state_dir, before=int(epoch_id))
        if latest is not None:
            merged = merge_registers(
                spark.read.parquet(f"{state_dir}/epoch={latest}"), new
            )
        else:
            merged = new
        rows = merged.collect()  # HLL_M rows max — driver-size by design
        out = spark.createDataFrame(rows, "j long, m_j int")
        out.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir}/epoch={epoch_id}"
        )
        # keep the predecessor snapshot: a retry of this epoch after a
        # post-fold checkpoint-commit failure re-reads it
        prune_state_epochs(
            spark, state_dir,
            keep=latest if latest is not None else int(epoch_id),
        )
        est = estimate(spark, out)
        spark.createDataFrame(
            [(int(epoch_id), float(est))], "epoch long, est_raw double"
        ).write.mode("overwrite").parquet(f"{out_dir}/epoch_id={epoch_id}")

    return fold
