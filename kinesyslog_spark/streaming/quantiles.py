"""W23 — continuous quantile monitoring (streaming histogram sketch).

The streaming form of q135: each micro-batch folds its values into a
fixed-frame equi-width histogram partial, and the running p50/p90/p99
are read off the cellwise-SUM of all partials. Unlike W22's HLL
(where MAX-merge made retries idempotent for free), histogram counts
ADD — so exactly-once comes from the W16 epoch-ownership pattern
instead: each epoch OVERWRITES its own `epoch_id=N` partition of
partials, and the reader merges across epochs. A retried epoch
replaces its partial rather than double-counting.

The bucket frame (lo, hi) must be FIXED up front (from a historical
snapshot or domain knowledge) — a per-batch frame would make partials
unmergeable. Values outside the frame clamp into the edge buckets, an
explicit design point: the monitor tracks distribution drift within
the expected envelope, and edge-bucket mass growing is itself the
out-of-envelope alarm.

Scale posture: state is N_BUCKETS rows per epoch partition of driver-
free parquet; per batch one map-side-combined bucket count. Reading
the running quantiles is a merge of tiny partials — cheap enough to
run per alerting tick, not per batch.

Reference parity: none; streaming counterpart of q135
(queries/estimators.py). Replay-tested in
tests/test_streaming_quantiles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesyslog_spark.queries.estimators import N_BUCKETS, Q_PROBS


def batch_histogram(
    batch: DataFrame, value_col: str, lo: float, hi: float
) -> DataFrame:
    """(bkt, c) partial for one batch under the fixed [lo, hi) frame;
    out-of-frame values clamp into the edge buckets."""
    x = F.col(value_col).cast("double")
    bkt = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.floor((x - lo) / (hi - lo) * N_BUCKETS),
            F.lit(N_BUCKETS - 1).cast("long"),
        ),
    )
    return (
        batch.select(bkt.alias("bkt"))
        .groupBy("bkt")
        .agg(F.count("*").alias("c"))
    )


def merged_quantiles(
    spark: SparkSession, partials_dir: str, lo: float, hi: float
) -> list[tuple[float, float]]:
    """Cellwise-SUM every epoch partial under partials_dir and read the
    interpolated quantiles: [(p, est)]. Same interpolation as q135."""
    hist = (
        spark.read.parquet(partials_dir)
        .groupBy("bkt")
        .agg(F.sum("c").alias("c"))
        .orderBy("bkt")
        .collect()
    )
    total = sum(r["c"] for r in hist)
    if total == 0:
        return [(p, float("nan")) for p in Q_PROBS]
    out = []
    for p in Q_PROBS:
        target = p * total
        cum_prev = 0
        for r in hist:
            if cum_prev + r["c"] >= target:
                frac = (target - cum_prev) / r["c"]
                out.append(
                    (p, lo + (hi - lo) * (r["bkt"] + frac) / N_BUCKETS)
                )
                break
            cum_prev += r["c"]
        else:
            out.append((p, hi))
    return out


def streaming_quantiles(
    docs: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    partials_dir: str,
    checkpoint_dir: str,
    trigger: str = "1 second",
) -> StreamingQuery:
    """Fold a value stream into per-epoch histogram partials
    (exactly-once via epoch_id partition overwrite)."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        batch_histogram(batch, value_col, lo, hi).write.mode(
            "overwrite"
        ).parquet(f"{partials_dir}/epoch_id={epoch_id}")

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )
