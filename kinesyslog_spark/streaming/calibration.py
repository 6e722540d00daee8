"""W31 — continuous calibration monitoring (streaming q164).

Confidence/label pairs arrive continuously (a shadow-deployed
classifier's predictions joined with delayed ground truth) and the
running reliability diagram + ECE must be readable after every epoch.
The per-bin (n, n_pos, sum_p) calibration histogram is the mergeable
state — all three columns SUM-merge (sum_p is an exact DECIMAL sum of
1e-6-quantized confidences, so merge order cannot perturb it), and the
per-epoch report is recomputed from the merged histogram through the
SAME code path as the batch twin (queries/mlops.py:
calibration_from_hist — parity by construction, pinned in
tests/test_streaming_calibration.py).

State/exactly-once: the W27/W29 epoch-snapshot pattern — histogram
under state_dir/epoch=N (latest-complete resolution via Hadoop FS),
per-epoch report under out_dir/epoch_id=N by overwrite; retried epochs
merge into the snapshot strictly BEFORE their id (SUM-merge is not
retry-idempotent) and pruning keeps that predecessor.

Scale posture: per-batch work is one map-side-combined histogram
aggregate; state is <= CAL_BINS rows forever.

Reference parity: none; §2c extension (q164's streaming twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesyslog_spark.queries.mlops import calibration_from_hist, conf_bins
from kinesyslog_spark.streaming.epoch_state import (
    latest_state_epoch,
    prune_state_epochs,
)

_HIST_SCHEMA = "bin long, n long, n_pos long, sum_p decimal(20,6)"


def merge_hists(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("bin")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("n_pos").cast("long").alias("n_pos"),
            F.sum("sum_p").cast("decimal(20,6)").alias("sum_p"),
        )
    )


def make_fold(out_dir: str, state_dir: str):
    """foreachBatch body over a (p DECIMAL-compatible, y) stream,
    exposed for direct retry-contract tests."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        conf = batch.select(
            F.col("p").cast("decimal(10,6)").alias("p"),
            F.col("y").cast("int").alias("y"),
        )
        new = conf_bins(conf).select(
            "bin", "n", "n_pos",
            F.col("sum_p").cast("decimal(20,6)").alias("sum_p"),
        )
        latest = latest_state_epoch(spark, state_dir, before=int(epoch_id))
        if latest is not None:
            cum = merge_hists(
                spark.read.parquet(f"{state_dir}/epoch={latest}"), new
            )
        else:
            cum = new
        rows = cum.collect()  # <= CAL_BINS rows — driver-size by design
        snap = spark.createDataFrame(rows, _HIST_SCHEMA)
        snap.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir}/epoch={epoch_id}"
        )
        prune_state_epochs(
            spark, state_dir,
            keep=latest if latest is not None else int(epoch_id),
        )
        calibration_from_hist(snap).select(
            F.lit(int(epoch_id)).alias("epoch"),
            "bin", "n", "n_pos", "mean_conf", "emp_rate", "ece_contrib",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/epoch_id={epoch_id}"
        )

    return fold


def streaming_calibration(
    scored: DataFrame, out_dir: str, state_dir: str, checkpoint_dir: str,
    trigger: str = "1 second",
) -> StreamingQuery:
    """Continuously fold (p, y) examples into the calibration histogram;
    the running reliability report lands under out_dir/epoch_id=N."""
    return (
        scored.writeStream.foreachBatch(make_fold(out_dir, state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )
