"""W24 — continuous new-log-template detection.

The streaming form of q137: each micro-batch masks its parsed
messages to templates and diffs them against the known-template set;
templates never seen before are emitted as alerts the moment they
appear — the "something new is logging" signal that catches a deploy
gone wrong or a new attack pattern hours before volume anomalies do.

State is the known-template SET persisted as parquet, merged by UNION
per batch. Like W22's MAX-merge, set-union is IDEMPOTENT — a retried
micro-batch re-unioning its templates cannot corrupt the state, so
at-least-once delivery gives exactly-once state for free. (The
per-epoch ALERT output is per-epoch-overwritten like W16/W21, so
alerts are exactly-once too.)

Scale posture: state size is the template cardinality — low by the
nature of template mining (that is what mining is for); a pathological
template explosion (e.g. masking failing to catch a variable field) is
bounded by `max_templates`, past which new templates are still alerted
but no longer remembered (every later occurrence re-alerts — loud,
which is the right failure mode for a broken mask).

Reference parity: none; streaming counterpart of q137
(queries/logmine.py). Replay-tested in tests/test_streaming_templates.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DEFAULT_MAX_TEMPLATES = 100_000


def batch_templates(batch: DataFrame, message_col: str = "message") -> DataFrame:
    """Distinct (template, n_msgs, example) for one batch of parsed
    messages — the q137 masking (digit runs → '#')."""
    masked = batch.select(
        F.regexp_replace(message_col, "[0-9]+", "#").alias("template"),
        F.col(message_col).alias("message"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("template").orderBy("message")
    agg = masked.groupBy("template").agg(F.count("*").alias("n_msgs"))
    ex = (
        masked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("template", F.col("message").alias("example"))
    )
    return agg.join(ex, "template")


def streaming_new_templates(
    docs: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    message_col: str = "message",
    max_templates: int = DEFAULT_MAX_TEMPLATES,
    trigger: str = "1 second",
) -> StreamingQuery:
    """Alert on never-seen templates; union them into the known set
    (write-then-rename, the W22 pattern)."""
    fold = make_fold(state_dir, out_dir, message_col, max_templates)
    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )


def make_fold(state_dir: str, out_dir: str,
              message_col: str = "message",
              max_templates: int = DEFAULT_MAX_TEMPLATES):
    """The W24 foreachBatch body (exposed like the other folds, for the
    decade probe, which drives it availableNow)."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        cur = batch_templates(batch, message_col)
        if os.path.isdir(state_dir):
            known = spark.read.parquet(state_dir)
            new = cur.join(known, "template", "left_anti")
        else:
            known = None
            new = cur
        new_rows = new.collect()  # template-cardinality-bounded
        spark.createDataFrame(
            [(r["template"], r["n_msgs"], r["example"], int(epoch_id))
             for r in new_rows] or [],
            "template string, n_msgs long, example string, epoch long",
        ).write.mode("overwrite").parquet(f"{out_dir}/epoch_id={epoch_id}")

        known_count = known.count() if known is not None else 0
        if new_rows and known_count < max_templates:
            add = spark.createDataFrame(
                [(r["template"],) for r in new_rows], "template string"
            )
            merged = (
                known.select("template").unionByName(add).distinct()
                if known is not None else add.distinct()
            )
            rows = merged.collect()
            out = spark.createDataFrame(rows, "template string")
            tmp = state_dir + ".next"
            out.coalesce(1).write.mode("overwrite").parquet(tmp)
            prev = state_dir + ".prev"
            if os.path.isdir(state_dir):
                os.rename(state_dir, prev)
            os.rename(tmp, state_dir)
            if os.path.isdir(prev):
                import shutil

                shutil.rmtree(prev)

    return fold
