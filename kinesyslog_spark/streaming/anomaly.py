"""W13 — continuous anomaly detection: q82's hourly z-scores as a
stream against historical baseline statistics.

Pattern: event-time tumbling-window aggregate (watermark-finalized
hourly counts, append mode) ⋈ a STATIC broadcast stats table built by
the batch side (q82's exact integer moments per event type). Each
finalized hour is scored once — z = (n - mean) / std with mean/var
derived from the same exact-integer formula as q82, so a streamed
hour's score is bit-identical to what the batch query would produce
from the same counts.

This is the standard production split: the expensive baseline is a
batch artifact (recomputed daily), the cheap per-window score runs
continuously — a stream-static broadcast join, the one streaming join
shape the surface didn't exercise yet (W8 is stream-stream).

Scale notes: state is the watermark-bounded window aggregate (one
(event_type, hour) counter per live window); the stats table is
event-type-cardinality and broadcasts. Nothing else is stateful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesyslog_spark.queries.pipeline_ops import Z_THRESHOLD


def hourly_baseline_stats(events: DataFrame) -> DataFrame:
    """q82's per-type exact integer moments over a BATCH frame:
    (event_type, m, tot, tot2) — the artifact the stream scores against."""
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    return hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("n").alias("tot"),
        F.sum(F.col("n") * F.col("n")).alias("tot2"),
    )


def score_hourly(counts: DataFrame, stats: DataFrame,
                 threshold: float = Z_THRESHOLD) -> DataFrame:
    """(event_type, hour, n) ⋈ broadcast stats -> anomalous hours.
    Shared by the batch twin and the streaming path (same expressions
    as q82; see queries/pipeline_ops.py for the determinism argument)."""
    mean = F.col("tot") / F.col("m").cast("double")
    var = (F.col("tot2") - F.col("tot") * mean) / (F.col("m") - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        counts.join(F.broadcast(stats), "event_type")
        .filter(
            (F.col("m") > 1)
            & (F.col("tot2") * (F.col("m") - 1)
               > F.col("tot") * F.col("tot") - F.col("tot2"))
        )
        .select("event_type", "hour", "n", z.alias("z"))
        .filter(F.abs("z") >= threshold)
        .select(
            "event_type",
            F.unix_millis(F.col("hour").cast("timestamp")).alias("hour_ms"),
            "n",
            (F.floor(F.col("z") * 10000 + F.lit(0.5)) / 10000).alias("z_q4"),
        )
    )


def anomaly_stream(
    events_stream: DataFrame,
    stats: DataFrame,
    watermark: str = "2 hours",
    threshold: float = Z_THRESHOLD,
) -> DataFrame:
    """W13 transformation: watermark-finalized hourly counts scored
    against the static baseline. Append-mode ready (each hour emits
    exactly once, when the watermark passes its window end)."""
    counts = (
        events_stream.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.col("w.start").alias("hour"), "n")
    )
    return score_hourly(counts, stats, threshold)


def start_anomaly_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    stats: DataFrame,
    checkpoint_dir: str,
    queryName: str = "anomalies",
    **kw,
) -> StreamingQuery:
    out = anomaly_stream(events_stream, stats, **kw)
    return (
        out.writeStream.format("memory")
        .queryName(queryName)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
