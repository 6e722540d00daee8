r"""Event-time windowing surface W1-W4 + W6 (SURVEY §2c).

Every function takes an event DataFrame (batch OR streaming — the
expressions are identical; only triggers/watermarks differ at the sink)
with an event-time column `ts` and returns the windowed aggregate.

Watermark policy (W4): the reference accepts any event time and falls
back to receive time for unparsable stamps (message.py:99-107). The
streaming twin bounds state instead: `with_late_data_policy` stamps
too-late rows with processing time *before* the watermark drop would
discard them, mirroring the reference's never-drop behavior while keeping
state finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    watermark: str | None = "1 hour") -> DataFrame:
    """W1: count/sum per (tumbling window, event_type)."""
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select("w.start", "w.end", "event_type", "n", "total_value")
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes",
                   watermark: str | None = "1 hour") -> DataFrame:
    """W2: overlapping windows — each event lands in width/slide panes."""
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select("w.start", "w.end", "event_type", "n")
    )


def session_windows(events: DataFrame, gap: str = "5 seconds",
                    key: str = "user_id",
                    watermark: str | None = "1 hour") -> DataFrame:
    """W3: gap-based sessions per key — the streaming-native form of the
    reference's unenforced 5-s GELF reassembly window (protocol.py:288)."""
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), key)
        .agg(F.count("*").alias("n"))
        .select("w.start", "w.end", key, "n")
    )


def with_late_data_policy(events: DataFrame, max_lateness: str = "1 hour") -> DataFrame:
    """W4 policy: events older than max_lateness (vs. processing time) get
    their event time replaced with processing time — the P6 rewrite
    semantics applied to lateness, so nothing is silently dropped by the
    watermark that follows."""
    too_late = F.col("ts") < F.current_timestamp() - F.expr(f"INTERVAL {max_lateness}")
    return events.withColumn(
        "ts", F.when(too_late, F.current_timestamp()).otherwise(F.col("ts"))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "10 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """W8: stream-stream interval join — correlate two event streams on a
    key where the right event lands within [left.ts, left.ts + within]
    (click-to-conversion attribution shape).

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can expire join state (without the time bound a
    stream-stream join buffers both sides forever). Works identically on
    batch frames (watermarks become no-ops) — the batch twin is what the
    correctness tests assert on.

    Scale: state is hash-partitioned by the join key; per-key state holds
    only `within + watermark` worth of rows per side. Outer modes emit
    nulls only once the watermark passes, so `how='left_outer'` results
    arrive delayed by the watermark — that's Spark semantics, not a bug.
    """
    lt = left.withColumnRenamed("ts", "l_ts")
    rt = right.select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, "ts")],
    )
    if lt.isStreaming:
        lt = lt.withWatermark("l_ts", watermark)
    if rt.isStreaming:
        rt = rt.withWatermark("r_ts", watermark)
    cond = (
        (F.col(key) == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return lt.join(rt, cond, how).drop("r_key")


def dedup_events(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "10 minutes") -> DataFrame:
    """W6: stream dedup on event id (P7 uniqueness). Streaming uses
    dropDuplicatesWithinWatermark so state expires; batch is a plain
    dropDuplicates."""
    keys = keys or ["id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
