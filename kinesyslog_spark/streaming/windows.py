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


def dedup_events(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "10 minutes") -> DataFrame:
    """W6: stream dedup on event id (P7 uniqueness). Streaming uses
    dropDuplicatesWithinWatermark so state expires; batch is a plain
    dropDuplicates."""
    keys = keys or ["id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
