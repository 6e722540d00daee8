"""W18 — continuous point-in-time enrichment: a live event stream
joined to a STATIC versioned dimension (q81's SCD2 history) on the
version valid at each event's own time — q112's AS OF join, applied
the moment an event arrives instead of in a nightly batch.

Shape: stream-static LEFT join — the built-in Structured Streaming
join kind that needs no watermark state at all (the static side is a
plain DataFrame; Spark re-plans it per micro-batch). The join is
equi on user_id with the validity range `valid_from <= ts < valid_to`
as residual predicate, exactly the q112 batch plan.

Scale posture (100 TB / continuous):
- No streaming state: the dimension is a broadcast-or-shuffle static
  side, refreshed by swapping the underlying table (the W12 snapshot
  pointer makes that atomic — `streaming/cdc.py` maintains the same
  history incrementally, so W12 + W18 together are the full
  maintain-and-serve loop).
- Per-batch cost is one join of the batch against the dimension;
  history rows per user are O(tier changes), so the per-key probe is
  tiny.

Reference parity: none (no enrichment surface in the reference);
streaming counterpart of SURVEY §2b q112. Parity-tested against the
batch semantics in tests/test_streaming_enrich.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def pit_enrich(events: DataFrame, history: DataFrame,
               ts_col: str = "ts") -> DataFrame:
    """Join each event row to the history version valid at its event
    time. `history` needs (user_id, tier, run_id, valid_from_ms,
    valid_to_ms) — q81's output schema; `events` needs (event_id,
    user_id, ts)."""
    hist = history.select(
        F.col("user_id").alias("h_user"), "tier", "run_id",
        "valid_from_ms", "valid_to_ms",
    )
    ev = events.withColumn(
        "ts_ms", F.unix_millis(F.col(ts_col).cast("timestamp"))
    )
    cond = (
        (ev.user_id == hist.h_user)
        & (F.col("ts_ms") >= F.col("valid_from_ms"))
        & (F.col("valid_to_ms").isNull() | (F.col("ts_ms") < F.col("valid_to_ms")))
    )
    return (
        ev.join(hist, cond, "left")
        .select(
            "event_id", "user_id", "ts_ms",
            F.col("tier").alias("tier_at_event"), "run_id",
        )
    )


def streaming_enrich(events: DataFrame, history: DataFrame, out_dir: str,
                     checkpoint_dir: str, ts_col: str = "ts",
                     trigger: str = "1 second") -> StreamingQuery:
    """Enrich a streaming event frame continuously; enriched rows append
    to `out_dir` as parquet."""
    out = pit_enrich(events, history, ts_col)
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(processingTime=trigger)
        .start()
    )
