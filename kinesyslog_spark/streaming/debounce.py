"""W19 — continuous event debounce: emit only the FIRST event of each
burst per (user_id, event_type) on a live stream — the streaming twin
of q116's trailing/gap debounce (a new event EXTENDS the suppression
window; a burst ends after DEBOUNCE_S of quiet). The alert-dedup /
edge-trigger shape: downstream consumers see one row per burst, the
moment the burst starts.

Shape (the W17 pattern): stateless key projection, then
`applyInPandasWithState` keyed by (user_id, event_type) holding ONE
long — the last-seen event time of the current burst. Events are
processed in (ts, event_id) order within a batch; an event is emitted
iff the state is empty or its gap from last-seen exceeds DEBOUNCE_S;
last-seen always advances (suppressed events extend the window,
matching q116's batch semantics for in-order arrival).

Scale posture: one long of state per active key; state for idle keys
expires via processing-time timeout (a burst more than TTL old can
never be extended by an in-order stream, so expiry is semantics-free
there; late out-of-order stragglers after expiry re-emit — the
documented at-least-once trade-off, same class as W9/W14's caps).

Reference parity: none; streaming counterpart of SURVEY §2b q116.
Replay-tested against the batch twin on ordered arrival.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEBOUNCE_MS = 30_000
STATE_TTL_MS = 3_600_000  # idle-key expiry (1 h)

OUT_SCHEMA = "user_id long, event_type string, event_id long, ts_ms long"
_STATE_SCHEMA = "last_ms long"


def keyed_events(events: DataFrame, ts_col: str = "ts",
                 with_event_time: bool = False) -> DataFrame:
    """Stage 1 (stateless): (user_id, event_type, event_id, ts_ms
    [, ts_event timestamp — the watermark column of the event-time
    variant])."""
    cols = [
        F.col("user_id"), F.col("event_type"), F.col("event_id"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
    ]
    if with_event_time:
        cols.append(F.col(ts_col).cast("timestamp").alias("ts_event"))
    return events.select(*cols)


def make_debounce_fn(debounce_ms: int = DEBOUNCE_MS,
                     ttl_ms: int | None = STATE_TTL_MS):
    """applyInPandasWithState body, keyed by (user_id, event_type)."""

    def debounce_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cols = ["user_id", "event_type", "event_id", "ts_ms"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        (last_ms,) = state.get if state.exists else (None,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_ms", "event_id"])
        rows = []
        for _, r in batch.iterrows():
            ts = int(r["ts_ms"])
            if last_ms is None or ts > last_ms + debounce_ms:
                rows.append(
                    {"user_id": int(key[0]), "event_type": str(key[1]),
                     "event_id": int(r["event_id"]), "ts_ms": ts}
                )
            last_ms = ts if last_ms is None else max(last_ms, ts)
        state.update((int(last_ms),))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(rows, columns=cols)

    return debounce_fn


def debounce(keyed: DataFrame, debounce_ms: int = DEBOUNCE_MS) -> DataFrame:
    """Stage 2 over a (streaming) stage-1 frame."""
    return keyed.groupBy("user_id", "event_type").applyInPandasWithState(
        make_debounce_fn(debounce_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Event-time variant: watermark-confirmed bursts (leading + trailing edge)
# ---------------------------------------------------------------------------
# ProcessingTimeTimeout never fires under Trigger.AvailableNow (W9-TTL
# r10, W19 r11), so the base layout's idle-state expiry is untestable
# under deterministic replay — and its expiry points depend on
# wall-clock, not the data. This variant keys the burst CLOSE to the
# watermark: state expires (and the burst's trailing edge emits) when
# the watermark passes last-event + debounce_ms, i.e. when the stream
# itself proves the quiet period. Replay of a recorded stream evicts at
# identical points every run.

OUT_SCHEMA_ET = ("user_id long, event_type string, event_id long, "
                 "ts_ms long, kind string")
_STATE_SCHEMA_ET = "first_id long, first_ms long, last_id long, last_ms long"


def make_debounce_fn_event(debounce_ms: int = DEBOUNCE_MS):
    """applyInPandasWithState body (EventTimeTimeout), keyed by
    (user_id, event_type). Emits kind='start' on the first event of a
    burst (same rows as the base layout) and kind='end' with the
    burst's LAST event when the watermark confirms the gap."""

    def debounce_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cols = ["user_id", "event_type", "event_id", "ts_ms", "kind"]
        if state.hasTimedOut:
            first_id, first_ms, last_id, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": int(key[0]), "event_type": str(key[1]),
                  "event_id": int(last_id), "ts_ms": int(last_ms),
                  "kind": "end"}],
                columns=cols,
            )
            return
        st = state.get if state.exists else None
        first_id, first_ms, last_id, last_ms = st or (None,) * 4
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_ms", "event_id"])
        rows = []
        for _, r in batch.iterrows():
            ts, eid = int(r["ts_ms"]), int(r["event_id"])
            if last_ms is None or ts > last_ms + debounce_ms:
                if last_ms is not None:
                    # gap proven by in-batch data: close the previous
                    # burst inline (the watermark only needs to close
                    # the LAST burst of the key)
                    rows.append(
                        {"user_id": int(key[0]),
                         "event_type": str(key[1]),
                         "event_id": int(last_id), "ts_ms": int(last_ms),
                         "kind": "end"})
                rows.append(
                    {"user_id": int(key[0]), "event_type": str(key[1]),
                     "event_id": eid, "ts_ms": ts, "kind": "start"})
                first_id, first_ms = eid, ts
            if last_ms is None or ts >= last_ms:
                last_id, last_ms = eid, ts
        state.update((int(first_id), int(first_ms),
                      int(last_id), int(last_ms)))
        wm = int(state.getCurrentWatermarkMs())
        state.setTimeoutTimestamp(max(int(last_ms) + debounce_ms, wm + 1))
        yield pd.DataFrame(rows, columns=cols)

    return debounce_fn


def debounce_event_time(keyed: DataFrame,
                        debounce_ms: int = DEBOUNCE_MS,
                        watermark_delay: str = "0 seconds") -> DataFrame:
    """Stage 2 (event-time layout) over a stage-1 frame that carries
    `ts_event` (keyed_events with_event_time=True). Start rows are the
    base layout's output; end rows are the trailing edges the base
    layout cannot express."""
    return (
        keyed.withWatermark("ts_event", watermark_delay)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            make_debounce_fn_event(debounce_ms),
            outputStructType=OUT_SCHEMA_ET,
            stateStructType=_STATE_SCHEMA_ET,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_debounce(events: DataFrame, out_dir: str, checkpoint_dir: str,
                       ts_col: str = "ts",
                       debounce_ms: int = DEBOUNCE_MS,
                       trigger: str = "1 second") -> StreamingQuery:
    """Debounce a streaming event frame continuously; burst-start rows
    append to `out_dir` as parquet."""
    out = debounce(keyed_events(events, ts_col), debounce_ms)
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(processingTime=trigger)
        .start()
    )
