"""W5 twin for F2/F3 — continuous octet-counted framing over a live
TCP chunk stream (`applyInPandasWithState` per connection).

The batch op (`operators/framing.py:frame_octet_counted`) needs each
connection's complete byte stream; on a live socket feed the stream
arrives as chunks across micro-batches and a frame can straddle the
boundary. This operator keeps (leftover bytes, emitted count) per
conn_id, emits every frame that COMPLETES in the batch, and holds the
tail:

- a digit-run still open at buffer end might become an octet header ->
  hold;
- an octet body shorter than its declared length -> hold;
- a terminator segment with no terminator yet -> hold.

An idle timeout (ProcessingTimeTimeout) is the connection-close analog:
the held tail is flushed through the batch framer's close semantics
(`_frame_buffer`, protocol.py:56-58 flush-on-close) and state drops.

Parity invariant (hypothesis-pinned in tests/test_streaming_framing.py):
for ANY chunking of a byte stream, incremental emissions + close-flush
of the final leftover == `_frame_buffer(whole stream)` — the same
chunk-split invariance the batch op guarantees, extended across
micro-batches.

Runaway-peer guard (reference protocol.py:115-126 pauses reads at a
288 KiB buffer): if the held leftover exceeds MAX_MESSAGE_BUFFER, the
buffer is force-framed immediately (emitting what it can, flushing the
tail) and framing restarts clean — bounded state per connection, no
unbounded growth from a peer that declares a huge octet length and
stalls.

Ordering contract: chunk_seq is the per-connection TCP byte order
(sorted within each batch; batches are assumed ordered per key, which
file/socket sources preserve).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesyslog_spark.constants import MAX_MESSAGE_BUFFER, MAX_MESSAGE_LENGTH
from kinesyslog_spark.operators.framing import _frame_buffer

OUTPUT_SCHEMA = "conn_id long, msg_seq long, message binary"
_STATE_SCHEMA = "leftover binary, n_emitted long"
DEFAULT_IDLE_MS = 5000
_TERMS = b"\n\x00\r"


def _frame_incremental(buf: bytes) -> tuple[list[bytes], bytes]:
    """Emit complete frames, hold the undecidable tail. Mirrors
    `_frame_buffer` (protocol.py:144-212) except nothing is flushed at
    buffer end."""
    out: list[bytes] = []
    i, n = 0, len(buf)
    while i < n:
        c = buf[i]
        if 0x30 <= c <= 0x39:  # ASCII digit: octet-counted candidate
            j = i
            while j < n and 0x30 <= buf[j] <= 0x39:
                j += 1
            if j == n:
                break  # digit-run still open: could become '<len> '
            if buf[j] == 0x20:
                length = int(buf[i:j])
                start = j + 1
                if start + length > n:
                    break  # body incomplete: hold
                out.append(buf[start:start + length][:MAX_MESSAGE_LENGTH])
                i = start + length
                continue
            # digit-leading garbage -> terminator framing for the segment
        k = i
        while k < n and buf[k] not in _TERMS:
            k += 1
        if k == n:
            break  # no terminator yet: hold
        if k > i:
            out.append(buf[i:k][:MAX_MESSAGE_LENGTH])
        i = k + 1
    return out, buf[i:]


def make_framing_fn(idle_ms: int = DEFAULT_IDLE_MS,
                    max_buffer: int = MAX_MESSAGE_BUFFER):
    """applyInPandasWithState body, keyed by conn_id."""

    def framing_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conn_id,) = key
        if state.hasTimedOut:
            # Connection idle/closed: flush the tail with the batch
            # framer's close semantics.
            leftover, n_emitted = state.get
            state.remove()
            msgs = _frame_buffer(bytes(leftover)) if leftover else []
            yield pd.DataFrame(
                [{"conn_id": conn_id, "msg_seq": n_emitted + s, "message": m}
                 for s, m in enumerate(msgs)],
                columns=["conn_id", "msg_seq", "message"],
            )
            return

        leftover, n_emitted = ((bytes(state.get[0]), int(state.get[1]))
                               if state.exists else (b"", 0))
        chunks: list[bytes] = []
        for pdf in pdfs:
            for row in pdf.sort_values("chunk_seq").itertuples(index=False):
                chunks.append(bytes(row.payload))
        buf = leftover + b"".join(chunks)

        msgs, leftover = _frame_incremental(buf)
        if len(leftover) > max_buffer:
            # Runaway peer (protocol.py:115-126): force-frame and reset.
            msgs.extend(_frame_buffer(leftover))
            leftover = b""
        out = pd.DataFrame(
            [{"conn_id": conn_id, "msg_seq": n_emitted + s, "message": m}
             for s, m in enumerate(msgs)],
            columns=["conn_id", "msg_seq", "message"],
        )
        state.update((leftover, n_emitted + len(msgs)))
        state.setTimeoutDuration(idle_ms)
        yield out

    return framing_fn


def streaming_frame_octet(chunks: DataFrame,
                          idle_ms: int = DEFAULT_IDLE_MS) -> DataFrame:
    """F2/F3 over a streaming (conn_id long, chunk_seq long,
    payload binary) chunk feed -> (conn_id, msg_seq, message)."""
    return chunks.groupBy("conn_id").applyInPandasWithState(
        make_framing_fn(idle_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
