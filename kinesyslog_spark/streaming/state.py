r"""W5 — arbitrary stateful streaming: chunked-GELF reassembly with the
5-second timeout the reference left as a TODO (protocol.py:288).

`applyInPandasWithState` keyed by msg_id; state = the chunks seen so far.
Semantics mirror gelf.py:11-50: chunks dedup by seq (first wins,
gelf.py:41-44), emit when all `chunk_cnt` arrive, cap 128 chunks
(gelf.py:20); PLUS the fix: a processing-time timeout clears incomplete
groups so state is bounded (the reference grows without bound).

The pure-Python core (`_ChunkAssembler`) is separated from the Spark
wiring so the state-machine semantics (dedup, completion, overflow,
timeout) unit-test without a streaming harness; the streaming test in
tests/test_streaming.py replays chunk files through the real query.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesyslog_spark.constants import GELF_MAX_CHUNKS

OUTPUT_SCHEMA = "msg_id long, n_chunks int, message binary"
STATE_SCHEMA = "seqs array<int>, payloads array<binary>, total int"
DEFAULT_TIMEOUT_MS = 5000


class _ChunkAssembler:
    """gelf.py GelfMessage semantics as a pure function of chunk batches."""

    def __init__(self, seqs: list[int] | None = None,
                 payloads: list[bytes] | None = None, total: int = -1):
        self.chunks: dict[int, bytes] = dict(zip(seqs or [], payloads or []))
        self.total = total

    def add(self, seq: int, cnt: int, payload: bytes) -> None:
        if cnt > GELF_MAX_CHUNKS:  # gelf.py:20 assert -> drop group
            self.total = -2
            return
        if self.total == -1:
            self.total = cnt
        if seq < 0 or seq >= self.total:
            # Out-of-range seq = corrupt/mismatched header: poison the
            # group. The reference indexes a fixed-size parts list
            # (gelf.py:21,44) so such a chunk can never be accepted;
            # counting it toward `complete` would emit a message
            # assembled with a middle chunk missing.
            self.total = -2
            return
        if seq not in self.chunks:  # dedup, first chunk wins (gelf.py:41-44)
            self.chunks[seq] = payload

    @property
    def complete(self) -> bool:
        return self.total > 0 and len(self.chunks) >= self.total

    @property
    def poisoned(self) -> bool:
        return self.total == -2

    def assemble(self) -> bytes:
        return b"".join(p for _, p in sorted(self.chunks.items()))

    def to_state(self) -> tuple[list[int], list[bytes], int]:
        return (list(self.chunks.keys()), list(self.chunks.values()), self.total)


def make_reassemble_fn(timeout_ms: int = DEFAULT_TIMEOUT_MS):
    """applyInPandasWithState body factory for chunk rows
    (msg_id, chunk_seq, chunk_cnt, payload)."""

    def reassemble_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (msg_id,) = key
        if state.hasTimedOut:
            # The fixed TODO: incomplete after the window -> discard state.
            state.remove()
            yield pd.DataFrame(columns=["msg_id", "n_chunks", "message"])
            return

        asm = _ChunkAssembler(*state.get) if state.exists else _ChunkAssembler()
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                asm.add(int(row.chunk_seq), int(row.chunk_cnt), bytes(row.payload))

        if asm.complete or asm.poisoned:
            if state.exists:
                state.remove()
            if asm.complete:
                yield pd.DataFrame(
                    [{"msg_id": msg_id, "n_chunks": asm.total, "message": asm.assemble()}]
                )
                return
            yield pd.DataFrame(columns=["msg_id", "n_chunks", "message"])
            return

        state.update(asm.to_state())
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(columns=["msg_id", "n_chunks", "message"])

    return reassemble_fn


# Default-config body (importable for direct unit testing).
reassemble_fn = make_reassemble_fn()


def reassemble_chunks_stream(chunks, timeout_ms: int = DEFAULT_TIMEOUT_MS):
    """Streaming chunk reassembly: groupBy(msg_id) + stateful apply.

    NOTE: with ProcessingTimeTimeout the query schedules state-cleanup
    micro-batches continuously, so `processAllAvailable()` on a consumer
    never settles — poll the sink instead (see tests/test_streaming.py)."""
    return chunks.groupBy("msg_id").applyInPandasWithState(
        make_reassemble_fn(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def reassemble_chunks_session_window(
    chunks,
    gap: str = "5 seconds",
    time_col: str = "recv_ts",
    watermark: str = "30 seconds",
):
    """F6 via `session_window` — the built-in-state twin of
    `reassemble_chunks_stream`, identical output schema.

    Trade-off: state lives in the windowed-aggregation store (no custom
    state schema; RocksDB-backed at scale; watermark expiry bounds it for
    free), but a completed message emits only once its session closes
    (latency = gap + watermark lag), whereas the `applyInPandasWithState`
    variant emits the instant the last chunk lands. Works identically on
    batch DataFrames (session_window is a plain grouping expression
    there), which is how the parity test drives it.

    Semantics per gelf.py:11-50: dedup by chunk_seq keeping the earliest
    arrival (array_sort over (seq, recv_ts) + adjacent-seq filter =
    first-wins, gelf.py:41-44); emit only when all `chunk_cnt` chunks
    arrived; groups declaring > 128 chunks are dropped (gelf.py:20);
    incomplete sessions simply never emit — the 5-s window the reference
    left unenforced (protocol.py:288)."""
    from pyspark.sql import functions as F

    if chunks.isStreaming:
        chunks = chunks.withWatermark(time_col, watermark)
    agg = chunks.groupBy(
        F.session_window(F.col(time_col), gap).alias("w"), "msg_id"
    ).agg(
        F.array_sort(
            F.collect_list(F.struct("chunk_seq", F.col(time_col).alias("t"), "payload"))
        ).alias("arr"),
        F.max("chunk_cnt").alias("total"),
    )
    ded = F.expr("filter(arr, (x, i) -> i = 0 OR x.chunk_seq <> arr[i-1].chunk_seq)")
    return (
        agg.select("msg_id", "total", ded.alias("ded"))
        .filter(
            (F.col("total") <= GELF_MAX_CHUNKS)
            & (F.size("ded") == F.col("total"))
            # out-of-range seq = corrupt header -> drop the group, same
            # as _ChunkAssembler's poison path (bounded parts array,
            # gelf.py:21,44)
            & F.expr("forall(ded, x -> x.chunk_seq >= 0 AND x.chunk_seq < total)")
        )
        .select(
            "msg_id",
            F.col("total").alias("n_chunks"),
            F.expr(
                "aggregate(transform(ded, x -> x.payload),"
                " cast('' as binary), (acc, p) -> concat(acc, p))"
            ).alias("message"),
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas twin — the third implementation of
# F6, on the new StatefulProcessor API (typed state variables + explicit
# timers instead of applyInPandasWithState's single state tuple).
# Same semantics as reassemble_chunks_stream: dedup by seq (first wins),
# emit the instant the last chunk lands, 5-s processing-time timer
# clears incomplete groups (the reference's unenforced TODO,
# protocol.py:288). State variables are RocksDB-backed per key at scale;
# the ListState holds at most GELF_MAX_CHUNKS elements per message id.
# ---------------------------------------------------------------------------

def make_chunk_processor(timeout_ms: int = DEFAULT_TIMEOUT_MS):
    from pyspark.sql.streaming import StatefulProcessor

    class ChunkStatefulProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._chunks = handle.getListState("chunks", "seq int, payload binary")
            self._total = handle.getValueState("total", "total int")

        def handleInputRows(self, key, rows, timer_values):
            asm = _ChunkAssembler(
                *(lambda prs: (
                    [r[0] for r in prs], [bytes(r[1]) for r in prs]
                ))(list(self._chunks.get()) if self._chunks.exists() else []),
                total=(self._total.get()[0] if self._total.exists() else -1),
            )
            first_contact = asm.total == -1 and not asm.chunks
            for pdf in rows:
                for _, r in pdf.iterrows():
                    asm.add(int(r["chunk_seq"]), int(r["chunk_cnt"]), bytes(r["payload"]))
            if asm.complete:
                msg = asm.assemble()
                self._chunks.clear()
                self._total.clear()
                for t in self._handle.listTimers():
                    self._handle.deleteTimer(t)
                yield pd.DataFrame(
                    {"msg_id": [key[0]], "n_chunks": [asm.total], "message": [msg]}
                )
                return
            if asm.total == -2:  # overflow: drop group (gelf.py:20)
                self._chunks.clear()
                self._total.clear()
                return
            if first_contact:
                self._handle.registerTimer(
                    timer_values.getCurrentProcessingTimeInMs() + timeout_ms
                )
            self._chunks.clear()
            self._chunks.appendList([
                (s, p) for s, p in sorted(asm.chunks.items())
            ])
            self._total.update((asm.total,))
            return

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            # timeout: discard the incomplete message, emit nothing
            self._chunks.clear()
            self._total.clear()
            yield from ()

        def close(self) -> None:
            pass

    return ChunkStatefulProcessor()


def reassemble_chunks_tws(chunks, timeout_ms: int = DEFAULT_TIMEOUT_MS):
    """F6 on `transformWithStateInPandas` (Spark 4 StatefulProcessor).

    Output schema and emission timing match `reassemble_chunks_stream`;
    prefer this variant on Spark 4 clusters — typed state variables
    (ListState/ValueState) map directly onto RocksDB column families and
    timers are first-class instead of encoded into the state tuple."""
    return chunks.groupBy("msg_id").transformWithStateInPandas(
        make_chunk_processor(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="ProcessingTime",
    )


# ---------------------------------------------------------------------------
# Keyed reassembly variant for the live GELF relay: chunks of one message
# arrive from one (source, dest) socket pair, so keying by
# (msg_id, source, dest) carries the envelope columns through the
# stateful op without a post-hoc stream join; state additionally tracks
# the latest receive time (the assembled message's receive time is its
# last chunk's, message.py receive semantics).
# ---------------------------------------------------------------------------

KEYED_OUTPUT_SCHEMA = (
    "msg_id long, source string, dest int, recv_us long, message binary"
)
KEYED_STATE_SCHEMA = (
    "seqs array<int>, payloads array<binary>, total int, recv_us long"
)


def make_reassemble_keyed_fn(timeout_ms: int = DEFAULT_TIMEOUT_MS):
    """applyInPandasWithState body for (msg_id, source, dest)-keyed chunk
    rows (chunk_seq, chunk_cnt, payload, recv_us)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        msg_id, source, dest = key
        cols = ["msg_id", "source", "dest", "recv_us", "message"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=cols)
            return

        if state.exists:
            seqs, payloads, total, recv_us = state.get
            asm = _ChunkAssembler(seqs, payloads, total)
        else:
            asm, recv_us = _ChunkAssembler(), 0
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                # Defense in depth for malformed headers: upstream filters
                # null seq/cnt, but a NaN here must not kill the query —
                # the checkpoint would replay it forever.
                if pd.isna(row.chunk_seq) or pd.isna(row.chunk_cnt):
                    continue
                asm.add(int(row.chunk_seq), int(row.chunk_cnt), bytes(row.payload))
                recv_us = max(recv_us, int(row.recv_us))

        if asm.complete or asm.poisoned:
            if state.exists:
                state.remove()
            if asm.complete:
                yield pd.DataFrame(
                    [{"msg_id": msg_id, "source": source, "dest": dest,
                      "recv_us": recv_us, "message": asm.assemble()}]
                )
                return
            yield pd.DataFrame(columns=cols)
            return

        state.update((*asm.to_state(), recv_us))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(columns=cols)

    return fn


def reassemble_chunks_stream_keyed(chunks,
                                   timeout_ms: int = DEFAULT_TIMEOUT_MS):
    """Keyed streaming reassembly: input (msg_id long, source string,
    dest int, chunk_seq int, chunk_cnt int, payload binary,
    recv_us long) -> KEYED_OUTPUT_SCHEMA rows on completion."""
    return chunks.groupBy("msg_id", "source", "dest").applyInPandasWithState(
        make_reassemble_keyed_fn(timeout_ms),
        outputStructType=KEYED_OUTPUT_SCHEMA,
        stateStructType=KEYED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
