"""W5 twin for F2/F3: continuous octet framing (streaming/framing.py).

The load-bearing check is the hypothesis parity property: for ANY
chunking of any byte stream, incremental emissions + close-flush equal
the batch framer's output on the whole stream.
"""

from __future__ import annotations

import pytest

import json
import os
import time

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesyslog_spark.operators.framing import _frame_buffer
from kinesyslog_spark.streaming.framing import (
    _frame_incremental,
    make_framing_fn,
    streaming_frame_octet,
)

# byte streams mixing octet-counted frames, terminator frames, garbage
_stream = st.lists(
    st.one_of(
        st.binary(min_size=0, max_size=20).map(
            lambda b: f"{len(b)} ".encode() + b          # octet-counted
        ),
        st.binary(min_size=0, max_size=20).map(
            lambda b: b.replace(b"\n", b".") + b"\n"     # terminator
        ),
        st.binary(min_size=0, max_size=12),              # raw garbage
    ),
    max_size=8,
).map(b"".join)


@settings(max_examples=200, deadline=None)
@given(data=_stream, cuts=st.lists(st.integers(0, 120), max_size=5))
def test_incremental_parity_property(data, cuts):
    bounds = sorted({min(c, len(data)) for c in cuts})
    pieces, prev = [], 0
    for b in bounds + [len(data)]:
        pieces.append(data[prev:b])
        prev = b
    got, buf = [], b""
    for piece in pieces:
        buf += piece
        msgs, buf = _frame_incremental(buf)
        got.extend(msgs)
    got.extend(_frame_buffer(buf))  # close-flush
    assert got == _frame_buffer(data)


def test_incremental_holds_partial_octet():
    msgs, rest = _frame_incremental(b"10 abc")
    assert msgs == [] and rest == b"10 abc"
    msgs, rest = _frame_incremental(b"10 abc" + b"defghij")
    assert msgs == [b"abcdefghij"] and rest == b""


def test_incremental_holds_open_digit_run():
    msgs, rest = _frame_incremental(b"5 hello123")
    assert msgs == [b"hello"] and rest == b"123"


class FakeState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True

    def remove(self):
        self._v, self.exists = None, False

    def setTimeoutDuration(self, ms):
        pass


def test_runaway_buffer_force_frames():
    import pandas as pd

    fn = make_framing_fn(max_buffer=100)
    st_ = FakeState()
    # declares a 10 MB body that never arrives, then stalls
    pdf = pd.DataFrame(
        [{"conn_id": 1, "chunk_seq": 0,
          "payload": b"10000000 " + b"x" * 200}]
    )
    out = pd.concat(list(fn((1,), iter([pdf]), st_)))
    # force-framed: the digits+space+body flushed via batch semantics
    assert len(out) == 1 and bytes(out.iloc[0]["message"]) == b"x" * 200
    leftover, n = st_.get
    assert leftover == b"" and n == 1


@pytest.mark.slow
def test_stream_frames_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "chunks")
    os.makedirs(in_dir)

    def wr(name, rows):
        tmp = os.path.join(in_dir, name + ".tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, os.path.join(in_dir, name))

    # batch 1: one complete frame + the head of a straddling octet frame
    wr("b1.json", [
        {"conn_id": 7, "chunk_seq": 0, "payload": "5 hello13 split-"},
    ])
    chunks = (
        spark.readStream.schema("conn_id long, chunk_seq long, payload string")
        .json(in_dir)
        .selectExpr("conn_id", "chunk_seq", "encode(payload, 'UTF-8') AS payload")
    )
    out = streaming_frame_octet(chunks, idle_ms=15000)
    q = (
        out.writeStream.format("memory").queryName("framed_sink")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        def rows():
            return {
                (r["conn_id"], r["msg_seq"], bytes(r["message"]))
                for r in spark.sql("SELECT * FROM framed_sink").collect()
            }

        deadline = time.time() + 60
        while time.time() < deadline and (7, 0, b"hello") not in rows():
            time.sleep(0.5)
        assert (7, 0, b"hello") in rows()
        assert len(rows()) == 1, "straddling frame must be held, not emitted"

        # batch 2: the body tail arrives -> frame completes
        wr("b2.json", [
            {"conn_id": 7, "chunk_seq": 1, "payload": "message"},
        ])
        while time.time() < deadline and (7, 1, b"split-message") not in rows():
            time.sleep(0.5)
        assert (7, 1, b"split-message") in rows()
        # a terminator-less tail is held, then flushed by the idle
        # timeout (connection-close analog)
        wr("b3.json", [
            {"conn_id": 7, "chunk_seq": 2, "payload": "tail no term"},
        ])
        flush_deadline = time.time() + 45
        while time.time() < flush_deadline and (7, 2, b"tail no term") not in rows():
            time.sleep(0.5)
        assert (7, 2, b"tail no term") in rows(), "idle flush missing"
    finally:
        q.stop()
