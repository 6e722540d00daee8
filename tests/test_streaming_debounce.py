"""W19: continuous debounce (streaming/debounce.py) — unit drive of the
stateful body (cross-batch window extension) + live replay matching the
q116 batch twin on ordered arrival."""

from __future__ import annotations

import pytest

import json
import os
import time

import pandas as pd

from kinesyslog_spark.streaming.debounce import (
    DEBOUNCE_MS,
    keyed_events,
    make_debounce_fn,
    streaming_debounce,
)


class FakeState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):
        self._v, self.exists = None, False

    def setTimeoutDuration(self, ms):
        pass


def _drive(fn, state, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts_ms"])
    out = list(fn((7, "click"), iter([pdf]), state))
    return [int(r.event_id) for r in pd.concat(out, ignore_index=True).itertuples()]


def test_body_gap_semantics_across_batches():
    fn = make_debounce_fn(debounce_ms=30_000)
    st = FakeState()
    # burst: 0s, 20s, 40s (each gap <= 30s -> one burst, only first kept)
    assert _drive(fn, st, [(1, 0), (2, 20_000), (3, 40_000)]) == [1]
    # next batch: 60s still extends the burst; 100s starts a new one
    assert _drive(fn, st, [(4, 60_000), (5, 100_000)]) == [5]
    # quiet then a fresh burst
    assert _drive(fn, st, [(6, 200_000)]) == [6]


def test_body_out_of_order_within_batch():
    fn = make_debounce_fn(debounce_ms=30_000)
    st = FakeState()
    # arrives shuffled; processed in (ts, event_id) order
    assert _drive(fn, st, [(2, 20_000), (1, 0)]) == [1]


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


@pytest.mark.slow
def test_streaming_replay_matches_batch_twin(spark, tmp_path):
    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "bursts")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    b1 = [
        {"event_id": 1, "user_id": 7, "event_type": "click",
         "ts": "2024-01-01 00:00:00"},
        {"event_id": 2, "user_id": 7, "event_type": "click",
         "ts": "2024-01-01 00:00:20"},
        {"event_id": 3, "user_id": 8, "event_type": "view",
         "ts": "2024-01-01 00:00:00"},
    ]
    b2 = [
        # extends user 7's burst (20s gap), then a new burst at +2min
        {"event_id": 4, "user_id": 7, "event_type": "click",
         "ts": "2024-01-01 00:00:40"},
        {"event_id": 5, "user_id": 7, "event_type": "click",
         "ts": "2024-01-01 00:02:00"},
    ]
    _write_json(os.path.join(in_dir, "b1.json"), b1)
    evs = spark.readStream.schema(
        "event_id long, user_id long, event_type string, ts string"
    ).json(in_dir)
    q = streaming_debounce(evs, out_dir, ckpt)
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        _write_json(os.path.join(in_dir, "b2.json"), b2)

        def got():
            try:
                return {
                    r["event_id"] for r in spark.read.parquet(out_dir).collect()
                }
            except Exception:
                return set()

        while time.time() < deadline and got() != {1, 3, 5}:
            time.sleep(0.5)
        assert got() == {1, 3, 5}
    finally:
        q.stop()


def test_stage1_projection(spark):
    df = spark.createDataFrame(
        [(1, 7, "click", "2024-01-01 00:00:00")],
        "event_id long, user_id long, event_type string, ts string",
    )
    r = keyed_events(df).collect()[0]
    assert (r.user_id, r.event_type, r.event_id) == (7, "click", 1)
    assert r.ts_ms == 1704067200000
