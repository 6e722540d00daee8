"""W14: continuous heavy-hitter detection (streaming/heavy.py) —
replay-driven, plus unit checks on the Space-Saving state body."""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from kinesyslog_spark.streaming.heavy import (
    make_heavy_fn,
    sharded_tokens,
    streaming_heavy_hitters,
)


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


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


def _drive(fn, state, toks):
    return list(fn(("s",), iter([pd.DataFrame({"token": toks})]), state))


def test_sharding_is_stable(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], "doc_id long, text string"
    )
    rows = sharded_tokens(df).collect()
    shard_of = {}
    for r in rows:
        assert 0 <= r["shard"] < 8
        prev = shard_of.setdefault(r["token"], r["shard"])
        assert prev == r["shard"], "same token must always shard identically"
    assert sum(1 for r in rows if r["token"] == "alpha") == 2


def test_space_saving_crossing_alert_once():
    fn = make_heavy_fn(capacity=8, min_count=3)
    state = FakeState()
    out1 = _drive(fn, state, ["a", "a", "b"])
    assert out1[0].empty  # nothing has reached 3 yet
    out2 = _drive(fn, state, ["a", "b", "a"])
    alerts = out2[0].to_dict("records")
    assert [a["token"] for a in alerts] == ["a"]
    # the alert fires AT the crossing: 'a' hits 3 on overall row 4
    assert alerts[0]["est_count"] == 3 and alerts[0]["err"] == 0
    assert alerts[0]["stream_len"] == 4
    # already-reported tokens never re-alert
    out3 = _drive(fn, state, ["a", "a"])
    assert out3[0].empty


def test_space_saving_eviction_bounds_state():
    fn = make_heavy_fn(capacity=2, min_count=100)
    state = FakeState()
    _drive(fn, state, ["x", "y", "z", "z"])
    toks_l, counts, errs, reported, slen = state.get
    assert len(toks_l) == 2 and slen == 4
    ent = dict(zip(toks_l, zip(counts, errs)))
    # z evicted the min entry (count 1) and inherited it as error, then
    # incremented on its second arrival
    assert ent["z"] == (3, 1)
    # one-sided guarantee: true count <= est <= true + err
    assert ent["z"][0] - ent["z"][1] <= 2 <= ent["z"][0]


def test_streaming_heavy_hitters_replay(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    flood = " ".join(["flood"] * 30)
    noise1 = " ".join(f"n{i}" for i in range(30))
    _write_json(os.path.join(in_dir, "b1.json"), [
        {"doc_id": 1, "text": flood},
        {"doc_id": 2, "text": noise1},
    ])
    docs = spark.readStream.schema("doc_id long, text string").json(in_dir)
    alerts = streaming_heavy_hitters(docs, min_count=50)
    q = (
        alerts.writeStream.format("memory")
        .queryName("heavy_sink")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def rows():
            return {
                r["token"]: r
                for r in spark.sql("SELECT * FROM heavy_sink").collect()
            }

        deadline = time.time() + 60
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        assert "flood" not in rows()  # 30 < 50: below threshold
        # batch 2 pushes 'flood' over the threshold, cross-batch
        _write_json(os.path.join(in_dir, "b2.json"), [
            {"doc_id": 3, "text": " ".join(["flood"] * 25)},
            {"doc_id": 4, "text": noise1},
        ])
        while time.time() < deadline and "flood" not in rows():
            time.sleep(0.5)
        got = rows()
        assert "flood" in got, f"heavy hitter missed: {got.keys()}"
        r = got["flood"]
        assert r["est_count"] >= 50 and r["err"] == 0
        # exactly one alert per token, and no noise token alerts
        all_rows = spark.sql("SELECT * FROM heavy_sink").collect()
        assert len([x for x in all_rows if x["token"] == "flood"]) == 1
        assert not any(t.startswith("n") for t in got)
    finally:
        q.stop()


def test_space_saving_invariants_property():
    """Space-Saving guarantees, fuzzed: for every summary entry,
    true <= est <= true + err; any token with true count >= slen/capacity
    is guaranteed present; state never exceeds capacity."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.sampled_from("abcdefghij"), min_size=1, max_size=200),
        st.integers(min_value=2, max_value=6),
    )
    def check(stream, capacity):
        fn = make_heavy_fn(capacity=capacity, min_count=10**9)
        state = FakeState()
        _drive(fn, state, stream)
        toks_l, counts, errs, _, slen = state.get
        assert len(toks_l) <= capacity and slen == len(stream)
        true = Counter(stream)
        for t, c, e in zip(toks_l, counts, errs):
            assert true[t] <= c <= true[t] + e, (t, c, e, true[t])
        guarantee = slen / capacity
        for t, n in true.items():
            if n >= guarantee:
                assert t in toks_l, (t, n, guarantee, toks_l)

    check()
