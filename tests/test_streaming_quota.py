"""W17: continuous token-quota admission (streaming/quota.py) — unit
drive of the stateful body against a pure-Python model, plus a live
replay with cross-batch state."""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from kinesyslog_spark.streaming.quota import (
    doc_token_counts,
    make_quota_fn,
    streaming_quota,
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


def _drive(fn, state, docs):
    pdf = pd.DataFrame(docs, columns=["doc_id", "source", "n_tokens"])
    out = list(fn(("srcA",), iter([pdf]), state))
    return pd.concat(out, ignore_index=True)


def test_quota_body_matches_model():
    fn = make_quota_fn({"srcA": 10})
    st = FakeState()
    # batch 1: arrives out of order — processed in doc_id order
    out = _drive(fn, st, [(2, "srcA", 4), (1, "srcA", 5)])
    got = {int(r.doc_id): (int(r.admitted), int(r.used_after)) for r in out.itertuples()}
    assert got == {1: (1, 5), 2: (1, 9)}
    # batch 2: 3 tokens won't fit (9+3>10); 1 token fits exactly
    out = _drive(fn, st, [(3, "srcA", 3), (4, "srcA", 1)])
    got = {int(r.doc_id): (int(r.admitted), int(r.used_after)) for r in out.itertuples()}
    assert got == {3: (0, 9), 4: (1, 10)}
    # batch 3: quota exhausted — everything rejected, counter frozen
    out = _drive(fn, st, [(5, "srcA", 1)])
    assert list(out.admitted) == [0] and list(out.used_after) == [10]


def test_default_budget_applies_to_unknown_source():
    fn = make_quota_fn({}, default_budget=3)
    st = FakeState()
    out = _drive(fn, st, [(1, "srcA", 2), (2, "srcA", 2)])
    assert list(out.admitted) == [1, 0]


def test_streaming_quota_replay(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    # budget 6 tokens for srcA; srcB unlimited-ish
    b1 = [
        {"doc_id": 1, "source": "srcA", "text": "a b c d"},      # 4 -> admit
        {"doc_id": 2, "source": "srcB", "text": "x y"},          # admit
    ]
    b2 = [
        {"doc_id": 3, "source": "srcA", "text": "e f g"},        # 3 -> reject (4+3>6)
        {"doc_id": 4, "source": "srcA", "text": "h i"},          # 2 -> admit (6)
    ]
    _write_json(os.path.join(in_dir, "b1.json"), b1)
    docs = spark.readStream.schema(
        "doc_id long, source string, text string"
    ).json(in_dir)
    q = streaming_quota(docs, out_dir, ckpt, budgets={"srcA": 6})
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        _write_json(os.path.join(in_dir, "b2.json"), b2)

        def decided():
            try:
                return {
                    r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()
                }
            except Exception:
                return {}

        while time.time() < deadline and len(decided()) < 4:
            time.sleep(0.5)
        got = decided()
        assert set(got) == {1, 2, 3, 4}
    finally:
        q.stop()

    assert got[1]["admitted"] == 1 and got[1]["used_after"] == 4
    assert got[2]["admitted"] == 1
    assert got[3]["admitted"] == 0 and got[3]["used_after"] == 4
    assert got[4]["admitted"] == 1 and got[4]["used_after"] == 6


def test_stage1_counts(spark):
    df = spark.createDataFrame(
        [(1, "s", "Hello, world 42!"), (2, "s", "")],
        "doc_id long, source string, text string",
    )
    rows = {r.doc_id: r.n_tokens for r in doc_token_counts(df).collect()}
    assert rows == {1: 3, 2: 0}


from hypothesis import given, settings
from hypothesis import strategies as st

_tokens = st.lists(st.integers(0, 8), min_size=1, max_size=30)
_cuts = st.lists(st.integers(0, 29), max_size=4)


@settings(max_examples=40, deadline=None)
@given(toks=_tokens, cuts=_cuts, budget=st.integers(0, 60))
def test_admission_invariant_under_batch_cuts(toks, cuts, budget):
    """If doc_ids arrive in increasing order across batches, the
    admission decisions must not depend on WHERE the micro-batch
    boundaries fall — same stream, same quota, same verdicts."""
    docs = [(i, "s", n) for i, n in enumerate(toks)]

    def run(batches):
        fn = make_quota_fn({"s": budget})
        st_ = FakeState()
        out = {}
        for b in batches:
            if not b:
                continue
            res = _drive(fn, st_, b)
            for r in res.itertuples():
                out[int(r.doc_id)] = (int(r.admitted), int(r.used_after))
        return out

    one = run([docs])
    points = sorted({c for c in cuts if c < len(docs)})
    split, prev = [], 0
    for c in points:
        split.append(docs[prev:c])
        prev = c
    split.append(docs[prev:])
    assert run(split) == one
