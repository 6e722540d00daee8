"""W9: continuous MinHash near-dup detection (streaming/dedup.py) —
replay-driven, plus unit checks on the stateless signature stage."""

from __future__ import annotations

import pytest

import json
import os
import time

from pyspark.sql import functions as F

from kinesyslog_spark.streaming.dedup import (
    BANDS,
    SIG_K,
    _agreement,
    banded_signatures,
    streaming_neardup,
)

WORDS = ("spark join window vector table scan merge part batch stream "
         "hash filter order group sort value query row data line").split()


def _text(perturb: int | None = None) -> str:
    toks = list(WORDS) * 2
    if perturb is not None:
        toks[perturb] = f"zz{perturb}"
    return " ".join(toks)


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_agreement_estimator():
    assert _agreement("a|b|c", "a|b|c") == 1.0
    assert _agreement("a|b|c", "a|x|y") == 1 / 3


def test_banded_signatures_shape(spark):
    df = spark.createDataFrame(
        [(1, _text()), (2, _text(perturb=3)), (3, "one two")],
        "doc_id long, text string",
    )
    out = banded_signatures(df).collect()
    # doc 3 has < 3 tokens -> filtered; others emit one row per band
    ids = sorted({r["doc_id"] for r in out})
    assert ids == [1, 2]
    assert len(out) == 2 * BANDS
    for r in out:
        assert len(r["sig"].split("|")) == SIG_K
    # near-identical docs share at least one band bucket
    keys = {
        did: {(r["band_idx"], r["band_key"]) for r in out if r["doc_id"] == did}
        for did in ids
    }
    assert keys[1] & keys[2], "near-dups must collide in >= 1 band"


def test_streaming_neardup_replay(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    # batch 1: two unrelated docs
    _write_json(os.path.join(in_dir, "b1.json"), [
        {"doc_id": 1, "text": _text()},
        {"doc_id": 2, "text": " ".join(f"w{i}" for i in range(40))},
    ])
    docs = (
        spark.readStream.schema("doc_id long, text string").json(in_dir)
    )
    matches = streaming_neardup(docs)
    q = (
        matches.writeStream.format("memory")
        .queryName("neardup_sink")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def rows():
            return {
                (r["doc_id"], r["dup_of"])
                for r in spark.sql("SELECT * FROM neardup_sink").collect()
            }

        deadline = time.time() + 60
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        # batch 2: a near-dup of doc 1 (one token changed), a fresh doc,
        # and a same-batch exact dup of that fresh doc
        _write_json(os.path.join(in_dir, "b2.json"), [
            {"doc_id": 3, "text": _text(perturb=5)},
            {"doc_id": 4, "text": " ".join(f"q{i}" for i in range(40))},
            {"doc_id": 5, "text": " ".join(f"q{i}" for i in range(40))},
        ])
        while time.time() < deadline and not rows() >= {(3, 1), (5, 4)}:
            time.sleep(0.5)
        got = rows()
        assert (3, 1) in got, f"cross-batch near-dup missed: {got}"
        assert (5, 4) in got, f"same-batch dup missed: {got}"
        # no false positives: docs 2 and 4 are unrelated to 1/3
        assert not {(2, 1), (4, 1), (4, 2), (4, 3)} & got
        # estimator sanity on the near-dup pair
        sims = [
            r["est_sim"]
            for r in spark.sql("SELECT * FROM neardup_sink").collect()
            if (r["doc_id"], r["dup_of"]) == (3, 1)
        ]
        assert sims and all(s >= 0.5 for s in sims)
    finally:
        q.stop()


def test_bucket_fifo_cap():
    """Unit-drive the stateful body with a fake GroupState: the FIFO cap
    bounds bucket memory and keeps the newest members."""
    import pandas as pd

    from kinesyslog_spark.streaming.dedup import make_bucket_fn

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

    fn = make_bucket_fn(max_bucket_state=3)
    st = FakeState()
    sig = "|".join("x" * 4 for _ in range(SIG_K))
    pdf = pd.DataFrame(
        [{"doc_id": i, "sig": sig} for i in range(6)]
    )
    out = list(fn(("0", "k"), iter([pdf]), st))
    ids, sigs = st.get
    assert ids == [3, 4, 5] and len(sigs) == 3
    # every doc after the first matched at least its predecessor
    matches = pd.concat(out)
    assert (1, 0) in set(zip(matches.doc_id, matches.dup_of))


def test_same_batch_overflow_and_chunk_split_parity():
    """The two state layouts must emit an IDENTICAL multiset even when
    (a) one logical bucket receives more rows than max_bucket_state in a
    SINGLE micro-batch (the trim must happen at state serialization, not
    inside the row loop — an in-loop trim makes later same-batch docs
    compare against an already-evicted member list), and (b) the batch
    arrives as several Arrow chunks with doc_ids out of order across
    chunks (both layouts must sort the WHOLE batch once)."""
    import pandas as pd

    from kinesyslog_spark.streaming.dedup import (
        make_bucket_fn,
        make_coarse_bucket_fn,
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

    cap = 3
    sig = "|".join("x" * 4 for _ in range(SIG_K))
    # 8 identical docs -> one bucket overflows the cap within the batch;
    # ids deliberately interleaved across three Arrow chunks
    chunks = [[5, 1, 7], [0, 3, 6], [2, 4]]

    def perkey_chunks():
        return [
            pd.DataFrame([{"doc_id": i, "sig": sig} for i in ids])
            for ids in chunks
        ]

    def coarse_chunks():
        return [
            pd.DataFrame([
                {"band_idx": 0, "band_key": "k", "doc_id": i, "sig": sig}
                for i in ids
            ])
            for ids in chunks
        ]

    st_p, st_c = FakeState(), FakeState()
    out_p = pd.concat(list(
        make_bucket_fn(max_bucket_state=cap)(("0", "k"), iter(perkey_chunks()), st_p)
    ))
    out_c = pd.concat(list(
        make_coarse_bucket_fn(max_bucket_state=cap)((0,), iter(coarse_chunks()), st_c)
    ))
    pairs_p = sorted(zip(out_p.doc_id, out_p.dup_of))
    pairs_c = sorted(zip(out_c.doc_id, out_c.dup_of))
    # every doc compares against ALL earlier same-batch arrivals (no
    # mid-batch eviction): doc i pairs with each of 0..i-1 -> C(8,2)
    want = sorted((i, j) for i in range(8) for j in range(i))
    assert pairs_p == want
    assert pairs_c == want
    # both layouts keep the newest `cap` members per logical bucket
    assert list(st_p.get[0]) == [5, 6, 7]
    assert sorted(st_c.get[1]) == [5, 6, 7]


@pytest.mark.slow
def test_coarse_layout_parity(spark, tmp_path, sf_dir):
    """The coarse-group state layout (W9's scale shape, SCALING_R9) must
    emit EXACTLY the per-bucket layout's candidate multiset over a real
    multi-epoch replay — same FIFO cap per logical bucket, same
    deterministic same-batch ordering."""
    import os

    from pyspark.sql import functions as F

    from kinesyslog_spark.streaming.dedup import streaming_neardup_coarse
    from kinesyslog_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    epochs = [docs.filter(F.pmod("doc_id", F.lit(3)) == e) for e in range(3)]

    def replay(make_stream, tag):
        in_dir = str(tmp_path / f"in_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        out_dir = str(tmp_path / f"out_{tag}")
        os.makedirs(in_dir)
        for sl in epochs:
            sl.coalesce(1).write.mode("append").parquet(in_dir)
            src = spark.readStream.schema("doc_id long, text string").parquet(
                in_dir
            )
            # file sink, not memory: state carries across the per-epoch
            # availableNow restarts only through the checkpoint, and the
            # memory sink refuses checkpoint recovery
            q = (
                make_stream(src)
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .outputMode("append")
                .start()
            )
            q.awaitTermination()
        return sorted(
            (r["doc_id"], r["dup_of"], r["est_sim"])
            for r in spark.read.parquet(out_dir).collect()
        )

    base = replay(streaming_neardup, "perkey")
    coarse = replay(streaming_neardup_coarse, "coarse")
    assert base, "corpus must produce near-dup candidates for this test"
    assert coarse == base
    # and with a tiny group count (pathological collisions) it still holds
    tiny = replay(
        lambda s: streaming_neardup_coarse(s, groups=4), "tiny"
    )
    assert tiny == base


def test_banded_signatures_deterministic(spark):
    """Regression (round 9): the signature stage must produce the SAME
    hash family on every plan build. The old 2-arg transform lambda
    received (element, index) — its salt literal silently became the
    index Column's plan-local name, so every freshly built plan used a
    different (internally consistent) hash family and signatures
    persisted in streaming state stopped matching after any restart."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta eps zeta")], "doc_id long, text string"
    )
    s1 = banded_signatures(df).select("sig").distinct().collect()[0][0]
    s2 = banded_signatures(df).select("sig").distinct().collect()[0][0]
    s3 = (
        banded_signatures(df.repartition(3))
        .select("sig").distinct().collect()[0][0]
    )
    assert s1 == s2 == s3
    # and the salt is the documented '<i>:' convention, replayable
    import hashlib

    toks = "alpha beta gamma delta eps zeta".split()
    sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
    want0 = min(
        hashlib.md5(f"0:{s}".encode()).hexdigest() for s in sh
    )
    assert s1.split("|")[0] == want0


def test_ttl_timeout_evicts_bucket():
    """ProcessingTimeTimeout expiry forgets the bucket (dedup-within-a-
    horizon): the timed-out call must remove state and emit nothing."""
    import pandas as pd

    from kinesyslog_spark.streaming.dedup import make_bucket_fn

    class FakeState:
        def __init__(self, value):
            self.exists = value is not None
            self.hasTimedOut = True
            self._v = value
            self.removed = False
            self.timeout_set = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

        def remove(self):
            self._v, self.exists, self.removed = None, False, True

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    st = FakeState(([1], ["a|b|c"]))
    out = list(make_bucket_fn(ttl_ms=5000)(("0", "k"), iter([]), st))
    assert st.removed
    assert sum(len(o) for o in out) == 0
    # non-timed-out path arms the timer
    st2 = FakeState(None)
    st2.hasTimedOut = False
    pdf = pd.DataFrame([{"doc_id": 1, "sig": "a|b|c"}])
    list(make_bucket_fn(ttl_ms=5000)(("0", "k"), iter([pdf]), st2))
    assert st2.timeout_set == 5000


@pytest.mark.slow
def test_ttl_in_horizon_parity(spark, tmp_path, sf_dir):
    """With a TTL far longer than the run, the horizon contains every
    epoch, so the TTL path must emit EXACTLY the no-TTL output — the
    in-horizon parity pin for dedup-within-a-horizon (SCALING_R10: the
    probe separately shows state PLATEAU when epochs outlive the TTL).

    The TTL side runs as ONE continuous processingTime query: a query
    with ProcessingTimeTimeout never terminates under availableNow
    (Spark treats processing-time timers as always-pending work — see
    the module docstring's deployment caveat), so the availableNow
    replay pattern the other parity tests use would hang here."""
    import os
    import time

    from pyspark.sql import functions as F

    from kinesyslog_spark.streaming.dedup import streaming_neardup
    from kinesyslog_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    epochs = [docs.filter(F.pmod("doc_id", F.lit(3)) == e) for e in range(3)]

    # no-TTL baseline: the standard per-epoch availableNow replay
    in_b = str(tmp_path / "in_nottl")
    ckpt_b = str(tmp_path / "ckpt_nottl")
    out_b = str(tmp_path / "out_nottl")
    os.makedirs(in_b)
    for sl in epochs:
        sl.coalesce(1).write.mode("append").parquet(in_b)
        src = spark.readStream.schema("doc_id long, text string").parquet(in_b)
        q = (
            streaming_neardup(src)
            .writeStream.format("parquet")
            .option("path", out_b)
            .option("checkpointLocation", ckpt_b)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()
    base = sorted(
        (r["doc_id"], r["dup_of"], r["est_sim"])
        for r in spark.read.parquet(out_b).collect()
    )
    assert base, "corpus must produce near-dup candidates for this test"

    # TTL side: one long-lived processingTime query fed epoch by epoch.
    # Each epoch must land in its OWN micro-batch (dup_of orientation is
    # arrival-defined; two epochs merged into one batch fall back to the
    # doc_id order and can flip orientation vs the per-epoch baseline),
    # so the feed waits until the source has consumed everything written
    # so far before appending the next epoch.
    in_t = str(tmp_path / "in_ttl")
    os.makedirs(in_t)
    counts = [sl.count() for sl in epochs]
    epochs[0].coalesce(1).write.mode("append").parquet(in_t)
    src = spark.readStream.schema("doc_id long, text string").parquet(in_t)
    q = (
        streaming_neardup(src, ttl_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("ttl_parity_sink")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def rows():
            return sorted(
                (r["doc_id"], r["dup_of"], r["est_sim"])
                for r in spark.sql("SELECT * FROM ttl_parity_sink").collect()
            )

        # recentProgress retains only ~100 events, so summing the window
        # undercounts once older non-empty batches roll off (1 s trigger
        # x 240 s deadline >> 100). Accumulate per-batchId counts across
        # polls instead — the 0.5 s poll cadence is well under the 100-
        # batch retention horizon, so no batch can roll off unseen.
        seen_batches: dict[int, int] = {}

        def consumed():
            for p in q.recentProgress or []:
                seen_batches[int(p["batchId"])] = int(p["numInputRows"])
            return sum(seen_batches.values())

        deadline = time.time() + 240
        written = counts[0]
        for sl, c in zip(epochs[1:], counts[1:]):
            while time.time() < deadline and consumed() < written:
                time.sleep(0.5)
            assert consumed() >= written, "source failed to catch up"
            sl.coalesce(1).write.mode("append").parquet(in_t)
            written += c
        while time.time() < deadline and rows() != base:
            time.sleep(1.0)
        assert rows() == base
    finally:
        q.stop()
