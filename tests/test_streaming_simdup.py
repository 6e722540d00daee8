"""W34: continuous SimHash near-dup (streaming/simdup.py) — kernel
parity against the batch Catalyst chain, availableNow replay pinned to
batch q27, and the distinct-fp collapse's state idempotence."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from kinesyslog_spark.queries.dedup import (
    hot_simhash_groups,
    q27_simhash_pairs,
)
from kinesyslog_spark.streaming.simdup import (
    frozen_simhash_artifacts,
    make_simdup_coarse_fn,
    simhash_combo_batches,
    streaming_simdup,
)
from kinesyslog_spark.tables import load_table


def _expected_stream_pairs(spark, sf_dir):
    """Batch q27 restricted to what in-order streaming emits: each
    exact-fp group as its rep-centered star, each cross-group pair once
    between the two first-seen (= rep) docs. The pair graph is a
    SPARSIFICATION of batch q27's with identical connected components."""
    grp = hot_simhash_groups(spark, sf_dir)[0].collect()
    rep_of = {int(m): int(r.rep) for r in grp for m in r.members}
    pairs = q27_simhash_pairs(spark, sf_dir).collect()
    want = set()
    for r in pairs:
        a, b, h = int(r.doc_a), int(r.doc_b), int(r.hamming)
        if h == 0:
            ra = rep_of[a]
            for m in (a, b):
                if m != ra:
                    want.add((ra, m, 0))
        else:
            ra, rb = rep_of[a], rep_of[b]
            want.add((min(ra, rb), max(ra, rb), h))
    return want, pairs, rep_of


def _components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_kernel_matches_batch_fingerprints(spark, sf_dir):
    """The Arrow kernel's (hi, lo) and combo keys are bit-identical to
    the Catalyst simhash_df + _block_int_cols + combo_keyed chain."""
    from kinesyslog_spark.queries.dedup import combo_keyed

    art = frozen_simhash_artifacts(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = (
        docs.mapInPandas(
            simhash_combo_batches(art),
            schema="doc_id long, hi long, lo long, cid int, ckey long",
        )
        .collect()
    )
    got_fp = {(r.doc_id, r.hi, r.lo) for r in got}
    got_keys = {(r.doc_id, r.cid, r.ckey) for r in got}

    grp, blk = hot_simhash_groups(spark, sf_dir)
    # batch fingerprints for every doc (grp holds them per distinct fp)
    want_fp = {
        (int(m), int(r.hi), int(r.lo))
        for r in grp.collect() for m in r.members
    }
    assert got_fp == want_fp
    # combo keys for the reps, from the batch chain itself
    want_rep_keys = {
        (r.doc_id, r.cid, r.ckey) for r in combo_keyed(blk).collect()
    }
    rep_ids = {r[0] for r in want_rep_keys}
    got_rep_keys = {k for k in got_keys if k[0] in rep_ids}
    assert got_rep_keys == want_rep_keys


@pytest.mark.slow
def test_replay_matches_batch_q27(spark, sf_dir, tmp_path):
    """In-order availableNow replay over the full corpus: the distinct
    streamed pair set equals the rep-star sparsification of batch q27,
    and its connected components equal batch q27's."""
    want, batch_pairs, _ = _expected_stream_pairs(spark, sf_dir)
    art = frozen_simhash_artifacts(spark, sf_dir)

    docs = sorted(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text").collect(),
        key=lambda r: r.doc_id,
    )
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    n = len(docs)
    waves = [docs[: n // 3], docs[n // 3: 2 * n // 3], docs[2 * n // 3:]]
    for i, w in enumerate(waves):
        p = os.path.join(in_dir, f"w{i}.json")
        with open(p + ".tmp", "w") as f:
            for r in w:
                f.write(json.dumps(
                    {"doc_id": r.doc_id, "text": r.text}) + "\n")
        os.replace(p + ".tmp", p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        streaming_simdup(stream, art, max_bucket_state=4096)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = {
        (min(r.doc_id, r.dup_of), max(r.doc_id, r.dup_of), r.hamming)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == want
    # cluster-level contract: identical connected components
    cc_stream = _components([(a, b) for a, b, _ in got])
    cc_batch = _components(
        [(int(r.doc_a), int(r.doc_b)) for r in batch_pairs]
    )
    assert cc_stream == cc_batch


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


def _drive(fn, st, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "hi", "lo", "cid", "ckey"]
    )
    out = pd.concat(list(fn((0,), iter([pdf]), st)), ignore_index=True)
    return [(int(r.doc_id), int(r.dup_of), int(r.hamming))
            for r in out.itertuples()]


def test_distinct_fp_collapse_is_idempotent():
    """A duplicate fingerprint pairs with the bucket's first-seen copy
    and never grows the bucket; re-delivery of a doc leaves state
    unchanged (at-least-once replay safety)."""
    fn = make_simdup_coarse_fn()
    st = FakeState()
    assert _drive(fn, st, [(1, 7, 9, 0, 42)]) == []
    state_after_1 = st.get
    # same fp, new doc -> ham-0 pair vs first-seen, not appended
    assert _drive(fn, st, [(2, 7, 9, 0, 42)]) == [(2, 1, 0)]
    assert st.get == state_after_1
    # near fp (1 bit off in lo) -> candidate, appended
    assert _drive(fn, st, [(3, 7, 8, 0, 42)]) == [(3, 1, 1)]
    assert len(st.get[1]) == 2
    # re-delivered doc 1: pairs re-emit (at-least-once), state unchanged
    state_before = st.get
    got = _drive(fn, st, [(1, 7, 9, 0, 42)])
    assert (1, 3, 1) in {(d, o, h) for d, o, h in got} or \
           (1, 3, 1) in {(min(d, o), max(d, o), h) for d, o, h in got}
    assert st.get == state_before


@pytest.mark.slow
def test_event_ttl_horizon_evicts(spark, sf_dir, tmp_path):
    """W34 with the event-time horizon: a near-dup arriving after the
    watermark passed the original's horizon emits NO candidate; with a
    horizon that has not passed, the pair emits (the W9 event-TTL
    contract applied to the SimHash family)."""
    import datetime as dt

    art = frozen_simhash_artifacts(spark, sf_dir)
    t0 = 1_700_000_000_000
    hour = 3_600_000

    def iso(ms):
        return dt.datetime.fromtimestamp(
            ms / 1000, tz=dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "the quick brown fox jumps over the lazy dog again and AGAIN"

    def run(ttl_ms, tag):
        in_dir = str(tmp_path / f"in_{tag}")
        os.makedirs(in_dir)
        waves = [
            [{"doc_id": 1, "text": text_a, "ts": iso(t0)}],
            [{"doc_id": 50, "text": "unrelated words about partitions",
              "ts": iso(t0 + 2 * hour)}],
            [{"doc_id": 51, "text": "other filler on broadcast joins",
              "ts": iso(t0 + 2 * hour + 1000)}],
            [{"doc_id": 2, "text": text_b,
              "ts": iso(t0 + 2 * hour + 2000)}],
        ]
        for i, w in enumerate(waves):
            p = os.path.join(in_dir, f"w{i}.json")
            with open(p + ".tmp", "w") as f:
                for r in w:
                    f.write(json.dumps(r) + "\n")
            os.replace(p + ".tmp", p)
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema("doc_id long, text string, ts string")
            .option("maxFilesPerTrigger", 1)
            .json(in_dir)
        )
        out_dir = str(tmp_path / f"out_{tag}")
        q = (
            streaming_simdup(stream, art, ttl_ms=ttl_ms, ts_col="ts")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        try:
            return {(r.doc_id, r.dup_of)
                    for r in spark.read.parquet(out_dir).collect()}
        except Exception:
            return set()

    assert run(hour, "short") == set()          # horizon passed: evicted
    assert run(10 * hour, "long") == {(2, 1)}   # horizon open: pair
