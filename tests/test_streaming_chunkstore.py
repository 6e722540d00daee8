"""W30: continuous CDC chunk-store ingestion (streaming/chunkstore.py)
— fold-level store/batch parity, predecessor-snapshot retry
idempotency, and a live readStream drive."""

from __future__ import annotations

import json
import os
import time

from kinesyslog_spark.streaming.chunkstore import (
    batch_chunk_occurrences,
    make_fold,
    read_store,
    streaming_chunkstore,
)

_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3, "one two three four five six seven eight nine ten eleven twelve"),
    (4, "one two three four five six seven DIFFERENT eight nine ten"),
    (5, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _store_set(spark, state_dir):
    return {
        (r.chash, r.nbytes)
        for r in read_store(spark, state_dir).collect()
    }


def _batch_set(spark, rows):
    return {
        (r.chash, r.nbytes)
        for r in batch_chunk_occurrences(_df(spark, rows)).collect()
    }


def test_fold_accumulates_and_matches_batch(spark, tmp_path):
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    fold = make_fold(state, out)
    fold(_df(spark, _DOCS[:2]), 0)
    fold(_df(spark, _DOCS[2:4]), 1)
    fold(_df(spark, _DOCS[4:]), 2)
    # store == batch distinct chunks over everything ingested
    assert _store_set(spark, state) == _batch_set(spark, _DOCS)
    reports = {
        r.epoch: r for r in spark.read.parquet(out).collect()
    }
    assert set(reports) == {0, 1, 2}
    # identical docs 1/2 in epoch 0: every chunk admitted once, seen twice
    r0 = reports[0]
    assert r0.n_chunks == 2 * r0.n_new_chunks
    assert r0.dup_bytes == r0.new_bytes
    # store size == total admitted across epochs
    assert len(_store_set(spark, state)) == sum(
        r.n_new_chunks for r in reports.values()
    )
    # per-epoch byte accounting closes
    for r in reports.values():
        assert r.new_bytes >= 0 and r.dup_bytes >= 0


def test_cross_epoch_dedup_admits_nothing_for_replayed_doc(spark, tmp_path):
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    fold = make_fold(state, out)
    fold(_df(spark, _DOCS[:1]), 0)
    fold(_df(spark, _DOCS[:1]), 1)  # same doc again, NEW epoch
    reports = {r.epoch: r for r in spark.read.parquet(out).collect()}
    assert reports[1].n_new_chunks == 0
    assert reports[1].new_bytes == 0
    assert reports[1].n_chunks == reports[0].n_chunks
    assert _store_set(spark, state) == _batch_set(spark, _DOCS[:1])


def test_fold_retry_is_exactly_once(spark, tmp_path):
    """A retried epoch reads its PREDECESSORS (never its own partial
    attempt) and overwrites its own snapshot + report — the store and
    reports after a retry are bit-identical to the clean run."""
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    fold = make_fold(state, out)
    fold(_df(spark, _DOCS[:2]), 0)
    fold(_df(spark, _DOCS[2:4]), 1)
    before = _store_set(spark, state)
    rep_before = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    fold(_df(spark, _DOCS[2:4]), 1)  # simulated foreachBatch retry
    assert _store_set(spark, state) == before
    assert sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    ) == rep_before


def test_streaming_live(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def write(name, rows):
        tmp = os.path.join(in_dir, name + ".tmp")
        with open(tmp, "w") as f:
            for did, text in rows:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        os.rename(tmp, os.path.join(in_dir, name))

    write("b1.json", _DOCS[:3])
    docs = spark.readStream.schema("doc_id long, text string").json(in_dir)
    q = streaming_chunkstore(docs, state, out, ckpt)
    try:
        deadline = time.time() + 60

        def n_admitted():
            try:
                return sum(
                    r.n_new_chunks for r in spark.read.parquet(out).collect()
                )
            except Exception:
                return -1

        target = len(_batch_set(spark, _DOCS[:3]))
        while time.time() < deadline and n_admitted() != target:
            time.sleep(0.5)
        write("b2.json", _DOCS[3:])
        target_all = len(_batch_set(spark, _DOCS))
        while time.time() < deadline and n_admitted() != target_all:
            time.sleep(0.5)
        assert _store_set(spark, state) == _batch_set(spark, _DOCS)
    finally:
        q.stop()
