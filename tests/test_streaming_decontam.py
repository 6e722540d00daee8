"""W15: continuous decontamination (streaming/decontam.py) — replay
drive + exact parity with the q42 batch twin on the same documents."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from kinesyslog_spark.queries.decontam import DECONTAM_N
from kinesyslog_spark.streaming.decontam import (
    build_eval_grams,
    score_batch,
    streaming_decontam,
)

EVAL_TEXT = " ".join(f"e{i}" for i in range(DECONTAM_N * 3))


def _doc(i: int, contaminated: bool) -> dict:
    if contaminated:
        # copy an 8-gram window straight out of the eval text
        text = EVAL_TEXT + f" tail{i} " + " ".join(f"x{i}{j}" for j in range(8))
    else:
        text = " ".join(f"w{i}{j}" for j in range(DECONTAM_N * 3))
    return {"doc_id": i, "text": text}


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_score_batch_matches_expectations(spark):
    eval_df = spark.createDataFrame([(0, EVAL_TEXT)], "doc_id long, text string")
    grams = build_eval_grams(eval_df)
    batch = spark.createDataFrame(
        [_doc(1, True), _doc(2, False)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in score_batch(batch, grams).collect()}
    assert rows[1]["contaminated"] == 1 and rows[1]["n_hit"] > 0
    assert rows[2]["contaminated"] == 0 and rows[2]["n_hit"] == 0


def test_streaming_matches_batch_twin(spark, tmp_path):
    eval_df = spark.createDataFrame([(0, EVAL_TEXT)], "doc_id long, text string")
    grams = build_eval_grams(eval_df).persist()
    grams.count()

    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    b1 = [_doc(1, True), _doc(2, False)]
    b2 = [_doc(3, False), _doc(4, True)]
    _write_json(os.path.join(in_dir, "b1.json"), b1)

    docs = spark.readStream.schema("doc_id long, text string").json(in_dir)
    q = streaming_decontam(docs, grams, out_dir, ckpt)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        _write_json(os.path.join(in_dir, "b2.json"), b2)

        def scored():
            try:
                return {
                    r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()
                }
            except Exception:
                return {}

        while time.time() < deadline and len(scored()) < 4:
            time.sleep(0.5)
        got = scored()
        assert set(got) == {1, 2, 3, 4}
    finally:
        q.stop()

    # exact parity with the batch twin over the same docs
    all_docs = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    twin = {r["doc_id"]: r for r in score_batch(all_docs, grams).collect()}
    for did, r in got.items():
        t = twin[did]
        assert (r["n_grams"], r["n_hit"], r["contam_frac"], r["contaminated"]) == (
            t["n_grams"], t["n_hit"], t["contam_frac"], t["contaminated"]
        )
    assert got[1]["contaminated"] == 1 and got[4]["contaminated"] == 1
    assert got[2]["contaminated"] == 0 and got[3]["contaminated"] == 0
    grams.unpersist()


def test_fold_retry_is_exactly_once(spark, tmp_path):
    """foreachBatch re-invokes the SAME epoch after a failure; a retried
    epoch must replace its own output, not append duplicates (round-4
    verdict: W15 claimed exactly-once over a blind append)."""
    from kinesyslog_spark.streaming.decontam import make_fold

    eval_df = spark.createDataFrame([(0, EVAL_TEXT)], "doc_id long, text string")
    grams = build_eval_grams(eval_df).persist()
    grams.count()
    out = str(tmp_path / "scored")
    fold = make_fold(grams, out)
    b1 = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in (_doc(1, True), _doc(2, False))],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in (_doc(3, True),)],
        "doc_id long, text string",
    )
    fold(b1, 0)
    fold(b1, 0)  # simulated retry of the same epoch
    fold(b2, 1)
    fold(b2, 1)
    got = spark.read.parquet(out)
    assert got.count() == 3, "retried epochs duplicated rows"
    assert {r.doc_id for r in got.collect()} == {1, 2, 3}
    grams.unpersist()
