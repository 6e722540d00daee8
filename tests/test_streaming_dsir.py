"""W16: continuous DSIR scoring (streaming/dsir.py) — replay drive +
exact parity with the q103 batch-twin scorer, and a sanity check that
target-like documents outscore background-like ones."""

from __future__ import annotations

import json
import os
import time

from kinesyslog_spark.streaming.dsir import (
    build_dsir_artifact,
    score_batch,
    streaming_dsir,
)

# Reference corpus: "en" docs share a target vocabulary, others don't.
_TARGET_WORDS = "the quick brown fox jumps over lazy dog again and again"
_BACKGROUND_WORDS = "zorp blik vax qun mep drel otz wib fen gub"


def _ref_corpus(spark):
    rows = []
    for i in range(8):
        rows.append((i, _TARGET_WORDS + f" t{i}", "en"))
    for i in range(8, 16):
        rows.append((i, _BACKGROUND_WORDS + f" b{i}", "zz"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _doc(i: int, targetish: bool) -> dict:
    text = _TARGET_WORDS if targetish else _BACKGROUND_WORDS
    return {"doc_id": i, "text": text + f" s{i}"}


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_model_separates_target_from_background(spark):
    lam = build_dsir_artifact(_ref_corpus(spark))
    batch = spark.createDataFrame(
        [_doc(100, True), _doc(101, False)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in score_batch(batch, lam).collect()}
    assert rows[100]["dsir_weight"] > rows[101]["dsir_weight"], (
        "target-like doc must outscore background-like doc"
    )
    assert rows[100]["n_feats"] > 0 and rows[101]["n_feats"] > 0


def test_streaming_matches_batch_twin(spark, tmp_path):
    lam = build_dsir_artifact(_ref_corpus(spark)).persist()
    lam.count()

    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    b1 = [_doc(1, True), _doc(2, False)]
    b2 = [_doc(3, False), _doc(4, True)]
    _write_json(os.path.join(in_dir, "b1.json"), b1)

    docs = spark.readStream.schema("doc_id long, text string").json(in_dir)
    q = streaming_dsir(docs, lam, out_dir, ckpt)
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
    twin = {r["doc_id"]: r for r in score_batch(all_docs, lam).collect()}
    for did, r in got.items():
        t = twin[did]
        assert (r["n_feats"], r["dsir_weight"]) == (t["n_feats"], t["dsir_weight"])
    assert got[1]["dsir_weight"] > got[2]["dsir_weight"]
    assert got[4]["dsir_weight"] > got[3]["dsir_weight"]
    lam.unpersist()


def test_fold_retry_is_exactly_once(spark, tmp_path):
    """Retried epochs overwrite their own epoch_id partition — no
    duplicate scored rows after a simulated foreachBatch re-invocation."""
    from kinesyslog_spark.streaming.dsir import make_fold

    lam = build_dsir_artifact(_ref_corpus(spark)).persist()
    lam.count()
    out = str(tmp_path / "scored")
    fold = make_fold(lam, out)
    b1 = spark.createDataFrame(
        [_doc(1, True), _doc(2, False)], "doc_id long, text string"
    )
    fold(b1, 5)
    fold(b1, 5)  # simulated retry
    got = spark.read.parquet(out)
    assert got.count() == 2, "retried epoch duplicated rows"
    lam.unpersist()
