"""W21: continuous drift monitor (streaming/drift.py) — independent
pure-Python TV model parity, drift ordering sanity, and a replay drive
with per-epoch idempotent sink output."""

from __future__ import annotations

import json
import os
import time
from collections import Counter

from kinesyslog_spark.streaming.drift import (
    build_reference_dist,
    score_drift,
    streaming_drift,
)

_REF_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the slow red fox naps under the old tree",
    "a dog and a fox share the quiet field",
]
_LIKE_REF = "the quick fox naps under the lazy dog"
_DRIFTED = "zorp blik vax qun mep drel otz wib fen gub"


def _ref(spark):
    rows = [(i, t) for i, t in enumerate(_REF_TEXTS)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_tv(batch_texts: list[str], ref_texts: list[str]) -> float:
    rc = Counter(w for t in ref_texts for w in t.split())
    bc = Counter(w for t in batch_texts for w in t.split())
    nr, nb = sum(rc.values()), sum(bc.values())
    vocab = set(rc) | set(bc)
    return 0.5 * sum(abs(bc.get(w, 0) / nb - rc.get(w, 0) / nr) for w in vocab)


def test_score_matches_python_tv(spark):
    ref = build_reference_dist(_ref(spark)).persist()
    ref.count()
    batch = spark.createDataFrame(
        [(1, "srcA", _LIKE_REF), (2, "srcB", _DRIFTED),
         (3, "srcB", _DRIFTED + " extra word")],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r for r in score_drift(batch, ref).collect()}
    want_a = _py_tv([_LIKE_REF], _REF_TEXTS)
    want_b = _py_tv([_DRIFTED, _DRIFTED + " extra word"], _REF_TEXTS)
    assert abs(got["srcA"]["tv_dist"] - want_a) < 1e-6
    assert abs(got["srcB"]["tv_dist"] - want_b) < 1e-6
    assert got["srcA"]["tv_dist"] < got["srcB"]["tv_dist"], (
        "reference-like source must score lower drift than alien source"
    )
    # alien vocabulary: batch and reference masses are fully disjoint
    assert abs(got["srcB"]["tv_dist"] - 1.0) < 1e-9
    assert got["srcA"]["n_tokens"] == len(_LIKE_REF.split())


def test_identical_distribution_scores_zero(spark):
    ref = build_reference_dist(_ref(spark))
    batch = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(_REF_TEXTS)],
        "doc_id long, source string, text string",
    )
    row = score_drift(batch, ref).collect()[0]
    assert row["tv_dist"] == 0.0


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_streaming_matches_batch_twin(spark, tmp_path):
    ref = build_reference_dist(_ref(spark)).persist()
    ref.count()
    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "drift")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    b1 = [{"doc_id": 1, "source": "srcA", "text": _LIKE_REF}]
    b2 = [{"doc_id": 2, "source": "srcB", "text": _DRIFTED}]
    _write_json(os.path.join(in_dir, "b1.json"), b1)

    docs = spark.readStream.schema(
        "doc_id long, source string, text string"
    ).json(in_dir)
    q = streaming_drift(docs, ref, out_dir, ckpt)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        _write_json(os.path.join(in_dir, "b2.json"), b2)

        def scored():
            try:
                return {
                    r["source"]: r for r in spark.read.parquet(out_dir).collect()
                }
            except Exception:
                return {}

        while time.time() < deadline and len(scored()) < 2:
            time.sleep(0.5)
        got = scored()
        assert set(got) == {"srcA", "srcB"}
    finally:
        q.stop()

    twin_a = score_drift(
        spark.createDataFrame(
            [(1, "srcA", _LIKE_REF)], "doc_id long, source string, text string"
        ),
        ref,
    ).collect()[0]
    assert got["srcA"]["tv_dist"] == twin_a["tv_dist"]
    assert got["srcB"]["tv_dist"] > got["srcA"]["tv_dist"]
    ref.unpersist()
