"""W27: continuous data-quality monitor (streaming/quality.py) — merge
algebra, retry exactly-once (the SUM-merge predecessor-snapshot rule),
and a live replay matching the batch-computed cumulative metrics."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from kinesyslog_spark.streaming.quality import (
    batch_metrics,
    make_fold,
    merge_metrics,
    streaming_quality,
    verdict_rows,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


B1 = [(1, "hello world"), (2, ""), (3, None)]
B2 = [(4, "xyz"), (5, "a much longer document body")]


def test_merge_equals_whole(spark):
    m1 = batch_metrics(_docs(spark, B1))
    m2 = batch_metrics(_docs(spark, B2))
    merged = merge_metrics(m1, m2).collect()[0]
    whole = batch_metrics(_docs(spark, B1 + B2)).collect()[0]
    assert merged.asDict() == whole.asDict()


def test_verdicts_flip_on_breach(spark):
    good = batch_metrics(_docs(spark, [(1, "ok"), (2, "fine")]))
    v = {r.check_name: r.passed for r in verdict_rows(good, 0).collect()}
    assert v["docs_text_complete"] == 1 and v["docs_empty_text_frac"] == 1
    bad = batch_metrics(_docs(spark, [(1, ""), (2, ""), (3, "x")]))
    v2 = {r.check_name: r.passed for r in verdict_rows(bad, 1).collect()}
    assert v2["docs_empty_text_frac"] == 0, "2/3 empty must breach 0.5"


def test_fold_retry_is_exactly_once(spark, tmp_path):
    """SUM-merge is NOT idempotent, so the retry contract is carried by
    the predecessor-snapshot rule: re-running epoch 1 must NOT
    double-count its batch, and the predecessor snapshot survives
    pruning so the retry can actually read it."""
    out = str(tmp_path / "report")
    state = str(tmp_path / "state")
    fold = make_fold(out, state)
    fold(_docs(spark, B1), 0)
    fold(_docs(spark, B2), 1)
    n_after = spark.read.parquet(f"{state}/epoch=1").collect()[0]["n"]
    assert n_after == 5
    fold(_docs(spark, B2), 1)  # simulated foreachBatch retry
    n_retry = spark.read.parquet(f"{state}/epoch=1").collect()[0]["n"]
    assert n_retry == 5, "retried epoch double-counted its batch"
    report = spark.read.parquet(out)
    assert report.filter("epoch = 1").count() == 4  # one row per check


def test_streaming_matches_batch_twin(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    out = str(tmp_path / "report")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def write(name, rows):
        tmp = os.path.join(in_dir, name + ".tmp")
        with open(tmp, "w") as f:
            for did, text in rows:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        os.rename(tmp, os.path.join(in_dir, name))

    write("b1.json", B1)
    docs = spark.readStream.schema("doc_id long, text string").json(in_dir)
    q = streaming_quality(docs, out, state, ckpt)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        write("b2.json", B2)

        def latest_epoch_rows():
            try:
                df = spark.read.parquet(out)
                top = df.agg(F.max("epoch")).collect()[0][0]
                rows = df.filter(F.col("epoch") == top).collect()
                return {r.check_name: (r.metric, r.passed) for r in rows}
            except Exception:
                return {}

        got = {}
        while time.time() < deadline:
            got = latest_epoch_rows()
            if got.get("docs_rows_nonzero", (0, 0))[0] == 5.0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    twin = {
        r.check_name: (r.metric, r.passed)
        for r in verdict_rows(
            batch_metrics(_docs(spark, B1 + B2)), 0
        ).collect()
    }
    assert got == twin
