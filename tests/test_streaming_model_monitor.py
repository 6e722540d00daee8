"""W29: continuous binned-AUC monitor — merge algebra, batch-twin
parity, retry exactly-once, live replay."""

from __future__ import annotations

import json
import os
import random
import time

from pyspark.sql import functions as F

from kinesyslog_spark.queries.ml import auc_from_histogram
from kinesyslog_spark.streaming.model_monitor import (
    batch_histogram,
    make_fold,
    merge_histograms,
    streaming_model_monitor,
)

LO, HI = -10.0, 10.0


def _scored(spark, rows):
    return spark.createDataFrame(rows, "ex_id long, score double, y int")


def _gen(rng, n, base):
    # positives score higher on average -> AUC well above 0.5
    out = []
    for i in range(n):
        y = rng.random() < 0.4
        mu = 2.5 if y else -2.5
        out.append((base + i, rng.gauss(mu, 3.0), int(y)))
    return out


def test_merge_equals_whole(spark):
    rng = random.Random(7)
    b1, b2 = _gen(rng, 300, 0), _gen(rng, 200, 1000)
    h1 = batch_histogram(_scored(spark, b1), LO, HI)
    h2 = batch_histogram(_scored(spark, b2), LO, HI)
    merged = {r.bkt: (r.pos_b, r.neg_b)
              for r in merge_histograms(h1, h2).collect()}
    whole = {r.bkt: (r.pos_b, r.neg_b)
             for r in batch_histogram(_scored(spark, b1 + b2), LO, HI).collect()}
    assert merged == whole
    # and the binned AUC from the merged state shows the planted signal
    auc = auc_from_histogram(merge_histograms(h1, h2)).collect()[0]
    assert auc.p + auc.n == 500
    assert auc.auc_binned > 0.7


def test_out_of_range_scores_clamp(spark):
    rows = [(1, -99.0, 0), (2, 99.0, 1), (3, 0.0, 1)]
    h = {r.bkt: (r.pos_b, r.neg_b)
         for r in batch_histogram(_scored(spark, rows), LO, HI).collect()}
    assert 0 in h and h[0] == (0, 1)       # clamped low
    assert max(h) == 127 and h[127] == (1, 0)  # clamped high


def test_fold_retry_is_exactly_once(spark, tmp_path):
    rng = random.Random(3)
    out, state = str(tmp_path / "auc"), str(tmp_path / "state")
    fold = make_fold(out, state, LO, HI)
    b1, b2 = _gen(rng, 100, 0), _gen(rng, 100, 500)
    fold(_scored(spark, b1), 0)
    fold(_scored(spark, b2), 1)
    fold(_scored(spark, b2), 1)  # simulated foreachBatch retry
    snap = spark.read.parquet(f"{state}/epoch=1")
    total = snap.agg(F.sum(F.col("pos_b") + F.col("neg_b"))).collect()[0][0]
    assert total == 200, "retried epoch double-counted examples"
    assert spark.read.parquet(out).filter("epoch = 1").count() == 1


def test_streaming_matches_batch_twin(spark, tmp_path):
    rng = random.Random(11)
    in_dir = str(tmp_path / "scored")
    out, state = str(tmp_path / "auc"), str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    b1, b2 = _gen(rng, 150, 0), _gen(rng, 150, 1000)

    def write(name, rows):
        tmp = os.path.join(in_dir, name + ".tmp")
        with open(tmp, "w") as f:
            for eid, s, y in rows:
                f.write(json.dumps({"ex_id": eid, "score": s, "y": y}) + "\n")
        os.rename(tmp, os.path.join(in_dir, name))

    write("b1.json", b1)
    scored = spark.readStream.schema(
        "ex_id long, score double, y int"
    ).json(in_dir)
    q = streaming_model_monitor(scored, out, state, ckpt, LO, HI)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        write("b2.json", b2)

        def latest():
            try:
                df = spark.read.parquet(out)
                top = df.agg(F.max("epoch")).collect()[0][0]
                return df.filter(F.col("epoch") == top).collect()[0]
            except Exception:
                return None

        got = None
        while time.time() < deadline:
            got = latest()
            if got is not None and got.p + got.n == 300:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    twin = auc_from_histogram(
        batch_histogram(_scored(spark, b1 + b2), LO, HI)
    ).collect()[0]
    assert (got.p, got.n, got.auc_binned) == (
        twin.p, twin.n, twin.auc_binned
    )
