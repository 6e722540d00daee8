"""W28: retraction-changelog emission (streaming/changelog.py) — merge
algebra, the changelog-replay reconstruction contract, retry
exactly-once, and a live replay."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from kinesyslog_spark.streaming.changelog import (
    apply_changelog,
    batch_view,
    changelog_rows,
    make_fold,
    merge_view,
    streaming_changelog,
)

B1 = [(1, "click", 10.0), (2, "click", 5.0), (3, "view", 7.0)]
B2 = [(4, "click", 2.0), (5, "buy", 100.0)]
B3 = [(6, "view", 1.0), (7, "buy", 3.0), (8, "buy", 4.0)]


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


def _snap(df):
    return {r.key: (r.cnt, r.total) for r in df.collect()}


def test_merge_is_associative(spark):
    v1, v2, v3 = (batch_view(_ev(spark, b), "event_type", "value")
                  for b in (B1, B2, B3))
    left = merge_view(merge_view(v1, v2), v3)
    right = merge_view(v1, merge_view(v2, v3))
    whole = batch_view(_ev(spark, B1 + B2 + B3), "event_type", "value")
    assert _snap(left) == _snap(right) == _snap(whole)


def test_changelog_ops_and_reconstruction(spark, tmp_path):
    out = str(tmp_path / "log")
    state = str(tmp_path / "state")
    fold = make_fold(out, state, "event_type", "value")
    for i, b in enumerate((B1, B2, B3)):
        fold(_ev(spark, b), i)
    log = spark.read.parquet(out)
    # epoch 0: everything is +I
    e0 = log.filter("epoch = 0")
    assert {r.op for r in e0.collect()} == {"+I"}
    # epoch 1: 'click' updated (-U/+U pair), 'buy' inserted, 'view' silent
    e1 = {(r.key, r.op): (r.cnt, r.total) for r in log.filter("epoch = 1").collect()}
    assert e1[("click", "-U")] == (2, 15)
    assert e1[("click", "+U")] == (3, 17)
    assert e1[("buy", "+I")] == (1, 100)
    assert ("view", "-U") not in e1 and ("view", "+U") not in e1
    # THE contract: replaying the changelog reconstructs the snapshot
    final = spark.read.parquet(f"{state}/epoch=2")
    assert _snap(apply_changelog(log)) == _snap(final)
    assert _snap(final) == {
        "click": (3, 17), "view": (2, 8), "buy": (3, 107),
    }


def test_fold_retry_is_exactly_once(spark, tmp_path):
    out = str(tmp_path / "log")
    state = str(tmp_path / "state")
    fold = make_fold(out, state, "event_type", "value")
    fold(_ev(spark, B1), 0)
    fold(_ev(spark, B2), 1)
    fold(_ev(spark, B2), 1)  # simulated foreachBatch retry
    snap = _snap(spark.read.parquet(f"{state}/epoch=1"))
    assert snap["click"] == (3, 17), "retried epoch double-counted"
    # the changelog for the retried epoch was overwritten, not appended
    log = spark.read.parquet(out)
    assert log.filter("epoch = 1 AND key = 'click'").count() == 2  # -U/+U
    # and replay still reconstructs
    assert _snap(apply_changelog(log)) == snap


def test_streaming_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "ev")
    out = str(tmp_path / "log")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def write(name, rows):
        tmp = os.path.join(in_dir, name + ".tmp")
        with open(tmp, "w") as f:
            for eid, et, v in rows:
                f.write(json.dumps(
                    {"event_id": eid, "event_type": et, "value": v}) + "\n")
        os.rename(tmp, os.path.join(in_dir, name))

    write("b1.json", B1)
    ev = spark.readStream.schema(
        "event_id long, event_type string, value double"
    ).json(in_dir)
    q = streaming_changelog(ev, out, state, ckpt)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        write("b2.json", B2 + B3)

        def view():
            try:
                return _snap(apply_changelog(spark.read.parquet(out)))
            except Exception:
                return {}

        target = _snap(
            batch_view(_ev(spark, B1 + B2 + B3), "event_type", "value")
        )
        got = {}
        while time.time() < deadline:
            got = view()
            if got == target:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert got == target
