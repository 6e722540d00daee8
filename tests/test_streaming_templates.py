"""W24: continuous new-template detection (streaming/templates.py) —
q137-parity masking, first-seen-only alerting across epochs, and union
idempotency."""

from __future__ import annotations

import json
import os
import time

from kinesyslog_spark.streaming.templates import batch_templates


def test_batch_templates_matches_q137_masking(spark):
    batch = spark.createDataFrame(
        [("evt=1 type=error",), ("evt=22 type=error",), ("evt=3 type=view",),
         ("disk sda1 90% full",)],
        "message string",
    )
    got = {r["template"]: (r["n_msgs"], r["example"])
           for r in batch_templates(batch).collect()}
    assert got["evt=# type=error"] == (2, "evt=1 type=error")
    assert got["evt=# type=view"] == (1, "evt=3 type=view")
    assert got["disk sda# #% full"] == (1, "disk sda1 90% full")


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_streaming_alerts_first_seen_only(spark, tmp_path):
    from kinesyslog_spark.streaming.templates import streaming_new_templates

    in_dir = str(tmp_path / "msgs")
    out_dir = str(tmp_path / "alerts")
    state_dir = str(tmp_path / "known")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    b1 = [{"message": f"evt={i} type=error"} for i in range(5)] + [
        {"message": "disk sda1 90% full"}
    ]
    # epoch 2 repeats the error template (no re-alert) and adds one new
    b2 = [{"message": "evt=99 type=error"}, {"message": "oom killer pid 4242"}]
    _write_json(os.path.join(in_dir, "b1.json"), b1)

    docs = spark.readStream.schema("message string").json(in_dir)
    q = streaming_new_templates(docs, state_dir, out_dir, ckpt)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        _write_json(os.path.join(in_dir, "b2.json"), b2)

        def alerts():
            try:
                return spark.read.parquet(out_dir).collect()
            except Exception:
                return []

        def known_set():
            try:
                return {
                    r["template"]
                    for r in spark.read.parquet(state_dir).collect()
                }
            except Exception:
                return set()

        # wait for the epoch-2 STATE merge (it lands after the alerts,
        # so this also guarantees the alert output is complete)
        while time.time() < deadline and len(known_set()) < 3:
            time.sleep(0.5)
        got = alerts()
    finally:
        q.stop()

    by_template = {}
    for r in got:
        by_template.setdefault(r["template"], []).append(r)
    assert set(by_template) == {
        "evt=# type=error", "disk sda# #% full", "oom killer pid #"
    }
    # the repeated template alerted exactly once (first epoch only)
    assert len(by_template["evt=# type=error"]) == 1
    # known-set state holds all three
    known = {r["template"] for r in spark.read.parquet(state_dir).collect()}
    assert known == set(by_template)
