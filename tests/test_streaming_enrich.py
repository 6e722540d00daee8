"""W18: continuous point-in-time enrichment (streaming/enrich.py) —
replay drive + exact parity with the batch AS OF join on the same
events and history."""

from __future__ import annotations

import json
import os
import time

from kinesyslog_spark.streaming.enrich import pit_enrich, streaming_enrich

# history: user 7 was low until t=100s, mid until 200s, high after;
# user 8 always low (open-ended single version)
_HIST = [
    (7, "low", 0, 0, 100_000),
    (7, "mid", 1, 100_000, 200_000),
    (7, "high", 2, 200_000, None),
    (8, "low", 0, 50_000, None),
]
_HIST_SCHEMA = (
    "user_id long, tier string, run_id long, valid_from_ms long, "
    "valid_to_ms long"
)


def _hist(spark):
    return spark.createDataFrame(_HIST, _HIST_SCHEMA)


def _ev(i, uid, sec):
    return {"event_id": i, "user_id": uid,
            "ts": time.strftime("1970-01-01 00:0%d:%02d" % (sec // 60, sec % 60))}


def test_batch_twin_semantics(spark):
    evs = spark.createDataFrame(
        [
            (1, 7, "1970-01-01 00:00:30"),   # low
            (2, 7, "1970-01-01 00:01:40"),   # 100s boundary -> mid
            (3, 7, "1970-01-01 00:05:00"),   # high (open)
            (4, 8, "1970-01-01 00:00:10"),   # before 8's first version -> null
            (5, 8, "1970-01-01 00:02:00"),   # low
        ],
        "event_id long, user_id long, ts string",
    )
    got = {r.event_id: (r.tier_at_event, r.run_id)
           for r in pit_enrich(evs, _hist(spark)).collect()}
    assert got == {
        1: ("low", 0), 2: ("mid", 1), 3: ("high", 2),
        4: (None, None), 5: ("low", 0),
    }


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_streaming_matches_batch_twin(spark, tmp_path):
    hist = _hist(spark)
    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    b1 = [
        {"event_id": 1, "user_id": 7, "ts": "1970-01-01 00:00:30"},
        {"event_id": 2, "user_id": 8, "ts": "1970-01-01 00:02:00"},
    ]
    b2 = [
        {"event_id": 3, "user_id": 7, "ts": "1970-01-01 00:05:00"},
        {"event_id": 4, "user_id": 9, "ts": "1970-01-01 00:01:00"},  # unknown user
    ]
    _write_json(os.path.join(in_dir, "b1.json"), b1)
    evs = spark.readStream.schema(
        "event_id long, user_id long, ts string"
    ).json(in_dir)
    q = streaming_enrich(evs, hist, out_dir, ckpt)
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        _write_json(os.path.join(in_dir, "b2.json"), b2)

        def got():
            try:
                return {
                    r["event_id"]: r for r in spark.read.parquet(out_dir).collect()
                }
            except Exception:
                return {}

        while time.time() < deadline and len(got()) < 4:
            time.sleep(0.5)
        res = got()
        assert set(res) == {1, 2, 3, 4}
    finally:
        q.stop()

    # exact parity with the batch twin
    all_evs = spark.createDataFrame(
        [(r["event_id"], r["user_id"], r["ts"]) for r in b1 + b2],
        "event_id long, user_id long, ts string",
    )
    twin = {r.event_id: (r.tier_at_event, r.run_id)
            for r in pit_enrich(all_evs, hist).collect()}
    for eid, r in res.items():
        assert (r["tier_at_event"], r["run_id"]) == twin[eid]
    assert res[4]["tier_at_event"] is None
