"""Event-time (watermark-driven) TTL variants — round-12 verdict task
#2. ProcessingTimeTimeout never fires under Trigger.AvailableNow (W9-TTL
r10, W19 r11), so the base layouts' TTL eviction was untestable under
deterministic replay. These tests DRIVE eviction under availableNow:

- W9: streaming_neardup_event_ttl forgets a band bucket once the
  watermark passes last-activity + ttl — a post-horizon near-dup of an
  expired doc emits NO candidate, while a not-yet-expired horizon
  reproduces the no-TTL output (post-eviction parity).
- W19: debounce_event_time closes bursts when the watermark proves the
  quiet gap — start rows match the base layout; end rows (the trailing
  edge the base layout cannot express) emit deterministically.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from kinesyslog_spark.streaming.debounce import (
    debounce_event_time,
    keyed_events,
    make_debounce_fn_event,
)
from kinesyslog_spark.streaming.dedup import streaming_neardup_event_ttl

TEXT_A = "the quick brown fox jumps over the lazy dog again and again"
TEXT_B = "the quick brown fox jumps over the lazy dog again and AGAIN"
TEXT_OTHER = "completely unrelated filler content about spark executors"

T0 = 1_700_000_000_000  # ms


def _iso(ms: int) -> str:
    import datetime as dt

    return dt.datetime.fromtimestamp(
        ms / 1000, tz=dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")


def _write_json(path, rows, mtime: int):
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(path + ".tmp", path)
    os.utime(path, (mtime, mtime))


def _run_neardup_stream(spark, tmp_path, ttl_ms: int, tag: str):
    """Four-wave availableNow replay: doc1, watermark push, another
    push (eviction fires here for doc1's buckets), near-dup doc2."""
    in_dir = str(tmp_path / f"docs_{tag}")
    out_dir = str(tmp_path / f"out_{tag}")
    ck = str(tmp_path / f"ck_{tag}")
    os.makedirs(in_dir)
    hour = 3_600_000
    waves = [
        [{"doc_id": 1, "text": TEXT_A, "ts": _iso(T0)}],
        [{"doc_id": 50, "text": TEXT_OTHER, "ts": _iso(T0 + 2 * hour)}],
        [{"doc_id": 51,
          "text": "totally different words describing shuffle partitions "
                  "and broadcast joins in a long sentence",
          "ts": _iso(T0 + 2 * hour + 1000)}],
        [{"doc_id": 2, "text": TEXT_B, "ts": _iso(T0 + 2 * hour + 2000)}],
    ]
    for i, w in enumerate(waves):
        _write_json(os.path.join(in_dir, f"w{i}.json"), w, 1_700_000_000 + i)
    docs = (
        spark.readStream.schema("doc_id long, text string, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    out = streaming_neardup_event_ttl(docs, ts_col="ts", ttl_ms=ttl_ms)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
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


@pytest.mark.slow
def test_w9_event_ttl_evicts_under_available_now(spark, tmp_path):
    """Horizon (1h) passed by the watermark before doc2 arrives: the
    bucket holding doc1 was evicted, so NO candidate pair emits."""
    got = _run_neardup_stream(spark, tmp_path, ttl_ms=3_600_000, tag="short")
    assert got == set(), f"expired bucket still produced {got}"


@pytest.mark.slow
def test_w9_event_ttl_pre_horizon_parity(spark, tmp_path):
    """Same replay with a 10h horizon: nothing expires, and the output
    matches the no-TTL layout's (doc2 dup_of doc1) — post-eviction
    semantics differ ONLY by the horizon."""
    got = _run_neardup_stream(spark, tmp_path, ttl_ms=36_000_000, tag="long")
    assert got == {(2, 1)}


class FakeState:
    def __init__(self, wm=0):
        self.exists = False
        self.hasTimedOut = False
        self._v = None
        self._wm = wm
        self.timeout_ts = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):
        self._v, self.exists = None, False

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def _drive(fn, state, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts_ms"])
    out = pd.concat(list(fn((7, "click"), iter([pdf]), state)),
                    ignore_index=True)
    return [(int(r.event_id), str(r.kind)) for r in out.itertuples()]


def test_w19_event_body_in_batch_gap_closes_burst():
    fn = make_debounce_fn_event(debounce_ms=30_000)
    st = FakeState()
    # burst 1: events at 0s/20s; 100s starts burst 2 -> burst 1's end
    # (last event = id 2) emits inline
    assert _drive(fn, st, [(1, 0), (2, 20_000), (3, 100_000)]) == [
        (1, "start"), (2, "end"), (3, "start")
    ]
    # timeout timestamp tracks last event + gap
    assert st.timeout_ts == 130_000
    # watermark passes 130s with no data -> trailing edge of burst 2
    st.hasTimedOut = True
    out = pd.concat(list(fn((7, "click"), iter([]), st)),
                    ignore_index=True)
    assert [(int(r.event_id), str(r.kind)) for r in out.itertuples()] == [
        (3, "end")
    ]
    assert not st.exists


def test_w19_event_timeout_never_set_in_past():
    """Late stragglers must not set a timeout at-or-below the current
    watermark (Spark rejects it); the guard clamps to wm + 1."""
    fn = make_debounce_fn_event(debounce_ms=30_000)
    st = FakeState(wm=500_000)
    _drive(fn, st, [(1, 0)])
    assert st.timeout_ts == 500_001


@pytest.mark.slow
def test_w19_event_time_replay_closes_bursts(spark, tmp_path):
    """availableNow replay: start rows equal the base layout's output
    for the same ordered stream; the watermark batch closes the first
    burst (trailing edge emits the burst's LAST event)."""
    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "bursts")
    ck = str(tmp_path / "ck")
    os.makedirs(in_dir)
    minute = 60_000
    waves = [
        [  # burst: e1 starts, e2 extends (20s gap)
            {"event_id": 1, "user_id": 7, "event_type": "click",
             "ts": _iso(T0)},
            {"event_id": 2, "user_id": 7, "event_type": "click",
             "ts": _iso(T0 + 20_000)},
        ],
        [  # watermark push on another key, 10 min later
            {"event_id": 3, "user_id": 8, "event_type": "view",
             "ts": _iso(T0 + 10 * minute)},
        ],
        [  # user 7 again: fresh burst (old state was evicted)
            {"event_id": 4, "user_id": 7, "event_type": "click",
             "ts": _iso(T0 + 11 * minute)},
        ],
    ]
    for i, w in enumerate(waves):
        _write_json(os.path.join(in_dir, f"w{i}.json"), w, 1_700_000_000 + i)
    evs = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    out = debounce_event_time(keyed_events(evs, with_event_time=True))
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.read.parquet(out_dir).collect()
    starts = {r.event_id for r in rows if r.kind == "start"}
    ends = {r.event_id for r in rows if r.kind == "end"}
    # base-layout leading edges: e1 (7's first), e3 (8's first),
    # e4 (7's burst after eviction)
    assert starts == {1, 3, 4}
    # burst 1's trailing edge: its LAST event (e2), closed by the
    # watermark advance of wave 2 — the eviction the processing-time
    # layout could never show under replay
    assert 2 in ends


# ---------------------------------------------------------------------------
# W20 / W33 image twins: same watermark-driven horizon
# ---------------------------------------------------------------------------

def _image_ttl_run(spark, sf_dir, tmp_path, tag, make_stream):
    """4-epoch availableNow replay with rendered PNG payloads: exact
    dup of img 1 arrives as img 2 after two watermark-pushing epochs;
    returns the pair set involving img 2."""
    import pyspark.sql.functions as F

    from kinesyslog_spark.queries.imagehash import render_png_batches
    from kinesyslog_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pay = {
        r.doc_id: bytes(r.payload)
        for r in docs.filter(F.col("doc_id").isin(0, 1, 2)).mapInPandas(
            render_png_batches, schema="doc_id long, payload binary"
        ).collect()
    }
    hour = 3_600_000
    waves = [
        [(1, pay[0], T0)],
        [(50, pay[1], T0 + 2 * hour)],
        [(51, pay[2], T0 + 2 * hour + 1000)],
        [(2, pay[0], T0 + 2 * hour + 2000)],  # exact dup of img 1
    ]
    in_dir = str(tmp_path / f"imgs_{tag}")
    out_dir = str(tmp_path / f"iout_{tag}")
    ck = str(tmp_path / f"ick_{tag}")
    os.makedirs(in_dir)
    for w in waves:
        spark.createDataFrame(
            [(i, p, m) for i, p, m in w],
            "img_id long, payload binary, ts_in long",
        ).select(
            "img_id", "payload",
            F.timestamp_millis(F.col("ts_in")).alias("ts"),
        ).coalesce(1).write.mode("append").parquet(in_dir)
        src = spark.readStream.schema(
            "img_id long, payload binary, ts timestamp"
        ).parquet(in_dir)
        q = (
            make_stream(src)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    try:
        return {(r.img_id, r.dup_of)
                for r in spark.read.parquet(out_dir).collect()
                if 2 in (r.img_id, r.dup_of)}
    except Exception:
        return set()


@pytest.mark.slow
def test_w20_image_event_ttl(spark, sf_dir, tmp_path):
    from kinesyslog_spark.streaming.imagedup import (
        streaming_image_neardup_event_ttl,
    )

    hour = 3_600_000
    got = _image_ttl_run(
        spark, sf_dir, tmp_path, "w20s",
        lambda src: streaming_image_neardup_event_ttl(
            src, ts_col="ts", ttl_ms=hour),
    )
    assert got == set(), f"expired bucket still produced {got}"
    got = _image_ttl_run(
        spark, sf_dir, tmp_path, "w20l",
        lambda src: streaming_image_neardup_event_ttl(
            src, ts_col="ts", ttl_ms=10 * hour),
    )
    assert got == {(2, 1)}


@pytest.mark.slow
def test_w33_proj_event_ttl(spark, sf_dir, tmp_path):
    from kinesyslog_spark.streaming.projdup import (
        frozen_projection_artifacts,
        streaming_projdup_event_ttl,
    )

    art = frozen_projection_artifacts(spark, sf_dir)
    hour = 3_600_000
    got = _image_ttl_run(
        spark, sf_dir, tmp_path, "w33s",
        lambda src: streaming_projdup_event_ttl(
            src, art, ts_col="ts", ttl_ms=hour),
    )
    assert got == set(), f"expired bucket still produced {got}"
    got = _image_ttl_run(
        spark, sf_dir, tmp_path, "w33l",
        lambda src: streaming_projdup_event_ttl(
            src, art, ts_col="ts", ttl_ms=10 * hour),
    )
    assert got == {(2, 1)}


@pytest.mark.slow
def test_w9_coarse_event_ttl(spark, tmp_path):
    """Coarse-layout event TTL is PER-MEMBER: doc1's member expires on
    its own event time even though the watermark-pushing docs keep the
    coarse groups active (the group-granular processing-time horizon
    could never evict here)."""
    from kinesyslog_spark.streaming.dedup import (
        streaming_neardup_coarse_event_ttl,
    )

    hour = 3_600_000

    def run(ttl_ms, tag):
        in_dir = str(tmp_path / f"docs_{tag}")
        out_dir = str(tmp_path / f"out_{tag}")
        ck = str(tmp_path / f"ck_{tag}")
        os.makedirs(in_dir)
        waves = [
            [{"doc_id": 1, "text": TEXT_A, "ts": _iso(T0)}],
            [{"doc_id": 50, "text": TEXT_OTHER,
              "ts": _iso(T0 + 2 * hour)}],
            [{"doc_id": 51,
              "text": "totally different words describing shuffle "
                      "partitions and broadcast joins in a sentence",
              "ts": _iso(T0 + 2 * hour + 1000)}],
            [{"doc_id": 2, "text": TEXT_B,
              "ts": _iso(T0 + 2 * hour + 2000)}],
        ]
        for i, w in enumerate(waves):
            _write_json(os.path.join(in_dir, f"w{i}.json"), w,
                        1_700_000_000 + i)
        docs = (
            spark.readStream.schema("doc_id long, text string, ts string")
            .option("maxFilesPerTrigger", 1)
            .json(in_dir)
        )
        # groups=1 forces EVERY doc into one coarse group, so the
        # watermark pushers keep the group hot — only per-member
        # pruning can expire doc 1
        out = streaming_neardup_coarse_event_ttl(
            docs, ts_col="ts", ttl_ms=ttl_ms, groups=1
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
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

    assert run(hour, "c_short") == set()
    assert run(10 * hour, "c_long") == {(2, 1)}
