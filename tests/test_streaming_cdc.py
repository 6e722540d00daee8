"""W12 — incremental SCD2 maintenance: batch-equivalence, idempotent
replay, and the live foreachBatch stream."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from kinesyslog_spark.queries import QUERIES
from kinesyslog_spark.queries.pipeline_ops import tier_expr
from kinesyslog_spark.streaming.cdc import (
    apply_epoch,
    read_scd2,
    scd2_apply_batch,
    start_scd2_stream,
)
from kinesyslog_spark.tables import load_table


def _changes(spark, sf_dir):
    """The q81 change feed: (user_id, ts_ms, ord, tier)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            F.col("event_id").alias("ord"),
            tier_expr("value").alias("tier"),
        )
    )


def _canon(rows):
    return sorted(
        (r.user_id, r.run_id, r.tier, r.valid_from_ms, r.valid_to_ms,
         r.n_events, r.is_current)
        for r in rows
    )


def test_incremental_equals_batch_build(spark, sf_dir):
    """Folding the change feed in N event-time-ordered batches must land
    on exactly the q81 batch-build history."""
    all_rows = _changes(spark, sf_dir).collect()
    all_rows.sort(key=lambda r: (r.ts_ms, r.ord))
    third = (len(all_rows) + 2) // 3
    table = None
    for i in range(0, len(all_rows), third):
        chunk = spark.createDataFrame(
            all_rows[i : i + third], "user_id long, ts_ms long, ord long, tier string"
        )
        table = scd2_apply_batch(table, chunk)
        table = spark.createDataFrame(table.collect(), table.schema)  # materialize
    got = _canon(table.collect())
    want = _canon(QUERIES["q81_scd2_history"](spark, sf_dir).collect())
    assert got == want


def test_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    table_dir = str(tmp_path / "scd2")
    ch = _changes(spark, sf_dir).limit(200)
    assert apply_epoch(spark, table_dir, 0, ch) is True
    before = _canon(read_scd2(spark, table_dir).collect())
    # foreachBatch at-least-once: the same epoch replays after a failure
    assert apply_epoch(spark, table_dir, 0, ch) is False
    after = _canon(read_scd2(spark, table_dir).collect())
    assert before == after


def test_scd2_stream_end_to_end(spark, sf_dir, tmp_path):
    """Two file-source waves through start_scd2_stream; the maintained
    table must equal the one-shot batch fold of the same changes."""
    in_dir = str(tmp_path / "in")
    table_dir = str(tmp_path / "table")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    rows = _changes(spark, sf_dir).collect()
    rows.sort(key=lambda r: (r.ts_ms, r.ord))
    rows = rows[:400]
    half = len(rows) // 2

    def write_wave(name, chunk):
        path = os.path.join(in_dir, name)
        with open(path + ".tmp", "w") as fh:
            for r in chunk:
                fh.write(json.dumps({
                    "user_id": r.user_id, "ts_ms": r.ts_ms,
                    "ord": r.ord, "tier": r.tier,
                }) + "\n")
        os.replace(path + ".tmp", path)

    write_wave("w1.json", rows[:half])
    stream = (
        spark.readStream.schema("user_id long, ts_ms long, ord long, tier string")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = start_scd2_stream(spark, stream, table_dir, ck_dir)
    try:
        q.processAllAvailable()
        write_wave("w2.json", rows[half:])
        q.processAllAvailable()
    finally:
        q.stop()

    got = _canon(read_scd2(spark, table_dir).collect())
    chunk = spark.createDataFrame(rows, "user_id long, ts_ms long, ord long, tier string")
    want = _canon(scd2_apply_batch(None, chunk).collect())
    assert got == want


# ---------------------------------------------------------------------------
# property: incremental fold == one-shot fold, vs a pure-Python SCD2 model
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _py_scd2(events):
    """Reference model: events are (user, ts_ms, ord, tier), globally
    ordered per key by (ts_ms, ord)."""
    out = {}
    for u, ts, o, tier in sorted(events, key=lambda e: (e[0], e[1], e[2])):
        runs = out.setdefault(u, [])
        if runs and runs[-1]["tier"] == tier:
            runs[-1]["n"] += 1
        else:
            runs.append({"tier": tier, "from": ts, "n": 1})
    rows = set()
    for u, runs in out.items():
        for i, r in enumerate(runs):
            nxt = runs[i + 1]["from"] if i + 1 < len(runs) else None
            rows.add((u, i + 1, r["tier"], r["from"], nxt, r["n"], nxt is None))
    return rows


_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),        # user
        st.integers(min_value=0, max_value=50),       # ts_ms
        st.sampled_from(["low", "mid", "high"]),      # tier
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(evs=_events_strategy, cuts=st.lists(st.integers(0, 39), max_size=3))
def test_scd2_fold_property(spark, evs, cuts):
    # unique ord per event; global (ts, ord) order defines the timeline
    events = [(u, ts, i, tier) for i, (u, ts, tier) in enumerate(evs)]
    events.sort(key=lambda e: (e[1], e[2]))
    bounds = sorted({c for c in cuts if c < len(events)} | {len(events)})
    table, start = None, 0
    for b in bounds:
        if b <= start:
            continue
        chunk = spark.createDataFrame(
            [(u, ts, o, t) for (u, ts, o, t) in events[start:b]],
            "user_id long, ts_ms long, ord long, tier string",
        )
        merged = scd2_apply_batch(table, chunk)
        table = spark.createDataFrame(merged.collect(), merged.schema)
        start = b
    got = {
        (r.user_id, r.run_id, r.tier, r.valid_from_ms, r.valid_to_ms,
         r.n_events, r.is_current)
        for r in table.collect()
    }
    assert got == _py_scd2(events)


def test_snapshot_vacuum_keeps_readable_history(spark, sf_dir, tmp_path):
    from kinesyslog_spark.streaming.cdc import (
        SNAPSHOT_RETENTION,
        current_snapshot,
        vacuum_snapshots,
    )

    table_dir = str(tmp_path / "scd2v")
    rows = _changes(spark, sf_dir).collect()
    rows.sort(key=lambda r: (r.ts_ms, r.ord))
    rows = rows[:240]
    step = 30
    for epoch, i in enumerate(range(0, len(rows), step)):
        chunk = spark.createDataFrame(
            rows[i : i + step], "user_id long, ts_ms long, ord long, tier string"
        )
        assert apply_epoch(spark, table_dir, epoch, chunk) is True
    snaps = sorted(d for d in os.listdir(table_dir) if d.startswith("snap-"))
    # retention bound: published + SNAPSHOT_RETENTION predecessors
    assert len(snaps) <= SNAPSHOT_RETENTION + 1
    assert os.path.basename(current_snapshot(table_dir)) == snaps[-1]
    # table still equals the one-shot fold after vacuuming
    got = _canon(read_scd2(spark, table_dir).collect())
    want = _canon(
        scd2_apply_batch(
            None,
            spark.createDataFrame(rows, "user_id long, ts_ms long, ord long, tier string"),
        ).collect()
    )
    assert got == want
    # an explicit full vacuum keeps only the published snapshot + keep=0
    vacuum_snapshots(table_dir, keep=0)
    left = sorted(d for d in os.listdir(table_dir) if d.startswith("snap-"))
    assert left == [os.path.basename(current_snapshot(table_dir))]
