"""W22: continuous HLL (streaming/hll.py) — batch-twin parity, the
idempotent-retry property, and a two-epoch replay drive."""

from __future__ import annotations

import json
import os
import time

from kinesyslog_spark.queries.estimators import HLL_M
from kinesyslog_spark.streaming.epoch_state import latest_state_epoch
from kinesyslog_spark.streaming.hll import (
    batch_registers,
    estimate,
    merge_registers,
    streaming_hll,
)


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def test_incremental_merge_equals_batch_twin(spark):
    """Folding two batches register-wise == hashing the union at once."""
    k1, k2 = list(range(0, 300)), list(range(200, 500))
    merged = merge_registers(
        batch_registers(_keys_df(spark, k1), "k"),
        batch_registers(_keys_df(spark, k2), "k"),
    )
    whole = batch_registers(_keys_df(spark, k1 + k2), "k")
    assert {
        (r["j"], r["m_j"]) for r in merged.collect()
    } == {(r["j"], r["m_j"]) for r in whole.collect()}
    assert abs(estimate(spark, merged) - estimate(spark, whole)) == 0.0


def test_retry_is_idempotent(spark):
    """Re-merging the same batch (an at-least-once retry) cannot move
    the sketch — MAX-merge is idempotent."""
    regs = batch_registers(_keys_df(spark, list(range(100))), "k")
    twice = merge_registers(regs, regs)
    assert {
        (r["j"], r["m_j"]) for r in twice.collect()
    } == {(r["j"], r["m_j"]) for r in regs.collect()}


def test_estimate_within_hll_bound(spark):
    n = 2000
    regs = batch_registers(_keys_df(spark, list(range(n))), "k")
    est = estimate(spark, regs)
    assert abs(est - n) / n <= 4 * 1.04 / HLL_M ** 0.5


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_streaming_replay(spark, tmp_path):
    in_dir = str(tmp_path / "keys")
    out_dir = str(tmp_path / "est")
    state_dir = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _write_json(os.path.join(in_dir, "b1.json"), [{"k": i} for i in range(400)])

    docs = spark.readStream.schema("k long").json(in_dir)
    q = streaming_hll(docs, "k", state_dir, out_dir, ckpt)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        _write_json(
            os.path.join(in_dir, "b2.json"), [{"k": i} for i in range(300, 800)]
        )

        def epochs():
            try:
                return spark.read.parquet(out_dir).collect()
            except Exception:
                return []

        while time.time() < deadline and len(epochs()) < 2:
            time.sleep(0.5)
        got = epochs()
        assert len(got) >= 2
    finally:
        q.stop()

    # final state == batch twin over all 800 distinct keys. Read via the
    # latest-complete-epoch protocol: prune now keeps the predecessor
    # snapshot too (the epoch_state.py retry contract), so reading the
    # whole directory would union two epochs' registers.
    twin = batch_registers(_keys_df(spark, list(range(800))), "k")
    latest = latest_state_epoch(spark, state_dir)
    state = spark.read.parquet(f"{state_dir}/epoch={latest}")
    assert {
        (r["j"], r["m_j"]) for r in state.collect()
    } == {(r["j"], r["m_j"]) for r in twin.collect()}
    final_est = max(got, key=lambda r: r["epoch"])["est_raw"]
    assert abs(final_est - estimate(spark, twin)) < 1e-9


def test_state_rotation_crash_safe(spark, tmp_path):
    """Epoch-versioned snapshots: a crash between epochs can never
    strand a missing state_dir (round-4 ADVICE: the old two-step rename
    could), a stale older snapshot is ignored by latest-wins and pruned
    on the next fold, and a retried epoch overwrites its own snapshot."""
    from kinesyslog_spark.streaming.epoch_state import (
        latest_state_epoch,
        prune_state_epochs,
    )
    from kinesyslog_spark.streaming.hll import (
        batch_registers,
        merge_registers,
    )

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    r1 = batch_registers(b1, "k")
    r1.coalesce(1).write.mode("overwrite").parquet(f"{state}/epoch=0")
    assert latest_state_epoch(spark, state) == 0
    # epoch 1 written; simulated crash BEFORE prune: both snapshots exist
    b2 = spark.createDataFrame([(f"m{i}",) for i in range(50)], "k string")
    merged = merge_registers(spark.read.parquet(f"{state}/epoch=0"),
                             batch_registers(b2, "k"))
    merged.coalesce(1).write.mode("overwrite").parquet(f"{state}/epoch=1")
    assert latest_state_epoch(spark, state) == 1  # latest-complete wins
    # retry of epoch 1 (same data) overwrites its own snapshot: no error,
    # same registers (MAX-merge idempotence)
    before = {(r.j, r.m_j) for r in spark.read.parquet(f"{state}/epoch=1").collect()}
    merged.coalesce(1).write.mode("overwrite").parquet(f"{state}/epoch=1")
    after = {(r.j, r.m_j) for r in spark.read.parquet(f"{state}/epoch=1").collect()}
    assert before == after
    # next fold prunes the stale epoch 0
    prune_state_epochs(spark, state, keep=1)
    import os
    assert not os.path.isdir(f"{state}/epoch=0")
    assert latest_state_epoch(spark, state) == 1
