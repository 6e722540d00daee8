"""RocksDB state store: the W9 stateful near-dup flow runs green on the
RocksDB provider (the 100 TB configuration — state on local SSD with
changelog checkpointing, not executor heap), verified both by results
and by the provider's own metrics in the query progress."""

from __future__ import annotations

import json
import os
import time

from kinesyslog_spark.session import (
    ROCKSDB_STATE_CONF,
    disable_rocksdb_state,
    enable_rocksdb_state,
)
from kinesyslog_spark.streaming.dedup import streaming_neardup

WORDS = ("spark join window vector table scan merge part batch stream "
         "hash filter order group sort value query row data line").split()


def _text(perturb: int | None = None) -> str:
    toks = list(WORDS) * 2
    if perturb is not None:
        toks[perturb] = f"zz{perturb}"
    return " ".join(toks)


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_w9_neardup_on_rocksdb_state(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    _write_json(os.path.join(in_dir, "b1.json"), [
        {"doc_id": 1, "text": _text()},
    ])
    docs = spark.readStream.schema("doc_id long, text string").json(in_dir)
    enable_rocksdb_state(spark)
    try:
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_STATE_CONF[
                "spark.sql.streaming.stateStore.providerClass"
            ]
        )
        q = (
            streaming_neardup(docs)
            .writeStream.format("memory")
            .queryName("rocksdb_neardup_sink")
            .outputMode("append")
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline and not q.lastProgress:
                time.sleep(0.5)
            _write_json(os.path.join(in_dir, "b2.json"), [
                {"doc_id": 3, "text": _text(perturb=5)},
            ])

            def rows():
                return {
                    (r["doc_id"], r["dup_of"])
                    for r in spark.sql(
                        "SELECT * FROM rocksdb_neardup_sink"
                    ).collect()
                }

            while time.time() < deadline and (3, 1) not in rows():
                time.sleep(0.5)
            assert (3, 1) in rows(), "cross-batch near-dup missed on RocksDB"

            # the state operator must actually be running on RocksDB:
            # its customMetrics namespace only exists on that provider
            prog = q.lastProgress
            ops = prog["stateOperators"]
            assert ops, f"no state operators in progress: {prog}"
            metrics = ops[0].get("customMetrics", {})
            assert any(k.startswith("rocksdb") for k in metrics), (
                f"expected rocksdb* metrics, got {sorted(metrics)}"
            )
        finally:
            q.stop()
    finally:
        disable_rocksdb_state(spark)
    # reverted for subsequent tests in the shared session
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        != ROCKSDB_STATE_CONF[
            "spark.sql.streaming.stateStore.providerClass"
        ]
    )


_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)


def test_w9_default_path_auto_selects_rocksdb(spark, tmp_path):
    """Round-10 verdict #3: RocksDB is DOCUMENTED as the corpus-scale
    default for the no-TTL (corpus-linear-state) twins — so the default
    path must actually select it, live, without the caller knowing
    about enable_rocksdb_state."""
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    _write_json(os.path.join(in_dir, "b1.json"), [
        {"doc_id": 1, "text": _text()},
        {"doc_id": 3, "text": _text(perturb=5)},
    ])
    docs = spark.readStream.schema("doc_id long, text string").json(in_dir)
    try:
        spark.conf.unset(_PROVIDER_KEY)
    except Exception:
        pass
    try:
        out = streaming_neardup(docs)  # no TTL -> auto-flip at build time
        assert (
            spark.conf.get(_PROVIDER_KEY, None)
            == ROCKSDB_STATE_CONF[_PROVIDER_KEY]
        ), "no-TTL streaming_neardup did not auto-enable RocksDB"
        q = (
            out.writeStream.format("memory")
            .queryName("auto_rocksdb_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
            prog = q.lastProgress
            ops = prog["stateOperators"] if prog else []
            assert ops, f"no state operators in progress: {prog}"
            metrics = ops[0].get("customMetrics", {})
            assert any(k.startswith("rocksdb") for k in metrics), (
                f"default path not on RocksDB; metrics {sorted(metrics)}"
            )
        finally:
            q.stop()
    finally:
        disable_rocksdb_state(spark)


def test_auto_rocksdb_respects_pinned_provider_and_dial(
    spark, monkeypatch
):
    """The auto-flip is a default, not a mandate: an explicitly pinned
    provider wins, and SPARK_GRAFT_ROCKSDB_AUTO=0 disables it."""
    from kinesyslog_spark.session import auto_rocksdb_for_unbounded_state

    spark.conf.set(_PROVIDER_KEY, _HDFS_PROVIDER)
    try:
        assert auto_rocksdb_for_unbounded_state(spark) is False
        assert spark.conf.get(_PROVIDER_KEY) == _HDFS_PROVIDER
    finally:
        spark.conf.unset(_PROVIDER_KEY)

    monkeypatch.setenv("SPARK_GRAFT_ROCKSDB_AUTO", "0")
    assert auto_rocksdb_for_unbounded_state(spark) is False
    assert spark.conf.get(_PROVIDER_KEY, None) is None


def test_auto_rocksdb_skips_resumed_checkpoint(spark, tmp_path):
    """ADVICE r11 (session.py): a checkpoint created under an earlier
    provider must keep it — the auto-flip only applies to FRESH
    checkpoints (RocksDB cannot read HDFS-backed state files)."""
    from kinesyslog_spark.session import (
        auto_rocksdb_for_unbounded_state,
        checkpoint_has_state,
        disable_rocksdb_state,
    )

    ck = tmp_path / "ck"
    # fresh / state-less layouts do not suppress the default
    assert checkpoint_has_state(None) is False
    assert checkpoint_has_state(str(ck)) is False
    (ck / "state" / "0" / "0").mkdir(parents=True)
    assert checkpoint_has_state(str(ck)) is False  # empty dirs = fresh
    try:
        spark.conf.unset(_PROVIDER_KEY)
    except Exception:
        pass
    try:
        assert auto_rocksdb_for_unbounded_state(spark, str(ck)) is True
        assert spark.conf.get(_PROVIDER_KEY, None) is not None
    finally:
        disable_rocksdb_state(spark)
    # prior-run state present -> suppressed, conf untouched
    (ck / "state" / "0" / "0" / "1.delta").write_text("x")
    assert checkpoint_has_state(str(ck)) is True
    assert auto_rocksdb_for_unbounded_state(spark, str(ck)) is False
    assert spark.conf.get(_PROVIDER_KEY, None) is None
    # and the builder threads its checkpoint_dir through
    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    _write_json(str(in_dir / "b.json"), [{"doc_id": 1, "text": _text()}])
    docs = spark.readStream.schema("doc_id long, text string").json(
        str(in_dir)
    )
    try:
        streaming_neardup(docs, checkpoint_dir=str(ck))
        assert spark.conf.get(_PROVIDER_KEY, None) is None, (
            "builder auto-flipped RocksDB onto a resumed checkpoint"
        )
    finally:
        disable_rocksdb_state(spark)
