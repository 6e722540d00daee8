"""W31: continuous calibration monitor (streaming/calibration.py) —
fold-level parity with the q164 batch code path, SUM-merge predecessor
retry contract, and a live readStream drive."""

from __future__ import annotations

import pytest

import json
import os
import time

from pyspark.sql import functions as F

from kinesyslog_spark.queries.mlops import calibration_from_hist, conf_bins
from kinesyslog_spark.streaming.calibration import (
    make_fold,
    streaming_calibration,
)

_B1 = [(0.05, 0), (0.12, 0), (0.35, 1), (0.81, 1), (0.93, 1), (0.51, 0)]
_B2 = [(0.07, 0), (0.44, 1), (0.48, 0), (0.86, 1), (0.99, 1), (0.15, 1)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "p double, y int")


def _report(spark, out_dir, epoch):
    return sorted(
        (r.bin, r.n, r.n_pos, r.mean_conf, r.emp_rate, r.ece_contrib)
        for r in spark.read.parquet(
            f"{out_dir}/epoch_id={epoch}"
        ).collect()
    )


def _batch_twin(spark, rows):
    conf = _df(spark, rows).select(
        F.col("p").cast("decimal(10,6)").alias("p"), "y"
    )
    return sorted(
        (r.bin, r.n, r.n_pos, r.mean_conf, r.emp_rate, r.ece_contrib)
        for r in calibration_from_hist(conf_bins(conf)).collect()
    )


def test_fold_matches_batch_twin(spark, tmp_path):
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    fold = make_fold(out, state)
    fold(_df(spark, _B1), 0)
    fold(_df(spark, _B2), 1)
    assert _report(spark, out, 0) == _batch_twin(spark, _B1)
    assert _report(spark, out, 1) == _batch_twin(spark, _B1 + _B2)


@pytest.mark.slow
def test_fold_retry_reads_predecessor(spark, tmp_path):
    """SUM-merged state is NOT retry-idempotent — a retried epoch must
    merge into the snapshot strictly before its id, leaving state and
    report bit-identical to the clean run."""
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    fold = make_fold(out, state)
    fold(_df(spark, _B1), 0)
    fold(_df(spark, _B2), 1)
    before = _report(spark, out, 1)
    fold(_df(spark, _B2), 1)  # simulated foreachBatch retry
    assert _report(spark, out, 1) == before
    assert _report(spark, out, 1) == _batch_twin(spark, _B1 + _B2)


def test_streaming_live(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    tmp = os.path.join(in_dir, "b1.json.tmp")
    with open(tmp, "w") as f:
        for p, y in _B1:
            f.write(json.dumps({"p": p, "y": y}) + "\n")
    os.rename(tmp, os.path.join(in_dir, "b1.json"))
    stream = spark.readStream.schema("p double, y int").json(in_dir)
    q = streaming_calibration(stream, out, state, ckpt)
    try:
        deadline = time.time() + 60
        expect = _batch_twin(spark, _B1)

        def got():
            try:
                return sorted(
                    (r.bin, r.n, r.n_pos, r.mean_conf, r.emp_rate,
                     r.ece_contrib)
                    for r in spark.read.parquet(out).collect()
                )
            except Exception:
                return None

        while time.time() < deadline and got() != expect:
            time.sleep(0.5)
        assert got() == expect
    finally:
        q.stop()
