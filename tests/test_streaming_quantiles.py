"""W23: continuous quantile monitor (streaming/quantiles.py) — partial
mergeability == batch twin, epoch-overwrite idempotency, clamping, and
a two-epoch replay drive."""

from __future__ import annotations

import json
import os
import time

from kinesyslog_spark.queries.estimators import N_BUCKETS
from kinesyslog_spark.streaming.quantiles import (
    batch_histogram,
    merged_quantiles,
    streaming_quantiles,
)

_LO, _HI = 0.0, 1000.0


def _vals_df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


def _hist_dict(df):
    return {r["bkt"]: r["c"] for r in df.collect()}


def test_partials_merge_to_batch_twin(spark):
    v1 = [i * 0.7 for i in range(800)]
    v2 = [i * 1.3 for i in range(500)]
    ha = _hist_dict(batch_histogram(_vals_df(spark, v1), "x", _LO, _HI))
    hb = _hist_dict(batch_histogram(_vals_df(spark, v2), "x", _LO, _HI))
    whole = _hist_dict(batch_histogram(_vals_df(spark, v1 + v2), "x", _LO, _HI))
    merged = {b: ha.get(b, 0) + hb.get(b, 0) for b in set(ha) | set(hb)}
    assert merged == whole


def test_out_of_frame_clamps_to_edges(spark):
    h = _hist_dict(
        batch_histogram(_vals_df(spark, [-50.0, 2000.0, 500.0]), "x", _LO, _HI)
    )
    assert h.get(0) == 1 and h.get(N_BUCKETS - 1) == 1
    assert sum(h.values()) == 3


def _write_json(path, rows):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_streaming_replay_and_quantiles(spark, tmp_path):
    in_dir = str(tmp_path / "vals")
    part_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    b1 = [{"x": float(i)} for i in range(0, 500)]
    b2 = [{"x": float(i)} for i in range(500, 1000)]
    _write_json(os.path.join(in_dir, "b1.json"), b1)

    docs = spark.readStream.schema("x double").json(in_dir)
    q = streaming_quantiles(docs, "x", _LO, _HI, part_dir, ckpt)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        _write_json(os.path.join(in_dir, "b2.json"), b2)

        def total():
            try:
                return sum(
                    r["c"] for r in spark.read.parquet(part_dir).collect()
                )
            except Exception:
                return 0

        while time.time() < deadline and total() < 1000:
            time.sleep(0.5)
        assert total() == 1000
    finally:
        q.stop()

    got = dict(merged_quantiles(spark, part_dir, _LO, _HI))
    # uniform 0..999 over a [0, 1000) frame: estimates sit within one
    # bucket width (1000/128 ≈ 7.8) of the true quantiles
    width = (_HI - _LO) / N_BUCKETS
    for p, want in ((0.5, 500.0), (0.9, 900.0), (0.99, 990.0)):
        assert abs(got[p] - want) <= width, (p, got[p])

    # epoch idempotency: re-writing an epoch partial (a retry) does not
    # change the merged result
    import shutil

    epochs = [d for d in os.listdir(part_dir) if d.startswith("epoch_id=")]
    src = os.path.join(part_dir, epochs[0])
    tmp = src + ".bak"
    shutil.copytree(src, tmp)
    shutil.rmtree(src)
    os.rename(tmp, src)
    assert dict(merged_quantiles(spark, part_dir, _LO, _HI)) == got
