"""W13 — continuous anomaly detection against a static baseline."""

from __future__ import annotations

import pytest

import json
import os


from pyspark.sql import functions as F

from kinesyslog_spark.streaming.anomaly import (
    anomaly_stream,
    hourly_baseline_stats,
    score_hourly,
    start_anomaly_stream,
)
from kinesyslog_spark.tables import load_table


@pytest.mark.slow
def test_stream_scores_match_batch(spark, sf_dir, tmp_path):
    """Every watermark-finalized hour emits exactly the batch score."""
    events = load_table(spark, sf_dir, "events").select("ts", "event_type")
    stats = hourly_baseline_stats(
        load_table(spark, sf_dir, "events")
    ).collect()
    stats_df = spark.createDataFrame(
        stats, "event_type string, m long, tot long, tot2 long"
    )

    rows = events.orderBy("ts").limit(600).collect()
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    os.makedirs(in_dir)

    def write_wave(name, chunk):
        p = os.path.join(in_dir, name)
        with open(p + ".tmp", "w") as fh:
            for r in chunk:
                fh.write(json.dumps({
                    "ts": r.ts.strftime("%Y-%m-%d %H:%M:%S"),
                    "event_type": r.event_type,
                }) + "\n")
        os.replace(p + ".tmp", p)

    half = len(rows) // 2
    write_wave("w1.json", rows[:half])
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = start_anomaly_stream(spark, stream, stats_df, ck, queryName="anom13")
    try:
        q.processAllAvailable()
        write_wave("w2.json", rows[half:])
        q.processAllAvailable()
        # sentinel far past every real hour + watermark: finalizes all
        from collections import namedtuple

        Sentinel = namedtuple("Sentinel", ["ts", "event_type"])
        last = max(r.ts for r in rows)
        write_wave("w3.json", [Sentinel(last.replace(year=last.year + 1),
                                        "zz_sentinel")])
        q.processAllAvailable()
        got = {
            (r.event_type, r.hour_ms, r.n, r.z_q4)
            for r in spark.sql("SELECT * FROM anom13").collect()
        }
    finally:
        q.stop()

    # batch twin over the SAME subset and the SAME baseline
    sub = spark.createDataFrame(
        [(r.ts, r.event_type) for r in rows], "ts timestamp, event_type string"
    )
    counts = sub.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    want = {
        (r.event_type, r.hour_ms, r.n, r.z_q4)
        for r in score_hourly(counts, stats_df).collect()
    }
    assert got == want and len(want) > 0


def test_anomaly_stream_batch_twin_matches_q82(spark, sf_dir):
    """score_hourly ∘ hourly_baseline_stats over the full table IS q82."""
    from kinesyslog_spark.queries import QUERIES

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    mine = {
        tuple(r) for r in score_hourly(counts, hourly_baseline_stats(ev)).collect()
    }
    q82 = {tuple(r) for r in QUERIES["q82_hourly_anomaly"](spark, sf_dir).collect()}
    assert mine == q82
