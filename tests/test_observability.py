"""O1/O2/O4: observed metrics via batch Observation, the streaming
listener over a real file-replay query, and Prometheus rendering."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from kinesyslog_spark.observability import (
    MESSAGE_BYTES,
    MESSAGE_COUNT,
    RelayMetricsListener,
    observe_messages,
    render_prometheus,
)


def test_batch_observation(spark):
    obs = Observation("t")
    df = spark.createDataFrame([("abc",), ("defg",)], ["raw"]).observe(
        obs,
        F.count(F.lit(1)).alias(MESSAGE_COUNT),
        F.sum(F.octet_length("raw")).alias(MESSAGE_BYTES),
    )
    df.count()
    assert obs.get[MESSAGE_COUNT] == 2 and obs.get[MESSAGE_BYTES] == 7


def test_streaming_listener_accumulates(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    tmp = os.path.join(in_dir, ".tmp")
    with open(tmp, "w") as f:
        for i in range(5):
            f.write(json.dumps({"raw": f"message-{i}"}) + "\n")
    os.rename(tmp, os.path.join(in_dir, "a.json"))

    listener = RelayMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema("raw string").json(in_dir)
        q = (
            observe_messages(stream)
            .writeStream.format("memory").queryName("obs_t").outputMode("append").start()
        )
        q.processAllAvailable()
        q.stop()
        deadline = time.time() + 30
        while time.time() < deadline:
            snap = listener.snapshot()
            if snap[MESSAGE_COUNT] >= 5:
                break
            time.sleep(0.3)
        assert snap[MESSAGE_COUNT] == 5
        assert snap[MESSAGE_BYTES] == sum(len(f"message-{i}") for i in range(5))
        assert snap["batches_total"] >= 1
    finally:
        spark.streams.removeListener(listener)


def test_render_prometheus():
    text = render_prometheus({"message_count_total": 7.0})
    assert "# TYPE kinesyslog_spark_message_count_total counter" in text
    assert "kinesyslog_spark_message_count_total 7.0" in text


def test_metrics_http_server():
    """O4: /metrics, /, /robots.txt served + per-(method,path) request
    counting (reference prometheus.py:45-77 middleware)."""
    import urllib.request

    from kinesyslog_spark.observability import HTTP_REQS, MetricsServer

    registry = {"message_count_total": 42.0}
    srv = MetricsServer(lambda: registry).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"

        root = urllib.request.urlopen(f"{base}/").read()
        assert b"/metrics" in root

        robots = urllib.request.urlopen(f"{base}/robots.txt").read()
        assert b"Disallow" in robots

        try:
            urllib.request.urlopen(f"{base}/nope")
            raised = False
        except Exception:
            raised = True
        assert raised, "unknown path should 404"

        body = urllib.request.urlopen(f"{base}/metrics").read().decode()
        assert "kinesyslog_spark_message_count_total 42.0" in body
        # request counter: the 3 requests above, labeled by path
        assert 'path="/"' in body and 'path="/robots.txt"' in body
        assert 'path="<other>"' in body
        assert f"# TYPE kinesyslog_spark_{HTTP_REQS} counter" in body

        # counter increments across scrapes
        body2 = urllib.request.urlopen(f"{base}/metrics").read().decode()
        assert 'method="GET",path="/metrics"} 2' in body2
    finally:
        srv.stop()
