"""End-to-end streaming soak: live sockets → ingest bridge → streaming
relay → record spool → uploader (fake Firehose client), over several
micro-batch waves — the full `kinesyslog listen` path the reference is
deployed for (server.py wiring), with metrics asserted per O1/O2.

Every message sent over the wire must come back out of the fake
Firehose exactly once (at-least-once contract + per-record ack with a
healthy client = exactly the sent set), and the streaming listener's
registry must account for every line."""

from __future__ import annotations

import pytest

import asyncio
import gzip
import json
import os
import socket
import threading
import time

WAVES = 4
UDP_PER_WAVE = 25


class FakeFirehose:
    """Always-healthy in-memory Firehose twin (K2-K4 test double)."""

    def __init__(self) -> None:
        self.received: list[bytes] = []
        self._n = 0

    def describe_delivery_stream(self, DeliveryStreamName):  # noqa: N803
        return {"DeliveryStreamDescription": {"DeliveryStreamStatus": "ACTIVE"}}

    def put_record_batch(self, DeliveryStreamName, Records):  # noqa: N803
        responses = []
        for rec in Records:
            self._n += 1
            self.received.append(rec["Data"])
            responses.append({"RecordId": f"r{self._n}"})
        return {"RequestResponses": responses}


@pytest.mark.slow
def test_relay_soak_bridge_to_uploader(spark, tmp_path):
    from kinesyslog_spark.observability import (
        MESSAGE_BYTES,
        MESSAGE_COUNT,
        RelayMetricsListener,
    )
    from kinesyslog_spark.sinks.uploader import SpoolUploader
    from kinesyslog_spark.sources.bridge import run_bridge
    from kinesyslog_spark.streaming.relay import start_relay

    in_dir = str(tmp_path / "in")
    spool_dir = str(tmp_path / "records")
    ckpt = str(tmp_path / "ckpt")

    loop = asyncio.new_event_loop()
    ready = asyncio.Event()
    stop = asyncio.Event()

    def runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(run_bridge(in_dir, ready=ready, stop=stop))

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    deadline = time.time() + 10
    while not ready.is_set() and time.time() < deadline:
        time.sleep(0.05)
    udp_port, tcp_port = run_bridge.bound

    listener = RelayMetricsListener()
    spark.streams.addListener(listener)
    client = FakeFirehose()
    uploader = SpoolUploader(spool_dir, "soak", client)
    uploader.validate_stream()
    os.makedirs(spool_dir, exist_ok=True)

    q = start_relay(spark, in_dir, spool_dir, ckpt, trigger_seconds=1)
    sent = set()
    try:
        for w in range(WAVES):
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            for i in range(UDP_PER_WAVE):
                body = f"soak-udp {w}-{i}"
                line = (
                    f"<13>1 2024-01-01T00:00:{i % 60:02d}.000000+00:00 "
                    f"host app - - - {body}\n"
                )
                s.sendto(line.encode(), ("127.0.0.1", udp_port))
                sent.add(body)
            s.close()
            # one octet-counted TCP frame per wave (live F2 path)
            body = f"soak-tcp {w}"
            msg = (
                f"<13>1 2024-01-01T00:00:59.000000+00:00 host app - - - {body}"
            ).encode()
            c = socket.create_connection(("127.0.0.1", tcp_port))
            c.sendall(b"%d %s" % (len(msg), msg))
            c.close()
            sent.add(body)

            time.sleep(1.3)  # bridge age-roll publishes the wave
            q.processAllAvailable()
            uploader.run_cycle(force=True)

        # drain any straggler roll
        time.sleep(1.3)
        q.processAllAvailable()
        uploader.run_cycle(force=True)
    finally:
        q.stop()
        loop.call_soon_threadsafe(stop.set)
        t.join(timeout=10)
        spark.streams.removeListener(listener)

    # Every wire message delivered to Firehose exactly once.
    got = []
    for rec in client.received:
        doc = json.loads(gzip.decompress(rec))
        got += [e["message"].rsplit(" - - - ", 1)[1] for e in doc["logEvents"]]
    assert sorted(got) == sorted(sent), (
        f"sent {len(sent)} messages, delivered {len(got)}"
    )
    # spool fully drained (per-record ack deleted every uploaded file)
    assert not [
        n for n in os.listdir(spool_dir) if n.startswith("firehose_event-")
    ]
    # O1/O2 metrics account for every line across multiple micro-batches
    snap = listener.snapshot()
    assert snap[MESSAGE_COUNT] == len(sent)
    assert snap[MESSAGE_BYTES] > 0
    assert snap["batch_records"] == len(sent)
    assert snap["batches_total"] >= WAVES
    assert uploader.stats.uploaded == len(client.received)
    assert uploader.stats.failed == 0
