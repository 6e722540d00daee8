"""Loopback test for the UDP/TCP -> spool ingest bridge (S1/S2)."""

from __future__ import annotations

import asyncio
import json
import os
import socket
import threading
import time


def test_bridge_udp_tcp_loopback(tmp_path):
    from kinesyslog_spark.sources.bridge import run_bridge

    out_dir = str(tmp_path / "lines")
    loop = asyncio.new_event_loop()
    ready = asyncio.Event()
    stop = asyncio.Event()
    result = {}

    def runner():
        asyncio.set_event_loop(loop)
        result["ports"] = loop.run_until_complete(
            run_bridge(out_dir, ready=ready, stop=stop)
        )

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    deadline = time.time() + 10
    while not ready.is_set() and time.time() < deadline:
        time.sleep(0.05)
    assert ready.is_set(), "bridge did not start"
    udp_port, tcp_port = run_bridge.bound

    # UDP: one datagram = one message
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.sendto(b"<13>udp message one\n", ("127.0.0.1", udp_port))
    s.close()

    # TCP: terminator framing across a split write + flush-on-close tail
    c = socket.create_connection(("127.0.0.1", tcp_port))
    c.sendall(b"<13>tcp mess")
    time.sleep(0.05)
    c.sendall(b"age two\n<13>tail without terminator")
    c.close()

    time.sleep(1.5)  # allow age-based roll
    loop.call_soon_threadsafe(stop.set)
    t.join(timeout=10)

    rows = []
    for name in os.listdir(out_dir):
        assert not name.startswith("_tmp-")
        with open(os.path.join(out_dir, name)) as f:
            rows += [json.loads(line) for line in f]
    msgs = {r["raw"] for r in rows}
    assert msgs == {
        "<13>udp message one",
        "<13>tcp message two",
        "<13>tail without terminator",
    }
    for r in rows:
        assert r["source"] == "127.0.0.1"
        assert isinstance(r["seq"], int) and "recv_ts" in r


def test_bridge_tcp_octet_counted(tmp_path):
    """F2 on the LIVE path: RFC6587 §3.4.1 octet-counted frames —
    including one straddling a write boundary and one containing a
    newline — mixed with terminator-framed traffic on one connection
    (reference protocol.py:148-165 per-message leading-digit dispatch)."""
    from kinesyslog_spark.sources.bridge import run_bridge

    out_dir = str(tmp_path / "lines")
    loop = asyncio.new_event_loop()
    ready = asyncio.Event()
    stop = asyncio.Event()

    def runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(run_bridge(out_dir, ready=ready, stop=stop))

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    deadline = time.time() + 10
    while not ready.is_set() and time.time() < deadline:
        time.sleep(0.05)
    _, tcp_port = run_bridge.bound

    m1 = b"<13>octet one"
    m2 = b"<13>embedded\nnewline"          # would be split by F1
    c = socket.create_connection(("127.0.0.1", tcp_port))
    c.sendall(b"%d %s" % (len(m1), m1))
    # octet frame straddling the read boundary: header now, body later
    c.sendall(b"%d " % len(m2) + m2[:5])
    time.sleep(0.1)
    c.sendall(m2[5:])
    # terminator-framed message on the SAME connection afterwards
    c.sendall(b"<13>plain terminator framed\n")
    c.close()

    time.sleep(1.5)
    loop.call_soon_threadsafe(stop.set)
    t.join(timeout=10)

    rows = []
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name)) as f:
            rows += [json.loads(line) for line in f]
    assert {r["raw"] for r in rows} == {
        "<13>octet one",
        "<13>embedded\nnewline",
        "<13>plain terminator framed",
    }
