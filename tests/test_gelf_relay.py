"""E1-GELF: the live --gelf listen mode — UDP binary ingest (base64
spool) + the streaming dispatch/decompress/reassemble/parse pipeline,
ending in gelf-format envelopes."""

from __future__ import annotations

import asyncio
import base64
import gzip
import json
import os
import socket
import struct
import threading
import time
import zlib

from pyspark.sql import functions as F

GELF_MAGIC = b"\x1e\x0f"


def _doc(host: str, msg: str, ts: int | None) -> bytes:
    d = {"version": "1.1", "host": host, "short_message": msg}
    if ts is not None:
        d["timestamp"] = ts
    return json.dumps(d).encode()


def _chunks(payload: bytes, msg_id: bytes, n: int) -> list[bytes]:
    step = (len(payload) + n - 1) // n
    return [
        GELF_MAGIC + msg_id + bytes([i]) + bytes([n])
        + payload[i * step:(i + 1) * step]
        for i in range(n)
    ]


def _write_lines(path: str, payloads: list[tuple[bytes, str, int]]) -> None:
    rows = []
    for i, (p, src, dest) in enumerate(payloads):
        rows.append({
            "raw_b64": base64.b64encode(p).decode(),
            "source": src,
            "dest": dest,
            "recv_ts": "2024-06-01T00:00:05.000000",
            "seq": i,
        })
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def test_parse_gelf_stream_all_formats(spark, tmp_path):
    from kinesyslog_spark.streaming.gelf_relay import (
        parse_gelf_stream,
        read_gelf_stream,
    )

    in_dir = str(tmp_path / "lines")
    os.makedirs(in_dir)
    chunked = _chunks(zlib.compress(_doc("h3", "chunked zlib", 333)),
                      b"\x01\x02\x03\x04\x05\x06\x07\x08", 2)
    _write_lines(os.path.join(in_dir, "b1.json"), [
        (_doc("h1", "plain json", 111), "10.0.0.1", 12201),
        (zlib.compress(_doc("h2", "zlib doc", 222)), "10.0.0.1", 12201),
        (gzip.compress(_doc("h4", "gzip doc", None)), "10.0.0.2", 12201),
        (chunked[1], "10.0.0.3", 12201),   # out of order
        # Truncated chunk headers (magic but < 12 bytes): must be dropped
        # like the reference (gelf.py parse_header error swallowed), not
        # poison the checkpointed stateful reassembly.
        (GELF_MAGIC, "10.0.0.9", 12201),
        (GELF_MAGIC + b"\x01\x02\x03", "10.0.0.9", 12201),
        (GELF_MAGIC + b"\x01\x02\x03\x04\x05\x06\x07\x08\x00", "10.0.0.9", 12201),
        (chunked[0], "10.0.0.3", 12201),
    ])
    events = parse_gelf_stream(read_gelf_stream(spark, in_dir))
    q = (
        events.writeStream.format("memory").queryName("gelf_sink")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        def rows():
            return spark.sql("SELECT * FROM gelf_sink").collect()

        deadline = time.time() + 90
        while time.time() < deadline and len(rows()) < 4:
            time.sleep(0.5)
        got = {}
        for r in rows():
            d = json.loads(r["message"])
            got[d["host"]] = (d["short_message"], r["ts_ms"], r["source"])
        assert got["h1"] == ("plain json", 111000, "10.0.0.1")
        assert got["h2"] == ("zlib doc", 222000, "10.0.0.1")
        # no timestamp field -> receive-time fallback
        assert got["h4"][0] == "gzip doc"
        assert got["h4"][1] == 1717200005000
        # chunked+zlib reassembled (out-of-order chunks) then inflated
        assert got["h3"] == ("chunked zlib", 333000, "10.0.0.3")
        assert all(len(r["id"]) == 56 and r["id"].isdigit() for r in rows())
    finally:
        q.stop()


def test_gelf_bridge_spools_binary(tmp_path):
    from kinesyslog_spark.sources.bridge import run_bridge

    out_dir = str(tmp_path / "lines")
    loop = asyncio.new_event_loop()
    ready = asyncio.Event()
    stop = asyncio.Event()

    def runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(
            run_bridge(out_dir, ready=ready, stop=stop, gelf=True)
        )

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    deadline = time.time() + 10
    while not ready.is_set() and time.time() < deadline:
        time.sleep(0.05)
    udp_port, tcp_port = run_bridge.bound

    zdoc = zlib.compress(_doc("hb", "compressed via udp", 42))
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.sendto(zdoc, ("127.0.0.1", udp_port))
    s.close()
    # GELF TCP: NUL-delimited plain JSON
    c = socket.create_connection(("127.0.0.1", tcp_port))
    c.sendall(_doc("ht", "tcp json", 7) + b"\x00")
    c.close()
    # GELF TCP compressed: a zlib/gzip stream is ONE whole-connection
    # message (reference GelfProtocol magic dispatch) — it contains
    # 0x0A/0x00 bytes and must NOT be terminator-split (round-2 gap).
    ztcp = zlib.compress(_doc("hz", "tcp zlib " + "x" * 300, 43))
    assert any(bytes([b]) in b"\n\x00\r" for b in ztcp)
    c = socket.create_connection(("127.0.0.1", tcp_port))
    c.sendall(ztcp[:20])
    time.sleep(0.1)  # split write: magic sniff must hold across reads
    c.sendall(ztcp[20:])
    c.close()
    gtcp = gzip.compress(_doc("hg", "tcp gzip", 44))
    c = socket.create_connection(("127.0.0.1", tcp_port))
    c.sendall(gtcp)
    c.close()

    time.sleep(1.5)
    loop.call_soon_threadsafe(stop.set)
    t.join(timeout=10)

    rows = []
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name)) as f:
            rows += [json.loads(line) for line in f]
    payloads = [base64.b64decode(r["raw_b64"]) for r in rows]
    assert {r["dest"] for r in rows} == {udp_port, tcp_port}
    # binary round-trips exactly through base64 (no lossy text decode)
    assert zdoc in payloads
    assert ztcp in payloads and gtcp in payloads  # never line-split
    assert any(
        p[:1] == b"{" and json.loads(p)["host"] == "ht" for p in payloads
    )
    assert all("raw" not in r for r in rows)


def test_gelf_end_to_end_envelopes(spark, tmp_path):
    """UDP datagrams -> gelf bridge -> gelf relay -> record spool with
    logGroup '<prefix>/gelf/<port>'."""
    from kinesyslog_spark.sinks.records import read_spool
    from kinesyslog_spark.sources.bridge import run_bridge
    from kinesyslog_spark.streaming.gelf_relay import start_gelf_relay

    lines_dir = str(tmp_path / "lines")
    spool_dir = str(tmp_path / "records")
    ckpt = str(tmp_path / "ckpt")
    loop = asyncio.new_event_loop()
    ready = asyncio.Event()
    stop = asyncio.Event()

    def runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(
            run_bridge(lines_dir, ready=ready, stop=stop, gelf=True)
        )

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    while not ready.is_set():
        time.sleep(0.05)
    udp_port, _ = run_bridge.bound

    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.sendto(_doc("e2e", "live gelf event", 99), ("127.0.0.1", udp_port))
    s.close()
    time.sleep(1.5)  # age roll

    q = start_gelf_relay(spark, lines_dir, spool_dir, ckpt,
                         trigger_seconds=1)
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not (
            os.path.isdir(spool_dir) and os.listdir(spool_dir)
        ):
            time.sleep(0.5)
        assert os.listdir(spool_dir), "no records spooled"
    finally:
        # NOTE: no processAllAvailable() — with ProcessingTimeTimeout the
        # query schedules cleanup batches forever (state.py docstring);
        # the poll loop above already confirmed the spooled output.
        q.stop()
        loop.call_soon_threadsafe(stop.set)
        t.join(timeout=10)

    env = read_spool(spark, spool_dir).collect()
    assert env and env[0]["logGroup"] == f"kinesyslog/gelf/{udp_port}"
    flat = [e for r in env for e in r["logEvents"]]
    assert any("live gelf event" in e["message"] for e in flat)
    assert all(e["timestamp"] == 99000 for e in flat)
