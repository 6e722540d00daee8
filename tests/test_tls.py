"""S3: TLS-terminated syslog ingestion through the bridge (self-signed
cert generated per-test with the openssl CLI)."""

from __future__ import annotations

import asyncio
import json
import os
import socket
import ssl
import subprocess
import threading
import time

import pytest


@pytest.fixture()
def certpair(tmp_path):
    cert, key = str(tmp_path / "c.pem"), str(tmp_path / "k.pem")
    proc = subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1",
         "-subj", "/CN=localhost"],
        capture_output=True,
    )
    if proc.returncode != 0:
        pytest.skip(f"openssl unavailable: {proc.stderr[:200]}")
    return cert, key


def test_bridge_tls_loopback(tmp_path, certpair):
    from kinesyslog_spark.sources.bridge import make_ssl_context, run_bridge

    cert, key = certpair
    out_dir = str(tmp_path / "lines")
    ctx = make_ssl_context(cert, key)

    loop = asyncio.new_event_loop()
    ready = asyncio.Event()
    stop = asyncio.Event()

    def runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(
            run_bridge(out_dir, ready=ready, stop=stop,
                       tls_port=0, ssl_context=ctx)
        )

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    deadline = time.time() + 10
    while not ready.is_set() and time.time() < deadline:
        time.sleep(0.05)
    _, _, tls_port = run_bridge.bound

    client_ctx = ssl.create_default_context()
    client_ctx.check_hostname = False
    client_ctx.verify_mode = ssl.CERT_NONE
    raw = socket.create_connection(("127.0.0.1", tls_port))
    tls = client_ctx.wrap_socket(raw, server_hostname="localhost")
    assert tls.version() is not None  # handshake completed
    tls.sendall(b"<13>secure hello\n<13>secure ")
    tls.sendall(b"second\n")
    tls.close()

    time.sleep(1.5)
    loop.call_soon_threadsafe(stop.set)
    t.join(timeout=10)

    rows = []
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name)) as f:
            rows += [json.loads(line) for line in f]
    assert {r["raw"] for r in rows} == {"<13>secure hello", "<13>secure second"}
    assert all(r["source"] == "127.0.0.1" for r in rows)


def test_bridge_tls_octet_counted(tmp_path, certpair):
    """RFC5425 §4.3.1 mandates octet-counted framing for syslog/TLS —
    the live TLS path must dispatch it (round-2 gap)."""
    from kinesyslog_spark.sources.bridge import make_ssl_context, run_bridge

    cert, key = certpair
    out_dir = str(tmp_path / "lines")
    ctx = make_ssl_context(cert, key)
    loop = asyncio.new_event_loop()
    ready = asyncio.Event()
    stop = asyncio.Event()

    def runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(
            run_bridge(out_dir, ready=ready, stop=stop,
                       tls_port=0, ssl_context=ctx)
        )

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    deadline = time.time() + 10
    while not ready.is_set() and time.time() < deadline:
        time.sleep(0.05)
    _, _, tls_port = run_bridge.bound

    client_ctx = ssl.create_default_context()
    client_ctx.check_hostname = False
    client_ctx.verify_mode = ssl.CERT_NONE
    raw = socket.create_connection(("127.0.0.1", tls_port))
    tls = client_ctx.wrap_socket(raw, server_hostname="localhost")
    m1 = b"<165>1 2024-01-01T00:00:00Z host app - - - tls octet frame"
    m2 = b"<165>1 2024-01-01T00:00:01Z host app - - - second\nframe"
    tls.sendall(b"%d %s%d %s" % (len(m1), m1, len(m2), m2))
    tls.close()

    time.sleep(1.5)
    loop.call_soon_threadsafe(stop.set)
    t.join(timeout=10)

    rows = []
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name)) as f:
            rows += [json.loads(line) for line in f]
    assert {r["raw"] for r in rows} == {m1.decode(), m2.decode()}
