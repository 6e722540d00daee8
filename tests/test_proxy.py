"""S4: PROXY protocol v1/v2 decoding, unit + live bridge loopback."""

from __future__ import annotations

import asyncio
import json
import os
import socket
import struct
import threading
import time

import pytest

from kinesyslog_spark.sources.proxy import NEED_MORE, V2_MAGIC, strip_proxy_header


def test_v1_tcp4():
    src, rest = strip_proxy_header(
        b"PROXY TCP4 192.168.7.9 10.0.0.1 56324 514\r\n<13>hello\n"
    )
    assert src == "192.168.7.9" and rest == b"<13>hello\n"


def test_v1_unknown_keeps_peer():
    src, rest = strip_proxy_header(b"PROXY UNKNOWN\r\npayload")
    assert src is None and rest == b"payload"


def test_v1_partial_needs_more():
    assert strip_proxy_header(b"PROXY TCP4 192.168.") is NEED_MORE
    assert strip_proxy_header(b"PROX") is NEED_MORE


def test_v1_malformed_raises():
    with pytest.raises(ValueError):
        strip_proxy_header(b"PROXY GARBAGE NOPE\r\nx")


def _v2_header(src="172.16.0.9", dst="10.0.0.1", cmd=1):
    body = (
        socket.inet_aton(src) + socket.inet_aton(dst) + struct.pack("!HH", 999, 514)
    )
    return V2_MAGIC + struct.pack("!BBH", 0x20 | cmd, 0x11, len(body)) + body


def test_v2_proxy_command():
    src, rest = strip_proxy_header(_v2_header() + b"<13>via proxy\n")
    assert src == "172.16.0.9" and rest == b"<13>via proxy\n"


def test_v2_local_health_check():
    src, rest = strip_proxy_header(_v2_header(cmd=0) + b"ping")
    assert src is None and rest == b"ping"


def test_v2_partial_needs_more():
    h = _v2_header()
    assert strip_proxy_header(h[:10]) is NEED_MORE
    assert strip_proxy_header(h[:20]) is NEED_MORE


def test_no_proxy_passthrough():
    src, rest = strip_proxy_header(b"<13>plain syslog line\n")
    assert src is None and rest == b"<13>plain syslog line\n"


def test_bridge_with_proxy_protocol(tmp_path):
    from kinesyslog_spark.sources.bridge import run_bridge

    out_dir = str(tmp_path / "lines")
    loop = asyncio.new_event_loop()
    ready = asyncio.Event()
    stop = asyncio.Event()

    def runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(
            run_bridge(out_dir, ready=ready, stop=stop, proxy_protocol=True)
        )

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    deadline = time.time() + 10
    while not ready.is_set() and time.time() < deadline:
        time.sleep(0.05)
    _, tcp_port = run_bridge.bound

    c = socket.create_connection(("127.0.0.1", tcp_port))
    c.sendall(b"PROXY TCP4 203.0.113.77 10.0.0.1 55555 514\r\n")
    time.sleep(0.05)  # header and payload in separate segments
    c.sendall(b"<13>proxied message\n")
    c.close()

    time.sleep(1.5)
    loop.call_soon_threadsafe(stop.set)
    t.join(timeout=10)

    rows = []
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name)) as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) == 1
    # the source column carries the REAL client, not the proxy peer
    assert rows[0]["source"] == "203.0.113.77"
    assert rows[0]["raw"] == "<13>proxied message"


# ---------------------------------------------------------------------------
# PROXY v2 TLV extraction (reference proxy.py:185-199)
# ---------------------------------------------------------------------------

def _tlv(tlv_type: int, value: bytes) -> bytes:
    return struct.pack("!BH", tlv_type, len(value)) + value


def _v2_header_tlv(tlvs: bytes, src="172.16.0.9", dst="10.0.0.1", cmd=1):
    body = (
        socket.inet_aton(src) + socket.inet_aton(dst)
        + struct.pack("!HH", 999, 514) + tlvs
    )
    return V2_MAGIC + struct.pack("!BBH", 0x20 | cmd, 0x11, len(body)) + body


def test_v2_tlv_extraction():
    from kinesyslog_spark.sources.proxy import parse_proxy_header

    tlvs = (
        _tlv(0x01, b"h2")                      # ALPN
        + _tlv(0x02, b"logs.example.com")      # AUTHORITY
        + _tlv(0x04, b"\x00\x00\x00")          # NOOP padding: never surfaced
        + _tlv(0xEA, b"\x01vpce-123")          # AWS (VPC endpoint id)
    )
    info, rest = parse_proxy_header(_v2_header_tlv(tlvs) + b"<13>x\n")
    assert info.source == "172.16.0.9" and rest == b"<13>x\n"
    assert info.tlvs == {
        "PP2_TYPE_ALPN": b"h2",
        "PP2_TYPE_AUTHORITY": b"logs.example.com",
        "PP2_TYPE_AWS": b"\x01vpce-123",
    }


def test_v2_tlv_unknown_type_skipped():
    from kinesyslog_spark.sources.proxy import parse_proxy_header

    tlvs = _tlv(0x99, b"??") + _tlv(0x01, b"http/1.1")
    info, _ = parse_proxy_header(_v2_header_tlv(tlvs) + b"x")
    assert info.tlvs == {"PP2_TYPE_ALPN": b"http/1.1"}


def test_v2_tlv_truncated_is_malformed():
    from kinesyslog_spark.sources.proxy import parse_proxy_header

    # length says 8 but only 2 value bytes present inside the declared body
    tlvs = struct.pack("!BH", 0x01, 8) + b"h2"
    with pytest.raises(ValueError):
        parse_proxy_header(_v2_header_tlv(tlvs) + b"x")


def test_v2_no_tlvs_empty_dict():
    from kinesyslog_spark.sources.proxy import parse_proxy_header

    info, rest = parse_proxy_header(_v2_header() + b"payload")
    assert info.source == "172.16.0.9" and info.tlvs == {} and rest == b"payload"


def test_v1_has_no_tlvs():
    from kinesyslog_spark.sources.proxy import parse_proxy_header

    info, _ = parse_proxy_header(
        b"PROXY TCP4 192.168.7.9 10.0.0.1 56324 514\r\nx"
    )
    assert info.source == "192.168.7.9" and info.tlvs == {}


def test_malformed_proxy_closes_without_spooling(tmp_path):
    """A garbage PROXY header must never be flushed into the spool as a
    log message attributed to the peer (reference _close_with_error)."""
    from kinesyslog_spark.sources.bridge import run_bridge

    out_dir = str(tmp_path / "lines")
    loop = asyncio.new_event_loop()
    ready = asyncio.Event()
    stop = asyncio.Event()

    def runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(
            run_bridge(out_dir, ready=ready, stop=stop, proxy_protocol=True)
        )

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    deadline = time.time() + 10
    while not ready.is_set() and time.time() < deadline:
        time.sleep(0.05)
    _, tcp_port = run_bridge.bound

    c = socket.create_connection(("127.0.0.1", tcp_port))
    c.sendall(b"PROXY GARBAGE NOPE\r\n<13>should never appear\n")
    time.sleep(0.3)
    c.close()

    time.sleep(1.5)
    loop.call_soon_threadsafe(stop.set)
    t.join(timeout=10)

    rows = []
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            with open(os.path.join(out_dir, name)) as f:
                rows += [json.loads(line) for line in f]
    assert rows == []


# ---------------------------------------------------------------------------
# Property: v2 TLV round-trip under arbitrary vectors + split points
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_KNOWN = [0x01, 0x02, 0x03, 0x20, 0x26, 0xEA]


@settings(max_examples=150, deadline=None)
@given(
    tlvs=st.lists(
        st.tuples(
            st.sampled_from(_KNOWN + [0x04, 0x30, 0x99]),  # incl. NOOP+unknown
            st.binary(min_size=0, max_size=40),
        ),
        max_size=6,
    ),
    payload=st.binary(max_size=60),
)
def test_v2_tlv_roundtrip_property(tlvs, payload):
    from kinesyslog_spark.sources.proxy import TLV_TYPES, parse_proxy_header

    blob = b"".join(struct.pack("!BH", t, len(v)) + v for t, v in tlvs)
    info, rest = parse_proxy_header(_v2_header_tlv(blob) + payload)
    assert rest == payload
    assert info.source == "172.16.0.9"
    # last-value-wins per type, NOOP and unknown types never surfaced
    expect = {}
    for t, v in tlvs:
        name = TLV_TYPES.get(t)
        if name and name != "PP2_TYPE_NOOP":
            expect[name] = v
    assert info.tlvs == expect


@settings(max_examples=100, deadline=None)
@given(
    cut=st.integers(min_value=0, max_value=80),
    payload=st.binary(min_size=1, max_size=30),
)
def test_v2_header_split_never_misparses(cut, payload):
    """Any prefix of a valid TLV-bearing v2 header is NEED_MORE, never a
    wrong parse and never an exception."""
    from kinesyslog_spark.sources.proxy import parse_proxy_header

    header = _v2_header_tlv(_tlv(0x01, b"h2") + _tlv(0xEA, b"\x01vpce"))
    full = header + payload
    head = full[: min(cut, len(full))]
    if len(head) >= len(header):
        # complete header (payload possibly truncated): parses, and the
        # rest is exactly the payload bytes present so far
        info, rest = parse_proxy_header(head)
        assert info.source == "172.16.0.9"
        assert info.tlvs["PP2_TYPE_ALPN"] == b"h2"
        assert rest == head[len(header):]
    else:
        assert parse_proxy_header(head) is NEED_MORE
