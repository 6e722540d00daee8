r"""UDP/TCP → spool-directory ingest bridge (reference S1/S2, server.py +
protocol.py, re-scoped for a Spark engine).

Spark has no TCP/UDP syslog source, so ingestion is a small asyncio
daemon that terminates sockets, frames messages (F1 terminator framing
for TCP; one datagram = one message for UDP, protocol.py:46-48), stamps
(source, dest, recv_ts, seq), and publishes JSON-line files atomically
(write temp → rename) into a directory that the Structured Streaming
file source tails (streaming/relay.py). Files roll on count or age —
the micro-batching analog of the reference's ring-buffer batches
(≤128 msgs/slot, constant.py:3).

TLS termination (S3) and PROXY protocol (S4, with v2 TLV extraction)
are layered onto the TCP listener. GELF mode (`gelf=True`, the
reference's `--gelf`) spools binary datagrams/frames base64-encoded for
the dispatch/decompress/reassembly pipeline in streaming/gelf_relay.py.

This module is infrastructure, not a query operator: correctness is
covered by the loopback test in tests/test_bridge.py.
"""

from __future__ import annotations

import asyncio
import json
import os
import time
import uuid

from kinesyslog_spark.constants import MAX_MESSAGE_BUFFER, MAX_MESSAGE_LENGTH

ROLL_COUNT = 128
ROLL_SECONDS = 1.0
TERMINATORS = b"\n\x00\r"


def _recv_ts() -> str:
    """Microsecond UTC stamp from ONE clock sample — seconds and fraction
    formatted from the same time_ns() read, so a second-boundary rollover
    between two reads can't skew the stamp by ~1 s (GELF receive-time
    fallback + arrival ordering depend on it)."""
    ns = time.time_ns()
    return (
        time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime(ns // 1_000_000_000))
        + f".{(ns // 1000) % 1_000_000:06d}"
    )


class SpoolWriter:
    """Buffers stamped lines and publishes them atomically as JSON files."""

    def __init__(self, out_dir: str, roll_count: int = ROLL_COUNT,
                 roll_seconds: float = ROLL_SECONDS):
        self.out_dir = out_dir
        self.roll_count = roll_count
        self.roll_seconds = roll_seconds
        self._buf: list[dict] = []
        self._last_roll = time.monotonic()
        self._seq = 0
        os.makedirs(out_dir, exist_ok=True)

    def add(self, raw: str, source: str, dest: int) -> None:
        self._buf.append(
            {
                "raw": raw[:MAX_MESSAGE_LENGTH],
                "source": source,
                "dest": dest,
                "recv_ts": _recv_ts(),
                "seq": self._seq,
            }
        )
        self._seq += 1
        if len(self._buf) >= self.roll_count:
            self.flush()

    def add_binary(self, payload: bytes, source: str, dest: int) -> None:
        """GELF mode: binary datagrams (compressed/chunked) ride the JSON
        line as base64 under `raw_b64` (streaming/gelf_relay.py schema)."""
        import base64

        self._buf.append(
            {
                "raw_b64": base64.b64encode(payload).decode("ascii"),
                "source": source,
                "dest": dest,
                "recv_ts": _recv_ts(),
                "seq": self._seq,
            }
        )
        self._seq += 1
        if len(self._buf) >= self.roll_count:
            self.flush()

    def maybe_roll(self) -> None:
        if self._buf and time.monotonic() - self._last_roll >= self.roll_seconds:
            self.flush()

    def flush(self) -> None:
        if not self._buf:
            return
        name = f"lines-{time.time_ns()}-{uuid.uuid4().hex[:8]}.json"
        tmp = os.path.join(self.out_dir, f"_tmp-{name}")
        with open(tmp, "w", encoding="utf-8") as f:
            for row in self._buf:
                f.write(json.dumps(row) + "\n")
        os.rename(tmp, os.path.join(self.out_dir, name))  # atomic publish
        self._buf = []
        self._last_roll = time.monotonic()


class _UdpProtocol(asyncio.DatagramProtocol):
    def __init__(self, writer: SpoolWriter, port: int, gelf: bool = False):
        self.writer, self.port, self.gelf = writer, port, gelf

    def connection_made(self, transport) -> None:  # noqa: D102
        # Stamp `dest` with the ACTUALLY BOUND port, not the requested one
        # (port 0 = ephemeral would stamp dest=0 and corrupt the logGroup
        # key; the reference keys on sockname — protocol.py sockname[1]).
        self.port = transport.get_extra_info("sockname")[1]

    def datagram_received(self, data: bytes, addr) -> None:
        if self.gelf:
            # --gelf (reference init.py): datagrams may be zlib/gzip
            # compressed or chunked BINARY — spool base64, never a lossy
            # text decode.
            if data:
                self.writer.add_binary(data, addr[0], self.port)
            return
        # One datagram = one message (protocol.py:46-48 appends '\n' to
        # reuse the framer; here the framing is already done).
        text = data.decode("utf-8", "backslashreplace").rstrip("\n\x00\r")
        if text:
            self.writer.add(text, addr[0], self.port)


async def _handle_tcp(reader: asyncio.StreamReader,
                      writer_t: asyncio.StreamWriter,
                      spool: SpoolWriter, port: int,
                      proxy_protocol: bool = False,
                      gelf: bool = False) -> None:
    from kinesyslog_spark.operators.framing import _frame_buffer
    from kinesyslog_spark.sources.proxy import NEED_MORE, strip_proxy_header
    from kinesyslog_spark.streaming.framing import _frame_incremental

    peer = writer_t.get_extra_info("peername")[0]
    buf = b""
    awaiting_proxy = proxy_protocol
    protocol_error = False
    # GELF mode: a connection whose stream starts with zlib/gzip magic
    # carries ONE whole-stream compressed document (reference GelfProtocol
    # magic dispatch, protocol.py:224-233); everything else is
    # terminator-framed JSON. Decided once per connection.
    gelf_compressed = False
    try:
        while True:
            data = await reader.read(65536)
            if not data:
                break
            buf += data
            if awaiting_proxy:
                # S4: strip the PROXY header and substitute the real
                # client address before any framing/keying (proxy.py:216-236).
                try:
                    decoded = strip_proxy_header(buf)
                except ValueError:
                    # Malformed PROXY header: close the connection and
                    # drop the buffer — never spool header bytes as a
                    # log message (reference _close_with_error,
                    # proxy.py:225-231).
                    protocol_error = True
                    buf = b""
                    break
                if decoded is NEED_MORE:
                    continue
                real_source, buf = decoded
                if real_source:
                    peer = real_source
                awaiting_proxy = False
            if gelf:
                if gelf_compressed:
                    if len(buf) > MAX_MESSAGE_BUFFER:
                        # Runaway peer (protocol.py:115-126): drop + close.
                        protocol_error = True
                        buf = b""
                        break
                    continue  # accumulate to connection close
                head = buf.lstrip(bytes(TERMINATORS))
                if head[:1] == b"\x78" or head[:2] == b"\x1f\x8b":
                    # Compressed binary contains terminator bytes, so it
                    # must never be line-split (round-2 gap: zlib/gzip TCP
                    # GELF was chopped and unrecoverable downstream).
                    buf = head
                    gelf_compressed = True
                    continue
                if head == b"\x1f":
                    continue  # 1-byte prefix of gzip magic: need more
                # Uncompressed GELF TCP frames are JSON documents,
                # terminator-framed; bytes stay intact for the relay's
                # dispatch.
                while True:
                    idx = min(
                        (buf.find(t) for t in (b"\n", b"\x00", b"\r")
                         if buf.find(t) >= 0),
                        default=-1,
                    )
                    if idx < 0:
                        break
                    line, buf = buf[:idx], buf[idx + 1:]
                    if line:
                        spool.add_binary(line, peer, port)
            else:
                # Per-message framing dispatch (protocol.py:148-165): a
                # leading digit starts an octet-counted frame (RFC6587
                # §3.4.1; RFC5425 §4.3.1 mandates it for TLS syslog),
                # anything else is F1 terminator framing — the same
                # incremental framer as the streaming twin, so a frame
                # straddling read() chunks is held, not split.
                msgs, buf = _frame_incremental(buf)
                for m in msgs:
                    spool.add(m.decode("utf-8", "backslashreplace"), peer, port)
                if len(buf) > MAX_MESSAGE_BUFFER:
                    # Runaway peer (protocol.py:115-126): force-frame and
                    # restart clean, like streaming/framing.py.
                    for m in _frame_buffer(buf):
                        spool.add(m.decode("utf-8", "backslashreplace"),
                                  peer, port)
                    buf = b""
    finally:
        # Connection close flushes the remainder (protocol.py:56-58) —
        # unless a protocol error dropped the buffer above.
        if buf and not protocol_error:
            if gelf:
                spool.add_binary(buf, peer, port)
            else:
                for m in _frame_buffer(buf):
                    spool.add(m.decode("utf-8", "backslashreplace"), peer, port)
        writer_t.close()


def make_ssl_context(certfile: str, keyfile: str):
    """S3: server-side TLS context (reference server.py:46-52 uses
    PROTOCOL_TLS with a cert/key pair; modern equivalent below)."""
    import ssl

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    return ctx


async def run_bridge(out_dir: str, udp_port: int = 0, tcp_port: int = 0,
                     host: str = "127.0.0.1",
                     ready: asyncio.Event | None = None,
                     stop: asyncio.Event | None = None,
                     proxy_protocol: bool = False,
                     tls_port: int | None = None,
                     ssl_context=None,
                     gelf: bool = False) -> tuple[int, int]:
    """Run UDP+TCP(+TLS) listeners until `stop` is set. Ports 0 =
    ephemeral; bound ports are exposed via `run_bridge.bound` after
    `ready` (udp, tcp[, tls])."""
    spool = SpoolWriter(out_dir)
    loop = asyncio.get_running_loop()

    transport, _ = await loop.create_datagram_endpoint(
        lambda: _UdpProtocol(spool, udp_port, gelf), local_addr=(host, udp_port)
    )
    udp_bound = transport.get_extra_info("sockname")[1]

    # Stamp `dest` with the ACTUALLY BOUND port (reference keys on
    # sockname — protocol.py sockname[1]); with the requested port the
    # ephemeral default (0) would make every logGroup 'kinesyslog/.../0'.
    # The closure reads the name assigned right after start_server returns;
    # no connection callback can run before this coroutine next yields.
    server = await asyncio.start_server(
        lambda r, w: _handle_tcp(r, w, spool, tcp_bound, proxy_protocol, gelf),
        host, tcp_port,
    )
    tcp_bound = server.sockets[0].getsockname()[1]

    tls_server = None
    bound = [udp_bound, tcp_bound]
    if ssl_context is not None:
        # S3: TLS termination, then the identical TCP path (the app
        # protocol never sees the difference — server.py:46-52).
        tls_server = await asyncio.start_server(
            lambda r, w: _handle_tcp(r, w, spool, tls_bound, proxy_protocol, gelf),
            host, tls_port or 0, ssl=ssl_context,
        )
        tls_bound = tls_server.sockets[0].getsockname()[1]
        bound.append(tls_bound)

    run_bridge.bound = tuple(bound)  # type: ignore[attr-defined]
    if ready is not None:
        ready.set()
    stop = stop or asyncio.Event()
    try:
        while not stop.is_set():
            await asyncio.sleep(0.1)
            spool.maybe_roll()
    finally:
        spool.flush()
        transport.close()
        server.close()
        await server.wait_closed()
        if tls_server is not None:
            tls_server.close()
            await tls_server.wait_closed()
    return udp_bound, tcp_bound
