r"""PROXY protocol v1/v2 decoding (reference S4, proxy.py:131-236).

Load balancers (ELB/HAProxy) prepend a PROXY header carrying the real
client address to each TCP connection. Decoding it is pure byte parsing
at connection start; semantically it rewrites the `source` column before
the (source, dest) grouping key is formed.

`strip_proxy_header(buf)` consumes a complete v1 or v2 header from the
head of `buf` and returns (real_source_ip or None, payload_rest).
`parse_proxy_header(buf)` is the full-fidelity variant that also returns
the v2 TLV vectors (reference proxy.py:185-199 stores them as connection
metadata) — type names per the PP2 registry (constant.py:35-42).

The reference's v2 `&` vs `*` constant typo (proxy.py:149) is not ported —
the signature is matched per the spec.
"""

from __future__ import annotations

import socket
import struct
from typing import NamedTuple

V1_MAGIC = b"PROXY "
V2_MAGIC = b"\r\n\r\n\x00\r\nQUIT\n"

NEED_MORE = object()  # incomplete header: caller should read more bytes

# PP2 TLV type registry (PROXY protocol spec §2.2.7; reference
# constant.py:35-42 — NOOP is intentionally never surfaced, matching
# proxy.py:192).
TLV_TYPES = {
    0x01: "PP2_TYPE_ALPN",
    0x02: "PP2_TYPE_AUTHORITY",
    0x03: "PP2_TYPE_CRC32C",
    0x04: "PP2_TYPE_NOOP",
    0x20: "PP2_TYPE_SSL",
    0x26: "PP2_TYPE_NETNS",
    0xEA: "PP2_TYPE_AWS",
}


class ProxyInfo(NamedTuple):
    """Decoded PROXY header: real client address + v2 TLV metadata."""

    source: str | None
    tlvs: dict[str, bytes]


def parse_proxy_header(buf: bytes):
    """Returns (ProxyInfo | None, rest) or NEED_MORE.

    ProxyInfo.source is None for v2 LOCAL/UNSPEC commands (health checks
    keep the socket peer); the whole ProxyInfo is None when no PROXY
    header is present (plain connection). v1 has no TLVs (empty dict).
    """
    if buf.startswith(V2_MAGIC):
        return _parse_v2(buf)
    if buf.startswith(V1_MAGIC):
        return _parse_v1(buf)
    # A prefix of either magic could still arrive: wait for more bytes.
    if V2_MAGIC.startswith(buf[:12]) or V1_MAGIC.startswith(buf[:6]):
        if len(buf) < 12:
            return NEED_MORE
    return None, buf


def strip_proxy_header(buf: bytes):
    """Back-compat address-only view: (source_ip | None, rest) or NEED_MORE."""
    parsed = parse_proxy_header(buf)
    if parsed is NEED_MORE:
        return NEED_MORE
    info, rest = parsed
    return (info.source if info is not None else None), rest


def _parse_v1(buf: bytes):
    """v1: 'PROXY TCP4 <src> <dst> <sport> <dport>\r\n' (proxy.py:131-140)."""
    end = buf.find(b"\r\n")
    if end < 0:
        if len(buf) > 107:  # spec: v1 line is at most 107 bytes
            raise ValueError("PROXY v1 header too long")
        return NEED_MORE
    parts = buf[:end].decode("ascii", "replace").split(" ")
    rest = buf[end + 2:]
    if len(parts) >= 6 and parts[1] in ("TCP4", "TCP6"):
        return ProxyInfo(parts[2], {}), rest
    if len(parts) >= 2 and parts[1] == "UNKNOWN":
        return ProxyInfo(None, {}), rest
    raise ValueError(f"malformed PROXY v1 header: {parts[:2]}")


def _parse_tlvs(body: bytes, start: int) -> dict[str, bytes]:
    """TLV vectors after the address block (proxy.py:185-199): 1-byte
    type, 2-byte big-endian length, value. Unknown types are skipped
    (reference logs a warning); NOOP padding is never surfaced; a
    truncated vector is malformed."""
    tlvs: dict[str, bytes] = {}
    pos = start
    while pos < len(body):
        if pos + 3 > len(body):
            raise ValueError("PROXY v2 truncated TLV header")
        tlv_type = body[pos]
        (tlv_len,) = struct.unpack("!H", body[pos + 1:pos + 3])
        if pos + 3 + tlv_len > len(body):
            raise ValueError("PROXY v2 truncated TLV value")
        name = TLV_TYPES.get(tlv_type)
        if name is not None and name != "PP2_TYPE_NOOP":
            tlvs[name] = body[pos + 3:pos + 3 + tlv_len]
        pos += 3 + tlv_len
    return tlvs


def _parse_v2(buf: bytes):
    """v2: magic + ver/cmd + family/proto + u16 len + addresses + TLVs
    (proxy.py:142-199, proxy spec §2.2)."""
    if len(buf) < 16:
        return NEED_MORE
    ver_cmd, fam_proto, length = struct.unpack("!BBH", buf[12:16])
    if ver_cmd >> 4 != 2:
        raise ValueError(f"unsupported PROXY v2 version {ver_cmd >> 4}")
    if len(buf) < 16 + length:
        return NEED_MORE
    body, rest = buf[16:16 + length], buf[16 + length:]
    cmd = ver_cmd & 0x0F
    family = fam_proto >> 4
    if cmd == 0:  # LOCAL (health check): keep socket peer address
        return ProxyInfo(None, {}), rest
    if family == 1 and length >= 12:  # AF_INET: src4 dst4 sport dport
        src = socket.inet_ntop(socket.AF_INET, body[0:4])
        return ProxyInfo(src, _parse_tlvs(body, 12)), rest
    if family == 2 and length >= 36:  # AF_INET6
        src = socket.inet_ntop(socket.AF_INET6, body[0:16])
        return ProxyInfo(src, _parse_tlvs(body, 36)), rest
    if family == 3 and length >= 216:  # AF_UNIX: 108-byte src + dst paths
        return ProxyInfo(None, _parse_tlvs(body, 216)), rest
    return ProxyInfo(None, {}), rest  # AF_UNSPEC: no usable address
