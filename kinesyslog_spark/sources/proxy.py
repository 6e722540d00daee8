r"""PROXY protocol v1/v2 decoding (reference S4, proxy.py:131-236).

Load balancers (ELB/HAProxy) prepend a PROXY header carrying the real
client address to each TCP connection. Decoding it is pure byte parsing
at connection start; semantically it rewrites the `source` column before
the (source, dest) grouping key is formed.

`strip_proxy_header(buf)` consumes a complete v1 or v2 header from the
head of `buf` and returns (real_source_ip or None, payload_rest). The
reference's v2 `&` vs `*` constant typo (proxy.py:149) is not ported —
the signature is matched per the spec.
"""

from __future__ import annotations

import socket
import struct

V1_MAGIC = b"PROXY "
V2_MAGIC = b"\r\n\r\n\x00\r\nQUIT\n"

NEED_MORE = object()  # incomplete header: caller should read more bytes


def strip_proxy_header(buf: bytes):
    """Returns (source_ip | None, rest) or NEED_MORE.

    source_ip is None when no PROXY header is present (plain connection)
    or for v2 LOCAL/UNSPEC commands (health checks keep the socket peer).
    """
    if buf.startswith(V2_MAGIC):
        return _strip_v2(buf)
    if buf.startswith(V1_MAGIC):
        return _strip_v1(buf)
    # A prefix of either magic could still arrive: wait for more bytes.
    if V2_MAGIC.startswith(buf[:12]) or V1_MAGIC.startswith(buf[:6]):
        if len(buf) < 12:
            return NEED_MORE
    return None, buf


def _strip_v1(buf: bytes):
    """v1: 'PROXY TCP4 <src> <dst> <sport> <dport>\r\n' (proxy.py:131-140)."""
    end = buf.find(b"\r\n")
    if end < 0:
        if len(buf) > 107:  # spec: v1 line is at most 107 bytes
            raise ValueError("PROXY v1 header too long")
        return NEED_MORE
    parts = buf[:end].decode("ascii", "replace").split(" ")
    rest = buf[end + 2:]
    if len(parts) >= 6 and parts[1] in ("TCP4", "TCP6"):
        return parts[2], rest
    if len(parts) >= 2 and parts[1] == "UNKNOWN":
        return None, rest
    raise ValueError(f"malformed PROXY v1 header: {parts[:2]}")


def _strip_v2(buf: bytes):
    """v2: magic + ver/cmd + family/proto + u16 len + addresses
    (proxy.py:142-183, constants proxy spec §2.2)."""
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
        return None, rest
    if family == 1 and length >= 12:  # AF_INET: src4 dst4 sport dport
        src = socket.inet_ntop(socket.AF_INET, body[0:4])
        return src, rest
    if family == 2 and length >= 36:  # AF_INET6
        src = socket.inet_ntop(socket.AF_INET6, body[0:16])
        return src, rest
    return None, rest  # AF_UNSPEC / AF_UNIX: no usable address
