"""Zero-dependency BMP (Windows DIB) codec: uncompressed 24-bit and
8-bit-palette decode + a 24-bit encoder for tests.

Same interface contract as operators/png.py: decode returns
(width, height, channels, row-major interleaved pixel bytes), raises
ValueError on malformed input and NotImplementedError for unsupported
corners (compression, other bit depths) so corpus-scale callers can
null the row and continue. BMP stores rows BOTTOM-UP, BGR order, each
row padded to 4 bytes — the decoder normalizes to top-down RGB.

Reference parity: none (the reference relay has no media surface);
this narrows the multimodal codec seam (operators/multimodal.py)
alongside png.py / gif.py / jpeg.py.
"""

from __future__ import annotations

import struct

_FILE_HDR = 14
_INFO_HDR = 40


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal BI_RGB 24-bit writer (top-down input rows; stored
    bottom-up per the format)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != w*h*3")
    pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = rgb[base + 3 * x: base + 3 * x + 3]
            row += bytes((b, g, r))
        row += b"\x00" * pad
        rows.append(bytes(row))
    body = b"".join(rows)
    off = _FILE_HDR + _INFO_HDR
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", _INFO_HDR, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return hdr + info + body


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL BMP pixel decode: (width, height, channels, pixels).

    Supports BI_RGB 24-bit and 8-bit palette (expanded to RGB);
    top-down (negative height) and bottom-up row orders."""
    buf = bytes(payload)
    if len(buf) < _FILE_HDR + _INFO_HDR or buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    (off,) = struct.unpack("<I", buf[10:14])
    hdr_size, width, height_raw = struct.unpack("<Iii", buf[14:26])
    if hdr_size < _INFO_HDR:
        raise NotImplementedError(f"BITMAPCOREHEADER size {hdr_size}")
    planes, bits, comp = struct.unpack("<HHI", buf[26:34])
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} (only BI_RGB)")
    if bits not in (8, 24):
        raise NotImplementedError(f"BMP bit depth {bits} (only 8/24)")
    if width <= 0 or height_raw == 0 or planes != 1:
        raise ValueError("bad BMP dimensions")
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw

    palette: list[tuple[int, int, int]] | None = None
    if bits == 8:
        (n_colors,) = struct.unpack("<I", buf[46:50])
        n_colors = n_colors or 256
        pstart = _FILE_HDR + hdr_size
        if pstart + 4 * n_colors > len(buf):
            raise ValueError("truncated BMP palette")
        palette = [
            (buf[pstart + 4 * i + 2], buf[pstart + 4 * i + 1], buf[pstart + 4 * i])
            for i in range(n_colors)
        ]

    bpp = bits // 8
    stride = (width * bpp + 3) & ~3
    if off + stride * height > len(buf):
        raise ValueError("truncated BMP pixel data")
    out = bytearray(width * height * 3)
    for oy in range(height):
        sy = oy if top_down else height - 1 - oy
        row = buf[off + sy * stride: off + sy * stride + width * bpp]
        base = oy * width * 3
        if bits == 24:
            for x in range(width):
                b, g, r = row[3 * x: 3 * x + 3]
                out[base + 3 * x: base + 3 * x + 3] = bytes((r, g, b))
        else:
            for x in range(width):
                idx = row[x]
                if idx >= len(palette):  # type: ignore[arg-type]
                    raise ValueError("palette index out of range")
                out[base + 3 * x: base + 3 * x + 3] = bytes(palette[idx])
    return width, height, 3, bytes(out)


def parse_bmp_header(payload: bytes) -> dict | None:
    """(width, height, codec) from the info header, no pixel work."""
    buf = bytes(payload)
    if len(buf) < _FILE_HDR + 26 or buf[:2] != b"BM":
        return None
    _hdr_size, width, height_raw = struct.unpack("<Iii", buf[14:26])
    if width <= 0 or height_raw == 0:
        return None
    return {"codec": "bmp", "width": width, "height": abs(height_raw)}
