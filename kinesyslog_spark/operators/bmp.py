"""Zero-dependency BMP (Windows DIB) codec: every classic BI_RGB bit
depth (1/4/8-bit palette, 16-bit RGB555, 24-bit, 32-bit BGRX), the
two RLE compressions (BI_RLE8/BI_RLE4 with end-of-line, end-of-bitmap,
delta, and absolute-mode escapes), and BI_BITFIELDS at 16/32 bits
(arbitrary contiguous channel masks — RGB565, ARGB1555, BGRA8888,
RGBA1010102, ... — masks read from the V2+/V4 header fields or, for a
plain 40-byte BITMAPINFOHEADER, the three DWORDs that follow it) + a
24-bit encoder for tests.

Same interface contract as operators/png.py: decode returns
(width, height, channels, row-major interleaved pixel bytes), raises
ValueError on malformed input and NotImplementedError for the
remaining corners (core headers) so corpus-scale callers can null the
row and continue. BMP stores rows BOTTOM-UP, BGR order, each row
padded to 4 bytes — the decoder normalizes to top-down RGB; RLE-
skipped pixels read as palette entry 0 (the convention viewers use
for the undefined cells); bitfield channels scale to 0..255 by
max-value ratio (bit replication for the common 5/6-bit cases).

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


def _decode_rle(data: bytes, width: int, height: int,
                bits: int) -> list[bytearray]:
    """BI_RLE8/BI_RLE4 -> index rows in STORED (bottom-up) order.
    Undefined (skipped) cells stay 0."""
    rows = [bytearray(width) for _ in range(height)]
    x = y = 0
    i = 0
    nib = bits == 4
    while i + 2 <= len(data):
        n, v = data[i], data[i + 1]
        i += 2
        if n > 0:  # encoded run
            if y >= height or x + n > width:
                raise ValueError("RLE run outside the bitmap")
            for k in range(n):
                val = ((v >> 4) if k % 2 == 0 else (v & 0x0F)) if nib else v
                rows[y][x + k] = val
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return rows
        elif v == 2:  # delta
            if i + 2 > len(data):
                raise ValueError("truncated RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > width or y > height:
                raise ValueError("RLE delta outside the bitmap")
        else:  # absolute mode: v literal pixels, word-aligned
            cnt = v
            if y >= height or x + cnt > width:
                raise ValueError("RLE absolute run outside the bitmap")
            nbytes = ((cnt + 1) // 2 if nib else cnt)
            nbytes += nbytes % 2  # pad to 16-bit boundary
            if i + nbytes > len(data):
                raise ValueError("truncated RLE absolute run")
            for k in range(cnt):
                if nib:
                    byte = data[i + k // 2]
                    val = (byte >> 4) if k % 2 == 0 else (byte & 0x0F)
                else:
                    val = data[i + k]
                rows[y][x + k] = val
            x += cnt
            i += nbytes
    return rows


def _mask_geometry(mask: int) -> tuple[int, int]:
    """(shift, max_value) of a contiguous channel mask; ValueError on
    zero, >32-bit, or non-contiguous masks (the spec requires
    contiguity and viewers reject the rest)."""
    if mask <= 0 or mask > 0xFFFFFFFF:
        raise ValueError(f"bad bitfield mask {mask:#x}")
    shift = (mask & -mask).bit_length() - 1
    maxv = mask >> shift
    if maxv & (maxv + 1):
        raise ValueError(f"non-contiguous bitfield mask {mask:#x}")
    return shift, maxv


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL BMP pixel decode: (width, height, channels, pixels).

    BI_RGB at 1/4/8 (palette), 16 (RGB555), 24, 32 (BGRX) bits,
    BI_RLE8/BI_RLE4, and BI_BITFIELDS at 16/32 bits with arbitrary
    contiguous masks; top-down (negative height) and bottom-up orders.
    """
    buf = bytes(payload)
    if len(buf) < _FILE_HDR + _INFO_HDR or buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    (off,) = struct.unpack("<I", buf[10:14])
    hdr_size, width, height_raw = struct.unpack("<Iii", buf[14:26])
    if hdr_size < _INFO_HDR:
        raise NotImplementedError(f"BITMAPCOREHEADER size {hdr_size}")
    planes, bits, comp = struct.unpack("<HHI", buf[26:34])
    if comp not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"BMP compression {comp} "
            "(BI_RGB/BI_RLE8/BI_RLE4/BI_BITFIELDS supported)"
        )
    if comp == 1 and bits != 8 or comp == 2 and bits != 4:
        raise ValueError(f"RLE{comp} with {bits}-bit pixels is illegal")
    if bits not in (1, 4, 8, 16, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bits}")
    masks: tuple[tuple[int, int], ...] | None = None
    if comp == 3:
        if bits not in (16, 32):
            raise ValueError(f"BI_BITFIELDS with {bits}-bit pixels is illegal")
        # V2+ headers (>= 52 bytes) carry the masks as header fields at
        # header offset 40; a plain 40-byte BITMAPINFOHEADER is followed
        # by three mask DWORDs instead.
        mstart = _FILE_HDR + (40 if hdr_size >= 52 else hdr_size)
        if mstart + 12 > len(buf):
            raise ValueError("truncated BI_BITFIELDS masks")
        rm, gm, bm = struct.unpack("<III", buf[mstart:mstart + 12])
        geo = tuple(_mask_geometry(m) for m in (rm, gm, bm))
        if bits == 16 and any((m >> 16) for m in (rm, gm, bm)):
            raise ValueError("16-bit bitfield mask wider than the pixel")
        if (rm & gm) or (rm & bm) or (gm & bm):
            raise ValueError("overlapping bitfield masks")
        masks = geo
    if width <= 0 or height_raw == 0 or planes != 1:
        raise ValueError("bad BMP dimensions")
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if top_down and comp != 0:
        raise ValueError("top-down RLE bitmaps are illegal")

    palette: list[tuple[int, int, int]] | None = None
    if bits in (1, 4, 8):
        (n_colors,) = struct.unpack("<I", buf[46:50])
        n_colors = n_colors or (1 << bits)
        pstart = _FILE_HDR + hdr_size
        if pstart + 4 * n_colors > len(buf):
            raise ValueError("truncated BMP palette")
        palette = [
            (buf[pstart + 4 * i + 2], buf[pstart + 4 * i + 1], buf[pstart + 4 * i])
            for i in range(n_colors)
        ]

    out = bytearray(width * height * 3)

    def put_idx(base: int, x: int, idx: int) -> None:
        if idx >= len(palette):  # type: ignore[arg-type]
            raise ValueError("palette index out of range")
        out[base + 3 * x: base + 3 * x + 3] = bytes(palette[idx])

    if comp in (1, 2):  # RLE: stored rows are bottom-up index rows
        rows = _decode_rle(buf[off:], width, height, bits)
        for oy in range(height):
            base = oy * width * 3
            row = rows[height - 1 - oy]
            for x in range(width):
                put_idx(base, x, row[x])
        return width, height, 3, bytes(out)

    stride = ((width * bits + 31) // 32) * 4
    if off + stride * height > len(buf):
        raise ValueError("truncated BMP pixel data")
    for oy in range(height):
        sy = oy if top_down else height - 1 - oy
        row = buf[off + sy * stride: off + sy * stride + stride]
        base = oy * width * 3
        if masks is not None:  # BI_BITFIELDS at 16/32 bits
            wbytes, code = (2, "<H") if bits == 16 else (4, "<I")
            (rs, rmax), (gs, gmax), (bs, bmax) = masks
            for x in range(width):
                (v,) = struct.unpack(code, row[wbytes * x: wbytes * x + wbytes])
                r = ((v >> rs) & rmax) * 255 // rmax
                g = ((v >> gs) & gmax) * 255 // gmax
                b = ((v >> bs) & bmax) * 255 // bmax
                out[base + 3 * x: base + 3 * x + 3] = bytes((r, g, b))
        elif bits == 24:
            for x in range(width):
                b, g, r = row[3 * x: 3 * x + 3]
                out[base + 3 * x: base + 3 * x + 3] = bytes((r, g, b))
        elif bits == 32:
            for x in range(width):
                b, g, r = row[4 * x: 4 * x + 3]
                out[base + 3 * x: base + 3 * x + 3] = bytes((r, g, b))
        elif bits == 16:  # RGB555, scale 5 bits by replication
            for x in range(width):
                (v,) = struct.unpack("<H", row[2 * x: 2 * x + 2])
                r = ((v >> 10) & 31) * 255 // 31
                g = ((v >> 5) & 31) * 255 // 31
                b = (v & 31) * 255 // 31
                out[base + 3 * x: base + 3 * x + 3] = bytes((r, g, b))
        elif bits == 8:
            for x in range(width):
                put_idx(base, x, row[x])
        else:  # 1/4-bit packed palette indices, MSB-first
            per_byte = 8 // bits
            maxv = (1 << bits) - 1
            for x in range(width):
                byte = row[x // per_byte]
                shift = 8 - bits * (x % per_byte + 1)
                put_idx(base, x, (byte >> shift) & maxv)
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
