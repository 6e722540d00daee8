"""Zero-dependency PNG pixel codec + integer perceptual hash.

This closes (for PNG) the multimodal pixel seam documented in
operators/multimodal.py: PNG needs only stdlib `zlib` (inflate) plus
per-scanline unfiltering, so REAL pixel decode is feasible without any
image library. JPEG/GIF pixel decode still requires entropy/LZW codecs
and stays behind the documented `NotImplementedError` seam.

Pieces (all deterministic, all exact integer arithmetic):
- `decode_png`  — signature/chunk walk, zlib inflate, filters 0-4
  (None/Sub/Up/Average/Paeth), color types 0/2/3/4/6 at EVERY legal
  bit depth (1/2/4 unpack MSB-first and scale by replication, 16-bit
  keeps the high byte), and Adam7 interlace (seven independently
  filtered passes scattered into the output grid).
- `encode_png`  — minimal grayscale-8 writer (filter 0 rows). Only
  the DECODED pixels are contract: zlib's compressed bytes may vary
  across zlib builds, so nothing downstream ever hashes the encoded
  stream, only pixels (decode(encode(x)) == x is the pinned property).
- `to_gray`     — integer luma (77*R + 150*G + 29*B) >> 8 (weights
  sum to 256; the JPEG/BT.601 fixed-point convention).
- `box_downscale` — aspect-preserving integer box filter (block mean
  with floor division; block edges at x*w//ow, the standard exact
  partition).
- `phash_blocks` — perceptual hash over a 32x32 grayscale raster:
  fixed-point 2-D DCT-II using the HARDCODED table PHASH_DCT_T
  (floor(cos((2x+1)u*pi/64) * 1024 + 0.5), embedded as literals so no
  platform's libm can perturb a boundary value), keep the top-left 8x8
  coefficient block, threshold each coefficient against the exact
  integer median (33rd smallest of the 63 non-DC values; DC forced 0).
  Scale factors cancel in the comparison, so no descaling/rounding
  step exists anywhere — every intermediate is an int64-safe integer
  (|coeff| <= 255*1024*1024^2*32^2 impossible; actual bound
  255*32*1024 * 32*1024 ~ 2.7e11 < 2^53, and Python ints are exact
  regardless). The hash is returned as 8 row-blocks of 8 bits
  (block j = DCT row u=j, bit v at weight 1<<(7-v)) — exactly the
  hamming-block LSH layout q27 uses for SimHash, so `hamming <= 7`
  pairs are guaranteed to share at least one equal block (pigeonhole).

Reference parity: none (kinesyslog has no media surface); this is the
multimodal north-star path (VERDICT r3 next-round #2).
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Channels per PNG color type at bit depth 8 (3 = palette -> 1 index).
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Fixed-point DCT-II basis: PHASH_DCT_T[u][x] =
# floor(cos((2x+1)*u*pi/64) * 1024 + 0.5), u in 0..7, x in 0..31.
# Hardcoded (not computed at import) so the table is identical on every
# platform and can be embedded verbatim in the DuckDB oracle SQL.
PHASH_DCT_T = (
    (1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024,
     1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024,
     1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024,
     1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024),
    (1023, 1013, 993, 964, 926, 878, 822, 759,
     688, 610, 526, 438, 345, 249, 150, 50,
     -50, -150, -249, -345, -438, -526, -610, -688,
     -759, -822, -878, -926, -964, -993, -1013, -1023),
    (1019, 980, 903, 792, 650, 483, 297, 100,
     -100, -297, -483, -650, -792, -903, -980, -1019,
     -1019, -980, -903, -792, -650, -483, -297, -100,
     100, 297, 483, 650, 792, 903, 980, 1019),
    (1013, 926, 759, 526, 249, -50, -345, -610,
     -822, -964, -1023, -993, -878, -688, -438, -150,
     150, 438, 688, 878, 993, 1023, 964, 822,
     610, 345, 50, -249, -526, -759, -926, -1013),
    (1004, 851, 569, 200, -200, -569, -851, -1004,
     -1004, -851, -569, -200, 200, 569, 851, 1004,
     1004, 851, 569, 200, -200, -569, -851, -1004,
     -1004, -851, -569, -200, 200, 569, 851, 1004),
    (993, 759, 345, -150, -610, -926, -1023, -878,
     -526, -50, 438, 822, 1013, 964, 688, 249,
     -249, -688, -964, -1013, -822, -438, 50, 526,
     878, 1023, 926, 610, 150, -345, -759, -993),
    (980, 650, 100, -483, -903, -1019, -792, -297,
     297, 792, 1019, 903, 483, -100, -650, -980,
     -980, -650, -100, 483, 903, 1019, 792, 297,
     -297, -792, -1019, -903, -483, 100, 650, 980),
    (964, 526, -150, -759, -1023, -822, -249, 438,
     926, 993, 610, -50, -688, -1013, -878, -345,
     345, 878, 1013, 688, 50, -610, -993, -926,
     -438, 249, 822, 1023, 759, 150, -526, -964),
)


# Rows u = 8..15 of the same fixed-point basis, extending the hash to
# a 16x16 DCT block (256-bit pHash — the key-space scale path named in
# SCALING_R8.md). Hardcoded like rows 0..7; derived with a 50-digit
# Decimal Taylor cosine (no libm, so the rounding is platform-free) and
# validated by recomputing rows 0..7, which reproduce PHASH_DCT_T
# exactly (tests/test_png.py pins the consistency).
PHASH_DCT_T16 = PHASH_DCT_T + (
    (946, 392, -392, -946, -946, -392, 392, 946,
     946, 392, -392, -946, -946, -392, 392, 946,
     946, 392, -392, -946, -946, -392, 392, 946,
     946, 392, -392, -946, -946, -392, 392, 946),
    (926, 249, -610, -1023, -688, 150, 878, 964,
     345, -526, -1013, -759, 50, 822, 993, 438,
     -438, -993, -822, -50, 759, 1013, 526, -345,
     -964, -878, -150, 688, 1023, 610, -249, -926),
    (903, 100, -792, -980, -297, 650, 1019, 483,
     -483, -1019, -650, 297, 980, 792, -100, -903,
     -903, -100, 792, 980, 297, -650, -1019, -483,
     483, 1019, 650, -297, -980, -792, 100, 903),
    (878, -50, -926, -822, 150, 964, 759, -249,
     -993, -688, 345, 1013, 610, -438, -1023, -526,
     526, 1023, 438, -610, -1013, -345, 688, 993,
     249, -759, -964, -150, 822, 926, 50, -878),
    (851, -200, -1004, -569, 569, 1004, 200, -851,
     -851, 200, 1004, 569, -569, -1004, -200, 851,
     851, -200, -1004, -569, 569, 1004, 200, -851,
     -851, 200, 1004, 569, -569, -1004, -200, 851),
    (822, -345, -1023, -249, 878, 759, -438, -1013,
     -150, 926, 688, -526, -993, -50, 964, 610,
     -610, -964, 50, 993, 526, -688, -926, 150,
     1013, 438, -759, -878, 249, 1023, 345, -822),
    (792, -483, -980, 100, 1019, 297, -903, -650,
     650, 903, -297, -1019, -100, 980, 483, -792,
     -792, 483, 980, -100, -1019, -297, 903, 650,
     -650, -903, 297, 1019, 100, -980, -483, 792),
    (759, -610, -878, 438, 964, -249, -1013, 50,
     1023, 150, -993, -345, 926, 526, -822, -688,
     688, 822, -526, -926, 345, 993, -150, -1023,
     -50, 1013, 249, -964, -438, 878, 610, -759),
)


def dct_table_sql_values(n_u: int = 8) -> str:
    """The fixed-point DCT table as a SQL VALUES body `(u, x, tv), ...`
    for embedding in DuckDB oracle CTEs — guaranteed identical numbers.
    n_u=8 is the 64-bit pHash block; n_u=16 the 256-bit one."""
    t = PHASH_DCT_T16 if n_u > 8 else PHASH_DCT_T
    return ", ".join(
        f"({u}, {x}, {t[u][x]})"
        for u in range(n_u) for x in range(32)
    )


def phash256_blocks(gray32: bytes) -> list[int]:
    """256-bit perceptual hash of a 32x32 gray raster as 16 16-bit
    blocks — the 16x16-DCT extension of `phash_blocks` (same
    fixed-point basis, median over the 255 non-DC coefficients,
    DC bit forced 0). Pure-Python reference for the vectorized Arrow
    stage, pinned in tests."""
    if len(gray32) != 1024:
        raise ValueError("phash expects a 32x32 gray raster")
    T = PHASH_DCT_T16
    rowdct = [
        [
            sum(gray32[y * 32 + x] * T[u][x] for x in range(32))
            for u in range(16)
        ]
        for y in range(32)
    ]
    coeff = [
        [
            sum(rowdct[y][u] * T[v][y] for y in range(32))
            for v in range(16)
        ]
        for u in range(16)
    ]
    vals = sorted(
        coeff[u][v]
        for u in range(16) for v in range(16) if (u, v) != (0, 0)
    )
    med = vals[127]  # 128th smallest of 255 = quantile_disc(0.5)
    blocks = []
    for u in range(16):
        bl = 0
        for v in range(16):
            if (u, v) != (0, 0) and coeff[u][v] > med:
                bl |= 1 << (15 - v)
        blocks.append(bl)
    return blocks


def encode_png(gray: bytes, width: int, height: int) -> bytes:
    """Minimal grayscale-8 PNG writer (color type 0, filter 0 rows)."""
    if len(gray) != width * height:
        raise ValueError("gray buffer does not match dimensions")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + gray[y * width:(y + 1) * width] for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

# Valid bit depths per color type (PNG spec §11.2.2).
_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
    4: (8, 16), 6: (8, 16),
}


def _defilter(raw: bytes, off: int, height: int, stride: int,
              bpp: int) -> tuple[bytearray, int]:
    """Undo filters 0-4 over `height` scanlines of `stride` bytes each
    (bpp = filter-unit bytes per pixel, >= 1). Returns (raw pixel
    bytes, next offset into `raw`)."""
    need = (stride + 1) * height
    if off + need > len(raw):
        raise ValueError("pixel data length mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        o = off + y * (stride + 1)
        ftype = raw[o]
        line = bytearray(raw[o + 1:o + 1 + stride])
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return out, off + need


def _unpack_samples(rowbytes: bytes, width: int, ch: int, depth: int,
                    scale: bool) -> bytes:
    """One defiltered scanline -> width*ch 8-bit samples. Sub-byte
    depths unpack MSB-first and (for gray) scale by replication
    (v * 255 / (2^d - 1), exact for these depths); 16-bit keeps the
    high byte (the consumers are 8-bit luma)."""
    n = width * ch
    if depth == 8:
        return bytes(rowbytes[:n])
    if depth == 16:
        return bytes(rowbytes[2 * k] for k in range(n))
    out = bytearray(n)
    maxv = (1 << depth) - 1
    per_byte = 8 // depth
    for k in range(n):
        byte = rowbytes[k // per_byte]
        shift = 8 - depth * (k % per_byte + 1)
        v = (byte >> shift) & maxv
        out[k] = v * 255 // maxv if scale else v
    return bytes(out)


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL PNG pixel decode: (width, height, channels, pixels).

    Pixels are row-major interleaved 8-bit channel bytes (palette
    images are expanded to RGB through PLTE; 16-bit samples keep their
    high byte; 1/2/4-bit grayscale scales by replication). All five
    filters, all five color types, every legal bit depth, and Adam7
    interlace (seven independently-filtered passes scattered into the
    output grid) decode for real. Raises ValueError on malformed input
    — callers at corpus scale catch and null the row rather than fail
    the task (see queries/imagehash.py).
    """
    buf = bytes(payload)
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    width = height = None
    bitdepth = colortype = interlace = None
    idat = bytearray()
    plte = b""
    while i + 8 <= len(buf):
        (clen,) = struct.unpack(">I", buf[i:i + 4])
        ctype = buf[i + 4:i + 8]
        data = buf[i + 8:i + 8 + clen]
        if len(data) != clen:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + data + crc
    if width is None:
        raise ValueError("missing IHDR")
    if colortype not in _CHANNELS:
        raise ValueError(f"bad color type {colortype}")
    if bitdepth not in _VALID_DEPTHS[colortype]:
        raise ValueError(f"bit depth {bitdepth} invalid for type {colortype}")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    if width == 0 or height == 0:
        raise ValueError("zero dimensions")
    ch = _CHANNELS[colortype]
    scale = colortype != 3  # palette indices are never scaled
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from e
    bpp = max(1, ch * bitdepth // 8)
    out = bytearray(width * ch * height)
    if interlace == 0:
        stride = (width * ch * bitdepth + 7) // 8
        flat, off = _defilter(raw, 0, height, stride, bpp)
        if off != len(raw):
            raise ValueError("pixel data length mismatch")
        for y in range(height):
            row = _unpack_samples(
                flat[y * stride:(y + 1) * stride], width, ch, bitdepth, scale
            )
            out[y * width * ch:(y + 1) * width * ch] = row
    else:  # Adam7: seven independently filtered sub-images
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            stride = (pw * ch * bitdepth + 7) // 8
            flat, off = _defilter(raw, off, ph, stride, bpp)
            for r in range(ph):
                row = _unpack_samples(
                    flat[r * stride:(r + 1) * stride], pw, ch, bitdepth,
                    scale,
                )
                y = y0 + r * dy
                for c in range(pw):
                    x = x0 + c * dx
                    o = (y * width + x) * ch
                    out[o:o + ch] = row[c * ch:(c + 1) * ch]
        if off != len(raw):
            raise ValueError("pixel data length mismatch")
    if colortype == 3:  # expand palette indices to RGB
        if not plte:
            raise ValueError("palette image without PLTE")
        npal = len(plte) // 3
        rgb = bytearray(width * height * 3)
        for p, idx in enumerate(out):
            if idx >= npal:
                raise ValueError(f"palette index {idx} out of range")
            rgb[p * 3:p * 3 + 3] = plte[idx * 3:idx * 3 + 3]
        return width, height, 3, bytes(rgb)
    return width, height, ch, bytes(out)


def to_gray(pixels: bytes, channels: int) -> bytes:
    """Integer BT.601 luma; alpha ignored; gray passthrough.

    numpy fast path when available (bit-identical int math: the same
    (77R + 150G + 29B) >> 8 per pixel); pure-Python fallback keeps the
    zero-dependency contract."""
    if channels == 1:
        return pixels
    if channels == 2:  # gray + alpha
        return pixels[::2]
    try:
        import numpy as np

        a = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, channels)
        a = a.astype(np.int32)
        luma = (77 * a[:, 0] + 150 * a[:, 1] + 29 * a[:, 2]) >> 8
        return luma.astype(np.uint8).tobytes()
    except ImportError:
        pass
    out = bytearray(len(pixels) // channels)
    for p in range(len(out)):
        o = p * channels
        out[p] = (
            77 * pixels[o] + 150 * pixels[o + 1] + 29 * pixels[o + 2]
        ) >> 8
    return bytes(out)


def box_downscale(gray: bytes, w: int, h: int, ow: int, oh: int) -> bytes:
    """Exact integer box filter: output cell (oy, ox) is the floor-mean
    of the input block [oy*h//oh, (oy+1)*h//oh) x [ox*w//ow, ...)."""
    out = bytearray(ow * oh)
    for oy in range(oh):
        y0, y1 = oy * h // oh, (oy + 1) * h // oh
        y1 = max(y1, y0 + 1)
        for ox in range(ow):
            x0, x1 = ox * w // ow, (ox + 1) * w // ow
            x1 = max(x1, x0 + 1)
            s = 0
            for y in range(y0, y1):
                row = y * w
                for x in range(x0, x1):
                    s += gray[row + x]
            out[oy * ow + ox] = s // ((y1 - y0) * (x1 - x0))
    return bytes(out)


def thumbnail_dims(w: int, h: int, box: int = 64) -> tuple[int, int]:
    """Aspect-preserving fit inside box x box (never upscales)."""
    if w <= box and h <= box:
        return w, h
    m = max(w, h)
    return max(1, w * box // m), max(1, h * box // m)


def phash_blocks(gray32: bytes) -> list[int]:
    """Perceptual hash of a 32x32 grayscale raster as 8 8-bit blocks.

    Pure-integer DCT-II (see module docstring); block j packs DCT row
    u=j with bit v at weight 1 << (7-v); the DC bit (u=v=0) is 0 and DC
    is excluded from the median.
    """
    if len(gray32) != 1024:
        raise ValueError("phash expects a 32x32 gray raster")
    T = PHASH_DCT_T
    # rowdct[y][u] = sum_x g[y][x] * T[u][x]
    rowdct = [
        [
            sum(gray32[y * 32 + x] * T[u][x] for x in range(32))
            for u in range(8)
        ]
        for y in range(32)
    ]
    # coeff[u][v] = sum_y rowdct[y][u] * T[v][y]
    coeff = [
        [
            sum(rowdct[y][u] * T[v][y] for y in range(32))
            for v in range(8)
        ]
        for u in range(8)
    ]
    vals = sorted(
        coeff[u][v] for u in range(8) for v in range(8) if (u, v) != (0, 0)
    )
    med = vals[31]  # 32nd smallest of 63 = quantile_disc(0.5)
    blocks = []
    for u in range(8):
        bl = 0
        for v in range(8):
            if (u, v) != (0, 0) and coeff[u][v] > med:
                bl |= 1 << (7 - v)
        blocks.append(bl)
    return blocks
