"""Zero-dependency GIF pixel decode (LZW + palette + deinterlace).

Completes the image-pixel seam next to operators/png.py: GIF's only
"codec" is the LZW variant from the 89a spec — variable code width
(min+1 .. 12 bits, LSB-first packing), CLEAR/END codes, the KwKwK
special case — all implementable with stdlib ints. With PNG and GIF
real, JPEG (Huffman entropy coding + dequant + IDCT upsampling) is the
one image container still behind the documented NotImplementedError
seam.

`decode_gif` returns the FIRST image frame as RGB bytes (the
thumbnail/pHash path). Interlaced images are deinterlaced per the
spec's four-pass row order. Transparency is ignored there (the
transparent index renders as its palette color) — the single-image
consumers (luma, downscale, pHash) have no alpha concept.

`decode_gif_frames` is the ANIMATION path: every frame composed onto
the logical screen with full Graphic Control Extension semantics —
transparent-index skip during drawing, disposal methods 0/1 (leave),
2 (restore the frame rect to the background color), 3 (restore the
canvas to its pre-frame state) — and per-frame local palettes. The
composed RGB frames feed the same downstream as AVI video (scene cuts,
frame sampling); there is no alpha channel, so "restore to background"
paints the GCT background color (black without a GCT), the one
deterministic choice available to an RGB-only consumer.

Pinned in tests/test_gif.py against an independent spec-faithful LZW
COMPRESSOR (dictionary-based, exercising width growth, KwKwK, and
dictionary-full deferred-clear paths) plus hand-built bitstreams;
animation composition is pinned frame-by-frame against hand-composed
expectations for each disposal method.
"""

from __future__ import annotations

import struct

_MAX_CODE_WIDTH = 12


def _color_table(buf: bytes, i: int, flags: int) -> tuple[bytes, int]:
    """(table bytes, next offset) if the flags' bit 7 says one exists."""
    if not flags & 0x80:
        return b"", i
    size = 2 << (flags & 0x07)  # 2^(n+1) RGB entries
    return buf[i:i + 3 * size], i + 3 * size


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # dictionary: code -> byte string; rebuilt on CLEAR
    base = {c: bytes([c]) for c in range(clear)}
    table = dict(base)
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = dict(base)
                next_code = end + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise ValueError("LZW: first code not a literal")
            elif code in table:
                entry = table[code]
            elif code == next_code:      # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError(f"LZW: code {code} out of sequence")
            out += entry
            if len(out) >= max_pixels:
                return bytes(out[:max_pixels])
            if prev is not None and next_code < (1 << _MAX_CODE_WIDTH):
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                    width += 1
            prev = entry
    return bytes(out)


def _deinterlace(idx: bytes, w: int, h: int) -> bytes:
    rows = [idx[r * w:(r + 1) * w] for r in range(h)]
    out: list[bytes | None] = [None] * h
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for r in range(start, h, step):
            out[r] = rows[src]
            src += 1
    return b"".join(out)  # type: ignore[arg-type]


def decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL GIF pixel decode: (width, height, 3, rgb_bytes) of the
    first frame. Raises ValueError on malformed input."""
    buf = bytes(payload)
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(buf) < 13:
        raise ValueError("truncated header")
    _sw, _sh, flags, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    gct, i = _color_table(buf, 13, flags)
    while i < len(buf):
        b = buf[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(buf) and buf[i] != 0:
                i += 1 + buf[i]
            i += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02x}")
        if i + 10 > len(buf):
            raise ValueError("truncated image descriptor")
        _left, _top, w, h, iflags = struct.unpack("<HHHHB", buf[i + 1:i + 10])
        i += 10
        lct, i = _color_table(buf, i, iflags)
        palette = lct or gct
        if not palette:
            raise ValueError("no color table")
        if i >= len(buf):
            raise ValueError("missing LZW data")
        min_code_size = buf[i]
        i += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad LZW min code size {min_code_size}")
        data = bytearray()
        while i < len(buf) and buf[i] != 0:
            n = buf[i]
            data += buf[i + 1:i + 1 + n]
            i += 1 + n
        idx = _lzw_decode(min_code_size, bytes(data), w * h)
        if len(idx) < w * h:
            raise ValueError("LZW stream shorter than frame")
        if iflags & 0x40:
            idx = _deinterlace(idx, w, h)
        rgb = bytearray(w * h * 3)
        npal = len(palette) // 3
        for p, ci in enumerate(idx):
            if ci >= npal:
                raise ValueError(f"palette index {ci} out of range")
            rgb[p * 3:p * 3 + 3] = palette[ci * 3:ci * 3 + 3]
        return w, h, 3, bytes(rgb)
    raise ValueError("no image frame")


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> tuple[int, int, int, list[bytes]]:
    """REAL animated-GIF decode: (screen_w, screen_h, 3, composed RGB
    frames). Each returned frame is the full logical screen AFTER the
    corresponding image was drawn (what a viewer shows at that step).
    Raises ValueError on malformed input."""
    buf = bytes(payload)
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(buf) < 13:
        raise ValueError("truncated header")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    gct, i = _color_table(buf, 13, flags)
    if sw == 0 or sh == 0:
        raise ValueError("zero logical screen")
    bg_rgb = (
        gct[bg * 3:bg * 3 + 3] if gct and bg < len(gct) // 3
        else b"\x00\x00\x00"
    )
    canvas = bytearray(bg_rgb * (sw * sh))
    frames: list[bytes] = []
    # pending Graphic Control Extension state (applies to the NEXT image)
    disposal = 0
    tindex = -1
    while i < len(buf):
        b = buf[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if i + 2 > len(buf):
                raise ValueError("truncated extension")
            label = buf[i + 1]
            j = i + 2
            if label == 0xF9 and j < len(buf) and buf[j] == 4:
                if j + 5 > len(buf):
                    raise ValueError("truncated graphic control extension")
                packed = buf[j + 1]
                disposal = (packed >> 2) & 0x07
                tindex = buf[j + 4] if packed & 0x01 else -1
            while j < len(buf) and buf[j] != 0:
                j += 1 + buf[j]
            i = j + 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02x}")
        if i + 10 > len(buf):
            raise ValueError("truncated image descriptor")
        left, top, w, h, iflags = struct.unpack("<HHHHB", buf[i + 1:i + 10])
        i += 10
        if left + w > sw or top + h > sh or w == 0 or h == 0:
            raise ValueError("frame rect outside the logical screen")
        lct, i = _color_table(buf, i, iflags)
        palette = lct or gct
        if not palette:
            raise ValueError("no color table")
        if i >= len(buf):
            raise ValueError("missing LZW data")
        min_code_size = buf[i]
        i += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad LZW min code size {min_code_size}")
        data = bytearray()
        while i < len(buf) and buf[i] != 0:
            n = buf[i]
            data += buf[i + 1:i + 1 + n]
            i += 1 + n
        i += 1  # the sub-block terminator
        idx = _lzw_decode(min_code_size, bytes(data), w * h)
        if len(idx) < w * h:
            raise ValueError("LZW stream shorter than frame")
        if iflags & 0x40:
            idx = _deinterlace(idx, w, h)
        saved = bytes(canvas) if disposal == 3 else None
        npal = len(palette) // 3
        for r in range(h):
            row = idx[r * w:(r + 1) * w]
            base = ((top + r) * sw + left) * 3
            for c, ci in enumerate(row):
                if ci == tindex:
                    continue
                if ci >= npal:
                    raise ValueError(f"palette index {ci} out of range")
                o = base + c * 3
                canvas[o:o + 3] = palette[ci * 3:ci * 3 + 3]
        frames.append(bytes(canvas))
        if max_frames is not None and len(frames) >= max_frames:
            return sw, sh, 3, frames
        if disposal == 2:  # restore the frame rect to background
            for r in range(h):
                base = ((top + r) * sw + left) * 3
                canvas[base:base + w * 3] = bg_rgb * w
        elif disposal == 3 and saved is not None:
            canvas = bytearray(saved)
        disposal = 0
        tindex = -1
    if not frames:
        raise ValueError("no image frame")
    return sw, sh, 3, frames
