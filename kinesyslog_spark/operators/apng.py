"""Zero-dependency APNG (animated PNG) frame decode.

Closes the animation seam next to operators/gif.py's GIF path: APNG
keeps PNG's exact pixel pipeline (the same zlib + filter decode in
operators/png.py) and adds three chunk types — `acTL` (animation
control), `fcTL` (per-frame control: region, delay, dispose, blend),
`fdAT` (frame data = an IDAT stream with a 4-byte sequence prefix).
Each frame is therefore reconstructed as a STANDALONE single-frame PNG
(signature + region-sized IHDR + PLTE + IDAT + IEND, with real CRCs)
and decoded through `decode_png` — one pixel pipeline, no second
decoder to diverge.

Composition follows the spec on an RGBA canvas (initially fully
transparent): blend_op SOURCE replaces the region including alpha,
blend_op OVER does integer Porter-Duff source-over compositing;
dispose_op NONE/BACKGROUND/PREVIOUS mirror GIF's semantics (a first
frame declaring PREVIOUS is treated as BACKGROUND, per spec). Returned
frames are the RGB planes of the canvas after each frame draws —
the downstream consumers (luma, scene cuts, pHash) have no alpha
concept, so fully-transparent pixels read as black.

Pinned in tests/test_apng.py against an independent in-test APNG
writer, with hand-composed expectations per dispose/blend mode (the
test strategy of tests/test_gif.py).
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _to_rgba(w: int, h: int, ch: int, px: bytes) -> bytes:
    if ch == 4:
        return px
    out = bytearray(w * h * 4)
    if ch == 1:
        for p in range(w * h):
            g = px[p]
            out[p * 4:p * 4 + 4] = bytes((g, g, g, 255))
    elif ch == 2:
        for p in range(w * h):
            g, a = px[p * 2], px[p * 2 + 1]
            out[p * 4:p * 4 + 4] = bytes((g, g, g, a))
    elif ch == 3:
        for p in range(w * h):
            out[p * 4:p * 4 + 3] = px[p * 3:p * 3 + 3]
            out[p * 4 + 3] = 255
    else:
        raise ValueError(f"bad channel count {ch}")
    return bytes(out)


def _over(canvas: bytearray, o: int, sr: int, sg: int, sb: int, sa: int) -> None:
    """Integer Porter-Duff source-over at canvas offset o (RGBA)."""
    if sa == 255:
        canvas[o:o + 4] = bytes((sr, sg, sb, 255))
        return
    if sa == 0:
        return
    dr, dg, db, da = canvas[o], canvas[o + 1], canvas[o + 2], canvas[o + 3]
    oa255 = sa * 255 + da * (255 - sa)  # out alpha scaled by 255
    if oa255 == 0:
        canvas[o:o + 4] = b"\x00\x00\x00\x00"
        return
    canvas[o] = (sr * sa * 255 + dr * da * (255 - sa)) // oa255
    canvas[o + 1] = (sg * sa * 255 + dg * da * (255 - sa)) // oa255
    canvas[o + 2] = (sb * sa * 255 + db * da * (255 - sa)) // oa255
    canvas[o + 3] = (oa255 + 127) // 255


def decode_apng_frames(
    payload: bytes, max_frames: int | None = None
) -> tuple[int, int, int, list[bytes]]:
    """REAL APNG decode: (width, height, 3, composed RGB frames).
    Raises ValueError on malformed input or a PNG with no acTL."""
    from kinesyslog_spark.operators.png import decode_png

    buf = bytes(payload)
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    ihdr = None
    plte = b""
    actl_frames = None
    # collected animation stream: list of (fctl fields, bytearray data)
    frames_raw: list[tuple[tuple, bytearray]] = []
    seqs: list[int] = []
    default_idat = bytearray()
    fctl_before_idat = False
    while i + 8 <= len(buf):
        (clen,) = struct.unpack(">I", buf[i:i + 4])
        ctype = buf[i + 4:i + 8]
        data = buf[i + 8:i + 8 + clen]
        if len(data) != clen:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"acTL":
            if len(data) != 8:
                raise ValueError("bad acTL")
            (actl_frames, _plays) = struct.unpack(">II", data)
        elif ctype == b"fcTL":
            if len(data) != 26:
                raise ValueError("bad fcTL")
            f = struct.unpack(">IIIIIHHBB", data)
            seqs.append(f[0])
            frames_raw.append((f[1:], bytearray()))
            if not default_idat:
                fctl_before_idat = True
        elif ctype == b"IDAT":
            default_idat += data
            if fctl_before_idat and frames_raw:
                frames_raw[0][1].extend(data)
        elif ctype == b"fdAT":
            if len(data) < 4 or not frames_raw:
                raise ValueError("bad fdAT")
            seqs.append(struct.unpack(">I", data[:4])[0])
            frames_raw[-1][1].extend(data[4:])
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if ihdr is None:
        raise ValueError("missing IHDR")
    if actl_frames is None:
        raise ValueError("PNG without acTL (not animated)")
    if not frames_raw or seqs != list(range(len(seqs))):
        raise ValueError("fcTL/fdAT sequence numbers not consecutive")
    if len(frames_raw) != actl_frames:
        raise ValueError("acTL num_frames mismatch")
    sw, sh = struct.unpack(">II", ihdr[:8])
    if sw == 0 or sh == 0:
        raise ValueError("zero canvas")
    canvas = bytearray(sw * sh * 4)
    out: list[bytes] = []
    for k, (fields, data) in enumerate(frames_raw):
        fw, fh, fx, fy, _dn, _dd, dispose, blend = fields
        if fw == 0 or fh == 0 or fx + fw > sw or fy + fh > sh:
            raise ValueError("frame rect outside the canvas")
        if not data:
            raise ValueError("frame without data")
        mini = (
            _PNG_SIG
            + _chunk(b"IHDR", struct.pack(">II", fw, fh) + ihdr[8:])
            + (_chunk(b"PLTE", plte) if plte else b"")
            + _chunk(b"IDAT", bytes(data))
            + _chunk(b"IEND", b"")
        )
        w, h, ch, px = decode_png(mini)
        if (w, h) != (fw, fh):
            raise ValueError("frame dims mismatch")
        rgba = _to_rgba(fw, fh, ch, px)
        if k == 0 and dispose == 2:  # spec: first-frame PREVIOUS -> BG
            dispose = 1
        saved = bytes(canvas) if dispose == 2 else None
        for r in range(fh):
            base = ((fy + r) * sw + fx) * 4
            src = r * fw * 4
            if blend == 0:  # SOURCE: replace incl. alpha
                canvas[base:base + fw * 4] = rgba[src:src + fw * 4]
            else:  # OVER
                for c in range(fw):
                    s = src + c * 4
                    _over(
                        canvas, base + c * 4,
                        rgba[s], rgba[s + 1], rgba[s + 2], rgba[s + 3],
                    )
        out.append(
            bytes(
                b for p in range(sw * sh)
                for b in canvas[p * 4:p * 4 + 3]
            )
        )
        if max_frames is not None and len(out) >= max_frames:
            return sw, sh, 3, out
        if dispose == 1:  # BACKGROUND: clear region to transparent
            for r in range(fh):
                base = ((fy + r) * sw + fx) * 4
                canvas[base:base + fw * 4] = b"\x00" * (fw * 4)
        elif dispose == 2 and saved is not None:
            canvas = bytearray(saved)
    return sw, sh, 3, out
