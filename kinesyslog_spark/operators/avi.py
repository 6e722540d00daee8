"""Zero-dependency AVI (RIFF) container walk + MJPEG frame extraction.

Narrows the video seam the way operators/wav.py did for audio: an AVI
file is a RIFF tree (the WAV chunk grammar with nested LISTs), and an
MJPEG AVI's video chunks are whole baseline JPEGs — so REAL video frame
extraction and pixel decode need nothing beyond the chunk walk here and
operators/jpeg.py. Compressed inter-frame codecs (H.264/VP9/AV1) remain
behind the documented NotImplementedError seam; MJPEG is the classic
intra-only format (every frame standalone), which is exactly why it's
the one a zero-dep engine can support.

`parse_avi` returns the header facts (dims, frame count,
microseconds/frame, fourcc, bpp) plus the raw video-frame payloads in
stream order; `extract_frames` samples k evenly spaced frames and
decodes them to pixels via decode_jpeg (MJPEG) or `decode_dib`
(uncompressed 'DIB ' streams — bottom-up padded BGR rows, the second
intra-only format a zero-dep engine fully supports). `encode_dib_avi`
is the synthesis twin; `scene_cut_l1` computes the per-transition
luma-histogram L1 signal shot-boundary detection thresholds (q141).

Pinned in tests/test_avi.py against AVI bytes assembled independently
in the test (RIFF writer + the test-side JPEG encoder).
"""

from __future__ import annotations

import struct


def _walk(buf: bytes, start: int, end: int, out: dict) -> None:
    """Iterate chunks in [start, end); recurse into LISTs."""
    i = start
    while i + 8 <= end:
        cid = buf[i:i + 4]
        (clen,) = struct.unpack("<I", buf[i + 4:i + 8])
        body_start = i + 8
        body_end = min(body_start + clen, end)
        if cid in (b"LIST", b"RIFF"):
            _walk(buf, body_start + 4, body_end, out)  # skip list type
        elif cid == b"avih" and clen >= 40:
            us_per_frame, _maxrate, _pad, _flags, total = struct.unpack(
                "<IIIII", buf[body_start:body_start + 20]
            )
            w, h = struct.unpack(
                "<II", buf[body_start + 32:body_start + 40]
            )
            out["avih"] = {
                "us_per_frame": us_per_frame, "total_frames": total,
                "width": w, "height": h,
            }
        elif cid == b"strh" and clen >= 8:
            out["_last_strh"] = bytes(buf[body_start:body_start + 4])
            if out["_last_strh"] == b"vids":
                out["fourcc"] = buf[body_start + 4:body_start + 8].decode(
                    "latin-1"
                ).strip("\x00 ")
        elif (
            cid == b"strf"
            and clen >= 16
            and out.get("_last_strh") == b"vids"
        ):
            # BITMAPINFOHEADER of the video stream: biBitCount at +14.
            (out["bpp"],) = struct.unpack(
                "<H", buf[body_start + 14:body_start + 16]
            )
        elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
            out.setdefault("frames", []).append(
                bytes(buf[body_start:body_end])
            )
        i = body_start + clen + (clen & 1)  # word-aligned


def parse_avi(payload: bytes) -> dict:
    """Header facts + raw frame payloads of a RIFF/AVI container."""
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    out: dict = {}
    _walk(buf, 12, len(buf), out)
    if "avih" not in out:
        raise ValueError("missing avih header")
    hdr = out["avih"]
    frames = out.get("frames", [])
    upf = hdr["us_per_frame"]
    return {
        "codec": out.get("fourcc", "").lower() or None,
        "width": hdr["width"],
        "height": hdr["height"],
        "bpp": out.get("bpp"),
        "n_frames": len(frames),
        "fps": round(1e6 / upf, 4) if upf else None,
        "duration_s": (
            round(len(frames) * upf / 1e6, 6) if upf else None
        ),
        "frames": frames,
    }


def extract_frames(payload: bytes, k: int) -> list[tuple[int, int, int, bytes]]:
    """k evenly spaced REAL decoded frames of an MJPEG AVI:
    [(frame_idx, width, height, rgb_or_gray_bytes)]. Raises
    NotImplementedError when the frames are not JPEG (inter-frame
    codecs need external decoders)."""
    from kinesyslog_spark.operators.jpeg import decode_jpeg

    meta = parse_avi(payload)
    frames = meta["frames"]
    if not frames:
        return []
    raw_dib = frames[0][:2] != b"\xff\xd8"
    if raw_dib and (meta["codec"] not in (None, "", "dib", "raw")):
        raise NotImplementedError(
            f"non-MJPEG video stream ({meta['codec']}): inter-frame "
            "codecs need external decoders"
        )
    n = len(frames)
    k = max(1, min(k, n))
    step = n / k
    out = []
    for j in range(k):
        idx = min(n - 1, int(j * step))
        if raw_dib:
            px = decode_dib(
                frames[idx], meta["width"], meta["height"], meta["bpp"] or 24
            )
            w, h = meta["width"], meta["height"]
        else:
            w, h, _ch, px = decode_jpeg(frames[idx])
        out.append((idx, w, h, px))
    return out


def decode_dib(frame: bytes, width: int, height: int, bpp: int) -> bytes:
    """Decode one uncompressed DIB frame ('DIB '/BI_RGB streams) to
    top-down RGB bytes — the BMP pixel-array grammar without the file
    header: bottom-up rows, BGR order (24-bit) or 8-bit gray, each row
    padded to a 4-byte boundary."""
    if bpp not in (8, 24):
        raise NotImplementedError(f"DIB bpp={bpp} (8/24 supported)")
    bypp = bpp // 8
    row = (width * bypp + 3) & ~3
    if len(frame) < row * height:
        raise ValueError("truncated DIB frame")
    try:  # numpy fast path (byte-identical); pure-Python fallback below
        import numpy as np

        a = np.frombuffer(frame[: row * height], dtype=np.uint8)
        a = a.reshape(height, row)[::-1, : width * bypp]  # flip bottom-up
        if bpp == 24:
            rgb = a.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
        else:
            rgb = np.repeat(a.reshape(height, width, 1), 3, axis=2)
        return np.ascontiguousarray(rgb).tobytes()
    except ImportError:
        pass
    out = bytearray(width * height * 3)
    for y in range(height):
        src = (height - 1 - y) * row  # bottom-up
        dst = y * width * 3
        if bpp == 24:
            for x in range(width):
                b, g, r = frame[src + 3 * x:src + 3 * x + 3]
                out[dst + 3 * x:dst + 3 * x + 3] = bytes((r, g, b))
        else:
            for x in range(width):
                v = frame[src + x]
                out[dst + 3 * x:dst + 3 * x + 3] = bytes((v, v, v))
    return bytes(out)


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_dib_avi(
    width: int, height: int, frames_rgb: list[bytes], fps: int = 25
) -> bytes:
    """Assemble a minimal uncompressed ('DIB ') AVI from top-down RGB
    frames — the synthesis twin of `parse_avi`/`decode_dib` (the
    container equivalent of bmp.encode_bmp): 24-bit BGR bottom-up rows,
    4-byte row padding, word-aligned RIFF chunks."""
    upf = 1_000_000 // fps
    row = (width * 3 + 3) & ~3
    pad = b"\x00" * (row - width * 3)

    def _frame_body(rgb: bytes) -> bytes:
        try:  # numpy fast path (byte-identical); fallback below
            import numpy as np

            a = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
            bgr = a[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
            if not pad:
                return np.ascontiguousarray(bgr).tobytes()
            padded = np.zeros((height, row), dtype=np.uint8)
            padded[:, : width * 3] = bgr.reshape(height, width * 3)
            return padded.tobytes()
        except ImportError:
            body = bytearray()
            for y in range(height - 1, -1, -1):  # bottom-up storage
                src = y * width * 3
                for x in range(width):
                    r, g, b = rgb[src + 3 * x:src + 3 * x + 3]
                    body += bytes((b, g, r))
                body += pad
            return bytes(body)

    movi = bytearray()
    for rgb in frames_rgb:
        movi += _chunk(b"00db", _frame_body(rgb))
    avih = struct.pack(
        "<IIIIIIIIII16x",
        upf, row * height * fps, 0, 0, len(frames_rgb), 0, 1,
        row * height, width, height,
    )
    strh = b"vids" + b"DIB " + b"\x00" * 48
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, row * height, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    body = b"AVI " + hdrl + _list(b"movi", bytes(movi))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def scene_cut_l1(payload: bytes) -> list[tuple[int, int]]:
    """Per-transition luma-histogram L1 distances of a video: for each
    consecutive frame pair (f-1, f) return (f, L1(hist_{f-1}, hist_f))
    over 256-bin luma histograms. The classic shot-boundary signal
    (histogram differencing); thresholding is the caller's policy.

    Integer-exact: real frame decode (DIB or MJPEG), BT.601 integer
    luma, integer bin counts — the same number on every engine."""
    import numpy as np

    from kinesyslog_spark.operators.jpeg import decode_jpeg
    from kinesyslog_spark.operators.png import to_gray

    meta = parse_avi(payload)
    frames = meta["frames"]
    hists = []
    for fr in frames:
        if fr[:2] == b"\xff\xd8":
            _w, _h, ch, px = decode_jpeg(fr)
        else:
            px = decode_dib(fr, meta["width"], meta["height"], meta["bpp"] or 24)
            ch = 3
        gray = np.frombuffer(to_gray(px, ch), dtype=np.uint8)
        hists.append(np.bincount(gray, minlength=256))
    return [
        (f, int(np.abs(hists[f] - hists[f - 1]).sum()))
        for f in range(1, len(hists))
    ]
