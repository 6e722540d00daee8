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
microseconds/frame, fourcc) plus the raw video-frame payloads in
stream order; `extract_frames` samples k evenly spaced frames and
decodes them to pixels via decode_jpeg.

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
            if buf[body_start:body_start + 4] == b"vids":
                out["fourcc"] = buf[body_start + 4:body_start + 8].decode(
                    "latin-1"
                ).strip("\x00 ")
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
    if frames[0][:2] != b"\xff\xd8":
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
        w, h, _ch, px = decode_jpeg(frames[idx])
        out.append((idx, w, h, px))
    return out
