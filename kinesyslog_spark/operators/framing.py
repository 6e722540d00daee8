r"""Framing / reassembly operators (reference protocol.py F1-F5, SURVEY §2a).

Two execution tiers:

- F1 (terminator framing) and F4 (GELF dispatch) are pure column
  expressions — usable identically under `spark.read` and `readStream`.
- F2 (octet-counted framing, protocol.py:182-212) is inherently
  sequential *per connection*: an `applyInPandas` grouped-map walks each
  connection's byte stream in chunk order. Connections are independent, so
  at 100 TB the work is embarrassingly parallel across the (conn_id)
  shuffle; no single group ever holds more than one connection's buffer.
- F5 (zlib/gzip whole-message decompression, protocol.py:246-260) is an
  Arrow-batched pandas UDF over the binary payload column.

The reference's framing bugs are NOT ported: the missing
`constant.OPENBRACKET` crash for TCP uncompressed GELF (protocol.py:224)
is implemented as the *intended* `{` dispatch.
"""

from __future__ import annotations

import gzip as _gzip
import zlib as _zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

from kinesyslog_spark.constants import MAX_MESSAGE_LENGTH

TERMINATOR_RE = "[\n\x00\r]"

FRAMED_SCHEMA = "conn_id long, msg_seq long, message binary"


# ---------------------------------------------------------------------------
# F1 — non-transparent framing (RFC6587 §3.4.2): split on LF/NUL/CR
# ---------------------------------------------------------------------------

def frame_lines(raw: Column) -> Column:
    """Terminator-framed messages from a string stream: split on any of
    LF/NUL/CR (terminator consumed), drop empties, truncate to 6 KiB
    (protocol.py:92-104,164)."""
    parts = F.split(raw, TERMINATOR_RE)
    return F.transform(
        F.filter(parts, lambda p: F.length(p) > 0),
        lambda p: F.substring(p, 1, MAX_MESSAGE_LENGTH),
    )


# ---------------------------------------------------------------------------
# F2/F3 — octet-counted framing with F1 fallback, per-connection state
# ---------------------------------------------------------------------------

def _frame_buffer(buf: bytes) -> list[bytes]:
    """Sequential framer over one connection's complete byte stream.

    Mirrors protocol.py:144-212: leading digit -> octet-counted ('<len>
    <len bytes>'); digit-run not ending in space -> fall back to
    terminator framing for that segment; declared length > 6 KiB -> keep
    the first 6 KiB, discard the rest (F3); every message truncated to
    6 KiB. Trailing bytes without terminator are flushed as a final
    message (connection close, protocol.py:56-58).
    """
    out: list[bytes] = []
    i, n = 0, len(buf)
    terms = b"\n\x00\r"
    while i < n:
        c = buf[i]
        if 0x30 <= c <= 0x39:  # ASCII digit: try octet-counted
            j = i
            while j < n and 0x30 <= buf[j] <= 0x39:
                j += 1
            if j < n and buf[j] == 0x20:  # digits then space
                length = int(buf[i:j])
                start = j + 1
                msg = buf[start:start + length]
                out.append(msg[:MAX_MESSAGE_LENGTH])
                i = start + length  # overlength remainder discarded (F3)
                continue
            # digit-leading garbage -> terminator framing (protocol.py:196-198)
        k = i
        while k < n and buf[k] not in terms:
            k += 1
        if k > i:
            out.append(buf[i:k][:MAX_MESSAGE_LENGTH])
        i = k + 1  # consume terminator (or run past end -> flush)
    return out


def frame_octet_counted(chunks: DataFrame) -> DataFrame:
    """F2 as a relational op over (conn_id long, chunk_seq long,
    payload binary): reassemble each connection's stream in chunk order,
    frame it, and emit (conn_id, msg_seq, message).

    Grouped-map pandas: one group = one connection = one sequential walk;
    the only shuffle is the groupBy(conn_id). Chunk-split invariance
    (the same byte stream chunked differently frames identically) is the
    hypothesis property test in tests/test_framing.py.
    """

    def reframe(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk_seq")
        conn = pdf["conn_id"].iloc[0]
        buf = b"".join(bytes(p) for p in pdf["payload"])
        msgs = _frame_buffer(buf)
        return pd.DataFrame(
            {"conn_id": conn, "msg_seq": range(len(msgs)), "message": msgs}
        )

    return chunks.groupBy("conn_id").applyInPandas(reframe, schema=FRAMED_SCHEMA)


# ---------------------------------------------------------------------------
# F4 — GELF format dispatch on magic bytes (intended semantics)
# ---------------------------------------------------------------------------

def gelf_format(payload: Column) -> Column:
    """'json' | 'zlib' | 'gzip' | 'chunk' | 'unknown' from the leading
    bytes (protocol.py:215-244 + the fixed OPENBRACKET dispatch)."""
    head1 = F.substring(payload, 1, 1)
    head2 = F.substring(payload, 1, 2)
    return (
        F.when(head1 == F.lit(b"{"), "json")
        .when(head2 == F.lit(b"\x1f\x8b"), "gzip")
        .when(head2 == F.lit(b"\x1e\x0f"), "chunk")
        .when(head1 == F.lit(b"\x78"), "zlib")
        .otherwise("unknown")
    )


# ---------------------------------------------------------------------------
# F5 — whole-message decompression (zlib / gzip), Arrow-batched
# ---------------------------------------------------------------------------

@F.pandas_udf(BinaryType())
def decompress_message(payload: pd.Series, fmt: pd.Series) -> pd.Series:
    """Decompress per format tag; failure -> None (reference logs and
    drops, protocol.py:250-252,258-260)."""

    def one(p, f):
        if p is None:
            return None
        b = bytes(p)
        try:
            if f == "zlib":
                return _zlib.decompress(b)
            if f == "gzip":
                return _gzip.decompress(b)
            return b
        except Exception:  # noqa: BLE001 — malformed input -> dropped
            return None

    return pd.Series([one(p, f) for p, f in zip(payload, fmt)])


@F.pandas_udf(StringType())
def decode_utf8_lossy(payload: pd.Series) -> pd.Series:
    """P1 exact parity: bytes.decode('utf-8', 'backslashreplace')
    (message.py:82,96)."""
    return pd.Series(
        None if p is None else bytes(p).decode("utf-8", "backslashreplace")
        for p in payload
    )
