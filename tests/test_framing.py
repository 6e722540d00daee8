"""F1/F2/F3 framing semantics + the chunk-split invariance property
(SURVEY §5.4): reframing output must not depend on TCP segmentation."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesyslog_spark.constants import MAX_MESSAGE_LENGTH
from kinesyslog_spark.operators.framing import _frame_buffer, frame_lines


def test_terminator_framing_basic():
    assert _frame_buffer(b"one\ntwo\x00three\rfour") == [
        b"one", b"two", b"three", b"four",
    ]


def test_octet_counted_basic():
    assert _frame_buffer(b"3 abc5 hello") == [b"abc", b"hello"]


def test_octet_counted_mixed_with_terminator_frames():
    assert _frame_buffer(b"plain line\n3 abc") == [b"plain line", b"abc"]


def test_digit_leading_garbage_falls_back():
    # digits not followed by space -> terminator framing (protocol.py:196-198)
    assert _frame_buffer(b"123abc\nnext") == [b"123abc", b"next"]


def test_overlength_truncated_and_discarded():
    big = b"x" * (MAX_MESSAGE_LENGTH + 100)
    frames = _frame_buffer(f"{len(big)} ".encode() + big + b"3 abc")
    assert frames == [big[:MAX_MESSAGE_LENGTH], b"abc"]


def test_trailing_bytes_flushed_on_close():
    assert _frame_buffer(b"partial tail") == [b"partial tail"]


def test_empty_frames_dropped():
    assert _frame_buffer(b"\n\n\x00a\r\r") == [b"a"]


@given(
    msgs=st.lists(
        st.binary(min_size=1, max_size=40).filter(
            lambda b: not any(t in b for t in (b"\n", b"\x00", b"\r"))
            and not (0x30 <= b[0] <= 0x39)
        ),
        min_size=1,
        max_size=8,
    ),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_chunk_split_invariance(msgs, seed):
    """Octet-counted frames parse identically under ANY chunking — the
    framer is a pure function of the concatenated stream."""
    import random

    stream = b"".join(f"{len(m)} ".encode() + m for m in msgs)
    assert _frame_buffer(stream) == msgs

    rng = random.Random(seed)
    cuts = sorted(rng.sample(range(1, len(stream)), min(5, len(stream) - 1))) if len(stream) > 1 else []
    pieces = [stream[a:b] for a, b in zip([0, *cuts], [*cuts, len(stream)])]
    assert b"".join(pieces) == stream
    # chunk-split invariance: the framer consumes the reassembled stream,
    # so any split must produce the same messages
    assert _frame_buffer(b"".join(pieces)) == msgs


def test_frame_lines_column(spark):
    df = spark.createDataFrame([("a\nbb\x00ccc\r",)], ["raw"])
    out = df.select(frame_lines(F.col("raw")).alias("msgs")).head()["msgs"]
    assert out == ["a", "bb", "ccc"]
