"""W20: continuous image pHash near-dup (streaming/imagedup.py) —
replay-driven over a parquet stream of real PNG payloads, plus unit
checks on the stateless hash stage and the bucket state machine."""

from __future__ import annotations

import os
import random
import time

from kinesyslog_spark.operators.png import encode_png, phash_blocks
from kinesyslog_spark.streaming.imagedup import (
    HAM_T,
    _hamming,
    phash_banded_batches,
    streaming_image_neardup,
)


def _raster(seed: int) -> bytes:
    rnd = random.Random(seed)
    return bytes(rnd.randrange(256) for _ in range(1024))


def _near(base: bytes, n_edits: int = 4, seed: int = 99) -> bytes:
    rnd = random.Random(seed)
    buf = bytearray(base)
    for _ in range(n_edits):
        buf[rnd.randrange(1024)] = rnd.randrange(256)
    return bytes(buf)


def _png(raster: bytes) -> bytes:
    return encode_png(raster, 32, 32)


def _ham_rasters(a: bytes, b: bytes) -> int:
    return sum(
        bin(x ^ y).count("1")
        for x, y in zip(phash_blocks(a), phash_blocks(b))
    )


def test_fixture_preconditions():
    base = _raster(1)
    assert _ham_rasters(base, _near(base)) <= HAM_T
    assert _ham_rasters(base, _raster(2)) > HAM_T
    assert _ham_rasters(_raster(2), _raster(3)) > HAM_T


def test_phash_banded_stage():
    import pandas as pd

    base = _raster(1)
    pdf = pd.DataFrame({
        "img_id": [1, 2], "payload": [_png(base), b"not a png"],
    })
    [out] = list(phash_banded_batches(iter([pdf])))
    assert len(out) == 8  # malformed payload dropped, 8 blocks for img 1
    assert set(out["img_id"]) == {1}
    assert list(out["block_idx"]) == list(range(8))
    sig = out["sig"].iloc[0]
    assert [int(s) for s in sig.split("|")] == phash_blocks(base)
    assert _hamming(sig, sig) == 0


def test_streaming_image_neardup_replay(spark, tmp_path):
    in_dir = str(tmp_path / "imgs")
    os.makedirs(in_dir)
    base = _raster(1)

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "img_id long, payload binary"
        ).coalesce(1).write.mode("append").parquet(in_dir)

    # batch 1: base image + an unrelated one
    write_batch("b1", [(1, _png(base)), (2, _png(_raster(2)))])
    imgs = (
        spark.readStream.schema("img_id long, payload binary")
        .parquet(in_dir)
    )
    q = (
        streaming_image_neardup(imgs)
        .writeStream.format("memory")
        .queryName("imagedup_sink")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def rows():
            return {
                (r["img_id"], r["dup_of"])
                for r in spark.sql("SELECT * FROM imagedup_sink").collect()
            }

        deadline = time.time() + 90
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        # batch 2: near-dup of img 1, a fresh image, and a same-batch
        # exact dup of the fresh image
        fresh = _raster(3)
        write_batch("b2", [
            (3, _png(_near(base))),
            (4, _png(fresh)),
            (5, _png(fresh)),
        ])
        while time.time() < deadline and not rows() >= {(3, 1), (5, 4)}:
            time.sleep(0.5)
        got = rows()
        assert (3, 1) in got, f"cross-batch image near-dup missed: {got}"
        assert (5, 4) in got, f"same-batch exact dup missed: {got}"
        assert not {(2, 1), (4, 1), (4, 2), (4, 3)} & got, got
        hams = [
            r["hamming"]
            for r in spark.sql("SELECT * FROM imagedup_sink").collect()
            if (r["img_id"], r["dup_of"]) == (5, 4)
        ]
        assert hams and all(h == 0 for h in hams)  # exact dup: hamming 0
    finally:
        q.stop()


def test_image_bucket_fifo_cap():
    """Unit-drive the stateful body with a fake GroupState: FIFO cap
    bounds bucket memory, newest members kept."""
    import pandas as pd

    from kinesyslog_spark.streaming.imagedup import make_image_bucket_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v, self.exists = None, False

    fn = make_image_bucket_fn(max_bucket_state=3)
    st = FakeState()
    sig = "|".join(["0"] * 8)
    pdf = pd.DataFrame({
        "img_id": list(range(10)), "sig": [sig] * 10,
        "block_idx": [0] * 10, "block_val": [0] * 10,
    })
    [out] = list(fn((0, 0), iter([pdf]), st))
    ids, sigs = st.get
    assert ids == [7, 8, 9] and len(sigs) == 3  # FIFO keeps newest
    # identical sigs: every later image matches every earlier one
    assert len(out) == 45 and set(out["hamming"]) == {0}
