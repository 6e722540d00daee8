"""W25: continuous scene-cut detection (streaming/scenecut.py) —
replay-driven over a parquet frame stream with a cut landing ON the
micro-batch boundary; the batch `scene_cut_l1` twin is the oracle.
Plus unit checks on the decode stage and the stateful body."""

from __future__ import annotations

import os
import time

import pandas as pd

from kinesyslog_spark.operators.avi import encode_dib_avi, parse_avi, scene_cut_l1
from kinesyslog_spark.streaming.scenecut import (
    frame_hist_batches,
    make_cut_fn,
    streaming_scene_cuts,
)

W, H = 18, 16


def _grad(g: int) -> bytes:
    return bytes(
        b for y in range(H) for _ in range(W) for b in (((g + y) % 256,) * 3)
    )


def _dib_frames(gs: list[int]) -> list[bytes]:
    """Raw DIB chunk bytes for each gradient anchor, via the real writer."""
    avi = encode_dib_avi(W, H, [_grad(g) for g in gs])
    return parse_avi(avi)["frames"]


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


def test_frame_hist_stage_drops_malformed():
    frames = _dib_frames([10])
    pdf = pd.DataFrame(
        {
            "vid_id": [1, 2],
            "frame_idx": [0, 0],
            "frame": [frames[0], b"short"],
            "width": [W, W],
            "height": [H, H],
            "bpp": [24, 24],
        }
    )
    [out] = list(frame_hist_batches(iter([pdf])))
    assert list(out["vid_id"]) == [1]
    hist = out["hist"].iloc[0]
    assert sum(hist) == W * H
    assert hist[10] == W and hist[10 + H - 1] == W  # gradient rows 10..25


def test_cut_fn_bridges_state_and_sorts():
    fn = make_cut_fn()
    st = FakeState()
    h_a = [0] * 256
    h_a[10] = W * H
    h_b = [0] * 256
    h_b[120] = W * H
    # batch 1: frames 1, 0 out of order within the batch (same hist)
    pdf1 = pd.DataFrame(
        {"vid_id": [7, 7], "frame_idx": [1, 0], "hist": [h_a, h_a]}
    )
    [out1] = list(fn((7,), iter([pdf1]), st))
    assert list(out1["frame_idx"]) == [1] and list(out1["l1"]) == [0]
    assert st.get[0] == 1
    # batch 2: frame 2 jumps scene -> boundary transition measured
    pdf2 = pd.DataFrame({"vid_id": [7], "frame_idx": [2], "hist": [h_b]})
    [out2] = list(fn((7,), iter([pdf2]), st))
    assert list(out2["frame_idx"]) == [2]
    assert list(out2["l1"]) == [2 * W * H]


def test_streaming_scene_cuts_replay(spark, tmp_path):
    in_dir = str(tmp_path / "frames")
    os.makedirs(in_dir)
    # one video, scene jump at frame 3; the batch twin is the oracle
    gs = [10, 11, 12, 120, 121]
    frames = _dib_frames(gs)
    avi = encode_dib_avi(W, H, [_grad(g) for g in gs])
    expect = {(5, fi, l1) for fi, l1 in scene_cut_l1(avi)}

    def write_batch(rows):
        spark.createDataFrame(
            rows,
            "vid_id long, frame_idx long, frame binary, "
            "width int, height int, bpp int",
        ).coalesce(1).write.mode("append").parquet(in_dir)

    # micro-batch boundary right BEFORE the scene jump (frames 0-2 | 3-4)
    write_batch([(5, i, frames[i], W, H, 24) for i in range(3)])
    stream = spark.readStream.schema(
        "vid_id long, frame_idx long, frame binary, width int, height int, bpp int"
    ).parquet(in_dir)
    q = (
        streaming_scene_cuts(stream)
        .writeStream.format("memory")
        .queryName("scenecut_sink")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def rows():
            return {
                (r["vid_id"], r["frame_idx"], r["l1"])
                for r in spark.sql("SELECT * FROM scenecut_sink").collect()
            }

        deadline = time.time() + 90
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        write_batch([(5, i, frames[i], W, H, 24) for i in range(3, 5)])
        while time.time() < deadline and rows() != expect:
            time.sleep(0.5)
        assert rows() == expect, (
            f"streaming transitions diverge from batch twin: "
            f"{rows()} vs {expect}"
        )
    finally:
        q.stop()
