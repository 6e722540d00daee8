"""W25 — continuous scene-cut detection over a per-frame video stream
(the streaming twin of q141, as W20 streams q124).

A live video-ingest pipeline sees frames, not finished files: rows of
(vid_id, frame_idx, frame-DIB bytes, dims). Cut detection needs the
PREVIOUS frame's luma histogram — across micro-batch boundaries —
which is exactly one small piece of keyed state:

1. stateless, Arrow-batched Python (the intended decode stage): real
   DIB decode (operators/avi.py) -> integer BT.601 luma -> 256-bin
   histogram per frame. Malformed frames are dropped (a bad frame
   must never kill the query).
2. stateful, keyed by vid_id (`applyInPandasWithState`): state is
   (last_idx, last 256-bin histogram) — ~2 KB per live video, O(1)
   forever, optional TTL for finished videos. Each frame in index
   order emits (vid_id, frame_idx, l1) against its predecessor, then
   replaces the state — so a cut falling ON a micro-batch boundary is
   still measured (batch-split invariance, pinned in tests).

Frames are sorted by frame_idx inside each batch; ACROSS batches the
operator assumes per-video in-order delivery (the W19 contract —
event-time reordering is upstream's concern). Thresholding is the
consumer's policy, as in `scene_cut_l1`.

Reference parity: none (no media surface in the reference); streaming
counterpart of q141. Replay-tested; no SQL oracle (cross-batch state
has no set-based form) — the batch twin IS the oracle in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesyslog_spark.operators.multimodal import DECODE_ERRORS

HIST_SCHEMA = "vid_id long, frame_idx long, hist array<long>"
CUT_SCHEMA = "vid_id long, frame_idx long, l1 long"
_STATE_SCHEMA = "last_idx long, hist array<long>"


def frame_hist_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas 1->1: (vid_id, frame_idx, frame, width, height, bpp)
    -> 256-bin luma histogram per frame; malformed frames dropped."""
    import numpy as np

    from kinesyslog_spark.operators.avi import decode_dib
    from kinesyslog_spark.operators.png import to_gray

    for pdf in batches:
        ids, idxs, hists = [], [], []
        for vid, fi, frame, w, h, bpp in zip(
            pdf["vid_id"], pdf["frame_idx"], pdf["frame"],
            pdf["width"], pdf["height"], pdf["bpp"],
        ):
            try:
                rgb = decode_dib(bytes(frame), int(w), int(h), int(bpp))
            except DECODE_ERRORS:
                continue
            gray = np.frombuffer(to_gray(rgb, 3), dtype=np.uint8)
            ids.append(int(vid))
            idxs.append(int(fi))
            hists.append(np.bincount(gray, minlength=256).tolist())
        yield pd.DataFrame({"vid_id": ids, "frame_idx": idxs, "hist": hists})


def make_cut_fn(ttl_ms: int | None = None):
    def cut_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (vid_id,) = key
        if state.exists:
            last_idx, last_hist = state.get
            last_hist = list(last_hist)
        else:
            last_idx, last_hist = None, None
        out_idx: list[int] = []
        out_l1: list[int] = []
        for pdf in pdfs:
            for _, row in pdf.sort_values("frame_idx").iterrows():
                # plain Python ints: numpy scalars poison the state
                # pickle on the JVM side
                hist = [int(x) for x in row["hist"]]
                if last_hist is not None:
                    l1 = sum(abs(a - b) for a, b in zip(hist, last_hist))
                    out_idx.append(int(row["frame_idx"]))
                    out_l1.append(int(l1))
                last_idx, last_hist = int(row["frame_idx"]), hist
        if last_hist is not None:
            state.update((last_idx, last_hist))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
        if out_idx:
            yield pd.DataFrame(
                {"vid_id": vid_id, "frame_idx": out_idx, "l1": out_l1}
            )

    return cut_fn


def streaming_scene_cuts(
    frames: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Continuous per-transition luma-histogram L1 over a frame stream:
    (vid_id, frame_idx, frame, width, height, bpp) ->
    (vid_id, frame_idx, l1) for every consecutive-frame transition,
    including transitions that span micro-batches."""
    hists = frames.mapInPandas(frame_hist_batches, schema=HIST_SCHEMA)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return hists.groupBy("vid_id").applyInPandasWithState(
        make_cut_fn(ttl_ms),
        outputStructType=CUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
