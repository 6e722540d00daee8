"""W20 — continuous image near-dup detection over a binary payload
stream (the streaming twin of q124, completing the modality matrix:
W9 streams q26's text LSH, W20 streams q124's image pHash).

A production image-training pipeline checks every arriving image
against the recently-ingested corpus — re-running batch pHash dedup per
crawl is exactly what streaming state removes. Same staging as W9:

1. stateless, Arrow-batched Python (the one intended Python stage —
   pixel decode has no Catalyst form): REAL PNG decode
   (operators/png.py) -> gray 32x32 -> integer-DCT pHash -> one row per
   hash block (8 buckets per image, `queries/imagehash` conventions).
2. stateful, keyed by (block_idx, block_val): buckets hold recent
   members' full hashes (FIFO cap + optional TTL — the same bounded
   state contract as W9); an arriving image emits (img_id, dup_of,
   hamming) for every stored member at hamming <= `ham_t`, then joins
   the bucket.

hamming <= 7 with 8 blocks keeps the pigeonhole guarantee: a true
near-dup ALWAYS lands in at least one bucket its twin occupies, so
candidate recall is exact at the threshold (the FIFO/TTL horizon is the
only — documented — recall trade-off, as in W9).

Scale posture: state is sharded by hash block (natural LSH
partitioning, no per-image global state); per-key state is
`max_bucket_state` x ~80 B; RocksDB provider (session.py) carries the
aggregate keyspace at cluster scale. Malformed payloads are dropped in
stage 1 (a bad blob must never kill the query).

Reference parity: none (no media surface in the reference); streaming
counterpart of q124. Replay-tested (no SQL oracle — arrival order
defines dup_of, which a set-based oracle cannot express).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesyslog_spark.operators.multimodal import DECODE_ERRORS

HAM_T = 7               # q124's threshold; keeps the pigeonhole guarantee
MAX_BUCKET_STATE = 64   # FIFO cap per block bucket

BANDED_SCHEMA = "img_id long, sig string, block_idx int, block_val long"
MATCH_SCHEMA = "img_id long, dup_of long, hamming long"
_STATE_SCHEMA = "ids array<long>, sigs array<string>"


def phash_banded_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas 1->8: (img_id, payload) -> one row per hash block,
    each carrying the full 8-block signature for the stateful verify."""
    from kinesyslog_spark.operators.png import (
        box_downscale,
        decode_png,
        phash_blocks,
        to_gray,
    )

    for pdf in batches:
        with_ts = "ts_ms" in pdf.columns
        cols = ["img_id", "sig", "block_idx", "block_val"] + (
            ["ts_ms"] if with_ts else []
        )
        ts_iter = pdf["ts_ms"] if with_ts else [None] * len(pdf)
        rows = []
        for i, p, ts in zip(pdf["img_id"], pdf["payload"], ts_iter):
            try:
                w, h, ch, px = decode_png(bytes(p))
            except DECODE_ERRORS:
                continue
            gray = to_gray(px, ch)
            if (w, h) != (32, 32):
                gray = box_downscale(gray, w, h, 32, 32)
            blocks = phash_blocks(gray)
            sig = "|".join(str(b) for b in blocks)
            for j, bv in enumerate(blocks):
                r = {
                    "img_id": int(i), "sig": sig,
                    "block_idx": j, "block_val": int(bv),
                }
                if with_ts:
                    r["ts_ms"] = int(ts)
                rows.append(r)
        yield pd.DataFrame(rows, columns=cols)


def _hamming(a: str, b: str) -> int:
    return sum(
        bin(int(x) ^ int(y)).count("1")
        for x, y in zip(a.split("|"), b.split("|"))
    )


def make_image_bucket_fn(ham_t: int = HAM_T,
                         max_bucket_state: int = MAX_BUCKET_STATE,
                         ttl_ms: int | None = None,
                         event_time: bool = False):
    """applyInPandasWithState body, keyed by (block_idx, block_val).

    With `event_time=True` the TTL horizon is watermark-driven
    (EventTimeTimeout; rows must carry ts_ms) — eviction keyed to the
    DATA instead of wall-clock, so deterministic replay exercises it
    (the W9 event-TTL pattern; ProcessingTimeTimeout never fires under
    Trigger.AvailableNow)."""

    def bucket_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["img_id", "dup_of", "hamming"])
            return

        ids, sigs = ([list(x) for x in state.get] if state.exists
                     else ([], []))
        out = []
        last_ts = 0
        for pdf in pdfs:
            # img_id order: deterministic dup_of for same-batch pairs
            for row in pdf.sort_values("img_id").itertuples(index=False):
                iid, sig = int(row.img_id), str(row.sig)
                if event_time:
                    last_ts = max(last_ts, int(row.ts_ms))
                for prev_id, prev_sig in zip(ids, sigs):
                    if prev_id == iid:
                        continue
                    ham = _hamming(sig, prev_sig)
                    if ham <= ham_t:
                        out.append({"img_id": iid, "dup_of": prev_id,
                                    "hamming": ham})
                ids.append(iid)
                sigs.append(sig)
        if len(ids) > max_bucket_state:  # FIFO: keep the newest
            ids, sigs = ids[-max_bucket_state:], sigs[-max_bucket_state:]
        state.update((ids, sigs))
        if ttl_ms is not None and event_time:
            wm = int(state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(max(last_ts + ttl_ms, wm + 1))
        elif ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield (pd.DataFrame(out, columns=["img_id", "dup_of", "hamming"])
               if out else
               pd.DataFrame(columns=["img_id", "dup_of", "hamming"]))

    return bucket_fn


def streaming_image_neardup(
    imgs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "img_id",
    ham_t: int = HAM_T,
    max_bucket_state: int = MAX_BUCKET_STATE,
    ttl_ms: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Continuous image near-dup candidates over a (streaming) binary
    frame. Returns (img_id, dup_of, hamming), possibly repeated across
    blocks; `min(dup_of)` per img_id is the canonical representative.

    No TTL -> corpus-linear state -> RocksDB auto-enabled unless the
    caller pinned a provider or `checkpoint_dir` already holds prior-run
    state (session.auto_rocksdb_for_unbounded_state)."""
    from pyspark.sql import functions as F

    if ttl_ms is None:
        from kinesyslog_spark.session import auto_rocksdb_for_unbounded_state

        auto_rocksdb_for_unbounded_state(imgs.sparkSession, checkpoint_dir)
    banded = imgs.select(
        F.col(id_col).alias("img_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(phash_banded_batches, schema=BANDED_SCHEMA)
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return banded.groupBy("block_idx", "block_val").applyInPandasWithState(
        make_image_bucket_fn(ham_t, max_bucket_state, ttl_ms),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_image_neardup_event_ttl(
    imgs: DataFrame,
    ts_col: str,
    ttl_ms: int,
    payload_col: str = "payload",
    id_col: str = "img_id",
    ham_t: int = HAM_T,
    max_bucket_state: int = MAX_BUCKET_STATE,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """streaming_image_neardup with a WATERMARK-driven dedup horizon:
    a block bucket is forgotten once the event-time watermark passes
    its last activity + ttl_ms (the W9 event-TTL pattern — replay
    evicts at the same points every run; a backfill expires exactly
    the horizons the live run would)."""
    from pyspark.sql import functions as F

    banded = imgs.select(
        F.col(id_col).alias("img_id"), F.col(payload_col).alias("payload"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
    ).mapInPandas(
        phash_banded_batches, schema=BANDED_SCHEMA + ", ts_ms long"
    ).withColumn(
        "ts_event", F.timestamp_millis(F.col("ts_ms"))
    ).withWatermark("ts_event", watermark_delay)
    return banded.groupBy("block_idx", "block_val").applyInPandasWithState(
        make_image_bucket_fn(ham_t, max_bucket_state, ttl_ms,
                             event_time=True),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
