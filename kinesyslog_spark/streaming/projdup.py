"""W33 — continuous image near-dup over the rank-centered
random-projection hash (the streaming twin of q175, frozen-artifact
pattern).

q175's hash family is corpus-trained: per-coefficient rank transforms
and per-projection medians come from a corpus pass. A stream cannot
retrain per micro-batch — and SHOULDN'T: if the hash family drifted,
signatures stored in state would stop matching new arrivals (exactly
the failure mode the round-9 minhash-salt bug produced by accident).
The production pattern is FROZEN ARTIFACTS: train the transform once
on a reference corpus snapshot, broadcast it, and re-train/restart on
a cadence. This module implements that:

1. `frozen_projection_artifacts(spark, ref_sf_dir)` — one batch pass
   over the reference corpus builds (a) per-coefficient sorted value
   arrays (the exact min-rank transform: rank(v) = #\\{ref < v\\} + 1 by
   searchsorted, which REPRODUCES the batch rank for in-reference
   values and extends monotonically to unseen ones), (b) the 64
   projection medians over the reference, (c) n_ref. All exact
   integers, derived from the same kernels q175 uses.
2. stateless Arrow stage: PNG decode -> 16x16 integer DCT -> centered
   reference ranks -> 64 seeded +-1 projections -> median bits ->
   8x8-bit block values, one row per block with the full signature.
3. stateful stage: W20's bucket machinery VERBATIM
   (`make_image_bucket_fn` — keyed by (block_idx, block_val),
   FIFO-capped members, in-bucket hamming verify). hamming <= 7 over
   8 blocks keeps the pigeonhole candidate-recall guarantee.

Artifact size and shipping: the EXACT form's sorted-value matrix is
256 x n_ref int64 (~2 KB per reference doc — 10 MB at a 5k-doc
reference, 100 MB at 50k); it keeps the replay test byte-deterministic
against batch q175. At corpus scale use `quantized_projection_artifacts`
— fixed per-coefficient quantile boundaries (256 x bins int64, 512 KB
at the default 256 bins REGARDLESS of reference size) with medians
re-trained under the quantized ranks, so the family stays internally
consistent (the frozen-artifact rule: state outlives any one batch, so
the hash family must be a pure function of the artifact). Either form
is `sc.broadcast` by `streaming_projdup` and dereferenced inside the
stage — a plain closure would serialize the matrix into the task binary
and deserialize it PER TASK, not once per executor.

Reference parity: none (no media surface in the reference); streaming
counterpart of q175. Replay-tested against a numpy referee that
recomputes the whole chain (no SQL oracle — arrival order defines
dup_of).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: F401

from kinesyslog_spark.operators.multimodal import DECODE_ERRORS
from kinesyslog_spark.streaming.imagedup import (
    HAM_T,
    MATCH_SCHEMA,
    MAX_BUCKET_STATE,
    _STATE_SCHEMA,
    BANDED_SCHEMA,
    make_image_bucket_fn,
)

__all__ = [
    "frozen_projection_artifacts",
    "quantized_projection_artifacts",
    "proj_banded_batches",
    "streaming_projdup",
    "streaming_projdup_event_ttl",
]


def _rank_transform(art: dict):
    """rank(i, values) closure for either artifact form — training and
    serving MUST share this one implementation (a drifted rank rule is
    a drifted hash family, the exact failure mode W33 exists to avoid).

    Exact form ('sorted_cols'): rank(v) = #{ref < v} + 1 by searchsorted
    — reproduces batch q175 bit-for-bit for in-reference values.
    Quantized form ('boundaries', 'bins'): k = #{boundaries < v} in
    [0, bins], rank = k*n_ref//bins + 1 — a step function within
    n_ref/bins of the exact rank, monotone, integer-exact."""
    import numpy as np

    if "sorted_cols" in art:
        sc = art["sorted_cols"]

        def rank(i: int, v):
            return np.searchsorted(sc[i], v, side="left") + 1
    else:
        bnd, n_ref, bins = art["boundaries"], art["n_ref"], art["bins"]

        def rank(i: int, v):
            k = np.searchsorted(bnd[i], v, side="left")
            return (k * n_ref) // bins + 1

    return rank


def frozen_projection_artifacts(spark: SparkSession, ref_sf_dir: str):
    """Train the q175 hash family on a reference corpus snapshot
    (EXACT form — 256 x n_ref int64; see the module docstring for when
    to prefer the quantized form).

    Returns a plain dict of numpy arrays (picklable; `streaming_projdup`
    broadcasts it so executors fetch it once instead of per task):
      sorted_cols (256, n_ref) int64 — per-coefficient sorted values,
      medians     (64,) int64       — per-projection reference medians,
      n_ref       int.
    """
    import numpy as np

    from kinesyslog_spark.queries.imagehash import (
        _proj_matrix,
        hot_dct_coeffs,
    )

    pdf = hot_dct_coeffs(spark, ref_sf_dir).toPandas()
    C = np.stack(pdf["cv"].to_numpy()).astype(np.int64)  # (n_ref, 256)
    n_ref = len(C)
    sorted_cols = np.sort(C, axis=0).T.copy()            # (256, n_ref)
    # centered min-ranks of the reference against itself (exactly the
    # batch q175 transform), then projections and their lower medians
    ranks = np.empty_like(C)
    for i in range(C.shape[1]):
        ranks[:, i] = (
            np.searchsorted(sorted_cols[i], C[:, i], side="left") + 1
        )
    cr = 2 * ranks - (n_ref + 1)
    proj = cr @ _proj_matrix().T                          # (n_ref, 64)
    k = (n_ref + 1) // 2
    medians = np.sort(proj, axis=0)[k - 1].astype(np.int64)
    return {"sorted_cols": sorted_cols, "medians": medians, "n_ref": n_ref}


def quantized_projection_artifacts(spark: SparkSession, ref_sf_dir: str,
                                   bins: int = 256):
    """Train the q175 hash family with a QUANTIZED rank table — fixed
    per-coefficient quantile boundaries instead of the full sorted
    matrix: 256 x bins int64 (512 KB at the default 256 bins) no matter
    how large the reference corpus is, vs ~2 KB/doc for the exact form.

    boundaries[i][j] = the (j+1)/bins quantile of coefficient i over the
    reference (the sorted column sampled at positions (j+1)*n_ref//bins
    - 1), so the serving-side rank k*n_ref//bins + 1 is within
    n_ref/bins of the exact rank. The 64 projection medians are
    RE-TRAINED under the quantized ranks — the family is a pure function
    of this artifact, internally consistent between training and
    serving, which is what the frozen-artifact contract requires (a
    family mixing exact training with quantized serving would place
    median bits off-center and silently skew every signature).
    """
    import numpy as np

    from kinesyslog_spark.queries.imagehash import (
        _proj_matrix,
        hot_dct_coeffs,
    )

    pdf = hot_dct_coeffs(spark, ref_sf_dir).toPandas()
    C = np.stack(pdf["cv"].to_numpy()).astype(np.int64)  # (n_ref, 256)
    n_ref = len(C)
    bins = min(bins, n_ref)
    sorted_cols = np.sort(C, axis=0)                      # (n_ref, 256)
    idx = np.arange(1, bins + 1) * n_ref // bins - 1
    art = {
        "boundaries": sorted_cols[idx, :].T.copy(),       # (256, bins)
        "n_ref": n_ref,
        "bins": bins,
    }
    rank = _rank_transform(art)
    ranks = np.stack([rank(i, C[:, i]) for i in range(256)], axis=1)
    cr = 2 * ranks - (n_ref + 1)
    proj = cr @ _proj_matrix().T                          # (n_ref, 64)
    k = (n_ref + 1) // 2
    art["medians"] = np.sort(proj, axis=0)[k - 1].astype(np.int64)
    return art


def proj_banded_batches(artifacts):
    """mapInPandas 1->8 factory: (img_id, payload) -> one row per
    8-bit hash block (W20's BANDED_SCHEMA), hashing with the FROZEN
    family (exact or quantized artifact form). `artifacts` may be the
    plain dict or an sc.broadcast handle — dereferenced INSIDE the
    stage so the matrix ships via the broadcast mechanism (fetched once
    per executor), not pickled into every task binary. Malformed
    payloads are dropped."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from kinesyslog_spark.operators.png import (
            PHASH_DCT_T16,
            box_downscale,
            decode_png,
            to_gray,
        )
        from kinesyslog_spark.queries.imagehash import _proj_matrix

        art = artifacts.value if hasattr(artifacts, "value") else artifacts
        T = np.array(PHASH_DCT_T16, dtype=np.int64)
        P = _proj_matrix()
        rank = _rank_transform(art)
        med = art["medians"]
        n_ref = art["n_ref"]
        weights = 1 << np.arange(7, -1, -1, dtype=np.int64)
        for pdf in batches:
            with_ts = "ts_ms" in pdf.columns
            ts_iter = pdf["ts_ms"] if with_ts else [None] * len(pdf)
            ids, rasters, tss = [], [], []
            for d, p, ts in zip(pdf["img_id"], pdf["payload"], ts_iter):
                try:
                    w, h, ch, px = decode_png(bytes(p))
                except DECODE_ERRORS:
                    continue
                gray = to_gray(px, ch)
                if (w, h) != (32, 32):
                    gray = box_downscale(gray, w, h, 32, 32)
                ids.append(int(d))
                rasters.append(np.frombuffer(gray, dtype=np.uint8))
                if with_ts:
                    tss.append(int(ts))
            if not ids:
                empty = {
                    "img_id": pd.Series([], dtype="int64"),
                    "sig": pd.Series([], dtype=object),
                    "block_idx": pd.Series([], dtype="int32"),
                    "block_val": pd.Series([], dtype="int64"),
                }
                if with_ts:
                    empty["ts_ms"] = pd.Series([], dtype="int64")
                yield pd.DataFrame(empty)
                continue
            G = np.stack(rasters).astype(np.int64).reshape(-1, 32, 32)
            C = np.einsum("vy,nyu->nuv", T, G @ T.T).reshape(-1, 256)
            ranks = np.empty_like(C)
            for i in range(256):
                ranks[:, i] = rank(i, C[:, i])
            cr = 2 * ranks - (n_ref + 1)
            proj = cr @ P.T                                   # (n, 64)
            bits = proj > med[None, :]
            bv = (bits.reshape(-1, 8, 8) * weights).sum(axis=2)  # (n, 8)
            sig = ["|".join(str(int(x)) for x in row) for row in bv]
            n = len(ids)
            out = {
                "img_id": np.repeat(np.asarray(ids, dtype=np.int64), 8),
                "sig": np.repeat(np.asarray(sig, dtype=object), 8),
                "block_idx": np.tile(np.arange(8, dtype=np.int32), n),
                "block_val": bv.reshape(-1),
            }
            if with_ts:
                out["ts_ms"] = np.repeat(
                    np.asarray(tss, dtype=np.int64), 8
                )
            yield pd.DataFrame(out)

    return stage


def streaming_projdup(
    imgs: DataFrame,
    artifacts: dict,
    payload_col: str = "payload",
    id_col: str = "img_id",
    ham_t: int = HAM_T,
    max_bucket_state: int = MAX_BUCKET_STATE,
    ttl_ms: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Continuous projection-hash near-dup candidates over a streaming
    binary frame, under a frozen hash family. Returns
    (img_id, dup_of, hamming); `min(dup_of)` per img_id is canonical.

    No TTL -> corpus-linear state -> RocksDB auto-enabled unless the
    caller pinned a provider or `checkpoint_dir` already holds prior-run
    state (session.auto_rocksdb_for_unbounded_state)."""
    from pyspark.sql import functions as F

    if ttl_ms is None:
        from kinesyslog_spark.session import auto_rocksdb_for_unbounded_state

        auto_rocksdb_for_unbounded_state(imgs.sparkSession, checkpoint_dir)
    if not hasattr(artifacts, "value"):  # ship once per executor
        artifacts = imgs.sparkSession.sparkContext.broadcast(artifacts)
    banded = imgs.select(
        F.col(id_col).alias("img_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(proj_banded_batches(artifacts), schema=BANDED_SCHEMA)
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return banded.groupBy("block_idx", "block_val").applyInPandasWithState(
        make_image_bucket_fn(ham_t, max_bucket_state, ttl_ms),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_projdup_event_ttl(
    imgs: DataFrame,
    artifacts: dict,
    ts_col: str,
    ttl_ms: int,
    payload_col: str = "payload",
    id_col: str = "img_id",
    ham_t: int = HAM_T,
    max_bucket_state: int = MAX_BUCKET_STATE,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """streaming_projdup with a WATERMARK-driven dedup horizon (the W9
    event-TTL pattern): a block bucket is forgotten once the event-time
    watermark passes its last activity + ttl_ms — eviction keyed to the
    data, deterministic under replay."""
    from pyspark.sql import functions as F

    if not hasattr(artifacts, "value"):  # ship once per executor
        artifacts = imgs.sparkSession.sparkContext.broadcast(artifacts)
    banded = imgs.select(
        F.col(id_col).alias("img_id"), F.col(payload_col).alias("payload"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
    ).mapInPandas(
        proj_banded_batches(artifacts), schema=BANDED_SCHEMA + ", ts_ms long"
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
