"""W9 — continuous MinHash near-dup detection over a document stream.

The streaming form of q26 (MinHash+LSH batch dedup): a production
training-data pipeline doesn't re-run batch dedup per crawl snapshot —
new documents arrive continuously and each must be checked against the
recently-seen corpus. This operator keeps per-LSH-bucket state and flags
each arriving document that collides with an earlier one at signature
similarity >= the threshold.

Shape (same staging as the batch op, state instead of a self-join):

1. stateless, JVM-side: tokenize -> word-3-shingles -> K=12 MinHash
   signature -> LSH band keys (4 bands x 3 rows; identical scheme and
   md5 hashing as `queries/dedup.py:q26`), then explode to one row per
   (band_idx, band_key).
2. stateful, keyed by (band_idx, band_key): `applyInPandasWithState`
   holds the bucket's recent members (doc_id + full signature, FIFO cap
   `max_bucket_state`); an arriving doc emits (doc_id, dup_of, est_sim)
   for every stored member whose signature agreement >= `sim_thr`, then
   joins the bucket itself.

Emitted candidates can repeat across bands (a true near-dup usually
collides in several buckets); consumers take `min(dup_of)` per doc_id —
kept stateless here because chaining two stateful operators in one
streaming query is restricted, and the candidate volume is tiny (only
near-dups emit).

Scale posture (100 TB / continuous):
- State is sharded by band bucket — the natural LSH partitioning; no
  per-doc state, no global structure. **RocksDB is the corpus-scale
  default store for W9, and since round 11 it actually IS the
  default**: without a TTL, state is ~4 rows/doc (measured 247 MB at
  50k docs, SCALING_R9; 2.38 GB at 500k, SCALING_R10), which belongs
  on executor-local SSD with bounded block-cache memory, not on-heap —
  so the no-TTL builders call
  `session.auto_rocksdb_for_unbounded_state` themselves (explicit
  provider settings and SPARK_GRAFT_ROCKSDB_AUTO=0 opt out).
  `tests/test_streaming_rocksdb.py` runs the DEFAULT path live with
  the provider's rocksdb* metrics asserted; the round-10 decade probe
  (SCALING_R10) measures the provider delta end-to-end.
- FIFO cap per bucket (`max_bucket_state`) bounds the hot-boilerplate
  bucket exactly like `cap_hot_buckets` does in batch; state TTL
  (`ttl_ms`, ProcessingTimeTimeout) turns the operator into
  dedup-within-a-horizon, the same contract as
  `dropDuplicatesWithinWatermark` — both caps are the documented recall
  trade-off, not accidents. In-horizon parity is pinned
  (tests/test_streaming_dedup.py::test_ttl_in_horizon_parity: a TTL
  longer than the replay emits EXACTLY the no-TTL output) and the
  decade probe shows the state plateau when epochs outlive the TTL.
- TTL DEPLOYMENT CAVEAT (measured, SCALING_R10): `ttl_ms` requires a
  processingTime-trigger deployment. Under Trigger.AvailableNow (or
  Once) a query with ProcessingTimeTimeout NEVER terminates — Spark's
  should-run-another-batch check treats processing-time timers as
  always-pending work, so the query keeps scheduling ~2 batches/s
  forever even after every group is evicted (measured: batch 89+ at 0
  state rows). Catch-up/backfill runs must therefore pass
  ttl_ms=None and rely on the FIFO cap; the horizon only makes sense
  on a live cadence anyway.
- Signature agreement (fraction of the K coordinates equal) is the
  standard unbiased Jaccard estimator, so `sim_thr=0.5` ~ Jaccard 0.5.

Reference parity: none (the reference relay has no corpus surface);
streaming counterpart of SURVEY §2b Q26. Replay-tested (no SQL oracle —
arrival order defines dup_of, which a set-based oracle can't express).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesyslog_spark.operators.text import lsh_band_keys

SIG_K = 12
BANDS = 4
ROWS = 3
SIM_THR = 0.5           # fraction of SIG_K coordinates agreeing
MAX_BUCKET_STATE = 64   # FIFO cap per band bucket
SHINGLE_N = 3

BANDED_SCHEMA = "doc_id long, sig string, band_idx int, band_key string"
MATCH_SCHEMA = "doc_id long, dup_of long, est_sim double"
_STATE_SCHEMA = "ids array<long>, sigs array<string>"


def _sig_coords_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas: (doc_id, text) -> (doc_id, mh array<string>[SIG_K]).

    BIT-IDENTICAL to the Catalyst `minhash_signature` convention
    (min over word-3-shingles of md5('<i>:' || shingle); tokens =
    lowercase [a-z0-9]+ runs) — pinned by the hashlib replay in
    tests/test_streaming_dedup.py. It exists because the Catalyst
    higher-order-function form runs INTERPRETED at ~23 ms/doc, which
    the round-9 streaming decade probe measured as W9's actual
    bottleneck (a 5k-doc micro-batch spent ~120 s here, dwarfing the
    state stage everyone suspected); hashlib in an Arrow batch does
    the same integers at ~0.4 ms/doc."""
    import hashlib
    import re

    split = re.compile(r"[^a-z0-9]+")
    for pdf in batches:
        with_ts = "ts_ms" in pdf.columns
        ids, sigs, tss = [], [], []
        ts_iter = pdf["ts_ms"] if with_ts else [None] * len(pdf)
        for did, text, ts in zip(pdf["doc_id"], pdf["text"], ts_iter):
            toks = [w for w in split.split(str(text).lower()) if w]
            if len(toks) < SHINGLE_N:
                continue
            sh = {
                " ".join(toks[i:i + SHINGLE_N])
                for i in range(len(toks) - SHINGLE_N + 1)
            }
            ids.append(int(did))
            sigs.append([
                min(
                    hashlib.md5(f"{i}:{s}".encode("utf-8")).hexdigest()
                    for s in sh
                )
                for i in range(SIG_K)
            ])
            if with_ts:
                tss.append(int(ts))
        # explicit dtypes: an empty/batch-built frame otherwise infers
        # float64 / a 2-D numpy block that Arrow can't cast to
        # list<string>
        out = {
            "doc_id": pd.Series(ids, dtype="int64"),
            "mh": pd.Series(sigs, dtype=object),
        }
        if with_ts:
            out["ts_ms"] = pd.Series(tss, dtype="int64")
        yield pd.DataFrame(out)


def banded_signatures(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      ts_col: str | None = None) -> DataFrame:
    """Stage 1 (stateless): one row per (doc, band) with the full
    signature along for the stateful verify. Works on batch and
    streaming frames alike. Signatures come from the Arrow-batched
    kernel above; band keys stay Catalyst (same md5-over-row-slice
    convention as the batch LSH family).

    With `ts_col`, each row also carries (ts_ms long, ts_event
    timestamp) — the event-time columns the watermark-driven TTL
    layout needs (streaming_neardup_event_ttl)."""
    cols = [F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")]
    if ts_col is not None:
        cols.append(
            F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms")
        )
    schema = "doc_id long, mh array<string>"
    if ts_col is not None:
        schema += ", ts_ms long"
    mh = [F.col("mh")[i] for i in range(SIG_K)]
    out_cols = [
        "doc_id",
        F.concat_ws("|", *mh).alias("sig"),
        F.explode(lsh_band_keys(mh, BANDS, ROWS)).alias("b"),
    ] + (["ts_ms"] if ts_col is not None else [])
    sel = ["doc_id", "sig", F.col("b.band_idx").alias("band_idx"),
           F.col("b.band_key").alias("band_key")]
    if ts_col is not None:
        sel += ["ts_ms", F.timestamp_millis(F.col("ts_ms")).alias("ts_event")]
    return docs.select(*cols).mapInPandas(
        _sig_coords_batches, schema=schema
    ).select(*out_cols).select(*sel)


def _agreement(a: str, b: str) -> float:
    xs, ys = a.split("|"), b.split("|")
    return sum(x == y for x, y in zip(xs, ys)) / float(len(xs))


def make_bucket_fn(sim_thr: float = SIM_THR,
                   max_bucket_state: int = MAX_BUCKET_STATE,
                   ttl_ms: int | None = None,
                   event_time: bool = False):
    """applyInPandasWithState body for stage 2, keyed by
    (band_idx, band_key).

    With `event_time=True` the TTL horizon is WATERMARK-driven
    (GroupStateTimeout.EventTimeTimeout): the bucket expires when the
    stream's watermark passes last-activity + ttl_ms. Unlike the
    processing-time form — which Spark never fires under
    Trigger.AvailableNow (confirmed on W9-TTL r10 and W19 r11) — this
    variant's eviction is driven by the DATA, so the deterministic
    replay harness can exercise it (tests/test_streaming_event_ttl.py).
    Rows carry ts_ms (banded_signatures ts_col)."""

    def bucket_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Horizon expiry: forget the bucket (dedup-within-a-horizon).
            state.remove()
            yield pd.DataFrame(columns=["doc_id", "dup_of", "est_sim"])
            return

        ids: list[int]
        sigs: list[str]
        ids, sigs = ([list(x) for x in state.get] if state.exists
                     else ([], []))
        out = []
        # Concat the iterator's Arrow chunks and sort ONCE in doc_id
        # order: deterministic dup_of for same-batch collisions
        # regardless of Arrow batch slicing — a bucket whose batch rows
        # span chunks must not process a higher doc_id before a lower
        # one (the coarse layout sorts globally; both layouts share
        # this one order so their outputs stay an identical multiset).
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            allr = pd.concat(frames) if len(frames) > 1 else frames[0]
            for row in allr.sort_values("doc_id").itertuples(index=False):
                did, sig = int(row.doc_id), str(row.sig)
                for prev_id, prev_sig in zip(ids, sigs):
                    if prev_id == did:
                        continue
                    est = _agreement(sig, prev_sig)
                    if est >= sim_thr:
                        out.append({"doc_id": did, "dup_of": prev_id,
                                    "est_sim": round(est, 4)})
                ids.append(did)
                sigs.append(sig)
        if len(ids) > max_bucket_state:  # FIFO: keep the newest members
            ids, sigs = ids[-max_bucket_state:], sigs[-max_bucket_state:]
        state.update((ids, sigs))
        if ttl_ms is not None and event_time:
            # expire when the watermark passes last-activity + ttl; the
            # timestamp must stay ahead of the current watermark (late
            # stragglers must not set a timeout already in the past)
            last_ts = int(allr["ts_ms"].max()) if frames else 0
            wm = int(state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(max(last_ts + ttl_ms, wm + 1))
        elif ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield (pd.DataFrame(out, columns=["doc_id", "dup_of", "est_sim"])
               if out else
               pd.DataFrame(columns=["doc_id", "dup_of", "est_sim"]))

    return bucket_fn


def streaming_neardup(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      sim_thr: float = SIM_THR,
                      max_bucket_state: int = MAX_BUCKET_STATE,
                      ttl_ms: int | None = None,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """Continuous near-dup candidates over a (streaming) document frame.

    Returns (doc_id, dup_of, est_sim) rows, possibly repeated across
    bands; `min(dup_of)` per doc_id is the canonical representative.

    Without a TTL horizon state is corpus-linear (~4 rows/doc), so the
    RocksDB store is auto-enabled for the session unless the caller
    pinned a provider or `checkpoint_dir` already holds prior-run state
    (session.auto_rocksdb_for_unbounded_state)."""
    if ttl_ms is None:
        from kinesyslog_spark.session import auto_rocksdb_for_unbounded_state

        auto_rocksdb_for_unbounded_state(docs.sparkSession, checkpoint_dir)
    banded = banded_signatures(docs, text_col, id_col)
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return banded.groupBy("band_idx", "band_key").applyInPandasWithState(
        make_bucket_fn(sim_thr, max_bucket_state, ttl_ms),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_neardup_event_ttl(docs: DataFrame, ts_col: str,
                                ttl_ms: int,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                sim_thr: float = SIM_THR,
                                max_bucket_state: int = MAX_BUCKET_STATE,
                                watermark_delay: str = "0 seconds",
                                ) -> DataFrame:
    """streaming_neardup with a WATERMARK-driven dedup horizon: a band
    bucket is forgotten once the stream's event-time watermark passes
    its last activity + ttl_ms.

    This exists because ProcessingTimeTimeout is availableNow-
    incompatible (never fires — W9-TTL r10, W19 r11), which made TTL
    eviction untestable under deterministic replay and made the horizon
    wall-clock-relative rather than data-relative. The event-time form
    keys eviction to the DATA: replay of a recorded stream evicts at
    the same points every run, and a backfill running 100x real time
    expires exactly the horizons the live run would. State bound is
    max_bucket_state per bucket active within the horizon. In-order
    arrival gives monotone timeouts; late stragglers within the
    watermark delay extend the horizon, stragglers beyond it re-open a
    fresh bucket (the documented at-least-once trade-off, same class
    as the FIFO cap)."""
    banded = banded_signatures(docs, text_col, id_col, ts_col=ts_col)
    banded = banded.withWatermark("ts_event", watermark_delay)
    return banded.groupBy("band_idx", "band_key").applyInPandasWithState(
        make_bucket_fn(sim_thr, max_bucket_state, ttl_ms, event_time=True),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Coarse-group state layout — W9's scale shape (SCALING_R9)
# ---------------------------------------------------------------------------
# The round-9 streaming decade probe measured W9's per-epoch cost at
# ~35 ms/doc, FLAT across epochs from the first — not state pressure
# but per-key dispatch: `applyInPandasWithState` pays ~3 ms of Arrow
# grouped-map overhead per state key, and LSH band keys are
# high-entropy by design (~40k near-singleton groups per 5k-doc epoch
# at sf1 -> ~120 s of pure dispatch). This is the same pathology q124's
# batch kernel solved with coarse groups + an in-kernel bucket loop;
# the state twin of that trick keys state by pmod(hash(bucket), G) and
# holds the coarse group's buckets as one state value (parallel
# member arrays tagged by bucket key). Semantics are pinned equal to
# the per-bucket layout by tests/test_streaming_dedup.py (identical
# output multiset, same FIFO cap per LOGICAL bucket) with ONE
# documented difference: ttl_ms expires a coarse GROUP after it goes
# idle, not each bucket individually — a coarse horizon (any activity
# in the group refreshes its neighbors-in-group). Measured at sf1
# (SCALING_R9): 174 -> 15.5 s/epoch.

COARSE_GROUPS = 1024
_COARSE_STATE_SCHEMA = (
    "bks array<string>, ids array<long>, sigs array<string>, "
    "tss array<long>"
)


def make_coarse_bucket_fn(sim_thr: float = SIM_THR,
                          max_bucket_state: int = MAX_BUCKET_STATE,
                          ttl_ms: int | None = None,
                          event_time: bool = False):
    """applyInPandasWithState body keyed by the coarse group id; state
    holds every bucket of the group as aligned member arrays.

    With `event_time=True` (rows carry ts_ms) the TTL horizon is
    per-MEMBER and watermark-driven: a member expires once its own
    event time + ttl falls behind the watermark — pruned on access, so
    the horizon is exact per member even though any arrival refreshes
    the coarse GROUP (a group timeout alone can never fire under
    traffic — the W34 lesson); the group timeout is just idle-group GC.
    The processing-time form keeps its documented coarse granularity."""

    def coarse_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["doc_id", "dup_of", "est_sim"])
            return

        from collections import defaultdict

        wm = (int(state.getCurrentWatermarkMs())
              if ttl_ms is not None and event_time else 0)
        buckets: dict[str, list] = defaultdict(list)
        if state.exists:
            st = state.get
            bks, ids, sigs = st[0], st[1], st[2]
            tss = st[3] if len(st) > 3 else [0] * len(bks)
            for b, i, s, t in zip(bks, ids, sigs, tss):
                if event_time and ttl_ms is not None and \
                        int(t) + ttl_ms < wm:
                    continue
                buckets[b].append((int(i), str(s), int(t)))
        out = []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            allr = pd.concat(frames) if len(frames) > 1 else frames[0]
            # Same per-bucket doc_id order as the per-key layout:
            # deterministic dup_of for same-batch collisions.
            allr = allr.sort_values(["band_idx", "band_key", "doc_id"])
            with_ts = "ts_ms" in allr.columns
            for row in allr.itertuples(index=False):
                bk = f"{int(row.band_idx)}|{row.band_key}"
                did, sig = int(row.doc_id), str(row.sig)
                ts = int(row.ts_ms) if with_ts else 0
                mem = buckets[bk]
                for prev_id, prev_sig, _pts in mem:
                    if prev_id == did:
                        continue
                    est = _agreement(sig, prev_sig)
                    if est >= sim_thr:
                        out.append({"doc_id": did, "dup_of": prev_id,
                                    "est_sim": round(est, 4)})
                mem.append((did, sig, ts))
        # FIFO cap per LOGICAL bucket, applied in the state-serialization
        # pass — NOT inside the row loop: the per-key layout compares
        # every same-batch arrival against ALL members appended so far
        # and trims only at end-of-batch, so an in-loop trim here would
        # evict members mid-batch and miss pairs the per-key layout
        # emits (the documented contract is an identical output
        # multiset; ttl_ms granularity is the only difference).
        n_bks, n_ids, n_sigs, n_tss = [], [], [], []
        for bk, mem in buckets.items():
            for i, s, t in mem[-max_bucket_state:]:
                n_bks.append(bk)
                n_ids.append(i)
                n_sigs.append(s)
                n_tss.append(t)
        state.update((n_bks, n_ids, n_sigs, n_tss))
        if ttl_ms is not None and event_time:
            # idle-group GC: fires only once every member is expired
            state.setTimeoutTimestamp(
                max(max(n_tss, default=0) + ttl_ms, wm + 1)
            )
        elif ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield (pd.DataFrame(out, columns=["doc_id", "dup_of", "est_sim"])
               if out else
               pd.DataFrame(columns=["doc_id", "dup_of", "est_sim"]))

    return coarse_fn


def streaming_neardup_coarse(docs: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             sim_thr: float = SIM_THR,
                             max_bucket_state: int = MAX_BUCKET_STATE,
                             ttl_ms: int | None = None,
                             groups: int = COARSE_GROUPS,
                             checkpoint_dir: str | None = None) -> DataFrame:
    """streaming_neardup with the coarse-group state layout: identical
    candidate output, ~G state keys instead of one per LSH bucket."""
    if ttl_ms is None:
        from kinesyslog_spark.session import auto_rocksdb_for_unbounded_state

        auto_rocksdb_for_unbounded_state(docs.sparkSession, checkpoint_dir)
    banded = banded_signatures(docs, text_col, id_col).withColumn(
        "gid",
        F.pmod(F.hash("band_idx", "band_key"), F.lit(groups)).cast("int"),
    )
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return banded.groupBy("gid").applyInPandasWithState(
        make_coarse_bucket_fn(sim_thr, max_bucket_state, ttl_ms),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_COARSE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_neardup_coarse_event_ttl(docs: DataFrame, ts_col: str,
                                       ttl_ms: int,
                                       text_col: str = "text",
                                       id_col: str = "doc_id",
                                       sim_thr: float = SIM_THR,
                                       max_bucket_state: int = MAX_BUCKET_STATE,
                                       groups: int = COARSE_GROUPS,
                                       watermark_delay: str = "0 seconds",
                                       ) -> DataFrame:
    """The coarse-group layout with a watermark-driven PER-MEMBER
    horizon: unlike the processing-time coarse TTL (group-granular —
    any activity in the group refreshes its neighbors-in-group), a
    member here expires exactly when the watermark passes its own
    event time + ttl, regardless of group traffic. Replay evicts
    deterministically (the W9/W34 event-TTL contract) at the coarse
    layout's dispatch cost."""
    banded = banded_signatures(docs, text_col, id_col, ts_col=ts_col)
    banded = banded.withColumn(
        "gid",
        F.pmod(F.hash("band_idx", "band_key"), F.lit(groups)).cast("int"),
    ).withWatermark("ts_event", watermark_delay)
    return banded.groupBy("gid").applyInPandasWithState(
        make_coarse_bucket_fn(sim_thr, max_bucket_state, ttl_ms,
                              event_time=True),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_COARSE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
