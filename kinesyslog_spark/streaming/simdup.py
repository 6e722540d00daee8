"""W34 — continuous SimHash near-dup over the combo-keyed blocking
(the streaming twin of q27, frozen-artifact pattern).

Round 11 made the rebuilt SimHash family the text near-dup strategy
that scales (distinct-fp collapse + bias-balanced snake blocks +
C(10,6) generalized pigeonhole); this module gives it the continuous
form MinHash (W9) and images (W20/W33) already have.

Design, mapped from the batch build:

- The snake-block assignment is CORPUS-TRAINED (bit-bias ranks), so a
  stream must not re-derive it per micro-batch — drifted blocks would
  stop matching the block values stored in state (the W33 frozen-
  artifact rule). `frozen_simhash_artifacts` trains blocks once on a
  reference corpus snapshot with the SAME ranking code as the batch
  build (queries.dedup.snake_blocks_for) and they broadcast as a tiny
  (64-int) artifact.
- Stage 1 (stateless, Arrow): tokens -> sha256 per token -> 64-bit
  +-1-sum fingerprint -> hi/lo int halves -> 10 block values -> one
  row per C(10,6) combo with ckey = base-128-packed block values.
  BIT-IDENTICAL to the Catalyst `simhash_df` + `_block_int_cols` +
  `combo_keyed` chain (pinned by replay against batch q27); hashlib in
  an Arrow batch for the same reason as W9's kernel (the interpreted
  HOF path was W9's measured bottleneck, SCALING_R9).
- Stage 2 (stateful): the COARSE-group layout from the start — combo
  keys are even higher-entropy than W9's band keys (210 rows/doc,
  near-singleton buckets), exactly the per-key Arrow-dispatch
  pathology the coarse layout exists for. State per group: aligned
  member arrays (bucket key, doc_id, hi, lo) per LOGICAL (cid, ckey)
  bucket, FIFO-capped per bucket.
- The distinct-fp collapse maps to IDEMPOTENT state: an arrival whose
  fingerprint already sits in the bucket emits (doc, rep, 0) and is
  NOT appended — boilerplate never grows the bucket (the batch
  build's "identical fps never enter the blocking quadratic"), and
  re-delivered docs (at-least-once replay) leave state unchanged.

Output: (doc_id, dup_of, hamming), possibly repeated across combos;
`min(dup_of)` per doc_id is the canonical representative. For in-order
arrival (ascending doc_id) the distinct unordered pair set equals
batch q27's pairs with each exact-fp group contributing its
rep-centered star instead of all C(m,2) members — pinned by
tests/test_streaming_simdup.py.

No TTL -> corpus-linear state -> RocksDB auto-enabled unless the
caller pinned a provider or resumes an existing checkpoint
(session.auto_rocksdb_for_unbounded_state).

Reference parity: none (no corpus surface in the reference); streaming
counterpart of SURVEY §2b q27. Round-12 verdict task #6.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesyslog_spark.env import env_int
from kinesyslog_spark.queries.dedup import (
    HAMMING_THR,
    SIMHASH_BITS,
    SIMHASH_COMBO_CLEAN,
    _simhash_combos,
)

__all__ = [
    "frozen_simhash_artifacts",
    "simhash_combo_batches",
    "streaming_simdup",
]

MAX_BUCKET_STATE = 64
# Coarse-group count: dispatch cost ~ groups x 3 ms/epoch, state-write
# amplification ~ total-state/groups per touched group — raise it on
# wide clusters (more executors want more concurrent groups anyway).
COARSE_GROUPS = env_int("SPARK_GRAFT_W34_GROUPS", 1024)

BANDED_SCHEMA = "doc_id long, hi long, lo long, cid int, ckey long"
MATCH_SCHEMA = "doc_id long, dup_of long, hamming int"
_COARSE_STATE_SCHEMA = (
    "bks array<string>, ids array<long>, his array<long>, "
    "los array<long>, tss array<long>"
)


def frozen_simhash_artifacts(spark: SparkSession, ref_sf_dir: str) -> dict:
    """Train the block assignment on a reference corpus snapshot.

    Returns {"blocks": list[list[int]] (10 sorted 1-based bit lists),
    "combos": list[tuple] (the C(10,6) combination table)} — a few
    hundred ints; `streaming_simdup` broadcasts it. Uses the batch
    build's own distinct-fp frame and ranking code, so a stream served
    with this artifact blocks EXACTLY like batch q27 on the reference
    corpus."""
    from kinesyslog_spark.queries.dedup import (
        hot_simhash_groups,
        snake_blocks_for,
    )

    grp, _blk = hot_simhash_groups(spark, ref_sf_dir)
    return {"blocks": snake_blocks_for(grp), "combos": _simhash_combos()}


def simhash_combo_batches(artifacts):
    """mapInPandas kernel: (doc_id, text) -> one row per combo key.

    Fingerprint convention pinned to operators.text.simhash_df: tokens
    are lowercase [a-z0-9]+ runs (multiset), bit j of a token is 1 iff
    hex digit j of sha256(token) is in [8-f], fingerprint bit j = sign
    of the +-1 sum (> 0). Block value = block's bits MSB-first in
    ascending-j order; ckey packs the combo's 6 block values base-128
    (every block <= 7 bits wide)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import re

        art = artifacts.value if hasattr(artifacts, "value") else artifacts
        blocks = art["blocks"]
        combos = art["combos"]
        k = SIMHASH_COMBO_CLEAN
        split = re.compile(r"[^a-z0-9]+")
        high = set("89abcdef")
        for pdf in batches:
            with_ts = "ts_ms" in pdf.columns
            ts_iter = pdf["ts_ms"] if with_ts else [None] * len(pdf)
            ids, his, los, cids, ckeys, tss = [], [], [], [], [], []
            for did, text, ts in zip(pdf["doc_id"], pdf["text"], ts_iter):
                toks = [w for w in split.split(str(text).lower()) if w]
                if not toks:
                    continue
                scores = [0] * SIMHASH_BITS
                for t in toks:
                    h = hashlib.sha256(t.encode("utf-8")).hexdigest()
                    for j in range(SIMHASH_BITS):
                        scores[j] += 1 if h[j] in high else -1
                fp = [1 if s > 0 else 0 for s in scores]
                hi = int("".join(map(str, fp[:32])), 2)
                lo = int("".join(map(str, fp[32:])), 2)
                bvals = [
                    int("".join(str(fp[j - 1]) for j in bs), 2)
                    for bs in blocks
                ]
                for cid, combo in enumerate(combos):
                    ck = 0
                    for t, bi in enumerate(combo):
                        ck += bvals[bi] * (128 ** (k - 1 - t))
                    ids.append(int(did))
                    his.append(hi)
                    los.append(lo)
                    cids.append(cid)
                    ckeys.append(ck)
                    if with_ts:
                        tss.append(int(ts))
            out = {
                "doc_id": pd.Series(ids, dtype="int64"),
                "hi": pd.Series(his, dtype="int64"),
                "lo": pd.Series(los, dtype="int64"),
                "cid": pd.Series(cids, dtype="int32"),
                "ckey": pd.Series(ckeys, dtype="int64"),
            }
            if with_ts:
                out["ts_ms"] = pd.Series(tss, dtype="int64")
            yield pd.DataFrame(out)

    return kernel


def make_simdup_coarse_fn(ham_t: int = HAMMING_THR,
                          max_bucket_state: int = MAX_BUCKET_STATE,
                          ttl_ms: int | None = None):
    """applyInPandasWithState body keyed by the coarse group id; state
    holds every (cid, ckey) bucket of the group as aligned member
    arrays of DISTINCT fingerprints.

    With `ttl_ms` (EventTimeTimeout + ts_ms rows): the GROUP is
    forgotten once the watermark passes its last activity + ttl — the
    dedup-within-a-horizon posture that keeps state (and the coarse
    layout's per-epoch state-store write volume, which is O(total
    state) because every touched group's arrays rewrite) bounded by
    the horizon instead of the corpus. Coarse granularity, the W9
    coarse trade: any activity in the group refreshes its
    neighbors-in-group."""

    def coarse_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from collections import defaultdict

        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["doc_id", "dup_of", "hamming"])
            return

        # per-MEMBER horizon pruning on access: the group timeout alone
        # cannot express the horizon — with G coarse groups any traffic
        # refreshes ~all of them, so a bucket would never expire while
        # the stream flows. A member is in-horizon iff its OWN event
        # time + ttl is ahead of the current watermark; expired members
        # are dropped here (deterministically — the watermark is data-
        # driven), and the group timeout below is just idle-group GC.
        wm = int(state.getCurrentWatermarkMs()) if ttl_ms is not None else 0
        buckets: dict[str, list] = defaultdict(list)
        if state.exists:
            bks, ids, his, los, tss = state.get
            for b, i, h, l, t in zip(bks, ids, his, los, tss):
                if ttl_ms is not None and int(t) + ttl_ms < wm:
                    continue
                buckets[b].append((int(i), int(h), int(l), int(t)))
        out = []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            allr = pd.concat(frames) if len(frames) > 1 else frames[0]
            # per-bucket doc_id order: deterministic dup_of for
            # same-batch collisions regardless of Arrow chunking
            allr = allr.sort_values(["cid", "ckey", "doc_id"])
            with_ts = "ts_ms" in allr.columns
            for row in allr.itertuples(index=False):
                bk = f"{int(row.cid)}|{int(row.ckey)}"
                did, hi, lo = int(row.doc_id), int(row.hi), int(row.lo)
                ts = int(row.ts_ms) if with_ts else 0
                mem = buckets[bk]
                redelivered = any(m[0] == did for m in mem)
                # distinct-fp collapse: an exact duplicate pairs ONLY
                # with the bucket's first-seen copy (its near-dup
                # relations are implied through that rep — the batch
                # build's rep-star contract) and never grows the bucket
                exact_rep = next(
                    (m[0] for m in mem
                     if m[0] != did and m[1] == hi and m[2] == lo),
                    None,
                )
                if exact_rep is not None:
                    out.append({"doc_id": did, "dup_of": exact_rep,
                                "hamming": 0})
                    continue
                for pid, phi, plo, _pts in mem:
                    if pid == did:
                        continue
                    ham = ((hi ^ phi).bit_count()
                           + (lo ^ plo).bit_count())
                    if ham <= ham_t:
                        out.append({"doc_id": did, "dup_of": pid,
                                    "hamming": ham})
                if not redelivered:
                    mem.append((did, hi, lo, ts))
        # FIFO cap per LOGICAL bucket at state-serialization time (the
        # W9 coarse layout's contract: in-batch arrivals compare
        # against every member appended so far)
        n_bks, n_ids, n_his, n_los, n_tss = [], [], [], [], []
        for bk, mem in buckets.items():
            for i, h, l, t in mem[-max_bucket_state:]:
                n_bks.append(bk)
                n_ids.append(i)
                n_his.append(h)
                n_los.append(l)
                n_tss.append(t)
        state.update((n_bks, n_ids, n_his, n_los, n_tss))
        if ttl_ms is not None:
            # idle-group GC: when this fires (no data for the group
            # since), every member's ts + ttl <= the watermark, so
            # removal loses nothing
            last_ts = max(n_tss, default=0)
            state.setTimeoutTimestamp(max(last_ts + ttl_ms, wm + 1))
        yield (pd.DataFrame(out, columns=["doc_id", "dup_of", "hamming"])
               if out else
               pd.DataFrame(columns=["doc_id", "dup_of", "hamming"]))

    return coarse_fn


def streaming_simdup(docs: DataFrame, artifacts,
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     ham_t: int = HAMMING_THR,
                     max_bucket_state: int = MAX_BUCKET_STATE,
                     groups: int = COARSE_GROUPS,
                     ttl_ms: int | None = None,
                     ts_col: str | None = None,
                     watermark_delay: str = "0 seconds",
                     checkpoint_dir: str | None = None) -> DataFrame:
    """Continuous SimHash near-dup candidates over a (streaming)
    document frame under a frozen block assignment. Returns
    (doc_id, dup_of, hamming); `min(dup_of)` per doc_id is canonical.

    Unbounded (ttl_ms=None): the exact streaming twin of batch q27 —
    state is corpus-linear and, because the coarse layout rewrites a
    touched group's arrays wholesale, per-epoch state-store writes are
    O(total state) (measured growing at the sf1 decade probe). That is
    the honest cost of an UNBOUNDED dedup horizon under today's state
    API (transformWithState's ListState appends are the gated fix).
    The production posture at corpus scale is the event-time horizon:
    pass ttl_ms + ts_col and state (and per-epoch writes) stay bounded
    by the horizon — dedup-within-a-horizon, watermark-driven, so
    replay evicts deterministically (the W9 event-TTL pattern)."""
    if ttl_ms is None:
        from kinesyslog_spark.session import (
            auto_rocksdb_for_unbounded_state,
        )

        auto_rocksdb_for_unbounded_state(docs.sparkSession, checkpoint_dir)
    if not hasattr(artifacts, "value"):  # ship once per executor
        artifacts = docs.sparkSession.sparkContext.broadcast(artifacts)
    cols = [F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")]
    schema = BANDED_SCHEMA
    if ttl_ms is not None:
        if ts_col is None:
            raise ValueError("ttl_ms requires ts_col (event-time TTL)")
        cols.append(
            F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms")
        )
        schema += ", ts_ms long"
    banded = docs.select(*cols).mapInPandas(
        simhash_combo_batches(artifacts), schema=schema
    ).withColumn(
        "gid", F.pmod(F.hash("cid", "ckey"), F.lit(groups)).cast("int")
    )
    if ttl_ms is not None:
        banded = banded.withColumn(
            "ts_event", F.timestamp_millis(F.col("ts_ms"))
        ).withWatermark("ts_event", watermark_delay)
    return banded.groupBy("gid").applyInPandasWithState(
        make_simdup_coarse_fn(ham_t, max_bucket_state, ttl_ms),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_COARSE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(GroupStateTimeout.EventTimeTimeout
                     if ttl_ms is not None
                     else GroupStateTimeout.NoTimeout),
    )
