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
  per-doc state, no global structure. RocksDB state store holds it at
  cluster scale.
- FIFO cap per bucket (`max_bucket_state`) bounds the hot-boilerplate
  bucket exactly like `cap_hot_buckets` does in batch; state TTL
  (`ttl_ms`, ProcessingTimeTimeout) turns the operator into
  dedup-within-a-horizon, the same contract as
  `dropDuplicatesWithinWatermark` — both caps are the documented recall
  trade-off, not accidents.
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

from kinesyslog_spark.operators.text import (
    lsh_band_keys,
    minhash_signature,
    tokens,
    word_shingles,
)

SIG_K = 12
BANDS = 4
ROWS = 3
SIM_THR = 0.5           # fraction of SIG_K coordinates agreeing
MAX_BUCKET_STATE = 64   # FIFO cap per band bucket
SHINGLE_N = 3

BANDED_SCHEMA = "doc_id long, sig string, band_idx int, band_key string"
MATCH_SCHEMA = "doc_id long, dup_of long, est_sim double"
_STATE_SCHEMA = "ids array<long>, sigs array<string>"


def banded_signatures(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Stage 1 (stateless): one row per (doc, band) with the full
    signature along for the stateful verify. Works on batch and
    streaming frames alike."""
    toks = tokens(F.col(text_col))
    sig_cols = minhash_signature(word_shingles(toks, SHINGLE_N), SIG_K)
    with_sig = (
        docs.filter(F.size(tokens(F.col(text_col))) >= SHINGLE_N)
        .select(F.col(id_col).alias("doc_id"), *sig_cols)
    )
    mh = [f"mh{i}" for i in range(SIG_K)]
    return (
        with_sig.select(
            "doc_id",
            F.concat_ws("|", *mh).alias("sig"),
            F.explode(lsh_band_keys(mh, BANDS, ROWS)).alias("b"),
        )
        .select("doc_id", "sig", F.col("b.band_idx").alias("band_idx"),
                F.col("b.band_key").alias("band_key"))
    )


def _agreement(a: str, b: str) -> float:
    xs, ys = a.split("|"), b.split("|")
    return sum(x == y for x, y in zip(xs, ys)) / float(len(xs))


def make_bucket_fn(sim_thr: float = SIM_THR,
                   max_bucket_state: int = MAX_BUCKET_STATE,
                   ttl_ms: int | None = None):
    """applyInPandasWithState body for stage 2, keyed by
    (band_idx, band_key)."""

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
        for pdf in pdfs:
            # Process in doc_id order within the batch: deterministic
            # dup_of for same-batch collisions regardless of Arrow
            # batch slicing.
            for row in pdf.sort_values("doc_id").itertuples(index=False):
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
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield (pd.DataFrame(out, columns=["doc_id", "dup_of", "est_sim"])
               if out else
               pd.DataFrame(columns=["doc_id", "dup_of", "est_sim"]))

    return bucket_fn


def streaming_neardup(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      sim_thr: float = SIM_THR,
                      max_bucket_state: int = MAX_BUCKET_STATE,
                      ttl_ms: int | None = None) -> DataFrame:
    """Continuous near-dup candidates over a (streaming) document frame.

    Returns (doc_id, dup_of, est_sim) rows, possibly repeated across
    bands; `min(dup_of)` per doc_id is the canonical representative."""
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
