"""W14 — continuous heavy-hitter detection over a token stream.

The streaming twin of q79 (exact heavy hitters via Misra-Gries
candidates + broadcast verify): a corpus/telemetry pipeline watches the
live token frequency distribution and wants an alert the moment a term
becomes heavy (vocabulary drift, template floods, scraper loops), not a
nightly batch answer.

Algorithm: SPACE-SAVING (Metwally/Agrawal/El Abbadi, ICDT'05) — the
bounded-memory summary with the one-sided guarantee
`count <= est_count <= count + err`. Per entry the summary keeps
(est_count, err); when full, the minimum entry is evicted and the new
token inherits its count as error.

Shape:
1. stateless, JVM-side: tokenize (`operators/text.tokens`, the engine's
   canonical tokenizer) -> explode -> shard = pmod(xxhash64(token),
   n_shards). A token ALWAYS lands in its shard, so per-shard summaries
   never need merging and the union of shard outputs is the global
   answer (the same token-sharding q79's batch verify joins on).
2. stateful, keyed by shard: `applyInPandasWithState` holds the shard's
   Space-Saving summary; when a token's `est_count` first reaches
   `min_count`, one (token, est_count, err, stream_len) alert row is
   emitted (append-mode friendly: each heavy hitter is reported exactly
   once, at crossing time).

Scale posture (100 TB / continuous):
- State per shard is O(capacity) regardless of stream length or
  vocabulary size; shards spread the update load across executors.
- The `reported` set is FIFO-capped at 4x capacity — over an unbounded
  stream, absolute-threshold crossers are unbounded, so the cap is the
  documented re-alert trade-off (an evicted-then-re-crossing token may
  re-alert), mirroring W9's bucket cap.
- Exactness: any token with true count >= stream_len/capacity is
  guaranteed present in the summary (Space-Saving property), so with
  min_count >= stream_len/capacity there are no false negatives;
  `err` bounds the overestimate for consumers that want to verify.

Reference parity: none (the reference relay has no frequency surface);
streaming counterpart of SURVEY §2b q79. Replay-tested (no SQL oracle —
alert timing depends on arrival order, which a set-based oracle can't
express).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesyslog_spark.operators.text import tokens

N_SHARDS = 8
CAPACITY = 256          # summary entries per shard
MIN_COUNT = 50          # absolute alert threshold
REPORTED_CAP = 4 * CAPACITY

ALERT_SCHEMA = "token string, est_count long, err long, stream_len long"
_STATE_SCHEMA = (
    "toks array<string>, counts array<long>, errs array<long>, "
    "reported array<string>, slen long"
)


def sharded_tokens(docs: DataFrame, text_col: str = "text",
                   n_shards: int = N_SHARDS) -> DataFrame:
    """Stage 1 (stateless): one row per token occurrence with its stable
    shard id. Batch and streaming frames alike."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .select("token", F.pmod(F.xxhash64("token"), n_shards).alias("shard"))
    )


def make_heavy_fn(capacity: int = CAPACITY, min_count: int = MIN_COUNT,
                  reported_cap: int = REPORTED_CAP,
                  ttl_ms: int | None = None):
    """applyInPandasWithState body for stage 2, keyed by shard."""

    def heavy_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cols = ["token", "est_count", "err", "stream_len"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=cols)
            return

        if state.exists:
            toks_l, counts, errs, reported, slen = state.get
            summary = {
                t: [int(c), int(e)]
                for t, c, e in zip(toks_l, counts, errs)
            }
            reported = list(reported)
            slen = int(slen)
        else:
            summary, reported, slen = {}, [], 0

        out = []
        reported_set = set(reported)
        for pdf in pdfs:
            for tok in pdf["token"]:
                tok = str(tok)
                slen += 1
                if tok in summary:
                    summary[tok][0] += 1
                elif len(summary) < capacity:
                    summary[tok] = [1, 0]
                else:
                    # Evict the minimum entry; the newcomer inherits its
                    # count as one-sided error (Space-Saving rule).
                    evict = min(summary.items(), key=lambda kv: kv[1][0])
                    mcount = evict[1][0]
                    del summary[evict[0]]
                    summary[tok] = [mcount + 1, mcount]
                ent = summary[tok]
                if ent[0] >= min_count and tok not in reported_set:
                    reported_set.add(tok)
                    reported.append(tok)
                    out.append(
                        {"token": tok, "est_count": ent[0],
                         "err": ent[1], "stream_len": slen}
                    )
        if len(reported) > reported_cap:  # FIFO (documented re-alert cap)
            dropped = reported[:-reported_cap]
            reported = reported[-reported_cap:]
            reported_set.difference_update(dropped)

        items = list(summary.items())
        state.update((
            [t for t, _ in items],
            [v[0] for _, v in items],
            [v[1] for _, v in items],
            reported,
            slen,
        ))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield (pd.DataFrame(out, columns=cols) if out
               else pd.DataFrame(columns=cols))

    return heavy_fn


def streaming_heavy_hitters(docs: DataFrame, text_col: str = "text",
                            n_shards: int = N_SHARDS,
                            capacity: int = CAPACITY,
                            min_count: int = MIN_COUNT,
                            ttl_ms: int | None = None) -> DataFrame:
    """Continuous heavy-hitter alerts over a (streaming) document frame.

    Returns one (token, est_count, err, stream_len) row per token, at
    the moment its Space-Saving estimate first reaches `min_count`;
    `stream_len` is the shard-local stream length at crossing time."""
    sharded = sharded_tokens(docs, text_col, n_shards)
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return sharded.groupBy("shard").applyInPandasWithState(
        make_heavy_fn(capacity, min_count, ttl_ms=ttl_ms),
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
