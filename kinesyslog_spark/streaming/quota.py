"""W17 — continuous per-source token-quota admission control.

The streaming enforcement half of q110's budgeted mixture: q110 plans a
token budget per source; this operator ENFORCES it on a live document
stream — every arriving document is admitted or rejected the moment it
lands, against a running per-source token counter that survives across
micro-batches (and restarts, via the checkpoint). The ingestion-side
quota/rate-limit shape every multi-tenant corpus pipeline needs: no
source can flood the mix past its allocation.

Shape (the W9/W14 two-stage pattern):
1. stateless, JVM-side: tokenize (`operators/text.tokens`) -> per-doc
   token count, keyed by `source`.
2. stateful, keyed by source: `applyInPandasWithState` holds one LONG
   (tokens used); docs are processed in (doc_id) order within a batch
   for determinism, admitted while `used + n_tokens <= budget`, and
   emitted with an admitted flag either way. Rejections are permanent —
   the counter never decreases (quota, not a sliding window).

Scale posture (100 TB / continuous):
- State is ONE long per source — constant regardless of stream length.
- Admission is per-batch-bounded Arrow work; the stream shuffles once
  on `source` (the state key), the same exchange any per-source
  aggregation pays. Hot sources are single-key serialized by
  definition of a strict quota — that's the semantics, not a flaw; at
  scale you shard a source only if its quota is itself sharded.

Reference parity: none (no admission-control surface in the reference);
streaming counterpart of SURVEY §2b q110's budget allocation. Replay-
tested against a pure-Python model (no SQL oracle — admission depends
on arrival order, which a set-based oracle can't express).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesyslog_spark.operators.text import tokens

DEFAULT_BUDGET = 10_000

ADMIT_SCHEMA = (
    "doc_id long, source string, n_tokens long, admitted int, used_after long"
)
_STATE_SCHEMA = "used long"


def doc_token_counts(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     source_col: str = "source") -> DataFrame:
    """Stage 1 (stateless): (doc_id, source, n_tokens) per document."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )


def make_quota_fn(budgets: dict[str, int] | None = None,
                  default_budget: int = DEFAULT_BUDGET):
    """applyInPandasWithState body for stage 2, keyed by source."""
    budgets = dict(budgets or {})

    def quota_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "source", "n_tokens", "admitted", "used_after"]
        if state.hasTimedOut:  # pragma: no cover - no TTL configured
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        source = str(key[0])
        budget = int(budgets.get(source, default_budget))
        (used,) = state.get if state.exists else (0,)
        used = int(used)
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        # doc_id order within the batch: deterministic replay/parity
        batch = batch.sort_values("doc_id")
        for _, r in batch.iterrows():
            n = int(r["n_tokens"])
            ok = used + n <= budget
            if ok:
                used += n
            rows.append(
                {"doc_id": int(r["doc_id"]), "source": source,
                 "n_tokens": n, "admitted": 1 if ok else 0,
                 "used_after": used}
            )
        state.update((used,))
        yield pd.DataFrame(rows, columns=cols)

    return quota_fn


def quota_admit(counted: DataFrame, budgets: dict[str, int] | None = None,
                default_budget: int = DEFAULT_BUDGET) -> DataFrame:
    """Stage 2 over a (streaming or batch-replayed) stage-1 frame."""
    return counted.groupBy("source").applyInPandasWithState(
        make_quota_fn(budgets, default_budget),
        outputStructType=ADMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_quota(docs: DataFrame, out_dir: str, checkpoint_dir: str,
                    budgets: dict[str, int] | None = None,
                    default_budget: int = DEFAULT_BUDGET,
                    trigger: str = "1 second") -> StreamingQuery:
    """Admit a streaming document frame continuously; decisions append
    to `out_dir` as parquet."""
    out = quota_admit(doc_token_counts(docs), budgets, default_budget)
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(processingTime=trigger)
        .start()
    )
