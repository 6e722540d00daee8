"""Per-key top-k with the scale-safe plan — which, on Spark 4, is the
PLAIN ranking window: the planner rewrites `row_number() OVER
(PARTITION BY key ORDER BY ...) <= k` into a WindowGroupLimit
Partial/Final pair, i.e. each input partition keeps at most k rows per
key BEFORE the exchange and only those survivors shuffle. That is
exactly the hand-rolled "two-phase top-k" pattern — built in.

This module exists to make that a pinned, named fact rather than
folklore: an earlier hand-rolled two-phase form (rank within
`spark_partition_id()` first, then globally) measured STRICTLY WORSE —
the phase-1 window forced its own `Exchange hashpartitioning(pid,
key)`, so the data shuffled twice. The executed-plan assertion in
tests/test_topk.py::test_partial_group_limit_in_plan keeps the
built-in rewrite from regressing silently (it requires the filter on
the rank column to be present and foldable to a group limit).

Callers: the ANN family's probe-ranking joins (q21/q105/q106).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def topk_per_key(
    df: DataFrame, key: str, order: list[Column], k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Rows ranked 1..k per `key` under `order` (must be a deterministic
    total order — include a unique tiebreak column). Adds `rank_col`."""
    w = W.partitionBy(key).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
