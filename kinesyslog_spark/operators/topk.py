"""Two-phase per-key top-k: per-partition pre-reduce, then the global
rank — the scale-safe form of `row_number().over(partitionBy(key))`.

A plain ranking window shuffles EVERY scored row to its key's reducer;
for top-k-per-probe over a corpus that is |corpus| * n_probes rows of
shuffle. Phase 1 here ranks within each *input partition* (no shuffle —
`spark_partition_id()` is already materialized) and keeps at most k rows
per (key, partition); only those survivors — O(k * n_partitions * n_keys)
rows — reach the phase-2 shuffle, where the true global rank is computed.
Results are identical to the single-window form for any deterministic
total order: a row outside its partition's top-k cannot be in the global
top-k.

Used by the ANN family (q21-shape scoring); the LSH/IVF queries don't
need it because their candidate sets are already bucket-bounded.
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
    local = W.partitionBy(F.spark_partition_id(), key).orderBy(*order)
    pre = (
        df.withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= k)
        .drop("_lrn")
    )
    final = W.partitionBy(key).orderBy(*order)
    return (
        pre.withColumn(rank_col, F.row_number().over(final))
        .filter(F.col(rank_col) <= k)
    )
