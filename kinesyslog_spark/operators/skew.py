r"""Skew mitigation utilities: deterministic key salting.

When one join key dominates (a hot source IP, a boilerplate doc hash),
the shuffle partition holding it becomes the job's straggler. The
engine's first-line answers are (1) AQE skew-join splitting — enabled in
session.py — and (2) broadcasting the small side so no shuffle happens
at all. Salting is the fallback for the cases those can't reach: a
shuffle join whose small side is too big to broadcast but cheap to
replicate, or a stateful/streaming keyed op where AQE doesn't apply.

`salted_join` replicates the SMALL side `n_salt` times and spreads each
big-side row across the salt space deterministically (hash of
caller-named columns — no rand(), so replays and retries land
identically; SURVEY §2b determinism rules). Each hot key's rows then
split across `n_salt` partitions instead of one.

Cost model (why this isn't the default): the small side shuffles
`n_salt` copies, so salting pays when
    skew_factor ≈ hot_key_rows / avg_partition_rows  >  n_salt
and the small side is ≲ 1/n_salt of the big side. Pick n_salt around
the measured skew factor, not higher.

Reference parity: the reference shards load per-listener process
(init.py:233-249) and never joins, so skew never arises there; this is
scale infrastructure for the engine's query surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salt_column(cols: list[str | Column], n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt): xxhash64 over `cols`.

    Pass columns that are ~unique per row on the BIG side (an id, or the
    full payload) so a hot key's rows spread uniformly."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salt)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    big_salt_cols: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, with the hot-key shuffle spread
    over `n_salt` sub-partitions.

    `small` is replicated n_salt times (one copy per salt value); each
    `big` row picks one salt from `big_salt_cols`. Semantically identical
    to `big.join(small, on, how)` for inner/left joins (every big row
    still meets every matching small row exactly once)."""
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    salted_big = big.withColumn(SALT_COL, salt_column(big_salt_cols, n_salt))
    return salted_big.join(salted_small, on=[*on, SALT_COL], how=how).drop(SALT_COL)
