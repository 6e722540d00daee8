"""Z-order (Morton-curve) data layout — multi-column locality for
min/max file pruning.

A table range-partitioned and sorted on ONE column prunes scans on that
column only; filters on a second column read every file. Interleaving
the bits of k quantized columns into a single Morton key and laying the
files out along that key gives every participating column locality, so
parquet footer min/max statistics skip files for ANY of them — the
OPTIMIZE ZORDER operation of the lakehouse engines, built here from
plain Catalyst bit arithmetic (shiftleft / shiftright / bitwise and-or:
whole-stage-codegen JVM expressions, no UDFs).

Scale posture (100 TB):
- The quantization bounds come from ONE aggregate over the input (two
  driver scalars per column — the standard layout-job pattern; a
  production compactor would reuse table statistics instead).
- The z-key write is `repartitionByRange(z)` + `sortWithinPartitions(z)`
  — a single range shuffle, exactly what a sorted write costs today.
- Pruning effect is verified by test: a 2-column z-layout touches a
  small fraction of files for a selective filter on EITHER column,
  where the single-column sort layout reads all files for the second.

Reference parity: none (the reference spools opaque gzip records); this
is the E3-reader-side layout optimization for the analytic store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def quantize(col: Column, mn: Column | int, mx: Column | int,
             bits: int = DEFAULT_BITS) -> Column:
    """Scale a numeric column to an integer in [0, 2^bits) using the
    given bounds (inclusive). Constant columns map to 0."""
    top = (1 << bits) - 1
    mn_c = F.lit(mn) if isinstance(mn, (int, float)) else mn
    mx_c = F.lit(mx) if isinstance(mx, (int, float)) else mx
    span = (mx_c - mn_c).cast("double")
    scaled = F.when(
        span <= 0, F.lit(0)
    ).otherwise(
        F.floor((col.cast("double") - mn_c) / span * top)
    )
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top))


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave: bit i of column j lands at position
    i * len(cols) + j. Pure shiftleft/shiftright/& / | expression tree —
    codegen folds it into straight-line JVM bit math."""
    k = len(cols)
    if not 1 <= k <= 4:
        raise ValueError("interleave_bits supports 1-4 columns")
    if bits * k > 62:
        raise ValueError("interleaved key must fit in a signed long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def with_z_value(df: DataFrame, cols: list[str],
                 bits: int = DEFAULT_BITS,
                 z_col: str = "_z") -> DataFrame:
    """Append the Morton key over `cols`, quantized by the observed
    per-column min/max (one aggregate pass)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    bounds = df.agg(*aggs).collect()[0]  # 2k driver scalars (layout job)
    qs = [
        quantize(F.col(c), bounds[f"mn_{c}"], bounds[f"mx_{c}"], bits)
        for c in cols
    ]
    return df.withColumn(z_col, interleave_bits(qs, bits))


def write_zordered(df: DataFrame, cols: list[str], path: str,
                   n_files: int, bits: int = DEFAULT_BITS) -> None:
    """Write `df` as `n_files` parquet files laid out along the Morton
    curve of `cols`: one range shuffle on the z-key, sorted within each
    file so row-group min/max stats stay tight for every z column."""
    zdf = with_z_value(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
