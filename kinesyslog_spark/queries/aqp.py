"""Q156 — approximate query processing: hash-sampled aggregates with
exact ground truth and CLT error bounds.

THE 100 TB query pattern this engine exists for: answer an aggregate
from a k% sample and know how wrong you might be. The sample is a
DETERMINISTIC hash bucket (md5 of the row key mod 100 < k) — the same
rows on every engine and every run, so the oracle replays it exactly,
and at scale the filter is map-side (no shuffle, no state; a
hash-bucketed layout would even push it into pruning).

Per l_returnflag group: sampled row count and revenue scaled by 100/k,
the exact values (verification arm — one extra pass the product query
would skip), relative errors, and the CLT 95% half-width for the mean
(1.96 * s / sqrt(n), from exact integer-cent sums so both engines
compute identical doubles).

Scale notes: two map-side-combined aggregates over one scan each; the
sample aggregate reads k% of rows AFTER a codegen'd hash filter. No
joins except the tiny per-group result merge (broadcast).

Reference parity: none (relational north-star; the AQP face of the
sketch family q50/q70/q134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.text import md5_int60
from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t

AQP_PCT = 5  # sample percentage

_Q156_ORACLE = f"""
WITH base AS (
  SELECT l_returnflag AS rf,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST('0x' || substring(md5('aqp:' || l_orderkey || ':' ||
                                    l_linenumber), 1, 15) AS BIGINT)
           AS hv
  FROM lineitem
), s AS (
  SELECT rf,
         CAST(COUNT(*) AS BIGINT) AS n_s,
         CAST(SUM(cents) AS BIGINT) AS cents_s,
         CAST(SUM(cents * cents) AS HUGEINT) AS cents2_s
  FROM base WHERE hv % 100 < {AQP_PCT}
  GROUP BY rf
), x AS (
  SELECT rf,
         CAST(COUNT(*) AS BIGINT) AS n_x,
         CAST(SUM(cents) AS BIGINT) AS cents_x
  FROM base GROUP BY rf
)
SELECT s.rf AS returnflag,
       CAST(s.n_s * 100 / {AQP_PCT} AS BIGINT) AS est_rows,
       x.n_x AS exact_rows,
       ROUND(ABS(CAST(s.n_s AS DOUBLE) * 100 / {AQP_PCT} - x.n_x)
             / x.n_x, 4) AS rows_err,
       ROUND(CAST(s.cents_s AS DOUBLE) / 100 * 100 / {AQP_PCT}, 2)
         AS est_revenue,
       ROUND(CAST(x.cents_x AS DOUBLE) / 100, 2) AS exact_revenue,
       ROUND(ABS(CAST(s.cents_s AS DOUBLE) * 100 / {AQP_PCT} - x.cents_x)
             / x.cents_x, 4) AS revenue_err,
       ROUND(1.96
             * sqrt((CAST(s.cents2_s AS DOUBLE) / s.n_s
                     - (CAST(s.cents_s AS DOUBLE) / s.n_s)
                       * (CAST(s.cents_s AS DOUBLE) / s.n_s))
                    / s.n_s) / 100, 4) AS mean_ci95
FROM s JOIN x ON x.rf = s.rf
ORDER BY returnflag
"""


@query("q156_aqp_sampled_aggregate", oracle=_Q156_ORACLE)
def q156_aqp_sampled_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("rf"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        md5_int60(
            F.concat_ws(
                ":",
                F.lit("aqp").cast("string"),
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            ),
            prefix="",
        ).alias("hv"),
    )
    s = (
        base.filter(F.col("hv") % 100 < AQP_PCT)
        .groupBy("rf")
        .agg(
            F.count(F.lit(1)).alias("n_s"),
            F.sum("cents").alias("cents_s"),
            F.sum(
                F.col("cents").cast("decimal(38,0)")
                * F.col("cents").cast("decimal(38,0)")
            ).alias("cents2_s"),
        )
    )
    x = base.groupBy(F.col("rf").alias("rf2")).agg(
        F.count(F.lit(1)).alias("n_x"), F.sum("cents").alias("cents_x")
    )
    mean = F.col("cents_s").cast("double") / F.col("n_s")
    var = (
        F.col("cents2_s").cast("double") / F.col("n_s") - mean * mean
    )
    return (
        s.join(F.broadcast(x), F.col("rf") == F.col("rf2"), "inner")
        .select(
            F.col("rf").alias("returnflag"),
            (F.col("n_s") * 100 / AQP_PCT).cast("long").alias("est_rows"),
            F.col("n_x").alias("exact_rows"),
            F.round(
                F.abs(F.col("n_s").cast("double") * 100 / AQP_PCT - F.col("n_x"))
                / F.col("n_x"),
                4,
            ).alias("rows_err"),
            F.round(
                F.col("cents_s").cast("double") / 100 * 100 / AQP_PCT, 2
            ).alias("est_revenue"),
            F.round(F.col("cents_x").cast("double") / 100, 2)
            .alias("exact_revenue"),
            F.round(
                F.abs(
                    F.col("cents_s").cast("double") * 100 / AQP_PCT
                    - F.col("cents_x")
                )
                / F.col("cents_x"),
                4,
            ).alias("revenue_err"),
            F.round(1.96 * F.sqrt(var / F.col("n_s")) / 100, 4)
            .alias("mean_ci95"),
        )
        .orderBy("returnflag")
    )
