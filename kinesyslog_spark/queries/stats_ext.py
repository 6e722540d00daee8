"""Exact-moment statistics: per-group OLS trend (q118) and Pearson
correlation (q119) — the classic analytics that are exact-deterministic
when computed from integer/decimal moments instead of streaming float
accumulators.

q118 — hourly volume trend per event_type: regress hourly event counts
on the hour index (OLS slope/intercept). All five moments (n, Sx, Sy,
Sxy, Sxx) are exact integers (hour indexes and counts), so slope =
(n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) divides identical operands on both
engines; outputs floor-quantized to 4 dp. The drift/trend detector
next to q82's z-scores.

q119 — Pearson correlations between lineitem numerics (quantity,
extendedprice, discount): moments accumulated as exact DECIMAL sums
(cents-scaled products overflow BIGINT at corpus scale; DECIMAL(38,x)
holds them exactly on both engines), each moment cast to double ONCE
(identical exact value -> identical IEEE double; combining in decimal
would overflow the 38-digit width), then covariance/ratio formed with
identical double arithmetic and floor-quantized.

Scale notes: both are two-level aggregations — a (key, x) pre-count /
single scan with map-side combine, then a |keys|-sized (or 1-row)
moment reduction. No joins, no windows over the fact table.

Reference parity: north-star extensions (no reference analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t


def _q4c(x):
    return F.floor(x * 10000 + F.lit(0.5)) / 10000


# ---------------------------------------------------------------------------
# Q118 — hourly volume trend per event_type (exact-moment OLS)
# ---------------------------------------------------------------------------


@query(
    "q118_hourly_trend",
    oracle="""
    WITH hc AS (
      SELECT event_type,
             CAST(date_diff('hour', TIMESTAMP '2024-01-01', date_trunc('hour', ts))
                  AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(h) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(h * y) AS BIGINT) AS sxy,
             CAST(SUM(h * h) AS BIGINT) AS sxx
      FROM hc GROUP BY event_type
    )
    SELECT event_type, n,
           FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx) * 10000 + 0.5) / 10000 AS slope,
           FLOOR((CAST(sy AS DOUBLE) / n
                  - CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
                    * (CAST(sx AS DOUBLE) / n)) * 10000 + 0.5) / 10000
             AS intercept
    FROM m
    ORDER BY event_type
    """,
)
def q118_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    origin = F.lit("2024-01-01 00:00:00").cast("timestamp")
    hc = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
        )
        .agg(F.count("*").alias("y"))
        .select(
            "event_type",
            ((F.unix_timestamp("hr") - F.unix_timestamp(origin)) / 3600)
            .cast("long").alias("h"),
            "y",
        )
    )
    m = hc.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("h").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("h") * F.col("y")).alias("sxy"),
        F.sum(F.col("h") * F.col("h")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") / F.col("n")
        - slope * (F.col("sx").cast("double") / F.col("n"))
    )
    return m.select(
        "event_type", "n",
        _q4c(slope).alias("slope"),
        _q4c(intercept).alias("intercept"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Q119 — Pearson correlations between lineitem numerics (exact decimal
# moments; only the final ratio in doubles)
# ---------------------------------------------------------------------------

_PAIRS = (("l_quantity", "l_extendedprice"),
          ("l_quantity", "l_discount"),
          ("l_extendedprice", "l_discount"))


def _q119_oracle() -> str:
    parts = []
    for x, y in _PAIRS:
        parts.append(f"""
    SELECT '{x}~{y}' AS pair,
           FLOOR((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                 * 10000 + 0.5) / 10000 AS pearson_r
    FROM (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST({y} AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST({x} AS DECIMAL(18,2)) * CAST({y} AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST({x} AS DECIMAL(18,2)) * CAST({x} AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST({y} AS DECIMAL(18,2)) * CAST({y} AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem
    )""")
    return " UNION ALL ".join(parts) + " ORDER BY pair"


@query("q119_pearson_matrix", oracle=_q119_oracle())
def q119_pearson_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    outs = []
    for x, y in _PAIRS:
        dx = F.col(x).cast("decimal(18,2)")
        dy = F.col(y).cast("decimal(18,2)")
        m = li.agg(
            F.count("*").cast("double").alias("n"),
            F.sum(dx).cast("double").alias("sx"),
            F.sum(dy).cast("double").alias("sy"),
            F.sum(dx * dy).cast("double").alias("sxy"),
            F.sum(dx * dx).cast("double").alias("sxx"),
            F.sum(dy * dy).cast("double").alias("syy"),
        )
        # Moments are EXACT decimals on both engines; each is cast to
        # double once (same value -> same IEEE double), then combined
        # with identical double arithmetic.
        num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
        denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
        outs.append(
            m.select(
                F.lit(f"{x}~{y}").alias("pair"),
                _q4c(num / (F.sqrt(denx) * F.sqrt(deny))).alias("pearson_r"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("pair")
