"""Q168 — Benford first-digit audit over the monetary columns.

Data forensics for training corpora and fact tables: naturally-grown
multiplicative quantities follow Benford's law (P(d) = log10(1 + 1/d)),
while fabricated, synthesized, or truncated data does not — the
first-digit distribution plus a chi-square distance is the standard
screen (auditing, fraud detection, synthetic-data QA). Complements
q145's constraint audit (range/domain checks can pass on data that is
distributionally wrong).

Determinism contract: the first significant digit is extracted through
EXACT integer arithmetic — the DECIMAL(12,2) money columns scale to
integer cents (v * 100, exact) and the digit is the first character of
the INTEGER's decimal string, identical on both engines (no log10/
float formatting in the digit path). The Benford expectation is the
one transcendental, quantized 1e-6 (the q157 convention); chi-square
terms are cast to DECIMAL(25,10) before summation so the 9-row sum is
order-free.

Plan shape: per column one projection + 9-group hash aggregate; the
chi-square is a 9-row broadcast re-aggregate joined back. Two source
columns stack with unionByName — one pass each, no windows, no joins
against the fact tables.

Reference parity: none (data-quality family, next to q145/q154).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.localframe import local_frame
from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t

_BENFORD = {d: math.floor(math.log10(1 + 1 / d) * 1e6 + 0.5) / 1e6
            for d in range(1, 10)}

_COLS = (("lineitem", "l_extendedprice"), ("orders", "o_totalprice"))


def _digit_cte(table: str, col: str) -> str:
    return f"""
  SELECT '{table}.{col}' AS src,
         substring(CAST(CAST({col} * 100 AS BIGINT) AS VARCHAR), 1, 1)
           AS digit
  FROM {table} WHERE {col} > 0"""


def _q168_oracle() -> str:
    stacked = "\n  UNION ALL".join(_digit_cte(t, c) for t, c in _COLS)
    bexp = ", ".join(f"({d}, CAST({_BENFORD[d]} AS DOUBLE))"
                     for d in range(1, 10))
    return f"""
WITH raw AS MATERIALIZED ({stacked}),
counts AS MATERIALIZED (
  SELECT src, CAST(digit AS INTEGER) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM raw GROUP BY src, digit
),
bf(digit, p) AS (VALUES {bexp}),
tot AS (SELECT src, CAST(SUM(n_obs) AS BIGINT) AS n FROM counts GROUP BY src),
filled AS (
  SELECT t.src, bf.digit, bf.p, t.n, COALESCE(c.n_obs, 0) AS n_obs
  FROM tot t CROSS JOIN bf
  LEFT JOIN counts c ON c.src = t.src AND c.digit = bf.digit
),
chi AS (
  SELECT src,
         CAST(SUM(CAST((n_obs - n * p) * (n_obs - n * p) / (n * p)
                       AS DECIMAL(25,10))) AS DOUBLE) AS chi2
  FROM filled GROUP BY src
)
SELECT f.src, f.digit, f.n_obs,
       FLOOR(CAST(f.n_obs AS DOUBLE) / f.n * 1000000 + 0.5) / 1000000
         AS frac,
       f.p AS benford_p,
       FLOOR(c.chi2 * 10000 + 0.5) / 10000 AS chi2
FROM filled f JOIN chi c ON c.src = f.src
ORDER BY f.src, f.digit
"""


@query("q168_benford_audit", oracle=_q168_oracle())
def q168_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for table, col in _COLS:
        parts.append(
            _t(spark, sf_dir, table)
            .filter(F.col(col) > 0)
            .select(
                F.lit(f"{table}.{col}").alias("src"),
                F.substring(
                    (F.col(col) * 100).cast("bigint").cast("string"), 1, 1
                ).cast("int").alias("digit"),
            )
        )
    raw = parts[0]
    for p in parts[1:]:
        raw = raw.unionByName(p)
    counts = raw.groupBy("src", "digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    tot = counts.groupBy("src").agg(F.sum("n_obs").cast("long").alias("n"))
    bf = local_frame(
        spark,
        [(d, _BENFORD[d]) for d in range(1, 10)], "digit int, p double"
    )
    full = (
        tot.crossJoin(F.broadcast(bf))
        .join(counts, ["src", "digit"], "left")
        .select(
            "src", "digit", "p", "n",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
        )
    )
    chi = full.groupBy("src").agg(
        F.sum(
            (
                (F.col("n_obs") - F.col("n") * F.col("p"))
                * (F.col("n_obs") - F.col("n") * F.col("p"))
                / (F.col("n") * F.col("p"))
            ).cast("decimal(25,10)")
        ).cast("double").alias("chi2")
    )
    return (
        full.join(F.broadcast(chi), "src")
        .select(
            "src", "digit", "n_obs",
            (
                F.floor(
                    F.col("n_obs").cast("double") / F.col("n") * 1000000
                    + 0.5
                ) / 1000000
            ).alias("frac"),
            F.col("p").alias("benford_p"),
            (F.floor(F.col("chi2") * 10000 + 0.5) / 10000).alias("chi2"),
        )
        .orderBy("src", "digit")
    )
