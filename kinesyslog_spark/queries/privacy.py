"""Q139 — k-anonymity risk audit over quasi-identifier classes.

The compliance complement of `operators/purge.py` (right-to-erasure)
and q41's PII scrub: before a table is shared, every equivalence
class of quasi-identifiers (nation x market segment x account-balance
band) smaller than K is a re-identification risk — one outside fact
narrows the person to < K candidates. The audit reports each risky
class with its size AND its linkage amplification: how many order
rows those customers hold (joining the "anonymized" fact table back
multiplies exposure).

Plan shape (scale lens): one hash-aggregate over the dimension table
builds the class sizes; risky classes are a tiny filtered result, so
the join back to customers broadcasts, and the risky-customer key set
(< K rows per class) broadcasts again into the orders probe — the
100 TB fact table is touched exactly once, streamed through a
broadcast hash join with no shuffle. Everything is integers/strings —
exact on both engines; the balance band uses double FLOOR on
identical IEEE operands.

Reference parity: none (the reference forwards payloads verbatim;
privacy auditing is a Spark-side analytics extension, same posture as
q41 scrub).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t

K_ANON = 4

_Q139_ORACLE = f"""
WITH cls AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         COUNT(*) AS class_n
  FROM customer
  GROUP BY 1, 2, 3
),
risky AS (SELECT * FROM cls WHERE class_n < {K_ANON}),
rcust AS (
  SELECT c.c_custkey, r.c_nationkey, r.c_mktsegment, r.bal_band
  FROM customer c
  JOIN risky r
    ON c.c_nationkey = r.c_nationkey
   AND c.c_mktsegment = r.c_mktsegment
   AND CAST(FLOOR(c.c_acctbal / 1000) AS BIGINT) = r.bal_band
),
ordn AS (
  SELECT rc.c_nationkey, rc.c_mktsegment, rc.bal_band,
         COUNT(o.o_orderkey) AS n_orders
  FROM rcust rc LEFT JOIN orders o ON o.o_custkey = rc.c_custkey
  GROUP BY 1, 2, 3
)
SELECT CAST(r.c_nationkey AS BIGINT) AS nationkey,
       r.c_mktsegment AS mktsegment,
       r.bal_band AS bal_band,
       CAST(r.class_n AS BIGINT) AS class_n,
       CAST(o.n_orders AS BIGINT) AS n_orders
FROM risky r
JOIN ordn o
  ON r.c_nationkey = o.c_nationkey
 AND r.c_mktsegment = o.c_mktsegment
 AND r.bal_band = o.bal_band
ORDER BY nationkey, mktsegment, bal_band
"""


@query("q139_k_anonymity", oracle=_Q139_ORACLE)
def q139_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    qi = ["c_nationkey", "c_mktsegment", "bal_band"]
    cls = cust.groupBy(*qi).agg(F.count(F.lit(1)).alias("class_n"))
    risky = cls.filter(F.col("class_n") < K_ANON)
    # risky classes and their member keys are tiny by definition
    # (< K rows per class) — both joins below broadcast.
    rcust = cust.join(F.broadcast(risky.select(*qi)), qi)
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    # Stream the (100 TB-scale) fact table once through a broadcast
    # hash join — INNER with the small side broadcast (a left-outer
    # from the small side would force a shuffle of orders); classes
    # with zero orders are recovered by the left join below.
    ordn = (
        orders.join(
            F.broadcast(rcust), orders.o_custkey == rcust.c_custkey
        )
        .groupBy(*qi)
        .agg(F.count(F.lit(1)).alias("n_orders_raw"))
    )
    return (
        risky.join(F.broadcast(ordn), qi, "left")
        .select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            "bal_band",
            F.col("class_n").cast("long").alias("class_n"),
            F.coalesce("n_orders_raw", F.lit(0))
            .cast("long")
            .alias("n_orders"),
        )
        .orderBy("nationkey", "mktsegment", "bal_band")
    )
