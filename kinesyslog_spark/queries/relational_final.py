"""Q142 — TPC-H Q21 shape: suppliers who kept orders waiting.

The last classic TPC-H subquery pattern in the registry: a doubly
correlated EXISTS / NOT EXISTS over the same fact table — supplier s
is blamed for a failed ('F') order when s shipped late, some OTHER
supplier shipped in that order too, and NO other supplier shipped
late ("it was multi-supplier, and only s was late"). Lateness derives
from the available columns as in q97: l_shipdate > o_orderdate + 60
days (the test schema carries no commit/receipt dates).

Spark-first formulation (scale lens): instead of replaying the two
correlated subqueries as two extra joins over lineitem, the per-order
profile (distinct suppliers, distinct LATE suppliers) is computed with
window aggregates over the SAME l_orderkey partitioning the
lineitem ⋈ orders join already established — Catalyst reuses the join
exchange, so the whole blame computation is ONE shuffle of the fact
data plus the tiny final suppkey aggregate (per-order windows are
bounded by the basket size, ≤7 rows). The supplier-name join
broadcasts. The DuckDB oracle intentionally keeps the textbook
correlated EXISTS/NOT-EXISTS form — two independent formulations of
the same semantics checking each other.

Reference parity: none (relational battery; SURVEY §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t

WAIT_TOPK = 50

_Q142_ORACLE = f"""
SELECT s.s_suppkey AS suppkey, s.s_name AS name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1, 2
ORDER BY numwait DESC, suppkey
LIMIT {WAIT_TOPK}
"""


@query("q142_waiting_suppliers", oracle=_Q142_ORACLE)
def q142_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).withColumn(
        "late",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).cast("int"),
    )
    w = Window.partitionBy("l_orderkey")
    prof = lo.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late") == 1, F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    numwait = (
        prof.filter(
            (F.col("late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        numwait.join(F.broadcast(supp), numwait.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("numwait").cast("long").alias("numwait"),
        )
        .orderBy(F.col("numwait").desc(), "suppkey")
        .limit(WAIT_TOPK)
    )
