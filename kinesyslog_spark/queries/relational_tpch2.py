"""Q149-Q153 — the remaining TPC-H query patterns (Q2/Q9/Q11/Q16/Q20
shapes), closing the full 22-query pattern matrix.

The driver's testdata has no `partsupp` table, so these are SHAPE
variants: the supplier-part relationship is derived from lineitem
(which supplier actually shipped which part), preserving each query's
DISTINCTIVE optimizer pattern — that pattern, not the column list, is
what the engine must prove it can run:

- q149 / Q2: correlated MIN subquery decorrelated to an aggregate +
  join-back (min-cost supplier per part within a region).
- q150 / Q9: multi-way star join with computed profit, grouped by
  nation x year.
- q151 / Q11: HAVING against a GLOBAL-fraction scalar subquery
  (broadcast 1-row total).
- q152 / Q16: grouped DISTINCT-count with an anti-joined exclusion
  set.
- q153 / Q20: per-group dominance threshold (>50% of a part's shipped
  quantity) — aggregate + broadcast join-back replacing the correlated
  EXISTS.

Money math follows the q53 decimal contract (DECIMAL(18,2) in both
engines, CAST AS DOUBLE at the boundary); quantities are exact ints.

Scale notes: every variant keeps the fact table on the streaming side
of broadcast joins (part/supplier/nation/region are dimensions); the
decorrelated aggregates shuffle on their natural group keys; final
top-k's are LIMIT after ORDER BY on grouped (small) results.

Reference parity: none (relational north-star extension, SURVEY §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t, dec

Q2_REGION = "EUROPE"
Q2_MIN_SIZE = 25
Q9_TYPE = "PROMO"
Q11_FRACTION = 0.04
Q16_BAL_MIN = 1000.0
Q20_YEAR = 1996
Q20_SHARE = 0.5

_Q149_ORACLE = f"""
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         MIN(ROUND(l_extendedprice / l_quantity, 4)) AS unit_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(unit_cost) AS min_cost FROM costs GROUP BY l_partkey
)
SELECT CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, s.s_name, n.n_name,
       CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_type,
       c.unit_cost AS min_cost
FROM costs c
JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cost = b.min_cost
JOIN part p ON p.p_partkey = c.l_partkey
JOIN supplier s ON s.s_suppkey = c.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size >= {Q2_MIN_SIZE}
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, min_cost
LIMIT 30
"""


@query("q149_min_cost_supplier", oracle=_Q149_ORACLE)
def q149_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 4)
        .alias("unit"),
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    region_supp = (
        supp.join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        li.join(F.broadcast(region_supp),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("unit").alias("unit_cost"))
    )
    # decorrelated MIN: per-part minimum broadcast back (the Q2 pattern)
    best = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= Q2_MIN_SIZE)
    return (
        costs.join(
            F.broadcast(best),
            (costs.l_partkey == best.l_partkey)
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .drop(best.l_partkey)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name", "n_name",
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_type",
            F.col("unit_cost").alias("min_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "min_cost"
        )
        .limit(30)
    )


_Q150_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                - CAST(p.p_retailprice AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2)) * 0.01
           ) AS DOUBLE) AS profit,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_type = '{Q9_TYPE}'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q150_product_profit", oracle=_Q150_ORACLE)
def q150_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == Q9_TYPE)
    profit = (
        dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
        - dec("p_retailprice") * dec("l_quantity") * F.lit(0.01).cast(
            "decimal(18,2)"
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(profit).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


_Q151_ORACLE = f"""
WITH val AS (
  SELECT p.p_brand,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS value
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
), tot AS (SELECT SUM(value) AS total FROM val)
SELECT v.p_brand, CAST(v.value AS DOUBLE) AS value,
       ROUND(CAST(v.value AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
         AS share
FROM val v CROSS JOIN tot t
WHERE CAST(v.value AS DOUBLE) > CAST(t.total AS DOUBLE) * {Q11_FRACTION}
ORDER BY value DESC, p_brand
"""


@query("q151_important_brands", oracle=_Q151_ORACLE)
def q151_important_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    val = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .alias("value")
        )
    )
    tot = val.agg(F.sum("value").alias("total"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value").cast("double")
            > F.col("total").cast("double") * Q11_FRACTION
        )
        .select(
            "p_brand",
            F.col("value").cast("double").alias("value"),
            F.round(
                F.col("value").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy(F.desc("value"), "p_brand")
    )


_Q152_ORACLE = f"""
WITH excluded AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_BAL_MIN}
)
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
"""


@query("q152_supplier_diversity", oracle=_Q152_ORACLE)
def q152_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    excluded = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < Q16_BAL_MIN)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded),
                F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(40)
    )


_Q153_ORACLE = f"""
WITH shipped AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem
  WHERE EXTRACT(year FROM l_shipdate) = {Q20_YEAR}
  GROUP BY l_partkey, l_suppkey
), totals AS (
  SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS total_qty
  FROM shipped GROUP BY l_partkey
), dominant AS (
  SELECT s.l_suppkey, s.l_partkey
  FROM shipped s JOIN totals t ON t.l_partkey = s.l_partkey
  WHERE s.qty * 2 > t.total_qty
)
SELECT sup.s_name, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS dominated_parts
FROM dominant d
JOIN supplier sup ON sup.s_suppkey = d.l_suppkey
JOIN nation n ON n.n_nationkey = sup.s_nationkey
GROUP BY sup.s_name, n.n_name
ORDER BY dominated_parts DESC, s_name
LIMIT 25
"""


@query("q153_dominant_suppliers", oracle=_Q153_ORACLE)
def q153_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == Q20_YEAR
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("long").alias("qty")
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum("qty").cast("long").alias("total_qty")
    )
    # decorrelated EXISTS: dominance threshold via aggregate + join-back
    # (integer arithmetic: qty*2 > total, no float share)
    dominant = shipped.join(
        totals, F.col("l_partkey") == F.col("tp")
    ).filter(F.col("qty") * 2 > F.col("total_qty"))
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = _t(spark, sf_dir, "nation")
    return (
        dominant.join(F.broadcast(supp),
                      F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("dominated_parts"))
        .orderBy(F.desc("dominated_parts"), "s_name")
        .limit(25)
    )
