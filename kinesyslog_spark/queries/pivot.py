"""Pivot / unpivot (wide<->long reshaping) — q57/q58.

q57 — pivot: order counts and decimal-exact revenue per order-year,
pivoted into one column pair per o_orderpriority. The Spark side is the
DataFrame `groupBy().pivot(values=...)` API with an explicit value list
(no values-discovery job, deterministic column order); the oracle is the
ANSI conditional-aggregation form (FILTER / CASE WHEN) every engine can
run.

q58 — unpivot: lineitem's parallel metric columns (quantity, extended
price, discount) melted into (metric, value) long form via the `unpivot`
/ `stack` expression, then aggregated per (returnflag, metric). The
oracle is the UNION ALL long-form equivalent.

Scale notes: a pivot with an explicit IN-list is a single hash aggregate
(one shuffle on the group key, map-side combine, no second values scan);
unpivot is a map-only row expansion (xN metrics) feeding a partial
aggregate — neither adds a shuffle beyond the final groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t, dec

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _slug(p: str) -> str:
    return p.split("-", 1)[1].lower().replace(" ", "_")


def _q57_oracle() -> str:
    cols = ",\n      ".join(
        f"COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS n_{_slug(p)},\n      "
        f"CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))) "
        f"FILTER (WHERE o_orderpriority = '{p}'), 0) AS DOUBLE) AS rev_{_slug(p)}"
        for p in PRIORITIES
    )
    return f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
      {cols}
    FROM orders
    GROUP BY order_year
    ORDER BY order_year
    """


@query("q57_pivot_priority", oracle=_q57_oracle())
def q57_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            "o_orderpriority",
            dec("o_totalprice").alias("price"),
        )
        .groupBy("order_year")
        .pivot("o_orderpriority", PRIORITIES)
        .agg(
            F.count(F.lit(1)).alias("n"),  # count(*) is rejected inside Pivot
            F.coalesce(F.sum("price"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
    )
    # pivot names columns '<value>_n' / '<value>_rev'; align to oracle names
    renamed = piv.select(
        "order_year",
        *[
            c
            for p in PRIORITIES
            for c in (
                F.col(f"`{p}_n`").alias(f"n_{_slug(p)}"),
                F.col(f"`{p}_rev`").alias(f"rev_{_slug(p)}"),
            )
        ],
    )
    return renamed.orderBy("order_year")


def _q58_oracle() -> str:
    return """
    SELECT l_returnflag, metric,
           CAST(SUM(v) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM (
      SELECT l_returnflag, 'quantity' AS metric, CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
    )
    GROUP BY l_returnflag, metric
    ORDER BY l_returnflag, metric
    """


@query("q58_unpivot_metrics", oracle=_q58_oracle())
def q58_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        dec("l_quantity").alias("quantity"),
        dec("l_extendedprice").alias("extendedprice"),
        dec("l_discount").alias("discount"),
    )
    long = li.unpivot(
        ["l_returnflag"],
        ["quantity", "extendedprice", "discount"],
        "metric",
        "v",
    )
    return (
        long.groupBy("l_returnflag", "metric")
        .agg(F.sum("v").cast("double").alias("total"), F.count("*").alias("n"))
        .orderBy("l_returnflag", "metric")
    )
