"""Relational query inventory Q01-Q14, Q16, Q18, Q23 (SURVEY.md §2b).

Spark side is the DataFrame API (Catalyst plans: scans with pushed filters,
broadcast joins for dims, partial aggregation); oracle side is ANSI SQL for
DuckDB over the same parquet files.

Float determinism: sums over many doubles are order-dependent, and Spark's
hash aggregation vs DuckDB's can accumulate in different orders — at sf0.1 a
2e9-scale sum can drift past the ROUND(,4) granularity. All money-column
aggregates therefore cast to exact DECIMAL first (associative integer
arithmetic, bit-identical in both engines) and cast back to DOUBLE at the
end. Double→decimal rounding ties cannot occur (a binary fraction is never
exactly k/10^n + 5/10^(n+1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec(col, scale: int = 2):
    """Exact-decimal view of a money double (see module docstring)."""
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Q01 — scan + filter + project (pushdown check: PushedFilters on l_shipdate)
# ---------------------------------------------------------------------------

@query(
    "q01_scan_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, ROUND(l_extendedprice, 4) AS l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q01_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round("l_extendedprice", 4).alias("l_extendedprice"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Q02 — TPC-H Q1-style pricing summary (hash agg, 8 aggregates)
# ---------------------------------------------------------------------------

@query(
    "q02_pricing_summary",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
      ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q02_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    qty, price, disc, tax = (dec("l_quantity"), dec("l_extendedprice"), dec("l_discount"), dec("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / F.count("*"), 4).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / F.count("*"), 4).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q03 — 3-way equi join + agg + top-k (shuffle joins; AQE may broadcast)
# ---------------------------------------------------------------------------

@query(
    "q03_shipping_priority",
    oracle="""
    SELECT
      l_orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      epoch_ms(o_orderdate) AS o_orderdate_ms
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-06-01").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            # cast: parquet dates read as TIMESTAMP_NTZ under a default
            # session (inferTimestampNTZ), which unix_millis rejects; the
            # session tz is UTC so the cast is exact.
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q04 — broadcast join over small dims (region, nation explicitly broadcast)
# ---------------------------------------------------------------------------

@query(
    "q04_customers_per_region",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def q04_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# Q05 / Q06 — left semi / left anti joins (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------

@query(
    "q05_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def q05_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q06_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    ORDER BY c_custkey
    """,
)
def q06_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Q07 — outer join + null handling
# ---------------------------------------------------------------------------

@query(
    "q07_customer_order_counts",
    oracle="""
    SELECT
      c_custkey,
      COUNT(o_orderkey) AS n_orders,
      CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def q07_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Q08 — ranking window (top-2 orders per customer)
# ---------------------------------------------------------------------------

@query(
    "q08_top2_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 2
    ORDER BY o_custkey, rn
    """,
)
def q08_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "rn",
        )
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# Q09 — analytic window with running frame
# ---------------------------------------------------------------------------

@query(
    "q09_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def q09_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q10 — lag/lead sessionization (mirrors the reference's per-source event
# stream keying, sink.py:145, re-expressed as gap-based sessions)
# ---------------------------------------------------------------------------

@query(
    "q10_sessionization",
    oracle="""
    SELECT event_id, user_id, session_id FROM (
      SELECT event_id, user_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                         > 1800000 THEN 1
                    WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                    ELSE 0 END AS is_new
        FROM events
      )
    )
    ORDER BY event_id
    """,
)
def q10_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    order_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(W.unboundedPreceding, W.currentRow)
    lag_ms = F.unix_millis(F.lag("ts").over(order_w))
    is_new = F.when(lag_ms.isNull(), 1).when(
        F.unix_millis("ts") - lag_ms > 30 * 60 * 1000, 1
    ).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .select(
            "event_id",
            "user_id",
            F.sum("is_new").over(run_w).alias("session_id"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Q11 — sort + limit (global top-k; Spark runs TakeOrderedAndProject)
# ---------------------------------------------------------------------------

@query(
    "q11_top_parts",
    oracle="""
    SELECT p_partkey, p_name, ROUND(p_retailprice, 4) AS p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 20
    """,
)
def q11_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(20)
        .select("p_partkey", "p_name", F.round("p_retailprice", 4).alias("p_retailprice"))
    )


# ---------------------------------------------------------------------------
# Q12 — set operations (union / intersect / except), tagged into one result
# ---------------------------------------------------------------------------

@query(
    "q12_set_ops",
    oracle="""
    SELECT 'union' AS op, k FROM (
      SELECT o_custkey AS k FROM orders UNION SELECT user_id FROM events
    )
    UNION ALL
    SELECT 'intersect' AS op, k FROM (
      SELECT o_custkey AS k FROM orders INTERSECT SELECT user_id FROM events
    )
    UNION ALL
    SELECT 'except' AS op, k FROM (
      SELECT o_custkey AS k FROM orders EXCEPT SELECT user_id FROM events
    )
    ORDER BY op, k
    """,
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_k = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    events_k = _t(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    u = orders_k.union(events_k).distinct().select(F.lit("union").alias("op"), "k")
    i = orders_k.intersect(events_k).select(F.lit("intersect").alias("op"), "k")
    e = orders_k.subtract(events_k).select(F.lit("except").alias("op"), "k")
    return u.unionAll(i).unionAll(e).orderBy("op", "k")


# ---------------------------------------------------------------------------
# Q13 — rollup / grouping sets
# ---------------------------------------------------------------------------

@query(
    "q13_rollup_revenue",
    oracle="""
    SELECT n_name, o_year,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM (
      SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, o_totalprice
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    )
    GROUP BY ROLLUP(n_name, o_year)
    ORDER BY n_name NULLS FIRST, o_year NULLS FIRST
    """,
)
def q13_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").cast("long").alias("o_year"),
            "o_totalprice",
        )
    )
    return (
        joined.rollup("n_name", "o_year")
        .agg(F.sum(dec("o_totalprice")).cast("double").alias("revenue"))
        .orderBy(F.asc_nulls_first("n_name"), F.asc_nulls_first("o_year"))
    )


# ---------------------------------------------------------------------------
# Q14 — exact distinct aggregation
# ---------------------------------------------------------------------------

@query(
    "q14_distinct_parts_per_flag",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q14_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q16 — date/time functions (mirrors reference P3/P4/P8 epoch handling,
# message.py:20-47,54-60)
# ---------------------------------------------------------------------------

@query(
    "q16_date_functions",
    oracle="""
    SELECT
      epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
      CAST(year(o_orderdate) AS BIGINT) AS o_year,
      CAST(month(o_orderdate) AS BIGINT) AS o_month,
      CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS o_dow,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2, 3, 4
    ORDER BY month_start_ms, o_dow
    """,
)
def q16_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.unix_millis(F.date_trunc("month", "o_orderdate")).alias("month_start_ms"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            F.dayofweek("o_orderdate").cast("long").alias("o_dow"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .orderBy("month_start_ms", "o_dow")
    )


# ---------------------------------------------------------------------------
# Q18 — tumbling-window aggregate (batch twin of streaming W1; reference's
# size/age flush G2/G3 re-expressed as event-time buckets)
# ---------------------------------------------------------------------------

@query(
    "q18_hourly_event_counts",
    oracle="""
    SELECT
      epoch_ms(date_trunc('hour', ts)) AS hour_start_ms,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start_ms, event_type
    """,
)
def q18_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_millis(F.date_trunc("hour", "ts")).alias("hour_start_ms"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .orderBy("hour_start_ms", "event_type")
    )


# ---------------------------------------------------------------------------
# Q23 — as-of join: each purchase event matched to the same user's most
# recent prior click. Implemented as a range join + dedup window; at scale
# this is the pattern to replace with a bucketed merge_asof (operators/asof.py).
# ---------------------------------------------------------------------------

@query(
    "q23_asof_purchase_click",
    oracle="""
    SELECT event_id, user_id, click_id, click_ms FROM (
      SELECT p.event_id, p.user_id, c.event_id AS click_id, epoch_ms(c.ts) AS click_ms,
             ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND c.ts <= p.ts
    ) WHERE rn = 1
    ORDER BY event_id
    """,
)
def q23_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user_id) & (clicks.c_ts <= purchases.ts),
        "left",
    )
    w = W.partitionBy("event_id").orderBy(F.desc("c_ts"), F.desc("click_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "click_id",
            F.unix_millis("c_ts").alias("click_ms"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Q48 — cube aggregation (all grouping-set combinations)
# ---------------------------------------------------------------------------

@query(
    "q48_cube_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q48_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
        .orderBy(
            F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus")
        )
    )


# ---------------------------------------------------------------------------
# Q49 — exact interpolated percentiles per group
# ---------------------------------------------------------------------------
# Spark `percentile` and DuckDB `quantile_cont` both use linear
# interpolation between order statistics, so the rounded outputs match
# exactly. (percentile_approx is the corpus-scale variant — approximate,
# so it is deliberately NOT in the oracle-checked inventory.)

@query(
    "q49_price_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q49_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q50 — HLL sketch cardinality (the corpus-scale distinct-count path)
# ---------------------------------------------------------------------------
# approx_count_distinct is the 100 TB form of Q14: HyperLogLog++ merges
# per-partition sketches instead of shuffling every distinct key, at a
# configurable relative error. The raw sketch estimate cannot hash-match a
# DuckDB twin, so the query is SELF-VALIDATING: it emits the exact count
# plus `in_bounds` = (|approx-exact|/exact <= 5*rsd); the oracle emits the
# exact count and literal TRUE. 5x the configured rsd (= 10%) is far
# outside HLL++'s observed tail (~3 sigma is 3*rsd), so a green row means
# the sketch really did estimate within bound.

@query(
    "q50_approx_distinct_sketch",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(*) AS n_rows,
           TRUE AS in_bounds
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q50_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "n_rows",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= F.lit(0.10)
            ).alias("in_bounds"),
        )
        .orderBy("l_returnflag")
    )

