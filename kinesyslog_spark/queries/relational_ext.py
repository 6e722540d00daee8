"""Extended relational coverage: window-function battery, correlated
scalar subquery (decorrelated), and a TPC-H Q5-style 6-way join.

These extend SURVEY §2b's Q08/Q03 families with the remaining ANSI window
functions (ntile / percent_rank / cume_dist / first_value / last_value /
nth_value), the classic correlated-subquery shape (WHERE x > (SELECT AVG
... correlated)) expressed as the decorrelated aggregate-then-broadcast-
join plan Catalyst itself would produce, and the widest join tree in the
TPC-H suite (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier
with the c_nationkey = s_nationkey "local supplier" constraint).

Determinism: decimal-exact money arithmetic (see relational.py module
doc); window partitions ordered by a unique key suffix so every ranking
function is reproducible; the correlated predicate is evaluated in exact
integer arithmetic (price * count > sum) on BOTH engines so no float
comparison can flip a row.

Scale notes (100 TB posture):
- q51 windows partition by o_custkey — hash-partitioned state, no global
  sort; skew bounded by orders-per-customer.
- q52's inner aggregate produces |brands| rows → broadcast join; the scan
  of `part` happens twice but both scans prune to 3 columns.
- q53 lets Catalyst/AQE reorder: region/nation broadcast, the
  orders⋈lineitem⋈supplier spine shuffles on the join keys; the
  o_orderdate filter is pushed to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t, dec

_ASOF_ORACLE = """
    SELECT event_id, user_id, click_id, click_ms FROM (
      SELECT p.event_id, p.user_id, c.event_id AS click_id, epoch_ms(c.ts) AS click_ms,
             ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND c.ts <= p.ts
    ) WHERE rn = 1
    ORDER BY event_id
    """


# ---------------------------------------------------------------------------
# Q51 — window-function battery (ntile / percent_rank / cume_dist /
#       first_value / last_value / nth_value) per customer order history
# ---------------------------------------------------------------------------

@query(
    "q51_window_battery",
    oracle="""
    SELECT
      o_orderkey,
      o_custkey,
      ROW_NUMBER()   OVER w AS rn,
      NTILE(4)       OVER w AS quartile,
      ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
      ROUND(CUME_DIST()    OVER w, 4) AS cume,
      ROUND(FIRST_VALUE(o_totalprice) OVER wf, 4) AS first_price,
      ROUND(LAST_VALUE(o_totalprice)  OVER wf, 4) AS last_price,
      ROUND(NTH_VALUE(o_totalprice, 2) OVER wf, 4) AS second_price
    FROM orders
    WINDOW
      w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
)
def q51_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 4).alias("cume"),
            F.round(F.first("o_totalprice").over(wf), 4).alias("first_price"),
            F.round(F.last("o_totalprice").over(wf), 4).alias("last_price"),
            F.round(F.nth_value("o_totalprice", 2).over(wf), 4).alias("second_price"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q52 — correlated scalar subquery: parts priced above their brand average.
# Decorrelated form (groupBy + broadcast join) = the plan Catalyst's
# RewriteCorrelatedScalarSubquery produces; predicate in exact integer
# arithmetic (price*count > sum) so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------

@query(
    "q52_above_brand_avg",
    oracle="""
    WITH brand_stats AS (
      SELECT p_brand,
             SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS price_sum,
             COUNT(*) AS cnt
      FROM part GROUP BY p_brand
    )
    SELECT p.p_partkey, p.p_brand,
           ROUND(p.p_retailprice, 4) AS p_retailprice,
           ROUND(CAST(b.price_sum AS DOUBLE) / b.cnt, 4) AS brand_avg
    FROM part p JOIN brand_stats b ON p.p_brand = b.p_brand
    WHERE CAST(p.p_retailprice AS DECIMAL(18,2)) * b.cnt > b.price_sum
    ORDER BY p.p_partkey
    """,
)
def q52_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    brand_stats = part.groupBy("p_brand").agg(
        F.sum(dec("p_retailprice")).alias("price_sum"),
        F.count("*").alias("cnt"),
    )
    return (
        part.join(F.broadcast(brand_stats), "p_brand")
        .filter(dec("p_retailprice") * F.col("cnt") > F.col("price_sum"))
        .select(
            "p_partkey",
            "p_brand",
            F.round("p_retailprice", 4).alias("p_retailprice"),
            F.round(F.col("price_sum").cast("double") / F.col("cnt"), 4).alias("brand_avg"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Q53 — TPC-H Q5 "local supplier volume": the widest join tree in the
# suite (6 tables) + the local-supplier non-key constraint
# (c_nationkey = s_nationkey). Exercises join reordering, broadcast
# selection for region/nation, and date-filter pushdown into orders.
# ---------------------------------------------------------------------------

@query(
    "q53_local_supplier_volume",
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def q53_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        customer
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Q63 — as-of join, union-timeline strategy (the 100 TB plan for Q23).
# Q23's inequality-join formulation is per-user QUADRATIC (every purchase
# joins every earlier click of that user before the window picks one).
# This twin computes the identical result linearly: union both event
# roles into one per-user timeline, sort once, and carry the latest
# click forward with a running `last(ignorenulls)` window — one shuffle
# on user_id, one sort, no pair blow-up on hot users. The oracle is
# verbatim Q23's, proving plan-level equivalence of the two strategies.
# (SURVEY §4 deferred a custom range-join rule; this composition makes
# it unnecessary for the as-of case.)
# ---------------------------------------------------------------------------

@query("q63_asof_union_timeline", oracle=_ASOF_ORACLE)
def q63_asof_union_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("role"),  # clicks sort before purchases at equal ts
        F.col("event_id").alias("click_eid"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("role"),
        F.lit(None).cast("long").alias("click_eid"),
        "event_id",
    )
    # Equal-ts clicks sort ascending by id so the *running last* ends on
    # the max click_id — matching Q23's (c_ts DESC, click_id DESC) pick.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "role", "click_eid")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    timeline = clicks.unionByName(purchases).withColumn(
        "last_click",
        F.last(
            F.when(
                F.col("role") == 0,
                F.struct(F.col("click_eid").alias("id"), F.col("ts").alias("cts")),
            ),
            ignorenulls=True,
        ).over(w),
    )
    return (
        timeline.filter(F.col("role") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("last_click.id").alias("click_id"),
            F.unix_millis("last_click.cts").alias("click_ms"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Q64 — TPC-H Q6 "forecasting revenue change": the canonical pushdown +
# single-aggregate scan (3 range predicates, no join, no group key).
# The entire query is one parquet scan with every filter pushed and a
# map-side partial SUM — the shape that must stay shuffle-minimal.
# ---------------------------------------------------------------------------

@query(
    "q64_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q64_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q65 — TPC-H Q12-style conditional aggregation over a join: per
# lineitem status, how many of its orders are high- vs low-priority
# (CASE-WHEN counts after a shuffled equi-join).
# ---------------------------------------------------------------------------

@query(
    "q65_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q65_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q67 — argmax aggregation (max_by/min_by): latest and cheapest order
# per customer WITHOUT a ranking window — one hash aggregate with
# map-side combine, the plan of choice for top-1-per-group at scale
# (a row_number window would sort every partition; max_by keeps a
# single-row state per key). Deterministic via a composite integer sort
# key (epoch_days * 1e9 + orderkey) both engines compute identically.
# ---------------------------------------------------------------------------

@query(
    "q67_argmax_orders",
    oracle="""
    SELECT o_custkey,
           MAX_BY(o_orderkey, CAST(DATEDIFF('day', TIMESTAMP '1970-01-01', o_orderdate) AS BIGINT) * 1000000000 + o_orderkey) AS last_orderkey,
           CAST(epoch_ms(MAX(o_orderdate)) AS BIGINT) AS last_order_ms,
           MIN_BY(o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) * 10000000 + o_orderkey) AS cheapest_orderkey
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def q67_argmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    date_key = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint") * F.lit(1000000000) + F.col("o_orderkey")
    )
    price_key = dec("o_totalprice") * F.lit(10000000) + F.col("o_orderkey")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", date_key).alias("last_orderkey"),
            # cast: o_orderdate is TIMESTAMP_NTZ under a default session
            F.unix_millis(F.max("o_orderdate").cast("timestamp")).alias("last_order_ms"),
            F.min_by("o_orderkey", price_key).alias("cheapest_orderkey"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Q70 — approximate-quantile sketch with rank-error self-validation
# ---------------------------------------------------------------------------
# percentile_approx (Greenwald-Khanna in Spark) is the corpus-scale form
# of Q49's exact percentiles: mergeable per-partition sketches, no full
# sort. Like q50, the raw estimate can't hash-match another engine, so
# the query validates the sketch's own guarantee: GK with accuracy N
# bounds RANK error by 1/N, so the fraction of rows <= the estimate must
# sit within eps of the target quantile. The query emits that rank check
# (computed exactly, by rescanning with the broadcast estimate); the
# oracle emits TRUE. eps = 0.01 = 100x the configured 1/10000 rank bound.

@query(
    "q70_approx_quantile_sketch",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           TRUE AS p50_in_bounds,
           TRUE AS p90_in_bounds
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q70_approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.percentile_approx("l_extendedprice", F.lit(0.9), F.lit(10000)).alias("p90"),
    )
    # Rank check: one more scan with the 3-row estimate table broadcast —
    # the map-side compare + count is how a validation pass runs at scale
    # (never a sort, never a second shuffle of the fact table).
    eps = 0.01
    return (
        li.join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            (
                F.abs(
                    F.avg((F.col("l_extendedprice") <= F.col("p50")).cast("double"))
                    - 0.5
                )
                <= eps
            ).alias("p50_in_bounds"),
            (
                F.abs(
                    F.avg((F.col("l_extendedprice") <= F.col("p90")).cast("double"))
                    - 0.9
                )
                <= eps
            ).alias("p90_in_bounds"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q85 — TPC-H Q7 shape (volume shipping between nation pairs).
# Two roles of the SAME dimension (nation n1/n2 for supplier/customer
# side) with an inequality predicate between them — the classic
# self-referential dimension join. Both nation copies broadcast; the
# fact-side join order is left to Catalyst.
# ---------------------------------------------------------------------------

@query(
    "q85_nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name <> n2.n_name
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
    ) t
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q85_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(_t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(_t(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q86 — TPC-H Q8 shape (market share). Per (region, year): one nation's
# share of ECONOMY-part revenue. Conditional-sum ratio over an exact
# decimal denominator; the share is floor-quantized to 4dp on both
# engines (decimal/decimal division is scale-pinned, then the double
# quotient is quantized — no round(double) ulp trap).
# ---------------------------------------------------------------------------

SHARE_NATION = "NATION_7"


@query(
    "q86_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             n_s.n_name AS supp_nation,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS v
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n_s ON s_nationkey = n_s.n_nationkey
      JOIN nation n_c ON c_nationkey = n_c.n_nationkey
      JOIN region  ON n_c.n_regionkey = r_regionkey
      WHERE p_type = 'ECONOMY'
    )
    SELECT r_name, o_year,
           CAST(SUM(CASE WHEN supp_nation = '{SHARE_NATION}' THEN v ELSE 0 END)
                AS DOUBLE) AS nation_vol,
           CAST(SUM(v) AS DOUBLE) AS total_vol,
           FLOOR(CAST(SUM(CASE WHEN supp_nation = '{SHARE_NATION}' THEN v ELSE 0 END)
                      AS DOUBLE)
                 / CAST(SUM(v) AS DOUBLE) * 10000 + 0.5) / 10000 AS share
    FROM vol
    GROUP BY r_name, o_year
    ORDER BY r_name, o_year
    """,
)
def q86_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    vol = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(_t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(_t(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(_t(spark, sf_dir, "supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .select(
            "r_name",
            F.year("o_orderdate").cast("long").alias("o_year"),
            "supp_nation",
            (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("v"),
        )
    )
    nation_v = F.sum(
        F.when(F.col("supp_nation") == SHARE_NATION, F.col("v")).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    total_v = F.sum("v")
    return (
        vol.groupBy("r_name", "o_year")
        .agg(
            nation_v.cast("double").alias("nation_vol"),
            total_v.cast("double").alias("total_vol"),
            (
                F.floor(
                    nation_v.cast("double") / total_v.cast("double") * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("share"),
        )
        .orderBy("r_name", "o_year")
    )


# ---------------------------------------------------------------------------
# Q92 — TPC-H Q18 shape: large-quantity orders (HAVING on a grouped child,
# joined back to its dimensions). The aggregate-then-semi-join-back plan:
# the lineitem-per-order sum is computed ONCE, filtered, and only the
# surviving (rare) order keys flow into the customer/orders joins — at
# 100 TB the filter cuts the join input by ~100x before any wide row is
# built. Quantity sums are exact DECIMAL (relational.py rule) so the
# HAVING threshold cannot flip on float summation order.
# ---------------------------------------------------------------------------

Q92_MIN_QTY = 250


@query(
    "q92_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {Q92_MIN_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           epoch_ms(o.o_orderdate) AS orderdate_ms,
           o.o_totalprice,
           CAST(big.total_qty AS DOUBLE) AS total_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q92_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > Q92_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("orderdate_ms"),
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q93 — TPC-H Q13 shape: customer order-count distribution (double
# aggregate over a LEFT OUTER join, zero-order customers included). The
# first aggregate shuffles on c_custkey (the outer join's own key — AQE
# coalesces the two into one exchange); the second aggregate's domain is
# |distinct order counts| — tiny, map-side combined.
# ---------------------------------------------------------------------------


@query(
    "q93_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q93_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q94 — TPC-H Q10 shape: returned-item revenue report. The lineitem spine
# is filtered on l_returnflag AT THE SCAN (pushed filter), aggregated to
# per-customer revenue BEFORE the customer/nation joins (aggregate
# pushdown by construction — the join input is |customers with returns|,
# not |return lineitems|), nation broadcast. Exact-decimal revenue.
# ---------------------------------------------------------------------------


@query(
    "q94_returned_item_revenue",
    oracle="""
    WITH rev AS (
      SELECT o.o_custkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revenue
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
      GROUP BY o.o_custkey
    )
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(rev.revenue AS DOUBLE) AS revenue, c.c_acctbal
    FROM rev
    JOIN customer c ON rev.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q94_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .alias("revenue")
        )
    )
    return (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("revenue").cast("double").alias("revenue"),
            "c_acctbal",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
