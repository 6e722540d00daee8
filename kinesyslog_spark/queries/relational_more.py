"""Remaining TPC-H query shapes over the available columns: Q4 (EXISTS
semi-join), Q14 (conditional-aggregate ratio), Q15 (argmax vs a scalar
subquery), Q17 (per-group avg correlated subquery, decorrelated), Q22
(global scalar threshold + anti-join), Q19 (disjunctive multi-branch
predicate).

The test schema lacks partsupp / commitdate / receiptdate / phone, so each
query keeps the *plan shape* of its TPC-H counterpart on the columns that
exist (documented per query).  Together with q03/q53/q64/q85/q86/q92/q93/q94
this closes out the TPC-H join/subquery pattern space expressible on the
nine-table test schema.

Determinism contract (SURVEY §2b): exact-decimal money arithmetic; every
ratio comparison is cross-multiplied into exact decimal/integer form (no
float threshold can flip a row); double *outputs* are either exact decimal
casts or floor-quantized `floor(x*1e4+0.5)/1e4` on BOTH engines (q73
lesson); unique ordering keys throughout.

Scale notes (100 TB posture):
- q97: the EXISTS is a left-semi hash join on l_orderkey — one shuffle of
  each side on the join key, the non-equi shipdate predicate rides the
  equi-join; no correlated per-row probe.
- q98: single scan of one shipdate month (pushed to parquet), part join
  shuffles on partkey, the ratio is computed from one map-side-combined
  aggregate row.
- q99: per-supplier aggregate (shuffle on l_suppkey) then a 1-row MAX
  broadcast — the classic argmax-without-resort; supplier join broadcast.
- q100: per-part (sum, count) aggregate joined back to the filtered
  lineitems of one brand — both sides pre-filtered by the broadcast part
  dim, so the "correlated subquery" costs one aggregate of a ~1/|brands|
  slice, never a per-row subplan.
- q101: the global threshold is a 1-row aggregate broadcast into the
  filter; the no-orders test is a left-anti hash join on custkey (one
  shuffle), nation broadcast.
- q102: OR-of-ANDs evaluated after the partkey join; a derived coarse
  envelope (quantity/size upper bounds implied by the disjunction) is
  added Spark-side so the parquet scans prune — Catalyst does not infer
  range envelopes from an OR, but adding them is semantics-preserving.

Reference parity: relational surface beyond the reference (north-star
extension; the reference relay has no query layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t, dec


def _q4(c):
    """Shared 4-dp floor quantization (bit-identical on both engines)."""
    return F.floor(c * 10000 + F.lit(0.5)) / 10000


# ---------------------------------------------------------------------------
# Q97 — TPC-H Q4 shape: order-priority checking. EXISTS(lineitem shipped
# after the order date) as a left-semi join; the quarter filter is pushed
# to the orders scan. (No l_commitdate/l_receiptdate in the test schema,
# so "late line" = shipped strictly after the order date + 60 days.)
# ---------------------------------------------------------------------------


@query(
    "q97_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q97_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q98 — TPC-H Q14 shape: promo revenue share for one ship month. The
# disjoint-month filter reaches the lineitem scan; the part join shuffles
# on partkey; the CASE aggregate combines map-side. The percentage is
# exact-decimal until the final double division, then floor-quantized.
# ---------------------------------------------------------------------------


@query(
    "q98_promo_revenue_share",
    oracle="""
    SELECT
      'PROMO-1996-09' AS promo_month,
      FLOOR(
        100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
          * 10000 + 0.5) / 10000 AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q98_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            .alias("promo"),
            F.sum(rev).alias("total"),
        )
    )
    share = (
        F.lit(100.0)
        * F.col("promo").cast("double")
        / F.col("total").cast("double")
    )
    return agg.select(
        F.lit("PROMO-1996-09").alias("promo_month"),
        _q4(share).alias("promo_share_pct"),
    )


# ---------------------------------------------------------------------------
# Q99 — TPC-H Q15 shape: top supplier(s) by quarterly revenue, ties kept.
# The scalar MAX subquery becomes a 1-row broadcast joined on exact
# decimal equality (no float compare can drop a tied supplier).
# ---------------------------------------------------------------------------


@query(
    "q99_top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM rev r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q99_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q100 — TPC-H Q17 shape: revenue lost to small-quantity orders of one
# brand. The correlated `l_quantity < 0.2 * AVG(l_quantity) per part`
# decorrelates to a per-part (sum, count) aggregate joined back; the
# threshold compare is cross-multiplied into exact decimals:
#   l_q < 0.2 * (sum/n)  <=>  5 * l_q * n < sum   (n > 0).
# ---------------------------------------------------------------------------


@query(
    "q100_small_qty_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#23'
      GROUP BY l_partkey
    )
    SELECT 'Brand#23' AS brand,
      FLOOR(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / 7.0 * 10000 + 0.5) / 10000 AS avg_weekly_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pq ON l.l_partkey = pq.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND 5 * CAST(l.l_quantity AS DECIMAL(18,2)) * pq.n < pq.sum_qty
    """,
)
def q100_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    pq = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("sum_qty"), F.count("*").alias("n")
    )
    small = li.withColumnRenamed("l_partkey", "lk").join(
        pq, F.col("lk") == pq.l_partkey
    ).filter(F.lit(5) * dec("l_quantity") * F.col("n") < F.col("sum_qty"))
    total = small.agg(F.sum(dec("l_extendedprice")).alias("s"))
    return total.select(
        F.lit("Brand#23").alias("brand"),
        _q4(F.col("s").cast("double") / F.lit(7.0)).alias("avg_weekly_revenue"),
    )


# ---------------------------------------------------------------------------
# Q101 — TPC-H Q22 shape: "idle rich" customers — above the global average
# positive balance, with no RECENT orders (the synthetic data gives every
# customer at least one order ever, so "lapsed since 2000" keeps the
# anti-join non-degenerate, mirroring q06) — counted per nation. The
# global average compare is cross-multiplied (acctbal * n_pos > sum_pos,
# exact decimals); the no-recent-orders test is a left-anti join.
# ---------------------------------------------------------------------------


@query(
    "q101_idle_rich_customers",
    oracle="""
    WITH thr AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos,
             COUNT(*) AS n_pos
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    CROSS JOIN thr
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * thr.n_pos > thr.sum_pos
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q101_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("sum_pos"), F.count("*").alias("n_pos")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    nation = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    rich = (
        cust.crossJoin(F.broadcast(thr))
        .filter(dec("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return (
        rich.join(nation, rich.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Q102 — TPC-H Q19 shape: disjunctive brand/size/quantity branches. The
# OR-of-ANDs runs after the partkey join; Spark additionally pre-filters
# both scans with the coarse envelope the disjunction implies (quantity
# <= 40, size <= 25) — semantics-preserving, lets parquet prune.
# ---------------------------------------------------------------------------

_Q102_BRANCH = (
    "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 20) OR "
    "(p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 30) OR "
    "(p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 40)"
)


@query(
    "q102_disjunctive_revenue",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE {_Q102_BRANCH}
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q102_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = F.broadcast(
        _t(spark, sf_dir, "part")
        .select("p_partkey", "p_brand", "p_size")
        .filter(
            (F.col("p_size") >= 1)
            & (F.col("p_size") <= 25)
            & F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        )
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .filter((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 40))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(F.expr(_Q102_BRANCH))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Q111 — RANGE-interval window frame: 30-day trailing revenue per
# customer. The window battery (q51) covers the ranking functions and
# q09 the ROWS cumulative frame; this is the third frame kind — RANGE
# over an event-time interval (peer rows included by VALUE, not
# position), the moving-aggregate shape Spark expresses with a numeric
# rangeBetween over epoch seconds.
#
# Scale: one hash-partitioned window on o_custkey (per-customer state,
# no global sort); exact-decimal sums.
# ---------------------------------------------------------------------------


@query(
    "q111_trailing_window_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           epoch_ms(o_orderdate) AS orderdate_ms,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS trailing_30d
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def q111_trailing_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = _t(spark, sf_dir, "orders")
    win = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            F.sum(dec("o_totalprice")).over(win).cast("double").alias("trailing_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q112 — SCD2 point-in-time lookup: join each purchase event to the
# q81 dimension version valid AT its event time (valid_from <= ts <
# valid_to, open-ended current row). The standard warehouse
# "AS OF transaction time" join against a versioned dimension.
#
# Scale: equi-join on user_id (co-partitioned shuffle both sides) with
# the validity range as a residual predicate — the history side has
# O(runs per user) rows, so the per-key probe is tiny; no broadcast of
# a corpus-sized side, no interval explosion.
# ---------------------------------------------------------------------------


def _q112_oracle() -> str:
    from kinesyslog_spark.queries import ORACLE

    return f"""
    WITH hist AS (
      SELECT * FROM ({ORACLE["q81_scd2_history"]})
    ), pur AS (
      SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts_ms,
           h.tier AS tier_at_purchase, h.run_id
    FROM pur p
    LEFT JOIN hist h
      ON p.user_id = h.user_id
     AND p.ts_ms >= h.valid_from_ms
     AND (h.valid_to_ms IS NULL OR p.ts_ms < h.valid_to_ms)
    ORDER BY p.event_id
    """


@query("q112_scd2_point_in_time", oracle=_q112_oracle())
def q112_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesyslog_spark.queries.pipeline_ops import q81_scd2_history

    hist = q81_scd2_history(spark, sf_dir).select(
        F.col("user_id").alias("h_user"), "tier", "run_id",
        "valid_from_ms", "valid_to_ms",
    )
    pur = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        )
    )
    cond = (
        (pur.user_id == hist.h_user)
        & (F.col("ts_ms") >= F.col("valid_from_ms"))
        & (F.col("valid_to_ms").isNull() | (F.col("ts_ms") < F.col("valid_to_ms")))
    )
    return (
        pur.join(hist, cond, "left")
        .select(
            "event_id", "user_id", "ts_ms",
            F.col("tier").alias("tier_at_purchase"), "run_id",
        )
        .orderBy("event_id")
    )
