"""Q145/Q146 — data-quality constraint audit + grouped mergeable HLL.

Q145 is the Deequ-style pre-flight every training-data pipeline runs
before a table is trusted: completeness, primary-key uniqueness,
referential integrity, value ranges, domain cardinality, and a
statistical band — one report row per constraint, computed in ONE
aggregate pass per table (each metric is a conditional aggregate, so
adding checks adds columns to an existing map-side-combined agg, never
another scan) plus one anti-join probe for the foreign key.

Q146 extends q134's HyperLogLog to GROUPED cardinality with an in-query
MERGE proof: per-segment registers built directly AND rebuilt as the
MAX-merge of per-shard register tables must yield identical estimates —
the semilattice property that lets a 1000-executor cluster (or W22's
stream epochs) sketch shards independently and combine them loss-free.

Scale notes:
- q145: per-table single-pass aggregates (1-row results), a broadcast
  anti-join for orphans (customer keys vs the orders probe — at 100 TB
  the fact side streams once), and the report rows are literal-stacked
  from 1-row frames: no shuffle beyond the aggregates themselves.
  Exactness: the mean-discount band uses integer cents
  (SUM of ROUND(x*100) as BIGINT) so both engines divide identical
  integers — never a float SUM whose addition order could differ.
- q146: register build is one hash-agg on (segment, j); the 64-row
  per-segment register tables and the segment grid are tiny broadcasts.

Reference parity: none (the reference trusts its inputs; auditing is
the Spark-side analytics extension, same posture as q139/q41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.text import md5_int60
from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.estimators import HLL_ALPHA, HLL_M
from kinesyslog_spark.queries.relational import _t

QTY_LO, QTY_HI = 1.0, 50.0
DISC_CENTS_LO, DISC_CENTS_HI = 0.0, 10.0
RF_DOMAIN_MAX = 3
EMPTY_TEXT_MAX_FRAC = 0.5

_Q145_ORACLE = f"""
WITH li AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT) AS null_shipdate,
         MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax,
         CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
           AS disc_cents,
         CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS rf
  FROM lineitem
), od AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS pk
  FROM orders
), orph AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
), dc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (length(text) = 0) AS BIGINT) AS empties
  FROM documents
), ev AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS null_type
  FROM events
)
SELECT * FROM (
  SELECT 'lineitem_rows_nonzero' AS check_name,
         CAST(li.n AS DOUBLE) AS metric,
         CAST(CASE WHEN li.n > 0 THEN 1 ELSE 0 END AS INTEGER) AS passed
  FROM li
  UNION ALL
  SELECT 'lineitem_shipdate_complete', CAST(null_shipdate AS DOUBLE),
         CAST(CASE WHEN null_shipdate = 0 THEN 1 ELSE 0 END AS INTEGER)
  FROM li
  UNION ALL
  SELECT 'lineitem_quantity_range', ROUND(qmax, 6),
         CAST(CASE WHEN qmin >= {QTY_LO} AND qmax <= {QTY_HI}
              THEN 1 ELSE 0 END AS INTEGER)
  FROM li
  UNION ALL
  SELECT 'lineitem_discount_mean_band',
         ROUND(CAST(disc_cents AS DOUBLE) / li.n, 6),
         CAST(CASE WHEN CAST(disc_cents AS DOUBLE) / li.n
                        BETWEEN {DISC_CENTS_LO} AND {DISC_CENTS_HI}
              THEN 1 ELSE 0 END AS INTEGER)
  FROM li
  UNION ALL
  SELECT 'lineitem_returnflag_domain', CAST(rf AS DOUBLE),
         CAST(CASE WHEN rf <= {RF_DOMAIN_MAX} THEN 1 ELSE 0 END AS INTEGER)
  FROM li
  UNION ALL
  SELECT 'orders_pk_unique', CAST(od.n - od.pk AS DOUBLE),
         CAST(CASE WHEN od.n = od.pk THEN 1 ELSE 0 END AS INTEGER)
  FROM od
  UNION ALL
  SELECT 'orders_custkey_orphans', CAST(orph.n AS DOUBLE),
         CAST(CASE WHEN orph.n = 0 THEN 1 ELSE 0 END AS INTEGER)
  FROM orph
  UNION ALL
  SELECT 'documents_empty_text_frac',
         ROUND(CAST(empties AS DOUBLE) / dc.n, 6),
         CAST(CASE WHEN CAST(empties AS DOUBLE) / dc.n
                        < {EMPTY_TEXT_MAX_FRAC}
              THEN 1 ELSE 0 END AS INTEGER)
  FROM dc
  UNION ALL
  SELECT 'events_type_complete', CAST(null_type AS DOUBLE),
         CAST(CASE WHEN null_type = 0 THEN 1 ELSE 0 END AS INTEGER)
  FROM ev
) ORDER BY check_name
"""


@query("q145_data_quality_audit", oracle=_Q145_ORACLE)
def q145_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("l_shipdate")).alias("null_shipdate"),
        F.min("l_quantity").alias("qmin"),
        F.max("l_quantity").alias("qmax"),
        F.sum(F.round(F.col("l_discount") * 100).cast("long"))
        .alias("disc_cents"),
        F.count_distinct("l_returnflag").alias("rf"),
    )
    od = _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("on"),
        F.count_distinct("o_orderkey").alias("pk"),
    )
    orph = (
        _t(spark, sf_dir, "orders")
        .select("o_custkey")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer").select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    dc = _t(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("dn"),
        F.sum((F.length("text") == 0).cast("long")).alias("empties"),
    )
    ev = _t(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("en"),
        (F.count(F.lit(1)) - F.count("event_type")).alias("null_type"),
    )
    m = (
        li.crossJoin(F.broadcast(od))
        .crossJoin(F.broadcast(orph))
        .crossJoin(F.broadcast(dc))
        .crossJoin(F.broadcast(ev))
    )

    def row(name, metric, passed):
        return F.struct(
            F.lit(name).alias("check_name"),
            metric.cast("double").alias("metric"),
            passed.cast("int").alias("passed"),
        )

    disc_mean = F.col("disc_cents").cast("double") / F.col("n")
    empty_frac = F.col("empties").cast("double") / F.col("dn")
    checks = F.array(
        row("lineitem_rows_nonzero", F.col("n"),
            (F.col("n") > 0).cast("int")),
        row("lineitem_shipdate_complete", F.col("null_shipdate"),
            (F.col("null_shipdate") == 0).cast("int")),
        row("lineitem_quantity_range", F.round("qmax", 6),
            ((F.col("qmin") >= QTY_LO) & (F.col("qmax") <= QTY_HI))
            .cast("int")),
        row("lineitem_discount_mean_band", F.round(disc_mean, 6),
            ((disc_mean >= DISC_CENTS_LO) & (disc_mean <= DISC_CENTS_HI))
            .cast("int")),
        row("lineitem_returnflag_domain", F.col("rf"),
            (F.col("rf") <= RF_DOMAIN_MAX).cast("int")),
        row("orders_pk_unique", F.col("on") - F.col("pk"),
            (F.col("on") == F.col("pk")).cast("int")),
        row("orders_custkey_orphans", F.col("orphans"),
            (F.col("orphans") == 0).cast("int")),
        row("documents_empty_text_frac", F.round(empty_frac, 6),
            (empty_frac < EMPTY_TEXT_MAX_FRAC).cast("int")),
        row("events_type_complete", F.col("null_type"),
            (F.col("null_type") == 0).cast("int")),
    )
    return (
        m.select(F.explode(checks).alias("c"))
        .select("c.check_name", "c.metric", "c.passed")
        .orderBy("check_name")
    )


# ---------------------------------------------------------------------------
# Q146 — grouped HLL with shard-merge proof
# ---------------------------------------------------------------------------

_Q146_ORACLE = f"""
WITH h AS (
  SELECT c_mktsegment AS seg, c_custkey % 2 AS shard,
         CAST('0x' || substring(md5('hllg:' || c_custkey), 1, 15) AS BIGINT)
           AS hv
  FROM customer
), jr AS (
  SELECT seg, shard, hv % {HLL_M} AS j,
         CASE WHEN hv >> 6 = 0 THEN 55
              ELSE 54 - length(bin(hv >> 6)) + 1 END AS r
  FROM h
), segs AS (SELECT DISTINCT seg FROM jr),
grid AS (
  SELECT s.seg, g.j
  FROM segs s CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS j) g
),
direct AS (
  SELECT g.seg, g.j, COALESCE(MAX(jr.r), 0) AS m_j
  FROM grid g LEFT JOIN jr ON jr.seg = g.seg AND jr.j = g.j
  GROUP BY g.seg, g.j
),
shards AS (
  SELECT seg, shard, j, MAX(r) AS m_j FROM jr GROUP BY seg, shard, j
),
merged AS (
  SELECT g.seg, g.j, COALESCE(MAX(s.m_j), 0) AS m_j
  FROM grid g LEFT JOIN shards s ON s.seg = g.seg AND s.j = g.j
  GROUP BY g.seg, g.j
),
zd AS (
  SELECT seg,
         CAST(SUM(1::BIGINT << CAST(55 - m_j AS INTEGER)) AS BIGINT) AS zs
  FROM direct GROUP BY seg
),
zm AS (
  SELECT seg,
         CAST(SUM(1::BIGINT << CAST(55 - m_j AS INTEGER)) AS BIGINT) AS zs
  FROM merged GROUP BY seg
),
ex AS (
  SELECT c_mktsegment AS seg,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_exact
  FROM customer GROUP BY seg
)
SELECT ex.seg AS segment, ex.n_exact,
       CAST(FLOOR({HLL_ALPHA} * {HLL_M} * {HLL_M} * (1::BIGINT << 55)
                  / CAST(zd.zs AS DOUBLE)) AS BIGINT) AS est_direct,
       CAST(FLOOR({HLL_ALPHA} * {HLL_M} * {HLL_M} * (1::BIGINT << 55)
                  / CAST(zm.zs AS DOUBLE)) AS BIGINT) AS est_merged,
       CAST(CASE WHEN zd.zs = zm.zs THEN 1 ELSE 0 END AS INTEGER)
         AS merge_identical
FROM ex JOIN zd ON zd.seg = ex.seg JOIN zm ON zm.seg = ex.seg
ORDER BY segment
"""


@query("q146_grouped_hll_merge", oracle=_Q146_ORACLE)
def q146_grouped_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_custkey") % 2).alias("shard"),
        F.col("c_custkey"),
        md5_int60(F.col("c_custkey").cast("string"), prefix="hllg:")
        .alias("hv"),
    )
    jr = cust.select(
        "seg", "shard",
        (F.col("hv") % HLL_M).alias("j"),
        F.when(F.expr("shiftright(hv, 6)") == 0, F.lit(55))
        .otherwise(55 - F.length(F.expr("bin(shiftright(hv, 6))")))
        .alias("r"),
    )
    segs = jr.select("seg").distinct()
    grid = segs.crossJoin(
        F.broadcast(spark.range(HLL_M).select(F.col("id").alias("j")))
    )
    direct = (
        grid.join(jr.groupBy("seg", "j").agg(F.max("r").alias("r")),
                  ["seg", "j"], "left")
        .select("seg", "j", F.coalesce("r", F.lit(0)).alias("m_j"))
    )
    shards = jr.groupBy("seg", "shard", "j").agg(F.max("r").alias("m_j"))
    merged = (
        grid.join(shards.groupBy("seg", "j").agg(F.max("m_j").alias("m")),
                  ["seg", "j"], "left")
        .select("seg", "j", F.coalesce("m", F.lit(0)).alias("m_j"))
    )

    def zsum(regs, name):
        return regs.groupBy("seg").agg(
            F.sum(F.expr("shiftleft(1L, cast(55 - m_j as int))")).alias(name)
        )

    zd = zsum(direct, "zs_d")
    zm = zsum(merged, "zs_m")
    ex = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count_distinct("c_custkey").alias("n_exact"))
    )

    def est(zs_col):
        return F.floor(
            F.lit(HLL_ALPHA) * HLL_M * HLL_M * F.expr("shiftleft(1L, 55)")
            / F.col(zs_col).cast("double")
        ).cast("long")

    return (
        ex.join(F.broadcast(zd), "seg")
        .join(F.broadcast(zm), "seg")
        .select(
            F.col("seg").alias("segment"),
            F.col("n_exact").cast("long").alias("n_exact"),
            est("zs_d").alias("est_direct"),
            est("zs_m").alias("est_merged"),
            (F.col("zs_d") == F.col("zs_m")).cast("int")
            .alias("merge_identical"),
        )
        .orderBy("segment")
    )
