"""Funnel / sequence analytics over `events` — q59, q60.

q59 — ordered funnel: per user, the first time of each stage
(signup -> view -> click -> purchase); a stage counts only if it happens
strictly after the previous stage's first occurrence (the standard
product-analytics funnel definition). Output: per-stage reached-user
counts plus conversion rate from stage 1.

q60 — explicit GROUPING SETS through the engine's SQL surface:
revenue by ((nation, year), (nation), (year), ()) with GROUPING() flags
— the general form of q13's ROLLUP / q48's CUBE, and the only one of the
three that needs the SQL API (the DataFrame API exposes only
rollup/cube). Runs via `spark.sql` over registered views — exercising
the second query surface end-to-end (SURVEY "SQL API" section).

Scale notes: q59 is one hash aggregate per user (4 conditional MINs,
map-side combine) + a global roll-up of 4 counters — no join, no
window, no skew risk beyond user cardinality. q60 expands each input
row into its grouping-set combinations before the hash aggregate
(Spark's Expand operator) — 4 sets = 4x map-side rows, the standard
cost, still one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t
from kinesyslog_spark.tables import load_table

STAGES = ["signup", "view", "click", "purchase"]


def _q59_oracle() -> str:
    mins = ",\n      ".join(
        f"MIN(ts) FILTER (WHERE event_type = '{s}') AS t_{s}" for s in STAGES
    )
    return f"""
    WITH per_user AS (
      SELECT user_id, {mins}
      FROM events GROUP BY user_id
    ), flags AS (
      SELECT user_id,
        CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS s1,
        CASE WHEN t_signup IS NOT NULL AND t_view > t_signup THEN 1 ELSE 0 END AS s2,
        CASE WHEN t_signup IS NOT NULL AND t_view > t_signup AND t_click > t_view THEN 1 ELSE 0 END AS s3,
        CASE WHEN t_signup IS NOT NULL AND t_view > t_signup AND t_click > t_view AND t_purchase > t_click THEN 1 ELSE 0 END AS s4
      FROM per_user
    )
    SELECT stage, CAST(n_users AS BIGINT) AS n_users,
           FLOOR(n_users / CAST(total AS DOUBLE) * 10000 + 0.5) / 10000 AS conv
    FROM (
      SELECT 1 AS stage, SUM(s1) AS n_users, SUM(s1) AS total FROM flags
      UNION ALL SELECT 2, SUM(s2), SUM(s1) FROM flags
      UNION ALL SELECT 3, SUM(s3), SUM(s1) FROM flags
      UNION ALL SELECT 4, SUM(s4), SUM(s1) FROM flags
    )
    ORDER BY stage
    """


@query("q59_funnel", oracle=_q59_oracle())
def q59_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in STAGES
        ]
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & (F.col("t_click") > F.col("t_view"))
    s4 = s3 & (F.col("t_purchase") > F.col("t_click"))
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    flags = per_user.select(
        flag(s1).alias("s1"), flag(s2).alias("s2"),
        flag(s3).alias("s3"), flag(s4).alias("s4"),
    )
    tot = flags.agg(
        F.sum("s1").alias("n1"), F.sum("s2").alias("n2"),
        F.sum("s3").alias("n3"), F.sum("s4").alias("n4"),
    )
    stages = tot.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("stage"),
                        F.col(f"n{i + 1}").alias("n_users"),
                        F.col("n1").alias("total"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("s")
    ).select("s.stage", "s.n_users", "s.total")
    return stages.select(
        "stage",
        "n_users",
        # Shared floor quantization (q73 lesson): user-count denominators
        # are large enough to land on .00005 round boundaries.
        (
            F.floor(
                F.col("n_users") / F.col("total").cast("double") * 10000
                + F.lit(0.5)
            ) / 10000
        ).alias("conv"),
    ).orderBy("stage")


_Q60_SQL = """
SELECT n_name,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       GROUPING(n_name) AS g_nation,
       GROUPING({year_expr}) AS g_year,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name, {year_expr}), (n_name), ({year_expr}), ())
ORDER BY g_nation, g_year, n_name NULLS FIRST, order_year NULLS FIRST
"""


@query(
    "q60_grouping_sets",
    oracle=_Q60_SQL.format(year_expr="CAST(EXTRACT(year FROM o_orderdate) AS INT)"),
)
def q60_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL-surface query: GROUPING SETS has no DataFrame equivalent
    # (only rollup/cube), so this runs through spark.sql over temp views
    # — the same text DuckDB runs, modulo the year() spelling.
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        _Q60_SQL.format(year_expr="CAST(EXTRACT(year FROM o_orderdate) AS INT)")
    )
