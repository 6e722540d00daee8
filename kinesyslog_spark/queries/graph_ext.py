"""Q140 — degree-oriented triangle counting over the co-ordered-parts
graph.

The third classic graph workload next to q40's connected components
and q72's PageRank. Graph: parts are nodes; an undirected edge links
two parts that appear in the same order (distinct pairs within
l_orderkey — per-order pair expansion is bounded by the max basket
size, 7 for TPC-H-shaped data, so the explode is O(|lineitem|)).

Algorithm (the standard distributed formulation — Suri & Vassilvitskii
"Counting Triangles and the Curse of the Last Reducer", WWW'11):
orient every edge from the lower to the higher endpoint in the total
order by (degree, id). Wedges are then built only at each edge's LOW
endpoint — sum over u of C(outdeg(u), 2) — which the degree ordering
bounds by O(m^1.5) overall instead of the hub-quadratic blowup a hot
node causes under id-ordering (the "last reducer"). Each triangle is
counted exactly once: its two lowest-ordered edges form the wedge, the
closing edge is matched by one equi-join.

The total order is compared LEXICOGRAPHICALLY on (degree, id) at join
time — no global ROW_NUMBER materialization, which would funnel the
whole node set through one partition at scale. Shuffles: the
distinct-edge build, the degree aggregate, and the wedge/closing
equi-join; the (node, degree) map is node-cardinality (orders of
magnitude below edges) and broadcasts. The oriented edge set is
persisted once (`persist_now`) because the wedge self-join and the
closing probe both read it.

Everything is integer arithmetic — bit-exact on both engines; the
DuckDB oracle replays the identical orientation rule, so wedge
construction and triangle sets match row-for-row. CTEs read more than
once are MATERIALIZED (the q83/q109 re-inlining lesson).

Reference parity: none (graph analytics are a Spark-side extension;
the reference has no query layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t
from kinesyslog_spark.tables import persist_now

TRI_TOPK = 20

_Q140_ORACLE = f"""
WITH items AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
edges0 AS MATERIALIZED (
  SELECT DISTINCT a.pk AS pa, b.pk AS pb
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
),
deg AS MATERIALIZED (
  SELECT node, COUNT(*) AS d FROM (
    SELECT pa AS node FROM edges0
    UNION ALL
    SELECT pb AS node FROM edges0
  ) GROUP BY node
),
eo AS MATERIALIZED (
  SELECT CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN e.pa ELSE e.pb END AS u,
         CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN e.pb ELSE e.pa END AS v,
         CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN db.d ELSE da.d END AS dv
  FROM edges0 e
  JOIN deg da ON e.pa = da.node
  JOIN deg db ON e.pb = db.node
),
tri AS MATERIALIZED (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM eo a
  JOIN eo b ON a.u = b.u AND (a.dv, a.v) < (b.dv, b.v)
  JOIN eo c ON c.u = a.v AND c.v = b.v
),
pern AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT CAST(node AS BIGINT) AS partkey,
       CAST(n_triangles AS BIGINT) AS n_triangles
FROM pern
ORDER BY n_triangles DESC, partkey
LIMIT {TRI_TOPK}
"""


def _lex_lt(d1, n1, d2, n2):
    """(d1, n1) < (d2, n2) lexicographically."""
    return (d1 < d2) | ((d1 == d2) & (n1 < n2))


@query("q140_triangle_count", oracle=_Q140_ORACLE)
def q140_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    b = items.select(F.col("ok"), F.col("pk").alias("pk_b"))
    edges = (
        items.join(b, "ok")
        .filter(F.col("pk") < F.col("pk_b"))
        .select(F.col("pk").alias("pa"), F.col("pk_b").alias("pb"))
        .distinct()
    )
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # (node, degree) is node-cardinality — tiny next to edges; broadcast.
    dega = F.broadcast(deg.select(F.col("node").alias("pa"), F.col("d").alias("da")))
    degb = F.broadcast(deg.select(F.col("node").alias("pb"), F.col("d").alias("db")))
    a_low = _lex_lt(F.col("da"), F.col("pa"), F.col("db"), F.col("pb"))
    eo = persist_now(
        edges.join(dega, "pa")
        .join(degb, "pb")
        .select(
            F.when(a_low, F.col("pa")).otherwise(F.col("pb")).alias("u"),
            F.when(a_low, F.col("pb")).otherwise(F.col("pa")).alias("v"),
            F.when(a_low, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    wedge = (
        eo.alias("a")
        .join(
            eo.alias("b"),
            (F.col("a.u") == F.col("b.u"))
            & _lex_lt(F.col("a.dv"), F.col("a.v"), F.col("b.dv"), F.col("b.v")),
        )
        .select(
            F.col("a.u").alias("x"), F.col("a.v").alias("y"), F.col("b.v").alias("z")
        )
    )
    tri = wedge.join(
        eo.select(F.col("u").alias("y"), F.col("v").alias("z")), ["y", "z"]
    )
    pern = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        pern.select(
            F.col("node").cast("long").alias("partkey"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
        .orderBy(F.col("n_triangles").desc(), "partkey")
        .limit(TRI_TOPK)
    )
