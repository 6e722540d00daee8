"""Q160 — single-pass column profiler (the lakehouse `describe`).

The data-profiling op every catalog/quality tool ships (Deequ
profiles, pandas-profiling, `ANALYZE TABLE`): one report row per
column of `lineitem` with null count, exact distinct cardinality, the
modal value with its frequency, and min/max — produced by STACKING the
columns into (column, value) rows once and hash-aggregating, never a
scan per column:

  - stack: one generated explode over a literal struct array (JVM-side,
    map-only; 11x row fan-out bounded by the column count);
  - per-(column, value) counts feed BOTH the exact distinct count and
    the modal value (max (count, value) struct — ties break to the
    LARGER value string, deterministic on both engines);
  - typed min/max ride ONE wide 1-row aggregate over the original
    columns (stringified stably: DATEs via DATE '...'-safe formatting,
    doubles via the shared 4-dp quantization).

At 100 TB the (column, value) aggregate's key space is the SUM of
per-column cardinalities — the same cost class as one distinct-count
per column, map-side combined; swap the exact-distinct arm for q134's
HLL registers when estimates suffice (q146 shows the grouped form).

Reference parity: none (relational/quality north-star; complements
q145's constraint audit — q145 asserts, q160 describes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t

# column -> stable string rendering (shared Spark/DuckDB)
_NUMERIC = {
    "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
    "l_linenumber": "bigint", "l_quantity": "double",
    "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
}
_STRINGY = {"l_returnflag": "string", "l_linestatus": "string"}
_DATES = {"l_shipdate": "date"}
_COLS = list(_NUMERIC) + list(_STRINGY) + list(_DATES)


def _render_sql(c: str) -> str:
    if c in _DATES:
        return f"strftime({c}, '%Y-%m-%d')"
    if _NUMERIC.get(c) == "double":
        return (
            f"CAST(CAST(FLOOR({c} * 10000 + 0.5) AS BIGINT) AS VARCHAR)"
        )
    return f"CAST({c} AS VARCHAR)"


def _render_agg_sql(c: str, agg: str) -> str:
    """Render AFTER the typed aggregate — a string-side MIN/MAX would
    compare lexicographically ('100' < '99')."""
    if c in _DATES:
        return f"strftime({agg}({c}), '%Y-%m-%d')"
    if _NUMERIC.get(c) == "double":
        return (f"CAST(CAST(FLOOR({agg}({c}) * 10000 + 0.5) AS BIGINT) "
                "AS VARCHAR)")
    return f"CAST({agg}({c}) AS VARCHAR)"


def _render_spark(c: str):
    if c in _DATES:
        return F.date_format(c, "yyyy-MM-dd")
    if _NUMERIC.get(c) == "double":
        return F.floor(F.col(c) * 10000 + 0.5).cast("long").cast("string")
    return F.col(c).cast("string")


def _oracle() -> str:
    per_col = []
    for c in _COLS:
        rmin, rmax = _render_agg_sql(c, "MIN"), _render_agg_sql(c, "MAX")
        per_col.append(f"""
  SELECT '{c}' AS column_name,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
         CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
         {rmin} AS min_repr,
         {rmax} AS max_repr
  FROM lineitem""")
    tops = []
    for c in _COLS:
        r = _render_sql(c)
        tops.append(f"""
  SELECT '{c}' AS column_name, v AS top_value, cnt AS top_count FROM (
    SELECT {r} AS v, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem WHERE {c} IS NOT NULL
    GROUP BY v ORDER BY cnt DESC, v DESC LIMIT 1
  )""")
    base = " UNION ALL ".join(per_col)
    top = " UNION ALL ".join(tops)
    return f"""
WITH base AS ({base}), top AS ({top})
SELECT b.column_name, b.n_rows, b.n_null, b.n_distinct,
       t.top_value, t.top_count, b.min_repr, b.max_repr
FROM base b JOIN top t ON t.column_name = b.column_name
ORDER BY b.column_name
"""


@query("q160_column_profile", oracle=_oracle())
def q160_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    stacked = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        _render_spark(c).alias("v"),
                    )
                    for c in _COLS
                ]
            )
        ).alias("e")
    ).select("e.column_name", "e.v")
    vc = (
        stacked.filter(F.col("v").isNotNull())
        .groupBy("column_name", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    percol = vc.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.max(F.struct("cnt", "v")).alias("top"),
        F.sum("cnt").alias("n_notnull"),
    )
    nulls = stacked.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("n_rows_all"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_null"),
    )
    # typed min/max in ONE wide 1-row aggregate, stacked to rows
    def _render_after(c, col):
        # typed aggregate first, render second (string MIN/MAX would
        # compare lexicographically)
        if c in _DATES:
            return F.date_format(col, "yyyy-MM-dd")
        if _NUMERIC.get(c) == "double":
            return F.floor(col * 10000 + 0.5).cast("long").cast("string")
        return col.cast("string")

    mm = li.agg(
        *[
            f
            for c in _COLS
            for f in (
                _render_after(c, F.min(c)).alias(f"mn_{c}"),
                _render_after(c, F.max(c)).alias(f"mx_{c}"),
            )
        ]
    )
    mm_rows = mm.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(f"mn_{c}").alias("min_repr"),
                        F.col(f"mx_{c}").alias("max_repr"),
                    )
                    for c in _COLS
                ]
            )
        ).alias("m")
    ).select("m.column_name", "m.min_repr", "m.max_repr")
    return (
        percol.join(nulls, "column_name")
        .join(F.broadcast(mm_rows), "column_name")
        .select(
            "column_name",
            F.col("n_rows_all").alias("n_rows"),
            "n_null",
            "n_distinct",
            F.col("top.v").alias("top_value"),
            F.col("top.cnt").alias("top_count"),
            "min_repr",
            "max_repr",
        )
        .orderBy("column_name")
    )
