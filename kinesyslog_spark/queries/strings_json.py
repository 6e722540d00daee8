"""String / JSON / text-token queries Q15, Q17, Q22 (SURVEY.md §2b).

These are the relational twins of the reference's per-message projections:
the P2 syslog regex family (message.py:11-17) shows up as regexp_extract,
P5's GELF JSON timestamp probe (message.py:81-88) as get_json_object.
All expressions are Catalyst built-ins — whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import hot_table, load_table


# ---------------------------------------------------------------------------
# Q15 — string function battery over part.p_name
# ---------------------------------------------------------------------------

@query(
    "q15_string_battery",
    oracle=r"""
    SELECT
      p_partkey,
      upper(p_name) AS name_upper,
      CAST(length(p_name) AS BIGINT) AS name_len,
      substr(p_name, 1, 5) AS name_prefix,
      concat(p_brand, ':', p_type) AS brand_type,
      trim(concat('  ', p_name, '  ')) AS name_trimmed,
      regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      replace(p_name, ' ', '_') AS name_snake,
      CAST(length(string_split(p_name, ' ')) AS BIGINT) AS n_words
    FROM part
    ORDER BY p_partkey
    """,
)
def q15_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Q17 — JSON extraction (mirrors P5, message.py:84: ujson.loads(...).get())
# ---------------------------------------------------------------------------

@query(
    "q17_json_extract",
    oracle="""
    SELECT
      event_id,
      event_type,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    ORDER BY event_id
    """,
)
def q17_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Q22 — token counting over documents (north-star text analysis; split +
# explode + groupBy is the Spark-native tokenizer hot path)
# ---------------------------------------------------------------------------

@query(
    "q22_top_tokens",
    oracle=r"""
    SELECT token, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\s+')) AS token
      FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def q22_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = hot_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), r"\s+")
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )
