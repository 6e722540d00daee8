"""Q154/Q155 — encoding-quality (mojibake) audit + readability scoring.

Two more members of the text-quality family (q31/q43/q69): the checks a
crawl-ingest pipeline runs before language-ID and quality filtering.

q154 — encoding-quality audit per source: counts of UTF-8 damage
signals — U+FFFD replacement characters, C1 control characters
(U+0080-U+009F, the classic latin-1-decoded-as-cp1252 residue), and
'Ã'-led digraphs (the UTF-8-decoded-as-latin-1 signature) — plus the
printable-ASCII fraction. The synthetic corpus is clean (all zeros,
ascii_frac 1.0) — the DETECTION arm is pinned on planted mojibake in
tests/test_textqual.py; the oracle pins the aggregation shape.

q155 — readability per document: Flesch reading-ease and
Flesch-Kincaid grade from exact integer counts — words (the shared
token regex), sentence terminators, and vowel-group syllable
estimates (vowel groups never span whitespace, so one text-level
regexp count equals the per-word sum). Degenerate sentence counts
clamp to 1.

Scale notes: both are map-only projections plus one hash aggregate
(q154) or none (q155, per-doc) — regexp_count/regexp_extract_all stay
in whole-stage codegen; no joins, no windows.

Reference parity: none (text-analysis extension, SURVEY §2b family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import hot_table

# UTF-8 damage signals (see module docstring)
_REPL = "�"
_C1 = "[\u0080-\u009f]"
_MOJI = "Ã."

_Q154_ORACLE = f"""
WITH d AS (
  SELECT source,
         len(regexp_extract_all(text, '{_REPL}')) AS n_repl,
         len(regexp_extract_all(text, '{_C1}')) AS n_c1,
         len(regexp_extract_all(text, '{_MOJI}')) AS n_moji,
         len(regexp_extract_all(text, '[ -~]')) AS n_ascii,
         strlen(text) AS n_chars
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_repl) AS BIGINT) AS repl_chars,
       CAST(SUM(n_c1) AS BIGINT) AS c1_chars,
       CAST(SUM(n_moji) AS BIGINT) AS moji_digraphs,
       CAST(SUM(CASE WHEN n_repl + n_c1 + n_moji > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS damaged_docs,
       ROUND(CAST(SUM(n_ascii) AS DOUBLE)
             / GREATEST(SUM(n_chars), 1), 6) AS ascii_frac
FROM d GROUP BY source ORDER BY source
"""


@query("q154_encoding_audit", oracle=_Q154_ORACLE)
def q154_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = hot_table(spark, sf_dir, "documents").select("source", "text")
    d = docs.select(
        "source",
        F.regexp_count("text", F.lit(_REPL)).alias("n_repl"),
        F.regexp_count("text", F.lit(_C1)).alias("n_c1"),
        F.regexp_count("text", F.lit(_MOJI)).alias("n_moji"),
        F.regexp_count("text", F.lit("[ -~]")).alias("n_ascii"),
        F.length("text").alias("n_chars"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_repl").alias("repl_chars"),
            F.sum("n_c1").alias("c1_chars"),
            F.sum("n_moji").alias("moji_digraphs"),
            F.sum(
                (
                    (F.col("n_repl") + F.col("n_c1") + F.col("n_moji")) > 0
                ).cast("long")
            ).alias("damaged_docs"),
            F.round(
                F.sum("n_ascii").cast("double")
                / F.greatest(F.sum("n_chars"), F.lit(1)),
                6,
            ).alias("ascii_frac"),
        )
        .orderBy("source")
    )


_Q155_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
           AS n_words,
         CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       ROUND(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / GREATEST(n_words, 1)),
             4) AS flesch_ease,
       ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
             + 11.8 * (CAST(n_syllables AS DOUBLE) / GREATEST(n_words, 1))
             - 15.59, 4) AS fk_grade
FROM d WHERE n_words > 0 ORDER BY doc_id
"""


@query("q155_readability", oracle=_Q155_ORACLE)
def q155_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = hot_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = docs.select(
        "doc_id",
        F.regexp_count(F.lower("text"), F.lit("[a-z0-9]+"))
        .cast("long").alias("n_words"),
        F.greatest(F.regexp_count("text", F.lit("[.!?]+")), F.lit(1))
        .cast("long").alias("n_sentences"),
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))
        .cast("long").alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.greatest(
        F.col("n_words"), F.lit(1)
    )
    return d.select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        F.round(F.lit(206.835) - 1.015 * wps - 84.6 * spw, 4)
        .alias("flesch_ease"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
    ).orderBy("doc_id")
