r"""Training-data hygiene operators over `documents` (north star):
benchmark decontamination and Gopher-style repetition filtering.

q42 — benchmark decontamination. The standard pre-training step of
removing documents that overlap an evaluation set (GPT-3 appendix C /
PaLM-style n-gram collision checks). The "benchmark" here is a
deterministic slice of the corpus (doc_id % 100 == 0) standing in for a
held-out eval suite; every other document is scored by the fraction of
its distinct word 8-grams that appear anywhere in the eval slice.

q43 — repetition metrics (Rae et al. 2021 "Gopher" §A1.1 repetition
rules): per-document duplicate-word fraction, top-word fraction, and
duplicate 2/3-gram fractions, plus the resulting keep/drop decision.

Scale notes (100 TB posture):
- q42's eval n-gram set is small (eval suites are MBs, not TBs) and is
  DISTINCT-ed then **broadcast** into the probe join — the corpus-side
  gram stream is never shuffled; the per-doc hit count aggregates with
  map-side partial combine on the natural doc_id grouping. At a corpus
  scale where the eval set outgrows broadcast, swap the broadcast for a
  bucketed join on a 60-bit gram hash (operators.text.md5_int60).
- q43's gram metrics are per-row array expressions (no shuffle); the
  word-frequency metrics explode + aggregate on doc_id with map-side
  combine — one shuffle of (doc_id, token) pairs, the minimum possible
  for an exact top-word count.

Reference parity: the reference has no corpus-hygiene surface; these are
north-star extensions (BASELINE.json) following SURVEY §2b determinism
rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.text import TOKEN_RE, word_shingles
from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import hot_tokens

DECONTAM_N = 8          # word n-gram size (PaLM uses 8; GPT-3 used 13)
EVAL_MOD = 100          # doc_id % EVAL_MOD == 0 -> "benchmark" slice
CONTAM_THR = 0.1        # flag docs with >= 10% eval-gram overlap
TOP_WORD_THR = 0.2      # Gopher: drop if top word > 20% of doc
DUP_3GRAM_THR = 0.9     # drop if < 10% of 3-grams are unique


# ---------------------------------------------------------------------------
# Q42 — eval-set decontamination via 8-gram collision
# ---------------------------------------------------------------------------

def _q42_oracle() -> str:
    n = DECONTAM_N
    return f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks FROM documents
    ), g AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - {n - 2}),
             i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS grams
      FROM tk WHERE len(toks) >= {n}
    ), eval_g AS (
      SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % {EVAL_MOD} = 0
    ), tr AS (
      SELECT doc_id, grams FROM g WHERE doc_id % {EVAL_MOD} <> 0
    ), hits AS (
      SELECT t.doc_id, count(*) AS n_hit
      FROM (SELECT doc_id, unnest(grams) AS gram FROM tr) t
      JOIN eval_g e ON t.gram = e.gram
      GROUP BY t.doc_id
    )
    SELECT tr.doc_id, CAST(len(tr.grams) AS BIGINT) AS n_grams,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           ROUND(coalesce(h.n_hit, 0) / CAST(len(tr.grams) AS DOUBLE), 4) AS contam_frac,
           CAST(CASE WHEN coalesce(h.n_hit, 0) / CAST(len(tr.grams) AS DOUBLE)
                >= {CONTAM_THR} THEN 1 ELSE 0 END AS INT) AS contaminated
    FROM tr LEFT JOIN hits h ON tr.doc_id = h.doc_id
    ORDER BY tr.doc_id
    """


@query("q42_decontaminate", oracle=_q42_oracle())
def q42_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        hot_tokens(spark, sf_dir)
        .filter(F.size("toks") >= DECONTAM_N)
        .select("doc_id", word_shingles(F.col("toks"), DECONTAM_N).alias("grams"))
    )
    is_eval = (F.col("doc_id") % EVAL_MOD) == 0
    eval_grams = (
        g.filter(is_eval).select(F.explode("grams").alias("gram")).distinct()
    )
    train = g.filter(~is_eval)
    # Probe side stays put; the (small) eval gram set broadcasts.
    hits = (
        train.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0)).cast("long")
    frac = n_hit.cast("double") / F.col("n_grams").cast("double")
    return (
        train.select("doc_id", F.size("grams").cast("long").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            n_hit.alias("n_hit"),
            F.round(frac, 4).alias("contam_frac"),
            F.when(frac >= CONTAM_THR, 1).otherwise(0).cast("int").alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Q43 — Gopher repetition metrics + keep/drop decision
# ---------------------------------------------------------------------------

def _q43_oracle() -> str:
    return f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks FROM documents
    ), d AS (
      SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) >= 3
    ), wc AS (
      SELECT doc_id, SUM(c) AS nw, COUNT(*) AS nd, MAX(c) AS topc
      FROM (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
        GROUP BY doc_id, tok
      ) GROUP BY doc_id
    ), g AS (
      SELECT doc_id, n,
        len(list_distinct(list_transform(range(1, n),
            i -> array_to_string(toks[i:i+1], ' ')))) AS d2,
        len(list_distinct(list_transform(range(1, n - 1),
            i -> array_to_string(toks[i:i+2], ' ')))) AS d3
      FROM d
    )
    SELECT g.doc_id,
      ROUND(1 - wc.nd / CAST(wc.nw AS DOUBLE), 4) AS dup_word_frac,
      ROUND(wc.topc / CAST(wc.nw AS DOUBLE), 4) AS top_word_frac,
      ROUND(1 - g.d2 / CAST(g.n - 1 AS DOUBLE), 4) AS dup_2gram_frac,
      ROUND(1 - g.d3 / CAST(g.n - 2 AS DOUBLE), 4) AS dup_3gram_frac,
      CAST(CASE WHEN wc.topc / CAST(wc.nw AS DOUBLE) <= {TOP_WORD_THR}
                 AND 1 - g.d3 / CAST(g.n - 2 AS DOUBLE) <= {DUP_3GRAM_THR}
           THEN 1 ELSE 0 END AS INT) AS keep
    FROM g JOIN wc ON g.doc_id = wc.doc_id
    ORDER BY g.doc_id
    """


@query("q43_repetition_filter", oracle=_q43_oracle())
def q43_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = hot_tokens(spark, sf_dir).filter(F.size("toks") >= 3)
    wc = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("nw"),
            F.count("*").alias("nd"),
            F.max("c").alias("topc"),
        )
    )
    g = d.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.size(word_shingles(F.col("toks"), 2)).alias("d2"),
        F.size(word_shingles(F.col("toks"), 3)).alias("d3"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    top_frac = dbl("topc") / dbl("nw")
    dup3 = F.lit(1) - dbl("d3") / (dbl("n") - 2)
    return (
        g.join(wc, "doc_id")
        .select(
            "doc_id",
            F.round(F.lit(1) - dbl("nd") / dbl("nw"), 4).alias("dup_word_frac"),
            F.round(top_frac, 4).alias("top_word_frac"),
            F.round(F.lit(1) - dbl("d2") / (dbl("n") - 1), 4).alias("dup_2gram_frac"),
            F.round(dup3, 4).alias("dup_3gram_frac"),
            F.when((top_frac <= TOP_WORD_THR) & (dup3 <= DUP_3GRAM_THR), 1)
            .otherwise(0).cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )
