"""Q83 — BPE tokenizer-trainer merges (the HuggingFace-trainer shape).

Byte-pair-encoding induction over the corpus: count word frequencies
ONCE (the only corpus-scale pass), then run BPE_ROUNDS merge rounds
over the vocabulary table — each round counts adjacent symbol pairs
weighted by word frequency, picks the most frequent pair
(tie-break: count DESC, s1 ASC, s2 ASC), and fuses every non-
overlapping occurrence left-to-right. Output: one row per round
(rnd, s1, s2, merged, cnt) — the learned merge table, which IS a BPE
tokenizer.

Exact-canonical merge application with a single string replace():
symbol sequences are stored as double-space-joined strings with
double-space sentinels ("  h  e  y  "), and a merge of (a, b) is
`replace(rep, ' a  b ', ' ab ')`. The pattern consumes one space of
each boundary and the replacement restores it, so consecutive
occurrences ("a a a a") all merge in ONE leftmost scan — byte-for-byte
the canonical BPE merge pass, with identical semantics in Spark
(`F.replace`) and DuckDB (`replace`), no regex, no iteration.

Scale notes (100 TB posture): this is how production BPE trainers
work — the corpus is touched exactly once (token hash-aggregate with
map-side combine); every merge round then runs on the VOCABULARY table
(orders of magnitude smaller; persisted), with a driver round-trip per
round collecting one (s1, s2, cnt) scalar — the same O(1)-per-round
driver traffic as k-means' centroids (q77). Pair counting per round is
a map-side-combined hash aggregate over vocab-sized input.

Reference parity: no analog (the reference is a relay); extends the
SURVEY §2b LLM-pipeline inventory (token counting q22/q33's training-
side sibling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.text import TOKEN_RE
from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import hot_tokens, persist_now

BPE_ROUNDS = 6


def _q83_oracle(rounds: int = BPE_ROUNDS) -> str:
    parts = [
        f"""
    tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS word
      FROM documents
    ),
    w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY word),
    r0 AS (
      SELECT freq, '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS rep
      FROM w
    )"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""
    p{i} AS (
      SELECT syms[i] AS s1, syms[i + 1] AS s2, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(rep), '  ') AS syms FROM r{i - 1}) t,
           unnest(range(1, len(syms))) AS u(i)
      GROUP BY 1, 2
      QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, s1, s2) = 1
    )"""
        )
        if i < rounds:
            parts.append(
                f"""
    r{i} AS (
      SELECT freq,
             replace(rep,
                     ' ' || (SELECT s1 FROM p{i}) || '  ' || (SELECT s2 FROM p{i}) || ' ',
                     ' ' || (SELECT s1 || s2 FROM p{i}) || ' ') AS rep
      FROM r{i - 1}
    )"""
            )
    rows = " UNION ALL ".join(
        f"SELECT {i} AS rnd, s1, s2, s1 || s2 AS merged, cnt FROM p{i}"
        for i in range(1, rounds + 1)
    )
    return f"WITH {','.join(parts)} {rows} ORDER BY rnd"


@query("q83_bpe_merges", oracle=_q83_oracle())
def q83_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the single corpus-scale pass: word frequencies
    words = persist_now(
        hot_tokens(spark, sf_dir)
        .select(F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.concat(
                F.lit("  "), F.regexp_replace("word", "(.)", "$1  ")
            ).alias("rep"),
        )
    )

    merges: list[tuple] = []
    rep_df = words
    for rnd in range(1, BPE_ROUNDS + 1):
        syms = F.split(F.trim(F.col("rep")), "  ")
        pair_structs = F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("s1"),
                F.element_at(syms, i + 1).alias("s2"),
            ),
        )
        best_rows = (
            rep_df.filter(F.size(syms) >= 2)
            .select("freq", F.explode(pair_structs).alias("p"))
            .groupBy("p.s1", "p.s2")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "s1", "s2")
            .limit(1)
            .collect()
        )
        if not best_rows:  # vocabulary fully merged (oracle rounds empty too)
            break
        best = best_rows[0]
        merges.append((rnd, best.s1, best.s2, best.s1 + best.s2, best.cnt))
        if rnd < BPE_ROUNDS:
            nxt = rep_df.select(
                "freq",
                F.replace(
                    "rep",
                    F.lit(f" {best.s1}  {best.s2} "),
                    F.lit(f" {best.s1}{best.s2} "),
                ).alias("rep"),
            )
            old, rep_df = rep_df, persist_now(nxt)
            if old is not words:
                old.unpersist()
    if rep_df is not words:
        rep_df.unpersist()
    words.unpersist()
    return spark.createDataFrame(
        merges, "rnd int, s1 string, s2 string, merged string, cnt bigint"
    ).orderBy("rnd")
