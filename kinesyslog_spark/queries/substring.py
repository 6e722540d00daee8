"""Q123 — EXACT variable-length substring deduplication (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022:
the ExactSubstr operator).

Unlike q80 (fixed 5-gram *coverage ratio*, an approximation), q123
returns the actual maximal duplicated token spans per document — the
char/token ranges an ExactSubstr pass would cut — for every duplicated
substring of >= SUBSTR_K tokens anywhere in the corpus (including a
second occurrence inside the SAME document, matching the paper's
suffix-array semantics where any other occurrence counts).

Why this is EXACT without a distributed suffix array
----------------------------------------------------
Window-union theorem: a token position p of document d lies inside some
duplicated substring of length >= k tokens IFF p is covered by a k-gram
window [i, i+k) whose gram occurs >= 2 times in the corpus.
  (=>) a duplicated span S of length >= k containing p contains a
       k-window over p, and that window's gram recurs wherever S does;
  (<=) a duplicated k-gram at i IS a duplicated substring of length k
       covering every p in [i, i+k).
So the union of duplicated-k-gram windows equals the union of all
duplicated spans of length >= k, and merging overlapping/adjacent
windows per document yields exactly the maximal duplicated regions the
suffix-array algorithm reports. Sorted-suffix machinery is not needed:
the theorem turns ExactSubstr into groupBy + join + one
gaps-and-islands window — all Catalyst-native.

Spark shape (scale posture at 100 TB):
- tokenize + k-gram emit are map-only (`transform`/`slice`/`md5`
  JVM expressions, zero Python) and run ONCE — the former
  aggregate + join-back shape evaluated this subtree twice;
- duplicated-gram detection is a count-over-partition window on the
  16-byte binary gram digest: one hash exchange of (doc_id, s, g),
  no broadcast of the duplicated-gram set (corpus-scale on
  boilerplate-heavy corpora, i.e. unbounded at 100 TB);
- span merge is one doc_id window (equal-width intervals sorted by
  start make `lag(end)` the running max, so one LAG + one running SUM
  suffice), bounded per-doc state.
No all-pairs, no materialized suffix array, no driver-side data.
md5 keying makes shuffle width constant regardless of k; both engines
hash the identical UTF-8 gram string (Spark groups on unhex(md5),
injective on the oracle's md5 hex), so the oracle is bit-exact.

Reference parity: none (no corpus surface in kinesyslog); this is the
LLM-pipeline north-star operator (VERDICT r3 next-round #1).
Brute-force pin: tests/test_substring.py compares against an
independent O(n^2) suffix-compare scan on small corpora (hypothesis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import hot_table

SUBSTR_K = 8  # minimum duplicated span length, in tokens

# Salt width for the two-level duplicated-gram count (guide §2.2) —
# the measured-and-shelved skew armor for the hot-gram window below
# (see the in-query note): salt = pmod(xxhash64(doc_id, s),
# SUBSTR_SALTS) is deterministic (guide §2.5 forbids rand-derived
# shuffle keys) and splits a hot gram across SUBSTR_SALTS level-1
# tasks; the salt arithmetic stays pinned by
# tests/test_substring.py::test_planted_hot_gram_skew so the form can
# be re-applied verbatim on a boilerplate-saturated corpus.
SUBSTR_SALTS = 16


def duplicated_spans(docs: DataFrame, k: int = SUBSTR_K,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Maximal duplicated token spans (>= k tokens) per document.

    Returns (doc_id, span_start, span_end, span_tokens): token-index
    ranges [span_start, span_end) into the canonical token stream
    (operators/text.tokens), widest-first merged. Exact per the
    window-union theorem in the module docstring.
    """
    from kinesyslog_spark.operators.text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("ts")
    ).filter(F.size("ts") >= k)
    # unhex(md5(...)): the gram key is the 16-byte binary digest, not the
    # 32-char hex string — same equality classes (unhex is injective on
    # md5 output, so dup detection and the oracle's md5-hex grouping
    # agree bit-for-bit), half the shuffle bytes per gram (guide §2.3).
    gpos = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(ts) - {k}),"
                f" i -> unhex(md5(array_join(slice(ts, i + 1, {k}), ' '))))"
            )
        ).alias("s", "g"),
    )
    # Duplicated-gram detection as a count-over-partition window rather
    # than groupBy + join-back: the former aggregate/join shape evaluated
    # the tokenize+md5 Generate subtree TWICE (once under the aggregate,
    # once on the join's stream side — plans/r12/q123_*_before.txt nodes
    # 12 and 18) and broadcast the full duplicated-gram set, which is
    # corpus-scale on a boilerplate-heavy corpus and dies at the 8 GiB
    # broadcast cap long before 100 TB. The window form computes the
    # grams ONCE and replaces the broadcast with one hash exchange on
    # the 16-byte gram key (guide §2.4: remove shuffles/recompute
    # outright; §3.3: no unbounded broadcast).
    #
    # KNOWN SKEW SURFACE, measured and deliberately kept (r13): every
    # occurrence of one gram co-locates in one window task with no
    # map-side collapse and no AQE skew handling (windows are exempt),
    # so a boilerplate gram carrying x% of the corpus pins x% of the
    # rows in one task. The guide §2.2 fix — two-level count by
    # (g, salt = pmod(xxhash64(doc_id, s), SUBSTR_SALTS)), positions
    # collapsed to per-bucket arrays, totals re-aggregated per gram —
    # was built, proven output-identical (planted-hot-gram test below
    # pins the salt arithmetic), and measured in interleaved noop A/Bs
    # at sf0.1: window 1.83-2.12 s vs two-level 2.43 (window level 2)
    # / 2.75 (hash-agg level 2). Unique grams dominate real corpora, so
    # level 1 collapses almost nothing and the second exchange re-ships
    # ~the whole gram stream — a guaranteed ~30% tax at every scale to
    # insure only the adversarial-boilerplate tail. Re-apply the
    # two-level form (tests/test_substring.py::test_planted_hot_gram_skew
    # documents the exact shape) if a target corpus shows a hot-gram
    # straggler here.
    hit = (
        gpos.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy("g"))
        )
        .filter(F.col("c") >= 2)
        .select("doc_id", "s", (F.col("s") + k).alias("e"))
    )
    w = Window.partitionBy("doc_id").orderBy("s")
    brk = hit.withColumn(
        "nw",
        F.when(F.col("s") > F.lag("e").over(w), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "gid",
        F.sum("nw").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        brk.groupBy("doc_id", "gid")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select(
            "doc_id", "span_start", "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def _q123_oracle() -> str:
    k = SUBSTR_K
    return f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
      FROM documents
    ), gpos AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ts) - {k} + 2),
                    i -> md5(array_to_string(ts[i:i+{k}-1], ' ')))) AS g,
             unnest(range(1, len(ts) - {k} + 2)) AS i
      FROM toks WHERE len(ts) >= {k}
    ), dup AS (
      SELECT g FROM gpos GROUP BY g HAVING COUNT(*) >= 2
    ), hit AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
             CAST(i - 1 + {k} AS BIGINT) AS e
      FROM gpos JOIN dup USING (g)
    ), brk AS (
      SELECT doc_id, s, e,
             CASE WHEN s > lag(e) OVER (PARTITION BY doc_id ORDER BY s)
                  THEN 1 ELSE 0 END AS nw
      FROM hit
    ), isl AS (
      SELECT doc_id, s, e,
             SUM(nw) OVER (PARTITION BY doc_id ORDER BY s
                           ROWS UNBOUNDED PRECEDING) AS gid
      FROM brk
    )
    SELECT doc_id,
           CAST(MIN(s) AS BIGINT) AS span_start,
           CAST(MAX(e) AS BIGINT) AS span_end,
           CAST(MAX(e) - MIN(s) AS BIGINT) AS span_tokens
    FROM isl GROUP BY doc_id, gid
    ORDER BY doc_id, span_start
    """


@query("q123_substring_dedup", oracle=_q123_oracle())
def q123_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = hot_table(spark, sf_dir, "documents")
    return (
        duplicated_spans(docs)
        .select(
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            F.col("span_tokens").cast("long").alias("span_tokens"),
        )
        .orderBy("doc_id", "span_start")
    )


# ---------------------------------------------------------------------------
# Q125 — APPLY the ExactSubstr spans: cut every duplicated span from the
# token stream and return the cleaned document (Lee et al.'s actual
# dedup step — q123 finds the ranges, q125 performs the removal; the
# paper cuts every occurrence, which in practice leaves the surrounding
# unique text to carry the content).
#
# Spark shape: q123's spans are re-grouped to one array per doc and the
# cut happens entirely in array expressions — filter over a position
# sequence with a nested-lambda span test, no token explosion, no
# per-position join. Docs without spans pass through whole (left join).
# The cleaned text is returned as token count + md5 (the driver's
# compare needs a bounded deterministic column, not a 2 KB string).
# ---------------------------------------------------------------------------


def _q125_oracle() -> str:
    return f"""
    WITH spans AS (
      SELECT * FROM ({_q123_oracle()})
    ), tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
      FROM documents
    ), spl AS (
      SELECT doc_id,
             list(struct_pack(s := span_start, e := span_end)) AS sp
      FROM spans GROUP BY doc_id
    ), j AS (
      SELECT tk.doc_id, tk.ts,
             COALESCE(spl.sp,
                      CAST([] AS STRUCT(s BIGINT, e BIGINT)[])) AS sp
      FROM tk LEFT JOIN spl ON spl.doc_id = tk.doc_id
    ), k AS (
      SELECT doc_id, ts,
             list_transform(
               list_filter(range(0, len(ts)),
                 i -> len(list_filter(sp,
                        p -> i >= p.s AND i < p.e)) = 0),
               i -> ts[i + 1]) AS kept
      FROM j
    )
    SELECT doc_id,
           CAST(len(ts) AS BIGINT) AS n_tokens,
           CAST(len(ts) - len(kept) AS BIGINT) AS dup_tokens,
           CAST(len(kept) AS BIGINT) AS kept_tokens,
           md5(COALESCE(array_to_string(kept, ' '), '')) AS kept_md5
    FROM k ORDER BY doc_id
    """


def cut_spans(docs: DataFrame, k: int = SUBSTR_K,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """q123's spans APPLIED: (doc_id, n_tokens, kept array<string>) with
    every duplicated >= k-token range removed from the token stream.
    Pure array expressions — no token explosion, no per-position join;
    docs without spans pass through whole."""
    from kinesyslog_spark.operators.text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("ts")
    )
    spl = (
        duplicated_spans(docs, k=k, id_col=id_col, text_col=text_col)
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            ).alias("sp")
        )
    )
    joined = toks.join(spl, "doc_id", "left").withColumn(
        "sp",
        F.coalesce(
            F.col("sp"),
            F.expr("CAST(array() AS ARRAY<STRUCT<s: BIGINT, e: BIGINT>>)"),
        ),
    )
    # sequence(0, -1) on a tokenless doc yields the DESCENDING [0, -1]
    # and element_at(ts, 1) then errors at runtime (same hazard as
    # curation._grams) — guard the empty case to a typed empty slice.
    kept = F.expr(
        "CASE WHEN size(ts) <= 0 THEN slice(ts, 1, 0) ELSE transform("
        "  filter(sequence(0, size(ts) - 1),"
        "         i -> NOT exists(sp, p -> i >= p.s AND i < p.e)),"
        "  i -> element_at(ts, i + 1)) END"
    )
    return joined.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_tokens"),
        kept.alias("kept"),
    )


@query("q125_substring_dedup_apply", oracle=_q125_oracle())
def q125_substring_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = hot_table(spark, sf_dir, "documents")
    return (
        cut_spans(docs)
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.size("kept")).cast("long")
            .alias("dup_tokens"),
            F.size("kept").cast("long").alias("kept_tokens"),
            F.md5(F.array_join("kept", " ")).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )
