"""Q114 — Bloom-filter decontamination: q42's eval-gram membership test
through a BLOOM SKETCH instead of the exact gram set, with the false-
positive cost measured against the exact answer on the same corpus.

Why it exists: q42 broadcasts the distinct eval grams — fine while eval
suites are MBs. The bloom form compresses membership to M bits
(BLOOM_M = 2^13 here, i.e. 1 KiB — deliberately tight so the sf0.01
false-positive count is non-zero and exactly checkable) regardless of
gram count — the standard trick when the filter must ship to every
executor of a 1000-node cluster or into the W15-style continuous
scorer; production sizes M for the target FP rate. The sketch
is DETERMINISTIC (k md5-derived positions per gram, the md5_int60
convention), so a SQL oracle reproduces it bit-for-bit and the
false-positive rate is an exact, checkable number — not a probability
claim.

Declarative form: the "bitset" is the distinct occupied-position table
(<= 3 * |eval grams| rows, bounded by M) broadcast into a map-only
probe; a gram "hits" iff all BLOOM_K of its positions are occupied.
At deployment scale the positions fold into a bitmask array; the
position-set form is the plan-equivalent the oracle can replay.

Output per corpus document: distinct-gram count, bloom hits, exact
hits (q42 semantics), and the per-doc false-positive count — bloom
hits can only over-count (one-sided error, like q50's HLL bound).

Scale notes (100 TB posture): eval side is two tiny aggregates; the
corpus gram stream maps to (gram, 3 positions) and joins the BROADCAST
position set — never shuffled; per-doc aggregation rides the doc_id
combine. Registered late (driver window untouched).

Reference parity: north-star extension (no reference analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.text import md5_int60, word_shingles
from kinesyslog_spark.queries import query

from kinesyslog_spark.tables import hot_tokens

BLOOM_M = 1 << 13  # bits — sized so the sf0.01 load factor yields a
                   # measurable (exactly checkable) false-positive count
BLOOM_K = 3        # hash functions
BLOOM_N = 3        # word n-gram size (3-grams overlap across docs; the
                   # 8-gram q42 slice has zero cross-slice collisions in
                   # the synthetic corpus — degenerate for an FP study)
BLOOM_EVAL_MOD = 20  # doc_id % 20 == 0 -> eval slice


def _q114_oracle() -> str:
    n = BLOOM_N
    pos = (
        "CAST('0x' || substring(md5('b' || j || ':' || g), 1, 15) AS BIGINT)"
        f" % {BLOOM_M}"
    )
    return f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - {n - 2}),
             i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS grams
      FROM tk WHERE len(toks) >= {n}
    ), ev AS (
      SELECT DISTINCT unnest(grams) AS g FROM g WHERE doc_id % {BLOOM_EVAL_MOD} = 0
    ), bloom AS (
      SELECT DISTINCT {pos} AS pos
      FROM ev CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) jj
    ), cg AS (
      SELECT doc_id, unnest(grams) AS g FROM g WHERE doc_id % {BLOOM_EVAL_MOD} <> 0
    ), cp AS (
      SELECT doc_id, g, {pos} AS pos
      FROM cg CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) jj
    ), probe AS (
      SELECT cp.doc_id, cp.g,
             SUM(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS k_hit
      FROM cp LEFT JOIN bloom b ON b.pos = cp.pos
      GROUP BY cp.doc_id, cp.g
    ), scored AS (
      SELECT p.doc_id,
             CASE WHEN p.k_hit = {BLOOM_K} THEN 1 ELSE 0 END AS bloom_hit,
             CASE WHEN ev.g IS NULL THEN 0 ELSE 1 END AS exact_hit
      FROM probe p LEFT JOIN ev ON p.g = ev.g
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(bloom_hit) AS BIGINT) AS bloom_hits,
           CAST(SUM(exact_hit) AS BIGINT) AS exact_hits,
           CAST(SUM(bloom_hit) - SUM(exact_hit) AS BIGINT) AS false_pos
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """


@query("q114_bloom_decontam", oracle=_q114_oracle())
def q114_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = hot_tokens(spark, sf_dir)
    g = (
        toks.filter(F.size("toks") >= BLOOM_N)
        .select(
            "doc_id", word_shingles(F.col("toks"), BLOOM_N).alias("grams")
        )
    )
    ev = (
        g.filter(F.col("doc_id") % BLOOM_EVAL_MOD == 0)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(BLOOM_K)])).alias("j")
    bloom = (
        ev.select("g", js)
        .select(
            (
                md5_int60(
                    F.concat(F.lit("b"), F.col("j"), F.lit(":"), F.col("g"))
                )
                % BLOOM_M
            ).alias("pos")
        )
        .distinct()
        .withColumn("occ", F.lit(1))
    )
    cg = (
        g.filter(F.col("doc_id") % BLOOM_EVAL_MOD != 0)
        .select("doc_id", F.explode("grams").alias("g"))
    )
    probe = (
        cg.select("doc_id", "g", js)
        .withColumn(
            "pos",
            md5_int60(F.concat(F.lit("b"), F.col("j"), F.lit(":"), F.col("g")))
            % BLOOM_M,
        )
        .join(F.broadcast(bloom), "pos", "left")
        .groupBy("doc_id", "g")
        .agg(F.sum(F.coalesce(F.col("occ"), F.lit(0))).alias("k_hit"))
    )
    scored = (
        probe.join(ev.withColumn("ex", F.lit(1)), "g", "left")
        .select(
            "doc_id",
            F.when(F.col("k_hit") == BLOOM_K, 1).otherwise(0).alias("bloom_hit"),
            F.coalesce(F.col("ex"), F.lit(0)).alias("exact_hit"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("bloom_hit").cast("long").alias("bloom_hits"),
            F.sum("exact_hit").cast("long").alias("exact_hits"),
            (F.sum("bloom_hit") - F.sum("exact_hit")).cast("long").alias("false_pos"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Q115 — Count-Min Sketch token frequencies: the point-estimate
# frequency sketch (Cormode & Muthukrishnan 2005) completing the sketch
# family (HLL q50, Misra-Gries q79, Space-Saving W14, Bloom q114,
# winnowing q32). CMS_D md5-derived hash rows x CMS_W counters; a
# token's estimate is the MIN over its row cells, which can only
# OVER-count (one-sided error) — measured here against the exact counts
# of the exact top-20 tokens (q22's ordering), so the overcount column
# is an exactly-checkable output.
#
# Scale notes: the sketch build is one aggregate to CMS_D * CMS_W cells
# (map-side combined — the token stream never shuffles wider than the
# cell space); the probe side is the exact top-20 joined against the
# broadcast cell table. Deterministic md5 positions (md5_int60
# convention) make the oracle replay bit-exact.
# ---------------------------------------------------------------------------

CMS_D = 3     # hash rows
CMS_W = 1024  # counters per row — tight enough to measure collisions
CMS_TOPK = 20


def _q115_oracle() -> str:
    pos = (
        "CAST('0x' || substring(md5('c' || j || ':' || tok), 1, 15) AS BIGINT)"
        f" % {CMS_W}"
    )
    return f"""
    WITH tok_stream AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ), counts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM tok_stream GROUP BY tok
    ), cells AS (
      SELECT j, {pos} AS pos, CAST(SUM(true_count) AS BIGINT) AS cell
      FROM counts CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) jj
      GROUP BY j, pos
    ), top AS (
      SELECT tok, true_count FROM counts
      ORDER BY true_count DESC, tok LIMIT {CMS_TOPK}
    ), est AS (
      SELECT t.tok, t.true_count, MIN(c.cell) AS est_count
      FROM top t
      CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) jj
      JOIN cells c ON c.j = jj.j
                  AND c.pos = CAST('0x' || substring(md5('c' || jj.j || ':' || t.tok), 1, 15) AS BIGINT) % {CMS_W}
      GROUP BY t.tok, t.true_count
    )
    SELECT tok, true_count, est_count,
           CAST(est_count - true_count AS BIGINT) AS overcount
    FROM est
    ORDER BY true_count DESC, tok
    """


@query("q115_cms_frequencies", oracle=_q115_oracle())
def q115_cms_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = hot_tokens(spark, sf_dir)
    counts = (
        toks.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("true_count"))
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j")
    cpos = md5_int60(
        F.concat(F.lit("c"), F.col("j"), F.lit(":"), F.col("tok"))
    ) % CMS_W
    cells = (
        counts.select("tok", "true_count", js)
        .select("j", cpos.alias("pos"), "true_count")
        .groupBy("j", "pos")
        .agg(F.sum("true_count").alias("cell"))
    )
    top = counts.orderBy(F.desc("true_count"), "tok").limit(CMS_TOPK)
    est = (
        top.select("tok", "true_count", js)
        .select("tok", "true_count", "j", cpos.alias("pos"))
        .join(F.broadcast(cells), ["j", "pos"])
        .groupBy("tok", "true_count")
        .agg(F.min("cell").alias("est_count"))
    )
    return (
        est.select(
            "tok", "true_count", "est_count",
            (F.col("est_count") - F.col("true_count")).cast("long")
            .alias("overcount"),
        )
        .orderBy(F.desc("true_count"), "tok")
    )
