"""Q173 — dedup threshold sweep: the planning curve behind "pick tau".

Before a dedup run, the operator question is "what does each threshold
COST?" — pairs flagged, documents dropped, tokens removed, as a curve
over the Jaccard cutoff. This query sweeps tau over q26's verified
pair set (candidates and exact Jaccard are computed ONCE at the
loosest threshold; the sweep is a broadcast of 5 literal cutoffs, not
5 dedup runs) and reports, per tau, the keep-lowest-id drop-set
estimate: every pair drops its higher-id member. That is an UPPER
BOUND on cluster-resolution dedup (q40/q107 keep one doc per
connected component; pairwise keep-min can drop both non-minimal
members of a chain) — the honest planning estimate that needs no
per-tau clustering pass.

Plan shape: one explode of the (pairs x 5 thresholds) table (pairs are
the verified near-dups — tiny next to the corpus), one distinct per
(tau, dropped doc), one join against per-doc token counts (broadcast
of the drop set into the counts, never a corpus reshuffle), one
aggregate per tau, plus a 1-row broadcast of corpus totals.

Reference parity: none (dedup-planning family; composes q26 and the
hot token counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.localframe import local_frame
from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.dedup import hot_minhash_pairs, minhash_vpairs_cte
from kinesyslog_spark.tables import hot_tokens

SWEEP = (0.5, 0.6, 0.7, 0.8, 0.9)

_Q173_ORACLE = f"""
WITH {minhash_vpairs_cte()},
taus AS (
  SELECT CAST(x AS DOUBLE) AS tau
  FROM (VALUES {", ".join(f"({t})" for t in SWEEP)}) v(x)
),
tl AS MATERIALIZED (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
           AS n_toks
  FROM documents
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens
  FROM tl
),
flagged AS (
  SELECT t.tau, v.doc_a, v.doc_b
  FROM vpairs v JOIN taus t ON v.jaccard >= t.tau
),
drops AS (
  SELECT DISTINCT tau, doc_b AS doc_id FROM flagged
),
per AS (
  SELECT d.tau,
         CAST(COUNT(*) AS BIGINT) AS n_docs_dropped,
         CAST(SUM(tl.n_toks) AS BIGINT) AS n_tokens_dropped
  FROM drops d JOIN tl ON tl.doc_id = d.doc_id
  GROUP BY d.tau
),
np AS (
  SELECT tau, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM flagged GROUP BY tau
)
SELECT t.tau,
       COALESCE(np.n_pairs, 0) AS n_pairs,
       COALESCE(p.n_docs_dropped, 0) AS n_docs_dropped,
       COALESCE(p.n_tokens_dropped, 0) AS n_tokens_dropped,
       FLOOR(COALESCE(p.n_tokens_dropped, 0)
             / CAST(tot.n_tokens AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS token_frac_dropped
FROM taus t
CROSS JOIN tot
LEFT JOIN np ON np.tau = t.tau
LEFT JOIN per p ON p.tau = t.tau
ORDER BY t.tau
"""


@query("q173_dedup_threshold_sweep", oracle=_Q173_ORACLE)
def q173_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = hot_minhash_pairs(spark, sf_dir)
    taus = local_frame(spark, [(t,) for t in SWEEP], "tau double")
    tl = hot_tokens(spark, sf_dir).select(
        "doc_id", F.size("toks").cast("long").alias("n_toks")
    )
    tot = tl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
    flagged = pairs.join(
        F.broadcast(taus), F.col("jaccard") >= F.col("tau")
    ).select("tau", "doc_a", "doc_b")
    drops = flagged.select("tau", F.col("doc_b").alias("doc_id")).distinct()
    per = (
        drops.join(tl, "doc_id")
        .groupBy("tau")
        .agg(
            F.count(F.lit(1)).alias("n_docs_dropped"),
            F.sum("n_toks").cast("long").alias("n_tokens_dropped"),
        )
    )
    np_ = flagged.groupBy("tau").agg(F.count(F.lit(1)).alias("n_pairs"))
    return (
        taus.crossJoin(F.broadcast(tot))
        .join(F.broadcast(np_), "tau", "left")
        .join(F.broadcast(per), "tau", "left")
        .select(
            "tau",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs_dropped", F.lit(0)).cast("long")
            .alias("n_docs_dropped"),
            F.coalesce("n_tokens_dropped", F.lit(0)).cast("long")
            .alias("n_tokens_dropped"),
            (
                F.floor(
                    F.coalesce("n_tokens_dropped", F.lit(0)).cast("double")
                    / F.col("n_tokens") * 1000000 + 0.5
                ) / 1000000
            ).alias("token_frac_dropped"),
        )
        .orderBy("tau")
    )
