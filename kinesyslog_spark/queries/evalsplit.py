"""Q169 — split-disciplined evaluation: train the NB model on the
TRAIN split only, report per-split binned AUC.

The missing discipline in q157/q158's self-train demo: a real pipeline
trains on `train` and reads its quality from `val`/`test` — the
generalization gap between the train-split AUC and the held-out AUCs
is the overfitting signal. Composes the q163 hash split, q157's
count-based NB (token-class counts + add-one smoothing, trained HERE
on train-split tokens only), and q159's mergeable binned-AUC form
evaluated per split on shared global score bins (fixed bins keep the
three AUCs comparable and make the state W29-foldable).

Determinism: the q157 conventions verbatim (log10 -> DECIMAL(12,6)
before any summation; decimal score sums), plus q159's window-free
binned estimator. Tokens unseen in training drop from scoring via the
inner model join (q157's convention) — a doc with NO trained token
drops from the eval, identically on both engines.

Plan shape: one exploded-token hash aggregate over the train split for
the model, one broadcast-model scoring join, one (split, bin) hash
aggregate, and three <=128-row broadcast cumulative self-joins. No
windows, no global rank — this is the form that scales past q158's
exact rank when the corpus is 100 TB and three AUC numbers are wanted
per epoch.

Reference parity: none (training-data-ops family; the eval-protocol
capstone of q157/q158/q159/q163).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.ml import AUC_BINS
from kinesyslog_spark.queries.splits import _SPLIT_SQL, split_assignment
from kinesyslog_spark.tables import hot_table, hot_tokens

_TOK = "[a-z0-9]+"

_Q169_ORACLE = f"""
WITH lab AS MATERIALIZED (
  SELECT doc_id, lang,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         regexp_extract_all(lower(text), '{_TOK}') AS toks
  FROM documents
  WHERE len(regexp_extract_all(lower(text), '{_TOK}')) > 0
),
sp AS MATERIALIZED (
  SELECT doc_id, {_SPLIT_SQL} AS split FROM documents
),
tok AS MATERIALIZED (
  SELECT doc_id, y, unnest(toks) AS w FROM lab
),
trn AS MATERIALIZED (
  SELECT t.doc_id, t.y, t.w
  FROM tok t JOIN sp ON sp.doc_id = t.doc_id
  WHERE sp.split = 'train'
),
cc AS MATERIALIZED (
  SELECT w,
         CAST(SUM(y) AS BIGINT) AS c_en,
         CAST(SUM(1 - y) AS BIGINT) AS c_ot
  FROM trn GROUP BY w
),
tot AS (
  SELECT CAST(SUM(c_en) AS BIGINT) AS t_en,
         CAST(SUM(c_ot) AS BIGINT) AS t_ot,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM cc
),
model AS MATERIALIZED (
  SELECT w,
         CAST(log10((c_en + 1.0) / (t_en + v)) AS DECIMAL(12,6)) AS le,
         CAST(log10((c_ot + 1.0) / (t_ot + v)) AS DECIMAL(12,6)) AS lo
  FROM cc CROSS JOIN tot
),
pri AS (
  SELECT CAST(log10(CAST(SUM(l.y) AS DOUBLE) / SUM(1 - l.y))
              AS DECIMAL(12,6)) AS p
  FROM lab l JOIN sp ON sp.doc_id = l.doc_id
  WHERE sp.split = 'train'
),
scores AS MATERIALIZED (
  SELECT t.doc_id, MIN(t.y) AS y,
         CAST(SUM(m.le - m.lo) AS DECIMAL(20,6)) + MIN(pri.p) AS score
  FROM tok t JOIN model m ON m.w = t.w CROSS JOIN pri
  GROUP BY t.doc_id
),
mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM scores),
b AS MATERIALIZED (
  SELECT sp.split, s.y,
         LEAST(CAST(FLOOR((s.score - mm.lo) / (mm.hi - mm.lo)
                          * {AUC_BINS}) AS BIGINT), {AUC_BINS - 1}) AS bkt
  FROM scores s JOIN sp ON sp.doc_id = s.doc_id CROSS JOIN mm
),
h AS MATERIALIZED (
  SELECT split, bkt,
         CAST(SUM(y) AS BIGINT) AS pos_b,
         CAST(SUM(1 - y) AS BIGINT) AS neg_b
  FROM b GROUP BY split, bkt
),
c AS (
  SELECT a.split, a.bkt, a.pos_b, a.neg_b,
         CAST(COALESCE(SUM(CASE WHEN o.bkt < a.bkt THEN o.neg_b END), 0)
              AS BIGINT) AS neg_below
  FROM h a LEFT JOIN h o ON o.split = a.split AND o.bkt <= a.bkt
  GROUP BY a.split, a.bkt, a.pos_b, a.neg_b
),
tt AS (
  SELECT split, CAST(SUM(pos_b) AS BIGINT) AS p,
         CAST(SUM(neg_b) AS BIGINT) AS n
  FROM h GROUP BY split
)
SELECT c.split, tt.p AS n_pos, tt.n AS n_neg,
       FLOOR(SUM(c.pos_b * (c.neg_below + c.neg_b / 2.0))
             / (CAST(tt.p AS DOUBLE) * tt.n) * 1000000 + 0.5) / 1000000
         AS auc_binned
FROM c JOIN tt ON tt.split = c.split
GROUP BY c.split, tt.p, tt.n
ORDER BY c.split
"""


@query("q169_split_disciplined_auc", oracle=_Q169_ORACLE)
def q169_split_disciplined_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    # Train/score passes derive from the postings artifact (the q157
    # pattern): instance sums == SUM(tf * ...) over (doc, token) rows.
    from kinesyslog_spark.tables import hot_postings

    docs = hot_table(spark, sf_dir, "documents").select("doc_id", "lang")
    ydocs = docs.select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y")
    )
    sp = hot_table(spark, sf_dir, "documents").select(
        "doc_id", split_assignment(F.col("doc_id")).alias("split")
    )
    tok = hot_postings(spark, sf_dir).join(ydocs, "doc_id")
    trn = tok.join(sp.filter(F.col("split") == "train"), "doc_id")
    cc = trn.groupBy(F.col("token").alias("w")).agg(
        F.sum(F.col("tf") * F.col("y")).alias("c_en"),
        F.sum(F.col("tf") * (1 - F.col("y"))).alias("c_ot"),
    )
    tot = cc.agg(
        F.sum("c_en").alias("t_en"),
        F.sum("c_ot").alias("t_ot"),
        F.count(F.lit(1)).alias("v"),
    )
    model = cc.crossJoin(F.broadcast(tot)).select(
        "w",
        F.log10((F.col("c_en") + 1.0) / (F.col("t_en") + F.col("v")))
        .cast("decimal(12,6)").alias("le"),
        F.log10((F.col("c_ot") + 1.0) / (F.col("t_ot") + F.col("v")))
        .cast("decimal(12,6)").alias("lo"),
    )
    # class prior over train-split DOCS with >= 1 token (the old lab
    # frame's row set)
    pri = (
        hot_tokens(spark, sf_dir)
        .filter(F.size("toks") > 0)
        .select("doc_id")
        .join(ydocs, "doc_id")
        .join(sp.filter(F.col("split") == "train"), "doc_id")
        .agg(
            F.log10(F.sum("y").cast("double") / F.sum(1 - F.col("y")))
            .cast("decimal(12,6)").alias("p")
        )
    )
    scores = (
        tok.join(F.broadcast(model), tok.token == model.w)
        .groupBy("doc_id")
        .agg(
            F.min("y").alias("y"),
            F.sum(F.col("tf") * (F.col("le") - F.col("lo")))
            .cast("decimal(20,6)")
            .alias("s0"),
        )
        .crossJoin(F.broadcast(pri))
        .select("doc_id", "y", (F.col("s0") + F.col("p")).alias("score"))
        .persist(StorageLevel.MEMORY_ONLY)
    )
    mm = scores.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    b = (
        scores.join(sp, "doc_id")
        .crossJoin(F.broadcast(mm))
        .select(
            "split", "y",
            F.least(
                F.floor(
                    (F.col("score") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * AUC_BINS
                ).cast("long"),
                F.lit(AUC_BINS - 1).cast("long"),
            ).alias("bkt"),
        )
    )
    # localCheckpoint the <=3*AUC_BINS-row histogram and compute all
    # three splits in ONE split-keyed cumulative pass (the shape the
    # oracle already uses) instead of three per-split
    # auc_from_histogram arms — the arms rebuilt the tiny frame per
    # split and tripled every exchange (round-6 verdict #4 measured 46
    # exchanges; scheduler cost, not data cost).
    h = (
        b.groupBy("split", "bkt")
        .agg(
            F.sum("y").cast("long").alias("pos_b"),
            F.sum(1 - F.col("y")).cast("long").alias("neg_b"),
        )
        .localCheckpoint()
    )
    o = h.select(
        F.col("split").alias("osplit"),
        F.col("bkt").alias("obkt"),
        F.col("neg_b").alias("oneg"),
    )
    c = (
        h.join(
            F.broadcast(o),
            (F.col("osplit") == F.col("split"))
            & (F.col("obkt") < F.col("bkt")),
            "left",
        )
        .groupBy("split", "bkt", "pos_b", "neg_b")
        .agg(F.coalesce(F.sum("oneg"), F.lit(0)).alias("neg_below"))
    )
    tt = h.groupBy("split").agg(
        F.sum("pos_b").cast("long").alias("p"),
        F.sum("neg_b").cast("long").alias("n"),
    )
    return (
        c.join(F.broadcast(tt), "split")
        .groupBy("split", "p", "n")
        .agg(
            (
                F.floor(
                    F.sum(
                        F.col("pos_b")
                        * (F.col("neg_below") + F.col("neg_b") / 2.0)
                    )
                    / (F.col("p").cast("double") * F.col("n"))
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("auc_binned")
        )
        .select(
            "split",
            F.col("p").alias("n_pos"),
            F.col("n").alias("n_neg"),
            "auc_binned",
        )
        .orderBy("split")
    )
