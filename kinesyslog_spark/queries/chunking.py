"""Q162 — content-defined chunking (CDC) dedup at token granularity.

Storage-level dedup the way backup/dataset systems do it (LBFS, FastCDC
lineage): chunk boundaries are declared wherever a rolling content hash
hits a modulus target, so INSERTING OR DELETING text only perturbs the
chunks around the edit — every chunk after the next boundary re-aligns
and deduplicates again. Fixed-size chunking has no such property (one
shifted byte re-keys every later chunk); that shift-resistance is pinned
by a pure-Python model test (tests/test_chunking.py).

This variant draws boundaries at TOKEN granularity: a token t closes its
chunk when md5('cdc:' || t) % CDC_MOD == 0 (expected chunk length =
CDC_MOD tokens). Token-level CDC is the natural text form — byte-level
gear hashes exist to find exactly these kinds of stable cut points in
opaque data, and the md5-of-token form is exactly reproducible in ANSI
SQL, which keeps the whole query oracle-twinned.

Plan shape: tokenize (shared hot_tokens pass) -> posexplode -> per-doc
running sum of boundary flags (window PARTITIONED BY doc_id — bounded by
document length, never global) -> one hash aggregate to (doc, chunk) ->
one to (source, chunk_text) -> one to source. Every shuffle key is
doc_id, (source, md5) or source — all fine at corpus scale; the dedup
store statistics ride entirely on group-by, no joins back to the corpus.

Reference parity: none (training-data-ops family; complements q20 exact
whole-doc dedup and q123 ExactSubstr span dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesyslog_spark.operators.text import md5_int60
from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import hot_table, hot_tokens

CDC_MOD = 8  # expected chunk length in tokens

_Q162_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
  FROM (
    SELECT doc_id,
           regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
    FROM documents
  ) WHERE len(toks) > 0
),
flagged AS (
  SELECT doc_id, w, pos,
         CASE WHEN CAST('0x' || substring(md5('cdc:' || w), 1, 15) AS BIGINT)
                   % {CDC_MOD} = 0 THEN 1 ELSE 0 END AS f
  FROM tok
),
grp AS (
  SELECT doc_id, w, pos,
         SUM(f) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - f
           AS chunk_id
  FROM flagged
),
chunks AS MATERIALIZED (
  SELECT g.doc_id, g.chunk_id,
         string_agg(g.w, ' ' ORDER BY g.pos) AS ctext
  FROM grp g GROUP BY g.doc_id, g.chunk_id
),
occ AS (
  SELECT d.source, c.ctext,
         CAST(COUNT(*) AS BIGINT) AS n_occ,
         CAST(strlen(MIN(c.ctext)) AS BIGINT) AS nbytes
  FROM chunks c JOIN documents d ON d.doc_id = c.doc_id
  GROUP BY d.source, c.ctext
)
SELECT source,
       CAST(SUM(n_occ) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
       CAST(SUM(n_occ * nbytes) AS BIGINT) AS total_bytes,
       CAST(SUM(nbytes) AS BIGINT) AS unique_bytes,
       FLOOR(CAST(SUM(nbytes) AS DOUBLE) / SUM(n_occ * nbytes)
             * 1000000 + 0.5) / 1000000 AS dedup_ratio
FROM occ
GROUP BY source
ORDER BY source
"""


def cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, ctext) over the corpus — the shared-token-pass
    form of `chunks_from_tokens` (q162 and the batch side of W30)."""
    return chunks_from_tokens(hot_tokens(spark, sf_dir))


def chunk_texts(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_id, ctext) from any (doc_id, text) frame — the
    entry point W30's streaming chunk-store ingestion folds per batch
    (same tokenizer, same boundary rule as q162)."""
    from kinesyslog_spark.operators.text import tokens

    return chunks_from_tokens(
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    )


def chunks_from_tokens(tok_df: DataFrame) -> DataFrame:
    """Core CDC pass over a (doc_id, toks array) frame."""
    tok = (
        tok_df
        .filter(F.size("toks") > 0)
        .select("doc_id", F.posexplode("toks").alias("pos", "w"))
    )
    flagged = tok.select(
        "doc_id", "w", "pos",
        (md5_int60(F.col("w"), "cdc:") % CDC_MOD == 0)
        .cast("int").alias("f"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = flagged.select(
        "doc_id", "w", "pos",
        (F.sum("f").over(win) - F.col("f")).alias("chunk_id"),
    )
    return grp.groupBy("doc_id", "chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("ctext")
    )


@query("q162_cdc_chunk_dedup", oracle=_Q162_ORACLE)
def q162_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = cdc_chunks(spark, sf_dir)
    src = hot_table(spark, sf_dir, "documents").select("doc_id", "source")
    occ = (
        chunks.join(src, "doc_id")
        .groupBy("source", "ctext")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.length(F.min("ctext")).cast("long").alias("nbytes"),
        )
    )
    return (
        occ.groupBy("source")
        .agg(
            F.sum("n_occ").cast("long").alias("n_chunks"),
            F.count(F.lit(1)).alias("n_unique_chunks"),
            F.sum(F.col("n_occ") * F.col("nbytes")).cast("long")
            .alias("total_bytes"),
            F.sum("nbytes").cast("long").alias("unique_bytes"),
            (
                F.floor(
                    F.sum("nbytes").cast("double")
                    / F.sum(F.col("n_occ") * F.col("nbytes"))
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("dedup_ratio"),
        )
        .orderBy("source")
    )
