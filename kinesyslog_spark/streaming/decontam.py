"""W15 — continuous benchmark decontamination of an incoming document
stream.

The streaming form of q42: in production the evaluation-suite n-gram
set is a STATIC artifact (eval suites are MBs and change rarely), and
every incoming crawl batch is scored against it on arrival — documents
never wait for a nightly batch job to learn they are contaminated.

Shape: `foreachBatch` (the W7/W12 relay pattern). Per micro-batch the
incoming docs get the exact q42 scoring — tokenize, distinct word
8-grams, LEFT SEMI join against the BROADCAST eval-gram set, per-doc
hit fraction — and the scored rows append to a parquet sink. A per-doc
aggregate inside foreachBatch is exact (no cross-batch state needed)
because each document arrives exactly once; dedup upstream is W6's
job.

Scale posture (100 TB / continuous):
- The eval-gram set broadcasts (same argument as q42's scale note); the
  per-batch gram stream is never shuffled across batches.
- Scoring is per-batch-bounded work; the sink is idempotent per epoch:
  each micro-batch OVERWRITES its own epoch_id partition directory, so
  a foreachBatch retry after a partial write replaces its output
  instead of appending duplicates (same fix as streaming/dsir.py —
  foreachBatch alone only guarantees at-least-once re-invocation, a
  blind append would duplicate rows on retry).

Reference parity: none (no corpus surface in the reference); streaming
counterpart of SURVEY §2b q42. Parity-tested against the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesyslog_spark.operators.text import tokens, word_shingles
from kinesyslog_spark.queries.decontam import CONTAM_THR, DECONTAM_N


def build_eval_grams(eval_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The static artifact: distinct word DECONTAM_N-grams of the eval
    suite. Materialize/persist once; pass to score_batch for every
    incoming batch."""
    return (
        eval_docs.select(tokens(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") >= DECONTAM_N)
        .select(F.explode(word_shingles(F.col("toks"), DECONTAM_N)).alias("gram"))
        .distinct()
    )


def score_batch(batch: DataFrame, eval_grams: DataFrame,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact q42 scoring of one (micro-)batch against the eval grams."""
    g = (
        batch.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") >= DECONTAM_N)
        .select("doc_id", word_shingles(F.col("toks"), DECONTAM_N).alias("grams"))
    )
    hits = (
        g.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0)).cast("long")
    frac = n_hit.cast("double") / F.col("n_grams").cast("double")
    return (
        g.select("doc_id", F.size("grams").cast("long").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", "n_grams", n_hit.alias("n_hit"),
            F.round(frac, 4).alias("contam_frac"),
            F.when(frac >= CONTAM_THR, 1).otherwise(0).cast("int")
             .alias("contaminated"),
        )
    )


def make_fold(eval_grams: DataFrame, out_dir: str, text_col: str = "text",
              id_col: str = "doc_id"):
    """The foreachBatch body, exposed so the retry contract is directly
    testable: re-invoking with the SAME epoch_id (what foreachBatch does
    after a mid-write failure) must leave exactly one copy of the
    epoch's rows — each epoch overwrites its own partition directory."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        out = score_batch(batch, eval_grams, text_col, id_col)
        out.write.mode("overwrite").parquet(f"{out_dir}/epoch_id={epoch_id}")

    return fold


def streaming_decontam(docs: DataFrame, eval_grams: DataFrame, out_dir: str,
                       checkpoint_dir: str, text_col: str = "text",
                       id_col: str = "doc_id",
                       trigger: str = "1 second") -> StreamingQuery:
    """Score a streaming document frame continuously; scored rows land
    under `out_dir` as parquet, one epoch_id partition per micro-batch
    (exactly-once: retried epochs overwrite their own directory)."""
    fold = make_fold(eval_grams, out_dir, text_col, id_col)
    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )
