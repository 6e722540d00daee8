"""W16 — continuous DSIR importance scoring of an incoming document
stream.

The streaming form of q103: the hashed-n-gram log-likelihood-ratio
model is a STATIC artifact (trained once over a reference corpus +
target sample; exactly DSIR_B rows), and every incoming crawl batch is
scored against it on arrival — the data-selection weight is known the
moment a document lands, so downstream sampling/mixing can act
per-batch instead of waiting for a corpus-wide batch job.

Shape: `foreachBatch` (the W13/W15 pattern — static broadcast artifact
vs a live stream). Per micro-batch the incoming docs are tokenized,
featurized to hashed buckets, joined against the BROADCAST lambda
table, and the per-doc mean weight appends to a parquet sink. Per-doc
aggregation inside foreachBatch is exact (each document arrives once;
upstream dedup is W6's job).

Scale posture (100 TB / continuous):
- The model is O(DSIR_B) rows by construction — DSIR's design point —
  so the broadcast is constant-size forever; the stream is never
  shuffled on a model key (see queries/dsir.py scale notes).
- Scoring is per-batch-bounded map work + one per-batch doc_id
  aggregate; the sink IS idempotent per epoch because each micro-batch
  overwrites its own `epoch_id=N` partition directory — a retried
  epoch replaces its partial output rather than appending duplicates
  (foreachBatch alone only guarantees at-least-once).

Reference parity: none (no corpus surface in the reference); streaming
counterpart of q103. Parity-tested against the batch twin in
tests/test_streaming_dsir.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesyslog_spark.operators.text import tokens
from kinesyslog_spark.queries.dsir import (
    DSIR_TARGET_LANG,
    build_dsir_model,
    doc_feature_buckets,
    score_feature_buckets,
)


def build_dsir_artifact(
    ref_docs: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Train the static (bucket, lam) model from a reference corpus whose
    `lang_col` marks the target distribution. Materialize/persist once;
    pass to score_batch for every incoming batch."""
    toks = ref_docs.select(
        F.col("doc_id"),
        (F.col(lang_col) == target_lang).alias("is_target"),
        tokens(F.col(text_col)).alias("toks"),
    )
    feats = doc_feature_buckets(toks.select("doc_id", "toks")).join(
        toks.select("doc_id", "is_target"), "doc_id"
    )
    return build_dsir_model(feats.select("bucket", "is_target"))


def score_batch(
    batch: DataFrame, lam: DataFrame, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact q103 scoring of one (micro-)batch against the broadcast
    model: (doc_id, n_feats, dsir_weight)."""
    toks = batch.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") >= 1)
    return score_feature_buckets(doc_feature_buckets(toks), lam)


def make_fold(lam: DataFrame, out_dir: str, text_col: str = "text",
              id_col: str = "doc_id"):
    """The foreachBatch body, exposed for direct retry-contract tests.

    Idempotent per epoch: each micro-batch owns its epoch_id
    subdirectory and OVERWRITES it, so a retried epoch replaces its own
    partial output instead of appending duplicates. Readers see epoch_id
    as a discovered partition column under out_dir."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        score_batch(batch, lam, text_col, id_col).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/epoch_id={epoch_id}")

    return fold


def streaming_dsir(
    docs: DataFrame, lam: DataFrame, out_dir: str, checkpoint_dir: str,
    text_col: str = "text", id_col: str = "doc_id",
    trigger: str = "1 second",
) -> StreamingQuery:
    """Score a streaming document frame continuously; weighted rows
    land under `out_dir` as parquet, one epoch_id partition per
    micro-batch (retried epochs overwrite their own directory)."""
    fold = make_fold(lam, out_dir, text_col, id_col)
    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )
