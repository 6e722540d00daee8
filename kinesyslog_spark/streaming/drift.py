"""W21 — continuous distribution-drift monitor over a document stream.

The streaming form of q130's total-variation distance: a REFERENCE
unigram distribution is a static artifact (built once from a trusted
corpus snapshot), and every incoming micro-batch is scored per source
against it — TV(batch_source, reference) lands in the sink the moment
the batch completes, which is how a production ingest pipeline notices
a source going bad (spam flood, scraper loop, language flip) hours
before any batch recount would.

TV over the vocabulary union decomposes so the stream side never needs
the full reference vocabulary row set per batch:

    TV = 0.5 * [ sum_{w in batch} |p_b(w) - p_r(w)|  +  (1 - covered) ]

where p_r(w) = 0 for words the reference lacks and `covered` is the
reference probability mass of the words the batch DID contain — the
`(1 - covered)` term is exactly the summed |0 - p_r| of every
reference word absent from the batch. One left join against the
broadcast reference table, no full outer join, no vocab-sized state.

Scale posture (100 TB / continuous):
- The reference is a static broadcast (vocab-sized — for web-scale
  vocabularies cap it to the top-K mass and fold the tail into an
  "other" bucket; the decomposition above is unchanged).
- Per batch: one (source, word) map-side-combined count, one broadcast
  join, one per-source reduce. No stream-side state at all — drift is
  per-window by construction, so there is nothing to TTL.
- Sink is idempotent per epoch (epoch_id=N partition overwrite, the
  W16 pattern): a retried micro-batch replaces its own output.

Reference parity: none (no corpus surface in the reference relay);
streaming counterpart of q130 (queries/curation.py). Parity-tested
against an independent pure-Python TV model in
tests/test_streaming_drift.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesyslog_spark.operators.text import tokens


def build_reference_dist(ref_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Static (w, c_ref, n_ref) artifact from a trusted corpus snapshot.

    n_ref is replicated onto every row so the scorer needs no second
    scalar artifact; persist once and pass to score_drift forever."""
    tf = (
        ref_docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c_ref"))
    )
    total = tf.agg(F.sum("c_ref").alias("n_ref"))
    return tf.crossJoin(F.broadcast(total))


def score_drift(
    batch: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source TV distance of one (micro-)batch against the
    reference: (source, n_tokens, n_types, tv_dist)."""
    sc = (
        batch.select(
            F.col(source_col).alias("source"),
            F.explode(tokens(F.col(text_col))).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = sc.groupBy("source").agg(F.sum("c").alias("ns"))
    joined = (
        sc.join(F.broadcast(ref), "w", "left")
        .join(F.broadcast(tot), "source")
        .fillna({"c_ref": 0})
    )
    p_b = F.col("c") / F.col("ns").cast("double")
    p_r = F.col("c_ref") / F.col("n_ref").cast("double")
    per_word = joined.select(
        "source",
        "ns",
        F.abs(p_b - F.coalesce(p_r, F.lit(0.0))).alias("diff"),
        F.coalesce(p_r, F.lit(0.0)).alias("pr_covered"),
    )
    return (
        per_word.groupBy("source", F.col("ns").alias("n_tokens"))
        .agg(
            F.count("*").alias("n_types"),
            F.round(
                0.5 * (F.sum("diff") + (1.0 - F.sum("pr_covered"))), 6
            ).alias("tv_dist"),
        )
        .select("source", "n_tokens", "n_types", "tv_dist")
    )


def streaming_drift(
    docs: DataFrame,
    ref: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    source_col: str = "source",
    trigger: str = "1 second",
) -> StreamingQuery:
    """Score a streaming document frame continuously; per-source drift
    rows land under out_dir/epoch_id=N (idempotent per epoch)."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        score_drift(batch, ref, text_col, source_col).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/epoch_id={epoch_id}")

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )
