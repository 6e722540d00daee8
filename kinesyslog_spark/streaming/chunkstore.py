"""W30 — continuous CDC chunk-store ingestion (streaming q162).

Each micro-batch is chunked with the SAME boundary rule as the batch
query (queries/chunking.py), deduplicated against the accumulated
chunk store, and only the chunks never seen before are admitted. The
per-epoch report carries the numbers a storage-dedup operator watches:
chunks seen, chunks/bytes admitted, bytes saved by dedup.

State design (the difference from the W22 sketch): a chunk store is
APPEND-ONLY by nature, so state_dir holds one parquet directory per
epoch containing ONLY the chunks first seen in that epoch —
  - store-at-epoch-e  =  union of epoch dirs STRICTLY below e,
  - a retried epoch re-reads exactly its predecessors (the W16/W27
    predecessor-snapshot rule: never its own partial attempt) and
    OVERWRITES its own epoch dir + report, so at-least-once foreachBatch
    delivery yields an exactly-once store,
  - nothing is ever rewritten, so per-epoch write cost is O(new chunks),
    not O(store) — the property that lets the store grow to 100 TB.
At cluster scale the epoch dirs would additionally be bucketed by a
chash prefix so the anti-join prunes to matching buckets; the layout
and fold logic are unchanged by that.

Replay/parity/retry tests: tests/test_streaming_chunkstore.py — the
final store must be BIT-IDENTICAL to the batch distinct-chunk set of
everything ingested, and a re-folded epoch must change nothing.

Reference parity: none (streaming counterpart of q162).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesyslog_spark.queries.chunking import chunk_texts
from kinesyslog_spark.streaming.epoch_state import list_state_epochs

STORE_SCHEMA = "chash string, nbytes long"
REPORT_SCHEMA = (
    "epoch long, n_chunks long, n_new_chunks long, new_bytes long, "
    "dup_bytes long"
)


def batch_chunk_occurrences(docs: DataFrame) -> DataFrame:
    """(chash, nbytes, n_occ) for one (doc_id, text) batch."""
    return (
        chunk_texts(docs)
        .select(
            F.md5("ctext").alias("chash"),
            F.length("ctext").cast("long").alias("nbytes"),
        )
        .groupBy("chash", "nbytes")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )


def make_fold(state_dir: str, out_dir: str):
    """The foreachBatch body, exposed for retry tests (the W15/W16
    convention)."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        from pyspark import StorageLevel

        spark = batch.sparkSession
        # two consumers (stats + admitted write) — cache the chunk pass
        occ = batch_chunk_occurrences(batch).persist(
            StorageLevel.MEMORY_ONLY
        )
        prev = [
            e for e in list_state_epochs(spark, state_dir)
            if e < int(epoch_id)
        ]
        if prev:
            store = spark.read.parquet(
                *[f"{state_dir}/epoch={e}" for e in prev]
            ).select("chash")
            new = occ.join(store, "chash", "left_anti")
        else:
            new = occ
        stats = (
            occ.agg(
                F.coalesce(F.sum("n_occ"), F.lit(0)).alias("n_chunks"),
                F.coalesce(F.sum(F.col("n_occ") * F.col("nbytes")), F.lit(0))
                .alias("total_bytes"),
            )
            .crossJoin(
                new.agg(
                    F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_new"),
                    F.coalesce(F.sum("nbytes"), F.lit(0)).alias("new_bytes"),
                )
            )
            .collect()[0]
        )
        new.select("chash", "nbytes").write.mode("overwrite").parquet(
            f"{state_dir}/epoch={int(epoch_id)}"
        )
        spark.createDataFrame(
            [(
                int(epoch_id),
                int(stats["n_chunks"]),
                int(stats["n_new"]),
                int(stats["new_bytes"]),
                int(stats["total_bytes"]) - int(stats["new_bytes"]),
            )],
            REPORT_SCHEMA,
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/epoch_id={int(epoch_id)}"
        )
        occ.unpersist()

    return fold


def streaming_chunkstore(
    docs: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger: str = "1 second",
) -> StreamingQuery:
    """Ingest a (doc_id, text) stream into the CDC chunk store."""
    return (
        docs.writeStream.foreachBatch(make_fold(state_dir, out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )


def read_store(spark, state_dir: str) -> DataFrame:
    """The accumulated chunk store (all complete epochs)."""
    epochs = list_state_epochs(spark, state_dir)
    if not epochs:
        return spark.createDataFrame([], STORE_SCHEMA)
    return spark.read.parquet(
        *[f"{state_dir}/epoch={e}" for e in epochs]
    ).select("chash", "nbytes")
