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
The plain layout's per-epoch read cost still grows O(epochs) in
DIRECTORY COUNT (one dir per epoch forever); `make_fold_bucketed` /
`streaming_chunkstore(n_buckets=...)` bucket every epoch dir by a
chash hash so the anti-join prunes to the batch's buckets AND
consolidate predecessors into a `base=<epoch>` dir every COMPACT_EVERY
epochs, bounding the per-epoch read to (1 base + <= COMPACT_EVERY
dirs) — the round-11 compaction lever; parity/retry pinned in
tests/test_streaming_compaction.py.

Replay/parity/retry tests: tests/test_streaming_chunkstore.py — the
final store must be BIT-IDENTICAL to the batch distinct-chunk set of
everything ingested, and a re-folded epoch must change nothing.

Reference parity: none (streaming counterpart of q162).
"""

from __future__ import annotations

import os

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


# ---------------------------------------------------------------------------
# bucketed layout + base compaction — the compaction lever (round-10
# verdict #3)
# ---------------------------------------------------------------------------
# The plain fold's anti-join reads the union of ALL prior epoch dirs:
# the store BYTES are append-only-bounded, but the DIRECTORY COUNT
# grows one per epoch, so per-epoch planning/listing cost is
# O(epochs). The bucketed fold (a) partitions every epoch dir by a
# chash hash-bucket so the anti-join prunes to the batch's buckets,
# and (b) every COMPACT_EVERY epochs folds all complete predecessor
# epoch dirs into one consolidated `base-<epoch>` dir — after which
# the per-epoch read is (1 base + <= COMPACT_EVERY epoch dirs),
# independent of stream length. Retry safety: the base is built from
# epochs STRICTLY below the current epoch (the W16/W27 predecessor
# rule — a retried epoch never reads its own partial output), and the
# doomed epoch dirs are removed only after the base publishes
# (_SUCCESS); a crash mid-compaction leaves both, and the reader
# prefers the base and ignores compacted epoch dirs.

COMPACT_EVERY = 16


def _read_parts(spark, parts: list[str], buckets=None):
    """Union the given store part dirs. Each part is read with itself
    as basePath (multiple epoch=/base= roots conflict under Spark's
    global partition discovery); bucketed parts expose their bucket
    partition column for pruning, plain-layout parts get bucket=-1."""
    from functools import reduce

    from pyspark.sql import DataFrame

    dfs = []
    for p in parts:
        bucketed = any(
            d.startswith("bucket=")
            for d in (os.listdir(p) if os.path.isdir(p) else [])
        )
        if bucketed:
            df = (
                spark.read.schema(STORE_SCHEMA + ", bucket int")
                .option("basePath", p)
                .parquet(p)
            )
            if buckets is not None:
                df = df.filter(F.col("bucket").isin(list(buckets)))
        else:
            df = (
                spark.read.schema(STORE_SCHEMA).parquet(p)
                .withColumn("bucket", F.lit(-1))
            )
        dfs.append(df)
    return reduce(DataFrame.unionByName, dfs)


def _store_parts(spark, state_dir: str, before: int) -> list[str]:
    """Paths making up the store strictly below epoch `before`:
    the newest base at-or-below it plus later epoch dirs."""
    bases = sorted(
        int(d.split("=", 1)[1])
        for d in (os.listdir(state_dir) if os.path.isdir(state_dir) else [])
        if d.startswith("base=")
        and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))
        and int(d.split("=", 1)[1]) < before
    )
    floor = bases[-1] if bases else None
    paths = [f"{state_dir}/base={floor}"] if floor is not None else []
    paths += [
        f"{state_dir}/epoch={e}"
        for e in list_state_epochs(spark, state_dir)
        if e < before and (floor is None or e > floor)
    ]
    return paths


def make_fold_bucketed(state_dir: str, out_dir: str,
                       n_buckets: int = None,
                       compact_every: int = COMPACT_EVERY):
    """foreachBatch body for the bucketed + compacted store layout."""
    from kinesyslog_spark.streaming import bucketstore as bs

    if n_buckets is None:
        n_buckets = bs.DEFAULT_BUCKETS

    def fold(batch: DataFrame, epoch_id: int) -> None:
        from pyspark import StorageLevel

        spark = batch.sparkSession
        occ = (
            batch_chunk_occurrences(batch)
            .withColumn("bucket", bs.bucket_col(F.col("chash"), n_buckets))
            .persist(StorageLevel.MEMORY_ONLY)
        )
        dirty = [
            r["bucket"] for r in occ.select("bucket").distinct().collect()
        ]
        parts = _store_parts(spark, state_dir, int(epoch_id))
        if parts:
            # bucket partition pruning: the anti-join only needs store
            # rows whose bucket appears in this batch
            store = _read_parts(spark, parts, buckets=dirty).select("chash")
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
        new.select("chash", "nbytes", "bucket").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(f"{state_dir}/epoch={int(epoch_id)}")
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
        # base compaction: every compact_every epochs, consolidate all
        # complete predecessors (strictly below THIS epoch — its own
        # dir stays, so a replay of epoch_id still sees only
        # predecessors) into base=<epoch_id - 1>.
        done = [
            e for e in list_state_epochs(spark, state_dir)
            if e < int(epoch_id)
        ]
        if len(done) >= compact_every:
            import shutil

            parts = _store_parts(spark, state_dir, int(epoch_id))
            base_dir = f"{state_dir}/base={int(epoch_id) - 1}"
            if base_dir not in parts:
                (
                    _read_parts(spark, parts)
                    .repartition("bucket")
                    .write.mode("overwrite").partitionBy("bucket")
                    .parquet(base_dir)
                )
                # only after the base is complete (_SUCCESS) do the
                # compacted inputs go away
                for p in parts:
                    shutil.rmtree(p, ignore_errors=True)
            # else: a prior attempt of THIS compaction already published
            # base=<epoch_id-1> (crash between _SUCCESS and cleanup), so
            # the store below this epoch IS that base — re-compacting
            # would read-and-overwrite the same directory (Spark refuses
            # and the stream would wedge on every retry). Finish the
            # interrupted cleanup instead:
            _vacuum_below_base(state_dir)

    return fold


def _vacuum_below_base(state_dir: str) -> None:
    """Converge a half-finished compaction: remove store dirs already
    folded into the newest complete base — epoch dirs at-or-below its
    floor and older bases. A crash between a base's _SUCCESS publish
    and its input cleanup leaves both on disk; without this sweep the
    stale epoch dirs keep len(done) >= compact_every forever and every
    subsequent epoch re-enters the compaction branch."""
    import shutil

    if not os.path.isdir(state_dir):
        return
    bases = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("base=")
        and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))
    )
    if not bases:
        return
    floor = bases[-1]
    for d in os.listdir(state_dir):
        if d.startswith("epoch=") and int(d.split("=", 1)[1]) <= floor:
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)
        elif d.startswith("base=") and int(d.split("=", 1)[1]) < floor:
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)


def streaming_chunkstore(
    docs: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger: str = "1 second",
    n_buckets: int | None = None,
) -> StreamingQuery:
    """Ingest a (doc_id, text) stream into the CDC chunk store.
    n_buckets selects the bucketed + base-compacted layout (per-epoch
    read cost independent of stream length); None keeps the plain
    one-dir-per-epoch layout."""
    fold = (
        make_fold_bucketed(state_dir, out_dir, n_buckets)
        if n_buckets is not None
        else make_fold(state_dir, out_dir)
    )
    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )


def read_store(spark, state_dir: str) -> DataFrame:
    """The accumulated chunk store (newest base, if any, plus all
    complete epoch dirs above it — works for both layouts)."""
    parts = _store_parts(spark, state_dir, 1 << 62)
    if not parts:
        return spark.createDataFrame([], STORE_SCHEMA)
    return _read_parts(spark, parts).select("chash", "nbytes")
