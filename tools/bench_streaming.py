"""Streaming decade probe (SCALING_R9): replay the heavy streaming
twins over an epoch-split document corpus at two scale factors and
record per-epoch latency and state growth.

The 32 streaming units are pinned CORRECT by their batch-twin replay
tests, but had never been scale-probed: a stateful operator can be
right and still accumulate state super-linearly with corpus (not
epoch), or slow down per epoch as its store grows. This tool measures
exactly that for the four heavy twins:

  W9  continuous MinHash near-dup  (applyInPandasWithState, LSH-bucket
      keyed FIFO state)
  W20 continuous image pHash near-dup (same machinery over real PNG
      payloads)
  W27 continuous quality monitor   (foreachBatch epoch-snapshot merge —
      state should be O(1) in corpus)
  W30 CDC chunk store              (foreachBatch append-only epoch dirs —
      state is O(distinct chunks), per-epoch write O(new))

Drive: the corpus is split into EPOCHS deterministic slices
(doc_id % EPOCHS); each slice is appended to the stream source dir and
processed to completion with an availableNow trigger against a shared
checkpoint, so every epoch is one timed micro-batch and state carries
across restarts exactly as it would across a long-lived job's
triggers. Per-epoch wall time plus state rows/bytes come from the last
progress event (state-store twins) or the on-disk store (foreachBatch
twins).

Round 10 extends the probe to the remaining state-carrying twins
(round-9 verdict #2) plus the W9 horizon/state-store variants
(verdict #3):

Round 11 adds the last unprobed state-carrying twins (round-10
verdict #8): W14 Space-Saving heavy hitters, W17 quota, W19 debounce
(live-cadence drive — its timers are availableNow-incompatible), W23
quantile histograms, W26 vector-index ingest, W29 binned AUC, W31
calibration.

  W12 SCD2 snapshot fold        (foreachBatch; table grows O(keys) —
      per-epoch fold reads the WHOLE current table)
  W22 HyperLogLog               (64 registers — state O(1) by design)
  W24 new-template detection    (set-union state, O(templates))
  W25 scene-cut                 (per-video last-histogram state)
  W28 retraction changelog      (merged view, O(distinct keys); the
      fold diffs old vs new snapshot per epoch)
  W32 spectral monitor          (1 + D + D^2 moment rows — O(1))
  W33 projection-hash image dedup (frozen-artifact stateful twin)
  W9_ttl / W9_rocksdb           (dedup-within-a-horizon eviction; the
      RocksDB provider as the corpus-scale store)

Filter with STREAM_TWINS=w9,w12,... (comma list; default: all).

Usage:
  python tools/bench_streaming.py [sf_dir ...]
    (default: /root/testdata/sf0.1 artifacts/sf1)

Prints one JSON line per (sf_dir, twin) with per-epoch seconds and
state series, then a summary table to stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesyslog_spark.session import get_spark  # noqa: E402
from kinesyslog_spark.tables import load_table  # noqa: E402

EPOCHS = int(os.environ.get("STREAM_EPOCHS", "10"))
TWINS = {
    t.strip()
    for t in os.environ.get(
        "STREAM_TWINS",
        "w9,w9c,w20,w27,w30,w12,w22,w24,w25,w28,w32,w33,w9_ttl,w9_rocksdb,"
        "w14,w17,w19,w23,w26,w29,w31,w34",
    ).split(",")
    if t.strip()
}


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _state_op_stats(q) -> tuple[int | None, int | None]:
    """(numRowsTotal, stateMemory bytes) from the last progress event."""
    prog = q.lastProgress or (q.recentProgress[-1] if q.recentProgress else None)
    if not prog:
        return None, None
    ops = prog.get("stateOperators") or []
    if not ops:
        return None, None
    rows = sum(int(o.get("numRowsTotal", 0)) for o in ops)
    mem = sum(int(o.get("memoryUsedBytes", 0)) for o in ops)
    return rows, mem


def _run_epochs(spark, work: str, twin: str, slices, start_query) -> dict:
    """Append one slice at a time; each epoch is one availableNow run
    against a shared checkpoint. start_query(in_dir, ckpt, epoch_dirs)
    must return a started StreamingQuery."""
    in_dir = os.path.join(work, f"in_{twin}")
    ckpt = os.path.join(work, f"ckpt_{twin}")
    os.makedirs(in_dir, exist_ok=True)
    lat, rows_series, mem_series = [], [], []
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(in_dir)
        t0 = time.perf_counter()
        q = start_query(in_dir, ckpt)
        q.awaitTermination()
        lat.append(round(time.perf_counter() - t0, 2))
        rows, mem = _state_op_stats(q)
        rows_series.append(rows)
        mem_series.append(mem)
    return {"epoch_sec": lat, "state_rows": rows_series,
            "state_mem": mem_series}


def probe_sf(spark, sf_dir: str, work: str) -> list[dict]:
    from kinesyslog_spark.queries.imagehash import render_png_batches
    from kinesyslog_spark.streaming.chunkstore import read_store
    from kinesyslog_spark.streaming.dedup import streaming_neardup
    from kinesyslog_spark.streaming.imagedup import streaming_image_neardup
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    slices = [
        docs.filter(F.pmod(F.col("doc_id"), EPOCHS) == e) for e in range(EPOCHS)
    ]
    n_docs = docs.count()
    out: list[dict] = []

    # ---- W9: continuous MinHash near-dup -------------------------------
    def start_w9(in_dir, ckpt):
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            in_dir
        )
        return (
            streaming_neardup(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    if "w9" in TWINS:
        r = _run_epochs(spark, work, "w9", slices, start_w9)
        out.append({"twin": "W9_dedup", "sf_dir": sf_dir, "docs": n_docs, **r})

    # ---- W9 coarse-group state layout (SCALING_R9) ----------------------
    from kinesyslog_spark.streaming.dedup import streaming_neardup_coarse

    def start_w9c(in_dir, ckpt):
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            in_dir
        )
        return (
            streaming_neardup_coarse(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    if "w9c" in TWINS:
        r = _run_epochs(spark, work, "w9c", slices, start_w9c)
        out.append({"twin": "W9_dedup_coarse", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W34: continuous SimHash combo near-dup (round-12) -------------
    if "w34" in TWINS:
        from kinesyslog_spark.streaming.simdup import (
            frozen_simhash_artifacts,
            streaming_simdup,
        )
        from kinesyslog_spark.tables import release_hot

        art = spark.sparkContext.broadcast(
            frozen_simhash_artifacts(spark, sf_dir)
        )
        release_hot(spark, sf_dir)  # probe pays stream cost, not batch

        def start_w34(in_dir, ckpt):
            stream = spark.readStream.schema(
                "doc_id long, text string"
            ).parquet(in_dir)
            return (
                streaming_simdup(stream, art)
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w34", slices, start_w34)
        out.append({"twin": "W34_simdup", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W34 event-time horizon (state bounded by ttl, not corpus) -----
    if "w34_ttl" in TWINS:
        from kinesyslog_spark.streaming.simdup import (
            frozen_simhash_artifacts,
            streaming_simdup,
        )
        from kinesyslog_spark.tables import release_hot

        art = spark.sparkContext.broadcast(
            frozen_simhash_artifacts(spark, sf_dir)
        )
        release_hot(spark, sf_dir)
        hour = 3_600_000
        t0 = 1_700_000_000_000
        # each epoch is one event-time hour; 2 h horizon -> state holds
        # ~2 epochs of members regardless of corpus length
        ttl_slices = [
            sl.withColumn(
                "ts",
                F.timestamp_millis(F.lit(t0 + e * hour)),
            )
            for e, sl in enumerate(slices)
        ]

        def start_w34t(in_dir, ckpt):
            stream = spark.readStream.schema(
                "doc_id long, text string, ts timestamp"
            ).parquet(in_dir)
            return (
                streaming_simdup(stream, art, ttl_ms=2 * hour, ts_col="ts")
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w34_ttl", ttl_slices, start_w34t)
        out.append({"twin": "W34_simdup_ttl", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W20: continuous image pHash near-dup --------------------------
    img_slices = [
        sl.mapInPandas(
            render_png_batches, schema="doc_id long, payload binary"
        ).withColumnRenamed("doc_id", "img_id")
        for sl in slices
    ]

    def start_w20(in_dir, ckpt):
        stream = spark.readStream.schema(
            "img_id long, payload binary"
        ).parquet(in_dir)
        return (
            streaming_image_neardup(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    if "w20" in TWINS:
        r = _run_epochs(spark, work, "w20", img_slices, start_w20)
        out.append({"twin": "W20_imagedup", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W27: continuous quality monitor (foreachBatch snapshot) -------
    # The production wrappers (streaming_quality / streaming_chunkstore)
    # run on a processingTime trigger and never terminate; the probe
    # drives the SAME foreachBatch folds with availableNow so each
    # epoch is one run-to-completion micro-batch.
    from kinesyslog_spark.streaming import chunkstore as _cs
    from kinesyslog_spark.streaming import quality as _ql

    st27 = os.path.join(work, "state_w27")
    out27 = os.path.join(work, "out_w27")

    def start_w27(in_dir, ckpt):
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            in_dir
        )
        return (
            stream.writeStream.foreachBatch(_ql.make_fold(out27, st27))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    if "w27" in TWINS:
        r = _run_epochs(spark, work, "w27", slices, start_w27)
        r["state_mem"] = [_dir_bytes(st27)]  # final on-disk snapshot size
        out.append({"twin": "W27_quality", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W30: CDC chunk store (foreachBatch append-only) ---------------
    st30 = os.path.join(work, "state_w30")
    out30 = os.path.join(work, "out_w30")

    def start_w30(in_dir, ckpt):
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            in_dir
        )
        return (
            stream.writeStream.foreachBatch(_cs.make_fold(st30, out30))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    if "w30" in TWINS:
        r = _run_epochs(spark, work, "w30", slices, start_w30)
        r["state_rows"] = [read_store(spark, st30).count()]
        r["state_mem"] = [_dir_bytes(st30)]
        out.append({"twin": "W30_chunkstore", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    out.extend(probe_sf_round10(spark, sf_dir, work, slices, img_slices,
                                n_docs))
    out.extend(probe_sf_round11(spark, sf_dir, work, slices, n_docs))
    return out


def probe_sf_round11(spark, sf_dir: str, work: str, slices,
                     n_docs: int) -> list[dict]:
    """Round-11 twins (round-10 verdict #8): the last unprobed
    state-carrying units — all O(keys)/O(bins)/O(capacity)-bounded by
    construction, but 'expected flat' is what the probe exists to
    replace (it has found a real bug every round it ran)."""
    from pyspark.sql import functions as F

    out: list[dict] = []
    docs_schema = "doc_id long, text string"

    # ---- W14: Space-Saving heavy hitters (sharded summaries, state
    # O(shards x capacity) by construction) ------------------------------
    if "w14" in TWINS:
        from kinesyslog_spark.streaming.heavy import streaming_heavy_hitters

        def start_w14(in_dir, ckpt):
            stream = spark.readStream.schema(docs_schema).parquet(in_dir)
            return (
                streaming_heavy_hitters(stream)
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w14", slices, start_w14)
        out.append({"twin": "W14_heavy", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W17: per-source token-quota admission (state O(sources)) ------
    if "w17" in TWINS:
        from kinesyslog_spark.streaming.quota import quota_admit
        from kinesyslog_spark.streaming.quota import doc_token_counts

        src_docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        q_slices = [
            src_docs.filter(F.pmod(F.col("doc_id"), EPOCHS) == e)
            for e in range(EPOCHS)
        ]

        def start_w17(in_dir, ckpt):
            stream = spark.readStream.schema(
                "doc_id long, source string, text string"
            ).parquet(in_dir)
            return (
                quota_admit(doc_token_counts(stream))
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w17", q_slices, start_w17)
        out.append({"twin": "W17_quota", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W19: event debounce (state O(active (user, type) keys)) -------
    # and W29/W31 scored-stream folds share the events table
    ev = load_table(spark, sf_dir, "events")
    n_ev = ev.count()

    if "w19" in TWINS:
        # debounce state uses ProcessingTimeTimeout unconditionally, so
        # it CANNOT be driven availableNow-per-epoch (a timer-carrying
        # query never terminates under availableNow — the round-10
        # platform finding). Drive one long-lived processingTime query
        # and append an epoch per cadence tick, like the w9_ttl probe.
        from kinesyslog_spark.streaming.debounce import (
            debounce,
            keyed_events,
        )

        e_slices = [
            ev.select("user_id", "event_type", "event_id", "ts")
            .filter(F.pmod(F.col("event_id"), EPOCHS) == e)
            for e in range(EPOCHS)
        ]
        gap_s = float(os.environ.get("STREAM_TTL_GAP_S", "6"))
        in19 = os.path.join(work, "in_w19")
        ck19 = os.path.join(work, "ckpt_w19")
        os.makedirs(in19, exist_ok=True)
        e_slices[0].coalesce(1).write.mode("append").parquet(in19)
        stream = spark.readStream.schema(
            "user_id long, event_type string, event_id long, "
            "ts timestamp_ntz"
        ).parquet(in19)
        q = (
            debounce(keyed_events(stream))
            .writeStream.format("noop")
            .option("checkpointLocation", ck19)
            .trigger(processingTime="2 seconds")
            .start()
        )
        lat, rows_series, mem_series = [], [], []
        try:
            for sl in e_slices[1:]:
                t0 = time.perf_counter()
                sl.coalesce(1).write.mode("append").parquet(in19)
                time.sleep(gap_s)
                lat.append(round(time.perf_counter() - t0, 2))
                rows, mem = _state_op_stats(q)
                rows_series.append(rows)
                mem_series.append(mem)
        finally:
            q.stop()
        out.append({
            "twin": "W19_debounce", "sf_dir": sf_dir, "docs": n_ev,
            "epoch_sec": lat, "state_rows": rows_series,
            "state_mem": mem_series,
            "note": "continuous processingTime drive (debounce timers "
                    "are incompatible with availableNow)",
        })

    # ---- W23: quantile histogram partials (O(bins)/epoch) --------------
    if "w23" in TWINS:
        from kinesyslog_spark.streaming.quantiles import batch_histogram

        v_slices = [
            ev.select("event_id", "value")
            .filter(F.pmod(F.col("event_id"), EPOCHS) == e)
            for e in range(EPOCHS)
        ]
        parts_dir = os.path.join(work, "w23_parts")

        def start_w23(in_dir, ckpt):
            stream = spark.readStream.schema(
                "event_id long, value double"
            ).parquet(in_dir)

            def fold(batch, eid):
                batch_histogram(batch, "value", 0.0, 500.0).write.mode(
                    "overwrite"
                ).parquet(f"{parts_dir}/epoch_id={eid}")

            return (
                stream.writeStream.foreachBatch(fold)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w23", v_slices, start_w23)
        r["state_mem"] = [_dir_bytes(parts_dir)]
        out.append({"twin": "W23_quantiles", "sf_dir": sf_dir,
                    "docs": n_ev, **r})

    # ---- W26: vector-index ingestion (stateless route+encode — epoch
    # cost must track slice size only) ------------------------------------
    if "w26" in TWINS:
        from kinesyslog_spark.streaming.vecingest import (
            streaming_index_ingest,
        )

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        n_vec = emb.count()
        emb_slices = [
            emb.filter(F.pmod(F.col("vec_id"), EPOCHS) == e)
            for e in range(EPOCHS)
        ]
        # deterministic synthetic coarse/PQ artifacts (the probe times
        # the streaming plumbing, not codebook quality)
        coarse = [
            (c, [((c * 13 + j) % 7 - 3) / 3.0 for j in range(64)])
            for c in range(8)
        ]
        codebooks = [
            [
                (k, [((m * 31 + k * 5 + j) % 9 - 4) / 4.0 for j in range(8)])
                for k in range(16)
            ]
            for m in range(8)
        ]

        def start_w26(in_dir, ckpt):
            stream = spark.readStream.schema(
                "vec_id long, emb array<double>"
            ).parquet(in_dir)
            return (
                streaming_index_ingest(stream, coarse, codebooks, 8)
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w26", emb_slices, start_w26)
        out.append({"twin": "W26_vecingest", "sf_dir": sf_dir,
                    "docs": n_vec, **r})

    # ---- W29/W31: scored-stream folds (state O(bins) epoch snapshots) --
    scored = ev.select(
        "event_id",
        (F.pmod(F.col("value"), F.lit(1.0))).alias("p"),
        (F.col("value") > 50).cast("int").alias("y"),
    )
    s_slices = [
        scored.filter(F.pmod(F.col("event_id"), EPOCHS) == e)
        for e in range(EPOCHS)
    ]

    if "w29" in TWINS:
        from kinesyslog_spark.streaming.model_monitor import make_fold

        st_dir = os.path.join(work, "w29_state")
        fold = make_fold(os.path.join(work, "w29_out"), st_dir,
                         0.0, 1.0, score_col="p", label_col="y")

        def start_w29(in_dir, ckpt):
            stream = spark.readStream.schema(
                "event_id long, p double, y int"
            ).parquet(in_dir)
            return (
                stream.writeStream.foreachBatch(fold)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w29", s_slices, start_w29)
        r["state_mem"] = [_dir_bytes(st_dir)]
        out.append({"twin": "W29_model_monitor", "sf_dir": sf_dir,
                    "docs": n_ev, **r})

    if "w31" in TWINS:
        from kinesyslog_spark.streaming.calibration import make_fold

        st_dir = os.path.join(work, "w31_state")
        fold = make_fold(os.path.join(work, "w31_out"), st_dir)

        def start_w31(in_dir, ckpt):
            stream = spark.readStream.schema(
                "event_id long, p double, y int"
            ).parquet(in_dir)
            return (
                stream.writeStream.foreachBatch(fold)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w31", s_slices, start_w31)
        r["state_mem"] = [_dir_bytes(st_dir)]
        out.append({"twin": "W31_calibration", "sf_dir": sf_dir,
                    "docs": n_ev, **r})

    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "artifacts/sf1"]
    spark = get_spark("bench_streaming")
    results = []
    for sf_dir in sf_dirs:
        work = tempfile.mkdtemp(prefix="stream_probe_")
        try:
            for rec in probe_sf(spark, sf_dir, work):
                results.append(rec)
                print(json.dumps(rec), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    # decade summary to stderr: mean epoch latency per twin per sf
    print("\n# twin | sf_dir | docs | mean epoch s | last/first epoch "
          "| final state rows", file=sys.stderr)
    for rec in results:
        lat = rec["epoch_sec"]
        mean = sum(lat) / len(lat)
        slope = (lat[-1] / lat[0]) if lat[0] else float("nan")
        rows = [x for x in rec["state_rows"] if x is not None]
        print(f"# {rec['twin']} | {rec['sf_dir']} | {rec['docs']} | "
              f"{mean:.2f} | {slope:.2f} | {rows[-1] if rows else '-'}",
              file=sys.stderr)




def probe_sf_round10(spark, sf_dir: str, work: str, slices, img_slices,
                     n_docs: int) -> list[dict]:
    """Round-10 twins (verdict #2/#3). Same epoch drive as probe_sf;
    foreachBatch twins report final on-disk state, state-store twins the
    per-epoch progress stats."""
    from pyspark.sql import functions as F

    out: list[dict] = []

    # ---- W12: SCD2 snapshot fold (time-range epochs: SCD2 folds are
    # order-sensitive, so epochs must be event-time splits) -------------
    if "w12" in TWINS:
        from kinesyslog_spark.queries.pipeline_ops import tier_expr
        from kinesyslog_spark.streaming import cdc as _cdc

        ev = load_table(spark, sf_dir, "events")
        changes = ev.select(
            "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            F.col("event_id").alias("ord"),
            tier_expr("value").alias("tier"),
        )
        lo, hi = changes.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
        span = (hi - lo + 1) / EPOCHS
        ch_slices = [
            changes.filter(
                (F.col("ts_ms") >= lo + int(e * span))
                & (F.col("ts_ms") < lo + int((e + 1) * span))
            )
            for e in range(EPOCHS)
        ]
        tbl12 = os.path.join(work, "scd2_table")

        def start_w12(in_dir, ckpt):
            stream = spark.readStream.schema(
                "user_id long, ts_ms long, ord long, tier string"
            ).parquet(in_dir)

            def sink(b, eid):
                if not b.isEmpty():
                    _cdc.apply_epoch(b.sparkSession, tbl12, eid, b)

            return (
                stream.writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w12", ch_slices, start_w12)
        snap = _cdc.read_scd2(spark, tbl12)
        r["state_rows"] = [snap.count() if snap is not None else 0]
        r["state_mem"] = [_dir_bytes(tbl12)]
        out.append({"twin": "W12_scd2", "sf_dir": sf_dir, "docs": n_docs, **r})

    # ---- W22: HyperLogLog registers (state O(1) by design) -------------
    if "w22" in TWINS:
        from kinesyslog_spark.streaming import hll as _hll

        ev = load_table(spark, sf_dir, "events").select("user_id")
        k_slices = [
            ev.filter(F.pmod("user_id", F.lit(EPOCHS)) == e)
            for e in range(EPOCHS)
        ]
        st22 = os.path.join(work, "state_w22")
        out22 = os.path.join(work, "out_w22")

        def start_w22(in_dir, ckpt):
            stream = spark.readStream.schema("user_id long").parquet(in_dir)
            return (
                stream.writeStream.foreachBatch(
                    _hll.make_fold(st22, out22, "user_id")
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w22", k_slices, start_w22)
        r["state_rows"] = [64]
        r["state_mem"] = [_dir_bytes(st22)]
        out.append({"twin": "W22_hll", "sf_dir": sf_dir, "docs": n_docs, **r})

    # ---- W24: new-template detection (state O(templates); the synth
    # messages are log-shaped — event_type + masked numerics — so the
    # template cardinality is the operator's contract, not the corpus) --
    if "w24" in TWINS:
        from kinesyslog_spark.streaming import templates as _tpl

        ev = load_table(spark, sf_dir, "events")
        msgs = ev.select(
            "event_id",
            F.concat(
                F.col("event_type"), F.lit(" user="), F.col("user_id"),
                F.lit(" value="), F.round("value", 0).cast("int"),
            ).alias("message"),
        )
        m_slices = [
            msgs.filter(F.pmod("event_id", F.lit(EPOCHS)) == e)
            for e in range(EPOCHS)
        ]
        st24 = os.path.join(work, "state_w24")
        out24 = os.path.join(work, "out_w24")

        def start_w24(in_dir, ckpt):
            stream = spark.readStream.schema(
                "event_id long, message string"
            ).parquet(in_dir)
            return (
                stream.writeStream.foreachBatch(
                    _tpl.make_fold(st24, out24, "message")
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w24", m_slices, start_w24)
        n_tpl = (
            spark.read.parquet(st24).count() if os.path.isdir(st24) else 0
        )
        r["state_rows"] = [n_tpl]
        r["state_mem"] = [_dir_bytes(st24)]
        out.append({"twin": "W24_templates", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W25: scene cuts (per-video last-histogram state) --------------
    if "w25" in TWINS:
        import pandas as pd  # noqa: F401

        from kinesyslog_spark.streaming.scenecut import streaming_scene_cuts

        n_vids = max(50, n_docs // 100)

        def synth(batches):
            import pandas as pd

            for pdf in batches:
                dids = [int(d) for d in pdf["doc_id"]]
                frames = []
                for d in dids:
                    g = (d * 37) % 256
                    frames.append(bytes([g, g, g] * 16) * 16)  # 16x16 BGR
                yield pd.DataFrame({
                    "vid_id": [d % n_vids for d in dids],
                    "frame_idx": dids,
                    "frame": frames,
                    "width": [16] * len(dids),
                    "height": [16] * len(dids),
                    "bpp": [24] * len(dids),
                })

        f_slices = [
            sl.mapInPandas(
                synth,
                schema=("vid_id long, frame_idx long, frame binary, "
                        "width int, height int, bpp int"),
            )
            for sl in slices
        ]

        def start_w25(in_dir, ckpt):
            stream = spark.readStream.schema(
                "vid_id long, frame_idx long, frame binary, "
                "width int, height int, bpp int"
            ).parquet(in_dir)
            return (
                streaming_scene_cuts(stream)
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w25", f_slices, start_w25)
        out.append({"twin": "W25_scenecut", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W28: retraction changelog (merged view O(keys); the fold
    # diffs old vs new snapshot per epoch — O(view) epoch cost) ----------
    if "w28" in TWINS:
        from kinesyslog_spark.streaming import changelog as _cl

        ev = load_table(spark, sf_dir, "events").select("event_id",
                                                        "user_id", "value")
        e_slices = [
            ev.filter(F.pmod("event_id", F.lit(EPOCHS)) == e)
            for e in range(EPOCHS)
        ]
        st28 = os.path.join(work, "state_w28")
        out28 = os.path.join(work, "out_w28")

        def start_w28(in_dir, ckpt):
            stream = spark.readStream.schema(
                "event_id long, user_id long, value double"
            ).parquet(in_dir)
            return (
                stream.writeStream.foreachBatch(
                    _cl.make_fold(out28, st28, "user_id", "value")
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w28", e_slices, start_w28)
        from kinesyslog_spark.streaming.epoch_state import latest_state_epoch

        le = latest_state_epoch(spark, st28)
        r["state_rows"] = [
            spark.read.parquet(f"{st28}/epoch={le}").count()
            if le is not None else 0
        ]
        r["state_mem"] = [_dir_bytes(st28)]
        out.append({"twin": "W28_changelog", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W32: spectral monitor (1 + D + D^2 moment rows, O(1)) ---------
    if "w32" in TWINS:
        from kinesyslog_spark.streaming import spectral as _sp

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").alias("emb")
        )
        v_slices = [
            emb.filter(F.pmod("vec_id", F.lit(EPOCHS)) == e)
            for e in range(EPOCHS)
        ]
        st32 = os.path.join(work, "state_w32")
        out32 = os.path.join(work, "out_w32")

        def start_w32(in_dir, ckpt):
            stream = spark.readStream.schema(
                "vec_id long, emb array<float>"
            ).parquet(in_dir)
            return (
                stream.writeStream.foreachBatch(
                    _sp.make_fold(out32, st32, "emb")
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w32", v_slices, start_w32)
        from kinesyslog_spark.streaming.epoch_state import latest_state_epoch

        le = latest_state_epoch(spark, st32)
        r["state_rows"] = [
            spark.read.parquet(f"{st32}/epoch={le}").count()
            if le is not None else 0
        ]
        r["state_mem"] = [_dir_bytes(st32)]
        out.append({"twin": "W32_spectral", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W33: projection-hash image dedup (frozen QUANTIZED artifact —
    # the corpus-scale form; broadcast by streaming_projdup) -------------
    if "w33" in TWINS:
        from kinesyslog_spark.streaming.projdup import (
            quantized_projection_artifacts,
            streaming_projdup,
        )

        art = quantized_projection_artifacts(spark, sf_dir)

        def start_w33(in_dir, ckpt):
            stream = spark.readStream.schema(
                "img_id long, payload binary"
            ).parquet(in_dir)
            return (
                streaming_projdup(stream, art)
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        r = _run_epochs(spark, work, "w33", img_slices, start_w33)
        out.append({"twin": "W33_projdup", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    # ---- W9 with a TTL horizon: state must PLATEAU at the horizon ------
    # NOT driven availableNow-per-epoch like the others: a query with
    # ProcessingTimeTimeout never terminates under Trigger.AvailableNow
    # (Spark treats processing-time timers as always-pending work — the
    # round-10 repro measured batch 89+ at 0 state rows, ~2 batches/s
    # forever). The TTL contract is a live-cadence feature, so the probe
    # drives ONE long-lived processingTime query and appends an epoch
    # file per cadence tick, sampling state size from progress events.
    if "w9_ttl" in TWINS:
        from kinesyslog_spark.streaming.dedup import streaming_neardup

        ttl_ms = int(os.environ.get("STREAM_TTL_MS", "8000"))
        gap_s = float(os.environ.get("STREAM_TTL_GAP_S", "6"))
        in_dir = os.path.join(work, "in_w9_ttl")
        ckpt = os.path.join(work, "ckpt_w9_ttl")
        os.makedirs(in_dir, exist_ok=True)
        slices[0].coalesce(1).write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(in_dir)
        q = (
            streaming_neardup(stream, ttl_ms=ttl_ms)
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="2 seconds")
            .start()
        )
        lat, rows_series, mem_series = [], [], []
        try:
            for sl in slices[1:]:
                t0 = time.perf_counter()
                sl.coalesce(1).write.mode("append").parquet(in_dir)
                time.sleep(gap_s)
                lat.append(round(time.perf_counter() - t0, 2))
                rows, mem = _state_op_stats(q)
                rows_series.append(rows)
                mem_series.append(mem)
        finally:
            q.stop()
        out.append({
            "twin": "W9_dedup_ttl", "sf_dir": sf_dir, "docs": n_docs,
            "epoch_sec": lat, "state_rows": rows_series,
            "state_mem": mem_series, "ttl_ms": ttl_ms,
            "note": "continuous processingTime drive (TTL is incompatible "
                    "with availableNow; see streaming/dedup.py)",
        })

    # ---- W9 on the RocksDB state store (the corpus-scale default) ------
    if "w9_rocksdb" in TWINS:
        from kinesyslog_spark.session import (
            disable_rocksdb_state,
            enable_rocksdb_state,
        )
        from kinesyslog_spark.streaming.dedup import streaming_neardup

        def start_w9r(in_dir, ckpt):
            stream = spark.readStream.schema(
                "doc_id long, text string"
            ).parquet(in_dir)
            return (
                streaming_neardup(stream)
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        enable_rocksdb_state(spark)
        try:
            r = _run_epochs(spark, work, "w9_rocks", slices, start_w9r)
        finally:
            disable_rocksdb_state(spark)
        out.append({"twin": "W9_dedup_rocksdb", "sf_dir": sf_dir,
                    "docs": n_docs, **r})

    return out


if __name__ == "__main__":
    main()
