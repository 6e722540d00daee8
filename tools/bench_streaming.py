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

    r = _run_epochs(spark, work, "w9c", slices, start_w9c)
    out.append({"twin": "W9_dedup_coarse", "sf_dir": sf_dir,
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

    r = _run_epochs(spark, work, "w20", img_slices, start_w20)
    out.append({"twin": "W20_imagedup", "sf_dir": sf_dir, "docs": n_docs, **r})

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

    r = _run_epochs(spark, work, "w27", slices, start_w27)
    r["state_mem"] = [_dir_bytes(st27)] * 1  # final on-disk snapshot size
    out.append({"twin": "W27_quality", "sf_dir": sf_dir, "docs": n_docs, **r})

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

    r = _run_epochs(spark, work, "w30", slices, start_w30)
    r["state_rows"] = [read_store(spark, st30).count()]
    r["state_mem"] = [_dir_bytes(st30)]
    out.append({"twin": "W30_chunkstore", "sf_dir": sf_dir, "docs": n_docs, **r})
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


if __name__ == "__main__":
    main()
