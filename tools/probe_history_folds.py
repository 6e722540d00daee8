"""Round-11 probe: per-epoch fold cost of the history-store twins
(W12 SCD2 / W28 changelog view / W30 chunk store) under the
unpartitioned vs bucket-manifest/base-compacted layouts.

The claim under test (round-10 verdict #3): the unpartitioned folds
pay O(store) (W12/W28: whole-table rewrite; W30: whole-store scan +
O(epochs) dir listing) EVERY epoch, while the bucketed layouts pay
~ dirty_buckets * store/B — independent of accumulated history length
once B is sized to the key domain. 30+ epochs each so growth would
show; parity is separately pinned by tests/test_streaming_compaction.py
(this probe measures, it does not re-verify).

Usage: python tools/probe_history_folds.py [base_keys] [epochs] [twins]
  twins: comma list from w12,w28,w30 (default all)
Writes scratch stores under artifacts/probe_folds_<keys>_<epochs>/
(wiped on start; run-scoped so concurrent invocations never collide).
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kinesyslog_spark.session import get_spark  # noqa: E402

ROOT = "artifacts/probe_folds"
B = 256


def _dir_bytes(path: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def timed_epochs(label, n_epochs, run_epoch, store_dir=None):
    """Per-epoch wall time; with store_dir also the BYTES WRITTEN per
    epoch (store-dir growth + rewrites) — at local scale wall time is
    Spark job-overhead-bound, while bytes/epoch is the O(store) term
    that dominates a real cluster's fold cost."""
    import os

    ts, wb = [], []
    prev_sizes: dict[str, int] = {}
    for e in range(n_epochs):
        t0 = time.time()
        run_epoch(e)
        ts.append(time.time() - t0)
        if store_dir and os.path.isdir(store_dir):
            sizes = {
                d: _dir_bytes(os.path.join(store_dir, d))
                for d in os.listdir(store_dir)
                if os.path.isdir(os.path.join(store_dir, d))
            }
            written = sum(
                sz for d, sz in sizes.items() if d not in prev_sizes
            )
            prev_sizes = sizes
            wb.append(written)
    k = max(3, n_epochs // 6)
    head = sum(ts[1:1 + k]) / k  # skip epoch 0 (seed/warm-up)
    tail = sum(ts[-k:]) / k
    extra = ""
    if wb[1:]:
        mb = sum(wb[1:]) / len(wb[1:]) / 1e6
        extra = f" write~{mb:7.2f}MB/ep"
    print(f"{label:34s} first~{head:6.2f}s/ep last~{tail:6.2f}s/ep "
          f"growth x{tail / max(head, 1e-9):4.2f} total {sum(ts):7.1f}s"
          f"{extra}")
    return ts


def w12(spark, base_keys: int, epochs: int) -> None:
    from kinesyslog_spark.streaming.cdc import (
        apply_epoch,
        apply_epoch_bucketed,
    )

    def seed(e):
        if e == 0:
            return spark.range(base_keys).select(
                F.col("id").alias("user_id"),
                F.lit(1000).alias("ts_ms"),
                F.col("id").alias("ord"),
                F.lit("lo").alias("tier"),
            )
        # 20 hot keys flip tier every epoch — runs accumulate
        return spark.range(20).select(
            (F.col("id") * 37).alias("user_id"),
            F.lit(1000 + e * 10).cast("long").alias("ts_ms"),
            (F.lit(e) * 1000 + F.col("id")).alias("ord"),
            F.lit("hi" if e % 2 else "lo").alias("tier"),
        )

    d1, d2 = f"{ROOT}/w12_plain", f"{ROOT}/w12_bucket"
    timed_epochs(
        f"W12 plain (keys={base_keys})", epochs,
        lambda e: apply_epoch(spark, d1, e, seed(e)),
        store_dir=d1,
    )
    timed_epochs(
        f"W12 bucketed B={B}", epochs,
        lambda e: apply_epoch_bucketed(spark, d2, e, seed(e), n_buckets=B),
        store_dir=d2,
    )


def w28(spark, base_keys: int, epochs: int) -> None:
    from kinesyslog_spark.streaming.changelog import (
        make_fold,
        make_fold_bucketed,
    )

    def seed(e):
        if e == 0:
            return spark.range(base_keys).select(
                F.concat(F.lit("k"), F.col("id")).alias("event_type"),
                F.lit(1).cast("long").alias("value"),
            )
        return spark.range(20).select(
            F.concat(F.lit("k"), F.col("id") * 37).alias("event_type"),
            F.lit(e).cast("long").alias("value"),
        )

    p = make_fold(f"{ROOT}/w28_po", f"{ROOT}/w28_ps",
                  "event_type", "value")
    b = make_fold_bucketed(f"{ROOT}/w28_bo", f"{ROOT}/w28_bs",
                           "event_type", "value", n_buckets=B)
    timed_epochs(f"W28 plain (keys={base_keys})", epochs,
                 lambda e: p(seed(e), e), store_dir=f"{ROOT}/w28_ps")
    timed_epochs(f"W28 bucketed B={B}", epochs,
                 lambda e: b(seed(e), e), store_dir=f"{ROOT}/w28_bs")


def w30(spark, epochs: int) -> None:
    from kinesyslog_spark.streaming.chunkstore import (
        make_fold,
        make_fold_bucketed,
    )

    def seed(e):
        # 200 new docs per epoch: the store grows forever (append-only)
        return spark.range(200).select(
            (F.lit(e) * 1000 + F.col("id")).alias("doc_id"),
            F.concat(
                F.lit(f"epoch {e} doc "), F.col("id"),
                F.lit(" filler body text repeated enough to chunk " * 4),
            ).alias("text"),
        )

    # B=16 here: at probe batch sizes (200 docs) larger B writes
    # hundreds of near-empty partition dirs per epoch and the file
    # overhead swamps the listing/scan term under test
    p = make_fold(f"{ROOT}/w30_ps", f"{ROOT}/w30_po")
    b = make_fold_bucketed(f"{ROOT}/w30_bs", f"{ROOT}/w30_bo", n_buckets=16)
    timed_epochs("W30 plain", epochs, lambda e: p(seed(e), e))
    timed_epochs("W30 bucketed+compact B=16", epochs,
                 lambda e: b(seed(e), e))


def main() -> None:
    global ROOT
    base_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    # run-scoped scratch dir: concurrent probe invocations must never
    # share (an overlapping run's start-wipe kills in-flight writes)
    ROOT = f"{ROOT}_{base_keys}_{epochs}"
    twins = (
        set(sys.argv[3].split(",")) if len(sys.argv) > 3
        else {"w12", "w28", "w30"}
    )
    shutil.rmtree(ROOT, ignore_errors=True)
    spark = get_spark("probe_folds")
    if "w12" in twins:
        w12(spark, base_keys, epochs)
    if "w28" in twins:
        w28(spark, base_keys, epochs)
    if "w30" in twins:
        w30(spark, max(epochs, 40))


if __name__ == "__main__":
    main()
