"""Bisect the r12 q30/q35 headline regression (VERDICT r12 task #1).

Hypotheses: (a) host contention on the driver box, (b) block-manager
pressure from the q26-family session artifacts that stay resident
through the headline battery (hot_minhash_pairs + hot_shingle_sigs
precede q30/q35 in battery order and are never released in headline
mode).

Method: in ONE session, time q30/q35 (medians of 5) BEFORE any q26
artifact exists, then build the q26 family artifacts exactly as the
battery does (run q26), report resident storage memory, and time
q30/q35 again. If the with-artifacts medians match the without ones,
block pressure is refuted and the driver regression attributes to
host noise (three idle HEAD bench runs are the corroborating leg).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesyslog_spark.queries import QUERIES  # noqa: E402
from kinesyslog_spark.session import get_spark  # noqa: E402


def med5(fn, spark, sf_dir):
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples), samples


def storage_mb(spark) -> float:
    total = 0
    for rdd in spark.sparkContext._jsc.sc().getRDDStorageInfo():
        total += rdd.memSize()
    return total / (1 << 20)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_q30_q35")
    spark.range(1000).count()
    # warm codegen on the smallest SF like bench.py does
    for name in ("q30_language_id", "q35_ann_ivf_topk", "q26_minhash_lsh"):
        QUERIES[name](spark, "/root/testdata/sf0.001").count()
    from kinesyslog_spark.tables import release_hot

    release_hot(spark)  # drop the warm-up artifacts: clean A side

    q30, q35 = QUERIES["q30_language_id"], QUERIES["q35_ann_ivf_topk"]

    m30a, s30a = med5(q30, spark, sf_dir)
    m35a, s35a = med5(q35, spark, sf_dir)
    print(f"A (no q26 artifacts, storage {storage_mb(spark):.1f} MB): "
          f"q30 {m30a:.3f} {['%.3f' % s for s in s30a]} | "
          f"q35 {m35a:.3f} {['%.3f' % s for s in s35a]}")

    t0 = time.perf_counter()
    QUERIES["q26_minhash_lsh"](spark, sf_dir).count()
    print(f"q26 build: {time.perf_counter() - t0:.3f}s, "
          f"storage now {storage_mb(spark):.1f} MB")

    m30b, s30b = med5(q30, spark, sf_dir)
    m35b, s35b = med5(q35, spark, sf_dir)
    print(f"B (q26 artifacts resident, storage {storage_mb(spark):.1f} MB): "
          f"q30 {m30b:.3f} {['%.3f' % s for s in s30b]} | "
          f"q35 {m35b:.3f} {['%.3f' % s for s in s35b]}")
    print(f"delta: q30 {m30b - m30a:+.3f}s  q35 {m35b - m35a:+.3f}s")


if __name__ == "__main__":
    main()
