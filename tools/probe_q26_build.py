"""Stage-by-stage timing of the FRESH q26 (hot_minhash_pairs) build —
VERDICT r12 task #3: the fresh headline path pays this build once per
session; find where the seconds go before trimming it.

Stages (in build order):
  1 hot_table(documents)   scan + spread + persist + count
  2 hot_tokens             tokenize + persist + count
  3 sigs (hot_shingle_sigs) shingle persist + K-MIN aggregate + count
  4 slot estimate          lsh_slot_estimate aggregate over bands
  5 cand+verify persist    band explode -> buckets -> pairs -> Jaccard
  6 q26 action             orderBy over the cached pairs + count
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesyslog_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_q26_build")
    spark.range(1000).count()

    import kinesyslog_spark.queries.dedup as dd
    from kinesyslog_spark import tables
    from kinesyslog_spark.queries import QUERIES

    # Warm codegen at the smallest SF (like bench.py), then drop artifacts.
    QUERIES["q26_minhash_lsh"](spark, "/root/testdata/sf0.001").count()
    tables.release_hot(spark)

    t = time.perf_counter()

    def lap(label: str) -> None:
        nonlocal t
        now = time.perf_counter()
        print(f"{label:30s} {now - t:7.3f}s")
        t = now

    tables.hot_table(spark, sf_dir, "documents")
    lap("1 hot_table(documents)")
    tables.hot_tokens(spark, sf_dir)
    lap("2 hot_tokens")
    dd.hot_shingle_sigs(spark, sf_dir)
    lap("3 shingles+sigs")
    # stage 4 (the slot-budget estimate) runs INSIDE hot_minhash_pairs'
    # _pair_candidates call — timed as part of stage 5
    dd.hot_minhash_pairs(spark, sf_dir)
    lap("5 estimate+cand+verify persist")
    QUERIES["q26_minhash_lsh"](spark, sf_dir).count()
    lap("6 q26 action (cache read)")


if __name__ == "__main__":
    main()
