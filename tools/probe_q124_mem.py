"""Measure q124's pair-kernel peak memory per coarse group at a given
SF (SCALING_R9 task #8: bound the ADMITTED case the way the slot
budget bounds the worst case).

The multi-index kernel processes each of the 64 coarse groups inside
one Python worker: the group's resident footprint is its input frame
(the bucket-key rows with their 8-long hash vectors), the packed
(m, 64-byte) uint8 hash matrix, and the SELECTED pairs only — slot
comparisons stream row-at-a-time against a bucket-run slice, so slot
count is work, not memory. This probe verifies that claim with
numbers: it wraps the kernel, records per-group input rows, output
pairs, wall time, and the worker's ru_maxrss high-water, appending one
CSV line per group to a side file (local mode: one box, tiny lines).

Usage: python tools/probe_q124_mem.py [sf_dir] [stats_out]
  (defaults: artifacts/sf10 /tmp/q124_mem_stats.csv)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATS = os.environ.get("Q124_MEM_STATS", "/tmp/q124_mem_stats.csv")


def make_instrumented(stats_path: str):
    from kinesyslog_spark.queries.imagehash import _phash_bucket_pairs

    def instrumented(pdf):
        import resource
        import time

        t0 = time.perf_counter()
        out = _phash_bucket_pairs(pdf)
        dt = time.perf_counter() - t0
        rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        with open(stats_path, "a") as f:
            f.write(f"{len(pdf)},{len(out)},{dt:.3f},{rss_kb}\n")
        return out

    return instrumented


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/sf10"
    stats = sys.argv[2] if len(sys.argv) > 2 else STATS
    if os.path.exists(stats):
        os.remove(stats)

    import kinesyslog_spark.queries.imagehash as ih
    from kinesyslog_spark.queries import QUERIES
    from kinesyslog_spark.session import get_spark

    spark = get_spark("probe_q124_mem")
    ih.PHASH_MAX_SLOTS = None  # admit the saturated case on purpose
    ih._phash_bucket_pairs = make_instrumented(stats)

    import time

    t0 = time.perf_counter()
    n = QUERIES["q124_image_phash_neardup"](spark, sf_dir).count()
    wall = time.perf_counter() - t0

    rows = []
    with open(stats) as f:
        for line in f:
            m, o, dt, rss = line.strip().split(",")
            rows.append((int(m), int(o), float(dt), int(rss)))
    rows.sort(key=lambda r: -r[0])
    tot_in = sum(r[0] for r in rows)
    tot_out = sum(r[1] for r in rows)
    max_rss_gb = max(r[3] for r in rows) / (1 << 20)
    print(f"q124 @ {sf_dir}: {n} result rows, wall {wall:.1f}s, "
          f"{len(rows)} kernel groups")
    print(f"group input rows: total {tot_in:,}, max {rows[0][0]:,}; "
          f"pairs emitted {tot_out:,}")
    print(f"worker ru_maxrss high-water: {max_rss_gb:.2f} GiB")
    print("top-5 groups (in_rows, out_pairs, sec, rss_kb):")
    for r in rows[:5]:
        print(f"  {r}")


if __name__ == "__main__":
    main()
