"""One-off scaling measurement for the round-5-continuation queries
(q161-q170): wall time at sf0.001/0.01/0.1 and the log-log slope
(alpha) between the two largest SFs. Appends nothing; prints a
markdown table for SCALING_R5.md.

Usage: python tools/bench_new_r5.py
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

from kinesyslog_spark.queries import QUERIES  # noqa: E402
from kinesyslog_spark.session import get_spark  # noqa: E402
from kinesyslog_spark.tables import release_hot  # noqa: E402

NEW = [
    "q161_logreg_gd",
    "q162_cdc_chunk_dedup",
    "q163_split_leakage",
    "q164_calibration_bins",
    "q165_cluster_split",
    "q166_power_iteration_pc",
    "q167_hll_audience_overlap",
    "q168_benford_audit",
    "q169_split_disciplined_auc",
    "q170_snapshot_diff",
]

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    spark = get_spark("scaling-new")
    rows = []
    for name in NEW:
        times = []
        for sf in SFS:
            release_hot(spark)
            spark.catalog.clearCache()
            t0 = time.time()
            QUERIES[name](spark, f"/root/testdata/sf{sf}").collect()
            times.append(time.time() - t0)
        alpha = (
            math.log(times[2] / times[1]) / math.log(10.0)
            if times[1] > 0 else float("nan")
        )
        rows.append((name, *times, alpha))
        print(
            f"| {name} | {times[0]:.2f} | {times[1]:.2f} | "
            f"{times[2]:.2f} | {alpha:.2f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
