"""Default-session regression gate (round-1 lesson).

The correctness driver runs `queries()[name](spark, sf_dir)` on a
SparkSession it builds itself — with NONE of the engine configs from
`session.py` (no inferTimestampNTZ=false, no legacy nanosAsLong, no AQE
tuning). Round 1 shipped 9 red CORRECTNESS rows because builder-session
settings masked exactly that: `events.parquet`'s TIMESTAMP(NANOS) was
unreadable and `unix_millis` type-errored on TIMESTAMP_NTZ under a
vanilla session while every local test passed.

This gate runs in a SUBPROCESS because builder-time configs land in the
shared SparkContext conf — `newSession()` in-process would inherit them
and mask failures just like round 1.

The subprocess: vanilla session (master + UTC tz only) -> ANALYZE all
registered queries (schema resolution catches PARQUET_TYPE_ILLEGAL at
footer read and DATATYPE_MISMATCH at analysis) -> EXECUTE the round-1
red set end-to-end.
"""

from __future__ import annotations

import pytest

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The 9 queries that were red in CORRECTNESS_r01.json (driver session
# failures), executed fully — plus q67 which carried the same latent bug.
EXECUTE = [
    "q03_shipping_priority",
    "q10_sessionization",
    "q12_set_ops",
    "q17_json_extract",
    "q18_hourly_event_counts",
    "q23_asof_purchase_click",
    "q24_relay_parse",
    "q25_relay_envelopes",
    "q39_gelf_parse",
    "q67_argmax_orders",
    # round-2 families: one execution each for the decimal-determinism
    # retrieval path and the composed filter verdict
    "q68_bm25_topk",
    "q71_filter_pipeline",
]

_SCRIPT = r"""
import sys

sf_dir = sys.argv[1]
execute = sys.argv[2].split(",")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-gate")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)

sys.path.insert(0, "@@REPO@@")
from kinesyslog_spark.queries import QUERIES

failed = []
for name, fn in QUERIES.items():
    try:
        df = fn(spark, sf_dir)
        df.schema  # force analysis
    except Exception as e:
        failed.append(f"ANALYZE {name}: {type(e).__name__}: {e}")
for name in execute:
    try:
        n = QUERIES[name](spark, sf_dir).count()
        if n <= 0:
            failed.append(f"EXECUTE {name}: empty result")
    except Exception as e:
        failed.append(f"EXECUTE {name}: {type(e).__name__}: {e}")

if failed:
    print("\n".join(failed))
    sys.exit(1)
print(f"vanilla gate OK: {len(QUERIES)} analyzed, {len(execute)} executed")
"""


@pytest.mark.slow
def test_vanilla_session_gate(sf_dir):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@@REPO@@", REPO),
         sf_dir, ",".join(EXECUTE)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, (
        f"vanilla-session gate failed:\n{proc.stdout[-4000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
