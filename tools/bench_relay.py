"""Relay-path throughput: messages/second through the full batch relay
pipeline (frame-resolved lines -> P2-P8 parse -> G1/G4/G5 envelope build
-> gzip-9 record bytes), the engine's equivalent of the reference's hot
path (protocol.py -> message.py -> sink.py).

The reference publishes no throughput numbers; its architecture bounds
it at one CPU per listener process for framing+parse (asyncio,
protocol.py) and one sink worker per listener for envelope+gzip
(sink.py:95). This harness measures the same logical work distributed
over local[N].

Usage: python tools/bench_relay.py [sf_dir]
Prints one JSON line: {"metric": "relay_msgs_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesyslog_spark.queries import QUERIES  # noqa: E402
from kinesyslog_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("bench-relay")
    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet").count()
    # warm codegen on the small SF (engine state only; see bench.py)
    for name in ("q24_relay_parse", "q25_relay_envelopes"):
        QUERIES[name](spark, "/root/testdata/sf0.001").count()

    n_msgs = QUERIES["q24_relay_parse"](spark, sf_dir).count()
    t0 = time.perf_counter()
    parsed = QUERIES["q24_relay_parse"](spark, sf_dir).count()
    t_parse = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_records = QUERIES["q25_relay_envelopes"](spark, sf_dir).count()
    t_env = time.perf_counter() - t0

    total = t_parse + t_env
    print(json.dumps({
        "metric": "relay_msgs_per_sec",
        "value": round(n_msgs / total, 1),
        "unit": "msgs/sec",
        "n_messages": n_msgs,
        "n_records": n_records,
        "parse_sec": round(t_parse, 3),
        "envelope_gzip_sec": round(t_env, 3),
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
