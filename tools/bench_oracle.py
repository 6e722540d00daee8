"""Time the DuckDB oracle SQL at a given SF dir — the single-node
yardstick BENCH_r{N}.json is compared against (the reference publishes no
numbers, so the same declared queries on DuckDB over the same parquet are
the natural 'reference single-node engine' proxy; see BASELINE.md).

Usage: python tools/bench_oracle.py [sf_dir] [name ...]
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from kinesyslog_spark.queries import ORACLE  # noqa: E402
from kinesyslog_spark.tables import TABLE_NAMES  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = args or [n for n in HEADLINE if n in ORACLE]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute("SET TimeZone = 'UTC'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        n = len(con.execute(ORACLE[name]).fetchall())
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "duckdb_oracle_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
