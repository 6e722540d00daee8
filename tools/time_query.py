"""Time individual queries in isolation (OPTIMIZATION_r12 guide §1).

Usage: python tools/time_query.py [--noop] [--runs N] [--fresh] q...
  --noop   time df.write.format('noop') (computes every column) instead
           of .count() (bench.py's timed action)
  --fresh  release_hot() before EVERY run, so each sample pays its own
           family/hot-table builds (the bench's first-sample picture)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints per-run seconds and the median; jobs are labelled for the UI.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesyslog_spark.queries import QUERIES  # noqa: E402
from kinesyslog_spark.session import get_spark  # noqa: E402
from kinesyslog_spark.tables import release_hot  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    noop = "--noop" in args
    fresh = "--fresh" in args
    args = [a for a in args if a not in ("--noop", "--fresh")]
    runs = 5
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-query")
    spark.range(1000).count()  # JVM warm-up
    for name in args:
        fn = QUERIES[name]
        samples = []
        for r in range(runs):
            if fresh:
                release_hot(spark)
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            samples.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        detail = "/".join(f"{s:.3f}" for s in samples)
        print(f"{name}: median {statistics.median(samples):.3f}s "
              f"of [{detail}] ({n} rows)")


if __name__ == "__main__":
    main()
