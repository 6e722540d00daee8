"""Capture .explain('formatted') for the named queries into plans/
(round subdir via $PLANS_ROUND, default r13).

Usage: python tools/capture_plans.py <suffix> [query ...]
Defaults to the headline + heavy bench sets at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1). The judge reads these files to check
plan claims in OPTIMIZATION_r12.md against the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, HEAVY  # noqa: E402
from kinesyslog_spark.queries import QUERIES  # noqa: E402
from kinesyslog_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (HEADLINE + HEAVY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
