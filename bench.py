"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (collect of an already-small result,
or count for large ones) after a warm-up of the session; per-query time is
wall clock for plan + execution, reported as the MEDIAN of $BENCH_RUNS
(default 5) executions — the box shows ±25% run-to-run variance
(ROADMAP), so single-shot numbers are not comparable across rounds.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kinesyslog_spark.queries import QUERIES  # noqa: E402
from kinesyslog_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family (scan/agg/join/window/setop/rollup/
# string/json/relay-parse/dedup/similarity/text). Every registered query
# runs if BENCH_ALL=1.
# Heavy set (BENCH_HEAVY=1): the expensive algorithmic plans the
# 15-query headline battery doesn't time — without a median-tracked
# number a regression in one of these is invisible until a scale round.
# Top-6 of the full-battery cost table (ROADMAP round-8 gates), medians
# of 3 (each sample is seconds, so 3 bounds the run at ~2-3 min while
# still discarding one noisy sample). release_hot between queries so
# each pays its own family builds, matching how the full battery runs.
HEAVY = [
    "q72_pagerank",
    "q140_triangle_count",
    "q40_dedup_clusters",
    "q166_power_iteration_pc",
    "q121_prefix_filter_join",
    "q124_image_phash_neardup",
]

HEADLINE = [
    "q01_scan_filter",
    "q02_pricing_summary",
    "q03_shipping_priority",
    "q08_top2_orders_per_customer",
    "q10_sessionization",
    "q13_rollup_revenue",
    "q18_hourly_event_counts",
    "q21_cosine_topk",
    "q22_top_tokens",
    "q24_relay_parse",
    "q25_relay_envelopes",
    "q26_minhash_lsh",
    "q30_language_id",
    "q35_ann_ivf_topk",
    "q123_substring_dedup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    bench_heavy = bool(os.environ.get("BENCH_HEAVY"))
    if os.environ.get("BENCH_ALL"):
        names = list(QUERIES)
    elif bench_heavy:
        names = [n for n in HEAVY if n in QUERIES]
    else:
        names = [n for n in HEADLINE if n in QUERIES]

    # Warm up JVM/codegen and the parquet reader stack once (class loading
    # + footer-reading code paths, NOT the benchmark tables' data) so q01
    # doesn't pay one-time session costs.
    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet").count()
    # Engine warm-up (BENCH_WARM=0 to disable): run the same battery once
    # at the smallest SF. This compiles/JITs each plan's generated code on
    # *different* (sf0.001) data — the timed sf0.1 run below still pays
    # all of its own scans, shuffles and hot-table builds (session caches
    # are keyed by sf_dir), so only engine state is warmed, exactly like a
    # long-running cluster where codegen is compiled once, not per query.
    if os.environ.get("BENCH_WARM", "1") != "0":
        warm_dir = "/root/testdata/sf0.001"
        if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(sf_dir):
            for name in names:
                try:
                    QUERIES[name](spark, warm_dir).count()
                except Exception:
                    pass  # warm-up is best-effort; the timed run decides

    # Medians of 5 (was 3): the box shows ±25% run-to-run variance and
    # 3-sample medians let a single noisy sample move a query's number
    # by that much across rounds (q26 bounced 1.14-1.63 s on identical
    # code); 5 samples make round-over-round regressions attributable.
    runs = max(1, int(os.environ.get(
        "BENCH_RUNS", "3" if bench_heavy else "5"
    )))
    bench_all = bool(os.environ.get("BENCH_ALL"))
    # Family-aware release: the registry tail (lshaudit .. govern) is
    # one near-dup superfamily whose modules consume the SAME session
    # artifacts (q26/q27 pair graphs, CC labels, image rasters+hashes).
    # Releasing at every module boundary forced q181/q182/q183 to each
    # rebuild the q27 pair graph and q184 to re-render the image corpus
    # — ~20 s of rebuilt artifacts per sweep. Modules mapped to the
    # same group share one release; everything else keeps the
    # per-module release (the block-pressure guard that fixed q40's 4x
    # slowdown in long sweeps).
    _NEARDUP_TAIL = ("lshaudit", "dedupsweep", "imageresolve",
                     "provenance", "embsweep", "simaudit", "simresolve",
                     "govern")

    def _family(module: str) -> str:
        base = module.rsplit(".", 1)[-1]
        return "neardup_tail" if base in _NEARDUP_TAIL else base

    times: dict[str, float] = {}
    fresh_times: dict[str, float] = {}
    prev_family: str | None = None
    for name in names:
        fn = QUERIES[name]
        if (bench_all or bench_heavy) and prev_family not in (
                None, _family(fn.__module__)):
            # Full-registry sweeps accumulate persisted blocks (hot
            # tables/tokens/vectors/centroids) across query families;
            # the block-manager pressure measured a 4x slowdown on q40.
            # Release between families — each family rebuilds its own.
            from kinesyslog_spark.tables import release_hot

            release_hot(spark)
        prev_family = _family(fn.__module__)
        samples = []
        n = 0
        for _ in range(runs):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 3)
        fresh_times[name] = round(samples[0], 3)
        detail = "/".join(f"{s:.3f}" for s in samples)
        print(f"# {name}: median {times[name]:.3f}s of [{detail}] ({n} rows)",
              file=sys.stderr)

    total = round(sum(times.values()), 3)
    # Fresh total: the FIRST sample of each query — run 1 pays the
    # session-memoized hot-table/signature builds that the median (warm)
    # number amortizes away. Both are honest; they answer different
    # questions (steady-state service vs one-shot batch).
    fresh_total = round(sum(fresh_times.values()), 3)

    # Extra signal (headline mode only): wall time for the whole battery
    # submitted CONCURRENTLY in one session — the multi-tenant picture.
    # Spark's scheduler interleaves the stages, so the per-query
    # scheduling floor amortizes across queries instead of summing
    # (measured ~2.7x faster than same-session sequential at sf0.1).
    # Does not change the "value" metric's semantics.
    concurrent_sec = None
    if (not bench_all and not bench_heavy
            and os.environ.get("BENCH_CONCURRENT", "1") != "0"):
        import threading

        def _run(q):
            QUERIES[q](spark, sf_dir).count()

        t0 = time.perf_counter()
        ts = [threading.Thread(target=_run, args=(q,)) for q in names]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        concurrent_sec = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "heavy_query_total" if bench_heavy
        else "headline_query_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "fresh": fresh_total,
        "queries_fresh": fresh_times,
        "runs": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if concurrent_sec is not None:
        out["concurrent_sec"] = concurrent_sec
    print(json.dumps(out))


if __name__ == "__main__":
    main()
