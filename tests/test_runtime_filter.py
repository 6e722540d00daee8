"""Runtime bloom-filter join pruning: at cluster scale, a selective
predicate on the dim side of a SHUFFLE join should also prune the fact
side's shuffle via an injected bloom filter (Spark's runtime filter
optimization) — the fact rows that cannot match never leave the map
stage. This pins that the mechanism fires (might_contain in the final
plan) and that results are unchanged, with thresholds lowered so
test-sized data trips them (production defaults: 10 MB creation side /
10 GB application side)."""

from __future__ import annotations

from pyspark.sql import functions as F

CONFS = {
    # force a shuffle join: broadcast would make the runtime filter moot
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
}


def test_bloom_runtime_filter_prunes_fact_shuffle(spark, sf_dir):
    saved = {k: spark.conf.get(k, None) for k in CONFS}
    try:
        for k, v in CONFS.items():
            spark.conf.set(k, v)
        # selective dim: one order priority (~20% of orders); fact side
        # lineitem shuffles on l_orderkey — the bloom built from the
        # filtered orders keys must be applied to lineitem pre-shuffle
        orders = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        rows = joined.collect()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in final, (
            "runtime bloom filter was not injected:\n" + final[:2000]
        )
        # results identical to the unfiltered-plan join
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        base = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert len(rows) == base
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
