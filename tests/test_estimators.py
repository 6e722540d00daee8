"""q134/q135 pins: independent pure-Python HLL model, register
MAX-mergeability (the distributed count-distinct property), and the
histogram sketch's error bound vs the exact quantiles."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kinesyslog_spark.queries import QUERIES
from kinesyslog_spark.queries.estimators import HLL_ALPHA, HLL_M


def _py_hll_registers(values) -> list[int]:
    regs = [0] * HLL_M
    for v in values:
        hv = int(hashlib.md5(f"hll:{v}".encode()).hexdigest()[:15], 16)
        j = hv % HLL_M
        w = hv >> 6
        r = 55 if w == 0 else 54 - w.bit_length() + 1
        regs[j] = max(regs[j], r)
    return regs


def _py_hll_estimate(regs: list[int]) -> float:
    zs = sum(1 << (55 - m) for m in regs)
    return HLL_ALPHA * HLL_M * HLL_M * (1 << 55) / zs


def test_q134_matches_python_model(spark, sf_dir):
    from kinesyslog_spark.tables import load_table

    keys = [
        r["l_partkey"]
        for r in load_table(spark, sf_dir, "lineitem").select("l_partkey").collect()
    ]
    est = _py_hll_estimate(_py_hll_registers(keys))
    row = QUERIES["q134_hll_cardinality"](spark, sf_dir).collect()[0]
    assert row["m"] == HLL_M
    assert row["n_exact"] == len(set(keys))
    assert row["est_raw"] == int(est)
    # standard HLL error bound: ~1.04/sqrt(m) 1-sigma; allow 4 sigma
    assert row["err_frac"] <= 4 * 1.04 / HLL_M ** 0.5


def test_hll_registers_merge_by_max(spark, sf_dir):
    """Sharded sketches MAX-merged equal the whole-corpus sketch — the
    property that makes HLL a distributed/mergeable estimator."""
    from kinesyslog_spark.tables import load_table

    keys = [
        r["l_partkey"]
        for r in load_table(spark, sf_dir, "lineitem").select("l_partkey").collect()
    ]
    whole = _py_hll_registers(keys)
    a = _py_hll_registers(keys[: len(keys) // 2])
    b = _py_hll_registers(keys[len(keys) // 2 :])
    merged = [max(x, y) for x, y in zip(a, b)]
    assert merged == whole


def test_q135_sketch_error_bounded(spark, sf_dir):
    rows = QUERIES["q135_histogram_quantiles"](spark, sf_dir).collect()
    assert [r["p"] for r in rows] == [0.5, 0.9, 0.99]
    for r in rows:
        # 128 equi-width buckets on a bounded distribution: the estimate
        # must sit within one bucket width of the exact quantile.
        assert r["err_frac"] <= 0.02, r
        assert r["est_q"] > 0 and r["exact_q"] > 0


def test_q135_histogram_is_mergeable(spark, sf_dir):
    """Bucket counts from two half-corpus histograms sum cellwise to the
    whole-corpus histogram (same lo/hi frame)."""
    from kinesyslog_spark.queries.estimators import N_BUCKETS
    from kinesyslog_spark.tables import load_table

    v = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x"), F.col("l_orderkey").alias("k")
    )
    mm = v.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    bkt = F.least(
        F.floor((F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo")) * N_BUCKETS),
        F.lit(N_BUCKETS - 1).cast("long"),
    ).alias("bkt")

    def hist(df):
        return {
            r["bkt"]: r["c"]
            for r in df.crossJoin(F.broadcast(mm))
            .select(bkt)
            .groupBy("bkt")
            .agg(F.count("*").alias("c"))
            .collect()
        }

    whole = hist(v)
    ha = hist(v.filter(F.col("k") % 2 == 0))
    hb = hist(v.filter(F.col("k") % 2 == 1))
    merged = {b: ha.get(b, 0) + hb.get(b, 0) for b in set(ha) | set(hb)}
    assert merged == whole
