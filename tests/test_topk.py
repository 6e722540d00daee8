"""Two-phase top-k (operators/topk.py) must equal the single-window
form for any deterministic total order."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesyslog_spark.operators.topk import topk_per_key


def test_matches_single_window(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("key"),
        F.col("id").alias("vid"),
        ((F.col("id") * 37) % 101).alias("score"),
    ).repartition(16)
    got = {
        (r["key"], r["rn"]): r["vid"]
        for r in topk_per_key(
            df, "key", [F.desc("score"), F.asc("vid")], 5
        ).collect()
    }
    w = W.partitionBy("key").orderBy(F.desc("score"), F.asc("vid"))
    want = {
        (r["key"], r["rn"]): r["vid"]
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5).collect()
    }
    assert got == want


def test_k_larger_than_group(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "key int, vid int"
    ).repartition(8)
    rows = topk_per_key(df, "key", [F.asc("vid")], 5).collect()
    assert len(rows) == 3
