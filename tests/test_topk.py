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


from hypothesis import given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 1000), st.integers(0, 50)),
    min_size=1, max_size=60, unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=10, deadline=None)
@given(rows=_rows, k=st.integers(1, 6))
def test_topk_property(spark, rows, k):
    df = spark.createDataFrame(rows, "key int, vid int, score int").repartition(8)
    got = sorted(
        (r["key"], r["rn"], r["vid"])
        for r in topk_per_key(df, "key", [F.desc("score"), F.asc("vid")], k).collect()
    )
    want = []
    by_key: dict[int, list] = {}
    for key, vid, score in rows:
        by_key.setdefault(key, []).append((vid, score))
    for key, vs in by_key.items():
        ranked = sorted(vs, key=lambda t: (-t[1], t[0]))[:k]
        want.extend((key, i + 1, vid) for i, (vid, _) in enumerate(ranked))
    assert got == sorted(want)


def test_partial_group_limit_in_plan(spark):
    """Spark 4 rewrites rank-filtered windows into WindowGroupLimit
    Partial/Final — per-partition top-k BEFORE the exchange. Pin it so a
    refactor that breaks the foldable rank filter (and silently shuffles
    the full input) fails here."""
    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("key"),
        F.col("id").alias("vid"),
        ((F.col("id") * 37) % 101).alias("score"),
    ).repartition(8)
    out = topk_per_key(df, "key", [F.desc("score"), F.asc("vid")], 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan[:2000]
    # exactly one hash exchange on the key (plus the input repartition)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
