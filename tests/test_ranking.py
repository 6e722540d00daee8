"""operators/ranking.py — distributed ROW_NUMBER/NTILE parity + plan pins.

The helper exists so global-order queries (q84, q135, pipeline SHARD
stage) never execute a single-partition WindowExec; these tests pin both
halves: exact tie-semantics parity with Spark's own window functions on
a small frame, and the executed-plan shape (literal-boundary bucket
windows, zero unpartitioned windows, recompute-consistency)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesyslog_spark.operators.ranking import (
    ntile_from_rank,
    with_global_rank,
    with_ntile,
)
from kinesyslog_spark.plans.checks import facts, unpartitioned_window_count


def _frame(spark, n=3000, seed=11, card=80):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, card)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(6)


def test_global_rank_matches_row_number(spark):
    df = _frame(spark)
    got = with_global_rank(df, ["n_tokens", "doc_id"], "rn").select("doc_id", "rn")
    ref = df.select(
        "doc_id",
        F.row_number().over(Window.orderBy("n_tokens", "doc_id")).alias("rn"),
    )
    assert (
        ref.alias("a").join(got.alias("b"), "doc_id")
        .filter("a.rn <> b.rn").count() == 0
    )


def test_ntile_matches_sql_ntile_all_bucket_counts(spark):
    # Closed-form bucket arithmetic must replicate SQL NTILE tie
    # semantics for totals that are/aren't multiples of n, and n > total.
    for n_rows, n_buckets in [(997, 16), (1024, 16), (5, 16), (100, 7)]:
        df = _frame(spark, n=n_rows)
        got = with_ntile(df, ["n_tokens", "doc_id"], n_buckets, "b").select(
            "doc_id", "b"
        )
        ref = df.select(
            "doc_id",
            F.ntile(n_buckets)
            .over(Window.orderBy("n_tokens", "doc_id"))
            .cast("long")
            .alias("b"),
        )
        assert (
            ref.alias("a").join(got.alias("b"), "doc_id")
            .filter("a.b <> b.b").count() == 0
        ), f"NTILE mismatch at n_rows={n_rows} n_buckets={n_buckets}"


def test_ties_yield_rank_permutation(spark):
    # Heavy ties on the order key: ranks must still be a 1..n permutation
    # (ties stay inside one range partition, so no rank collisions).
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(500)], "doc_id long, x long"
    )
    vals = sorted(
        r.rn for r in with_global_rank(df, ["x"], "rn").select("rn").collect()
    )
    assert vals == list(range(1, 501))


def test_empty_frame(spark):
    df = spark.createDataFrame([], "doc_id long, x long")
    assert with_ntile(df, ["x"], 8, "b").count() == 0


def test_plan_has_no_unpartitioned_window(spark):
    df = _frame(spark)
    out = with_ntile(df, ["n_tokens", "doc_id"], 16, "b")
    f = facts(out)
    # the local-rank window must hash-partition on the literal-boundary
    # bucket id, never run partitionless
    assert "hashpartitioning(__gr_pid" in f.text
    out.count()
    assert unpartitioned_window_count(out) == 0


def test_boundaries_balance_buckets(spark):
    # literal sampled boundaries must spread a uniform frame across many
    # buckets with no mega-bucket (the whole point vs one global task)
    from kinesyslog_spark.operators.ranking import _boundary_tuples, _pid_expr

    df = _frame(spark, n=20000, card=5000)
    bounds = _boundary_tuples(df, ["n_tokens", "doc_id"], 16)
    assert len(bounds) >= 8
    counts = [
        r.c
        for r in df.withColumn(
            "pid", _pid_expr(df, ["n_tokens", "doc_id"], bounds)
        )
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert sum(counts) == 20000
    assert max(counts) <= 4 * (20000 // len(counts)), (
        f"hot bucket: {sorted(counts)}"
    )


def test_rank_consistent_under_recomputation(spark):
    # pid is a pure function of the row (literal boundaries), so the
    # offset subtree and the rank subtree agree even though Spark does
    # NOT reuse the exchange between them. Pin: ranks of a non-cached,
    # multiply-recomputed input form an exact permutation and match
    # row_number on a second evaluation.
    df = _frame(spark, n=5000, seed=3, card=200)
    ranked = with_global_rank(df, ["n_tokens", "doc_id"], "rn")
    first = {r.doc_id: r.rn for r in ranked.collect()}
    second = {r.doc_id: r.rn for r in ranked.collect()}
    assert first == second
    assert sorted(first.values()) == list(range(1, 5001))


def test_null_order_keys_rank_first(spark):
    # ASC NULLS FIRST parity: null keys must land in bucket 0 and take
    # the lowest ranks, exactly as Spark's own window functions order.
    rows = [(i, None if i % 7 == 0 else i % 50) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, x integer")
    got = with_global_rank(df, ["x", "doc_id"], "rn").select("doc_id", "rn")
    ref = df.select(
        "doc_id", F.row_number().over(Window.orderBy("x", "doc_id")).alias("rn")
    )
    assert (
        ref.alias("a").join(got.alias("b"), "doc_id")
        .filter("a.rn <> b.rn").count() == 0
    )


def test_hypothesis_ntile_parity(spark):
    # randomized NTILE parity across bucket counts and tie densities
    import random

    for trial in range(4):
        rng = random.Random(100 + trial)
        n = rng.randint(1, 400)
        card = rng.choice([1, 3, 40, 10**9])
        buckets = rng.choice([2, 7, 16, 63])
        rows = [(i, rng.randint(0, card)) for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id long, x long")
        got = with_ntile(df, ["x", "doc_id"], buckets, "b").select("doc_id", "b")
        ref = df.select(
            "doc_id",
            F.ntile(buckets).over(Window.orderBy("x", "doc_id"))
            .cast("long").alias("b"),
        )
        bad = (
            ref.alias("a").join(got.alias("b"), "doc_id")
            .filter("a.b <> b.b").count()
        )
        assert bad == 0, f"trial {trial}: n={n} card={card} k={buckets}"


# --- exact_rank_values: histogram selection (no full-column shuffle) ---

def test_exact_rank_values_matches_sorted(spark):
    from kinesyslog_spark.operators.ranking import exact_rank_values

    rng = random.Random(7)
    cases = [
        [rng.uniform(-1e6, 1e6) for _ in range(5001)],       # continuous
        [float(rng.choice([1, 2, 2, 2, 9])) for _ in range(4000)],  # dups
        [rng.paretovariate(1.1) for _ in range(3000)],        # heavy skew
        [42.0] * 1234,                                        # all equal
        [3.25],                                               # single row
    ]
    for data in cases:
        df = spark.createDataFrame([(v,) for v in data], "x double")
        s = sorted(data)
        n = len(s)
        ranks = sorted({1, (n + 1) // 2, (n + 2) // 2, n})
        got = exact_rank_values(df, "x", ranks, buckets=64, final_cap=256)
        assert got == [s[r - 1] for r in ranks]


def test_exact_rank_values_deep_recursion_on_dup_mass(spark):
    # one value holds >final_cap rows: the span must collapse to that
    # value via the min==max early exit, not loop or collect unbounded
    from kinesyslog_spark.operators.ranking import exact_rank_values

    data = [5.0] * 3000 + [float(i) for i in range(100)]
    df = spark.createDataFrame([(v,) for v in data], "x double")
    s = sorted(data)
    got = exact_rank_values(df, "x", [1500], buckets=16, final_cap=64)
    assert got == [s[1499]]


def test_exact_median_parity_and_nulls(spark):
    from kinesyslog_spark.operators.ranking import exact_median

    rng = random.Random(13)
    for n in (1, 2, 7, 500, 501):
        data = [rng.uniform(0, 100) for _ in range(n)]
        df = spark.createDataFrame(
            [(v,) for v in data] + [(None,), (None,)], "x double"
        )
        s = sorted(data)
        m, cnt = exact_median(df, "x")
        assert cnt == n
        assert m == (s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]) / 2.0


def test_exact_rank_values_empty_raises(spark):
    import pytest

    from kinesyslog_spark.operators.ranking import exact_rank_values

    df = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError):
        exact_rank_values(df, "x", [1])
