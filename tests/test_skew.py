"""Skew guard: hot-bucket capping keeps LSH candidate generation bounded
on a boilerplate-heavy corpus without losing legitimate near-dup pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesyslog_spark.queries.dedup import _pair_candidates, cap_hot_buckets


def _keyed(spark):
    # bucket "hot": 200 boilerplate docs; buckets b1/b2: genuine pairs
    rows = (
        [(i, "hot") for i in range(200)]
        + [(1000, "b1"), (1001, "b1")]
        + [(2000, "b2"), (2001, "b2"), (2002, "b2")]
    )
    return spark.createDataFrame(rows, "doc_id long, bucket string")


def test_cap_drops_only_hot_bucket(spark):
    keyed = _keyed(spark)
    capped = cap_hot_buckets(keyed, ["bucket"], max_bucket=50)
    left = {r["bucket"] for r in capped.select("bucket").distinct().collect()}
    assert left == {"b1", "b2"}


def test_candidates_bounded_with_cap(spark):
    keyed = _keyed(spark)
    uncapped = _pair_candidates(keyed, ["bucket"]).count()
    capped = _pair_candidates(keyed, ["bucket"], max_bucket=50)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # 200 boilerplate docs -> 19900 pairs uncapped; capped keeps only the
    # 1 + 3 genuine pairs
    assert uncapped == 19900 + 1 + 3
    assert got == {(1000, 1001), (2000, 2001), (2000, 2002), (2001, 2002)}


def test_no_cap_is_identity(spark):
    keyed = _keyed(spark)
    assert cap_hot_buckets(keyed, ["bucket"], None) is keyed
    assert (
        cap_hot_buckets(keyed, ["bucket"], max_bucket=10_000).count()
        == keyed.count()
    )


def test_capped_minhash_still_finds_planted_dups(spark):
    """q26 with a tight cap still returns every planted near-dup pair at
    sf0.001 (no hot buckets exist there, so output is unchanged)."""
    from kinesyslog_spark.queries.dedup import q26_minhash_lsh

    base = {tuple(r) for r in q26_minhash_lsh(spark, "/root/testdata/sf0.001").collect()}
    assert len(base) >= 1  # planted dups exist at this sf


def test_q26_end_to_end_hot_corpus_capped(spark, tmp_path, monkeypatch):
    """A boilerplate-dominated corpus (300 identical docs = every band a
    hot bucket) with a tight cap: the quadratic bucket is dropped whole,
    the planted non-boilerplate duplicate pair still comes through, and
    candidate generation never materializes the 300^2 pair set."""
    import kinesyslog_spark.queries.dedup as dd

    hot = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    planted = "one two three four five six seven eight nine ten eleven"
    rows = [(i, hot, "en", "src0", len(hot)) for i in range(300)]
    rows += [(1000, planted, "en", "src1", len(planted)),
             (1001, planted, "en", "src1", len(planted))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    monkeypatch.setattr(dd, "LSH_MAX_BUCKET", 50)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dd.q26_minhash_lsh(spark, str(tmp_path)).collect()
    }
    assert pairs == {(1000, 1001)}

    # Uncapped twin on the same fixture: the hot bucket explodes into
    # 300*299/2 pairs — the work the cap exists to avoid.
    monkeypatch.setattr(dd, "LSH_MAX_BUCKET", None)
    n = dd.q26_minhash_lsh(spark, str(tmp_path)).count()
    assert n == 300 * 299 // 2 + 1


def test_connected_components_matches_union_find(spark):
    """Property: min-label propagation equals a reference union-find on
    random-ish (but fixed-seed) edge lists, including chains deeper than
    one hop and isolated pairs."""
    import random

    from kinesyslog_spark.queries.cluster import connected_components

    rng = random.Random(42)
    nodes = list(range(80))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    edges += [(100, 101), (101, 102), (102, 103)]  # a 4-chain (diameter 3)

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == expected


def test_salted_join_equivalence_and_spread(spark):
    """salted_join returns exactly the plain join's rows, and a hot key's
    rows are spread across the full salt space (the straggler fix)."""
    from kinesyslog_spark.operators.skew import salt_column, salted_join

    # 90% of fact rows share key 1 (the hot key).
    facts = spark.createDataFrame(
        [(i, 1 if i < 900 else i % 7 + 2, f"p{i}") for i in range(1000)],
        "row_id long, k int, payload string",
    )
    dims = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 9)], "k int, dim_val string"
    )

    plain = {tuple(r) for r in facts.join(dims, "k").collect()}
    salted = {
        tuple(r)
        for r in salted_join(facts, dims, ["k"], ["row_id"], n_salt=8).collect()
    }
    assert salted == plain

    # left join parity (unmatched keys survive exactly once)
    plain_l = {tuple(r) for r in facts.join(dims, "k", "left").collect()}
    salted_l = {
        tuple(r)
        for r in salted_join(facts, dims, ["k"], ["row_id"], n_salt=8, how="left").collect()
    }
    assert salted_l == plain_l

    spread = (
        facts.filter(F.col("k") == 1)
        .select(salt_column(["row_id"], 8).alias("s"))
        .distinct()
        .count()
    )
    assert spread == 8, "hot key must occupy every salt bucket"


def _skewed_frames(spark, n_rows=60_000, n_keys=300):
    """Big side with ~50% of rows on ONE hot key (150x the average),
    small side one row per key."""
    big = spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.col("id") % n_keys).alias("k"),
        F.col("id").alias("rid"),
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    return big, small


def test_salted_join_identical_results_and_balanced_shuffle(spark):
    """The deliberately hot key (150x skew) makes one naive shuffle
    partition the straggler; salting spreads it across the salt space
    with IDENTICAL join output — the 100 TB mitigation, demonstrated."""
    from kinesyslog_spark.operators.skew import salt_column, salted_join

    big, small = _skewed_frames(spark)
    naive = big.join(small, "k")
    salted = salted_join(big, small, on=["k"], big_salt_cols=["rid"],
                         n_salt=16)

    # identical results (count + order-insensitive checksum)
    agg = lambda df: df.agg(  # noqa: E731
        F.count("*").alias("n"),
        F.sum(F.col("rid") * F.col("v")).alias("chk"),
    ).collect()[0]
    rn, rs = agg(naive), agg(salted)
    assert (rn.n, rn.chk) == (rs.n, rs.chk)

    # straggler math: per-(join-key) load vs per-(join-key, salt) load.
    # The naive shuffle hashes on k alone -> the hot key's whole 30k rows
    # land in one task; salting splits them ~uniformly over 16 subkeys.
    naive_max = (
        big.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    )
    salted_loads = (
        big.withColumn("_s", salt_column(["rid"], 16))
        .groupBy("k", "_s").count()
        .agg(F.max("count").alias("mx")).collect()[0].mx
    )
    assert naive_max >= 30_000  # the planted hot key
    assert salted_loads < naive_max / 8, (
        f"salt failed to spread the hot key: {salted_loads} vs {naive_max}"
    )


def test_aqe_splits_skewed_sort_merge_join(spark):
    """With broadcast disabled (both sides 'big'), AQE's skew-join
    handling must split the hot partition at runtime — the executed
    plan carries the skew=true marker and results stay correct."""
    big, small = _skewed_frames(spark)
    # inflate the small side so Spark can't broadcast its way out, and
    # lower AQE's skew thresholds so test-sized data trips them
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8k",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        pad = F.concat_ws("", F.array_repeat(F.lit("x"), 64)).alias("pad")
        joined = (
            big.select("k", "rid", pad)
            .join(small.select("k", "v", pad), "k")
        )
        # execute THIS frame (count() would build a separate plan whose
        # AQE result we couldn't inspect), then read its final plan
        n = len(joined.collect())
        assert n == big.count()  # every big row matches exactly one key
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, (
            "AQE did not split the skewed join:\n" + final[:2000]
        )
        assert "skewed" in final  # the AQEShuffleRead split marker
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
