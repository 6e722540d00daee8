"""q123 exact substring dedup: pinned against an INDEPENDENT O(n^2)
pairwise suffix-compare reference (a different algorithm from the
k-gram window-union the operator uses), on hand-built corpora and on
hypothesis-random corpora over a tiny alphabet (forcing collisions)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesyslog_spark.queries import QUERIES
from kinesyslog_spark.queries.substring import SUBSTR_K, duplicated_spans


def brute_force_spans(corpus: dict[int, list[str]], k: int):
    """Reference: pairwise suffix LCP scan. Any two corpus positions
    whose suffixes share a common prefix of >= k tokens contribute that
    full prefix range to both documents; maximal spans are the merged
    runs of covered token positions. Quadratic and oblivious to the
    operator's k-gram/md5/window machinery."""
    covered: dict[int, set[int]] = {d: set() for d in corpus}
    pos = [
        (d, i) for d, ts in corpus.items() for i in range(len(ts))
    ]
    for a in range(len(pos)):
        d1, i1 = pos[a]
        for b in range(a + 1, len(pos)):
            d2, i2 = pos[b]
            t1, t2 = corpus[d1], corpus[d2]
            lcp = 0
            while (
                i1 + lcp < len(t1)
                and i2 + lcp < len(t2)
                and t1[i1 + lcp] == t2[i2 + lcp]
            ):
                lcp += 1
            if lcp >= k:
                covered[d1].update(range(i1, i1 + lcp))
                covered[d2].update(range(i2, i2 + lcp))
    out = []
    for d, cov in covered.items():
        run: list[int] = []
        for p in sorted(cov) + [-1]:
            if run and p != run[-1] + 1:
                out.append((d, run[0], run[-1] + 1, len(run)))
                run = []
            if p >= 0:
                run.append(p)
    return sorted(out)


def _spark_spans(spark, corpus: dict[int, list[str]], k: int):
    df = spark.createDataFrame(
        [(d, " ".join(ts)) for d, ts in corpus.items()],
        "doc_id long, text string",
    )
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, k=k).collect()
    )


def test_handbuilt_corpus(spark):
    # doc 0 and 1 share a 6-token run; doc 2 repeats its own 5-token
    # run twice (same-doc duplication counts); doc 3 is clean.
    share = ["x1", "x2", "x3", "x4", "x5", "x6"]
    rep = ["r1", "r2", "r3", "r4", "r5"]
    corpus = {
        0: ["a0", "a1"] + share + ["a2"],
        1: ["b0"] + share + ["b1", "b2", "b3"],
        2: rep + ["c0"] + rep + ["c1"],
        3: [f"z{i}" for i in range(12)],
    }
    for k in (3, 5, 6):
        assert _spark_spans(spark, corpus, k) == brute_force_spans(corpus, k)
    # k above every duplicated run: nothing survives
    assert _spark_spans(spark, corpus, 7) == []


_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=1, max_size=14
    ),
    min_size=2,
    max_size=5,
)


@settings(max_examples=12, deadline=None)
@given(docs=_corpus)
def test_random_corpora_match_suffix_scan(spark, docs):
    corpus = {d: ts for d, ts in enumerate(docs)}
    for k in (2, 3):
        assert _spark_spans(spark, corpus, k) == brute_force_spans(corpus, k)


def test_q123_registry_shape(spark, sf_dir):
    rows = QUERIES["q123_substring_dedup"](spark, sf_dir).collect()
    for r in rows:
        assert r.span_end - r.span_start == r.span_tokens >= SUBSTR_K
    # spans within a doc are disjoint, non-adjacent (maximal merge)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert s2 > e1


def test_planted_hot_gram_skew(spark):
    # Skew guard for the two-level duplicated-gram count (r13): one
    # boilerplate gram carries >= 20% of all gram occurrences. The
    # level-1 (g, salt) aggregate must still produce exactly the
    # brute-force spans — every position of the hot gram appears in
    # exactly one salt bucket, and the level-2 per-gram total (sum of
    # bucket counts) equals the old single-window count.
    boiler = ["h1", "h2", "h3"]
    corpus: dict[int, list[str]] = {}
    for d in range(20):
        # boilerplate header on every doc (the planted hot gram),
        # unique tail per doc
        corpus[d] = boiler + [f"u{d}_{i}" for i in range(8)]
    # hot-gram occurrences: 20 of ~220 total 3-gram positions, and the
    # 3-gram "h1 h2 h3" alone is 20 identical keys — far beyond any
    # single salt bucket.
    assert _spark_spans(spark, corpus, 3) == brute_force_spans(corpus, 3)

    # SUBSTR_SALTS must genuinely split the hot gram: with 20 identical
    # (g) keys and deterministic position salts, more than one salt
    # bucket is occupied (probability of collapse is 16^-19).
    from pyspark.sql import functions as F

    from kinesyslog_spark.queries.substring import SUBSTR_SALTS

    df = spark.createDataFrame(
        [(d, " ".join(ts)) for d, ts in corpus.items()],
        "doc_id long, text string",
    )
    k = 3
    from kinesyslog_spark.operators.text import tokens

    gpos = df.select(
        "doc_id", tokens(F.col("text")).alias("ts")
    ).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(ts) - {k}),"
                f" i -> unhex(md5(array_join(slice(ts, i + 1, {k}), ' '))))"
            )
        ).alias("s", "g"),
    )
    buckets = (
        gpos.groupBy(
            "g",
            F.pmod(F.xxhash64("doc_id", "s"), F.lit(SUBSTR_SALTS)).alias("salt"),
        )
        .agg(F.count(F.lit(1)).alias("c1"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_buckets"), F.sum("c1").alias("total"))
        .filter(F.col("total") >= 20)
        .collect()
    )
    assert buckets and all(r.n_buckets > 1 for r in buckets)


def test_q125_consistent_with_q123(spark, sf_dir):
    spans = QUERIES["q123_substring_dedup"](spark, sf_dir).collect()
    dup_by_doc: dict[int, int] = {}
    for r in spans:
        dup_by_doc[r.doc_id] = dup_by_doc.get(r.doc_id, 0) + r.span_tokens
    rows = QUERIES["q125_substring_dedup_apply"](spark, sf_dir).collect()
    assert rows
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    for r in rows:
        assert r.dup_tokens == dup_by_doc.get(r.doc_id, 0)
        assert r.kept_tokens + r.dup_tokens == r.n_tokens
        if r.kept_tokens == 0:
            assert r.kept_md5 == empty_md5
