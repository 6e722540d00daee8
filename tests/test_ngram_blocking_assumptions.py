"""q28/q117 blocking corpus-assumption guards (round-7 ADVICE).

The round-7 rewrite blocks candidates on 9-gram shingle MinHash bands
(NGRAM_BLOCK_N) while verifying on 5-gram jaccard. That design leans on
two MEASURED corpus facts: no document is shorter than the blocking
gram (shorter docs silently leave the candidate universe), and blocking
recall only degrades in the documented 0.5-0.8 boundary band — every
high-jaccard pair survives. Nothing re-verified those facts if the
generator or corpus changed; these tests do, against brute force, so a
corpus change fails loudly instead of silently losing pairs."""

from __future__ import annotations

import pytest


def test_corpus_meets_blocking_min_length(duck):
    """No doc may be shorter than the blocking gram width — such docs
    get no blocking shingles and silently leave the candidate universe
    (the oracle mirrors the exclusion, so the hash gate would stay
    green while pairs are lost)."""
    from kinesyslog_spark.queries.dedup import NGRAM_BLOCK_N

    mn = duck.execute("SELECT MIN(strlen(text)) FROM documents").fetchone()[0]
    assert mn >= NGRAM_BLOCK_N, (
        f"documents as short as {mn} chars exist (< NGRAM_BLOCK_N="
        f"{NGRAM_BLOCK_N}); they are invisible to q28/q117 blocking — "
        "re-measure the blocking design against this corpus"
    )


@pytest.mark.slow
def test_blocking_recall_floor_vs_bruteforce(spark, duck, sf_dir):
    """q28's banded blocking vs the all-pairs 5-gram brute force:
    every pair at jaccard >= 0.8 must be found (the documented recall
    trade only concerns the 0.5-0.8 tail), and overall recall at the
    0.5 threshold must stay above the measured-floor 0.6."""
    from kinesyslog_spark.queries import QUERIES
    from kinesyslog_spark.queries.dedup import JACCARD_THR, NGRAM_N

    truth = {}
    for a, b, j in duck.execute(f"""
        WITH docs AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, length(text) - {NGRAM_N - 2}),
                   i -> text[i:i+{NGRAM_N - 1}])) AS sh
          FROM documents WHERE length(text) >= {NGRAM_N}
        )
        SELECT doc_a, doc_b, j FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 ROUND(len(list_intersect(a.sh, b.sh)) /
                   CAST(len(a.sh) + len(b.sh)
                        - len(list_intersect(a.sh, b.sh)) AS DOUBLE),
                   4) AS j
          FROM docs a JOIN docs b ON a.doc_id < b.doc_id
        ) WHERE j >= {JACCARD_THR}
    """).fetchall():
        truth[(a, b)] = j
    assert truth, "corpus must plant near-dup pairs for this test to bite"

    found = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q28_ngram_jaccard"](spark, sf_dir).collect()
    }
    high = {p for p, j in truth.items() if j >= 0.8}
    missed_high = high - found
    assert not missed_high, (
        f"blocking lost {len(missed_high)} pairs at jaccard >= 0.8 "
        f"(e.g. {sorted(missed_high)[:5]}) — the 9-gram blocking "
        "assumption no longer holds on this corpus"
    )
    recall = len(found & set(truth)) / len(truth)
    # The enforced bound IS the documented floor (dedup.py: "at the
    # j=0.5 threshold recall is 0.66") — a looser assert would let a
    # 0.60-0.66 regression pass silently against its own message.
    assert recall >= 0.66, (
        f"blocking recall {recall:.2f} fell under the documented 0.66 "
        "floor at the 0.5 threshold"
    )
