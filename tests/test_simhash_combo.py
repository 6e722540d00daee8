"""q27's round-11 blocking: generalized pigeonhole over bias-balanced
snake blocks with distinct-fingerprint collapse. Pins

- the snake assignment arithmetic (hand-computable),
- the structural pigeonhole guarantee (any <= HAMMING_THR error
  pattern over the blocks leaves at least one all-clean combo),
- the combo-key packing's bijectivity bound (42 bits, no overlap),
- EXACT recall end-to-end: q27's output equals the brute-force
  all-pairs hamming join on the test corpus (the audit q181's
  ground-truth twin, asserted directly here).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from kinesyslog_spark.queries.dedup import (
    HAMMING_THR,
    SIMHASH_BITS,
    SIMHASH_COMBO_CLEAN,
    SIMHASH_SNAKE_BLOCKS,
    _simhash_combos,
    _snake_assignment,
)


def test_snake_assignment_hand_example():
    # 64 bits, majority counts descending with bit index: order is
    # bits 1..64 as-is; serpentine over 10 blocks -> ranks 0..9 go to
    # blocks 0..9, ranks 10..19 back down 9..0, etc.
    pmaj = {j: 1000 - j for j in range(1, SIMHASH_BITS + 1)}
    blocks = _snake_assignment(pmaj)
    assert len(blocks) == SIMHASH_SNAKE_BLOCKS
    assert sorted(sum(blocks, [])) == list(range(1, SIMHASH_BITS + 1))
    # rank r = j-1: block(j=1)=0, block(j=10)=9, block(j=11)=9,
    # block(j=20)=0, block(j=21)=0 (third pass ascending again)
    assert 1 in blocks[0] and 20 in blocks[0] and 21 in blocks[0]
    assert 10 in blocks[9] and 11 in blocks[9]
    # sizes: 64 = 3 full serpentine rounds (60 ranks, 6 per block) + 4
    assert sorted(len(b) for b in blocks) == [6] * 6 + [7] * 4
    # ties in pmaj break by bit index: same counts -> identity order
    flat = _snake_assignment({j: 7 for j in range(1, 65)})
    assert flat == blocks


def test_pigeonhole_guarantee_structural():
    combos = _simhash_combos()
    assert len(combos) == 210  # C(10, 6)
    # every possible error-block pattern of size <= HAMMING_THR leaves
    # at least one combo whose blocks are all clean
    blocks = range(SIMHASH_SNAKE_BLOCKS)
    for k in range(0, HAMMING_THR + 1):
        for err in combinations(blocks, k):
            assert any(not set(c) & set(err) for c in combos), (
                f"error pattern {err} defeats every combo — the "
                "pigeonhole guarantee is broken"
            )


def test_combo_key_packing_bijective_bound():
    # base-128 packing of 6 blocks each <= 7 bits wide: max key fits
    # 42 bits and distinct block tuples map to distinct keys
    k = SIMHASH_COMBO_CLEAN
    assert k == 6
    max_key = sum(127 * 128 ** (k - 1 - t) for t in range(k))
    assert max_key < 1 << 42
    packs = {
        tuple(v): sum(v[t] * 128 ** (k - 1 - t) for t in range(k))
        for v in [(0,) * 6, (127,) * 6, (1, 0, 0, 0, 0, 0),
                  (0, 0, 0, 0, 0, 1), (3, 1, 4, 1, 5, 9)]
    }
    assert len(set(packs.values())) == len(packs)


def test_q27_exact_recall_vs_brute_force(spark, sf_dir):
    """The blocking must lose NOTHING at the declared threshold: q27's
    output == all-pairs xor+popcount hamming <= 4 (the q181 audit's
    ground truth, pinned here on the full test corpus)."""
    from kinesyslog_spark.queries import QUERIES
    from kinesyslog_spark.queries.dedup import hot_simhash_groups

    grp, _blk = hot_simhash_groups(spark, sf_dir)
    mem = grp.select(
        F.explode("members").alias("doc_id"), "hi", "lo"
    )
    a = mem.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hi").alias("hi_a"), F.col("lo").alias("lo_a"),
    )
    b = mem.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hi").alias("hi_b"), F.col("lo").alias("lo_b"),
    )
    from kinesyslog_spark.operators.text import hamming_from_halves

    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            hamming_from_halves(
                F.col("hi_a"), F.col("lo_a"),
                F.col("hi_b"), F.col("lo_b"),
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_THR)
    )
    want = sorted(map(tuple, brute.collect()))
    got = sorted(
        map(tuple, QUERIES["q27_simhash_pairs"](spark, sf_dir).collect())
    )
    assert want, "test corpus must contain near-dup pairs"
    assert got == want
