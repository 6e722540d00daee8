"""Decompose q28's candidate volume at a given SF (SCALING_R9 task:
attribute the 6.3x sf1->sf10 ratio to planted-dup growth vs blocking
decay — a measurement, not an argument).

Per sf_dir this prints one JSON line with:
  slots            Sum of C(n,2) over (band-table, band-key,
                   length-bucket) blocking buckets — the pair-expansion
                   work the shuffle actually performs (cap-admitted),
  slots_capped_out work excluded by the hot-bucket cap,
  candidates       distinct (doc_a < doc_b) pairs out of blocking
                   (cross-checked against the query's own
                   ngram_candidates frame — the reconstruction here
                   must agree or the probe is measuring the wrong
                   plan),
  cand_len_ok      candidates surviving the |na-nb| <= LEN_BAND verify
                   prefilter,
  verified         q28's output rows (jaccard >= 0.5),
  rejected         cand_len_ok - verified: chance pairs the verify had
                   to kill — the BLOCKING-BOUND component. If
                   `verified` tracks the decade ratio and `rejected`
                   stays proportionally flat, candidate growth is
                   output-bound (irreducible); if `rejected` explodes,
                   the bands need retuning at that scale.

Usage: python tools/decomp_q28.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kinesyslog_spark.session import get_spark  # noqa: E402


def decompose(spark, sf_dir: str) -> dict:
    import kinesyslog_spark.queries.dedup as dd
    from kinesyslog_spark.queries import QUERIES
    from kinesyslog_spark.tables import hot_table

    # Rebuild the blocking frame exactly as ngram_candidates does (same
    # constants, same minhash machinery); the candidate cross-check
    # below fails loudly if this reconstruction ever drifts.
    docs = hot_table(spark, sf_dir, "documents").filter(
        F.length("text") >= dd.NGRAM_BLOCK_N
    )
    keyed = dd.minhash_df(
        docs.select(
            "doc_id",
            F.length("text").alias("n"),
            dd.char_grams(F.col("text"), dd.NGRAM_BLOCK_N).alias("sh_b"),
        ),
        ["doc_id", "n"],
        "sh_b",
        dd.NGRAM_BANDS * dd.NGRAM_ROWS,
    )
    blocked = (
        keyed.select(
            "doc_id", "n",
            F.explode(
                dd.lsh_band_keys(
                    [f"mh{i}" for i in range(dd.NGRAM_BANDS * dd.NGRAM_ROWS)],
                    dd.NGRAM_BANDS, dd.NGRAM_ROWS,
                )
            ).alias("bd"),
            ((F.col("n") / dd.LEN_BAND).cast("int")).alias("b0"),
        )
        .select(
            "doc_id", "n",
            F.col("bd.band_idx").alias("t"),
            F.col("bd.band_key").alias("bk"),
            F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket"),
        )
    )
    occ = blocked.groupBy("t", "bk", "bucket").agg(
        F.count(F.lit(1)).alias("m")
    )
    slots_col = (F.col("m") * (F.col("m") - 1) / 2).cast("double")
    cap = dd.LSH_MAX_BUCKET
    skipped = F.col("m") > F.lit(cap) if cap else F.lit(False)
    srow = occ.agg(
        F.sum(F.when(~skipped, slots_col).otherwise(F.lit(0.0))).alias("adm"),
        F.sum(F.when(skipped, slots_col).otherwise(F.lit(0.0))).alias("cap"),
        F.max("m").alias("max_bucket"),
    ).collect()[0]

    cand, base = dd.ngram_candidates(spark, sf_dir)
    n_cand = cand.count()
    # cross-check: the probe's reconstruction must reproduce the
    # query's own candidate set size
    n_mine = dd._pair_candidates(blocked, ["t", "bk", "bucket"]).count()
    assert n_mine == n_cand, (n_mine, n_cand)

    lens = base.select("doc_id", "n")
    a = lens.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    b = lens.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    n_len_ok = (
        cand.join(a, "doc_a").join(b, "doc_b")
        .filter(F.abs(F.col("na") - F.col("nb")) <= dd.LEN_BAND)
        .count()
    )
    n_verified = QUERIES["q28_ngram_jaccard"](spark, sf_dir).count()
    return {
        "sf_dir": sf_dir,
        "docs": docs.count(),
        "slots": int(srow["adm"] or 0),
        "slots_capped_out": int(srow["cap"] or 0),
        "max_bucket": int(srow["max_bucket"] or 0),
        "candidates": n_cand,
        "cand_len_ok": n_len_ok,
        "verified": n_verified,
        "rejected": n_len_ok - n_verified,
    }


def main() -> None:
    sf_dirs = sys.argv[1:] or ["artifacts/sf1", "artifacts/sf10"]
    spark = get_spark("decomp_q28")
    from kinesyslog_spark.tables import release_hot

    for sf_dir in sf_dirs:
        print(json.dumps(decompose(spark, sf_dir)), flush=True)
        release_hot(spark)


if __name__ == "__main__":
    main()
