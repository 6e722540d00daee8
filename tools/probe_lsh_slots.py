"""Measure the band-bucket families' exact pair-slot counts per scale
decade — the evidence behind SPARK_GRAFT_LSH_MAX_SLOTS' default
(SCALING_R10.md).

For each family the probe builds the SAME keyed bucket frame the query
builds (construction mirrors queries/dedup.py q26/q27/ngram_candidates
and queries/corpus_ext.py q96 — cited inline) and runs the one-aggregate
`lsh_slot_estimate` the fail-fast guard uses, timing the estimate pass
(= the cost of tripping).

Usage:
    python tools/probe_lsh_slots.py /root/testdata/sf1 [q26 q27 q28 q96]
    SPARK_GRAFT_NGRAM_ROWS=4 python tools/probe_lsh_slots.py /root/testdata/sf10 q28
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1]
    which = set(sys.argv[2:]) or {"q26", "q27", "q28", "q96"}

    from kinesyslog_spark.queries import dedup as dd
    from kinesyslog_spark.queries.corpus_ext import NEW_MOD, NEW_REM
    from kinesyslog_spark.operators.text import lsh_band_keys
    from kinesyslog_spark.session import get_spark

    spark = get_spark("probe_lsh_slots")
    out: dict = {"sf_dir": sf_dir, "ngram_rows": dd.NGRAM_ROWS}

    def record(name: str, keyed, key_cols, side=None) -> None:
        t0 = time.time()
        adm, cap = dd.lsh_slot_estimate(keyed, key_cols, dd.LSH_MAX_BUCKET,
                                        side=side)
        out[name] = {
            "admitted_slots": adm,
            "cap_excluded_slots": cap,
            "estimate_sec": round(time.time() - t0, 1),
        }
        print(f"# {name}: adm={adm:,} cap={cap:,} "
              f"({out[name]['estimate_sec']}s)", flush=True)

    if {"q26", "q96"} & which:
        sigs = dd.hot_shingle_sigs(spark, sf_dir)[1]
        bands = sigs.select(
            "doc_id",
            F.explode(
                lsh_band_keys([f"mh{i}" for i in range(dd.MINHASH_K)],
                              dd.LSH_BANDS, dd.LSH_ROWS)
            ).alias("bd"),
        ).select("doc_id", "bd.band_idx", "bd.band_key")
        if "q26" in which:
            record("q26_minhash_lsh", bands, ["band_idx", "band_key"])
        if "q96" in which:
            record("q96_incremental_neardup", bands,
                   ["band_idx", "band_key"],
                   side=F.col("doc_id") % NEW_MOD == NEW_REM)

    if "q27" in which:
        # the registered q27 stages exactly: distinct-fp collapse, bias-
        # balanced snake blocks, C(10,6) combo keys (one rep per fp)
        _grp, blk = dd.hot_simhash_groups(spark, sf_dir)
        keyed = dd.combo_keyed(blk).select("doc_id", "cid", "ckey")
        record("q27_simhash_pairs", keyed, ["cid", "ckey"])

    if "q28" in which:
        from kinesyslog_spark.operators.text import char_grams, minhash_df
        from kinesyslog_spark.tables import hot_table

        docs = hot_table(spark, sf_dir, "documents").filter(
            F.length("text") >= dd.NGRAM_BLOCK_N
        )
        keyed = minhash_df(
            docs.select(
                "doc_id",
                F.length("text").alias("n"),
                char_grams(F.col("text"), dd.NGRAM_BLOCK_N).alias("sh_b"),
            ),
            ["doc_id", "n"],
            "sh_b",
            dd.NGRAM_BANDS * dd.NGRAM_ROWS,
        )
        blocked = (
            keyed.select(
                "doc_id", "n",
                F.explode(
                    lsh_band_keys(
                        [f"mh{i}"
                         for i in range(dd.NGRAM_BANDS * dd.NGRAM_ROWS)],
                        dd.NGRAM_BANDS, dd.NGRAM_ROWS,
                    )
                ).alias("bd"),
                ((F.col("n") / dd.LEN_BAND).cast("int")).alias("b0"),
            )
            .select(
                "doc_id", "n",
                F.col("bd.band_idx").alias("t"),
                F.col("bd.band_key").alias("bk"),
                F.explode(F.array(F.col("b0"), F.col("b0") + 1))
                .alias("bucket"),
            )
        )
        record("q28_ngram_jaccard", blocked, ["t", "bk", "bucket"])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
