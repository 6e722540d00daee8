"""Interleaved same-session A/B for the multi-index image-hash kernel:
A = r12 shape (gid coarse groups + applyInPandas), B = r13 shape
(fine (g, b, v) repartition + mapInArrow). Alternating samples cancel
the box's contention windows; noop sink (guide §1.4)."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kinesyslog_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_mih_arrow")
    spark.range(1000).count()

    import kinesyslog_spark.queries.imagehash as ih
    from kinesyslog_spark.queries.dedup import _par

    v = ih.hot_phash_vectors(spark, sf_dir)

    def _group_val(g: int) -> str:
        terms = []
        for i in range(16):
            k = g + 4 * i
            terms.append(
                f"shiftleft(shiftright(ba[{k // 8}], {7 - k % 8}) & 1,"
                f" {15 - i})"
            )
        return "(" + " + ".join(terms) + ")"

    gv = F.array(*[F.expr(_group_val(g)) for g in range(4)])
    keyed = v.withColumn("gv", gv).select(
        "doc_id",
        "ba",
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, 3), g -> "
                "  array(named_struct("
                "    'g', g, 'b', -1, 'v', gv[g], 'side', 0)) || "
                "  transform(sequence(0, 15), b -> named_struct("
                "    'g', g, 'b', b,"
                "    'v', gv[g] & ~shiftleft(1L, b),"
                "    'side', int(shiftright(gv[g], b) & 1)))"
                "))"
            )
        ).alias("k"),
    ).select(
        "doc_id", "ba", F.col("k.g").alias("g"), F.col("k.b").alias("b"),
        F.col("k.v").alias("v"), F.col("k.side").alias("side"),
    )

    def variant_a():
        k = keyed.withColumn(
            "gid",
            F.pmod(F.hash("g", "b", "v"), F.lit(ih._PHASH_GROUPS)).cast("int"),
        )
        return k.groupBy("gid").applyInPandas(
            ih._phash_bucket_pairs, "doc_a long, doc_b long, hamming long"
        )

    def variant_b():
        return keyed.repartition(
            max(_par(v), ih._PHASH_GROUPS), "g", "b", "v"
        ).mapInArrow(
            ih._mih_arrow_kernel(ih.HAM_T, ih._pack64),
            "doc_a long, doc_b long, hamming long",
        )

    ra = sorted((r.doc_a, r.doc_b, r.hamming) for r in variant_a().collect())
    rb = sorted((r.doc_a, r.doc_b, r.hamming)
                for r in variant_b().dropDuplicates().collect())
    # A emits each pair once per bucket kind it matches in; the query
    # tail dedups both shapes — compare the distinct sets
    ra = sorted(set(ra))
    rb = sorted(set(rb))
    assert ra == rb, f"MISMATCH {len(ra)} vs {len(rb)}"
    print(f"parity OK ({len(ra)} pairs)")

    sa, sb = [], []
    for i in range(7):
        for label, fn, acc in (("A", variant_a, sa), ("B", variant_b, sb)):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            acc.append(time.perf_counter() - t0)
    print(f"A applyInPandas(gid): median {statistics.median(sa[1:]):.3f} "
          f"{['%.2f' % s for s in sa]}")
    print(f"B mapInArrow(g,b,v) : median {statistics.median(sb[1:]):.3f} "
          f"{['%.2f' % s for s in sb]}")


if __name__ == "__main__":
    main()
