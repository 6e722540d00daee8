"""Round-12 probe: the dedup survivor/governance compositions at the
upper decades (verdict tasks #1 and #7).

Measures, per sf_dir:
  - q27 pair graph size (edges)
  - q182 closure: CC wall, rounds to converge, cluster count, giant
    component size, and the closure drop-set (docs min-id survivorship
    would remove)
  - q183 star-verify refinement: wall, final cluster count, refined
    drop-set (every removal edge-certified), giant component's split
    (stars + singletons), and the stage mix

Usage: python tools/probe_govern.py [sf_dir ...]
  (default: /root/testdata/sf0.1 artifacts/sf1)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kinesyslog_spark.session import get_spark  # noqa: E402


def probe(spark, sf_dir: str, family: str = "simhash") -> dict:
    from kinesyslog_spark.queries.cluster import connected_components
    from kinesyslog_spark.queries.govern import refine_star_assignments
    from kinesyslog_spark.queries.imageresolve import hot_image_pairs
    from kinesyslog_spark.queries.simresolve import hot_simhash_pairs
    from kinesyslog_spark.tables import release_hot

    hot = hot_image_pairs if family == "image" else hot_simhash_pairs
    pairs = hot(spark, sf_dir)
    n_edges = pairs.count()

    t0 = time.time()
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst"))
    ).persist()
    sizes = (
        comp.groupBy("component").count()
        .agg(F.count(F.lit(1)).alias("n_clusters"),
             F.max("count").alias("giant"),
             F.sum("count").alias("n_nodes"))
        .collect()[0]
    )
    cc_wall = time.time() - t0
    rounds = getattr(connected_components, "last_rounds", None)
    closure_drop = int(sizes.n_nodes) - int(sizes.n_clusters)

    t0 = time.time()
    # pass the closure labels like the registered q183/q185 do (one CC
    # run feeds both stages via hot_simhash_components)
    asg = refine_star_assignments(
        pairs, comp.select("node", "component")
    )
    ref = (
        asg.groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("cluster_id").alias("clusters"))
        .collect()
    )
    stage_mix = {int(r.stage): {"members": int(r.n),
                                "clusters": int(r.clusters)}
                 for r in ref}
    giant_split = (
        asg.groupBy("orig_cluster_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("cluster_id").alias("parts"))
        .orderBy(F.desc("n")).limit(1).collect()[0]
    )
    n_final = asg.select("cluster_id").distinct().count()
    refined_drop = int(sizes.n_nodes) - n_final
    ref_wall = time.time() - t0
    asg.unpersist()
    comp.unpersist()

    out = {
        "sf_dir": sf_dir,
        "family": family,
        "edges": int(n_edges),
        "cc_wall_sec": round(cc_wall, 1),
        "cc_rounds": rounds,
        "nodes": int(sizes.n_nodes),
        "closure_clusters": int(sizes.n_clusters),
        "giant_component": int(sizes.giant),
        "closure_drop_set": closure_drop,
        "refine_wall_sec": round(ref_wall, 1),
        "refined_clusters": int(n_final),
        "refined_drop_set": refined_drop,
        "giant_split_parts": int(giant_split.parts),
        "giant_members": int(giant_split.n),
        "stage_mix": stage_mix,
    }
    release_hot(spark, sf_dir)
    return out


def main() -> None:
    import os

    family = os.environ.get("GOVERN_FAMILY", "simhash")
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "artifacts/sf1"]
    spark = get_spark("probe-govern")
    for sf in sf_dirs:
        print(json.dumps(probe(spark, sf, family)), flush=True)


if __name__ == "__main__":
    main()
