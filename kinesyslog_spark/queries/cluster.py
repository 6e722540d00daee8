r"""Q40 — near-duplicate clustering: connected components over the
MinHash-LSH pair graph (the step after pair detection in a dedup
pipeline: each cluster keeps one canonical document).

Spark side: iterative min-label propagation (a Pregel-lite loop of
join + groupBy-min per round, driver checks convergence). Each round is
one shuffle over the *edge set* — the corpus-scale pattern where the
component graph is many orders of magnitude smaller than the corpus.
DuckDB twin: recursive CTE transitive closure with the same min-label
semantics.

Output: (doc_id, cluster_id=min doc_id in component, cluster_size) for
every document that appears in at least one near-dup pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.dedup import _minhash_oracle, hot_minhash_pairs

MAX_ROUNDS = 20


def connected_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """Connected components over an undirected edge list (src, dst) via
    min-label propagation + pointer jumping.

    Returns (node, component) with component = min node id reachable.
    Each round does (1) a propagation step — l(v) := min(l(v),
    min_{u∈N(v)} l(u)) — and (2) a pointer-jumping contraction —
    l(v) := l(l(v)) (label values are node ids, so the label table is
    its own lookup). Jumping halves label-chain length every round, so
    convergence is O(log diameter) rounds instead of plain propagation's
    O(diameter) — the property that matters at corpus scale, where
    near-dup chains make long thin components (round-2 verdict: the
    every-round O(d) loop was the scale-killer shape). Same shape as
    the alternating-star CC of Kiveris et al. (MapReduce CC), expressed
    on the label table.

    Each round's table is localCheckpoint-ed (eager): without lineage
    truncation every round's logical plan nests all previous rounds',
    and Catalyst re-optimization blows up (time AND driver heap) — the
    standard failure mode of iterative algorithms on Spark, and the
    reason GraphX/MLlib checkpoint. On a cluster with an HDFS-backed
    checkpoint dir, `checkpoint()` gives the same truncation with
    executor-loss tolerance.
    """
    both = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # Eager localCheckpoint rather than persist: the loop below runs
    # ~2 executions per round against `both`, and with a plain persist
    # every one of them re-analyzes (and the SQL listener re-stringifies)
    # `both`'s FULL logical tree — which embeds the caller's entire
    # pipeline (e.g. q27's fingerprint/blocking plan under
    # hot_simhash_pairs, or a semi-joined copy of it under the
    # governance refine). Checkpointing collapses the loop's input to a
    # flat scan so per-round planning cost is O(round), not
    # O(caller plan); a 1 GiB-driver vanilla session OOM'd building
    # those tree strings before this (OPTIMIZATION_r12). Blocks are
    # reclaimed by the ContextCleaner when the loop's frames are
    # dropped, same as the per-round checkpoints below.
    both = both.localCheckpoint()
    # Round-0 propagation fused into init: l(v) = min(v, min neighbor) —
    # one groupBy instead of a distinct + a full propagation round.
    labels = (
        both.groupBy(F.col("src").alias("node"))
        .agg(F.least(F.first("src"), F.min("dst")).alias("component"))
        .localCheckpoint()
    )
    # Convergence check: labels only ever decrease (min-propagation), so
    # the label table changed iff sum(component) dropped — one aggregate
    # action, no diff join. Checked every second round: halving the
    # driver round-trips matters more than one extra (cheap) round after
    # convergence. Checkpoints are lazy (eager=False) so an unchecked
    # round schedules no job of its own — the next sum action computes
    # two rounds pipelined, truncating lineage at each checkpoint.
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    rounds = 0
    for r in range(max_rounds):
        rounds = r + 1
        # (1) propagate: min of own and neighbors' labels
        neighbor = (
            both.join(labels, both["dst"] == labels["node"])
            .select(both["src"].alias("node"), F.col("component"))
        )
        propagated = (
            labels.select("node", "component").union(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # (2) pointer jump: component <- label(component). Left join —
        # label values are node ids already present in the table, but a
        # dropped row must never drop the node.
        lookup = propagated.select(
            F.col("node").alias("l_node"), F.col("component").alias("l_comp")
        )
        labels = (
            propagated.join(lookup, propagated["component"] == lookup["l_node"], "left")
            .select(
                "node",
                F.coalesce("l_comp", "component").alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        if r % 2 == 1 or r == max_rounds - 1:
            new_sum = labels.agg(F.sum("component")).collect()[0][0]
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
    connected_components.last_rounds = rounds  # type: ignore[attr-defined]
    return labels


def _q40_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach AS (
      SELECT src AS node, src AS label FROM edges
      UNION
      SELECT e.src AS node, r.label
      FROM reach r JOIN edges e ON e.dst = r.node
    ),
    comp AS (
      SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM comp
    ORDER BY doc_id
    """


_CLUSTER_CACHE: dict[tuple, DataFrame] = {}


def cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized (doc_id, cluster_id, cluster_size) — the shared
    artifact of the dedup-clustering family (q40's report, q107's
    survivor resolution, the pipeline's drop-set). A dedup service keeps
    exactly this materialized; released by tables.release_hot."""
    # Keyed on the same budget knobs as hot_minhash_pairs: the labels
    # are a pure function of the pair graph, and the pair memo rebuilds
    # when a cap is re-tuned mid-session — without the knobs here,
    # q40/q107/q165 would keep returning labels computed from pairs
    # built under the OLD budget (round-12 ADVICE).
    from kinesyslog_spark.queries.dedup import LSH_MAX_BUCKET, LSH_MAX_SLOTS

    key = (id(spark), sf_dir.rstrip("/"), LSH_MAX_BUCKET, LSH_MAX_SLOTS)
    got = _CLUSTER_CACHE.get(key)
    if got is not None:
        return got
    # The pair graph is the persisted MinHash-family artifact (shared
    # with q26/q163/q172/q173/q177): `edges` is read in both union
    # directions, which would otherwise run q26's candidate + verify
    # joins twice — and a private copy here would rebuild a frame the
    # session already holds.
    pairs = hot_minhash_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels = connected_components(edges)
    out = (
        labels.select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
        .withColumn(
            "cluster_size",
            F.count("*").over(W.partitionBy("cluster_id")).cast("long"),
        )
        .persist()
    )
    out.count()
    # pairs is the shared session artifact — tables.release_hot owns its
    # lifetime; unpersisting it here would evict it under its other
    # consumers.
    _CLUSTER_CACHE[key] = out
    return out


@query("q40_dedup_clusters", oracle=_q40_oracle())
def q40_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_labels(spark, sf_dir).orderBy("doc_id")

