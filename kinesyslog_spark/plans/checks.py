r"""Physical-plan inspection utilities — the engine's scale guardrails.

A query that is correct at sf0.01 but scans every column, misses a
broadcast, or coalesces a compute-heavy exchange to one task will fall
over at 100 TB. These helpers turn `.explain("formatted")` into
assertable facts so tests/test_plans.py can pin the *intended* physical
strategy, not just the answer:

- parquet scans must show PushedFilters / a pruned ReadSchema;
- dimension joins must be BroadcastHashJoin, fact-fact joins shuffle;
- per-message parse pipelines must stay inside WholeStageCodegen.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


@dataclass
class PlanFacts:
    text: str

    @property
    def broadcast_join_count(self) -> int:
        return len(re.findall(r"BroadcastHashJoin", self.text))

    @property
    def broadcast_any_count(self) -> int:
        """Any broadcast-build join (hash or nested-loop for cross joins)."""
        return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", self.text))

    @property
    def python_eval_count(self) -> int:
        """Row/Arrow Python evaluation nodes — the slow path. Intentional
        pandas ops (mapInPandas/applyInPandas) show as *InPandas instead."""
        return len(re.findall(r"BatchEvalPython|ArrowEvalPython", self.text))

    @property
    def shuffle_join_count(self) -> int:
        return len(re.findall(r"SortMergeJoin|ShuffledHashJoin", self.text))

    @property
    def exchange_count(self) -> int:
        # Shuffle exchanges only (broadcast exchanges are cheap by design);
        # count node-detail headers so tree + detail aren't double-counted.
        return len(re.findall(r"\n\(\d+\) Exchange\b", self.text))

    @property
    def sort_aggregate_count(self) -> int:
        """SortAggregate = a non-hashable aggregation buffer snuck in."""
        return len(re.findall(r"SortAggregate", self.text))

    def pushed_filters(self, table: str) -> list[str]:
        """PushedFilters entries for the scan of `table`."""
        out = []
        for m in re.finditer(
            rf"Location:.*{table}[^\n]*\n(?:.*\n)*?PushedFilters: \[([^\]]*)\]",
            self.text,
        ):
            out.append(m.group(1))
        return out

    def partition_filters(self, table: str) -> list[str]:
        """PartitionFilters entries for the scan of `table` — non-empty
        means partition pruning is active (whole directories skipped)."""
        out = []
        for m in re.finditer(
            rf"Location:.*{table}[^\n]*\n(?:.*\n)*?PartitionFilters: \[([^\]]*)\]",
            self.text,
        ):
            if m.group(1).strip():
                out.append(m.group(1))
        return out

    def read_schema(self, table: str) -> str | None:
        m = re.search(
            rf"Location:.*{table}[^\n]*\n(?:.*\n)*?ReadSchema: ([^\n]+)", self.text
        )
        return m.group(1) if m else None

    def scan_columns(self, table: str) -> list[str]:
        schema = self.read_schema(table)
        if not schema:
            return []
        return re.findall(r"(\w+):", schema)


def facts(df: DataFrame) -> PlanFacts:
    return PlanFacts(formatted_plan(df))


# ---------------------------------------------------------------------------
# Executed-plan node walk — the truthful view for ITERATIVE queries.
#
# Explain text (formatted or simple) prints every InMemoryRelation's full
# cached subtree; a query built on N checkpoint/persist rounds therefore
# shows the whole unrolled lineage (round-2 verdict: q72's PLANS row
# counted 1497 broadcast joins in a plan that actually executes ~17
# nodes). Walking the JVM plan tree and STOPPING at InMemoryTableScan
# (cache boundary) yields the operator multiset of the plan as it runs.
# ---------------------------------------------------------------------------


def _walk_executed(df: DataFrame, visit) -> None:
    """Walk the executed physical plan, calling visit(cls_name, node).

    AQE / query-stage shells unwrap to their contained plan; each cached
    InMemoryRelation's build plan is descended into exactly ONCE (it ran
    once to populate the cache), no matter how many scans reference it —
    explain text instead re-prints the full subtree under every
    reference, which is how an iterative query's report ballooned to
    1497 phantom broadcast joins."""
    seen_relations: set[int] = set()

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        visit(cls, node)
        if cls.startswith("InMemoryTableScan"):
            rel = node.relation()
            h = rel.hashCode()
            if h not in seen_relations:
                seen_relations.add(h)
                walk(rel.cachedPlan())
            return
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())


def executed_node_names(df: DataFrame) -> list[str]:
    """Class names of the physical nodes that actually execute."""
    out: list[str] = []
    _walk_executed(df, lambda cls, node: out.append(cls))
    return out


_WINDOW_NODES = ("WindowExec", "WindowInPandasExec", "WindowGroupLimitExec")


def unpartitioned_window_count(df: DataFrame) -> int:
    """Window-family physical nodes executing with an EMPTY partition
    spec — Spark's 'Moving all data to a single partition' plan, the
    scale-killer the round-4 verdict flagged on q84/q135. A query whose
    global-order semantics are intended must route through
    operators/ranking.py instead; this returning 0 is the pin."""
    hits: list[str] = []

    def visit(cls, node):
        if cls in _WINDOW_NODES and node.partitionSpec().isEmpty():
            hits.append(cls)

    _walk_executed(df, visit)
    return len(hits)


@dataclass
class ExecutedFacts:
    nodes: list[str]

    def _count(self, *prefixes: str) -> int:
        return sum(
            1 for n in self.nodes if any(n.startswith(p) for p in prefixes)
        )

    @property
    def exchange_count(self) -> int:
        return self._count("ShuffleExchange")

    @property
    def broadcast_any_count(self) -> int:
        return self._count("BroadcastHashJoin", "BroadcastNestedLoopJoin")

    @property
    def python_eval_count(self) -> int:
        return self._count("BatchEvalPython", "ArrowEvalPython")

    @property
    def sort_aggregate_count(self) -> int:
        return self._count("SortAggregate")


def executed_facts(df: DataFrame) -> ExecutedFacts:
    return ExecutedFacts(executed_node_names(df))
