"""q140 triangle counting pinned against an independent pure-Python
brute force (id-ordered neighbor-intersection enumeration — a different
algorithm than the degree-oriented wedge join under test)."""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq

from kinesyslog_spark.queries import QUERIES
from kinesyslog_spark.queries.graph_ext import TRI_TOPK


def _brute_topk(sf_dir: str) -> list[tuple[int, int]]:
    t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    by_order = defaultdict(set)
    for ok, pk in zip(
        t.column("l_orderkey").to_pylist(), t.column("l_partkey").to_pylist()
    ):
        by_order[ok].add(pk)
    adj = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                adj[a].add(b)
                adj[b].add(a)
    tri = defaultdict(int)
    for a in sorted(adj):
        for b in sorted(adj[a]):
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
    ranked = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(int(n), int(c)) for n, c in ranked[:TRI_TOPK]]


def test_q140_matches_bruteforce(spark, sf_dir):
    got = [
        (r["partkey"], r["n_triangles"])
        for r in QUERIES["q140_triangle_count"](spark, sf_dir).collect()
    ]
    assert got == _brute_topk(sf_dir)
