"""W26 — continuous vector-index ingestion: route + PQ-encode arriving
embeddings against the broadcast index artifacts (the write path of
q143's IVF-PQ index).

A vector index is not rebuilt per crawl — new embeddings stream in and
must land in the right coarse list with their PQ codes, so the
codes-partitioned-by-list table q143 queries stays current. Both steps
are pure expressions over LITERAL artifacts (coarse centroids,
per-subspace codebooks — driver-held, kilobytes):

- coarse routing: argmax of ROUND(cosine, 4) over the centroid
  literals, label tie-break — exactly q35's routing rule, so a vector
  ingested here is found by the same rule that queries it;
- PQ encoding: per-subspace argmin of the exact scaled-integer d2 with
  (d2, cid) tie-break — the `semantic._assign_expr` spec on the
  subvector slice, so streamed codes are bit-identical to a batch
  re-encode (pinned in tests).

The operator is STATELESS (map-only, zero stream state, no Python) —
the index table itself is the state, and appends of (vec_id, list,
codes) rows are idempotent per epoch when written through the
partitioned-sink dynamic-overwrite idiom (sinks/partitioned.py).

Scale posture: this is the same economics as the batch encode — every
arriving row does K cosine evaluations + PQ_M * PQ_K subspace
distances against broadcast literals inside whole-stage codegen;
throughput scales with executors, no shuffle at all.

Reference parity: none; streaming complement of
operators/vector_index.py's persisted IVF build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesyslog_spark.queries.semantic import _D2_SCALE


def _route_expr(centroids: list[tuple[int, list[float]]]) -> Column:
    """struct(neg_csim, label) of the nearest coarse centroid by
    (ROUND(cos,4) DESC, label ASC) — q35's routing rule as a literal
    expression (no join)."""
    nrm = F.sqrt(
        F.aggregate(
            F.transform("emb", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    cands = []
    for label, cent in centroids:
        arr = F.array(*[F.lit(float(c)) for c in cent])
        dot = F.aggregate(
            F.zip_with("emb", arr, lambda x, c: x * c),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        cnorm = sum(c * c for c in cent) ** 0.5
        csim = F.round(dot / (nrm * F.lit(cnorm)), 4)
        cands.append(
            F.struct((-csim).alias("neg"), F.lit(label).alias("label"))
        )
    return F.array_min(F.array(*cands))


def _code_expr(sub: Column, book: list[tuple[int, list[float]]]) -> Column:
    """Nearest codeword id for a subvector: argmin of the exact scaled
    d2, (d2, cid) tie-break — the `_assign_expr` spec on a slice."""
    cands = []
    for cid, cent in book:
        arr = F.array(*[F.lit(float(c)) for c in cent])
        d2 = F.aggregate(
            F.zip_with(
                sub,
                arr,
                lambda x, c: F.floor(
                    (x - c) * (x - c) * F.lit(_D2_SCALE) + F.lit(0.5)
                ),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        cands.append(F.struct(d2.alias("d2"), F.lit(cid).alias("cid")))
    return F.array_min(F.array(*cands)).cid


def streaming_index_ingest(
    emb: DataFrame,
    coarse: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    subdim: int,
) -> DataFrame:
    """(vec_id, emb double[]) stream -> (vec_id, list_label, c0..c{M-1})
    index rows. `coarse` = [(label, centroid)], `codebooks` = one
    [(cid, centroid)] list per subspace of width `subdim`."""
    out = emb.select(
        "vec_id",
        _route_expr(coarse).label.alias("list_label"),
        *[
            _code_expr(F.slice("emb", m * subdim + 1, subdim), book).alias(f"c{m}")
            for m, book in enumerate(codebooks)
        ],
    )
    return out
