"""Independent cross-implementation pins for the ANN and sketch
families (VERDICT r3 next-round #7).

The oracle contract is self-declared (the builder writes both the Spark
plan and the DuckDB SQL), so a shared misunderstanding could pass both
sides. These tests rebuild the operators' answers from the raw parquet
with pure-Python models that touch NEITHER Spark NOR DuckDB — pyarrow
reads, explicit loops, stdlib md5/Decimal — and require exact equality
with the registry output.

Arithmetic notes that make exact equality legitimate:
- embeddings are float32 promoted to double; dot/norm on both sides are
  sequential left-to-right IEEE double sums (Spark `aggregate` over the
  array ~ a Python loop over the same values in the same order);
- Spark ROUND(x, 4) is BigDecimal(double) HALF_UP — replicated with
  Decimal(x).quantize(..., ROUND_HALF_UP) on the exact binary value;
- sketch positions are md5-derived integers (md5_int60 convention),
  bit-for-bit reproducible anywhere.
"""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from kinesyslog_spark.queries import QUERIES

Q4 = Decimal("0.0001")


def round4(x: float) -> float:
    return float(Decimal(x).quantize(Q4, rounding=ROUND_HALF_UP))


def _md5_int60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def _dot(a: list[float], b: list[float]) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _norm(a: list[float]) -> float:
    s = 0.0
    for x in a:
        s += x * x
    return math.sqrt(s)


def _load_embeddings(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    out = []
    for vid, emb, lab in zip(
        t.column("vec_id").to_pylist(),
        t.column("embedding").to_pylist(),
        t.column("label").to_pylist(),
    ):
        out.append((vid, [float(v) for v in emb], lab))
    return sorted(out)


def _load_documents(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    return sorted(zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ))


N_PROBES, TOP_K = 10, 5


def test_q21_cosine_topk_vs_pure_python(spark, sf_dir):
    vecs = _load_embeddings(sf_dir)
    norms = {vid: _norm(e) for vid, e, _ in vecs}
    expect = []
    for pid, pemb, _ in vecs:
        if pid >= N_PROBES:
            continue
        sims = [
            (round4(_dot(pemb, e) / (norms[pid] * norms[vid])), vid)
            for vid, e, _ in vecs if vid != pid
        ]
        sims.sort(key=lambda t: (-t[0], t[1]))
        for rn, (sim, vid) in enumerate(sims[:TOP_K], start=1):
            expect.append((pid, vid, sim, rn))
    got = [
        (r.pid, r.vec_id, r.sim, r.rn)
        for r in QUERIES["q21_cosine_topk"](spark, sf_dir).collect()
    ]
    assert got == expect


def _ivf_reference(sf_dir: str, nprobe: int):
    vecs = _load_embeddings(sf_dir)
    norms = {vid: _norm(e) for vid, e, _ in vecs}
    dim = len(vecs[0][1])
    # coarse centroids: per-label dimension means (sum in vec_id order)
    by_label: dict[int, list[list[float]]] = {}
    for _vid, e, lab in vecs:
        by_label.setdefault(lab, []).append(e)
    cent = {
        lab: [
            sum(e[d] for e in members) / len(members) for d in range(dim)
        ]
        for lab, members in by_label.items()
    }
    cnorm = {lab: _norm(c) for lab, c in cent.items()}
    expect = []
    for pid, pemb, _ in vecs:
        if pid >= N_PROBES:
            continue
        routed = sorted(
            (
                (-round4(_dot(pemb, c) / (norms[pid] * cnorm[lab])), lab)
                for lab, c in cent.items()
            )
        )[:nprobe]
        target = {lab for _, lab in routed}
        sims = [
            (round4(_dot(pemb, e) / (norms[pid] * norms[vid])), vid)
            for vid, e, lab in vecs
            if lab in target and vid != pid
        ]
        sims.sort(key=lambda t: (-t[0], t[1]))
        for rn, (sim, vid) in enumerate(sims[:TOP_K], start=1):
            expect.append((pid, vid, sim, rn))
    return expect


def test_q35_q47_ivf_vs_pure_python(spark, sf_dir):
    for name, nprobe in (
        ("q35_ann_ivf_topk", 1), ("q47_ann_ivf_nprobe2", 2),
    ):
        got = [
            (r.pid, r.vec_id, r.sim, r.rn)
            for r in QUERIES[name](spark, sf_dir).collect()
        ]
        assert got == _ivf_reference(sf_dir, nprobe), name


BLOOM_M, BLOOM_K, BLOOM_N, BLOOM_EVAL_MOD = 1 << 13, 3, 3, 20


def test_q114_bloom_vs_pure_python(spark, sf_dir):
    docs = _load_documents(sf_dir)
    grams: dict[int, set[str]] = {}
    for did, text in docs:
        toks = _tokens(text)
        if len(toks) >= BLOOM_N:
            grams[did] = {
                " ".join(toks[i:i + BLOOM_N])
                for i in range(len(toks) - BLOOM_N + 1)
            }
    eval_grams = set()
    for did, gs in grams.items():
        if did % BLOOM_EVAL_MOD == 0:
            eval_grams |= gs
    bits = bytearray(BLOOM_M)  # an actual bit table, not a position set
    for g in eval_grams:
        for j in range(BLOOM_K):
            bits[_md5_int60(f"b{j}:{g}") % BLOOM_M] = 1
    expect = {}
    for did, gs in grams.items():
        if did % BLOOM_EVAL_MOD == 0:
            continue
        bh = sum(
            1 for g in gs
            if all(
                bits[_md5_int60(f"b{j}:{g}") % BLOOM_M]
                for j in range(BLOOM_K)
            )
        )
        eh = len(gs & eval_grams)
        expect[did] = (len(gs), bh, eh, bh - eh)
    got = {
        r.doc_id: (r.n_grams, r.bloom_hits, r.exact_hits, r.false_pos)
        for r in QUERIES["q114_bloom_decontam"](spark, sf_dir).collect()
    }
    assert got == expect


CMS_D, CMS_W, CMS_TOPK = 3, 1024, 20


def test_q115_cms_vs_pure_python(spark, sf_dir):
    from collections import Counter

    counts: Counter[str] = Counter()
    for _did, text in _load_documents(sf_dir):
        counts.update(_tokens(text))
    cells = [[0] * CMS_W for _ in range(CMS_D)]
    for tok, c in counts.items():
        for j in range(CMS_D):
            cells[j][_md5_int60(f"c{j}:{tok}") % CMS_W] += c
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOPK]
    expect = [
        (
            tok, c,
            min(cells[j][_md5_int60(f"c{j}:{tok}") % CMS_W]
                for j in range(CMS_D)),
        )
        for tok, c in top
    ]
    expect = [(t, c, e, e - c) for t, c, e in expect]
    got = [
        (r.tok, r.true_count, r.est_count, r.overcount)
        for r in QUERIES["q115_cms_frequencies"](spark, sf_dir).collect()
    ]
    assert got == expect


# ---------------------------------------------------------------------------
# PQ / IVF-PQ (q105, q143): pure-Python replica of the exact-integer
# Lloyd spec (semantic.py module doc), the ADC tables, and the coarse
# routing — touching neither Spark nor DuckDB.
# ---------------------------------------------------------------------------

PQ_M, PQ_K, PQ_ITERS, PQ_TOPK, IVFPQ_NPROBE = 2, 8, 2, 10, 2
_D2S, _CS = 1e10, 1e9


def _qc(x: float) -> float:
    return math.floor(x * _CS + 0.5) / _CS


def _d2(v: list[float], c: list[float]) -> float:
    s = 0.0
    for x, cc in zip(v, c):
        s += math.floor((x - cc) * (x - cc) * _D2S + 0.5)
    return s


def _lloyd(subs: list[tuple[int, list[float]]], k: int, iters: int):
    """(assignments {vid: cid}, centroids [(cid, vec)]) per the exact
    spec: seeds = k smallest vec_ids quantized; ties (d2, cid); update
    c = floor(sum(floor(x*1e9+0.5))/n + 0.5)/1e9; no update after the
    last assignment round."""
    cents = [(i, [_qc(x) for x in e]) for i, (_vid, e) in enumerate(subs[:k])]
    assign: dict[int, int] = {}
    for it in range(iters):
        assign = {
            vid: min((_d2(e, c), cid) for cid, c in cents)[1]
            for vid, e in subs
        }
        if it == iters - 1:
            break
        dim = len(subs[0][1])
        acc: dict[int, list] = {}
        for vid, e in subs:
            cid = assign[vid]
            a = acc.setdefault(cid, [[0, 0] for _ in range(dim)])
            for d, x in enumerate(e):
                a[d][0] += math.floor(x * _CS + 0.5)
                a[d][1] += 1
        cents = [
            (cid, [math.floor(s / n + 0.5) / _CS for s, n in acc[cid]])
            for cid in sorted(acc)
        ]
    return assign, cents


def _pq_index(vecs):
    dim = len(vecs[0][1])
    subdim = dim // PQ_M
    codes: dict[int, list[int]] = {v[0]: [] for v in vecs}
    books = []
    for m in range(PQ_M):
        subs = [(vid, e[m * subdim:(m + 1) * subdim]) for vid, e, _ in vecs]
        assign, cents = _lloyd(subs, PQ_K, PQ_ITERS)
        for vid, _ in subs:
            codes[vid].append(assign[vid])
        books.append(cents)
    return codes, books, subdim


def _adc_tables(pemb, books, subdim):
    return [
        {cid: _d2(pemb[m * subdim:(m + 1) * subdim], c) for cid, c in books[m]}
        for m in range(PQ_M)
    ]


def test_q105_pq_vs_pure_python(spark, sf_dir):
    vecs = _load_embeddings(sf_dir)
    codes, books, subdim = _pq_index(vecs)
    expect = []
    for pid, pemb, _ in vecs:
        if pid >= N_PROBES:
            continue
        dts = _adc_tables(pemb, books, subdim)
        scored = sorted(
            (sum(dts[m][codes[vid][m]] for m in range(PQ_M)), vid)
            for vid, _e, _l in vecs
        )
        for rank, (ad2, vid) in enumerate(scored[:PQ_TOPK], start=1):
            expect.append((pid, vid, ad2, rank))
    got = [
        (r.pid, r.vec_id, r.ad2, r.rank)
        for r in QUERIES["q105_pq_ann"](spark, sf_dir).collect()
    ]
    assert got == expect


def test_q143_ivfpq_vs_pure_python(spark, sf_dir):
    vecs = _load_embeddings(sf_dir)
    norms = {vid: _norm(e) for vid, e, _ in vecs}
    codes, books, subdim = _pq_index(vecs)
    dim = len(vecs[0][1])
    by_label: dict[int, list[list[float]]] = {}
    for _vid, e, lab in vecs:
        by_label.setdefault(lab, []).append(e)
    cent = {
        lab: [sum(e[d] for e in ms) / len(ms) for d in range(dim)]
        for lab, ms in by_label.items()
    }
    cnorm = {lab: _norm(c) for lab, c in cent.items()}
    expect = []
    for pid, pemb, _ in vecs:
        if pid >= N_PROBES:
            continue
        routed = sorted(
            (
                (-round4(_dot(pemb, c) / (norms[pid] * cnorm[lab])), lab)
                for lab, c in cent.items()
            )
        )[:IVFPQ_NPROBE]
        target = {lab for _, lab in routed}
        dts = _adc_tables(pemb, books, subdim)
        scored = sorted(
            (sum(dts[m][codes[vid][m]] for m in range(PQ_M)), vid)
            for vid, _e, lab in vecs
            if lab in target and vid != pid
        )
        for rank, (ad2, vid) in enumerate(scored[:PQ_TOPK], start=1):
            expect.append((pid, vid, ad2, rank))
    got = [
        (r.pid, r.vec_id, r.ad2, r.rank)
        for r in QUERIES["q143_ivfpq_topk"](spark, sf_dir).collect()
    ]
    assert got == expect
