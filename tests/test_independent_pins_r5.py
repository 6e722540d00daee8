"""Independent pins for the round-4 tail families (q139 k-anonymity,
q141 scene cuts, q142 waiting suppliers).

Pattern: hand-built tiny tables written as parquet into a tmp sf_dir +
a from-scratch pure-Python model in this file — so these families no
longer rely solely on builder-written SQL agreeing with builder-written
Spark (the q121/q122/ANN/codec pin posture, extended per the round-4
verdict)."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

from kinesyslog_spark.queries import QUERIES
from kinesyslog_spark.queries.privacy import K_ANON
from kinesyslog_spark.queries.scenecut import SC_H, SC_JUMP, SC_THR, SC_W


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


# ---------------------------------------------------------------------------
# q139 — k-anonymity
# ---------------------------------------------------------------------------

def test_q139_matches_pure_python_model(spark, tmp_path):
    sf = str(tmp_path)
    # quasi-identifiers: (nation, segment, floor(acctbal/1000));
    # class A: 1 member (risky, has orders), class B: 2 members (risky,
    # zero orders), class C: K_ANON members (safe), class D: risky with
    # a negative balance band (floor of negative)
    cust = []
    cid = 0
    def add(nation, seg, bal, n):
        nonlocal cid
        for _ in range(n):
            cid += 1
            cust.append((cid, nation, seg, float(bal)))
    add(1, "AUTO", 1500.0, 1)        # class A
    add(2, "HOME", 2500.0, 2)        # class B
    add(3, "AUTO", 500.0, K_ANON)    # class C safe
    add(4, "SHIP", -250.0, 1)        # class D (band = -1)
    _write(spark, sf, "customer", cust,
           "c_custkey long, c_nationkey long, c_mktsegment string, c_acctbal double")
    orders = [(100 + i, 1, ) for i in range(3)]  # 3 orders for custkey 1
    orders += [(200, cust[-1][0])]               # 1 order for class D
    orders += [(300 + i, 4) for i in range(2)]   # class C member: ignored
    _write(spark, sf, "orders", [(ok, ck) for ok, ck in orders],
           "o_orderkey long, o_custkey long")

    # pure-Python model
    classes = defaultdict(list)
    import math
    for ck, nat, seg, bal in cust:
        classes[(nat, seg, math.floor(bal / 1000))].append(ck)
    ocount = Counter(ck for _, ck in orders)
    expected = sorted(
        (nat, seg, band, len(m), sum(ocount[c] for c in m))
        for (nat, seg, band), m in classes.items()
        if len(m) < K_ANON
    )
    got = sorted(
        (r.nationkey, r.mktsegment, r.bal_band, r.class_n, r.n_orders)
        for r in QUERIES["q139_k_anonymity"](spark, sf).collect()
    )
    assert got == expected
    assert (3, "AUTO", 0, K_ANON, 2 * K_ANON) not in got  # safe class absent
    assert any(band == -1 for _, _, band, _, _ in got)    # negative band kept


# ---------------------------------------------------------------------------
# q141 — scene cuts: histogram model built from raw pixels, no codec,
# no analytic shortcut
# ---------------------------------------------------------------------------

def _model_cuts(doc_id: int, text: str) -> list[tuple[int, int]]:
    # replicate the documented synthesis spec from scratch, then compute
    # REAL 256-bin luma histograms + L1 (the engine instead goes through
    # AVI encode -> RIFF walk -> DIB decode -> BT.601 luma)
    ln = max(len(text), 1)
    n = ln % 12 + 4
    hists, scene = [], 0
    for f in range(n):
        if f >= 1 and ord(text[f % ln] if text else " ") % 3 == 0:
            scene += 1
        g = (doc_id + SC_JUMP * scene + f % 3) % 256
        h = Counter()
        for y in range(SC_H):
            h[(g + y) % 256] += SC_W  # W pixels per row, equal channels
        hists.append(h)
    out = []
    for f in range(1, n):
        keys = set(hists[f - 1]) | set(hists[f])
        l1 = sum(abs(hists[f][k] - hists[f - 1][k]) for k in keys)
        if l1 >= SC_THR:
            out.append((f, l1))
    return out


def test_q141_matches_pixel_histogram_model(spark, tmp_path):
    sf = str(tmp_path)
    docs = [
        (1, "abcdef"),           # mixed chars -> some scene jumps
        (2, "ccc"),              # 'c'=99 divisible by 3: every frame jumps
        (3, "bbbb"),             # 'b'=98: never jumps -> only f%3 jitter
        (4, ""),                 # empty text edge (space fallback, 32%3!=0)
        (5, "x" * 30),           # long text, n = 30%12+4 = 10 frames
    ]
    _write(spark, sf, "documents", docs, "doc_id long, text string")
    expected = sorted(
        (d, f, l1) for d, t in docs for f, l1 in _model_cuts(d, t)
    )
    got = sorted(
        (r.doc_id, r.cut_idx, r.l1)
        for r in QUERIES["q141_scene_cuts"](spark, sf).collect()
    )
    assert got == expected
    assert any(d == 2 for d, _, _ in got), "all-jump doc must produce cuts"
    assert not any(d == 3 for d, _, _ in got), "jitter-only doc must not cut"


# ---------------------------------------------------------------------------
# q142 — waiting suppliers: brute-force per-order blame model
# ---------------------------------------------------------------------------

def test_q142_matches_bruteforce_blame_model(spark, tmp_path):
    sf = str(tmp_path)
    d0 = dt.date(1995, 1, 1)
    late = d0 + dt.timedelta(days=90)   # > 60 days after orderdate
    ontime = d0 + dt.timedelta(days=10)
    orders = [
        (1, "F", d0),  # multi-supplier, exactly one late -> blame s1
        (2, "F", d0),  # multi-supplier, TWO late -> nobody blamed
        (3, "F", d0),  # single supplier late -> excluded (needs other supp)
        (4, "O", d0),  # not finalized -> excluded
        (5, "F", d0),  # multi-supplier, one late -> blame s1 again
    ]
    _write(spark, sf, "orders", orders,
           "o_orderkey long, o_orderstatus string, o_orderdate date")
    li = [
        (1, 1, late), (1, 2, ontime),
        (2, 1, late), (2, 2, late),
        (3, 1, late),
        (4, 1, late), (4, 2, ontime),
        (5, 1, late), (5, 3, ontime), (5, 2, ontime),
    ]
    _write(spark, sf, "lineitem", li,
           "l_orderkey long, l_suppkey long, l_shipdate date")
    supp = [(1, "Supplier#1"), (2, "Supplier#2"), (3, "Supplier#3")]
    _write(spark, sf, "supplier", supp, "s_suppkey long, s_name string")

    # brute-force model: for each F order, a line is blamed iff it is
    # late, the order has another supplier, and no OTHER supplier of the
    # order is late
    status = {ok: st for ok, st, _ in orders}
    odate = {ok: od for ok, _, od in orders}
    by_order = defaultdict(list)
    for ok, sk, sd in li:
        by_order[ok].append((sk, sd))
    blame = Counter()
    for ok, lines in by_order.items():
        if status[ok] != "F":
            continue
        for sk, sd in lines:
            if (sd - odate[ok]).days <= 60:
                continue
            others = [s for s, _ in lines if s != sk]
            if not others:
                continue
            other_late = any(
                s != sk and (d - odate[ok]).days > 60 for s, d in lines
            )
            if not other_late:
                blame[sk] += 1
    names = dict(supp)
    expected = sorted(
        ((sk, names[sk], n) for sk, n in blame.items()),
        key=lambda t: (-t[2], t[0]),
    )
    got = [
        (r.suppkey, r.name, r.numwait)
        for r in QUERIES["q142_waiting_suppliers"](spark, sf).collect()
    ]
    assert got == expected
    assert got and got[0][0] == 1 and got[0][2] == 2  # s1 blamed twice
