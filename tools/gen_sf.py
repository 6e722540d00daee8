"""Generate a scale-decade probe dataset (default sf1) matching the
driver testdata's schemas and distribution family.

The driver generates /root/testdata/sf{0.001,0.01,0.1} (read-only;
TESTDATA.md) but everything at sf<=0.1 sits on the stage-scheduling
floor, so the measured scaling alphas cannot distinguish linear from
super-linear (round-5/6 verdict #2). This tool extends the decade grid
with a LOCALLY generated sf — same seed discipline (42), same arrow
schemas (verified against sf0.1's parquet), and the distribution rules
inferred from the driver data:

- region/nation: fixed 5/25, NATION_i -> region i%5
- customer/supplier: 150k/10k rows per sf; acctbal U(-1000,10000);
  mktsegment 5-way uniform
- part: 200k per sf; name = 8 adjectives x 8 nouns; Brand#1..25;
  6 types; size U{1..50}; retailprice 900 + 0.1*U{0..999}
- orders: 1.5M per sf; status F/O/P uniform; totalprice
  U(1000,500000); orderdate U[1995-01-01, 2001-08-01] (midnight)
- lineitem: per-order line count ~ Poisson(4) (zeros allowed);
  linenumber U{1..7}; quantity U{1..50}; extendedprice U(900,105000);
  discount 0.01*U{0..10}; tax 0.01*U{0..8}; returnflag A/N/R;
  linestatus F/O; shipdate = orderdate-range day + U{1..95} days,
  independent of the parent order (measured: gap spans +-2400 d)
- events: 1M per sf; ts U over 2024-01 (30 d, microseconds); user_id
  U{0..15000*sf}; 5 types uniform; value ~ Exp(mean 50); props
  '{"k": U{0..99}}'
- documents: 50k per sf (floor 500); 30-word vocab uniform; length
  U{10..100} words; lang weights en .41 / others .1475; 20 sources;
  5% of docs join a dup family (new base inserts the 'dup' marker
  token; members append-copy a random family member, 0-5 extra
  words) — measured ~1 near-dup pair (shingle-jaccard >= 0.5) per
  family doc, linear in corpus size
- embeddings: 20k per sf (floor 500); 64-dim unit-norm gaussian f32;
  label U{0..9} (measured: same-label mean cosine ~0 — no cluster
  structure in the driver data)

Usage: python tools/gen_sf.py [sf] [out_dir]
Defaults: sf=1 out_dir=artifacts/sf1. Writes one snappy parquet per
table. Never writes under /root/testdata.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup2",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
VOCAB = [w for w in VOCAB if w != "dup2"]  # 30 content words; 'dup' is the marker

ORDERDATE_LO = np.datetime64("1995-01-01")
ORDERDATE_DAYS = 2404  # .. 2001-08-01 inclusive
EVENTS_TS_LO = np.datetime64("2024-01-01T00:00:00")
EVENTS_TS_US = 30 * 86400 * 1_000_000  # 30 days


def _write(out_dir: str, name: str, schema: pa.Schema, cols: dict) -> None:
    table = pa.table(cols, schema=schema)
    pq.write_table(
        table, os.path.join(out_dir, f"{name}.parquet"), compression="snappy"
    )
    print(f"  {name}: {table.num_rows} rows", file=sys.stderr)


def gen(sf: float, out_dir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    _write(out_dir, "region", pa.schema(
        [("r_regionkey", pa.int32()), ("r_name", pa.string())]
    ), {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS})

    _write(out_dir, "nation", pa.schema(
        [("n_nationkey", pa.int32()), ("n_name", pa.string()),
         ("n_regionkey", pa.int32())]
    ), {
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    })

    n_cust = round(150_000 * sf)
    _write(out_dir, "customer", pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()),
         ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
         ("c_mktsegment", pa.string())]
    ), {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    })

    n_supp = round(10_000 * sf)
    _write(out_dir, "supplier", pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()),
         ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]
    ), {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    })

    n_part = round(200_000 * sf)
    adj = np.array(ADJ)[rng.integers(0, 8, n_part)]
    noun = np.array(NOUN)[rng.integers(0, 8, n_part)]
    _write(out_dir, "part", pa.schema(
        [("p_partkey", pa.int64()), ("p_name", pa.string()),
         ("p_brand", pa.string()), ("p_type", pa.string()),
         ("p_size", pa.int32()), ("p_retailprice", pa.float64())]
    ), {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{a} {n}" for a, n in zip(adj, noun)],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part, dtype=np.int32),
        "p_retailprice": np.round(
            900.0 + 0.1 * rng.integers(0, 1000, n_part), 1
        ),
    })

    n_ord = round(1_500_000 * sf)
    odate_days = rng.integers(0, ORDERDATE_DAYS + 1, n_ord)
    odate = ORDERDATE_LO + odate_days.astype("timedelta64[D]")
    _write(out_dir, "orders", pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
         ("o_orderdate", pa.timestamp("us")),
         ("o_orderpriority", pa.string())]
    ), {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord, dtype=np.int64),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    })

    per_order = rng.poisson(4.0, n_ord)
    n_li = int(per_order.sum())
    okeys = np.repeat(np.arange(n_ord, dtype=np.int64), per_order)
    ship = (
        ORDERDATE_LO
        + rng.integers(0, ORDERDATE_DAYS + 1, n_li).astype("timedelta64[D]")
        + rng.integers(1, 96, n_li).astype("timedelta64[D]")
    )
    _write(out_dir, "lineitem", pa.schema(
        [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
         ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
         ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
         ("l_discount", pa.float64()), ("l_tax", pa.float64()),
         ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
         ("l_shipdate", pa.timestamp("us"))]
    ), {
        "l_orderkey": okeys,
        "l_partkey": rng.integers(0, n_part, n_li, dtype=np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li, dtype=np.int64),
        "l_linenumber": rng.integers(1, 8, n_li, dtype=np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(0.01 * rng.integers(0, 11, n_li), 2),
        "l_tax": np.round(0.01 * rng.integers(0, 9, n_li), 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": ship.astype("datetime64[us]"),
    })

    n_ev = round(1_000_000 * sf)
    n_users = max(1, round(15_000 * sf))
    ts = EVENTS_TS_LO + rng.integers(0, EVENTS_TS_US, n_ev).astype(
        "timedelta64[us]"
    )
    _write(out_dir, "events", pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())]
    ), {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_users, n_ev, dtype=np.int64),
        "event_type": np.array(ETYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    })

    n_docs = max(500, round(50_000 * sf))
    vocab = np.array(VOCAB)
    texts: list[str] = []
    dup_family: list[list[str]] = []
    for i in range(n_docs):
        if rng.random() < 0.05:
            # dup-family doc: ~40% start a new family (fresh text with
            # the 'dup' marker inserted), else append-copy a member
            if not dup_family or rng.random() < 0.4:
                w = list(vocab[rng.integers(0, 30, rng.integers(10, 101))])
                w.insert(int(rng.integers(0, len(w) + 1)), "dup")
                dup_family = [w]
            else:
                src = dup_family[int(rng.integers(0, len(dup_family)))]
                w = src + list(vocab[rng.integers(0, 30, rng.integers(0, 6))])
                dup_family.append(w)
            texts.append(" ".join(w))
        else:
            n_w = int(rng.integers(10, 101))
            texts.append(" ".join(vocab[rng.integers(0, 30, n_w)]))
    _write(out_dir, "documents", pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string()),
         ("n_chars", pa.int64())]
    ), {
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(5, n_docs, p=LANG_P)
        ],
        "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_docs)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })

    n_vec = max(500, round(20_000 * sf))
    emb = rng.standard_normal((n_vec, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
         ("label", pa.int32())]
    ), {
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": list(emb),
        "label": rng.integers(0, 10, n_vec, dtype=np.int32),
    })


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else "artifacts/sf1"
    assert not os.path.abspath(out).startswith("/root/testdata"), (
        "testdata is read-only"
    )
    print(f"generating sf{sf} -> {out}", file=sys.stderr)
    gen(sf, out)
