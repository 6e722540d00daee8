"""Value pins for the curation family (q127/q128/q129) against an
independent pure-Python model computed on the real sf0.001 corpus —
the cross-implementation pattern the oracle contract alone can't give
(builder writes both the Spark and the DuckDB side)."""

from __future__ import annotations

import re
from collections import Counter

from kinesyslog_spark.queries import QUERIES

_TOK = re.compile(r"[a-z0-9]+")


def _r4(x: float) -> float:
    """HALF_UP 4-dp quantization (Spark/DuckDB ROUND; Python round is
    banker's and differs at exact boundaries like 2/64 = 0.03125)."""
    import math

    return math.floor(x * 10000 + 0.5) / 10000


def _corpus(spark, sf_dir):
    from kinesyslog_spark.tables import load_table

    return [
        (r["doc_id"], r["source"], _TOK.findall(r["text"].lower()))
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    ]


def _grams(ws, n):
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def test_q127_matches_python_model(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    expect = {}
    for doc_id, _src, ws in docs:
        if len(ws) < 3:
            continue
        c2, c3 = Counter(_grams(ws, 2)), Counter(_grams(ws, 3))
        t2, t3 = sum(c2.values()), sum(c3.values())
        expect[doc_id] = (
            t2,
            _r4(max(c2.values()) / t2),
            _r4(sum(v for v in c2.values() if v > 1) / t2),
            _r4(sum(v for v in c3.values() if v > 1) / t3),
        )
    got = {
        r["doc_id"]: (
            r["n_grams2"],
            round(r["top2_share"], 4),
            round(r["dup2_frac"], 4),
            round(r["dup3_frac"], 4),
        )
        for r in QUERIES["q127_gopher_repetition"](spark, sf_dir).collect()
    }
    assert got == expect


def test_q128_matches_python_model(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    vocab: dict[str, set] = {}
    for _doc_id, src, ws in docs:
        vocab.setdefault(src, set()).update(ws)
    expect = {}
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            expect[(a, b)] = (
                inter,
                len(vocab[a]),
                len(vocab[b]),
                _r4(inter / len(vocab[a] | vocab[b])),
            )
    got = {
        (r["src_a"], r["src_b"]): (
            r["n_inter"],
            r["n_a"],
            r["n_b"],
            round(r["jaccard"], 4),
        )
        for r in QUERIES["q128_source_overlap"](spark, sf_dir).collect()
    }
    assert got == expect


def test_q129_matches_python_model(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    tf = Counter()
    for _doc_id, _src, ws in docs:
        tf.update(ws)
    spec = Counter(tf.values())
    corpus = sum(tf.values())
    expect = {}
    for freq, n_types in spec.items():
        nxt = spec.get(freq + 1)
        expect[freq] = (
            n_types,
            freq * n_types,
            _r4(freq * n_types / corpus),
            _r4((freq + 1) * nxt / n_types) if nxt else None,
        )
    got = {}
    for r in QUERIES["q129_freq_spectrum"](spark, sf_dir).collect():
        gt = round(r["gt_rstar"], 4) if r["gt_rstar"] is not None else None
        got[r["freq"]] = (r["n_types"], r["mass"], round(r["corpus_share"], 4), gt)
    assert got == expect


def test_q130_matches_python_model(spark, sf_dir):
    import math

    docs = _corpus(spark, sf_dir)
    sc: dict[str, Counter] = {}
    for _doc_id, src, ws in docs:
        sc.setdefault(src, Counter()).update(ws)
    cc = Counter()
    for c in sc.values():
        cc.update(c)
    n_all = sum(cc.values())
    expect = {}
    for src, c in sc.items():
        ns = sum(c.values())
        tv_num = sum(abs(c.get(w, 0) * n_all - cw * ns) for w, cw in cc.items())
        chi2 = kl = 0.0
        for w, cw in cc.items():
            ps, pc = c.get(w, 0) / ns, cw / n_all
            chi2 += math.floor((ps - pc) ** 2 / pc * 1e6 + 0.5) / 1e6
            if ps > 0:
                kl += math.floor(ps * math.log10(ps / pc) * 1e6 + 0.5) / 1e6
        expect[src] = (
            ns,
            _r4(tv_num / (2.0 * ns * n_all)),
            _r4(chi2),
            _r4(kl),
        )
    got = {
        r["source"]: (
            r["n_tokens"],
            round(r["tv_dist"], 4),
            round(r["chi2"], 4),
            round(r["kl_ban"], 4),
        )
        for r in QUERIES["q130_source_divergence"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for src in expect:
        e, g = expect[src], got[src]
        assert e[0] == g[0], src
        for i in (1, 2, 3):  # 6-dp term quantization: allow one 4-dp ulp
            assert abs(e[i] - g[i]) <= 1e-4, (src, i, e, g)


def test_q131_matches_python_model(spark, sf_dir):
    import math

    docs = _corpus(spark, sf_dir)
    tf = Counter()
    for _doc_id, _src, ws in docs:
        tf.update(ws)
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (
            math.floor(math.log10(r + 1) * 1e6 + 0.5) / 1e6,
            math.floor(math.log10(c) * 1e6 + 0.5) / 1e6,
        )
        for r, (_w, c) in enumerate(ranked[:1000])
    ]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = QUERIES["q131_zipf_fit"](spark, sf_dir).collect()[0]
    assert row["n_ranks"] == n
    assert abs(row["zipf_alpha"] - (-slope)) < 1e-3
    assert 0.0 <= row["r2"] <= 1.0


def test_q132_matches_python_model(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    per_doc: dict[str, Counter] = {}
    cf, df = Counter(), Counter()
    for _doc_id, _src, ws in docs:
        c = Counter(ws)
        cf.update(c)
        df.update(c.keys())
        for w, x in c.items():
            per_doc.setdefault(w, Counter())[_doc_id] = x
    d = len(docs)
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = {}
    for w, c in top:
        sxx = sum(x * x for x in per_doc[w].values())
        expect[w] = (c, df[w], _r4(df[w] / d), _r4((d * sxx - c * c) / (d * c)))
    got = {
        r["token"]: (r["cf"], r["df"], round(r["doc_frac"], 4), round(r["vmr"], 4))
        for r in QUERIES["q132_token_dispersion"](spark, sf_dir).collect()
    }
    assert got == expect


def test_corpus_report_artifact(spark, sf_dir, tmp_path):
    from kinesyslog_spark.report import REPORT_TABLES, corpus_report

    out = str(tmp_path / "report")
    summary = corpus_report(spark, sf_dir, out)
    assert set(summary["tables"]) == {a for _, a in REPORT_TABLES}
    assert all(n > 0 for n in summary["tables"].values())
    assert 0.0 < summary["zipf_alpha"] < 3.0
    assert 0.0 <= summary["worst_drift_tv"] <= 1.0
    assert summary["hll_exact"] > 0
    # artifact readable back as parquet
    df = spark.read.parquet(out + "/source_overlap")
    assert df.count() == summary["tables"]["source_overlap"]


def test_grams_property_matches_python(spark):
    """_grams (sequence+slice+concat_ws, the JVM gram builder every
    curation stat rides on) == the python sliding window for random
    token arrays, n in {2, 3}."""
    import random

    from pyspark.sql import functions as F

    from kinesyslog_spark.queries.curation import _grams

    rng = random.Random(42)
    vocab = ["a", "bb", "ccc", "d0", "e"]
    rows = []
    for i in range(60):
        ln = rng.randint(3, 12)
        rows.append((i, [rng.choice(vocab) for _ in range(ln)]))
    df = spark.createDataFrame(rows, "i long, toks array<string>")
    out = {
        r["i"]: (r["g2"], r["g3"])
        for r in df.select(
            "i",
            _grams(F.col("toks"), 2).alias("g2"),
            _grams(F.col("toks"), 3).alias("g3"),
        ).collect()
    }
    for i, toks in rows:
        want2 = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        want3 = [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
        assert out[i] == (want2, want3), i
