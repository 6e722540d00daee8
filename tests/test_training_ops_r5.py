"""Independent pins for the round-5 training-ops additions
(q161 logistic GD, q162 CDC chunking, q163 split leakage, q164
calibration): pure-Python models that share NO code with either the
Spark implementation or the DuckDB oracle, run on the real sf0.001
corpus, and must agree with the engine's output."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from kinesyslog_spark.queries import QUERIES

_TOK = re.compile(r"[a-z0-9]+")


def _docs(duck):
    return duck.sql(
        "SELECT doc_id, lang, text FROM documents ORDER BY doc_id"
    ).fetchall()


def _md5i(prefix: str, s: str) -> int:
    return int(hashlib.md5((prefix + s).encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# q162 — CDC chunking
# ---------------------------------------------------------------------------


def _py_chunks(toks: list[str], mod: int = 8) -> list[str]:
    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        if _md5i("cdc:", t) % mod == 0:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def test_q162_chunks_match_pure_python(spark, sf_dir, duck):
    from kinesyslog_spark.queries.chunking import cdc_chunks

    got = {}
    for r in cdc_chunks(spark, sf_dir).collect():
        got.setdefault(r.doc_id, {})[r.chunk_id] = r.ctext
    checked = 0
    for doc_id, _lang, text in _docs(duck)[:50]:
        toks = _TOK.findall(text.lower())
        if not toks:
            assert doc_id not in got
            continue
        expect = _py_chunks(toks)
        rows = got[doc_id]
        assert [rows[k] for k in sorted(rows)] == expect
        checked += 1
    assert checked >= 40


def test_cdc_shift_resistance_model():
    """The property fixed-size chunking lacks: a prefix edit only
    perturbs chunks up to the first boundary after the edit — every
    later chunk re-aligns identically."""
    import random

    rnd = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    toks = [rnd.choice(vocab) for _ in range(400)]
    base = _py_chunks(toks)
    edited = _py_chunks([rnd.choice(vocab) for _ in range(9)] + toks)
    # every base chunk after the first boundary survives the edit
    assert len(base) > 10
    surviving = set(edited) & set(base)
    assert len(surviving) >= len(base) - 2
    # and a FIXED-size chunker would have lost everything (9 % 8 != 0)
    fixed_base = [" ".join(toks[i:i + 8]) for i in range(0, len(toks), 8)]
    fixed_edit = [" ".join((["x"] * 9 + toks)[i:i + 8])
                  for i in range(0, len(toks) + 9, 8)]
    assert len(set(fixed_base) & set(fixed_edit)) <= 2


# ---------------------------------------------------------------------------
# q163 — split assignment + leakage counting
# ---------------------------------------------------------------------------


def _py_split(doc_id: int) -> str:
    b = _md5i("split:", str(doc_id)) % 100
    return "train" if b < 90 else ("val" if b < 95 else "test")


def test_q163_sizes_and_leaks_match_pure_python(spark, sf_dir, duck):
    rows = QUERIES["q163_split_leakage"](spark, sf_dir).collect()
    assert [(r.split_a, r.split_b) for r in rows] == [
        ("test", "train"), ("test", "val"), ("train", "val")
    ]
    sizes: dict[str, int] = {"train": 0, "val": 0, "test": 0}
    for doc_id, _lang, _text in _docs(duck):
        sizes[_py_split(doc_id)] += 1
    for r in rows:
        assert r.n_docs_a == sizes[r.split_a]
        assert r.n_docs_b == sizes[r.split_b]
    # leakage counts must agree with re-classifying q26's verified pairs
    leaks: dict[tuple[str, str], int] = {}
    for p in QUERIES["q26_minhash_lsh"](spark, sf_dir).collect():
        sa, sb = _py_split(p.doc_a), _py_split(p.doc_b)
        if sa != sb:
            key = (min(sa, sb), max(sa, sb))
            leaks[key] = leaks.get(key, 0) + 1
    for r in rows:
        assert r.n_leak_pairs == leaks.get((r.split_a, r.split_b), 0)


# ---------------------------------------------------------------------------
# q161 — logistic regression GD
# ---------------------------------------------------------------------------


def _fq(x: float, scale: int) -> float:
    p = 10 ** scale
    return math.floor(x * p + 0.5) / p


def test_q161_weights_match_pure_python(spark, sf_dir, duck):
    """Re-derive the full GD trajectory in pure Python (features,
    quantized sigmoid, per-row gradient, weight steps) and require the
    engine's reported weights/accuracy to land within one quantization
    quantum."""
    feats = []
    for doc_id, lang, text in _docs(duck):
        toks = _TOK.findall(text.lower())
        if not toks:
            continue
        nt = float(len(toks))
        feats.append((
            1 if lang == "en" else 0,
            [1.0, len(text) / 1000.0, len(toks) / 100.0,
             len(set(toks)) / nt, sum(map(len, toks)) / nt / 10.0],
        ))
    w = [0.0] * 5
    for _ in range(3):
        g = [0.0] * 5
        for y, x in feats:
            z = 0.0
            for j in range(5):
                z += w[j] * x[j]
            s = _fq(1.0 / (1.0 + math.exp(-max(min(z, 30.0), -30.0))), 6)
            for j in range(5):
                g[j] += round((s - y) * x[j], 10)
        w = [w[j] - _fq(g[j] / len(feats), 9) for j in range(5)]
    [r] = QUERIES["q161_logreg_gd"](spark, sf_dir).collect()
    assert r.n_iters == 3 and r.n_docs == len(feats)
    for j in range(5):
        assert abs(getattr(r, f"w{j}") - _fq(w[j], 6)) <= 2e-6, (j, w)
    correct = 0
    for y, x in feats:
        z = sum(w[j] * x[j] for j in range(5))
        s = _fq(1.0 / (1.0 + math.exp(-max(min(z, 30.0), -30.0))), 6)
        correct += 1 if (s > 0.5) == (y == 1) else 0
    assert abs(r.n_correct - correct) <= 2
    assert 0.0 <= r.accuracy <= 1.0


# ---------------------------------------------------------------------------
# q164 — calibration bins
# ---------------------------------------------------------------------------


def test_q164_bins_internally_consistent(spark, sf_dir):
    rows = QUERIES["q164_calibration_bins"](spark, sf_dir).collect()
    assert rows
    n_total = sum(r.n for r in rows)
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0 <= r.n_pos <= r.n
        # mean confidence must sit inside its bin (quantization slack)
        assert r.bin / 10 - 1e-6 <= r.mean_conf <= (r.bin + 1) / 10 + 1e-6
        assert abs(
            r.ece_contrib
            - _fq(r.n / n_total * abs(r.mean_conf - r.emp_rate), 6)
        ) <= 2e-6
        assert abs(r.emp_rate - _fq(r.n_pos / r.n, 6)) <= 1e-9
    # ECE is bounded by the worst bin gap
    ece = sum(r.ece_contrib for r in rows)
    assert 0.0 <= ece <= max(abs(r.mean_conf - r.emp_rate) for r in rows) + 1e-6


def test_q161_q164_schemas(spark, sf_dir):
    df = QUERIES["q161_logreg_gd"](spark, sf_dir)
    assert df.columns == [
        "n_iters", "n_docs", "w0", "w1", "w2", "w3", "w4",
        "n_correct", "accuracy",
    ]
    df4 = QUERIES["q164_calibration_bins"](spark, sf_dir)
    assert df4.columns == [
        "bin", "n", "n_pos", "mean_conf", "emp_rate", "ece_contrib"
    ]


# ---------------------------------------------------------------------------
# q165 — cluster-aware split
# ---------------------------------------------------------------------------


def test_q165_leak_free_and_conserves_docs(spark, sf_dir):
    rows = QUERIES["q165_cluster_split"](spark, sf_dir).collect()
    assert [r.split for r in rows] == ["test", "train", "val"]
    # the audit the query carries: zero cross-split verified pairs
    assert all(r.n_leak_pairs == 0 for r in rows)
    # doc conservation vs the document-hash split (q163 reports sizes)
    q163 = QUERIES["q163_split_leakage"](spark, sf_dir).collect()
    n_total_163 = {r.split_a: r.n_docs_a for r in q163}
    n_total_163.update({r.split_b: r.n_docs_b for r in q163})
    assert sum(r.n_docs for r in rows) == sum(n_total_163.values())
    # every near-dup cluster lands in ONE split (pure-python recheck)
    clu = {}
    for r in QUERIES["q40_dedup_clusters"](spark, sf_dir).collect():
        clu[r.doc_id] = r.cluster_id
    unit_split = {}
    for r in QUERIES["q26_minhash_lsh"](spark, sf_dir).collect():
        ua, ub = clu[r.doc_a], clu[r.doc_b]
        assert ua == ub or _py_split_unit(ua) == _py_split_unit(ub)
    # a singleton doc's unit is itself => it keeps its q163 assignment
    assert _py_split_unit(12345) == _py_split(12345)


def _py_split_unit(unit: int) -> str:
    b = _md5i("split:", str(unit)) % 100
    return "train" if b < 90 else ("val" if b < 95 else "test")


# ---------------------------------------------------------------------------
# q166 — power-iteration principal component
# ---------------------------------------------------------------------------


def test_q166_matches_numpy_power_iteration(spark, sf_dir, duck):
    """Re-run the same 4-iteration power method in numpy (float64, same
    start vector) and require the engine's eigval/eigvector to agree;
    also sanity-check against numpy's exact eigendecomposition."""
    import numpy as np

    X = np.array(
        duck.sql("SELECT embedding FROM embeddings ORDER BY vec_id")
        .fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    n, d = X.shape
    mu = X.mean(axis=0)
    Xc = X - mu
    v = np.full(d, 0.125)
    for _ in range(4):
        u = Xc.T @ (Xc @ v) / n
        v = u / np.linalg.norm(u)
    [r] = QUERIES["q166_power_iteration_pc"](spark, sf_dir).collect()
    assert r.n == n
    assert abs(r.eigval - np.linalg.norm(u)) < 1e-3
    assert abs(r.total_var - (Xc * Xc).sum() / n) < 1e-3
    for j in range(8):
        assert abs(getattr(r, f"v{j}") - v[j]) < 1e-4
    # vs the exact spectrum: ||Cv|| approaches the top eigenvalue from
    # below. The synthetic embeddings are near-isotropic (tiny spectral
    # gap), so 4 rounds land close but not converged — the contract is
    # the distributed matvec machinery, not spectral-gap luck.
    C = Xc.T @ Xc / n
    w = np.linalg.eigvalsh(C)
    assert r.eigval <= w[-1] + 1e-6
    assert r.eigval >= 0.8 * w[-1], (r.eigval, w[-1])
    assert r.evr >= 1.0 / d  # top component explains >= average share


# ---------------------------------------------------------------------------
# q167 — HLL audience overlap
# ---------------------------------------------------------------------------


def test_q167_matches_pure_python_hll(spark, sf_dir, duck):
    """Recompute the register tables, inclusion-exclusion estimates and
    exact intersections in pure Python from the raw events."""
    ev = duck.sql("SELECT event_type, user_id FROM events").fetchall()
    regs: dict[str, list[int]] = {}
    users: dict[str, set[int]] = {}
    for et, uid in ev:
        hv = _md5i("ovl:", str(uid))
        j, rest = hv % 64, hv >> 6
        r = 55 if rest == 0 else 55 - rest.bit_length()
        regs.setdefault(et, [0] * 64)
        regs[et][j] = max(regs[et][j], r)
        users.setdefault(et, set()).add(uid)

    def est(m):
        zs = sum(1 << (55 - x) for x in m)
        return math.floor(0.709 * 64 * 64 * (1 << 55) / zs)

    rows = QUERIES["q167_hll_audience_overlap"](spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.et_a < r.et_b
        seen.add((r.et_a, r.et_b))
        assert r.n_exact_a == len(users[r.et_a])
        assert r.n_exact_b == len(users[r.et_b])
        assert r.n_exact_both == len(users[r.et_a] & users[r.et_b])
        union = [max(a, b) for a, b in zip(regs[r.et_a], regs[r.et_b])]
        expect = max(
            0, est(regs[r.et_a]) + est(regs[r.et_b]) - est(union)
        )
        assert r.est_both == expect
        assert r.est_err == expect - r.n_exact_both
    ets = sorted(users)
    assert seen == {
        (a, b) for i, a in enumerate(ets) for b in ets[i + 1:]
    }


# ---------------------------------------------------------------------------
# q168 — Benford audit
# ---------------------------------------------------------------------------


def test_q168_matches_pure_python(spark, sf_dir, duck):
    rows = QUERIES["q168_benford_audit"](spark, sf_dir).collect()
    for table, col in (("lineitem", "l_extendedprice"),
                       ("orders", "o_totalprice")):
        vals = [v for (v,) in duck.sql(
            f"SELECT {col} FROM {table} WHERE {col} > 0"
        ).fetchall()]
        counts = {d: 0 for d in range(1, 10)}
        for v in vals:
            counts[int(str(int(v * 100))[0])] += 1
        n = sum(counts.values())
        exp = {d: math.floor(math.log10(1 + 1 / d) * 1e6 + 0.5) / 1e6
               for d in range(1, 10)}
        chi2 = sum(
            round((counts[d] - n * exp[d]) ** 2 / (n * exp[d]), 10)
            for d in range(1, 10)
        )
        mine = [r for r in rows if r.src == f"{table}.{col}"]
        assert [r.digit for r in mine] == list(range(1, 10))
        for r in mine:
            assert r.n_obs == counts[r.digit]
            assert r.benford_p == exp[r.digit]
            assert abs(r.frac - _fq(counts[r.digit] / n, 6)) <= 1e-9
            assert abs(r.chi2 - _fq(chi2, 4)) <= 2e-4


# ---------------------------------------------------------------------------
# q169 — split-disciplined AUC
# ---------------------------------------------------------------------------


def test_q169_split_disciplined_auc(spark, sf_dir, duck):
    rows = QUERIES["q169_split_disciplined_auc"](spark, sf_dir).collect()
    assert [r.split for r in rows] == ["test", "train", "val"]
    sizes = {"train": 0, "val": 0, "test": 0}
    pos = {"train": 0, "val": 0, "test": 0}
    for doc_id, lang, text in _docs(duck):
        if not _TOK.findall(text.lower()):
            continue
        s = _py_split(doc_id)
        sizes[s] += 1
        pos[s] += 1 if lang == "en" else 0
    for r in rows:
        assert 0.0 <= r.auc_binned <= 1.0
        # scored docs are labeled docs minus those with no trained token
        assert 0 < r.n_pos <= pos[r.split]
        assert 0 < r.n_neg <= sizes[r.split] - pos[r.split]


# ---------------------------------------------------------------------------
# q171 — robust outlier audit
# ---------------------------------------------------------------------------


def test_q171_matches_pure_python(spark, sf_dir, duck):
    import statistics

    rows = {r.src: r for r in
            QUERIES["q171_robust_outlier_audit"](spark, sf_dir).collect()}
    for table, col in (("lineitem", "l_extendedprice"),
                       ("orders", "o_totalprice")):
        vals = sorted(
            float(v) for (v,) in duck.sql(
                f"SELECT CAST({col} AS DECIMAL(12,2)) FROM {table}"
            ).fetchall()
        )
        n = len(vals)
        med = (vals[(n - 1) // 2] + vals[n // 2]) / 2
        devs = sorted(abs(v - med) for v in vals)
        mad = (devs[(n - 1) // 2] + devs[n // 2]) / 2
        n_out = sum(
            1 for d in devs
            if math.floor(d / (1.4826 * mad) * 1e6 + 0.5) / 1e6 > 3.5
        )
        r = rows[f"{table}.{col}"]
        assert r.n == n
        assert abs(r.median - med) < 1e-6
        assert abs(r.mad - mad) < 1e-6
        assert r.n_outliers == n_out
        assert abs(r.outlier_frac - _fq(n_out / n, 6)) < 1e-9
        # a robust audit on clean TPC-H money columns flags few rows
        assert r.outlier_frac < 0.05


# ---------------------------------------------------------------------------
# q172 — LSH recall audit
# ---------------------------------------------------------------------------


def test_q172_matches_pure_python(spark, sf_dir, duck):
    """Recompute the sampled ground truth (shingle Jaccard) and the
    sample-restricted q26 pair set in pure Python."""
    from kinesyslog_spark.queries.lshaudit import sample_mod

    [r] = QUERIES["q172_lsh_recall_audit"](spark, sf_dir).collect()
    eligible = {}
    for doc_id, _lang, text in _docs(duck):
        toks = _TOK.findall(text.lower())
        if len(toks) < 3:
            continue
        eligible[doc_id] = {
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        }
    mod = sample_mod(len(eligible))
    sh = {
        d: s for d, s in eligible.items()
        if _md5i("rs:", str(d)) % mod == 0
    }
    assert r.n_sample_docs == len(sh)
    ids = sorted(sh)
    true_pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            j = round(inter / (len(sh[a]) + len(sh[b]) - inter), 4)
            if j >= 0.5:
                true_pairs.add((a, b))
    assert r.n_true_pairs == len(true_pairs)
    found = {
        (p.doc_a, p.doc_b)
        for p in QUERIES["q26_minhash_lsh"](spark, sf_dir).collect()
        if p.doc_a in sh and p.doc_b in sh
    }
    assert r.n_found_pairs == len(true_pairs & found)
    assert 0.0 <= r.recall <= 1.0
    assert abs(r.band_model_at_threshold
               - _fq(1 - (1 - 0.5 ** 3) ** 4, 6)) < 1e-9


# ---------------------------------------------------------------------------
# q173 — dedup threshold sweep
# ---------------------------------------------------------------------------


def test_q173_monotone_and_matches_q26(spark, sf_dir, duck):
    rows = QUERIES["q173_dedup_threshold_sweep"](spark, sf_dir).collect()
    assert [r.tau for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    # monotone: raising tau never flags MORE
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_dropped >= b.n_docs_dropped
        assert a.n_tokens_dropped >= b.n_tokens_dropped
    # tau=0.5 row re-derived from q26's verified pairs + token counts
    pairs = QUERIES["q26_minhash_lsh"](spark, sf_dir).collect()
    toks = {
        doc_id: len(_TOK.findall(text.lower()))
        for doc_id, _lang, text in _docs(duck)
    }
    drop = {p.doc_b for p in pairs if p.jaccard >= 0.5}
    assert rows[0].n_pairs == sum(1 for p in pairs if p.jaccard >= 0.5)
    assert rows[0].n_docs_dropped == len(drop)
    assert rows[0].n_tokens_dropped == sum(toks[d] for d in drop)
    total = sum(toks.values())
    assert abs(
        rows[0].token_frac_dropped
        - _fq(rows[0].n_tokens_dropped / total, 6)
    ) < 1e-9
