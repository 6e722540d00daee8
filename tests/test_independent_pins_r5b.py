"""Independent pure-Python pins for the round-5 additions (q156 AQP,
q157 Naive Bayes, q160 profiler): hand-built tables + from-scratch
models, so these families don't rely solely on builder-written SQL
agreeing with builder-written Spark."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from kinesyslog_spark.queries import QUERIES


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


def test_q156_sample_membership_matches_md5_model(spark, tmp_path):
    from kinesyslog_spark.queries.aqp import AQP_PCT

    sf = str(tmp_path)
    rows = [
        (ok, ln, "A" if ok % 2 else "R", float(100 + ok * 7 + ln))
        for ok in range(1, 60)
        for ln in range(1, 4)
    ]
    _write(spark, sf, "lineitem", rows,
           "l_orderkey long, l_linenumber long, l_returnflag string, "
           "l_extendedprice double")

    def in_sample(ok, ln):
        hv = int(hashlib.md5(f"aqp:{ok}:{ln}".encode()).hexdigest()[:15], 16)
        return hv % 100 < AQP_PCT

    exp = defaultdict(lambda: [0, 0, 0, 0])  # rf -> [n_s, cents_s, n_x, cents_x]
    for ok, ln, rf, price in rows:
        cents = round(price * 100)
        e = exp[rf]
        e[2] += 1
        e[3] += cents
        if in_sample(ok, ln):
            e[0] += 1
            e[1] += cents
    got = {r.returnflag: r
           for r in QUERIES["q156_aqp_sampled_aggregate"](spark, sf).collect()}
    for rf, (n_s, cents_s, n_x, cents_x) in exp.items():
        if n_s == 0:
            assert rf not in got  # no sampled rows -> no report row
            continue
        r = got[rf]
        assert r.est_rows == n_s * 100 // AQP_PCT
        assert r.exact_rows == n_x
        assert abs(r.exact_revenue - cents_x / 100) < 1e-6
        assert abs(r.est_revenue - cents_s / 100 * 100 / AQP_PCT) < 1e-6


def test_q157_scores_match_pure_python_nb(spark, tmp_path):
    sf = str(tmp_path)
    docs = [
        (1, "the cat sat on the mat", "en", "s"),
        (2, "the dog ran to the cat", "en", "s"),
        (3, "le chat et le chien", "fr", "s"),
        (4, "der hund und die katze", "de", "s"),
        (5, "the quick brown fox", "en", "s"),
    ]
    _write(spark, sf, "documents", docs,
           "doc_id long, text string, lang string, source string")

    # from-scratch multinomial NB with add-one smoothing, 6-dp-rounded
    # log10 terms (the engine's decimal quantization)
    toks = {d: t.lower().split() for d, t, _, _ in docs}
    y = {d: 1 if lang == "en" else 0 for d, _, lang, _ in docs}
    c_en, c_ot = Counter(), Counter()
    for d, ws in toks.items():
        (c_en if y[d] else c_ot).update(ws)
    vocab = set(c_en) | set(c_ot)
    t_en, t_ot, v = sum(c_en.values()), sum(c_ot.values()), len(vocab)

    def q6(x):
        return round(x, 6)

    le = {w: q6(math.log10((c_en[w] + 1.0) / (t_en + v))) for w in vocab}
    lo = {w: q6(math.log10((c_ot[w] + 1.0) / (t_ot + v))) for w in vocab}
    prior = q6(math.log10(3 / 2))  # 3 en docs, 2 non-en
    pred_en = {
        d: sum(le[w] - lo[w] for w in ws) + prior > 0
        for d, ws in toks.items()
    }
    exp = defaultdict(lambda: [0, 0])
    for d, _, lang, _ in docs:
        exp[lang][0] += 1
        exp[lang][1] += int(pred_en[d])
    got = {r.lang: (r.n_docs, r.n_pred_en)
           for r in QUERIES["q157_naive_bayes_lang"](spark, sf).collect()}
    assert got == {k: tuple(v) for k, v in exp.items()}
    assert got["en"][1] >= 2  # the planted en vocabulary separates


def test_q160_profile_matches_dict_model(spark, tmp_path):
    import datetime as dt

    sf = str(tmp_path)
    rows = [
        (1, 10, 100, 1, 5.0, 1000.25, 0.05, 0.01, "A", "F",
         dt.date(1995, 1, 1)),
        (2, 10, 101, 1, 9.0, 2000.50, 0.05, 0.02, "A", "O",
         dt.date(1996, 6, 15)),
        (3, 11, 100, 2, 5.0, 999.99, 0.10, 0.01, "R", "F",
         dt.date(1994, 12, 31)),
        (4, 12, 102, 1, 5.0, 1000.25, 0.05, 0.01, "A", "F", None),
    ]
    _write(spark, sf, "lineitem", rows,
           "l_orderkey long, l_partkey long, l_suppkey long, "
           "l_linenumber long, l_quantity double, l_extendedprice double, "
           "l_discount double, l_tax double, l_returnflag string, "
           "l_linestatus string, l_shipdate date")
    got = {r.column_name: r
           for r in QUERIES["q160_column_profile"](spark, sf).collect()}
    assert got["l_shipdate"].n_null == 1
    assert got["l_shipdate"].n_distinct == 3
    assert got["l_shipdate"].min_repr == "1994-12-31"
    assert got["l_shipdate"].max_repr == "1996-06-15"
    assert got["l_quantity"].n_distinct == 2
    assert got["l_quantity"].top_value == str(round(5.0 * 10000))
    assert got["l_quantity"].top_count == 3
    assert got["l_returnflag"].top_value == "A"
    assert got["l_returnflag"].top_count == 3
    assert got["l_extendedprice"].min_repr == str(round(999.99 * 10000))
    assert got["l_extendedprice"].max_repr == str(round(2000.50 * 10000))
    # numeric (not lexicographic) min/max: 999.99 < 1000.25 despite
    # '9999900' > '10002500' as strings
    assert all(r.n_rows == 4 for r in got.values())
