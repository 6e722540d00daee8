"""q157/q158 — the trained model must carry real signal on the corpus
(not just oracle-match): en attracts more en-predictions than any other
language, and AUC beats chance."""

from __future__ import annotations

from kinesyslog_spark.queries import QUERIES


def test_nb_predictions_favor_en(spark, sf_dir):
    rows = {r.lang: r for r in
            QUERIES["q157_naive_bayes_lang"](spark, sf_dir).collect()}
    assert "en" in rows and len(rows) >= 3
    en_frac = rows["en"].frac_pred_en
    for lang, r in rows.items():
        if lang != "en":
            assert en_frac > r.frac_pred_en, (
                f"en ({en_frac}) must out-attract {lang} ({r.frac_pred_en})"
            )


def test_auc_beats_chance(spark, sf_dir):
    r = QUERIES["q158_auc_nb_scores"](spark, sf_dir).collect()[0]
    assert r.n_pos > 0 and r.n_neg > 0
    assert 0.55 < r.auc <= 1.0, f"AUC {r.auc} shows no signal"
