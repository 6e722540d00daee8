"""q154 encoding audit detection arm (planted mojibake) + q155
readability on a hand-computable document."""

from __future__ import annotations

from kinesyslog_spark.queries.textqual import (
    q154_encoding_audit,
    q155_readability,
)


def test_q154_detects_planted_mojibake(spark, tmp_path):
    sf = str(tmp_path)
    c1 = ""  # NEL — classic C1 residue
    rows = [
        (1, "clean ascii text", "a"),
        (2, "bad � replacement � chars", "a"),
        (3, "double-encoded cafÃ© voilÃ ", "b"),
        (4, f"c1 control {c1} residue", "b"),
        (5, "clean again", "b"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {r.source: r for r in q154_encoding_audit(spark, sf).collect()}
    assert got["a"].repl_chars == 2 and got["a"].damaged_docs == 1
    assert got["b"].moji_digraphs == 2  # two 'Ã?' digraphs in doc 3
    assert got["b"].c1_chars == 1
    assert got["b"].damaged_docs == 2
    assert got["a"].ascii_frac < 1.0  # U+FFFD is non-ascii
    assert 0.0 < got["b"].ascii_frac < 1.0


def test_q155_hand_computed_flesch(spark, tmp_path):
    sf = str(tmp_path)
    text = "The cat sat. The dog ran!"  # 6 words, 2 sentences, 6 syllables
    spark.createDataFrame(
        [(1, text, "s")], "doc_id long, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    r = q155_readability(spark, sf).collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
    wps, spw = 6 / 2, 6 / 6
    assert abs(r.flesch_ease - round(206.835 - 1.015 * wps - 84.6 * spw, 4)) < 1e-9
    assert abs(r.fk_grade - round(0.39 * wps + 11.8 * spw - 15.59, 4)) < 1e-9
