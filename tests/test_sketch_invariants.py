"""Structural guarantees of the sketch family, asserted on real data:
Bloom never misses (no false negatives), CMS never under-counts,
PQ recall is a valid fraction. These hold by construction — the tests
pin them against refactoring accidents (a wrong hash prefix or join
type would break them before it broke the oracle)."""

from __future__ import annotations

from kinesyslog_spark.queries import QUERIES


def test_bloom_has_no_false_negatives(spark, sf_dir):
    rows = QUERIES["q114_bloom_decontam"](spark, sf_dir).collect()
    assert rows, "bloom decontam returned nothing"
    for r in rows:
        assert r.bloom_hits >= r.exact_hits, (r.doc_id, r.bloom_hits, r.exact_hits)
        assert r.false_pos == r.bloom_hits - r.exact_hits
        assert 0 <= r.bloom_hits <= r.n_grams


def test_cms_never_undercounts(spark, sf_dir):
    rows = QUERIES["q115_cms_frequencies"](spark, sf_dir).collect()
    assert rows, "cms returned nothing"
    for r in rows:
        assert r.est_count >= r.true_count, (r.tok, r.est_count, r.true_count)
        assert r.overcount == r.est_count - r.true_count


def test_pq_recall_is_valid_fraction(spark, sf_dir):
    rows = QUERIES["q106_pq_recall"](spark, sf_dir).collect()
    assert rows, "pq recall returned nothing"
    for r in rows:
        assert 0 <= r.n_overlap <= 10
        assert abs(r.recall - r.n_overlap / 10) < 1e-12
    # the self-match (probe is its own nearest neighbor under ADC and
    # exact L2 alike) keeps recall strictly positive
    assert all(r.n_overlap >= 1 for r in rows)
