"""q172 sample-size bound: the ground-truth quadratic must be bounded
by a fixed TARGET_SAMPLE at ANY corpus size, because the modulus is
derived from the corpus count (round-5/6 verdict #1 — a fixed rate
keeps the quadratic proportional to the corpus)."""

from __future__ import annotations

from kinesyslog_spark.queries import QUERIES
from kinesyslog_spark.queries.lshaudit import TARGET_SAMPLE, sample_mod


def test_sample_mod_bounds_expected_sample_at_any_scale():
    # n/mod <= TARGET_SAMPLE must hold from empty corpora to 1e12 docs:
    # ceil(n/T) >= n/T  =>  n/ceil(n/T) <= T, exactly the bound the
    # docstring claims.
    for n in [0, 1, 2, TARGET_SAMPLE - 1, TARGET_SAMPLE,
              TARGET_SAMPLE + 1, 10_000, 5_000_000, 10**9, 10**12]:
        mod = sample_mod(n)
        assert mod >= 1
        assert n / mod <= TARGET_SAMPLE, (n, mod)
    # and the modulus actually grows with the corpus (not a fixed rate)
    assert sample_mod(10**9) > 1000 * sample_mod(10**4)


def test_sample_mod_is_tight_not_overshrunk():
    # the derived mod should not over-shrink the sample: expected size
    # n/mod stays above TARGET/2 once the corpus clears the target
    # (otherwise the audit loses statistical power for no reason).
    for n in [TARGET_SAMPLE + 1, 10_000, 5_000_000, 10**9]:
        assert n / sample_mod(n) > TARGET_SAMPLE / 2, n


def test_q172_sample_size_bounded_end_to_end(spark, sf_dir):
    # wiring check: the query's reported sample size respects the bound
    # (hash-mod sampling is binomial around n/mod; 2x slack covers any
    # realistic deviation while still failing on a rate-style bug).
    [r] = QUERIES["q172_lsh_recall_audit"](spark, sf_dir).collect()
    assert r.n_sample_docs <= 2 * TARGET_SAMPLE
