"""Sketch-property invariants (value parity runs via
tools/check_correctness.py — these assert the estimator guarantees)."""

from __future__ import annotations

from cdc_streamming___v2_spark.operators import sketches as S

from .conftest import SF_SMALL


def test_oracle_coverage():
    assert set(S.ORACLES) == set(S.QUERIES)


def test_kmv_small_groups_exact_and_bounded(spark):
    rows = S.kmv_distinct(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r.exact_distinct < S.KMV_K:
            # under-filled sketch degenerates to the exact count
            assert r.est_distinct == float(r.exact_distinct)
            assert r.rel_err == 0.0
        else:
            # KMV standard error is ~1/sqrt(k-2); 4 sigma is a safe gate
            assert r.rel_err < 4.0 / (S.KMV_K - 2) ** 0.5


def test_countmin_never_underestimates(spark):
    rows = S.countmin_freq(spark, SF_SMALL).collect()
    assert len(rows) == S.CM_QUERY_KEYS
    for r in rows:
        assert r.overestimate >= 0
        assert r.est_count >= r.exact_count >= 1


def test_bloom_no_false_negatives(spark):
    r = S.bloom_prefilter(spark, SF_SMALL).collect()[0]
    # every true match must pass the filter (n_false_pos >= 0 encodes it)
    assert r.n_false_pos >= 0
    assert r.n_bloom_pass == r.n_true_match + r.n_false_pos
    assert r.n_true_match > 0


def test_quantile_sketch_error_bounded_by_bin_width(spark):
    rows = S.quantile_sketch(spark, SF_SMALL).collect()
    assert len(rows) == len(S.QS_PROBES)
    assert {r.p for r in rows} == set(S.QS_PROBES)
    for r in rows:
        # histogram interpolation is off by at most ~one bin width around
        # the true quantile; generous multiple guards distribution shape
        assert r.rel_err < 0.25
        assert r.est_q is not None and r.exact_q is not None
