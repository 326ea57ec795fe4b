"""Invariants for funnel/retention analytics (value parity runs via
tools/check_correctness.py)."""

from __future__ import annotations

from cdc_streamming___v2_spark.operators import analytics as A

from .conftest import SF_SMALL


def test_funnel_monotone(spark):
    r = A.funnel_conversion(spark, SF_SMALL).collect()[0]
    # each stage can only lose users
    assert r.n_signup >= r.n_click_after >= r.n_purchase_after
    assert r.n_signup > 0


def test_retention_cohort_week0_complete(spark):
    rows = A.retention_cohorts(spark, SF_SMALL).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, {})[r.weeks_since] = r.n_active_users
    for cohort, weeks in by_cohort.items():
        # every user is active in their own first week by definition
        assert 0 in weeks
        # retention can never exceed the cohort's own size
        assert all(n <= weeks[0] for n in weeks.values())


def test_oracle_coverage():
    assert set(A.ORACLES) == set(A.QUERIES)
