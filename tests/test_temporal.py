"""Semantic invariants for the temporal join operators at sf0.001.

Value parity vs DuckDB (incl. its native ASOF JOIN) runs via
tools/check_correctness.py; these pin the join semantics directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import temporal as T
from cdc_streamming___v2_spark.sources.tables import load_table

from .conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(T.QUERIES))
def test_query_runs_nonempty(spark, name):
    df = T.QUERIES[name](spark, SF_SMALL)
    assert df.columns and df.count() > 0


def test_asof_left_semantics(spark):
    e = load_table(spark, SF_SMALL, "events")
    n_purchases = e.filter(F.col("event_type") == "purchase").count()
    rows = T.asof_join_purchase_view(spark, SF_SMALL).collect()
    # LEFT join: one output row per purchase, matched or not
    assert len(rows) == n_purchases
    for r in rows:
        if r.view_ts is not None:
            assert r.view_ts <= r.ts  # as-of bound
        else:
            assert r.view_event_id is None and r.view_value is None


def test_asof_picks_latest_view(spark):
    # brute-force check one matched row against the raw events table
    rows = [r for r in T.asof_join_purchase_view(spark, SF_SMALL).collect()
            if r.view_event_id is not None][:5]
    e = load_table(spark, SF_SMALL, "events")
    views = [
        (v.user_id, v.ts, v.event_id)
        for v in e.filter(F.col("event_type") == "view").collect()
    ]
    for r in rows:
        candidates = [t for (u, t, _) in views if u == r.user_id and t <= r.ts]
        assert max(candidates) == r.view_ts


def test_range_join_counts_match_bruteforce(spark):
    e = load_table(spark, SF_SMALL, "events")
    clicks = [
        (c.user_id, c.ts) for c in e.filter(F.col("event_type") == "click").collect()
    ]
    from datetime import timedelta

    got = {r.event_id: r.n_clicks_10m
           for r in T.range_join_error_clicks(spark, SF_SMALL).collect()}
    errors = e.filter(F.col("event_type") == "error").collect()
    assert len(got) == len(errors)
    for err in errors:
        lo = err.ts - timedelta(minutes=10)
        want = sum(1 for (u, t) in clicks if u == err.user_id and lo <= t < err.ts)
        assert got[err.event_id] == want


def test_systematic_sample_scaling(spark):
    rows = T.systematic_sample(spark, SF_SMALL).collect()
    for r in rows:
        assert abs(r.est_revenue - r.sample_revenue * T.SAMPLE_MOD) < 0.01 * T.SAMPLE_MOD


def test_oracle_coverage():
    assert set(T.ORACLES) == set(T.QUERIES)
