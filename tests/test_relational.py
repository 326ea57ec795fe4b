"""Smoke + invariants for the relational query surface at sf0.001.

Full value-parity against DuckDB runs via tools/check_correctness.py (and
the driver's own oracle harness); these tests pin cheap invariants so
pytest alone catches regressions.
"""

from __future__ import annotations

import pytest

from cdc_streamming___v2_spark.operators import relational as R
from cdc_streamming___v2_spark.operators import scd2_queries as S

from .conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(R.QUERIES))
def test_query_runs_nonempty_schema(spark, name):
    df = R.QUERIES[name](spark, SF_SMALL)
    rows = df.collect()
    assert df.columns  # stable schema
    if name != "join_anti":  # anti-join may legitimately be empty
        assert len(rows) > 0


def test_oracle_coverage():
    assert set(R.ORACLES) == set(R.QUERIES)
    assert set(S.ORACLES) == set(S.QUERIES)


def test_q1_group_count(spark):
    rows = R.q1_pricing_summary(spark, SF_SMALL).collect()
    # 3 returnflags x 2 linestatus at most
    assert 1 <= len(rows) <= 9
    for r in rows:
        assert r.count_order > 0 and r.sum_qty > 0


def test_top_customers_sorted_desc(spark):
    rows = R.top_customers(spark, SF_SMALL).collect()
    vals = [r.total_spent for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert len(rows) == 10


def test_scd2_latest_one_row_per_user(spark):
    rows = S.scd2_latest_state(spark, SF_SMALL).collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users))
    assert all(r.event_type != "error" for r in rows)
