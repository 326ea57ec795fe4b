"""Smoke + invariants for the extended relational surface at sf0.001.

Value parity against DuckDB runs via tools/check_correctness.py; these pin
cheap invariants so pytest alone catches regressions.
"""

from __future__ import annotations

import pytest

from cdc_streamming___v2_spark.operators import relational_ext as RX

from .conftest import SF_SMALL

# Some selective shapes can legitimately return zero rows at sf0.001.
MAY_BE_EMPTY = {
    "q7_volume_shipping",  # the 2-nation pair has no trades at sf0.001
    "q17_small_qty_revenue",
    "q18_large_orders",
}


@pytest.mark.parametrize("name", sorted(RX.QUERIES))
def test_query_runs_nonempty_schema(spark, name):
    df = RX.QUERIES[name](spark, SF_SMALL)
    rows = df.collect()
    assert df.columns
    if name not in MAY_BE_EMPTY:
        assert len(rows) > 0


def test_oracle_coverage():
    assert set(RX.ORACLES) == set(RX.QUERIES)


def test_cube_has_grand_total(spark):
    rows = RX.cube_agg(spark, SF_SMALL).collect()
    totals = [r for r in rows if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(totals) == 1
    assert totals[0].n_orders == sum(
        r.n_orders
        for r in rows
        if r.o_orderstatus is not None and r.o_orderpriority is not None
    )


def test_q10_limit_and_order(spark):
    rows = RX.q10_returned_items(spark, SF_SMALL).collect()
    assert len(rows) <= 20
    vals = [r.revenue for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_q13_includes_zero_order_customers(spark):
    rows = RX.q13_customer_distribution(spark, SF_SMALL).collect()
    counts = {r.n_orders: r.n_custs for r in rows}
    assert sum(counts.values()) > 0


def test_math_funcs_row_per_supplier(spark):
    df = RX.math_funcs(spark, SF_SMALL)
    rows = df.collect()
    for r in rows:
        assert r.abs_bal >= 0 and r.sqrt_bal >= 0
        assert 0 <= r.mod7 < 7
