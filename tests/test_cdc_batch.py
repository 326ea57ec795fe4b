"""Invariants for the batch CDC envelope roundtrip (value parity runs via
tools/check_correctness.py)."""

from __future__ import annotations

from cdc_streamming___v2_spark.operators import cdc_batch as C

from .conftest import SF_SMALL


def test_roundtrip_delete_blank_rows(spark):
    rows = {r.action: r for r in C.cdc_envelope_roundtrip(spark, SF_SMALL).collect()}
    assert set(rows) == {"INSERT", "UPDATE-INSERT", "DELETE"}
    # DELETE payloads are blanked to the key: no custkeys, no revenue
    assert rows["DELETE"].n_custkeys == 0
    assert rows["DELETE"].revenue is None
    for a in ("INSERT", "UPDATE-INSERT"):
        assert rows[a].n_custkeys == rows[a].n_rows
        assert rows[a].revenue > 0


def test_sql_api_cte_totals(spark):
    rows = C.sql_api_cte(spark, SF_SMALL).collect()
    assert sum(r.n_custs for r in rows) == 150  # sf0.001 customer count
    assert sum(r.total_orders for r in rows) == 1500  # every order counted


def test_oracle_coverage():
    assert set(C.ORACLES) == set(C.QUERIES)
