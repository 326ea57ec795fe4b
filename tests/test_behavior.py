"""Behavioral sequence/affinity operators (markov transitions / basket).

Value correctness is the DuckDB oracle's job (tools/check_correctness.py);
these tests assert the semantics on small frames plus plan properties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import behavior

SF_DIR = "/root/testdata/sf0.001"


def test_markov_rows_sum_to_one(spark):
    out = behavior.markov_transitions(spark, SF_DIR)
    sums = out.groupBy("src").agg(F.round(F.sum("prob"), 4).alias("s")).collect()
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-3  # rounding at 6dp across <=5 cells
    # n consistency: total transitions = total events - one per user
    total_n = out.agg(F.sum("n")).collect()[0][0]
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert total_n == e.count() - e.select("user_id").distinct().count()


def test_market_basket_bounded_and_symmetric_free(spark):
    out = behavior.market_basket(spark, SF_DIR)
    rows = out.collect()
    assert 0 < len(rows) <= behavior.MARKET_BASKET_TOPN
    for r in rows:
        assert r["part_a"] < r["part_b"]  # canonical orientation, no dupes
        assert 0.0 < r["support"] <= 1.0
        assert r["lift"] > 0.0
    # deterministic top-N ordering
    counts = [r["pair_n"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_market_basket_broadcasts_dimensions(spark):
    plan = (
        behavior.market_basket(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_registry_rejects_duplicate_keys():
    # the guard that caught behavior.py's original funnel/retention collision
    import __spark_entry__ as entry

    q = entry.queries()
    assert "markov_transitions" in q and "market_basket" in q
