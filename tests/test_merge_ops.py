"""Invariants for the merge/salting scale patterns (value parity vs the
simple formulations runs via tools/check_correctness.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import merge_ops as MO
from cdc_streamming___v2_spark.operators.scd2_queries import scd2_latest_state

from .conftest import SF_SMALL


def test_merge_equals_full_log_latest_state(spark):
    merged = {
        r.user_id: (r.event_id, r.event_type)
        for r in MO.cdc_merge_apply(spark, SF_SMALL).collect()
    }
    direct = {
        r.user_id: (r.event_id, r.event_type)
        for r in scd2_latest_state(spark, SF_SMALL).collect()
    }
    assert merged == direct


def test_salted_join_no_tombstone_and_spread(spark):
    df = MO.skew_salted_join(spark, SF_SMALL)
    rows = df.collect()
    assert sum(r.n_items for r in rows) == 6000  # every lineitem joined once


def test_salt_values_bounded(spark):
    from cdc_streamming___v2_spark.sources.tables import load_table

    li = load_table(spark, SF_SMALL, "lineitem").withColumn(
        "salt", ((F.col("l_partkey") + F.col("l_linenumber")) % MO.SALT).cast("int")
    )
    mm = li.agg(F.min("salt"), F.max("salt")).collect()[0]
    assert mm[0] >= 0 and mm[1] < MO.SALT


def test_oracle_coverage():
    assert set(MO.ORACLES) == set(MO.QUERIES)
