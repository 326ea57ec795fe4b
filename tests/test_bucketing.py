"""Bucketed co-located joins: persisting both fact tables bucketed on the
join key lets repeated joins run WITHOUT any shuffle — the strategy for
recurring large-large joins at 100 TB (pay the shuffle once at write time,
never again at read time)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_streamming___v2_spark.sources.tables import load_table

from .conftest import SF_SMALL

N_BUCKETS = 8


def _purge(spark, name: str) -> None:
    """Drop catalog entry AND physical dir — the in-memory catalog of a new
    session doesn't know tables a previous session left in the warehouse,
    so DROP TABLE alone can't clear an orphaned location."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, name), ignore_errors=True)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in the session's default warehouse (warehouse.dir
    # is a static conf — cannot be pointed at tmp_path after session start)
    li = load_table(spark, SF_SMALL, "lineitem")
    o = load_table(spark, SF_SMALL, "orders")
    for name, df, key in (
        ("b_lineitem", li, "l_orderkey"),
        ("b_orders", o, "o_orderkey"),
    ):
        _purge(spark, name)
        (
            df.write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "b_lineitem", "b_orders"
    for name in ("b_lineitem", "b_orders"):
        _purge(spark, name)


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    o = spark.table(o_t)
    # force SMJ so the test checks bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        p = _plan(spark, joined)
        assert "SortMergeJoin" in p
        # both sides read bucketed, and the ONLY exchange in the whole plan
        # is the post-join aggregation shuffle — the join itself is
        # shuffle-free because bucket layout == join partitioning
        assert p.count("Bucketed: true") == 2
        assert p.count("Exchange (") == 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_matches_plain(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    got = dict(
        spark.table(li_t)
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    li = load_table(spark, SF_SMALL, "lineitem")
    o = load_table(spark, SF_SMALL, "orders")
    want = dict(
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == want


def test_approx_aggregates_within_tolerance(spark):
    """approx_count_distinct (HLL) and percentile_approx land within the
    documented error bounds of their exact twins — the sketch tier for
    100 TB interactive profiling (no oracle: sketches are engine-specific
    by design, so this is a tolerance test, not a parity test)."""
    o = load_table(spark, SF_SMALL, "orders")
    row = o.agg(
        F.countDistinct("o_custkey").alias("exact_cd"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_cd"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_med"),
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("approx_med"),
    ).collect()[0]
    assert abs(row.approx_cd - row.exact_cd) / row.exact_cd < 0.05
    assert abs(row.approx_med - row.exact_med) / row.exact_med < 0.01
