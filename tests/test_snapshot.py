"""Incremental snapshot maintenance: the foreachBatch merge must converge
to the same state as the SCD2 window over the full log, across arbitrary
batch boundaries, with tombstone retention blocking late resurrections."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators.scd2_queries import scd2_latest_state
from cdc_streamming___v2_spark.sources.tables import load_table
from cdc_streamming___v2_spark.streaming.snapshot import SnapshotMaintainer

from .conftest import SF_SMALL


def _maintainer(spark, tmp_path) -> SnapshotMaintainer:
    return SnapshotMaintainer(
        spark=spark,
        path=str(tmp_path / "snap"),
        keys=("user_id",),
        order_col="ts",
        action_col="event_type",
        delete_actions=("error",),
        tiebreakers=("event_id",),
    )


def _expected(spark):
    return {
        r.user_id: (r.event_id, r.event_type)
        for r in scd2_latest_state(spark, SF_SMALL).collect()
    }


def test_two_batch_merge_converges(spark, tmp_path):
    e = load_table(spark, SF_SMALL, "events")
    snap = _maintainer(spark, tmp_path)
    split = "2024-01-15 00:00:00"
    snap.merge_batch(e.filter(F.col("ts") <= F.lit(split)))
    snap.merge_batch(e.filter(F.col("ts") > F.lit(split)))
    got = {r.user_id: (r.event_id, r.event_type) for r in snap.current().collect()}
    assert got == _expected(spark)


def test_many_batches_same_result(spark, tmp_path):
    e = load_table(spark, SF_SMALL, "events")
    snap = _maintainer(spark, tmp_path)
    for day in range(1, 32, 7):  # weekly chunks of January 2024
        lo = f"2024-01-{day:02d} 00:00:00"
        hi = (
            f"2024-01-{day + 7:02d} 00:00:00" if day + 7 <= 31
            else "2024-02-01 00:00:00"
        )
        chunk = e.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        if chunk.count():
            snap.merge_batch(chunk)
    got = {r.user_id: (r.event_id, r.event_type) for r in snap.current().collect()}
    assert got == _expected(spark)


def test_late_replay_does_not_regress(spark, tmp_path):
    e = load_table(spark, SF_SMALL, "events")
    snap = _maintainer(spark, tmp_path)
    snap.merge_batch(e)  # full log
    before = {r.user_id: r.event_id for r in snap.current().collect()}
    # replay an old prefix — nothing may change
    snap.merge_batch(e.filter(F.col("ts") <= F.lit("2024-01-10 00:00:00")))
    after = {r.user_id: r.event_id for r in snap.current().collect()}
    assert after == before


def test_streaming_attach(spark, tmp_path):
    e = load_table(spark, SF_SMALL, "events")
    in_dir = str(tmp_path / "in")
    e.orderBy("ts").coalesce(4).write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(e.schema).parquet(in_dir)
    snap = _maintainer(spark, tmp_path)
    q = snap.attach(stream, checkpoint_dir=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    got = {r.user_id: (r.event_id, r.event_type) for r in snap.current().collect()}
    assert got == _expected(spark)
