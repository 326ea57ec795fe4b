"""Invariants for the warehouse-maintenance ops (value parity vs the
oracles runs via tools/check_correctness.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import maintenance as MT
from cdc_streamming___v2_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_incremental_mv_equals_full_rescan(spark):
    """Merge(base_agg, delta_agg) == direct agg over the full log — the
    incremental-refresh algebra on the real testdata."""
    e = load_table(spark, SF_SMALL, "events")
    direct = {
        (r.user_id, r.event_type): (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in e.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .collect()
    }
    merged = {
        (r.user_id, r.event_type): (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in MT.incremental_agg_maintain(spark, SF_SMALL).collect()
    }
    assert merged == direct


def test_incremental_mv_one_sided_groups(spark):
    """Groups present only in base or only in delta must survive the
    full-outer merge with correct (not null-poisoned) aggregates."""
    df = MT.incremental_agg_maintain(spark, SF_SMALL)
    bad = df.filter(
        F.col("n_events").isNull()
        | F.col("sum_value").isNull()
        | F.col("min_value").isNull()
        | F.col("max_value").isNull()
        | (F.col("min_value") > F.col("max_value"))
        | (F.col("n_events") <= 0)
    ).count()
    assert bad == 0


def test_zorder_files_cover_small_rectangles(spark):
    """The point of Z-ordering: each file's (bx, by) extent is a small
    rectangle, far below the full 16x16 grid — so a filter on either
    dimension alone prunes most files."""
    rows = MT.zorder_layout(spark, SF_SMALL).collect()
    grid = (1 << MT.Z_BITS) ** 2
    assert rows  # non-empty layout
    worst = max(r.extent_cells for r in rows)
    # one file spans Z_CELLS_PER_FILE z-cells -> its rectangle is tiny;
    # allow slack for cell-boundary straddling but demand real locality
    assert worst <= grid // 8
    total = sum(r.n_rows for r in rows)
    n_orders = load_table(spark, SF_SMALL, "orders").count()
    assert total == n_orders  # every row assigned to exactly one file


def test_zorder_prunes_on_single_dimension(spark):
    """A custkey-range predicate touching 1/4 of the bx buckets must hit a
    strict subset of files (file skipping on min/max stats works)."""
    rows = MT.zorder_layout(spark, SF_SMALL).collect()
    hit = [r for r in rows if not (r.max_bx < 4 or r.min_bx > 7)]
    assert 0 < len(hit) < len(rows)


def test_oracle_coverage():
    assert set(MT.ORACLES) == set(MT.QUERIES)
