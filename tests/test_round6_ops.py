"""Round-6 operator tests: wave-AS stats ops (chow / mahalanobis / xyz /
BH-FDR) invariants + blanket plan audit.  Value parity vs DuckDB is the
oracle gate's job (tools/check_correctness.py); these tests pin semantic
invariants the hash can't see and the plan shapes that must survive a
100x scale-up."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_round6_ops_never_plan_cartesian(spark):
    """None of the round-6 ops may plan a CartesianProduct (1-row scalar
    broadcasts plan as BNLJ and are excluded, as in earlier audits)."""
    from cdc_streamming___v2_spark.operators import cdc_batch as CB
    from cdc_streamming___v2_spark.operators import stats_ext as SE

    for fn in (
        CB.sqlserver_cdc_roundtrip,
        SE.chow_break_test,
        SE.bh_fdr_brand_lift,
    ):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_chow_segments_partition_the_calendar(spark):
    from cdc_streamming___v2_spark.operators.stats_ext import chow_break_test
    from cdc_streamming___v2_spark.sources.tables import load_table

    row = chow_break_test(spark, SF_SMALL).collect()[0]
    n_days = (
        load_table(spark, SF_SMALL, "orders")
        .select("o_orderdate")
        .distinct()
        .count()
    )
    assert row["n_pre"] + row["n_post"] == n_days
    assert row["f_chow"] >= 0.0


def test_mahalanobis_counts_cover_all_buyers(spark):
    from cdc_streamming___v2_spark.operators.stats_ext import (
        mahalanobis_outliers_2d,
    )
    from cdc_streamming___v2_spark.sources.tables import load_table

    rows = mahalanobis_outliers_2d(spark, SF_SMALL).collect()
    n_buyers = (
        load_table(spark, SF_SMALL, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_buyers
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n_customers"]
        assert r["max_d2"] >= 0.0


def test_xyz_cv2_nonnegative_and_classes_consistent(spark):
    from cdc_streamming___v2_spark.operators.stats_ext import (
        xyz_classification,
    )

    for r in xyz_classification(spark, SF_SMALL).collect():
        assert r["xyz_class"] in ("X", "Y", "Z")
        # Cauchy-Schwarz: W*Sxx >= Sx^2, so CV^2 >= 0
        assert r["cv2"] >= 0.0
        if r["xyz_class"] == "X":
            assert r["cv2"] < 0.2500005
        elif r["xyz_class"] == "Y":
            assert r["cv2"] < 1.0000005


def test_bh_rejection_set_is_step_up_closed(spark):
    """BH is a step-up procedure: the rejected set must be exactly
    ranks 1..cutoff — no gaps — and p-values must be valid add-one
    permutation p's in [1/(B+1), 1]."""
    from cdc_streamming___v2_spark.operators.stats_ext import (
        BH_B,
        bh_fdr_brand_lift,
    )

    rows = bh_fdr_brand_lift(spark, SF_SMALL).collect()
    ranks = [r["bh_rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    rejected = [r["bh_rank"] for r in rows if r["rejected"]]
    assert rejected == list(range(1, len(rejected) + 1))
    for r in rows:
        # p_perm is rounded to 6dp, so allow half-ulp-of-grid slack
        assert 1 / (BH_B + 1) - 1e-6 <= r["p_perm"] <= 1.0 + 1e-6
        # monotone: p is a strictly increasing function of k_exceed
    ks = [r["k_exceed"] for r in rows]
    assert ks == sorted(ks)
