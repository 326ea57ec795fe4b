"""Semantic invariants for the causal-inference tier (causal) beyond
DuckDB-oracle parity: algebraic identities the estimators must satisfy on
any data."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import causal as C
from cdc_streamming___v2_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_did_interaction_identity(spark):
    r = C.did_estimate(spark, SF_SMALL).collect()[0]
    # cell counts partition the purchase stream
    n_purchases = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert (
        r["n_ctl_pre"] + r["n_ctl_post"] + r["n_trt_pre"] + r["n_trt_post"]
        == n_purchases
    )
    # the estimate is exactly the 2x2 interaction of the reported means
    expect = (r["trt_post_mean"] - r["trt_pre_mean"]) - (
        r["ctl_post_mean"] - r["ctl_pre_mean"]
    )
    assert abs(r["did_dollars"] - expect) < 1e-5  # rounding of the 4 means
    for col in ("ctl_pre_mean", "ctl_post_mean", "trt_pre_mean", "trt_post_mean"):
        assert r[col] > 0.0


def test_iv_wald_ratio_identity(spark):
    r = C.iv_wald_estimate(spark, SF_SMALL).collect()[0]
    n_users = load_table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    assert r["n_z1"] + r["n_z0"] == n_users
    assert 0.0 <= r["takeup_z1"] <= 1.0 and 0.0 <= r["takeup_z0"] <= 1.0
    assert abs(r["first_stage"] - (r["takeup_z1"] - r["takeup_z0"])) < 1e-5
    if r["first_stage"] != 0:
        assert r["wald_dollars"] is not None
        assert (
            abs(r["wald_dollars"] - r["reduced_form_dollars"] / r["first_stage"])
            < abs(r["wald_dollars"]) * 1e-2 + 1e-3
        )
    else:
        assert r["wald_dollars"] is None


def test_rdd_sides_and_jump(spark):
    r = C.rdd_estimate(spark, SF_SMALL).collect()[0]
    lo = C.RDD_CUTOFF_CENTS - C.RDD_BANDWIDTH_CENTS
    hi = C.RDD_CUTOFF_CENTS + C.RDD_BANDWIDTH_CENTS
    cust = load_table(spark, SF_SMALL, "customer").select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("score")
    )
    n_left = cust.filter(
        (F.col("score") >= lo) & (F.col("score") < C.RDD_CUTOFF_CENTS)
    ).count()
    n_right = cust.filter(
        (F.col("score") >= C.RDD_CUTOFF_CENTS) & (F.col("score") < hi)
    ).count()
    assert r["n_left"] == n_left and r["n_right"] == n_right
    assert math.isfinite(r["slope_left"]) and math.isfinite(r["slope_right"])
    assert (
        abs(
            r["rdd_jump_dollars"]
            - (r["intercept_right_dollars"] - r["intercept_left_dollars"])
        )
        < 1e-5
    )


def test_psm_matching_properties(spark):
    r = C.psm_caliper_att(spark, SF_SMALL).collect()[0]
    n_treated = (
        load_table(spark, SF_SMALL, "customer")
        .filter(F.col("c_mktsegment") == C.PSM_TREATED_SEGMENT)
        .count()
    )
    assert r["n_treated"] == n_treated
    assert 0 <= r["n_matched"] <= r["n_treated"]
    assert abs(r["match_rate"] - r["n_matched"] / r["n_treated"]) < 1e-6
    # every match respects the caliper, so the mean gap must too
    assert 0.0 <= r["avg_score_gap_cents"] <= C.PSM_CALIPER_CENTS
    assert math.isfinite(r["att_dollars"])


# --- model-validation wave (ml_eval) ---------------------------------------


def test_kfold_folds_partition_orders(spark):
    from cdc_streamming___v2_spark.operators import ml_eval as ME

    rows = ME.kfold_cv_rmse(spark, SF_SMALL).collect()
    assert len(rows) == ME.CV_FOLDS
    assert sorted(r["fold"] for r in rows) == list(range(ME.CV_FOLDS))
    n_orders = load_table(spark, SF_SMALL, "orders").count()
    assert sum(r["n_test"] for r in rows) == n_orders
    for r in rows:
        assert r["rmse_dollars"] > 0.0 and math.isfinite(r["rmse_dollars"])


def test_conformal_coverage_near_nominal(spark):
    from cdc_streamming___v2_spark.operators import ml_eval as ME

    rows = ME.conformal_interval_coverage(spark, SF_SMALL).collect()
    types = {r["event_type"] for r in rows}
    assert len(types) == 5
    for r in rows:
        assert r["q_dollars"] >= 0.0
        assert 0.0 <= r["coverage"] <= 1.0
        # split-conformal guarantee: coverage >= 0.9 in expectation; with
        # finite exchangeable samples the deviation is O(1/sqrt(n_test)) —
        # allow a generous band
        assert r["coverage"] >= 0.9 - 3.0 / math.sqrt(max(r["n_test"], 1))
        # the splitter must put roughly half the rows in train (2 of 4
        # buckets), a quarter each in calib/test
        total = r["n_train"] + r["n_calib"] + r["n_test"]
        assert r["n_train"] > 0.3 * total


def test_recsys_eval_bounds(spark):
    from cdc_streamming___v2_spark.operators import ml_eval as ME

    r = ME.recsys_eval_cf(spark, SF_SMALL).collect()[0]
    assert 0 <= r["n_hits"] <= r["n_scored"] <= r["n_test_items"]
    assert 0.0 <= r["hit_rate_at1"] <= 1.0
    assert 0.0 <= r["scoring_coverage"] <= 1.0
    assert 0.0 < r["catalog_coverage"] <= 1.0


# --- sequence / risk / operations waves -------------------------------------


def test_sequential_patterns_topk(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    rows = B.sequential_patterns(spark, SF_SMALL).collect()
    assert len(rows) == B.SEQ_PATTERN_TOPN
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(0.0 < r["support"] <= 1.0 for r in rows)
    types = {"click", "view", "purchase", "signup", "error"}
    for r in rows:
        assert {r["t1"], r["t2"], r["t3"]} <= types


def test_transition_entropy_bounds(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    rows = B.transition_entropy_rate(spark, SF_SMALL).collect()
    per = [r for r in rows if r["state"] != "__ALL__"]
    rate = [r for r in rows if r["state"] == "__ALL__"][0]
    k = len(per)
    for r in per:
        # entropy of a k-ary distribution is within [0, log2 k]
        assert 0.0 <= r["h_bits"] <= math.log2(k) + 1e-9
    # the rate is a convex combination of the per-state entropies
    assert min(r["h_bits"] for r in per) - 1e-6 <= rate["h_bits"]
    assert rate["h_bits"] <= max(r["h_bits"] for r in per) + 1e-6
    assert rate["n_transitions"] == sum(r["n_transitions"] for r in per)


def test_woe_iv_identity(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.woe_iv_binning(spark, SF_SMALL).collect()
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert sum(r["n_good"] + r["n_bad"] for r in rows) == n_events
    iv_totals = {r["iv_total"] for r in rows}
    assert len(iv_totals) == 1
    total = iv_totals.pop()
    assert total >= 0.0
    assert abs(total - sum(r["iv_term"] for r in rows)) < 1e-4
    for r in rows:
        assert r["iv_term"] >= 0.0  # (a-b)*ln(a/b) is never negative


def test_control_chart_rules(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.control_chart_days(spark, SF_SMALL).collect()
    assert len(rows) == 30  # the events window spans 30 days
    for r in rows:
        assert math.isfinite(r["z_score"])
        # rule1 (3 sigma) implies the z magnitude shows it
        if r["rule1_beyond_3sigma"]:
            assert abs(r["z_score"]) > 3.0 - 1e-4
    # z-scores against the population sigma must standardize: mean ~ 0
    zs = [r["z_score"] for r in rows]
    assert abs(sum(zs) / len(zs)) < 0.01


def test_littles_law_interior_consistency(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.littles_law_audit(spark, SF_SMALL).collect()
    assert all(r["l_avg_open"] >= 0.0 for r in rows)
    arr = [r for r in rows if r["n_arrivals"] > 0]
    assert arr
    for r in arr:
        assert r["w_days"] >= 1.0  # residence includes the arrival day
        assert r["littles_ratio"] is None or r["littles_ratio"] >= 0.0


def test_newsvendor_service_at_least_nominal(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.newsvendor_stock_level(spark, SF_SMALL).collect()
    assert len(rows) == 25  # 25 brands
    for r in rows:
        assert r["stock_level"] > 0
        # the ceil-rank order statistic guarantees >= 90% coverage
        assert r["service_level"] >= 0.9 - 1e-9
        assert r["service_level"] <= 1.0


# --- robust-fit / design / drift wave ---------------------------------------


def test_psm_strata_ate_bounds(spark):
    r = C.psm_strata_ate(spark, SF_SMALL).collect()[0]
    n_cust = load_table(spark, SF_SMALL, "customer").count()
    assert 1 <= r["n_strata_used"] <= C.ATE_STRATA
    assert 0 < r["n_common_support"] <= n_cust
    assert 0 < r["n_treated_kept"] <= r["n_common_support"]
    assert math.isfinite(r["ate_dollars"]) and math.isfinite(r["att_dollars"])


def test_ransac_consensus(spark):
    from cdc_streamming___v2_spark.operators import ml_ops as ML

    r = ML.ransac_spend_fit(spark, SF_SMALL).collect()[0]
    n_cust = load_table(spark, SF_SMALL, "customer").count()
    assert 0 <= r["candidate"] < ML.RANSAC_CANDIDATES
    assert 1 <= r["n_inliers"] <= n_cust
    # consensus must beat the minimal set: the best of 32 candidates
    # covers a nontrivial share of the dimension frame
    assert r["n_inliers"] >= max(2, n_cust * 0.1)
    assert math.isfinite(r["refit_slope"])


def test_power_analysis_monotonicity(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SX

    rows = SX.ab_power_analysis(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 < r["p_baseline"] <= 1.0
        assert r["p_target"] >= r["p_baseline"]
        if r["p_target"] > r["p_baseline"]:
            assert r["n_per_arm"] > 0
    # a smaller baseline-to-target gap needs MORE samples: verify the
    # classic inverse-square law ordering across types by effect size
    sized = [
        (abs(r["p_target"] - r["p_baseline"]), r["n_per_arm"])
        for r in rows
        if r["n_per_arm"] is not None
    ]
    sized.sort()
    gaps = [g for g, _ in sized]
    if len(set(gaps)) == len(gaps):
        ns = [n for _, n in sized]
        assert ns == sorted(ns, reverse=True)


def test_page_hinkley_shape(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SX

    rows = SX.page_hinkley_drift(spark, SF_SMALL).collect()
    assert len(rows) == 30
    # PH at the first day is x_1 - mean_1 - delta = -delta (running mean
    # equals the first value)
    assert abs(rows[0]["ph_stat_dollars"] + SX.PH_DELTA_CENTS / 100.0) < 1e-6
    assert not rows[0]["drift_alarm"]


# --- modularity / allocation / bandit wave ----------------------------------


def test_modularity_identities(spark):
    from cdc_streamming___v2_spark.operators import graph as G

    rows = G.community_modularity(spark, SF_SMALL).collect()
    assert rows
    # degree sums over communities = 2m (handshake lemma)
    two_m = sum(r["degree_sum"] for r in rows)
    e_within = sum(r["e_within"] for r in rows)
    assert e_within <= two_m // 2
    mods = {r["modularity"] for r in rows}
    assert len(mods) == 1
    total = mods.pop()
    assert abs(total - sum(r["q_term"] for r in rows)) < 1e-4
    assert -0.5 - 1e-9 <= total <= 1.0  # Newman's bounds


def test_neyman_allocation_sums_to_budget(spark):
    from cdc_streamming___v2_spark.operators import pipeline_ops as P

    rows = P.neyman_allocation(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["sigma_dollars"] > 0.0
        assert 0 <= r["neyman_n"] <= P.NEYMAN_BUDGET
    # floor(x+0.5) rounding keeps both allocations within |strata| of the
    # budget
    assert abs(sum(r["neyman_n"] for r in rows) - P.NEYMAN_BUDGET) <= 5
    assert abs(sum(r["proportional_n"] for r in rows) - P.NEYMAN_BUDGET) <= 5


def test_bandit_replay_regret_monotone_vs_best(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    rows = B.bandit_replay_greedy(spark, SF_SMALL).collect()
    assert len(rows) == 30
    best_arms = {r["best_arm"] for r in rows}
    assert len(best_arms) == 1  # best-in-hindsight is one fixed arm
    # on days where the policy plays the best arm, regret must not grow
    prev = 0.0
    for r in rows:
        if r["chosen_arm"] == r["best_arm"]:
            assert abs(r["cum_regret_dollars"] - prev) < 1e-9
        prev = r["cum_regret_dollars"]


def test_logistic_newton_reaches_mle(spark):
    """At the returned beta the log-likelihood gradient must be ~0 (MLE
    first-order condition), verified independently in numpy."""
    from cdc_streamming___v2_spark.operators import ml_ops as ML

    r = ML.logistic_newton_fit(spark, SF_SMALL).collect()[0]
    grid = (
        load_table(spark, SF_SMALL, "events")
        .selectExpr(
            "cast(round(value * 100) as long) as cv",
            "cast(event_type = 'error' as int) as bad",
        )
        .groupBy("cv")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("bad").alias("k"))
        .collect()
    )
    import numpy as np

    x = np.array([g["cv"] for g in grid]) / ML.LOGIT_X_SCALE
    n = np.array([g["n"] for g in grid], dtype=float)
    k = np.array([g["k"] for g in grid], dtype=float)
    p = 1.0 / (1.0 + np.exp(-(r["beta0"] + r["beta1"] * x)))
    g0 = float(np.sum(k - n * p))
    g1 = float(np.sum((k - n * p) * x))
    assert abs(g0) < 1e-2 and abs(g1) < 1e-2
    # the intercept-only prediction must sit near the base rate
    assert abs(r["p_at_zero_value"] - r["n_bad"] / r["n_events"]) < 0.25


def test_adaboost_weak_learning_progression(spark):
    from cdc_streamming___v2_spark.operators import ml_ops as ML

    r = ML.adaboost_stumps(spark, SF_SMALL).collect()[0]
    # weak-learner guarantee: each selected stump beats (or ties) chance
    # on its own weight distribution
    assert r["err1"] <= 0.5 + 1e-9
    assert r["err2"] <= 0.5 + 1e-9
    assert r["pol1"] in (-1, 1) and r["pol2"] in (-1, 1)
    # alphas are the ln-odds of the errors — signs must agree with err<0.5
    if r["err1"] < 0.5:
        assert r["alpha1"] > 0
    if r["err2"] < 0.5:
        assert r["alpha2"] > 0
    # the boosted vote cannot be worse than majority class by much: the
    # ensemble predicts at least one cell right
    assert 0.0 < r["train_accuracy"] <= 1.0


def test_cox_beta_matches_score_zero(spark):
    """The returned beta must zero the partial-likelihood score, verified
    by an independent numpy Breslow computation on the duration frame."""
    from cdc_streamming___v2_spark.operators import stats_ext as SX
    import numpy as np

    r = SX.cox_ph_fit(spark, SF_SMALL).collect()[0]
    assert r["n0"] + r["n1"] > 0
    assert r["hazard_ratio"] > 0.0
    assert abs(r["hazard_ratio"] - math.exp(r["beta"])) < 1e-4
    # rebuild the duration frame and check U(beta) ~ 0
    e = load_table(spark, SF_SMALL, "events")
    su = {
        row["user_id"]: row["s"]
        for row in e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s"))
        .collect()
    }
    import collections

    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h")).collect()[0]["h"]
    first_p = {}
    for row in (
        e.filter(F.col("event_type") == "purchase").select("user_id", "ts").collect()
    ):
        uid = row["user_id"]
        if uid in su and row["ts"] > su[uid]:
            if uid not in first_p or row["ts"] < first_p[uid]:
                first_p[uid] = row["ts"]
    day = collections.defaultdict(lambda: [0, 0, 0, 0])  # x0 x1 d0 d1
    for uid, s_ts in su.items():
        grp = uid % 2
        if uid in first_p:
            dur = (first_p[uid].date() - s_ts.date()).days
            obs = 1
        else:
            dur = (horizon - s_ts.date()).days
            obs = 0
        rec = day[dur]
        rec[grp] += 1
        rec[2 + grp] += obs
    durs = sorted(day)
    x0 = np.array([day[d][0] for d in durs], dtype=float)
    x1 = np.array([day[d][1] for d in durs], dtype=float)
    d0 = np.array([day[d][2] for d in durs], dtype=float)
    d1 = np.array([day[d][3] for d in durs], dtype=float)
    n0r = x0[::-1].cumsum()[::-1]
    n1r = x1[::-1].cumsum()[::-1]
    rr = math.exp(r["beta"])
    den = n0r + n1r * rr
    u = float(np.sum(d1 - (d0 + d1) * (n1r * rr / den)))
    assert abs(u) < 1e-2


def test_shapley_efficiency_property(spark):
    """The three Shapley values must sum to v(full set) - v(empty set)
    (efficiency axiom), reconstructed from the subset conversion rates."""
    from cdc_streamming___v2_spark.operators import behavior as B

    rows = B.shapley_attribution(spark, SF_SMALL).collect()
    assert len(rows) == 3
    per_user = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("c"),
            F.max((F.col("event_type") == "view").cast("int")).alias("v"),
            F.max((F.col("event_type") == "signup").cast("int")).alias("s"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
        )
        .collect()
    )
    import collections

    agg = collections.defaultdict(lambda: [0, 0])
    for u in per_user:
        sub = u["c"] + 2 * u["v"] + 4 * u["s"]
        agg[sub][0] += 1
        agg[sub][1] += u["conv"]
    v7 = agg[7][1] / agg[7][0] if agg.get(7) and agg[7][0] else 0.0
    v0 = agg[0][1] / agg[0][0] if agg.get(0) and agg[0][0] else 0.0
    total = sum(r["shapley_value"] for r in rows)
    assert abs(total - (v7 - v0)) < 1e-4


# --- experimentation-metrics wave -------------------------------------------


def test_cuped_reduction_in_bounds(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.cuped_variance_reduction(spark, SF_SMALL).collect()[0]
    assert r["n_users"] > 0
    assert r["var_y_dollars2"] > 0.0
    # CUPED with the OLS theta can only reduce variance (theta is the
    # minimizer): 0 <= var_cuped <= var_y
    assert 0.0 <= r["var_cuped_dollars2"] <= r["var_y_dollars2"] + 1e-9
    assert 0.0 <= r["reduction_pct"] <= 100.0


def test_qini_ends_at_overall_uplift(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.qini_uplift_curve(spark, SF_SMALL).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    last = rows[-1]
    nt = sum(r["n_treated"] for r in rows)
    nc = sum(r["n_control"] for r in rows)
    ct = sum(r["conv_treated"] for r in rows)
    cc = sum(r["conv_control"] for r in rows)
    expect = ct - cc * (nt / nc)
    assert abs(last["qini_cum"] - expect) < 1e-3


def test_sprt_llr_additivity(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.sprt_replay(spark, SF_SMALL).collect()
    assert len(rows) == 15  # days 16-30
    for r in rows:
        assert r["decision"] in ("accept_h1", "accept_h0", "continue")
    # cumulative LLR is monotone in the day fold only if daily terms keep
    # one sign; at minimum the sequence must be finite and consistent with
    # the decision thresholds
    for r in rows:
        if r["decision"] == "accept_h1":
            assert r["cum_llr"] >= A.SPRT_ALPHA_LN_UPPER - 1e-9
        if r["decision"] == "accept_h0":
            assert r["cum_llr"] <= A.SPRT_LN_LOWER + 1e-9


def test_poisson_rate_partition(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.poisson_rate_model(spark, SF_SMALL).collect()[0]
    assert r["days_weekday"] + r["days_weekend"] == 30
    assert r["days_weekend"] == 8  # Jan 2024: 4 Saturdays + 4 Sundays
    assert abs(
        r["log_rate_ratio"] - math.log(r["rate_weekend"] / r["rate_weekday"])
    ) < 1e-3
    assert r["lrr_ci_lo"] <= r["log_rate_ratio"] <= r["lrr_ci_hi"]


# --- resampling / shrinkage / mixture wave ----------------------------------


def test_jackknife_brackets_mean(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SX

    r = SX.jackknife_ci(spark, SF_SMALL).collect()[0]
    assert r["n_groups"] == SX.JK_GROUPS
    assert r["jackknife_se"] > 0.0
    assert r["ci_lo"] < r["mean_dollars"] < r["ci_hi"]
    # CI is symmetric by construction
    assert abs((r["ci_hi"] - r["mean_dollars"]) - (r["mean_dollars"] - r["ci_lo"])) < 1e-4


def test_james_stein_contracts_toward_grand_mean(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SX

    rows = SX.james_stein_shrinkage(spark, SF_SMALL).collect()
    assert len(rows) == 25
    cs = {r["shrink_factor"] for r in rows}
    assert len(cs) == 1
    c = cs.pop()
    assert 0.0 <= c <= 1.0
    # exact identity: shrunk = grand + c * (raw - grand) with the
    # item-weighted grand mean
    n_tot = sum(r["n_items"] for r in rows)
    grand = sum(r["raw_mean_dollars"] * r["n_items"] for r in rows) / n_tot
    for r in rows:
        expect = grand + c * (r["raw_mean_dollars"] - grand)
        assert abs(r["shrunk_mean_dollars"] - expect) < 0.02


def test_poisson_mixture_sane(spark):
    from cdc_streamming___v2_spark.operators import ml_ops as ML

    r = ML.poisson_mixture_em(spark, SF_SMALL).collect()[0]
    assert r["n_days"] == 30
    assert 0.0 < r["pi_low"] < 1.0
    assert 0.0 < r["lambda_low"] <= r["lambda_high"]  # init order preserved


# --- reporting closers ------------------------------------------------------


def test_revenue_waterfall_reconciles(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.revenue_waterfall(spark, SF_SMALL).collect()
    assert len(rows) == 25
    li = load_table(spark, SF_SMALL, "lineitem").count()
    assert sum(r["n_items"] for r in rows) == li
    for r in rows:
        assert abs(r["net_dollars"] - (r["gross_dollars"] - r["discount_dollars"])) < 0.02
        assert abs(r["charge_dollars"] - (r["net_dollars"] + r["tax_dollars"])) < 0.02
        assert 0.0 <= r["discount_dollars"] <= r["gross_dollars"] * 0.11


def test_boxplot_quartile_order_and_outliers(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.boxplot_stats(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["q1_dollars"] <= r["median_dollars"] <= r["q3_dollars"]
        # outliers are a minority by Tukey's construction on any unimodal data
        assert r["n_low_outliers"] + r["n_high_outliers"] < r["n"] / 2


def test_weekday_index_averages_to_one(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.weekday_seasonal_index(spark, SF_SMALL).collect()
    assert [r["dow"] for r in rows] == list(range(1, 8))
    assert sum(r["n_days"] for r in rows) == 30
    # day-weighted mean of the index is exactly 1
    num = sum(r["seasonal_index"] * r["n_days"] for r in rows)
    assert abs(num / 30 - 1.0) < 1e-3


# --- inequality wave (AA) ---------------------------------------------------


def test_lorenz_curve_shape(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.lorenz_deciles(spark, SF_SMALL).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # cumulative share is monotone, ends at 1, and sits under the diagonal
    cums = [r["cum_share"] for r in rows]
    assert all(b >= a for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-6
    for i, c in enumerate(cums[:-1], start=1):
        assert c <= i / 10 + 1e-6  # Lorenz curve never above equality line
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-4


def test_inequality_indices_bounds(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    for r in A.theil_inequality(spark, SF_SMALL).collect():
        assert r["theil_t"] >= 0.0  # Jensen: T >= 0, = 0 iff equal
    for r in A.atkinson_index(spark, SF_SMALL).collect():
        assert 0.0 <= r["atkinson_e1"] < 1.0  # AM-GM: geomean <= mean


# --- bridge / association / lead-lag wave (AB) ------------------------------


def test_price_volume_bridge_reconciles(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.price_volume_bridge(spark, SF_SMALL).collect()
    assert len(rows) == 25  # every TPC-H brand present in both years
    for r in rows:
        assert r["qty_y0"] > 0 and r["qty_y1"] > 0
        # the two effects reconcile to the delta exactly (by construction,
        # up to the two 2-dp roundings)
        assert abs(
            r["price_effect_dollars"] + r["volume_effect_dollars"] - r["delta_dollars"]
        ) < 0.03


def test_kendall_tau_bounds(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.kendall_tau_pairs(spark, SF_SMALL).collect()
    assert len(rows) == 10  # C(5 event types, 2)
    for r in rows:
        assert r["n_day_pairs"] == 435  # C(30 shared days, 2)
        assert r["concordant"] + r["discordant"] <= r["n_day_pairs"]
        assert -1.0 <= r["tau_b"] <= 1.0


def test_xcorr_window_alignment(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.xcorr_leadlag(spark, SF_SMALL).collect()
    assert [r["lag"] for r in rows] == list(range(-3, 4))
    by_lag = {r["lag"]: r for r in rows}
    assert by_lag[0]["n_days"] == 30  # full overlap at lag 0
    for r in rows:
        assert r["n_days"] >= 30 - 3
        assert r["pearson_r"] is None or -1.0 <= r["pearson_r"] <= 1.0


# --- technical-indicator wave (AC) ------------------------------------------


def test_sma_crossovers_alternate(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.sma_crossover_days(spark, SF_SMALL).collect()
    dirs = [r["direction"] for r in rows]
    # state flips must strictly alternate by construction
    for a, b in zip(dirs, dirs[1:]):
        assert a != b
    for r in rows:
        assert r["sma_fast_dollars"] > 0 and r["sma_slow_dollars"] > 0


def test_rsi_bounds_and_year(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.cutler_rsi(spark, SF_SMALL).collect()
    # one row per 1997 day PRESENT in the (possibly sparse at tiny SF)
    # order calendar -- windows are row-based over observed days
    expect = (
        load_table(spark, SF_SMALL, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .select("o_orderdate").distinct().count()
    )
    assert len(rows) == expect
    for r in rows:
        assert r["rsi14"] is None or 0.0 <= r["rsi14"] <= 100.0


def test_bollinger_breaks_are_tail_events(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    daily_days = (
        load_table(spark, SF_SMALL, "orders")
        .select("o_orderdate").distinct().count()
    )
    rows = A.bollinger_band_breaks(spark, SF_SMALL).collect()
    # 2-sigma breakouts are tail events: well under a quarter of all days
    assert 0 < len(rows) < daily_days / 4
    assert all(r["band"] in ("high", "low") for r in rows)


# --- autoregressive / lead-lag wave (AD) ------------------------------------


def test_ar2_stationarity_and_fit(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.ar2_forecast(spark, SF_SMALL).collect()[0]
    # AR(2) stationarity triangle for a fitted stationary revenue series
    assert abs(r["phi2"]) < 1.0
    assert r["phi1"] + r["phi2"] < 1.0 and r["phi2"] - r["phi1"] < 1.0
    assert 0.0 <= r["r2"] <= 1.0
    assert r["forecast_next_dollars"] > 0


def test_granger_f_nonnegative(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.granger_leadlag(spark, SF_SMALL).collect()[0]
    assert r["n_days"] == 29  # 30 shared days minus one lag row
    assert r["f_cross_term"] >= 0.0  # SSE_r >= SSE_u always
    assert 0.0 <= r["r2_unrestricted"] <= 1.0


# --- regression/diagnostics wave (AE) ---------------------------------------


def test_ridge_shrinks_coefficient_norm(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.ridge_two_feature(spark, SF_SMALL).collect()[0]
    norm_r = r["ridge_beta_qty_cents"] ** 2 + r["ridge_beta_disc_bp_cents"] ** 2
    norm_o = r["ols_beta_qty_cents"] ** 2 + r["ols_beta_disc_bp_cents"] ** 2
    # ridge strictly shrinks the coefficient l2 norm for lambda > 0
    assert norm_r <= norm_o + 1e-9


def test_pacf_lag1_equals_acf1(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    acf = {r["event_type"]: r for r in A.acf_daily_revenue(spark, SF_SMALL).collect()}
    for r in A.pacf_daily_revenue(spark, SF_SMALL).collect():
        # Durbin-Levinson level 1: pacf(1) == acf(1) by definition
        assert abs(r["pacf1"] - acf[r["event_type"]]["acf1"]) < 1e-3
        assert abs(r["pacf2"]) <= 1.0 and abs(r["pacf3"]) <= 1.0


def test_negbin_moments_consistent(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    for r in A.negbin_overdispersion(spark, SF_SMALL).collect():
        assert r["n_days"] == 30
        assert abs(r["dispersion_index"] - r["var_daily"] / r["mean_daily"]) < 1e-2
        if r["nb_r"] is not None:
            assert r["nb_r"] > 0 and 0.0 < r["nb_p"] < 1.0
            # NB mean identity: m = r * (1 - p) / p
            m = r["nb_r"] * (1 - r["nb_p"]) / r["nb_p"]
            assert abs(m - r["mean_daily"]) / r["mean_daily"] < 0.02


def test_durbin_watson_range(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.durbin_watson_trend(spark, SF_SMALL).collect()[0]
    assert 0.0 <= r["dw_stat"] <= 4.0
    assert abs(r["rho_hat"] - (1.0 - r["dw_stat"] / 2.0)) < 1e-6


# --- ops/finance + estimator-audit wave (AF) --------------------------------


def test_eoq_policy_positive_and_monotone_in_demand(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.eoq_reorder_policy(spark, SF_SMALL).collect()
    assert len(rows) == 25
    # EOQ = sqrt(2*D*S/H) must order exactly like annual demand
    by_d = sorted(rows, key=lambda r: r["annual_demand_units"])
    by_e = sorted(rows, key=lambda r: r["eoq_units"])
    assert [r["p_brand"] for r in by_d] == [r["p_brand"] for r in by_e]
    for r in rows:
        assert r["reorder_point_units"] > 0


def test_cagr_reproduces_endpoints(spark):
    import math

    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.cagr_brand_revenue(spark, SF_SMALL).collect()
    assert len(rows) == 25
    for r in rows:
        # compounding the reported rate over the span recovers the ratio
        grown = r["rev_y0_dollars"] * (1 + r["cagr"]) ** 4
        assert abs(grown - r["rev_y1_dollars"]) / r["rev_y1_dollars"] < 1e-3


def test_minhash_calibration_is_probabilistically_sane(spark):
    from cdc_streamming___v2_spark.operators import dedup as D

    rows = D.minhash_estimator_calibration(spark, SF_SMALL).collect()
    assert rows, "banded candidates must exist"
    for r in rows:
        assert 0 <= r["jaccard_decile"] <= 10
        assert 0.0 <= r["mean_minhash_est"] <= 1.0
        assert r["mae"] >= abs(r["bias"]) - 1e-9  # MAE dominates |bias|


# --- textrank + permutation wave (AG) ----------------------------------------


def test_textrank_scores_positive_and_ranked(spark):
    from cdc_streamming___v2_spark.operators import corpus_ops as CO

    rows = CO.textrank_keywords(spark, SF_SMALL).collect()
    assert len(rows) == 20
    assert [r["rank"] for r in rows] == list(range(1, 21))
    scores = [r["score"] for r in rows]
    assert all(b <= a for a, b in zip(scores, scores[1:]))  # descending
    # damped iteration keeps every score >= (1-d) = 0.15
    assert all(s >= 0.15 for s in scores)
    assert all(r["n_neighbors"] > 0 for r in rows)


def test_permutation_test_null_calibrated(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.permutation_test_lift(spark, SF_SMALL).collect()[0]
    assert r["n_perms"] == 64
    assert 0 <= r["n_extreme"] <= 64
    assert 0.0 < r["p_value"] <= 1.0
    # even/odd user split is a true A/A: the test must NOT reject at 1%
    assert r["p_value"] > 0.01


# --- distribution-fit + price-index wave (AH) --------------------------------


def test_weibull_recovers_near_exponential(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SE

    rows = SE.weibull_gap_fit(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        # synthetic arrivals are near-Poisson: shape must sit near 1 and
        # the probability plot must be close to linear
        assert 0.5 < r["shape_k"] < 1.5
        assert r["fit_r2"] > 0.9
        assert r["scale_s"] > 0


def test_beta_fit_moment_identity(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SE

    rows = SE.beta_fit_discount(spark, SF_SMALL).collect()
    assert len(rows) == 25
    for r in rows:
        if r["beta_alpha"] is None:
            continue
        a, b = r["beta_alpha"], r["beta_beta"]
        # Beta mean identity: a/(a+b) == sample mean
        assert abs(a / (a + b) - r["mean_scaled"]) < 1e-2


def test_fisher_between_laspeyres_and_paasche(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.price_index_fisher(spark, SF_SMALL).collect()[0]
    assert r["n_parts_matched"] > 0
    lo = min(r["laspeyres"], r["paasche"])
    hi = max(r["laspeyres"], r["paasche"])
    # geometric mean lies between its factors
    assert lo - 1e-9 <= r["fisher"] <= hi + 1e-9


def test_theil_decomposition_additive(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.theil_decomposition(spark, SF_SMALL).collect()[0]
    assert r["n_segments"] == 5
    assert r["theil_total"] >= 0 and r["theil_between"] >= 0
    # the decomposition is exact up to the pico-grid folds
    assert abs(r["additivity_gap"]) < 1e-6
    assert abs(
        r["theil_total"] - r["theil_between"] - r["theil_within"]
    ) < 1e-6


# --- exact distributional distances wave (AJ) --------------------------------


def test_energy_distance_nonnegative_and_cross_dominates(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SE

    rows = SE.energy_distance_pairs(spark, SF_SMALL).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["energy_dist_sq"] >= -1e-9  # D^2 >= 0 always
        assert r["e_cross_dollars"] > 0


def test_cvm_positive_and_bounded(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SE

    rows = SE.cramer_von_mises_pairs(spark, SF_SMALL).collect()
    assert len(rows) == 10
    for r in rows:
        # T is positive and bounded by N/3-ish; same-family synthetic
        # distributions must not produce a huge statistic
        assert 0.0 < r["cvm_t"] < (r["n_a"] + r["n_b"]) / 3.0


# --- Markov removal attribution (AK) -----------------------------------------


def test_markov_removal_shares_partition_unity(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    rows = B.markov_removal_attribution(spark, SF_SMALL).collect()
    assert len(rows) == 4  # every non-absorbing channel
    assert abs(sum(r["attribution_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        # removing a channel can only hurt conversion
        assert 0.0 <= r["p_removed"] <= r["p_full"] + 1e-9
        assert 0.0 <= r["removal_effect"] <= 1.0


# --- dominance / peaks / aging wave (AL) --------------------------------------


def test_dominance_sup_gaps_consistent_with_verdict(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SE

    rows = SE.stochastic_dominance_pairs(spark, SF_SMALL).collect()
    assert len(rows) == 10
    for r in rows:
        if r["fosd"] == "a_dominates":
            assert r["sup_a_above_b"] == 0.0
        elif r["fosd"] == "b_dominates":
            assert r["sup_b_above_a"] == 0.0
        else:
            assert r["sup_a_above_b"] > 0 and r["sup_b_above_a"] > 0


def test_revenue_peaks_are_strict_local_maxima(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    daily = {
        r["day"]: r["x"]
        for r in A._daily_order_revenue(spark, SF_SMALL).collect()
    }
    days = sorted(daily)
    idx = {d: i for i, d in enumerate(days)}
    peaks = A.revenue_peaks(spark, SF_SMALL).collect()
    assert peaks
    for r in peaks:
        i = idx[r["day"]]
        neigh = days[i - 3 : i] + days[i + 1 : i + 4]
        assert all(daily[r["day"]] > daily[d] for d in neigh)


def test_aging_buckets_partition_open_items(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.receivables_aging(spark, SF_SMALL).collect()
    total = sum(r["n_open_items"] for r in rows)
    expect = (
        load_table(spark, SF_SMALL, "lineitem")
        .filter(F.col("l_linestatus") == "O")
        .join(
            load_table(spark, SF_SMALL, "orders").filter(
                F.col("o_orderdate") < F.lit(A.AGING_ASOF).cast("date")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert total == expect
    assert all(r["outstanding_dollars"] > 0 for r in rows)


# --- stratified association + decay wave (AM) ---------------------------------


def test_cmh_odds_near_unity_for_aa_split(spark):
    from cdc_streamming___v2_spark.operators import stats_ext as SE

    r = SE.cmh_pooled_odds(spark, SF_SMALL).collect()[0]
    assert r["n_strata"] == 30
    # even/odd user id is a true A/A split: pooled odds must sit near 1
    assert 0.5 < r["or_mh"] < 2.0


def test_decay_score_bounded_by_raw(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.decayed_engagement_score(spark, SF_SMALL).collect()
    # tiny SF maps few users onto the segment space; all 5 only at scale
    assert 1 <= len(rows) <= 5
    for r in rows:
        assert 0.0 < r["decayed_dollars"] <= r["raw_dollars"]
        # 30-day window at 0.95/day: ratio must land in (0.95^31, 1)
        assert 0.95 ** 31 < r["recency_ratio"] < 1.0


# --- hot-streak + migration wave (AN) -----------------------------------------


def test_best_run_is_actually_best(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.best_revenue_run(spark, SF_SMALL).collect()[0]
    assert r["start_day"] <= r["end_day"]
    assert r["excess_dollars"] > 0
    # brute-force check on the exact daily integers
    daily = sorted(
        (row["day"], int(row["x"]))
        for row in A._daily_order_revenue(spark, SF_SMALL).collect()
    )
    xs = [x for _, x in daily]
    n, s = len(xs), sum(xs)
    ys = [n * x - s for x in xs]
    best, cur = 0, 0
    for y in ys:
        cur = max(y, cur + y)
        best = max(best, cur)
    got = [i for i, (d, _) in enumerate(daily) if d == r["start_day"]][0]
    end = [i for i, (d, _) in enumerate(daily) if d == r["end_day"]][0]
    assert sum(ys[got : end + 1]) == best  # the reported run attains Kadane


def test_migration_matrix_rows_are_distributions(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.segment_migration_matrix(spark, SF_SMALL).collect()
    from collections import defaultdict

    by_from = defaultdict(float)
    for r in rows:
        assert 1 <= r["tier_from"] <= 3 and 1 <= r["tier_to"] <= 3
        by_from[r["tier_from"]] += r["row_share"]
    for v in by_from.values():
        assert abs(v - 1.0) < 1e-4


# --- forensic audit wave (AO) --------------------------------------------------


def test_price_endings_partition(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.price_ending_profile(spark, SF_SMALL).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    total = sum(r["n"] for r in rows)
    assert total == load_table(spark, SF_SMALL, "orders").count()


def test_duplicate_screen_pairs_valid(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.duplicate_payment_screen(spark, SF_SMALL).collect()
    assert rows  # tuned to fire even at sf0.001
    for r in rows:
        assert r["order_a"] < r["order_b"]
        assert 0.0 <= r["amount_gap_dollars"] <= 1000.0
        assert 0 <= r["gap_days"] <= 180
    # no duplicate pair from the band explode
    pairs = [(r["order_a"], r["order_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_split_screen_combined_crosses_threshold(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.split_purchase_screen(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_orders"] >= 2
        assert r["largest_single_dollars"] < 200_000.0
        assert r["combined_dollars"] >= 200_000.0


# --- supply-chain / QA wave (AP) -----------------------------------------------


def test_return_enrichment_centered(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.return_enrichment_by_brand(spark, SF_SMALL).collect()
    assert len(rows) == 25
    # weighted mean fold-enrichment is 1 by construction
    num = sum(r["n_returned"] for r in rows)
    exp = sum(r["n_items"] for r in rows)
    folds = [r["fold_enrichment"] for r in rows]
    assert 0.5 < min(folds) and max(folds) < 2.0  # no synthetic pathology
    assert abs(sum(r["z_score"] for r in rows)) < 25  # centered z's


def test_supply_risk_ordered_by_concentration(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.supply_risk_hhi(spark, SF_SMALL).collect()
    assert len(rows) == 20
    hhis = [r["hhi"] for r in rows]
    assert all(b <= a + 1e-12 for a, b in zip(hhis, hhis[1:]))
    for r in rows:
        # HHI lower bound is 1/n_suppliers
        assert r["hhi"] >= 1.0 / r["n_suppliers"] - 1e-9
        assert r["total_qty"] >= 100


def test_ship_lag_percentiles_ordered(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.ship_lag_percentiles(spark, SF_SMALL).collect()
    assert len(rows) == 25
    for r in rows:
        assert 0 <= r["p50_days"] <= r["p90_days"] <= r["max_days"]


def test_repurchase_quartiles_ordered(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.repurchase_interval_profile(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["p25_days"] <= r["p50_days"] <= r["p75_days"]
        assert r["n_gaps"] > 0


# --- econometric closers wave (AR) ---------------------------------------------


def test_newey_west_consistent_with_dw(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.newey_west_trend_se(spark, SF_SMALL).collect()[0]
    assert r["se_naive_dollars_day"] > 0
    assert r["se_nw_dollars_day"] > 0
    # DW ~ 2.06 (slightly negative rho): HAC must DEFLATE, mildly
    assert 0.8 < r["hac_inflation"] < 1.05


def test_weekly_power_bounded(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.weekly_spectral_power(spark, SF_SMALL).collect()[0]
    assert 0.0 <= r["weekly_power_share"] <= 1.0
    assert r["weekly_amplitude_dollars"] >= 0.0
