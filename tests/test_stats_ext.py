"""Semantic invariants for the statistical-test tier (stats_ext) beyond
DuckDB-oracle parity: classical identities the statistics must satisfy on
any data."""

from __future__ import annotations

import math

from cdc_streamming___v2_spark.operators import stats_ext as SX
from cdc_streamming___v2_spark.sources.tables import load_table

from .conftest import SF_MED, SF_SMALL


def test_mann_whitney_pairs_and_bounds(spark):
    rows = SX.mann_whitney_u(spark, SF_SMALL).collect()
    types = [
        r["event_type"]
        for r in load_table(spark, SF_SMALL, "events")
        .select("event_type")
        .distinct()
        .collect()
    ]
    k = len(types)
    assert len(rows) == k * (k - 1) // 2
    counts = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg({"*": "count"})
        .withColumnRenamed("count(1)", "n")
        .collect()
    }
    for r in rows:
        assert r["n_a"] == counts[r["type_a"]]
        assert r["n_b"] == counts[r["type_b"]]
        # U is bounded by n_a * n_b, and the rank construction keeps it
        # on the half-integer grid
        assert 0.0 <= r["u_stat"] <= r["n_a"] * r["n_b"]
        assert abs(r["u_stat"] * 2 - round(r["u_stat"] * 2)) < 1e-9
        assert math.isfinite(r["z_stat"])


def test_kruskal_wallis_identity(spark):
    r = SX.kruskal_wallis(spark, SF_SMALL).collect()[0]
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert r["n_total"] == n_events
    assert r["df"] == 4  # five event types
    assert r["h_stat"] >= 0.0
    # the tie correction factor C <= 1, so H/C >= H
    assert r["h_tie_corrected"] >= r["h_stat"] - 1e-9


def test_mann_kendall_bounds(spark):
    r = SX.mann_kendall_trend(spark, SF_SMALL).collect()[0]
    n = r["n_days"]
    assert abs(r["s_stat"]) <= n * (n - 1) // 2
    assert r["var_s"] > 0
    assert math.isfinite(r["z_stat"])
    expect = (
        "increasing" if r["s_stat"] > 0
        else "decreasing" if r["s_stat"] < 0
        else "no-trend"
    )
    assert r["trend"] == expect


def test_log_rank_aa_split_is_calm(spark):
    r = SX.log_rank_test(spark, SF_SMALL).collect()[0]
    # cohorts partition the signup population
    assert r["n_even"] > 0 and r["n_odd"] > 0
    assert 0 <= r["observed_odd"] <= r["n_odd"]
    assert r["variance"] > 0.0
    assert r["chi2"] >= 0.0
    # even/odd user_id is an A/A split of a synthetic corpus: the test
    # must not report a wildly significant difference
    assert r["chi2"] < 15.0


def test_t_closeness_bounds_and_partition(spark):
    rows = SX.t_closeness(spark, SF_SMALL).collect()
    n_orders = load_table(spark, SF_SMALL, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    for r in rows:
        assert 0.0 <= r["t_close"] <= 1.0 + 1e-9
        assert r["breach"] == (r["t_close"] > SX.T_CLOSE_THRESHOLD) or (
            # rounding of t_close happens after the breach comparison, so a
            # value rounding across the threshold may disagree with the
            # rounded column by at most the rounding step
            abs(r["t_close"] - SX.T_CLOSE_THRESHOLD) < 5e-4
        )


def test_js_divergence_bounds(spark):
    rows = SX.js_divergence_sources(spark, SF_SMALL).collect()
    n_src = (
        load_table(spark, SF_SMALL, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_src * (n_src - 1) // 2
    ln2 = math.log(2.0)
    for r in rows:
        assert -1e-9 <= r["js_divergence"] <= ln2 + 1e-9
        assert -1e-9 <= r["js_normalized"] <= 1.0 + 1e-9
        assert r["n_shared_words"] >= 0


# --- wave B: PR metrics, agreement, isotonic (ml_eval additions) ----------


def test_average_precision_at_least_prevalence(spark):
    from cdc_streamming___v2_spark.operators import ml_eval as ME

    r = ME.average_precision_quality(spark, SF_SMALL).collect()[0]
    # a random ranker scores AP ~= prevalence; any informative ranker more.
    # Lower bound is prevalence * (P/N monotonicity not guaranteed for a
    # bad ranker), so only assert bounds and internal consistency here.
    assert 0.0 <= r["average_precision"] <= 1.0
    assert 0.0 < r["prevalence"] < 1.0
    assert r["n_pos"] > 0 and r["n_pos"] < r["n_total"]


def test_cohens_kappa_range_and_identity(spark):
    from cdc_streamming___v2_spark.operators import ml_eval as ME

    r = ME.cohens_kappa_langid(spark, SF_SMALL).collect()[0]
    assert -1.0 <= r["kappa"] <= 1.0
    assert 0.0 <= r["chance_agreement"] <= 1.0
    assert 0.0 <= r["observed_agreement"] <= 1.0
    # kappa identity on the rounded components (loose tolerance: the
    # columns are rounded independently)
    approx = (r["observed_agreement"] - r["chance_agreement"]) / (
        1.0 - r["chance_agreement"]
    )
    assert abs(approx - r["kappa"]) < 2e-3


def test_mcnemar_discordant_counts(spark):
    from cdc_streamming___v2_spark.operators import ml_eval as ME
    from cdc_streamming___v2_spark.sources.tables import load_table

    r = ME.mcnemar_quality_filters(spark, SF_SMALL).collect()[0]
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert r["n_docs"] == n_docs
    assert r["a_only_right"] + r["b_only_right"] <= n_docs
    assert r["chi2"] >= 0.0


def test_isotonic_fit_is_monotone_and_pooled(spark):
    from cdc_streamming___v2_spark.operators import ml_eval as ME

    rows = sorted(
        ME.isotonic_calibration(spark, SF_SMALL).collect(),
        key=lambda r: r["bin"],
    )
    assert rows
    # PAVA output is non-decreasing in the bin (score) order
    for a, b in zip(rows, rows[1:]):
        assert a["iso_rate"] <= b["iso_rate"] + 1e-9
    # pooled fit preserves the weighted mean of the observed rates
    tot = sum(r["n_docs"] for r in rows)
    raw_mean = sum(r["raw_rate"] * r["n_docs"] for r in rows) / tot
    iso_mean = sum(r["iso_rate"] * r["n_docs"] for r in rows) / tot
    assert abs(raw_mean - iso_mean) < 1e-3


# --- wave C: time-series tier (timeseries_ext) ----------------------------


def test_ohlc_bounds_and_volume_partition(spark):
    from cdc_streamming___v2_spark.operators import timeseries_ext as TS
    from cdc_streamming___v2_spark.sources.tables import load_table

    rows = TS.ohlc_bars(spark, SF_SMALL).collect()
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert sum(r["volume"] for r in rows) == n_events
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["low"] <= r["vwap"] <= r["high"] + 1e-9


def test_sax_symbols_alphabet_and_znorm(spark):
    from cdc_streamming___v2_spark.operators import timeseries_ext as TS

    rows = TS.sax_symbols(spark, SF_SMALL).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        assert r["symbol"] in ("a", "b", "c", "d")
        by_type.setdefault(r["event_type"], []).append(r["z"])
    for zs in by_type.values():
        # z-scores are standardized per type: mean ~ 0
        assert abs(sum(zs) / len(zs)) < 1e-3


def test_seasonal_naive_mase_consistency(spark):
    from cdc_streamming___v2_spark.operators import timeseries_ext as TS

    r = TS.seasonal_naive_mase(spark, SF_SMALL).collect()[0]
    assert r["n_days_scored"] > 0
    assert r["mae_seasonal"] >= 0 and r["mae_naive"] >= 0
    if r["mae_naive"] > 0:
        assert abs(r["mase"] - r["mae_seasonal"] / r["mae_naive"]) < 5e-3


# --- wave D: AMS F2 sketch + grid-density clustering ----------------------


def test_ams_f2_estimate_quality(spark):
    from cdc_streamming___v2_spark.operators import sketches as SK
    from cdc_streamming___v2_spark.sources.tables import load_table

    r = SK.ams_f2_sketch(spark, SF_SMALL).collect()[0]
    # exact F2 equals sum of squared user frequencies
    freq = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    exact = sum(x["count"] ** 2 for x in freq)
    assert r["exact_f2"] == exact
    assert r["n_hashes"] == SK.AMS_R
    # median-of-means with 64 hashes: well within 50% of truth on this data
    assert r["rel_err"] < 0.5


def test_grid_dbscan_partitions_points(spark):
    from cdc_streamming___v2_spark.operators import ml_ops as ML
    from cdc_streamming___v2_spark.sources.tables import load_table

    rows = ML.grid_dbscan_clusters(spark, SF_SMALL).collect()
    n_vecs = load_table(spark, SF_SMALL, "embeddings").count()
    assert sum(r["n_points"] for r in rows) == n_vecs
    noise = [r for r in rows if r["cluster"] == -1]
    assert len(noise) == 1 and noise[0]["n_core_cells"] == 0
    real = [r for r in rows if r["cluster"] != -1]
    assert len(real) >= 1
    for r in real:
        assert r["n_core_cells"] >= 1
        assert r["n_points"] >= 1


# --- wave E: operational analytics + Heaps fit -----------------------------


def test_rapid_repeat_orientation_and_window(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.rapid_repeat_purchases(spark, SF_SMALL).collect()
    for r in rows:
        assert r["event_a"] != r["event_b"]
        assert 0.0 <= r["gap_min"] <= A.RAPID_REPEAT_WINDOW_US / 6e7 + 1e-9
        assert r["same_amount"] == (r["amount_a"] == r["amount_b"])


def test_market_beta_weighted_average_is_one(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.market_beta_types(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["r2"] <= 1.0 + 1e-9
    # the market is the sum of its constituents, so sum of covariances
    # equals the market variance: betas sum to 1 in cov-weighted terms.
    # (Equal-variance weighting does not hold; assert the exact identity
    # instead: sum over types of cov(y_t, x) = var(x) => sum beta = 1
    # when every type covers the same day set.)
    if len({r["n_days"] for r in rows}) == 1:
        assert abs(sum(r["beta"] for r in rows) - 1.0) < 1e-3


def test_srm_aa_split_calm(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.srm_check(spark, SF_SMALL).collect()[0]
    assert r["n_even"] + r["n_odd"] > 0
    assert r["chi2"] >= 0.0
    # deterministic even/odd split of synthetic users: no real mismatch
    assert not r["srm_flag"]


def test_heaps_beta_in_sane_band(spark):
    from cdc_streamming___v2_spark.operators import corpus_ops as CO
    from cdc_streamming___v2_spark.sources.tables import load_table

    r = CO.heaps_law_fit(spark, SF_SMALL).collect()[0]
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert r["n_docs"] == n_docs
    assert 0 < r["vocab_size"]
    assert 0.0 <= r["heaps_beta"] < 1.0  # sublinear vocabulary growth
    assert r["heaps_k"] > 0.0
    # the synthetic corpus has a tiny fixed vocabulary (saturates in the
    # first decile) — exactly the pathology the diagnostic must flag
    assert r["template_flag"]


# --- wave F: NMI clustering eval + item-item CF ----------------------------


def test_nmi_bounds_and_information_inequality(spark):
    from cdc_streamming___v2_spark.operators import ml_ops as ML

    r = ML.nmi_cluster_label_eval(spark, SF_SMALL).collect()[0]
    assert r["n_points"] > 0
    assert -1e-9 <= r["mutual_information"] <= min(
        r["h_clusters"], r["h_labels"]
    ) + 1e-6
    assert 0.0 <= r["nmi"] <= 1.0 + 1e-9
    assert r["h_labels"] > 0.0


def test_item_cf_topk_shape(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    rows = B.item_cf_topk(spark, SF_SMALL).collect()
    assert rows
    per_part: dict = {}
    for r in rows:
        assert r["part_id"] != r["neighbor_id"]
        assert 0.0 < r["cosine"] <= 1.0 + 1e-9
        assert r["n_co_orders"] >= B.ITEM_CF_MIN_CO
        per_part.setdefault(r["part_id"], []).append(r["rank"])
    for ranks in per_part.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= B.ITEM_CF_TOPK
    # symmetry of the underlying similarity: if (a,b) ranked, cos(a,b)
    # appears with the same value when b anchors a (not necessarily
    # within b's top-k, so only check value agreement where present)
    vals = {(r["part_id"], r["neighbor_id"]): r["cosine"] for r in rows}
    for (a, b), c in vals.items():
        if (b, a) in vals:
            assert abs(vals[(b, a)] - c) < 1e-9


def test_item_cf_basket_cap_never_fires_on_bench_corpora(spark):
    """ITEM_CF_MAX_BASKET is a worst-case fence only (ADVICE r8): if any
    bench corpus ever grows a basket at/above the cap, item_cf_topk would
    silently drop it and diverge from the uncapped definition.  Pin the
    headroom so a testdata regeneration that trips the cap fails loudly
    here instead of being absorbed."""
    from pyspark.sql import functions as F

    from cdc_streamming___v2_spark.operators import behavior as B
    from cdc_streamming___v2_spark.sources.tables import load_table

    for sf_dir in (SF_SMALL, SF_MED):
        max_basket = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("k"))
            .agg(F.max("k").alias("mx"))
            .collect()[0]["mx"]
        )
        assert max_basket < B.ITEM_CF_MAX_BASKET, (
            f"{sf_dir}: max basket {max_basket} >= cap "
            f"{B.ITEM_CF_MAX_BASKET}; item_cf_topk now drops baskets"
        )


# --- wave G: info gain, retention decay, Hurst -----------------------------


def test_info_gain_bounds_and_ranking(spark):
    import math as _m

    from cdc_streamming___v2_spark.operators import ml_ops as ML

    rows = ML.info_gain_features(spark, SF_SMALL).collect()
    assert len(rows) == ML.IG_TOP
    igs = [r["info_gain"] for r in rows]
    assert igs == sorted(igs, reverse=True)
    for r in rows:
        # IG is bounded by the binary class entropy (<= ln 2)
        assert -1e-9 <= r["info_gain"] <= _m.log(2.0) + 1e-9
        assert 0 <= r["n_pos_with"] <= r["n_docs_with"]


def test_retention_decay_fit_shape(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.retention_decay_fit(spark, SF_SMALL).collect()[0]
    assert r["n_points"] >= 2
    assert r["r0"] > 0
    if r["half_life_days"] is not None:
        assert r["decay_rate"] > 0
        # decay_rate is rounded to 4dp independently of half_life, so a
        # tiny rate leaves a visible relative gap — compare relatively
        expect = 0.6931471805599453 / r["decay_rate"]
        assert abs(r["half_life_days"] - expect) / expect < 0.05


def test_hurst_in_unit_band(spark):
    from cdc_streamming___v2_spark.operators import timeseries_ext as TS

    r = TS.hurst_exponent(spark, SF_SMALL).collect()[0]
    assert r["n_sizes"] >= 2
    # R/S Hurst estimates land in (0, 1.2) for any real series; the
    # regime label must agree with the estimate
    assert 0.0 < r["hurst_h"] < 1.2
    if r["hurst_h"] > 0.55:
        assert r["regime"] == "trending"
    elif r["hurst_h"] < 0.45:
        assert r["regime"] == "mean-reverting"
    else:
        assert r["regime"] == "random-walk"


# --- wave H: changepoint, funnel significance, absorption ------------------


def test_variance_changepoint_reduction_bounds(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.variance_changepoint(spark, SF_SMALL).collect()[0]
    assert r["n_left"] >= A.CHANGEPOINT_MIN_SEG
    assert r["n_right"] >= A.CHANGEPOINT_MIN_SEG
    assert 0.0 <= r["var_reduction"] <= 1.0 + 1e-9
    assert r["sse_split"] >= 0.0


def test_funnel_step_significance_consistency(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.funnel_step_significance(spark, SF_SMALL).collect()[0]
    assert r["n_step1"] >= r["n_step2"] >= r["n_step3"]
    assert 0.0 <= r["conv_1_to_2"] <= 1.0
    assert 0.0 <= r["conv_2_to_3"] <= 1.0
    assert r["significant"] == (abs(r["z_stat"]) > A.FUNNEL_SIG_Z)


def test_absorption_probabilities_valid(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    rows = B.absorption_conversion_prob(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["state"] != B.ABSORB_STATE
        assert 0.0 <= r["p_convert"] <= 1.0 + 1e-9
        assert r["n_transitions"] > 0
    # every user journey that continues long enough eventually converts
    # in this dense synthetic log — probabilities should be substantial
    assert max(r["p_convert"] for r in rows) > 0.5


# --- wave I: ANOVA family, Wilson CI, term bursts --------------------------


def test_anova_f_nonnegative_and_eta(spark):
    r = SX.anova_f_oneway(spark, SF_SMALL).collect()[0]
    assert r["n_groups"] == 5
    assert r["f_stat"] >= 0.0
    assert 0.0 <= r["eta_squared"] <= 1.0


def test_levene_nonnegative(spark):
    r = SX.levene_variance_test(spark, SF_SMALL).collect()[0]
    assert r["n_groups"] == 5
    assert r["levene_w"] >= 0.0


def test_wilson_ci_contains_rate(spark):
    rows = SX.wilson_rate_ci(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["ci_lo"] <= r["rate"] <= r["ci_hi"] <= 1.0
        assert r["n_urgent"] <= r["n_orders"]


def test_term_bursts_exceed_threshold(spark):
    from cdc_streamming___v2_spark.operators import text_analysis as TA

    rows = TA.term_burst_days(spark, SF_SMALL).collect()
    for r in rows:
        assert r["z_score"] >= TA.BURST_Z
        assert r["n_mentions"] > r["daily_mean"]


# --- wave J: DMS envelope, Cramér's V, IPF raking --------------------------


def test_cramers_v_bounds(spark):
    rows = SX.cramers_v_matrix(spark, SF_SMALL).collect()
    assert len(rows) == len(SX._CVM_PAIRS)
    for r in rows:
        assert 0.0 <= r["cramers_v"] <= 1.0 + 1e-9
        assert r["chi2"] >= -1e-6
        assert r["levels_a"] >= 2 and r["levels_b"] >= 2


def test_ipf_matches_both_margins(spark):
    from collections import defaultdict

    from cdc_streamming___v2_spark.sources.tables import load_table

    rows = SX.ipf_raking(spark, SF_SMALL).collect()
    # after the final column step, the weighted counts match the REGION
    # margin exactly; the row margin is approximate (classic IPF)
    c = load_table(spark, SF_SMALL, "customer")
    n = load_table(spark, SF_SMALL, "nation")
    r = load_table(spark, SF_SMALL, "region")
    cust = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .count()
        .collect()
    )
    target = {x["r_name"]: x["count"] for x in cust}
    got = defaultdict(float)
    for row in rows:
        got[row["region"]] += row["weighted_orders"]
    for reg, t in target.items():
        if reg in got:
            assert abs(got[reg] - t) / t < 1e-3, (reg, got[reg], t)
    for row in rows:
        assert row["weight"] > 0


# --- wave K: Wasserstein pairs + HITS ---------------------------------------


def test_wasserstein_metric_properties(spark):
    rows = SX.wasserstein_pairs(spark, SF_SMALL).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["wasserstein_1"] >= 0.0
        assert r["n_a"] > 0 and r["n_b"] > 0


def test_hits_topk_normalized(spark):
    from cdc_streamming___v2_spark.operators import graph as G

    rows = G.hits_bipartite(spark, SF_SMALL).collect()
    assert len(rows) == G.HITS_TOP
    auths = [r["authority"] for r in rows]
    assert auths == sorted(auths, reverse=True)
    # max-normalized: the top authority is exactly 1.0 (the max part)
    assert abs(auths[0] - 1.0) < 1e-6
    for r in rows:
        assert 0.0 < r["authority"] <= 1.0
        assert r["n_customers"] >= 1


# --- wave L: Simpson audit, gains, SLA --------------------------------------


def test_simpson_sign_consistency(spark):
    rows = SX.simpson_reversal_detect(spark, SF_SMALL).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n_agree"] + r["n_oppose"] + r["n_tied"] == r["n_strata"]
        if r["full_reversal"]:
            assert r["n_agree"] == 0 and r["n_oppose"] > 0


def test_decile_gains_monotone_capture(spark):
    from cdc_streamming___v2_spark.operators import ml_eval as ME

    rows = sorted(
        ME.decile_gains_table(spark, SF_SMALL).collect(),
        key=lambda r: r["decile"],
    )
    assert len(rows) == ME.GAINS_DECILES
    caps = [r["cum_capture"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(caps, caps[1:]))
    assert abs(caps[-1] - 1.0) < 1e-9  # all positives captured by decile 10
    assert abs(rows[-1]["cum_lift"] - 1.0) < 1e-3  # full-population lift = 1


def test_latency_sla_percentiles_ordered(spark):
    from cdc_streamming___v2_spark.operators import event_windows as EW

    rows = EW.latency_sla_report(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["p50_ms"] <= r["p95_ms"] <= r["p99_ms"]
        assert r["sla_breach"] == (r["p99_ms"] > EW.SLA_P99_MS)


# --- wave M: sequence eval, EVT, elasticity --------------------------------


def test_markov_accuracy_beats_uniform(spark):
    r = SX.markov_next_event_accuracy(spark, SF_SMALL).collect()[0]
    assert r["n_test"] > 0
    assert 0 <= r["n_correct"] <= r["n_test"]
    # five event types: the learned rule must beat the 1/5 uniform guess
    assert r["accuracy"] > 0.2


def test_extreme_value_ordering(spark):
    r = SX.extreme_value_fit(spark, SF_SMALL).collect()[0]
    assert r["n_days"] > 0
    assert r["gumbel_beta"] > 0
    # the 1-in-365 return level must exceed the mean daily max
    assert r["return_level_1y"] > r["mean_daily_max"]


def test_price_elasticity_brands_covered(spark):
    from cdc_streamming___v2_spark.sources.tables import load_table

    rows = SX.price_elasticity_brand(spark, SF_SMALL).collect()
    n_brands = (
        load_table(spark, SF_SMALL, "part").select("p_brand").distinct().count()
    )
    assert len(rows) == n_brands
    for r in rows:
        assert r["elastic"] == (r["elasticity"] < -1.0)
        assert r["n_lineitems"] > 0


# --- wave N: ABC, Nelson-Aalen, exponential fit ----------------------------


def test_abc_shares_partition_revenue(spark):
    rows = {r["cls"]: r for r in SX.abc_classification(spark, SF_SMALL).collect()}
    assert set(rows) <= {"A", "B", "C"}
    total_share = sum(r["revenue_share"] for r in rows.values())
    assert abs(total_share - 1.0) < 1e-3
    if "A" in rows and "C" in rows:
        # A parts are fewer but carry more revenue per part than C parts
        a, c = rows["A"], rows["C"]
        assert a["revenue_share"] / a["n_parts"] > c["revenue_share"] / c["n_parts"]


def test_nelson_aalen_dominates_km(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    na = sorted(
        SX.nelson_aalen_hazard(spark, SF_SMALL).collect(),
        key=lambda r: r["t_days"],
    )
    hz = [r["cum_hazard"] for r in na]
    assert all(b >= a - 1e-9 for a, b in zip(hz, hz[1:]))  # monotone
    # exp(-H) >= KM survival pointwise (classical inequality)
    km = {r["t_days"]: r["survival"]
          for r in B.kaplan_meier(spark, SF_SMALL).collect()}
    for r in na:
        if r["t_days"] in km:
            assert r["surv_approx"] >= km[r["t_days"]] - 1e-3


def test_exponential_gap_fit_bounds(spark):
    rows = SX.exponential_gap_fit(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["ks_distance"] <= 1.0
        assert r["mean_gap_s"] > 0
        assert r["n_gaps"] > 0
