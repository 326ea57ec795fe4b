"""Round-4 operator invariants: BPE pair counting, BM25 retrieval,
mixture weights, logistic quality scoring. (Value parity vs DuckDB is
covered by the oracle gate; these pin semantic properties.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import corpus_ops as C
from cdc_streamming___v2_spark.operators import pipeline_ops as P
from cdc_streamming___v2_spark.operators import text_analysis as TA
from cdc_streamming___v2_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_bpe_pair_counts_ranked_and_consistent(spark):
    rows = TA.bpe_pair_counts(spark, SF_SMALL).collect()
    assert len(rows) == TA.BPE_TOP
    assert [r.rank for r in rows] == sorted(r.rank for r in rows)
    counts = [r.n_occurrences for r in sorted(rows, key=lambda r: r.rank)]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.pair) == 2 for r in rows)
    # ground truth on one known pair: occurrences of 'th' inside words
    # must match a direct count
    th = next((r for r in rows if r.pair == "th"), None)
    if th is not None:
        direct = (
            load_table(spark, SF_SMALL, "documents")
            .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
            .filter(F.length("w") >= 2)
            .select(
                (F.length("w") - F.length(F.regexp_replace("w", "th", "")))
                / 2
            )
            .groupBy()
            .sum()
            .first()[0]
        )
        # regexp_replace counts non-overlapping occurrences — 'th' can't
        # overlap itself, so the counts must agree exactly
        assert th.n_occurrences == int(direct)


def test_bm25_prefers_term_dense_short_docs(spark):
    out = C.bm25_topk(spark, SF_SMALL)
    rows = out.collect()
    assert 0 < len(rows) <= C.BM25_TOP
    scores = [r.bm25 for r in sorted(rows, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_terms_hit <= len(C.BM25_TERMS) for r in rows)
    # TakeOrderedAndProject (not a global sort) must serve the top-k
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_mixture_weights_normalize_and_flatten(spark):
    rows = P.mixture_weights(spark, SF_SMALL).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-3
    # alpha < 1 compresses: the largest source is down-weighted vs
    # proportional, the smallest up-weighted
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    assert big.upweight_vs_proportional < 1.0 < small.upweight_vs_proportional


def test_quality_logit_monotone_in_stopword_ratio(spark):
    """Two docs with equal length/punctuation: the one with more
    stopwords must score higher (positive weight)."""
    rows = {
        r.doc_id: r
        for r in TA.quality_logit_score(spark, SF_SMALL).collect()
    }
    assert rows and all(0.0 <= r.prob_keep <= 1.0 for r in rows.values())
    feats = {
        r.doc_id: r
        for r in TA.text_quality(spark, SF_SMALL).collect()
    }
    import itertools

    for a, b in itertools.islice(
        itertools.combinations(sorted(rows), 2), 5000
    ):
        fa, fb = feats[a], feats[b]
        if (
            fa.n_words == fb.n_words
            and fa.punct_ratio == fb.punct_ratio
            and fa.stopword_ratio > fb.stopword_ratio
        ):
            assert rows[a].logit >= rows[b].logit


def test_robust_mad_outliers_tolerates_contamination(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.robust_mad_outliers(spark, SF_SMALL).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.mad >= 0 and r.n_outliers <= r.n_days
        # outlier days must actually deviate beyond the threshold
        if r.n_outliers > 0:
            assert r.max_abs_dev > A.MAD_K * A.MAD_SCALE * r.mad


def test_source_boilerplate_bounds_and_shared_exists(spark):
    rows = C.source_boilerplate(spark, SF_SMALL).collect()
    assert len(rows) > 0
    assert all(0 <= r.n_boiler <= r.n_shingles for r in rows)
    assert all(0.0 <= r.boiler_frac <= 1.0 for r in rows)


def test_ks_drift_bounds_and_counts(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.ks_drift(spark, SF_SMALL).first()
    assert 0.0 <= r.ks_stat <= 1.0
    purchases = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert r.n_before + r.n_after == purchases
    assert r.n_before > 0 and r.n_after > 0


def test_wow_growth_matches_recomputation(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.wow_growth(spark, SF_SMALL).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.week_start)
        assert series[0].prev_revenue is None
        for prev, cur in zip(series, series[1:]):
            assert cur.prev_revenue == prev.revenue
            expect = round(
                (cur.revenue - prev.revenue) / prev.revenue * 100.0, 4
            )
            assert cur.growth_pct == expect


def test_char_entropy_bounds(spark):
    import math

    rows = TA.char_entropy(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        assert -1e-9 <= r.entropy_bits
        assert r.entropy_bits <= math.log2(r.n_distinct_chars) + 1e-6
        assert r.low_entropy == (r.entropy_bits < TA.ENTROPY_LOW_BITS) or abs(
            r.entropy_bits - TA.ENTROPY_LOW_BITS
        ) < 1e-3


def test_hybrid_rrf_fuses_both_rankers(spark):
    from cdc_streamming___v2_spark.operators import similarity as S

    rows = S.hybrid_rrf_topk(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= S.RRF_TOP
    rows.sort(key=lambda r: r.rank)
    for r in rows:
        assert r.r_lex is not None or r.r_sem is not None
        expect = 0.0
        if r.r_lex is not None:
            expect += 1.0 / (S.RRF_K + r.r_lex)
        if r.r_sem is not None:
            expect += 1.0 / (S.RRF_K + r.r_sem)
        assert abs(r.rrf_score - expect) < 1e-6
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # fusion must actually draw from both rankers somewhere in the top
    assert any(r.r_lex is not None for r in rows)
    assert any(r.r_sem is not None for r in rows)


def test_dsir_separates_target_language(spark):
    rows = P.dsir_importance_weights(spark, SF_SMALL).collect()
    en = [r.logw_bits for r in rows if r.lang == P.DSIR_TARGET_LANG]
    other = [r.logw_bits for r in rows if r.lang != P.DSIR_TARGET_LANG]
    assert en and other
    # the target-language model must score its own language higher on
    # average — the whole point of importance resampling
    assert sum(en) / len(en) > sum(other) / len(other)


def test_holt_forecast_tracks_linear_series(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.holt_forecast(spark, SF_SMALL).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.n_days >= 1
        # forecast is level + HORIZON*trend (values rounded independently,
        # so allow the compounded rounding slack)
        assert abs(r.forecast - (r.level + A.HOLT_HORIZON * r.trend)) < 1e-3
    # on a pure linear series, the recurrence converges to the exact line
    ys = [100.0 + 5.0 * i for i in range(20)]
    lvl, trd = ys[0], ys[1] - ys[0]
    for y in ys[1:]:
        nl = A.HOLT_ALPHA * y + (1 - A.HOLT_ALPHA) * (lvl + trd)
        trd = A.HOLT_BETA * (nl - lvl) + (1 - A.HOLT_BETA) * trd
        lvl = nl
    assert abs(lvl - ys[-1]) < 1.0 and abs(trd - 5.0) < 0.5


def test_acf_bounds(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.acf_daily_revenue(spark, SF_SMALL).collect()
    assert len(rows) >= 1
    for r in rows:
        for k in A.ACF_LAGS:
            v = getattr(r, f"acf{k}")
            assert -1.1 <= v <= 1.1


def test_benford_shares_sum_to_one(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.benford_deviation(spark, SF_SMALL).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert abs(r.deviation - round(r.obs_share - r.benford_share, 4)) < 2e-4


def test_quantile_normalize_uniform_and_ordered(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.quantile_normalize(spark, SF_SMALL).collect()
    n = len(rows)
    ranks = sorted(r.rank for r in rows)
    assert ranks == list(range(1, n + 1))  # a true permutation
    rows.sort(key=lambda r: r.rank)
    assert rows[0].q_norm == 0.0 and rows[-1].q_norm == 1.0
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices)


def test_correlation_matrix_bounds_and_known_pair(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.correlation_matrix(spark, SF_SMALL).collect()
    assert len(rows) == 6
    seen = set()
    for r in rows:
        assert -1.0 <= r.pearson_r <= 1.0
        assert r.col_a != r.col_b
        seen.add((r.col_a, r.col_b))
    assert len(seen) == 6  # every unordered pair exactly once


def test_degree_assortativity_complete_graph_null(spark):
    from cdc_streamming___v2_spark.operators import graph as G

    r = G.degree_assortativity(spark, SF_SMALL).first()
    assert r.n_edges > 0
    # on a complete trade graph degrees are constant -> r undefined (NULL);
    # otherwise it must be a valid correlation
    if r.assortativity is not None:
        assert -1.0 <= r.assortativity <= 1.0
    assert r.max_out_degree >= r.mean_out_degree


def test_pca_matches_numpy_eigenvector(spark):
    """The distributed integer-Gram power iteration must agree with
    numpy's eigendecomposition of the same quantized Gram matrix."""
    import numpy as np
    from cdc_streamming___v2_spark.operators import similarity as S

    out = S.pca_top_component(spark, SF_SMALL).collect()
    emb = (
        load_table(spark, SF_SMALL, "embeddings")
        .orderBy("vec_id")
        .collect()
    )
    ids = [r.vec_id for r in emb]
    X = np.array([[float(x) for x in r.embedding] for r in emb])
    Q = np.round(X * 1e6)
    A = Q.T @ Q
    w, v = np.linalg.eigh(A)
    top = v[:, -1]
    proj_np = X @ (top / np.linalg.norm(top))
    proj = {r.vec_id: r.pc1_score for r in out}
    got = np.array([proj[i] for i in ids])
    # sign of the eigenvector is arbitrary in numpy; align before compare
    if np.dot(got, proj_np) < 0:
        proj_np = -proj_np
    cos = np.dot(got, proj_np) / (
        np.linalg.norm(got) * np.linalg.norm(proj_np)
    )
    assert cos > 0.9999
    lam = out[0].eigenvalue
    assert abs(lam - w[-1] / 1e12) / max(w[-1] / 1e12, 1e-9) < 1e-3


def test_entity_resolution_is_consistent_partition(spark):
    from cdc_streamming___v2_spark.operators import dedup as D

    rows = D.entity_resolution(spark, SF_SMALL).collect()
    names = {r.name for r in rows}
    all_names = {
        r.p_name
        for r in load_table(spark, SF_SMALL, "part").select("p_name").distinct().collect()
    }
    assert names == all_names  # every name resolved exactly once
    by_entity = {}
    for r in rows:
        assert r.entity <= r.name  # canonical = lexicographic min member
        by_entity.setdefault(r.entity, []).append(r)
    for ent, members in by_entity.items():
        assert all(m.n_members == len(members) for m in members)
        assert min(m.name for m in members) == ent
    # every accepted FS match pair must land in the same entity
    ent_of = {r.name: r.entity for r in rows}
    for m in D.fellegi_sunter_linkage(spark, SF_SMALL).filter("is_match").collect():
        assert ent_of[m.name_a] == ent_of[m.name_b]


def test_kaplan_meier_monotone_and_bounded(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    rows = B.kaplan_meier(spark, SF_SMALL).collect()
    assert len(rows) >= 1
    rows.sort(key=lambda r: r.t_days)
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev + 1e-9  # survival never increases
        assert 0 < r.d_events <= r.n_risk
        prev = r.survival
    # risk sets shrink over time
    risks = [r.n_risk for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_ab_test_lift_consistent(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    r = B.ab_test_lift(spark, SF_SMALL).first()
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    assert abs(r.rate_a - r.conv_a / r.n_a) < 1e-5
    assert abs(r.abs_lift - (r.rate_b - r.rate_a)) < 1e-5
    if r.z_score is not None and r.abs_lift != 0:
        # z has the sign of the lift
        assert (r.z_score > 0) == (r.abs_lift > 0)


def test_feature_matrix_lags_consistent(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.feature_matrix_daily(spark, SF_SMALL).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.d)
        assert series[0].lag1 is None
        for prev, cur in zip(series, series[1:]):
            assert cur.lag1 == prev.y
        for i, r in enumerate(series):
            window = [s.y for s in series[max(0, i - 6): i + 1]]
            assert abs(r.mean7 - sum(window) / len(window)) < 1e-3
            assert r.is_weekend == (r.dow in (1, 7))


def test_target_encoding_shrinks_toward_global(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.target_encoding(spark, SF_SMALL).collect()
    total_n = sum(r.n_orders for r in rows)
    gmean = sum(r.seg_mean * r.n_orders for r in rows) / total_n
    for r in rows:
        lo, hi = sorted((r.seg_mean, gmean))
        # encoded value lies strictly between the segment and global means
        assert lo - 0.01 <= r.encoded <= hi + 0.01
        # heavier segments shrink less
        expect = (r.seg_mean * r.n_orders + A.TE_SMOOTHING * gmean) / (
            r.n_orders + A.TE_SMOOTHING
        )
        assert abs(r.encoded - expect) < 0.51  # gmean here is approximate


def test_bootstrap_ci_brackets_sample_mean(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    r = A.bootstrap_mean_ci(spark, SF_SMALL).first()
    assert r.n_resamples == A.BOOT_B
    sample_mean = (
        load_table(spark, SF_SMALL, "orders")
        .agg(F.avg("o_totalprice"))
        .first()[0]
    )
    assert r.ci_lo <= r.boot_mean <= r.ci_hi
    # the CI must cover the plain sample mean (B=32, 5-95%)
    assert r.ci_lo <= sample_mean <= r.ci_hi


def test_theil_sen_robust_to_outlier_day(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = {r.event_type: r for r in A.theil_sen_trend(spark, SF_SMALL).collect()}
    assert rows
    for r in rows.values():
        n_days = (1 + (1 + 8 * r.n_pairs) ** 0.5) / 2  # invert C(n,2)
        assert abs(n_days - round(n_days)) < 1e-9  # pair count is C(n,2)
        assert r.slope_q1 <= r.ts_slope <= r.slope_q3


def test_rolling_correlation_bounds(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.rolling_correlation(spark, SF_SMALL).collect()
    rows.sort(key=lambda r: r.d)
    for i, r in enumerate(rows):
        assert r.n_window == min(i + 1, 7)
        if r.corr7 is not None:
            assert -1.0 - 1e-9 <= r.corr7 <= 1.0 + 1e-9


def test_recursive_reachability_agrees_with_bfs(spark):
    from cdc_streamming___v2_spark.operators import graph as G

    rec = {r.nationkey: r for r in G.recursive_reachability(spark, SF_SMALL).collect()}
    bfs = {r.nationkey: r.hops for r in G.bfs_hops(spark, SF_SMALL).collect()}
    assert set(rec) == set(bfs)
    for k, r in rec.items():
        assert r.hops == bfs[k]  # native recursive CTE == DataFrame loop
        assert (r.hops == -1) == (r.n_walks == 0)


def test_variant_props_stats_bounds(spark):
    from cdc_streamming___v2_spark.operators import relational_ext as RX

    rows = RX.variant_props_stats(spark, SF_SMALL).collect()
    assert len(rows) >= 1
    for r in rows:
        assert 0 <= r.n_with_k <= r.n
        if r.n_with_k:
            assert r.min_k <= r.avg_k <= r.max_k
            assert r.n_distinct_k <= r.max_k - r.min_k + 1


def test_zipf_slope_negative_and_fit_reasonable(spark):
    r = C.zipf_fit(spark, SF_SMALL).first()
    assert r.n_vocab > 0 and r.n_top <= C.ZIPF_TOP
    assert r.zipf_slope < 0  # frequency falls with rank, always
    assert 0.0 <= r.r2 <= 1.0


def test_vocab_overlap_symmetric_bounds(spark):
    rows = C.vocab_overlap_sources(spark, SF_SMALL).collect()
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.n_common <= min(r.v_a, r.v_b)
        assert 0.0 < r.jaccard <= 1.0


def test_dup_size_profile_accounts_for_all_docs(spark):
    from cdc_streamming___v2_spark.operators import dedup as D

    rows = D.dup_size_profile(spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_docs_in for r in rows) == n_docs
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-3


def test_burstiness_bounds(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.burstiness(spark, SF_SMALL).collect()
    for r in rows:
        assert r.fano >= 0
        assert -1.0 <= r.burstiness <= 1.0


def test_rfm_scores_quintile_balanced(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.rfm_segmentation(spark, SF_SMALL).collect()
    n = len(rows)
    for dim in ("r_score", "f_score", "m_score"):
        vals = [getattr(r, dim) for r in rows]
        assert all(1 <= v <= 5 for v in vals)
        from collections import Counter

        c = Counter(vals)
        # quintiles balanced to within one rounding unit
        assert max(c.values()) - min(c.values()) <= (n // 5) + 1
    for r in rows:
        assert r.rfm == f"{r.r_score}{r.f_score}{r.m_score}"
    # best monetary customer scores m=5
    top_m = max(rows, key=lambda r: r.monetary)
    assert top_m.m_score == 5


def test_cohort_ltv_monotone_cumulative(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    rows = B.cohort_ltv(spark, SF_SMALL).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    for series in by_cohort.values():
        series.sort(key=lambda r: r.week_n)
        ltvs = [r.ltv_per_user for r in series]
        assert ltvs == sorted(ltvs)  # cumulative per-user LTV never falls
        assert all(r.cohort_users > 0 and r.week_revenue >= 0 for r in series)
