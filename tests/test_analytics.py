"""Invariants for funnel/retention analytics (value parity runs via
tools/check_correctness.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import analytics as A

from .conftest import SF_SMALL


def test_funnel_monotone(spark):
    r = A.funnel_conversion(spark, SF_SMALL).collect()[0]
    # each stage can only lose users
    assert r.n_signup >= r.n_click_after >= r.n_purchase_after
    assert r.n_signup > 0


def test_retention_cohort_week0_complete(spark):
    rows = A.retention_cohorts(spark, SF_SMALL).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, {})[r.weeks_since] = r.n_active_users
    for cohort, weeks in by_cohort.items():
        # every user is active in their own first week by definition
        assert 0 in weeks
        # retention can never exceed the cohort's own size
        assert all(n <= weeks[0] for n in weeks.values())


def test_oracle_coverage():
    assert set(A.ORACLES) == set(A.QUERIES)


def test_time_range_moving_avg_window_counts(spark):
    from cdc_streamming___v2_spark.operators.analytics import time_range_moving_avg
    rows = time_range_moving_avg(spark, SF_SMALL).collect()
    assert all(r.n_in_window >= 1 for r in rows)  # frame always includes self


def test_locf_null_until_first_purchase(spark):
    from cdc_streamming___v2_spark.operators.analytics import locf_fill
    rows = locf_fill(spark, SF_SMALL).collect()
    assert any(r.last_purchase_value is None for r in rows)
    for r in rows:
        if r.event_type == "purchase":
            assert r.last_purchase_value is not None


def test_price_histogram_shares_sum_to_one(spark):
    from cdc_streamming___v2_spark.operators.analytics import price_histogram
    rows = price_histogram(spark, SF_SMALL).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 0.01
    assert sorted(r.bin for r in rows) == [r.bin for r in rows]


def test_time_rollup_grand_total(spark):
    from cdc_streamming___v2_spark.operators.analytics import time_rollup
    rows = time_rollup(spark, SF_SMALL).collect()
    grand = [r for r in rows if r.y is None and r.m is None and r.d is None]
    assert len(grand) == 1
    leaf_sum = sum(r.n_events for r in rows if r.d is not None)
    assert grand[0].n_events == leaf_sum


def test_pareto_frontier_is_minimal_and_complete(spark):
    from cdc_streamming___v2_spark.operators.analytics import pareto_frontier
    from cdc_streamming___v2_spark.sources.tables import load_table

    frontier = pareto_frontier(spark, SF_SMALL).collect()
    parts = load_table(spark, SF_SMALL, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()

    def dominated(a):
        return any(
            b.p_retailprice <= a.p_retailprice
            and b.p_size >= a.p_size
            and (b.p_retailprice < a.p_retailprice or b.p_size > a.p_size)
            for b in parts
        )

    got = {r.p_partkey for r in frontier}
    want = {r.p_partkey for r in parts if not dominated(r)}
    assert got == want and got


def test_activity_streaks_consecutive(spark):
    from cdc_streamming___v2_spark.operators.analytics import activity_streaks

    rows = activity_streaks(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # streak span is exactly the day count (consecutive days)
        assert (r.streak_end - r.streak_start).days == r.streak_days - 1
        assert r.streak_days >= 1


def test_peak_concurrency_matches_naive_scan(spark):
    from cdc_streamming___v2_spark.operators.analytics import peak_concurrency
    from cdc_streamming___v2_spark.operators.event_windows import session_agg

    got = peak_concurrency(spark, SF_SMALL).collect()[0]
    sess = session_agg(spark, SF_SMALL).collect()
    # naive check: concurrency evaluated at every session start
    peak = max(
        sum(1 for s in sess if s.sess_start <= t <= s.sess_end)
        for t in (s.sess_start for s in sess)
    )
    assert got.peak_concurrency == peak
    assert got.n_sessions == len(sess)


def test_data_quality_checks_all_pass_on_clean_testdata(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = {r.check_name: r for r in A.data_quality_checks(spark, SF_SMALL).collect()}
    assert len(rows) == 6
    for name, r in rows.items():
        assert 0.0 <= r.metric <= 1.0
        assert r.passed, f"{name} failed on clean testdata: {r.metric}"


def test_ewma_decay_and_bounds(spark):
    """EWMA must sit inside the min/max of its inputs, equal the raw value
    on a user's first event, and weight recent values more than old ones
    (a jump moves the ewma more than half-way after one step at alpha=.5)."""
    rows = A.ewma_user_value(spark, SF_SMALL).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    vals = [r.value for r in rows]
    assert min(vals) - 1e-9 <= min(r.ewma for r in rows)
    assert max(r.ewma for r in rows) <= max(vals) + 1e-9
    # series starts exist where the window holds a single term
    assert any(abs(r.ewma - r.value) < 1e-6 for r in rows)


def test_anomaly_days_zscores_are_standardized(spark):
    rows = A.anomaly_days(spark, SF_SMALL).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        zs = [r.z_score for r in rs]
        # standardized scores: mean ~0, and flags match the threshold
        assert abs(sum(zs) / len(zs)) < 0.01
        for r in rs:
            assert r.is_anomaly == (abs(r.z_score) >= A.ANOMALY_Z)


def test_equi_depth_buckets_balanced_and_ordered(spark):
    rows = sorted(A.equi_depth_histogram(spark, SF_SMALL).collect(),
                  key=lambda r: r.bucket)
    assert len(rows) == A.EQUI_DEPTH_BUCKETS
    counts = [r.n_rows for r in rows]
    assert max(counts) - min(counts) <= 1  # ntile depth balance
    for prev, cur in zip(rows, rows[1:]):
        assert prev.hi <= cur.lo + 1e-9  # boundaries ascend


def test_interarrival_gap_percentiles_ordered(spark):
    rows = A.interarrival_gaps(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_gaps > 0
        assert 0 <= r.p50_s <= r.p90_s <= r.p99_s
        assert r.mean_s > 0


def test_revenue_gini_in_unit_range_and_bucketed_rank_exact(spark):
    """Gini must land in [0, 1); the bucketed two-pass rank must reproduce
    the naive per-segment global ranking exactly (spot-checked by
    recomputing one segment's gini driver-side)."""
    rows = {r.c_mktsegment: r for r in A.revenue_gini(spark, SF_SMALL).collect()}
    assert rows
    for r in rows.values():
        assert 0.0 <= r.gini < 1.0
        assert r.n_customers > 0 and r.total_revenue > 0
    seg, ref = next(iter(rows.items()))
    from pyspark.sql import functions as F

    from cdc_streamming___v2_spark.sources.tables import load_table

    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer")
    rev = sorted(
        (round(x.rev, 2), x.c_custkey)
        for x in o.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment") == seg)
        .select("c_custkey", "rev")
        .collect()
    )
    n = len(rev)
    total = round(sum(v for v, _ in rev), 2)
    wsum = sum((i + 1) * v for i, (v, _) in enumerate(rev))
    gini = round(2 * wsum / (n * total) - (n + 1) / n, 6)
    assert abs(gini - ref.gini) < 1e-4


def test_trend_fit_reproduces_closed_form(spark):
    """regr_slope must equal the hand-computed OLS slope on the daily
    rollup (cov/var closed form)."""
    import statistics

    from cdc_streamming___v2_spark.operators import analytics as A
    from cdc_streamming___v2_spark.sources.tables import load_table

    out = {r.event_type: r for r in A.trend_fit(spark, SF_SMALL).collect()}
    e = load_table(spark, SF_SMALL, "events")
    daily = (
        e.filter(F.col("event_type") == "click")
        .groupBy(F.datediff(F.to_date("ts"), F.lit(A.TREND_EPOCH)).alias("x"))
        .count()
        .collect()
    )
    xs = [r.x for r in daily]
    ys = [float(r["count"]) for r in daily]
    mx, my = statistics.fmean(xs), statistics.fmean(ys)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert abs(out["click"].cnt_slope - slope) < 1e-4
    assert out["click"].n_days == len(xs)


def test_mutual_information_nonnegative_and_additive(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = {r.event_type: r for r in A.mutual_information(spark, SF_SMALL).collect()}
    allr = rows.pop("__all__")
    assert allr.mi_bits >= 0  # MI of the full joint is >= 0
    assert abs(sum(r.p_x for r in rows.values()) - 1.0) < 1e-4
    assert abs(sum(r.mi_bits for r in rows.values()) - allr.mi_bits) < 1e-4


def test_winsorized_stats_bounds_and_clip_rate(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    for r in A.winsorized_stats(spark, SF_SMALL).collect():
        assert r.p05 <= r.p95
        assert r.p05 <= r.winsor_mean <= r.p95
        # ~5% clipped each side (interpolated quantile; +-2 rows slack)
        assert abs(r.n_clipped_lo - 0.05 * r.n_events) <= 2
        assert abs(r.n_clipped_hi - 0.05 * r.n_events) <= 2


def test_k_anonymity_invariants(spark):
    from cdc_streamming___v2_spark.operators import analytics as A
    from cdc_streamming___v2_spark.sources.tables import load_table

    rows = A.k_anonymity(spark, SF_SMALL).collect()
    n_cust = load_table(spark, SF_SMALL, "customer").count()
    assert sum(r.n_rows for r in rows) == n_cust
    for r in rows:
        assert r.n_rows_at_risk <= r.n_rows
        assert r.n_small_classes <= r.n_classes
        assert r.k_min >= 1
        # every risky class has < K members
        assert r.n_rows_at_risk < A.KANON_K * max(r.n_small_classes, 1) + 1


def test_seasonality_strength_bounded(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    for r in A.seasonality_strength(spark, SF_SMALL).collect():
        # 1 - vr/vt <= 1 always; can dip below 0 only by dof artifacts
        assert r.strength <= 1.0 + 1e-9
        assert r.var_daily >= 0
        assert r.n_days > 0


def test_cusum_changepoint_is_argmax(spark):
    """The reported day must carry the max |cusum| over a hand-computed
    prefix sum for one event type."""
    from cdc_streamming___v2_spark.operators import analytics as A
    from cdc_streamming___v2_spark.sources.tables import load_table

    out = {r.event_type: r for r in A.cusum_changepoint(spark, SF_SMALL).collect()}
    e = load_table(spark, SF_SMALL, "events")
    daily = sorted(
        (r.d, r.c)
        for r in e.filter(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    mu = sum(c for _, c in daily) / len(daily)
    cs, best = 0.0, (None, -1.0)
    for d, c in daily:
        cs += c - mu
        if abs(cs) > best[1] + 1e-12:
            best = (d, abs(cs))
    assert out["click"].changepoint_day == best[0]
    assert abs(out["click"].max_abs_cusum - best[1]) < 1e-3


def test_chi2_drift_total_is_sum_of_parts(spark):
    rows = {r.event_type: r for r in A.chi2_drift(spark, SF_SMALL).collect()}
    allr = rows.pop("__all__")
    assert allr.chi2_part >= 0
    assert abs(sum(r.chi2_part for r in rows.values()) - allr.chi2_part) < 1e-3
    assert allr.n_before == sum(r.n_before for r in rows.values())
    assert allr.n_after == sum(r.n_after for r in rows.values())


def test_funnel_windowed_monotone_in_window(spark):
    r = A.funnel_windowed(spark, SF_SMALL).collect()[0]
    assert r.n_conv_1d <= r.n_conv_7d <= r.n_conv_30d <= r.n_signup_users
    assert 0 <= r.rate_1d <= r.rate_7d <= r.rate_30d <= 1
    assert r.n_signup_users > 0


def test_twap_zero_span_user_excluded(spark, tmp_path):
    """ADVICE r7: a user whose events ALL share one microsecond has
    span_us = 0; the integer-division TWAP would hard-error (ANSI divide
    by zero / DuckDB HUGEINT // 0) where the old double division gave
    inf.  The span_us > 0 guard must drop that user while leaving a
    normal user's row intact."""
    import pandas as pd

    from cdc_streamming___v2_spark.operators.analytics import twap_user_value

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4],
            # user 1: two events at the SAME microsecond (span 0);
            # user 2: two readings an hour apart + a terminal event
            "ts": [t0, t0, t0, t0 + pd.Timedelta(hours=1),
                   t0 + pd.Timedelta(hours=2)],
            "user_id": [1, 1, 2, 2, 2],
            "event_type": ["view"] * 5,
            "value": [10.0, 20.0, 10.0, 30.0, 0.0],
            "props": ["{}"] * 5,
        }
    ).to_parquet(tmp_path / "events.parquet")
    rows = twap_user_value(spark, str(tmp_path)).collect()
    assert [r["user_id"] for r in rows] == [2]
    r = rows[0]
    # user 2 holds 10.0 for 1h then 30.0 for 1h -> TWAP 20.0
    assert r["n_intervals"] == 2
    assert r["twap"] == 20.0
    assert r["naive_avg"] == 20.0
    assert r["span_hours"] == 2.0
