"""Sketch-property invariants (value parity runs via
tools/check_correctness.py — these assert the estimator guarantees)."""

from __future__ import annotations

from cdc_streamming___v2_spark.operators import sketches as S

from .conftest import SF_MED, SF_SMALL


def test_oracle_coverage():
    assert set(S.ORACLES) == set(S.QUERIES)


def test_kmv_small_groups_exact_and_bounded(spark):
    rows = S.kmv_distinct(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r.exact_distinct < S.KMV_K:
            # under-filled sketch degenerates to the exact count
            assert r.est_distinct == float(r.exact_distinct)
            assert r.rel_err == 0.0
        else:
            # KMV standard error is ~1/sqrt(k-2); 4 sigma is a safe gate
            assert r.rel_err < 4.0 / (S.KMV_K - 2) ** 0.5


def test_countmin_never_underestimates(spark):
    rows = S.countmin_freq(spark, SF_SMALL).collect()
    assert len(rows) == S.CM_QUERY_KEYS
    for r in rows:
        assert r.overestimate >= 0
        assert r.est_count >= r.exact_count >= 1


def test_bloom_no_false_negatives(spark):
    r = S.bloom_prefilter(spark, SF_SMALL).collect()[0]
    # every true match must pass the filter (n_false_pos >= 0 encodes it)
    assert r.n_false_pos >= 0
    assert r.n_bloom_pass == r.n_true_match + r.n_false_pos
    assert r.n_true_match > 0


def test_quantile_sketch_error_bounded_by_bin_width(spark):
    rows = S.quantile_sketch(spark, SF_SMALL).collect()
    assert len(rows) == len(S.QS_PROBES)
    assert {r.p for r in rows} == set(S.QS_PROBES)
    for r in rows:
        # histogram interpolation is off by at most ~one bin width around
        # the true quantile; generous multiple guards distribution shape
        assert r.rel_err < 0.25
        assert r.est_q is not None and r.exact_q is not None


def test_table_stats_values_and_kmv_error(spark):
    from cdc_streamming___v2_spark.operators.sketches import KMV_K, table_stats
    from cdc_streamming___v2_spark.sources.tables import load_table

    rows = {r.col_name: r for r in table_stats(spark, SF_SMALL).collect()}
    li = load_table(spark, SF_SMALL, "lineitem")
    n = li.count()
    assert set(rows) == {
        "l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus",
    }
    for r in rows.values():
        assert r.n_rows == n
        # KMV is exact below k, ~1/sqrt(k) (~12.5% at k=64) above it
        if r.ndv_exact < KMV_K:
            assert r.ndv_kmv_est == r.ndv_exact
        else:
            assert abs(r.ndv_kmv_est - r.ndv_exact) / r.ndv_exact < 0.35
    ok = rows["l_orderkey"]
    exact_min, exact_max, exact_ndv = li.selectExpr(
        "min(l_orderkey)", "max(l_orderkey)", "count(distinct l_orderkey)"
    ).first()
    assert (ok.min_num, ok.max_num, ok.ndv_exact) == (
        float(exact_min), float(exact_max), exact_ndv,
    )
    # string columns carry no numeric range
    assert rows["l_returnflag"].min_num is None


def test_hll_registers_bounded_and_estimate_close(spark):
    from cdc_streamming___v2_spark.operators.sketches import HLL_M, hll_distinct

    rows = hll_distinct(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_regs <= HLL_M
        assert r.n_regs + r.n_zero_regs == HLL_M
        # m=256 -> rse ~ 1.04/sqrt(m) ~ 6.5%; allow 4 sigma
        assert r.rel_err < 0.26


def test_kmv_set_ops_estimates_close_and_consistent(spark):
    from cdc_streamming___v2_spark.operators.sketches import kmv_set_ops

    rows = kmv_set_ops(spark, SF_MED).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs, all intersecting
    for r in rows:
        # estimates are positive and Jaccard is a proper fraction
        assert 0.0 < r.est_jaccard <= 1.0
        assert r.est_union > 0 and r.est_inter >= 0
        # KMV k=64 -> rse ~ 1/sqrt(62) ~ 13%; allow ~4 sigma on union
        assert abs(r.est_union - r.exact_union) / r.exact_union < 0.5
        # jaccard estimate within an additive 0.35 of exact at k=64
        assert abs(r.est_jaccard - r.exact_jaccard) < 0.35


def test_hll_merge_equals_direct_sketch(spark):
    """The '__all__' row comes from max-merging per-group registers; it
    must equal a sketch built directly over the ungrouped data (max is
    associative/commutative), and per-group rows must match hll-estimating
    each group alone."""
    from pyspark.sql import functions as F

    from cdc_streamming___v2_spark.functions.texts import md5_hash_long
    from cdc_streamming___v2_spark.operators import sketches as K
    from cdc_streamming___v2_spark.sources.tables import load_table

    rows = {r.event_type: r for r in K.hll_merge_groups(spark, SF_SMALL).collect()}
    assert "__all__" in rows and len(rows) > 2

    # direct (ungrouped) sketch over the same hash family
    e = load_table(spark, SF_SMALL, "events").select("user_id")
    h = md5_hash_long(F.col("user_id").cast("string"), "hllg")
    v = h % K.HLL_VRANGE
    regs = (
        e.select(
            F.floor(h / K.HLL_VRANGE).cast("int").alias("bucket"),
            F.when(v == 0, K.HLL_VBITS + 1)
            .otherwise(F.lit(K.HLL_VBITS + 1) - F.length(F.bin(v)))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("mj"))
    )
    g = regs.agg(
        F.count("*").alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), F.lit(K.HLL_VBITS + 1) - F.col("mj")))
        .cast("long")
        .alias("s_present"),
    ).first()
    s = g.s_present + (K.HLL_M - g.n_regs) * (2 * K.HLL_VRANGE)
    direct = round(K.HLL_EST_NUM / s, 2)
    assert rows["__all__"].hll_est == direct


def test_rolling_distinct_window_dominates_daily(spark):
    """The trailing-7-day distinct count must be >= any single day's
    distinct count inside the window, and the HLL estimate must track the
    exact value (256 registers -> ~7% typical error)."""
    from pyspark.sql import functions as F

    from cdc_streamming___v2_spark.operators import sketches as K
    from cdc_streamming___v2_spark.sources.tables import load_table

    rows = {r.day: r for r in K.rolling_distinct_users(spark, SF_SMALL).collect()}
    assert rows
    daily = {
        r.day: r.n
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    import datetime

    for day, r in rows.items():
        assert r.exact_7d >= daily[day]
        window_days = [
            day - datetime.timedelta(days=j)
            for j in range(K.ROLL_DAYS)
            if day - datetime.timedelta(days=j) in daily
        ]
        assert r.exact_7d >= max(daily[d] for d in window_days)
        assert r.rel_err <= 0.25  # 256-register HLL stays in its error band
