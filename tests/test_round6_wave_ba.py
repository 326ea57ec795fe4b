"""Wave-BA tests: graph/sketch/microstructure/causal twins along
independent paths (numpy adjacency powers, hashlib-recomputed HLL
registers, pandas loops) + plan audits."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F  # noqa: F401

from .conftest import SF_SMALL


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_wave_ba_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators.causal import event_study_did
    from cdc_streamming___v2_spark.operators.finance_ext import (
        amihud_illiquidity,
        roll_spread_estimator,
    )
    from cdc_streamming___v2_spark.operators.graph import katz_centrality
    from cdc_streamming___v2_spark.operators.sketches import (
        hll_intersection_estimate,
    )

    for fn in (
        katz_centrality,
        hll_intersection_estimate,
        roll_spread_estimator,
        amihud_illiquidity,
        event_study_did,
    ):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_katz_matches_adjacency_powers(spark):
    """Literal numpy A^k walk counts vs the iterative join-aggregate."""
    from cdc_streamming___v2_spark.operators.graph import (
        KATZ_BETA,
        KATZ_K,
        katz_centrality,
    )

    rows = {r["nationkey"]: r for r in katz_centrality(spark, SF_SMALL).collect()}
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    c = pd.read_parquet(f"{SF_SMALL}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    s = pd.read_parquet(f"{SF_SMALL}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey"))
    edges = set(zip(j["s_nationkey"], j["c_nationkey"]))
    A = np.zeros((25, 25), dtype=np.int64)
    for u, v in edges:
        A[u, v] = 1
    ones = np.ones(25, dtype=np.int64)
    wk = ones
    katz = np.zeros(25)
    for k in range(1, KATZ_K + 1):
        wk = A.T @ wk  # walks of length k ending at each node
        katz += KATZ_BETA ** k * wk
        for node in range(25):
            assert rows[node][f"walks_{k}"] == wk[node], (k, node)
    for node in range(25):
        assert rows[node]["katz"] == pytest.approx(katz[node], abs=1e-4)


def test_hll_intersection_matches_hashlib_registers(spark):
    """Recompute one pair's three estimates from hashlib-md5 registers —
    fully independent of the engine hash/fold path."""
    from cdc_streamming___v2_spark.operators.sketches import (
        HLL_EST_NUM,
        HLL_M,
        HLL_VBITS,
        HLL_VRANGE,
        hll_intersection_estimate,
    )

    rows = {(r["type_a"], r["type_b"]): r
            for r in hll_intersection_estimate(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet",
                         columns=["event_type", "user_id"])
    by = {t: set(g["user_id"]) for t, g in ev.groupby("event_type")}

    def regs(users):
        r = {}
        for u in users:
            h = int(hashlib.md5(f"hllg{u}".encode()).hexdigest()[:8], 16)
            b, v = h // HLL_VRANGE, h % HLL_VRANGE
            rho = (HLL_VBITS + 1) if v == 0 else (
                HLL_VBITS + 1 - len(bin(v)[2:])
            )
            r[b] = max(r.get(b, 0), rho)
        return r

    def est(r):
        s = sum(2.0 ** (HLL_VBITS + 1 - m) for m in r.values())
        s = int(s) + (HLL_M - len(r)) * 2 * HLL_VRANGE
        return HLL_EST_NUM / s

    ta, tb = sorted(by)[0], sorted(by)[1]
    got = rows[(ta, tb)]
    ea, eb = est(regs(by[ta])), est(regs(by[tb]))
    ra, rb = regs(by[ta]), regs(by[tb])
    ru = {b: max(ra.get(b, 0), rb.get(b, 0)) for b in set(ra) | set(rb)}
    eu = est(ru)
    assert got["est_a"] == pytest.approx(ea, abs=0.01)
    assert got["est_b"] == pytest.approx(eb, abs=0.01)
    assert got["est_union"] == pytest.approx(eu, abs=0.01)
    assert got["est_intersection"] == pytest.approx(ea + eb - eu, abs=0.02)
    assert got["exact_intersection"] == len(by[ta] & by[tb])


def test_roll_spread_matches_numpy(spark):
    from cdc_streamming___v2_spark.operators.finance_ext import (
        roll_spread_estimator,
    )

    row = roll_spread_estimator(spark, SF_SMALL).collect()[0]
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_shipdate", "l_extendedprice",
                                  "l_quantity"])
    li["rc"] = (li["l_extendedprice"] * 100).round().astype("int64")
    d = li.groupby("l_shipdate").agg(rc=("rc", "sum"),
                                     q=("l_quantity", "sum"))
    d = d.sort_index()
    pm = np.round(np.round(d["rc"] / (d["q"] * 100.0), 6) * 1e6)
    dp = np.diff(pm)
    cov = np.cov(dp[:-1], dp[1:], ddof=1)[0, 1] / 1e12
    assert row["n_obs"] == len(dp) - 1
    assert row["serial_cov"] == pytest.approx(cov, rel=1e-6, abs=1e-10)
    if cov < 0:
        assert row["roll_spread"] == pytest.approx(2 * np.sqrt(-cov),
                                                   abs=1e-4)
        assert row["verdict"] == "spread_estimated"
    else:
        assert row["roll_spread"] is None
        assert row["verdict"] == "positive_autocov_no_estimate"


def test_amihud_matches_pandas(spark):
    from cdc_streamming___v2_spark.operators.finance_ext import (
        amihud_illiquidity,
    )

    rows = {r["brand"]: r for r in amihud_illiquidity(spark, SF_SMALL).collect()}
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate",
                                  "l_extendedprice", "l_quantity"])
    p = pd.read_parquet(f"{SF_SMALL}/part.parquet",
                        columns=["p_partkey", "p_brand"])
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["rc"] = (j["l_extendedprice"] * 100).round().astype("int64")
    d = j.groupby(["p_brand", "l_shipdate"]).agg(
        rc=("rc", "sum"), q=("l_quantity", "sum"))
    checked = 0
    for brand, g in d.groupby(level=0):
        g = g.sort_index()
        pm = np.round(np.round(g["rc"] / (g["q"] * 100.0), 6) * 1e6).to_numpy()
        rc = g["rc"].to_numpy()
        terms = []
        for i in range(1, len(pm)):
            if pm[i - 1] > 0:
                terms.append(round(
                    abs(pm[i] - pm[i - 1]) / pm[i - 1] / (rc[i] / 100.0) * 1e6,
                    6))
        got = rows[brand]
        assert got["n_obs"] == len(terms)
        assert got["amihud_x1e6"] == pytest.approx(np.mean(terms), abs=1e-4)
        checked += 1
    assert checked == len(rows)


def test_event_study_baseline_is_zero_and_matches_pandas(spark):
    from cdc_streamming___v2_spark.operators.causal import (
        ES_SEGMENT,
        ES_WINDOW,
        event_study_did,
    )

    rows = {r["rel_month"]: r for r in event_study_did(spark, SF_SMALL).collect()}
    assert len(rows) == 2 * ES_WINDOW + 1
    assert rows[-1]["did_coef"] == pytest.approx(0.0, abs=1e-9)
    c = pd.read_parquet(f"{SF_SMALL}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    od = pd.to_datetime(o["o_orderdate"])
    o["m"] = (od.dt.year - 1997) * 12 + od.dt.month - 1
    o = o[(o["m"] >= -ES_WINDOW) & (o["m"] <= ES_WINDOW)]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["tr"] = j["c_mktsegment"] == ES_SEGMENT
    nt = int((c["c_mktsegment"] == ES_SEGMENT).sum())
    nc = len(c) - nt
    s = j.groupby(["m", "tr"])["cents"].sum()

    def gap(m):
        st = s.get((m, True), 0) / nt
        sc = s.get((m, False), 0) / nc
        return (st - sc) / 100.0

    b = gap(-1)
    for m in range(-ES_WINDOW, ES_WINDOW + 1):
        assert rows[m]["did_coef"] == pytest.approx(gap(m) - b, abs=1e-3), m


# ---- wave BB twins ----


def test_wave_bb_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators.analytics import (
        spectral_entropy_weekly,
    )
    from cdc_streamming___v2_spark.operators.text_analysis import (
        fleiss_kappa_filters,
    )
    from cdc_streamming___v2_spark.operators.timeseries_ext import (
        haar_energy_levels,
    )

    for fn in (haar_energy_levels, spectral_entropy_weekly,
               fleiss_kappa_filters):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def _daily_cents_ba(sf_dir: str) -> np.ndarray:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    o["xc"] = (o["o_totalprice"] * 100).round().astype("int64")
    d = o.groupby("o_orderdate")["xc"].sum().sort_index()
    return d


def test_haar_energies_match_numpy_cascade(spark):
    from cdc_streamming___v2_spark.operators.timeseries_ext import (
        HAAR_LEVELS,
        haar_energy_levels,
    )

    rows = {r["level"]: r for r in haar_energy_levels(spark, SF_SMALL).collect()}
    x = _daily_cents_ba(SF_SMALL).to_numpy(np.int64)
    energies = {}
    cur = x
    for lvl in range(1, HAAR_LEVELS + 1):
        n2 = len(cur) // 2
        a, b = cur[: 2 * n2 : 2], cur[1 : 2 * n2 : 2]
        energies[lvl] = (len(a), ((a - b).astype(object) ** 2).sum())
        cur = a + b
    te = sum(e for _, e in energies.values())
    for lvl, (npairs, e) in energies.items():
        got = rows[lvl]
        assert got["n_pairs"] == npairs
        assert got["energy_share"] == pytest.approx(e / te, abs=1e-5)
        assert got["rms_detail_dollars"] == pytest.approx(
            np.sqrt(float(e) / npairs) / 100.0, rel=1e-6)


def test_spectral_entropy_matches_numpy_dft(spark):
    """Full complex-exponential DFT at k/7 — independent of the inlined
    7-literal trig tables."""
    from cdc_streamming___v2_spark.operators.analytics import (
        SPECTRAL_HARMONICS,
        spectral_entropy_weekly,
    )

    row = spectral_entropy_weekly(spark, SF_SMALL).collect()[0]
    d = _daily_cents_ba(SF_SMALL)
    days = (pd.to_datetime(d.index) - pd.Timestamp("1995-01-01")).days
    n = len(d)
    y = n * d.to_numpy(float) - d.sum()
    powers = []
    for k in range(1, SPECTRAL_HARMONICS + 1):
        z = np.exp(-2j * np.pi * k * np.asarray(days) / 7.0)
        # the engine rounds each trig term to the unit grid before folding
        c = np.round(y * z.real).sum()
        s_ = np.round(y * (-z.imag)).sum()
        powers.append(c * c + s_ * s_)
    shares = np.array(powers) / sum(powers)
    ent = -(shares[shares > 0] * np.log(shares[shares > 0])).sum() / np.log(
        SPECTRAL_HARMONICS)
    assert row["n_days"] == n
    for k in range(1, SPECTRAL_HARMONICS + 1):
        assert row[f"share_h{k}"] == pytest.approx(shares[k - 1], abs=1e-5)
    assert row["spectral_entropy"] == pytest.approx(ent, abs=1e-5)
    assert 0.0 <= row["spectral_entropy"] <= 1.0 + 1e-9


def test_fleiss_kappa_matches_per_doc_formula(spark):
    """Collect the per-doc keep-vote count from the ensemble op itself
    (already oracle-proven) and recompute kappa doc-by-doc."""
    from cdc_streamming___v2_spark.operators.text_analysis import (
        fleiss_kappa_filters,
        quality_ensemble_vote,
    )

    row = fleiss_kappa_filters(spark, SF_SMALL).collect()[0]
    votes = quality_ensemble_vote(spark, SF_SMALL).select(
        "vote_length", "vote_quality", "vote_lang"
    ).toPandas()
    k = votes.astype(int).sum(axis=1).to_numpy()
    n = len(k)
    p1 = k.sum() / (3 * n)
    p_i = (k * (k - 1) + (3 - k) * (2 - k)) / 6.0
    pbar = p_i.mean()
    pe = p1 ** 2 + (1 - p1) ** 2
    kappa = (pbar - pe) / (1 - pe)
    assert row["n_docs"] == n
    assert row["p_bar"] == pytest.approx(pbar, abs=1e-5)
    assert row["p_chance"] == pytest.approx(pe, abs=1e-5)
    assert row["fleiss_kappa"] == pytest.approx(kappa, abs=1e-5)


# ---- wave BC twins ----


def test_wave_bc_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        huber_irls_trend,
    )
    from cdc_streamming___v2_spark.operators.timeseries_ext import (
        croston_intermittent_demand,
        theta_method_forecast,
    )

    for fn in (theta_method_forecast, croston_intermittent_demand,
               huber_irls_trend):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def _ses_recursive(x, alpha):
    """Literal SES recursion — the independent twin of the closed
    exponentially-weighted form."""
    lvl = x[0]
    for v in x[1:]:
        lvl = alpha * v + (1 - alpha) * lvl
    return lvl


def test_theta_matches_recursive_ses(spark):
    from cdc_streamming___v2_spark.operators.timeseries_ext import (
        THETA_ALPHA,
        THETA_H,
        theta_method_forecast,
    )

    rows = {r["h"]: r for r in theta_method_forecast(spark, SF_SMALL).collect()}
    assert len(rows) == THETA_H
    d = _daily_cents_ba(SF_SMALL)
    x = d.to_numpy(float)
    lvl = _ses_recursive(x, THETA_ALPHA) / 100.0
    # closed form truncates weights below (1-a)^120 ~ 2e-19: sub-cent
    assert rows[1]["ses_level"] == pytest.approx(lvl, abs=0.05)
    t = (pd.to_datetime(d.index) - pd.Timestamp("1995-01-01")).days.to_numpy(
        float)
    b, a = np.polyfit(t, x, 1)
    for h in range(1, THETA_H + 1):
        theta = lvl + b / 100.0 / 2.0 * (h - 1 + 1 / THETA_ALPHA)
        assert rows[h]["theta_forecast"] == pytest.approx(theta, abs=0.1), h
        assert rows[h]["trend_forecast"] == pytest.approx(
            (a + b * (t.max() + h)) / 100.0, abs=0.05), h
    # drift: consecutive horizons differ by exactly b/2
    for h in range(2, THETA_H + 1):
        assert (rows[h]["theta_forecast"] - rows[h - 1]["theta_forecast"]
                ) == pytest.approx(b / 200.0, abs=0.02)


def test_croston_matches_recursive_ses(spark):
    from cdc_streamming___v2_spark.operators.timeseries_ext import (
        CROSTON_ALPHA,
        CROSTON_MOD,
        croston_intermittent_demand,
    )

    rows = {r["partkey"]: r
            for r in croston_intermittent_demand(spark, SF_SMALL).collect()}
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate", "l_quantity"])
    li = li[li["l_partkey"] % CROSTON_MOD == 0]
    dem = li.groupby(["l_partkey", "l_shipdate"])["l_quantity"].sum()
    checked = 0
    for pk, g in dem.groupby(level=0):
        g = g.sort_index()
        if len(g) < 2:
            assert pk not in rows
            continue
        days = pd.to_datetime(g.index.get_level_values(1))
        z = g.to_numpy(float)
        gaps = np.diff(days.values).astype("timedelta64[D]").astype(float)
        sz = _ses_recursive(z, CROSTON_ALPHA)
        sg = _ses_recursive(gaps, CROSTON_ALPHA)
        got = rows[pk]
        assert got["n_demands"] == len(g)
        assert got["ses_size"] == pytest.approx(sz, abs=1e-3), pk
        assert got["ses_interval_days"] == pytest.approx(sg, abs=1e-3), pk
        assert got["croston_daily_rate"] == pytest.approx(sz / sg, abs=1e-4)
        checked += 1
    assert checked == len(rows) and checked > 0


def test_huber_matches_statsmodels_free_irls(spark):
    """Literal numpy fixed-scale IRLS loop (2 steps) with the same
    micro-rounded weights."""
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        HUBER_K,
        HUBER_MAD_C,
        huber_irls_trend,
    )

    row = huber_irls_trend(spark, SF_SMALL).collect()[0]
    d = _daily_cents_ba(SF_SMALL)
    x = d.to_numpy(float)
    t = (pd.to_datetime(d.index) - pd.Timestamp("1995-01-01")).days.to_numpy(
        float)
    b, a = np.polyfit(t, x, 1)
    ae = np.round(np.abs(x - a - b * t))
    s = HUBER_MAD_C * np.sort(ae)[(len(ae) + 1) // 2 - 1]
    bb, aa = b, a
    n_down1 = None
    for step in range(2):
        e = np.abs(x - aa - bb * t)
        w = np.round(np.where(e <= HUBER_K * s, 1.0, HUBER_K * s / e) * 1e6)
        if step == 0:
            n_down1 = int((w < 1e6).sum())
        W = w
        sw, swt, swtt = W.sum(), (W * t).sum(), (W * t * t).sum()
        swx, swtx = (W * x).sum(), (W * t * x).sum()
        bb = (sw * swtx - swt * swx) / (sw * swtt - swt * swt)
        aa = (swx - bb * swt) / sw
    assert row["n_days"] == len(x)
    assert row["ols_slope_usd"] == pytest.approx(b / 100.0, abs=1e-4)
    assert row["huber_slope_usd"] == pytest.approx(bb / 100.0, abs=1e-4)
    assert row["scale_mad_usd"] == pytest.approx(s / 100.0, abs=0.02)
    assert row["frac_downweighted"] == pytest.approx(
        n_down1 / len(x), abs=1e-3)
    # robustness sanity: some days must actually be downweighted
    assert row["frac_downweighted"] > 0
