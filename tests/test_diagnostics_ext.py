"""Wave-AW diagnostics tests: blanket plan audit + driver-side
brute-force twins.  Value parity vs DuckDB is the oracle gate's job;
these twins recompute each statistic from raw parquet with numpy along a
DIFFERENT formula path (np.polyfit / explicit central moments /
contingency loops), which catches closed-form mistakes a shared-formula
oracle cannot (the grubbs sqrt(n) lesson)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_SMALL


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _daily_cents(sf_dir: str) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    o["xc"] = (o["o_totalprice"] * 100).round().astype("int64")
    d = o.groupby("o_orderdate", as_index=False)["xc"].sum()
    d = d.sort_values("o_orderdate").reset_index(drop=True)
    d["t"] = (pd.to_datetime(d["o_orderdate"])
              - pd.Timestamp("1995-01-01")).dt.days.astype("int64")
    return d


def _resid_dollars(d: pd.DataFrame) -> np.ndarray:
    # independent fit path: np.polyfit instead of cross-multiplied moments
    b, a = np.polyfit(d["t"].to_numpy(float), d["xc"].to_numpy(float), 1)
    e = (d["xc"].to_numpy(float) - a - b * d["t"].to_numpy(float)) / 100.0
    return np.round(e)


def test_diagnostics_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators import diagnostics_ext as DX

    for fn in (
        DX.jarque_bera_test,
        DX.breusch_pagan_test,
        DX.arch_lm_test,
        DX.dickey_fuller_test,
        DX.bartlett_test,
        DX.mood_median_test,
    ):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_jarque_bera_matches_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        jarque_bera_test,
    )

    row = jarque_bera_test(spark, SF_SMALL).collect()[0]
    e = _resid_dollars(_daily_cents(SF_SMALL))
    n = len(e)
    m2 = ((e - e.mean()) ** 2).mean()
    m3 = ((e - e.mean()) ** 3).mean()
    m4 = ((e - e.mean()) ** 4).mean()
    skew = m3 / m2 ** 1.5
    exk = m4 / m2 ** 2 - 3.0
    jb = n / 6.0 * (skew ** 2 + exk ** 2 / 4.0)
    assert row["n_days"] == n
    assert row["skewness"] == pytest.approx(skew, abs=1e-4)
    assert row["ex_kurtosis"] == pytest.approx(exk, abs=1e-4)
    assert row["jb_stat"] == pytest.approx(jb, rel=1e-4)
    assert row["verdict"] == ("non_normal" if jb > 5.991 else "normal")


def test_breusch_pagan_matches_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        breusch_pagan_test,
    )

    row = breusch_pagan_test(spark, SF_SMALL).collect()[0]
    d = _daily_cents(SF_SMALL)
    g = _resid_dollars(d) ** 2
    t = d["t"].to_numpy(float)
    r = np.corrcoef(t, g)[0, 1] ** 2
    assert row["n_days"] == len(g)
    assert row["r2_aux"] == pytest.approx(r, abs=1e-5)
    assert row["lm_stat"] == pytest.approx(len(g) * r, rel=1e-3)


def test_arch_lm_matches_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.diagnostics_ext import arch_lm_test

    row = arch_lm_test(spark, SF_SMALL).collect()[0]
    g = _resid_dollars(_daily_cents(SF_SMALL)) ** 2
    r = np.corrcoef(g[:-1], g[1:])[0, 1] ** 2
    assert row["n_obs"] == len(g) - 1
    assert row["r2_aux"] == pytest.approx(r, abs=1e-5)
    assert row["lm_stat"] == pytest.approx((len(g) - 1) * r, rel=1e-3)


def test_dickey_fuller_matches_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        dickey_fuller_test,
    )

    row = dickey_fuller_test(spark, SF_SMALL).collect()[0]
    x = _daily_cents(SF_SMALL)["xc"].to_numpy(float)
    x1, dd = x[:-1], np.diff(x)
    X = np.column_stack([np.ones_like(x1), x1])
    beta, *_ = np.linalg.lstsq(X, dd, rcond=None)
    resid = dd - X @ beta
    m = len(dd)
    s2 = (resid ** 2).sum() / (m - 2)
    se = np.sqrt(s2 / ((x1 - x1.mean()) ** 2).sum())
    t = beta[1] / se
    assert row["n_obs"] == m
    assert row["rho_hat"] == pytest.approx(beta[1], abs=1e-6)
    assert row["adf_t"] == pytest.approx(t, abs=1e-3)
    # an order series with drift must not be called stationary spuriously
    assert row["verdict"] == ("stationary" if t < -2.86 else "unit_root")


def test_bartlett_matches_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.diagnostics_ext import bartlett_test

    row = bartlett_test(spark, SF_SMALL).collect()[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet",
                         columns=["event_type", "value"])
    ev["vc"] = (ev["value"] * 100).round().astype("int64")
    groups = [g["vc"].to_numpy(float) for _, g in ev.groupby("event_type")
              if len(g) >= 2]
    k = len(groups)
    ns = np.array([len(g) for g in groups], float)
    vs = np.array([g.var(ddof=1) for g in groups])
    nt = ns.sum()
    sp2 = ((ns - 1) * vs).sum() / (nt - k)
    b = ((nt - k) * np.log(sp2) - ((ns - 1) * np.log(vs)).sum()) / (
        1.0 + ((1.0 / (ns - 1)).sum() - 1.0 / (nt - k)) / (3.0 * (k - 1))
    )
    assert row["k_groups"] == k
    assert row["n_total"] == int(nt)
    assert row["pooled_var"] == pytest.approx(sp2, rel=1e-6)
    assert row["bartlett_stat"] == pytest.approx(b, abs=1e-3)


def test_mood_median_matches_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        mood_median_test,
    )

    row = mood_median_test(spark, SF_SMALL).collect()[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet",
                         columns=["event_type", "value"])
    ev["vc"] = (ev["value"] * 100).round().astype("int64")
    vals = np.sort(ev["vc"].to_numpy())
    med = vals[(len(vals) + 1) // 2 - 1]  # exact lower median
    assert row["grand_median"] == pytest.approx(med / 100.0, abs=1e-9)
    chi = 0.0
    nn = len(ev)
    ta = int((ev["vc"] > med).sum())
    tb = nn - ta
    for _, g in ev.groupby("event_type"):
        a = int((g["vc"] > med).sum())
        b = len(g) - a
        r = a + b
        for obs, ctot in ((a, ta), (b, tb)):
            exp = r * ctot / nn
            chi += (obs - exp) ** 2 / exp
    assert row["k_groups"] == ev["event_type"].nunique()
    assert row["chi2_stat"] == pytest.approx(chi, abs=1e-3)
    crit = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488}[ev["event_type"].nunique() - 1]
    assert row["verdict"] == (
        "medians_differ" if chi > crit else "medians_equal"
    )


# ---- wave AX twins ----


def _events_cents(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    ev["vc"] = (ev["value"] * 100).round().astype("int64")
    return ev


def test_ax_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators import diagnostics_ext as DX

    for fn in (
        DX.cliffs_delta_pairs,
        DX.effect_size_pairs,
        DX.partial_corr_daily,
        DX.cronbach_alpha,
    ):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_cliffs_delta_matches_bruteforce(spark):
    """O(n1*n2) literal pair count vs the doubled-midrank identity."""
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        cliffs_delta_pairs,
    )

    rows = {(r["type_a"], r["type_b"]): r
            for r in cliffs_delta_pairs(spark, SF_SMALL).collect()}
    ev = _events_cents(SF_SMALL)
    by = {t: g["vc"].to_numpy() for t, g in ev.groupby("event_type")}
    types = sorted(by)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            x, y = by[ta], by[tb]
            gt = (x[:, None] > y[None, :]).sum()
            lt = (x[:, None] < y[None, :]).sum()
            delta = (int(gt) - int(lt)) / (len(x) * len(y))
            r = rows[(ta, tb)]
            assert r["n_a"] == len(x) and r["n_b"] == len(y)
            assert r["cliffs_delta"] == pytest.approx(delta, abs=1e-6)
            mag = ("negligible" if abs(delta) < 0.147 else
                   "small" if abs(delta) < 0.33 else
                   "medium" if abs(delta) < 0.474 else "large")
            assert r["magnitude"] == mag, (ta, tb)


def test_effect_sizes_match_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        effect_size_pairs,
    )

    rows = {(r["type_a"], r["type_b"]): r
            for r in effect_size_pairs(spark, SF_SMALL).collect()}
    ev = _events_cents(SF_SMALL)
    by = {t: g["vc"].to_numpy(float) for t, g in ev.groupby("event_type")}
    types = sorted(by)
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            x, y = by[ta], by[tb]
            sp = np.sqrt(((len(x) - 1) * x.var(ddof=1)
                          + (len(y) - 1) * y.var(ddof=1))
                         / (len(x) + len(y) - 2))
            d = (x.mean() - y.mean()) / sp
            g = d * (1 - 3 / (4 * (len(x) + len(y)) - 9))
            r = rows[(ta, tb)]
            assert r["cohen_d"] == pytest.approx(d, abs=1e-5)
            assert r["hedges_g"] == pytest.approx(g, abs=1e-5)
            assert r["glass_delta"] == pytest.approx(
                (x.mean() - y.mean()) / x.std(ddof=1), abs=1e-5)


def test_partial_corr_matches_bruteforce(spark):
    """Residual-on-residual correlation path vs the closed 3-corr form."""
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        partial_corr_daily,
    )

    row = partial_corr_daily(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    o["xc"] = (o["o_totalprice"] * 100).round().astype("int64")
    d = o.groupby("o_orderdate").agg(xc=("xc", "sum"), yc=("xc", "size"))
    d = d.reset_index()
    t = (pd.to_datetime(d["o_orderdate"])
         - pd.Timestamp("1995-01-01")).dt.days.to_numpy(float)
    x, y = d["xc"].to_numpy(float), d["yc"].to_numpy(float)
    rx = x - np.polyval(np.polyfit(t, x, 1), t)
    ry = y - np.polyval(np.polyfit(t, y, 1), t)
    rp = np.corrcoef(rx, ry)[0, 1]
    assert row["n_days"] == len(d)
    assert row["r_xy"] == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-6)
    assert row["r_partial"] == pytest.approx(rp, abs=1e-6)


def test_cronbach_alpha_matches_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        cronbach_alpha,
    )

    row = cronbach_alpha(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    o["o_orderdate"] = pd.to_datetime(o["o_orderdate"])
    o = o[o["o_orderdate"].dt.year == 1997].copy()
    o["q"] = o["o_orderdate"].dt.quarter
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    p = o.pivot_table(index="o_custkey", columns="q", values="cents",
                      aggfunc="sum", fill_value=0)
    for q in (1, 2, 3, 4):
        if q not in p.columns:
            p[q] = 0
    items = p[[1, 2, 3, 4]].to_numpy(float)
    iv = items.var(axis=0, ddof=1).sum()
    tv = items.sum(axis=1).var(ddof=1)
    alpha = 4.0 / 3.0 * (1 - iv / tv)
    assert row["n_subjects"] == len(p)
    assert row["alpha"] == pytest.approx(alpha, abs=1e-5)
