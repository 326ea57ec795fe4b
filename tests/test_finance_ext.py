"""Wave-AY finance/actuarial tests: blanket plan audit + brute-force
twins along independent formula paths (literal O(n^2) sign sums for
Pettitt, a pandas triangle loop for chain-ladder)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_SMALL


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _daily(sf_dir: str) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    o["xc"] = (o["o_totalprice"] * 100).round().astype("int64")
    return (o.groupby("o_orderdate", as_index=False)["xc"].sum()
            .sort_values("o_orderdate").reset_index(drop=True))


def _returns_pico(sf_dir: str) -> np.ndarray:
    x = _daily(sf_dir)["xc"].to_numpy(float)
    return np.round((x[1:] - x[:-1]) / x[:-1] * 1e9)


def test_finance_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators import finance_ext as FX

    for fn in (
        FX.var_cvar_daily,
        FX.sortino_sharpe_daily,
        FX.chain_ladder_ultimates,
        FX.theil_u2_forecast,
        FX.pettitt_changepoint,
    ):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_var_cvar_matches_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.finance_ext import var_cvar_daily

    row = var_cvar_daily(spark, SF_SMALL).collect()[0]
    r = np.sort(_returns_pico(SF_SMALL))
    m = len(r)
    k = max(1, (m * 5) // 100)
    assert row["n_obs"] == m and row["k_tail"] == k
    assert row["var_95"] == pytest.approx(-r[k - 1] / 1e9, abs=1e-6)
    assert row["cvar_95"] == pytest.approx(-r[:k].mean() / 1e9, abs=1e-6)
    # losses: CVaR dominates VaR by construction
    assert row["cvar_95"] >= row["var_95"] - 1e-12


def test_sortino_sharpe_matches_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.finance_ext import (
        sortino_sharpe_daily,
    )

    row = sortino_sharpe_daily(spark, SF_SMALL).collect()[0]
    r = _returns_pico(SF_SMALL) / 1e9
    mu, sd = r.mean(), r.std(ddof=1)
    dd = np.sqrt((np.minimum(r, 0.0) ** 2).mean())
    assert row["n_obs"] == len(r)
    assert row["mean_daily_ret"] == pytest.approx(mu, abs=1e-7)
    assert row["sharpe_annual"] == pytest.approx(
        mu / sd * np.sqrt(365), abs=1e-3)
    assert row["sortino_annual"] == pytest.approx(
        mu / dd * np.sqrt(365), abs=1e-3)


def test_chain_ladder_matches_bruteforce(spark):
    """Pandas triangle loop: pivot cumulative, per-age factor, per-cohort
    factor product — validates the ln-fold path end to end."""
    from cdc_streamming___v2_spark.operators.finance_ext import (
        CL_MAX_AGE,
        chain_ladder_ultimates,
    )

    rows = {r["cohort"]: r
            for r in chain_ladder_ultimates(spark, SF_SMALL).collect()}
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate",
                                  "l_extendedprice"])
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    od = pd.to_datetime(j["o_orderdate"])
    sd = pd.to_datetime(j["l_shipdate"])
    j["cm"] = od.dt.year * 12 + (od.dt.month - 1)
    j["age"] = (sd.dt.year * 12 + sd.dt.month - 1) - j["cm"]
    j["cents"] = (j["l_extendedprice"] * 100).round().astype("int64")
    j = j[(j["age"] >= 0) & (j["age"] <= CL_MAX_AGE)]
    tri = j.groupby(["cm", "age"])["cents"].sum().unstack(fill_value=0)
    tri = tri.reindex(columns=range(CL_MAX_AGE + 1), fill_value=0)
    cum = tri.cumsum(axis=1)
    aod = int((j["cm"] + j["age"]).max())
    factors = {}
    for a in range(CL_MAX_AGE):
        mask = (cum.index + a + 1 <= aod) & (cum[a] > 0)
        if mask.any():
            factors[a] = cum.loc[mask, a + 1].sum() / cum.loc[mask, a].sum()
    assert len(rows) == len(cum)
    for cm, r in cum.iterrows():
        la = min(CL_MAX_AGE, aod - cm)
        paid = r[la]
        ult = float(paid)
        for a in range(la, CL_MAX_AGE):
            if a in factors:
                # the engine folds round(ln(f), 12); mirror that grid
                ult *= np.exp(round(np.log(factors[a]), 12))
        key = f"{cm // 12:04d}-{cm % 12 + 1:02d}"
        got = rows[key]
        assert got["latest_age"] == la, key
        assert got["paid"] == pytest.approx(paid / 100.0, abs=0.02), key
        assert got["ultimate"] == pytest.approx(ult / 100.0, rel=1e-9,
                                                abs=0.02), key
        assert got["reserve"] == pytest.approx((ult - paid) / 100.0,
                                               rel=1e-6, abs=0.03), key
        assert got["ultimate"] >= got["paid"] - 1e-9 or not factors


def test_theil_u2_matches_bruteforce(spark):
    from cdc_streamming___v2_spark.operators.finance_ext import theil_u2_forecast

    row = theil_u2_forecast(spark, SF_SMALL).collect()[0]
    x = _daily(SF_SMALL)["xc"].to_numpy(float)
    num = ((x[:-7] - x[7:]) ** 2).sum()
    den = ((x[6:-1] - x[7:]) ** 2).sum()
    assert row["n_obs"] == len(x) - 7
    assert row["u2_seasonal"] == pytest.approx(np.sqrt(num / den), abs=1e-5)


def test_pettitt_matches_bruteforce_sign_sums(spark):
    """Literal O(n^2) Pettitt U_t = sum_{i<=t, j>t} sgn(x_j - x_i) vs the
    doubled-midrank identity."""
    from cdc_streamming___v2_spark.operators.finance_ext import (
        pettitt_changepoint,
    )

    row = pettitt_changepoint(spark, SF_SMALL).collect()[0]
    d = _daily(SF_SMALL)
    x = d["xc"].to_numpy()
    n = len(x)
    sgn = np.sign(x[None, :] - x[:, None])  # sgn(x_j - x_i)
    best_k, best_day = -1, None
    for t in range(1, n):
        u = int(sgn[:t, t:].sum())
        if abs(u) > best_k:
            best_k, best_day = abs(u), d["o_orderdate"].iloc[t - 1]
    assert row["n_days"] == n
    assert row["k_stat"] == best_k
    assert row["change_day"] == best_day
    p = 2 * np.exp(-6.0 * best_k ** 2 / (n ** 3 + n ** 2))
    assert row["p_approx"] == pytest.approx(p, abs=1e-6)
