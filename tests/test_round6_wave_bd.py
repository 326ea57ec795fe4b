"""Wave-BD tests: extreme-value/tail tier brute-force twins along
independent numpy/pandas paths (the grubbs/pettitt lesson: oracle
parity proves engine agreement, not formula correctness) + plan
audits."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_SMALL


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _order_cents() -> np.ndarray:
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet", columns=["o_totalprice"])
    return np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)


def test_wave_bd_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators.finance_ext import (
        gumbel_block_maxima,
        hill_tail_index,
        lognormal_fit_orders,
    )

    for fn in (hill_tail_index, gumbel_block_maxima, lognormal_fit_orders):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_hill_topk_is_take_ordered(spark):
    """The tail pick must be TakeOrderedAndProject, never a full sort or
    a single-partition full-frame window."""
    from cdc_streamming___v2_spark.operators.finance_ext import hill_tail_index

    p = _plan(spark, hill_tail_index(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in p


def test_hill_matches_numpy_sorted_tail(spark):
    """Brute force: sort all values descending in numpy, apply the
    textbook Hill formula directly on floats (different path: no nano
    grid, no rank window)."""
    from cdc_streamming___v2_spark.operators.finance_ext import (
        HILL_K,
        hill_tail_index,
    )

    row = hill_tail_index(spark, SF_SMALL).collect()[0]
    xc = np.sort(_order_cents())[::-1]
    top, xmin = xc[:HILL_K].astype(float), float(xc[HILL_K])
    alpha = HILL_K / float(np.sum(np.log(top) - math.log(xmin)))
    assert row["k"] == HILL_K
    assert row["xmin_usd"] == pytest.approx(xmin / 100.0, abs=0.01)
    assert row["hill_alpha"] == pytest.approx(alpha, abs=1e-4)


def test_gumbel_matches_pandas_block_maxima(spark):
    """Brute force: pandas groupby-month maxima, numpy mean/std, the
    textbook MoM formulas with math.pi/euler_gamma computed here."""
    from cdc_streamming___v2_spark.operators.finance_ext import (
        GUMBEL_T,
        gumbel_block_maxima,
    )

    row = gumbel_block_maxima(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["xc"] = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    daily = o.groupby("o_orderdate")["xc"].sum()
    ym = pd.to_datetime(daily.index.to_series()).dt.strftime("%Y-%m")
    mx = daily.groupby(ym.values).max().to_numpy(dtype=float)
    mean, s = mx.mean(), mx.std(ddof=1)
    beta = s * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(1.0 - 1.0 / GUMBEL_T))
    assert row["n_blocks"] == len(mx)
    assert row["gumbel_mu_usd"] == pytest.approx(mu / 100.0, abs=0.05)
    assert row["gumbel_beta_usd"] == pytest.approx(beta / 100.0, abs=0.05)
    assert row["return_level_12mo_usd"] == pytest.approx(rl / 100.0, abs=0.05)


def test_lognormal_matches_numpy_log_moments(spark):
    """Brute force: numpy ln-mean/ln-var on floats directly (no nano
    grid, no decimal fold); implied moments from the closed forms."""
    from cdc_streamming___v2_spark.operators.finance_ext import (
        lognormal_fit_orders,
    )

    row = lognormal_fit_orders(spark, SF_SMALL).collect()[0]
    x = _order_cents().astype(float) / 100.0  # dollars
    ln = np.log(x)
    mu, var = ln.mean(), ln.var(ddof=1)
    assert row["n_orders"] == len(x)
    assert row["mu_ln_usd"] == pytest.approx(mu, abs=1e-5)
    assert row["sigma_ln"] == pytest.approx(math.sqrt(var), abs=1e-5)
    assert row["implied_median_usd"] == pytest.approx(math.exp(mu), abs=0.05)
    assert row["implied_mean_usd"] == pytest.approx(
        math.exp(mu + var / 2.0), abs=0.05
    )
    assert row["actual_mean_usd"] == pytest.approx(x.mean(), abs=0.01)
    # the fit audit: implied mean should be in the ballpark of actual
    # (lognormal is a rough model of TPC-H order values, not exact)
    assert 0.5 < row["implied_mean_usd"] / row["actual_mean_usd"] < 2.0
