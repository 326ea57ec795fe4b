"""Round-7-session operator tests: Holt-Winters recursion twin and
companions."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .conftest import SF_SMALL


def test_holt_winters_matches_actual_recursion(spark):
    """Twin: run the REAL additive HW recursion on the observed monthly
    totals (pandas/float path) — the operator itself never recurses, it
    folds Python-literal linearization weights."""
    from cdc_streamming___v2_spark.operators.timeseries_ext import (
        HW_ALPHA,
        HW_BETA,
        HW_GAMMA,
        HW_H,
        HW_T,
        holt_winters_forecast,
    )

    rows = holt_winters_forecast(spark, SF_SMALL).collect()
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    t = (o["o_orderdate"].dt.year - 1995) * 12 + o["o_orderdate"].dt.month - 1
    cents = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    y = np.zeros(HW_T)
    for ti, c in zip(t, cents):
        if 0 <= ti < HW_T:
            y[ti] += c
    lv = y[:12].mean()
    tr = (y[12:24].mean() - y[:12].mean()) / 12.0
    s = list(y[:12] - lv)
    for ti in range(12, HW_T):
        prev = lv
        lv = HW_ALPHA * (y[ti] - s[ti % 12]) + (1 - HW_ALPHA) * (lv + tr)
        tr = HW_BETA * (lv - prev) + (1 - HW_BETA) * tr
        s[ti % 12] = HW_GAMMA * (y[ti] - lv) + (1 - HW_GAMMA) * s[ti % 12]
    assert len(rows) == HW_H
    for row in rows:
        h = row["h"]
        fc = lv + h * tr + s[(HW_T - 1 + h) % 12]
        assert abs(row["hw_forecast"] - fc / 100.0) < 0.02, h
    # seasonality sanity: the 12 forecasts are not a straight line (the
    # seasonal state must contribute), unless the corpus is degenerate
    fcs = np.array([r["hw_forecast"] for r in rows])
    drift = fcs[1] - fcs[0]
    assert not np.allclose(np.diff(fcs), drift, rtol=1e-3)


def test_holt_winters_plan_no_cartesian_scan(spark):
    from cdc_streamming___v2_spark.operators.timeseries_ext import (
        holt_winters_forecast,
    )

    df = holt_winters_forecast(spark, SF_SMALL)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
