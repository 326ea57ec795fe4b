"""Spatial-tier tests: dense-matrix brute-force twins (full W matrix in
numpy — the formulation the operators deliberately avoid) + plan audits."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from .conftest import SF_SMALL


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _cells_pandas() -> pd.DataFrame:
    """Recompute the cell frame with hashlib/pandas (independent path)."""
    from cdc_streamming___v2_spark.operators.spatial_ext import (
        SPATIAL_CELL_DEG,
        _GRID,
    )

    c = pd.read_parquet(
        f"{SF_SMALL}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )

    def h(salt, k):
        return int(hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:8], 16)

    lat = np.array(
        [h("lat", k) % (120 * _GRID) / _GRID - 60.0 for k in c["c_custkey"]]
    )
    lon = np.array(
        [h("lon", k) % (360 * _GRID) / _GRID - 180.0 for k in c["c_custkey"]]
    )
    df = pd.DataFrame(
        {
            "cy": np.floor(lat / SPATIAL_CELL_DEG).astype(np.int64),
            "cx": np.floor(lon / SPATIAL_CELL_DEG).astype(np.int64),
            "cents": np.round(c["c_acctbal"].to_numpy() * 100).astype(
                np.int64
            ),
        }
    )
    g = df.groupby(["cy", "cx"], as_index=False).agg(
        cnt=("cents", "size"), sc=("cents", "sum")
    )
    g["mi"] = np.round(np.round(g["sc"] / g["cnt"], 4) * 10000.0).astype(
        np.int64
    )
    return g


def _w_matrix(g: pd.DataFrame) -> np.ndarray:
    idx = {(r.cy, r.cx): i for i, r in enumerate(g.itertuples())}
    n = len(g)
    W = np.zeros((n, n))
    for (cy, cx), i in idx.items():
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            j = idx.get((cy + dy, cx + dx))
            if j is not None:
                W[i, j] = 1.0
    return W


def test_spatial_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators.spatial_ext import (
        getis_ord_hotspots,
        join_count_spatial,
        morans_i_acctbal,
    )

    for fn in (morans_i_acctbal, join_count_spatial, getis_ord_hotspots):
        p = _plan(spark, fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_morans_i_matches_dense_matrix(spark):
    from cdc_streamming___v2_spark.operators.spatial_ext import (
        morans_i_acctbal,
    )

    row = morans_i_acctbal(spark, SF_SMALL).collect()[0]
    g = _cells_pandas()
    W = _w_matrix(g)
    x = g["mi"].to_numpy().astype(float)
    n = len(x)
    z = x - x.mean()
    w_total = W.sum()
    i_stat = (n / w_total) * (z @ W @ z) / (z @ z)
    e_i = -1.0 / (n - 1)
    s1 = 0.5 * ((W + W.T) ** 2).sum()
    s2 = ((W.sum(axis=0) + W.sum(axis=1)) ** 2).sum()
    var_i = (n * n * s1 - n * s2 + 3 * w_total * w_total) / (
        w_total * w_total * (n * n - 1)
    ) - e_i * e_i
    z_score = (i_stat - e_i) / math.sqrt(var_i)
    assert row["n_cells"] == n
    assert row["w_pairs"] * 2 == int(w_total)
    assert abs(row["morans_i"] - i_stat) < 1e-6
    assert abs(row["expected_i"] - e_i) < 1e-6
    assert abs(row["z_score"] - z_score) < 1e-5


def test_join_counts_match_dense_matrix(spark):
    from cdc_streamming___v2_spark.operators.spatial_ext import (
        join_count_spatial,
    )

    row = join_count_spatial(spark, SF_SMALL).collect()[0]
    g = _cells_pandas()
    W = _w_matrix(g)
    mi = g["mi"].to_numpy()
    order = np.lexsort((g["cx"].to_numpy(), g["cy"].to_numpy(), mi))
    med = mi[order[(len(mi) + 1) // 2 - 1]]
    b = (mi > med).astype(float)
    n, k = len(b), int(b.sum())
    j = W.sum() / 2
    bb = (b @ W @ b) / 2
    ww = ((1 - b) @ W @ (1 - b)) / 2
    assert row["n_cells"] == n and row["n_black"] == k
    assert row["n_joins"] == int(j)
    assert row["bb_observed"] == int(bb)
    assert row["ww_observed"] == int(ww)
    assert row["bw_observed"] == int(j - bb - ww)
    assert abs(row["bb_expected"] - j * k * (k - 1) / (n * (n - 1))) < 1e-3
    assert (
        abs(
            row["bw_expected"] - 2 * j * k * (n - k) / (n * (n - 1))
        )
        < 1e-3
    )


def test_getis_ord_matches_dense_matrix(spark):
    from cdc_streamming___v2_spark.operators.spatial_ext import (
        getis_ord_hotspots,
    )

    rows = getis_ord_hotspots(spark, SF_SMALL).collect()
    g = _cells_pandas()
    W = _w_matrix(g) + np.eye(len(g))  # self-inclusive
    x = g["mi"].to_numpy().astype(float)
    n = len(x)
    xbar, s = x.mean(), math.sqrt((x * x).mean() - x.mean() ** 2)
    zs = {}
    for i, r in enumerate(g.itertuples()):
        k = W[i].sum()
        num = W[i] @ x - xbar * k
        den = s * math.sqrt((n * k - k * k) / (n - 1))
        zs[(r.cy, r.cx)] = num / den
    ranked = sorted(
        zs.items(), key=lambda kv: (-abs(round(kv[1], 6)), kv[0])
    )[:20]
    assert len(rows) == 20
    for row, ((cy, cx), z) in zip(rows, ranked):
        assert (row["cy"], row["cx"]) == (cy, cx)
        assert abs(row["gi_z"] - z) < 1e-5
