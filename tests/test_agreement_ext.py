"""Agreement-tier tests: brute-force twins along per-observation pandas
paths (coincidence matrix for alpha, centered arrays for CCC/ICC — never
the operators' own moment identities) + plan audits."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd

from .conftest import SF_SMALL


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_agreement_ops_never_plan_cartesian(spark):
    from cdc_streamming___v2_spark.operators.agreement_ext import (
        bland_altman,
        icc_oneway,
        krippendorff_alpha,
        lin_ccc,
    )

    for fn in (krippendorff_alpha, lin_ccc, bland_altman, icc_oneway):
        p = _plan(spark, fn(spark, SF_SMALL))
        # bland_altman broadcasts its 1-row moment frame back onto the
        # pair frame; that shows as BroadcastNestedLoopJoin, never a
        # CartesianProduct
        assert "CartesianProduct" not in p, fn.__name__


def _doc_votes() -> pd.DataFrame:
    """Reimplement the three ensemble raters with plain Python string ops
    (independent of the Spark column expressions)."""
    from cdc_streamming___v2_spark.functions.texts import (
        EN_STOPWORDS,
        LANG_MARKERS,
    )
    from cdc_streamming___v2_spark.operators.text_analysis import (
        ENSEMBLE_MIN_WORDS,
        _QL_W,
    )

    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    rows = []
    for doc_id, text in zip(d["doc_id"], d["text"]):
        words = re.split(r"\s+", text.strip())
        n_words = len(words)
        sw = sum(1 for w in words if w in set(EN_STOPWORDS))
        punct = len(re.findall(r"[.,!?;:]", text)) / len(text)
        z = (
            _QL_W["bias"]
            + _QL_W["n_words"] * n_words
            + _QL_W["sw_ratio"] * (sw / n_words)
            + _QL_W["punct"] * punct
        )
        v1 = int(n_words >= ENSEMBLE_MIN_WORDS)
        v2 = int(1.0 / (1.0 + math.exp(-z)) >= 0.5)
        v3 = int(
            any(
                any(w in set(mk) for w in words)
                for mk in LANG_MARKERS.values()
            )
        )
        pres = [
            int(hashlib.md5(f"kra{r}{doc_id}".encode()).hexdigest()[:8], 16)
            % 10
            < 7
            for r in (1, 2, 3)
        ]
        rows.append((doc_id, pres, [v1, v2, v3]))
    return rows


def test_krippendorff_matches_coincidence_matrix(spark):
    """Twin via the textbook coincidence-matrix formulation: o_ck counts
    of ordered value pairs within units, alpha = 1 - (n-1) * sum_c o_cc'
    ... computed per-pair, never through the 2k(m-k)/(m-1) identity."""
    from cdc_streamming___v2_spark.operators.agreement_ext import (
        krippendorff_alpha,
    )

    row = krippendorff_alpha(spark, SF_SMALL).collect()[0]
    o = np.zeros((2, 2))  # coincidence matrix
    n_units = 0
    for _doc, pres, votes in _doc_votes():
        vals = [v for p, v in zip(pres, votes) if p]
        m = len(vals)
        if m < 2:
            continue
        n_units += 1
        for i in range(m):
            for j in range(m):
                if i != j:
                    o[vals[i], vals[j]] += 1.0 / (m - 1)
    n = o.sum()
    nc = o.sum(axis=1)
    d_o = (o[0, 1] + o[1, 0]) / n
    d_e = 2.0 * nc[0] * nc[1] / (n * (n - 1.0))
    alpha = 1.0 - d_o / d_e
    assert row["n_units"] == n_units
    assert row["n_values"] == round(n)
    assert abs(row["alpha"] - alpha) < 1e-6
    assert abs(row["d_observed"] - d_o) < 1e-6
    assert abs(row["d_expected"] - d_e) < 1e-6


def _pair_frame() -> pd.DataFrame:
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    li = pd.read_parquet(
        f"{SF_SMALL}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )
    li["net"] = np.round(
        li["l_extendedprice"] * (1 - li["l_discount"]) * (1 + li["l_tax"]) * 100
    ).astype(np.int64)
    y = li.groupby("l_orderkey")["net"].sum()
    o["xc"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    m = o.join(y.rename("yc"), on="o_orderkey", how="inner")
    return m[["xc", "yc"]].astype(float)


def test_lin_ccc_matches_centered_arrays(spark):
    from cdc_streamming___v2_spark.operators.agreement_ext import lin_ccc

    row = lin_ccc(spark, SF_SMALL).collect()[0]
    m = _pair_frame()
    x, y = m["xc"].to_numpy(), m["yc"].to_numpy()
    mx, my = x.mean(), y.mean()
    # population (biased) moments — the n-scaled identities cancel the
    # 1/n factor, so CCC/r are identical for either convention
    sxy = ((x - mx) * (y - my)).mean()
    vx, vy = ((x - mx) ** 2).mean(), ((y - my) ** 2).mean()
    r = sxy / math.sqrt(vx * vy)
    ccc = 2 * sxy / (vx + vy + (mx - my) ** 2)
    assert row["n_orders"] == len(m)
    assert abs(row["pearson_r"] - r) < 1e-6
    assert abs(row["ccc"] - ccc) < 1e-6
    assert abs(row["bias_correction"] - ccc / r) < 1e-6
    assert abs(row["mean_header"] - round(mx / 100, 2)) < 0.011
    assert abs(row["mean_derived"] - round(my / 100, 2)) < 0.011


def test_bland_altman_matches_float_path(spark):
    from cdc_streamming___v2_spark.operators.agreement_ext import bland_altman

    row = bland_altman(spark, SF_SMALL).collect()[0]
    m = _pair_frame()
    d = (m["xc"] - m["yc"]).to_numpy()
    n = len(d)
    mean_d, sd_d = d.mean(), d.std(ddof=1)
    lo, hi = mean_d - 1.96 * sd_d, mean_d + 1.96 * sd_d
    outside = int(((d < lo) | (d > hi)).sum())
    assert row["n_orders"] == n
    assert abs(row["mean_diff"] - mean_d / 100) < 1e-3
    assert abs(row["sd_diff"] - sd_d / 100) < 1e-3
    assert abs(row["loa_low"] - lo / 100) < 1e-3
    assert abs(row["loa_high"] - hi / 100) < 1e-3
    # the exact integer test and the float path can only disagree on an
    # order landing within float-epsilon of a limit; none does here
    assert row["n_outside"] == outside
    assert abs(row["pct_outside"] - outside / n * 100) < 1e-3


def test_icc_oneway_matches_anova_arrays(spark):
    """Twin via actual centered-array ANOVA (group arrays, np subtract)
    rather than the moment identities."""
    from cdc_streamming___v2_spark.operators.agreement_ext import (
        ICC_YEAR,
        icc_oneway,
    )

    row = icc_oneway(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    o = o[o["o_orderdate"].dt.year == ICC_YEAR].copy()
    o["q"] = o["o_orderdate"].dt.quarter
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    panel = (
        o.pivot_table(
            index="o_custkey",
            columns="q",
            values="cents",
            aggfunc="sum",
            fill_value=0,
        )
        .reindex(columns=[1, 2, 3, 4], fill_value=0)
        .to_numpy()
        .astype(float)
    )
    n, k = panel.shape
    grand = panel.mean()
    subj_means = panel.mean(axis=1)
    ssb = k * ((subj_means - grand) ** 2).sum()
    ssw = ((panel - subj_means[:, None]) ** 2).sum()
    msb, msw = ssb / (n - 1), ssw / (n * (k - 1))
    icc = (msb - msw) / (msb + (k - 1) * msw)
    assert row["n_subjects"] == n
    assert abs(row["icc1"] - icc) < 1e-6
    assert abs(row["f_stat"] - msb / msw) < 1e-4
    assert abs(row["ms_between"] - msb / 10000) < 0.011
    assert abs(row["ms_within"] - msw / 10000) < 0.011
