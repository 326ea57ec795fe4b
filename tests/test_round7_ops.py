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


def _surv_frames():
    e = pd.read_parquet(
        f"{SF_SMALL}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    h = e["ts"].dt.date.max()
    s = (
        e[e["event_type"] == "signup"]
        .groupby("user_id")["ts"]
        .min()
        .rename("s_ts")
    )
    return e, h, s


def test_rmst_matches_step_integral(spark):
    """Twin: build the KM curve per-user in pandas and integrate the step
    function numerically (0.5-day grid would be approximate — instead
    walk the exact steps)."""
    from cdc_streamming___v2_spark.operators.behavior import (
        RMST_TAU,
        rmst_survival,
    )

    row = rmst_survival(spark, SF_SMALL).collect()[0]
    e, h, s = _surv_frames()
    p = e[e["event_type"] == "purchase"].merge(
        s, left_on="user_id", right_index=True
    )
    p = p[p["ts"] > p["s_ts"]].groupby("user_id")["ts"].min().rename("p_ts")
    pu = pd.DataFrame({"s_ts": s}).join(p, how="left")
    dur = np.where(
        pu["p_ts"].notna(),
        (pu["p_ts"].dt.date - pu["s_ts"].dt.date).map(
            lambda d: d.days if pd.notna(d) else -1
        ),
        [(h - d).days for d in pu["s_ts"].dt.date],
    ).astype(int)
    observed = pu["p_ts"].notna().to_numpy()
    # KM walk
    order = np.argsort(dur, kind="stable")
    days = sorted(set(dur[observed]))
    n_at_risk = len(dur)
    surv, steps = 1.0, []
    for t in days:
        n_risk = (dur >= t).sum()
        d = ((dur == t) & observed).sum()
        surv *= 1.0 - d / n_risk
        steps.append((t, surv))
    # integrate to tau
    rmst, prev_t, prev_s = 0.0, 0, 1.0
    for t, sv in steps:
        rmst += prev_s * (min(t, RMST_TAU) - min(prev_t, RMST_TAU))
        prev_t, prev_s = t, sv
    rmst += prev_s * (RMST_TAU - min(prev_t, RMST_TAU))
    assert row["tau_days"] == RMST_TAU
    assert abs(row["rmst_days"] - rmst) < 1e-3
    assert abs(row["rmst_share"] - rmst / RMST_TAU) < 1e-3
    assert 0.0 < row["rmst_days"] <= RMST_TAU


def test_cif_matches_per_user_walk_and_sums_to_one(spark):
    """Twin: Aalen-Johansen walk in plain Python + the CIF1 + CIF2 + S = 1
    closure invariant at the last event day."""
    from cdc_streamming___v2_spark.operators.behavior import (
        competing_risks_cif,
    )

    rows = competing_risks_cif(spark, SF_SMALL).collect()
    e, h, s = _surv_frames()
    term = e[e["event_type"].isin(["purchase", "error"])].merge(
        s, left_on="user_id", right_index=True
    )
    term = term[term["ts"] > term["s_ts"]].copy()
    term["cause"] = np.where(term["event_type"] == "purchase", 1, 2)
    # first terminal event with purchase priority on exact-ts ties
    term = term.sort_values(["user_id", "ts", "cause"]).groupby("user_id").first()
    pu = pd.DataFrame({"s_ts": s}).join(term[["ts", "cause"]], how="left")
    dur = np.where(
        pu["ts"].notna(),
        [(t.date() - st.date()).days if pd.notna(t) else -1
         for t, st in zip(pu["ts"], pu["s_ts"])],
        [(h - d).days for d in pu["s_ts"].dt.date],
    ).astype(int)
    cause = pu["cause"].fillna(0).astype(int).to_numpy()
    days = sorted(set(dur[cause > 0]))
    surv, cif1, cif2 = 1.0, 0.0, 0.0
    expect = {}
    for t in days:
        n_risk = (dur >= t).sum()
        d1 = ((dur == t) & (cause == 1)).sum()
        d2 = ((dur == t) & (cause == 2)).sum()
        cif1 += surv * d1 / n_risk
        cif2 += surv * d2 / n_risk
        surv *= 1.0 - (d1 + d2) / n_risk
        expect[t] = (n_risk, d1, d2, cif1, cif2)
    assert len(rows) == len(days)
    for r in rows:
        n_risk, d1, d2, c1, c2 = expect[r["t_days"]]
        assert r["n_risk"] == n_risk
        assert (r["d_purchase"], r["d_error"]) == (d1, d2)
        assert abs(r["cif_purchase"] - c1) < 1e-3
        assert abs(r["cif_error"] - c2) < 1e-3
    # closure: CIF1 + CIF2 + S(last) = 1 exactly (competing risks
    # partition the probability space)
    assert abs(cif1 + cif2 + surv - 1.0) < 1e-9
    last = rows[-1]
    assert abs(last["cif_purchase"] + last["cif_error"] + surv - 1.0) < 1e-3


def test_gesd_matches_sequential_numpy(spark):
    """Twin: actually remove the argmax and recompute moments from the
    raw array each round (no downdating identity)."""
    from cdc_streamming___v2_spark.operators.stats_ext import (
        GESD_ROUNDS,
        gesd_outliers,
    )

    rows = gesd_outliers(spark, SF_SMALL).collect()
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    daily = o.groupby(o["o_orderdate"].dt.date)["cents"].sum().sort_index()
    days = list(daily.index)
    x = daily.to_numpy().astype(float)
    assert len(rows) == GESD_ROUNDS
    for i, row in enumerate(rows, start=1):
        n = len(x)
        mu, sd = x.mean(), x.std(ddof=1)
        r = np.abs(x - mu) / sd
        j = int(np.argmax(r))  # unique-day grid: ties impossible except
        # on exactly equal deviations; replicate the (dev desc, day asc)
        # pick by taking the first index among maxima
        maxdev = np.abs(x - mu).max()
        cands = [k for k in range(n) if np.abs(x[k] - mu) == maxdev]
        j = min(cands, key=lambda k: days[k])
        assert row["round"] == i
        assert row["removed_day"].date() == days[j] or str(
            row["removed_day"]
        ).startswith(str(days[j]))
        assert row["n_at_test"] == n
        assert abs(row["r_stat"] - r[j]) < 1e-3
        assert row["above_mean"] == bool(x[j] > mu)
        x = np.delete(x, j)
        del days[j]


def test_panel_fe_matches_demeaned_regression(spark):
    """Twin: literally demean x and y within customer and run the pooled
    regression on the demeaned arrays."""
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        panel_fe_trend,
    )

    row = panel_fe_trend(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    t = (o["o_orderdate"] - pd.Timestamp("1995-01-01")).dt.days.astype(float)
    y = np.round(o["o_totalprice"] * 100).astype(np.int64).astype(float)
    g = o["o_custkey"]
    tx = t - t.groupby(g).transform("mean")
    ty = y - y.groupby(g).transform("mean")
    slope_fe = (tx * ty).sum() / (tx * tx).sum()
    slope_pooled = ((t - t.mean()) * (y - y.mean())).sum() / (
        (t - t.mean()) ** 2
    ).sum()
    assert row["n_customers"] == g.nunique()
    assert row["n_orders"] == len(o)
    assert abs(row["fe_dollars_per_year"] - slope_fe * 365.25 / 100) < 1e-3
    assert (
        abs(row["pooled_dollars_per_year"] - slope_pooled * 365.25 / 100)
        < 1e-3
    )


def test_tokenizer_fertility_matches_python_strings(spark):
    import re as _re

    from cdc_streamming___v2_spark.operators.text_analysis import (
        tokenizer_fertility,
    )

    rows = {r["lang"]: r for r in tokenizer_fertility(spark, SF_SMALL).collect()}
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    agg = {}
    for lang, text in zip(d["lang"], d["text"]):
        w = len(_re.split(r"\s+", text.strip()))
        b = -(-len(text) // 4)
        n, sw, sb, sc = agg.get(lang, (0, 0, 0, 0))
        agg[lang] = (n + 1, sw + w, sb + b, sc + len(text))
    tw = sum(v[1] for v in agg.values())
    tb = sum(v[2] for v in agg.values())
    assert set(rows) == set(agg)
    for lang, (n, sw, sb, sc) in agg.items():
        r = rows[lang]
        assert (r["n_docs"], r["n_words"], r["n_tokens_est"]) == (n, sw, sb)
        assert abs(r["fertility"] - sb / sw) < 1e-3
        assert abs(r["chars_per_token"] - sc / sb) < 1e-3
        assert abs(r["fertility_premium"] - (sb / sw) / (tb / tw)) < 1e-3


def test_yield_curve_is_monotone_and_anchored(spark):
    from cdc_streamming___v2_spark.operators.text_analysis import (
        quality_yield_curve,
    )

    rows = quality_yield_curve(spark, SF_SMALL).collect()
    assert len(rows) == 20
    assert rows[0]["threshold"] == 0.0
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    assert rows[0]["n_retained"] == len(d)  # threshold 0 keeps everything
    assert abs(rows[0]["doc_share"] - 1.0) < 1e-9
    assert abs(rows[0]["token_share"] - 1.0) < 1e-9
    shares = [r["n_retained"] for r in rows]
    assert all(a >= b for a, b in zip(shares, shares[1:]))  # monotone
    toks = [r["token_share"] for r in rows]
    assert all(a >= b for a, b in zip(toks, toks[1:]))


def test_ipw_ate_matches_per_unit_weights(spark):
    """Twin: per-UNIT IPW weights in pandas (1/p_s per treated, 1/(1-p_s)
    per control) — the operator folds per-stratum aggregates instead."""
    from cdc_streamming___v2_spark.operators.causal import (
        ATE_STRATA,
        PSM_TREATED_SEGMENT,
        ipw_ate,
    )

    row = ipw_ate(spark, SF_SMALL).collect()[0]
    c = pd.read_parquet(
        f"{SF_SMALL}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    spend = (
        np.round(o["o_totalprice"] * 100)
        .astype(np.int64)
        .groupby(o["o_custkey"])
        .sum()
    )
    df = c.set_index("c_custkey")
    df["y"] = spend.reindex(df.index).fillna(0).astype(np.int64)
    df["score"] = np.round(df["c_acctbal"] * 100).astype(np.int64)
    df["tr"] = (df["c_mktsegment"] == PSM_TREATED_SEGMENT).astype(int)
    mn, mx = df["score"].min(), df["score"].max()
    df["s"] = (
        (df["score"] - mn) * ATE_STRATA // (mx - mn + 1)
    ).astype(int)
    # common support
    g = df.groupby("s")["tr"].agg(["sum", "count"])
    keep = g[(g["sum"] > 0) & (g["sum"] < g["count"])].index
    d = df[df["s"].isin(keep)].copy()
    p = d.groupby("s")["tr"].transform("mean")
    w = np.where(d["tr"] == 1, 1 / p, 1 / (1 - p))
    yt = (w * d["y"] * (d["tr"] == 1)).sum() / len(d)
    yc = (w * d["y"] * (d["tr"] == 0)).sum() / len(d)
    ate = (yt - yc) / 100
    ess_t = w[d["tr"] == 1].sum() ** 2 / (w[d["tr"] == 1] ** 2).sum()
    ess_c = w[d["tr"] == 0].sum() ** 2 / (w[d["tr"] == 0] ** 2).sum()
    assert row["n_common_support"] == len(d)
    assert abs(row["ipw_ate_dollars"] - ate) < 0.01
    # ESS per arm: the operator reports N^2/sum(w^2) with sum(w)=N per
    # arm (bucket propensities telescope) — same quantity
    assert abs(row["ess_treated"] - ess_t) < 1.0
    assert abs(row["ess_control"] - ess_c) < 1.0


def test_burrows_delta_matches_python_counter(spark):
    """Twin: Counter-based frequencies + numpy z-scores along the plain
    mean/std path (no n-scaled identities, no decimals)."""
    import re as _re
    from collections import Counter

    from cdc_streamming___v2_spark.operators.text_analysis import (
        BURROWS_TOP_WORDS,
        burrows_delta_sources,
    )

    rows = burrows_delta_sources(spark, SF_SMALL).collect()
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for src, text in zip(d["source"], d["text"]):
        toks = [w for w in _re.split(r"\s+", text.strip().lower()) if w]
        per_src.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    top = [
        w
        for w, _c in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BURROWS_TOP_WORDS
        ]
    ]
    srcs = sorted(per_src)
    f = np.array(
        [
            [
                round(per_src[s][w] / sum(per_src[s].values()), 9)
                for w in top
            ]
            for s in srcs
        ]
    )
    z = (f - f.mean(axis=0)) / f.std(axis=0, ddof=1)
    deltas = {}
    for i, a in enumerate(srcs):
        for j in range(i + 1, len(srcs)):
            deltas[(a, srcs[j])] = np.abs(z[i] - z[j]).mean()
    want = sorted(deltas.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    assert len(rows) == 10
    for row, ((sa, sb), dv) in zip(rows, want):
        assert (row["src_a"], row["src_b"]) == (sa, sb)
        assert abs(row["delta"] - dv) < 1e-3


def test_cdc_hot_keys_histogram_closed_form(spark):
    """The synthetic stream gives the histogram a closed form: keys with
    okey % 4 == v-1 carry v versions."""
    from cdc_streamming___v2_spark.operators.cdc_batch import cdc_hot_keys

    rows = cdc_hot_keys(spark, SF_SMALL).collect()
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet", columns=["o_orderkey"])
    k = o["o_orderkey"].to_numpy()
    total_events = int((1 + k % 4).sum())
    assert [r["n_versions"] for r in rows] == [1, 2, 3, 4]
    for r in rows:
        n_keys = int((k % 4 == r["n_versions"] - 1).sum())
        assert r["n_keys"] == n_keys
        assert r["n_events"] == n_keys * r["n_versions"]
        assert abs(r["key_share"] - n_keys / len(k)) < 1e-5
        assert (
            abs(r["event_share"] - n_keys * r["n_versions"] / total_events)
            < 1e-5
        )


def test_capture_recapture_matches_set_arithmetic(spark):
    from cdc_streamming___v2_spark.operators.pipeline_ops import (
        capture_recapture_estimate,
    )

    row = capture_recapture_estimate(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    y = o["o_orderdate"].dt.year
    s1 = set(o.loc[y == 1996, "o_custkey"])
    s2 = set(o.loc[y == 1997, "o_custkey"])
    n1, n2, m = len(s1), len(s2), len(s1 & s2)
    est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    truth = len(s1 | s2)
    assert (row["captured_1996"], row["captured_1997"]) == (n1, n2)
    assert row["recaptured_both"] == m
    assert abs(row["chapman_estimate"] - est) < 0.011
    assert row["true_population"] == truth
    assert row["ci_low"] < est < row["ci_high"]
    assert abs(row["error_pct"] - (est - truth) / truth * 100) < 1e-2


def test_unseen_vocab_matches_counter(spark):
    import re as _re
    from collections import Counter

    from cdc_streamming___v2_spark.operators.corpus_ops import (
        unseen_vocabulary_estimate,
    )

    rows = {
        r["lang"]: r
        for r in unseen_vocabulary_estimate(spark, SF_SMALL).collect()
    }
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    per: dict[str, Counter] = {}
    for lang, text in zip(d["lang"], d["text"]):
        per.setdefault(lang, Counter()).update(
            w for w in _re.split(r"\s+", text.strip().lower()) if w
        )
    assert set(rows) == set(per)
    for lang, cnt in per.items():
        r = rows[lang]
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        assert r["vocab_seen"] == len(cnt)
        assert r["n_tokens"] == sum(cnt.values())
        assert (r["hapaxes"], r["doubletons"]) == (f1, f2)
        assert abs(
            r["chao1_richness"] - (len(cnt) + f1 * (f1 - 1) / (2 * (f2 + 1)))
        ) < 0.011
        assert abs(r["gt_unseen_mass"] - f1 / sum(cnt.values())) < 1e-5


def test_ddsketch_honors_relative_guarantee(spark):
    """The whole point of the sketch: every estimate within
    (gamma-1)/(gamma+1) of the exact value, checked against a numpy
    exact-quantile twin."""
    from cdc_streamming___v2_spark.operators.sketches import (
        DD_GAMMA,
        ddsketch_quantiles,
    )

    rows = ddsketch_quantiles(spark, SF_SMALL).collect()
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet", columns=["o_totalprice"])
    cents = np.sort(np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64))
    n = len(cents)
    alpha = (DD_GAMMA - 1) / (DD_GAMMA + 1)
    assert [r["q"] for r in rows] == [50, 90, 99]
    for r in rows:
        # exact = smallest value with 100*rank >= q*n
        k = -(-r["q"] * n // 100)  # ceil
        exact = cents[int(k) - 1] / 100
        assert abs(r["exact_value"] - exact) < 0.011
        assert r["rel_err"] <= alpha + 1e-9
        assert abs(r["dd_estimate"] - exact) / exact <= alpha + 1e-6
        assert abs(r["guarantee"] - alpha) < 1e-6


def test_partition_skew_advisor_matches_pandas(spark):
    from cdc_streamming___v2_spark.operators.maintenance import (
        partition_skew_advisor,
    )

    rows = {
        r["candidate"]: r
        for r in partition_skew_advisor(spark, SF_SMALL).collect()
    }
    li = pd.read_parquet(
        f"{SF_SMALL}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_shipdate", "l_suppkey"],
    )
    cands = {
        "returnflag_linestatus": li["l_returnflag"] + "|" + li["l_linestatus"],
        "ship_month": li["l_shipdate"].dt.strftime("%Y-%m"),
        "suppkey": li["l_suppkey"].astype(str),
    }
    for name, key in cands.items():
        sizes = key.value_counts().sort_values().to_numpy()
        n = len(sizes)
        srt = np.sort(sizes)
        r = rows[name]
        assert r["n_groups"] == n
        assert r["total_rows"] == len(li)
        assert r["max_rows"] == int(srt[-1])
        assert r["p50_rows"] == int(srt[(n + 1) // 2 - 1])
        assert r["p99_rows"] == int(srt[-(-99 * n // 100) - 1])
        assert abs(r["max_share"] - srt[-1] / len(li)) < 1e-6


def test_bitemporal_respects_both_axes(spark):
    """Twin: per-user Python walk with both cuts + the axis-separation
    property (a fact recorded after T or valid after V never appears)."""
    from cdc_streamming___v2_spark.operators.scd2_queries import (
        BT_TXN_TS,
        BT_VALID_TS,
        bitemporal_as_of,
    )

    rows = {r["user_id"]: r for r in bitemporal_as_of(spark, SF_SMALL).collect()}
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    e["valid_from"] = e["ts"] - pd.to_timedelta(e["event_id"] % 72, unit="h")
    T = pd.Timestamp(BT_TXN_TS)
    V = pd.Timestamp(BT_VALID_TS)
    cut = e[(e["ts"] <= T) & (e["valid_from"] <= V)]
    want = {}
    for uid, g in cut.groupby("user_id"):
        g = g.sort_values(
            ["valid_from", "ts", "event_id"], ascending=False
        ).iloc[0]
        if g["event_type"] != "error":
            want[uid] = (g["event_id"], g["event_type"])
    assert {u: (r["event_id"], r["event_type"]) for u, r in rows.items()} == want
    for r in rows.values():
        assert r["ts"] <= T and r["valid_from"] <= V


def test_referential_integrity_clean_schema_and_childless(spark):
    from cdc_streamming___v2_spark.operators.maintenance import (
        referential_integrity_audit,
    )

    rows = {r["edge"]: r for r in referential_integrity_audit(spark, SF_SMALL).collect()}
    assert set(rows) == {
        "lineitem->orders", "lineitem->part", "lineitem->supplier",
        "orders->customer", "customer->nation",
    }
    # the synthetic star is referentially clean
    assert all(r["n_orphans"] == 0 for r in rows.values())
    # childless parents is a real signal: customers without orders
    c = pd.read_parquet(f"{SF_SMALL}/customer.parquet", columns=["c_custkey"])
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet", columns=["o_custkey"])
    childless = len(set(c["c_custkey"]) - set(o["o_custkey"]))
    r = rows["orders->customer"]
    assert r["n_childless"] == childless
    assert r["n_parents"] == c["c_custkey"].nunique()
    assert r["n_child"] == len(o)


def test_key_candidate_scan_verdicts(spark):
    from cdc_streamming___v2_spark.operators.maintenance import (
        key_candidate_scan,
    )

    rows = {r["candidate"]: r for r in key_candidate_scan(spark, SF_SMALL).collect()}
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    assert rows["o_orderkey"]["is_unique"] is True
    assert rows["o_orderkey"]["dup_rows"] == 0
    assert rows["o_custkey"]["n_distinct"] == o["o_custkey"].nunique()
    assert rows["o_orderdate"]["n_distinct"] == o["o_orderdate"].nunique()
    combo = o.groupby(["o_custkey", "o_orderdate"]).size()
    r = rows["o_custkey+o_orderdate"]
    assert r["n_distinct"] == len(combo)
    assert r["dup_rows"] == int(combo[combo > 1].sum())
    assert r["is_unique"] == bool((combo == 1).all())


def test_round7_remaining_ops_never_plan_cartesian(spark):
    """Blanket plan audit for the round-7 ops not covered by their own
    wave's plan test (broadcast scalar frames show as
    BroadcastNestedLoopJoin, never CartesianProduct)."""
    from cdc_streamming___v2_spark.operators.behavior import (
        competing_risks_cif,
        rmst_survival,
    )
    from cdc_streamming___v2_spark.operators.causal import ipw_ate
    from cdc_streamming___v2_spark.operators.cdc_batch import (
        cdc_hot_keys,
        debezium_flat_roundtrip,
        dynamodb_stream_roundtrip,
    )
    from cdc_streamming___v2_spark.operators.corpus_ops import (
        unseen_vocabulary_estimate,
    )
    from cdc_streamming___v2_spark.operators.maintenance import (
        key_candidate_scan,
        partition_skew_advisor,
        referential_integrity_audit,
    )
    from cdc_streamming___v2_spark.operators.multimodal import (
        media_byte_histogram,
    )
    from cdc_streamming___v2_spark.operators.pipeline_ops import (
        capture_recapture_estimate,
    )
    from cdc_streamming___v2_spark.operators.scd2_queries import (
        bitemporal_as_of,
    )
    from cdc_streamming___v2_spark.operators.sketches import (
        ddsketch_quantiles,
    )
    from cdc_streamming___v2_spark.operators.stats_ext import gesd_outliers
    from cdc_streamming___v2_spark.operators.text_analysis import (
        burrows_delta_sources,
        quality_yield_curve,
        tokenizer_fertility,
    )
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        panel_fe_trend,
    )

    ops = (
        rmst_survival, competing_risks_cif, ipw_ate, cdc_hot_keys,
        dynamodb_stream_roundtrip, debezium_flat_roundtrip,
        unseen_vocabulary_estimate, key_candidate_scan,
        partition_skew_advisor, referential_integrity_audit,
        media_byte_histogram, capture_recapture_estimate,
        bitemporal_as_of, ddsketch_quantiles, gesd_outliers,
        burrows_delta_sources, quality_yield_curve, tokenizer_fertility,
        panel_fe_trend,
    )
    for fn in ops:
        plan = fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, fn.__name__


def test_bitemporal_pushes_cuts_to_scan(spark):
    """Both temporal cuts must reach the scan as pushed filters (the
    transaction-time cut is a plain ts predicate; the valid-time cut is
    derived, so at minimum the plan must FILTER before the window)."""
    from cdc_streamming___v2_spark.operators.scd2_queries import (
        bitemporal_as_of,
    )

    plan = bitemporal_as_of(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    # the window sees a filtered child, never the raw scan
    assert plan.index("Filter") < plan.index("Window")


def test_cooks_distance_matches_statsmodels_formula(spark):
    """Twin: leverage/residual/D from plain numpy linear algebra (hat
    matrix diagonal via the centered-x formula, lstsq residuals)."""
    from cdc_streamming___v2_spark.operators.diagnostics_ext import (
        cooks_distance_screen,
    )

    rows = cooks_distance_screen(spark, SF_SMALL).collect()
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    daily = o.groupby(o["o_orderdate"].dt.date)["cents"].sum().sort_index()
    x = np.array(
        [(d - pd.Timestamp("1995-01-01").date()).days for d in daily.index],
        dtype=float,
    )
    y = daily.to_numpy().astype(float)
    n = len(x)
    X = np.column_stack([np.ones(n), x])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    e = y - X @ beta
    h = 1 / n + (x - x.mean()) ** 2 / ((x - x.mean()) ** 2).sum()
    s2 = (e**2).sum() / (n - 2)
    D = e**2 * h / (2 * s2 * (1 - h) ** 2)
    order = sorted(range(n), key=lambda i: (-round(D[i], 6), daily.index[i]))
    assert len(rows) == 10
    for row, i in zip(rows, order[:10]):
        assert row["day"].date() == daily.index[i]
        assert abs(row["cooks_d"] - D[i]) < 1e-4
        assert abs(row["leverage"] - h[i]) < 1e-6
        assert abs(row["residual_dollars"] - e[i] / 100) < 0.02
        assert row["influential_4n"] == bool(D[i] > 4 / n)


def test_late_data_profile_matches_per_user_walk(spark):
    from cdc_streamming___v2_spark.operators.event_windows import (
        late_data_profile,
    )

    rows = {r["event_type"]: r for r in late_data_profile(spark, SF_SMALL).collect()}
    e = pd.read_parquet(
        f"{SF_SMALL}/events.parquet",
        columns=["user_id", "event_id", "event_type", "ts"],
    ).sort_values(["user_id", "event_id"])
    lates: dict[str, list[int]] = {}
    counts: dict[str, int] = {}
    for _uid, g in e.groupby("user_id"):
        prior = None
        for _, r in g.iterrows():
            counts[r["event_type"]] = counts.get(r["event_type"], 0) + 1
            if prior is not None and r["ts"] < prior:
                hrs = int((prior - r["ts"]).total_seconds() // 3600)
                lates.setdefault(r["event_type"], []).append(hrs)
            prior = r["ts"] if prior is None else max(prior, r["ts"])
    for et, n in counts.items():
        r = rows[et]
        ls = sorted(lates.get(et, []))
        assert r["n_events"] == n
        assert r["n_late"] == len(ls)
        assert abs(r["late_share"] - len(ls) / n) < 1e-6
        if ls:
            assert abs(r["mean_late_hours"] - sum(ls) / len(ls)) < 1e-3
            assert r["max_late_hours"] == ls[-1]
            # p95 = smallest bucket with 100*cum >= 95*n_late
            k = next(
                i for i in range(len(ls)) if 100 * (i + 1) >= 95 * len(ls)
            )
            assert r["p95_late_hours"] == ls[k]


def test_seasonal_esd_matches_sequential_numpy(spark):
    """Twin: weekday-median deseasonalize + literal remove-and-recompute
    rounds in numpy (no downdating identity)."""
    from cdc_streamming___v2_spark.operators.stats_ext import (
        GESD_ROUNDS,
        seasonal_esd_anomalies,
    )

    rows = seasonal_esd_anomalies(spark, SF_SMALL).collect()
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    daily = o.groupby(o["o_orderdate"].dt.date)["cents"].sum().sort_index()
    days = list(daily.index)
    x = daily.to_numpy().astype(np.int64)
    dow = np.array([d.isoweekday() % 7 + 1 for d in days])  # Spark dayofweek
    resid = x.astype(float).copy()
    for w in np.unique(dow):
        vals = np.sort(x[dow == w])
        med = vals[(len(vals) + 1) // 2 - 1]
        resid[dow == w] = x[dow == w] - med
    assert len(rows) == GESD_ROUNDS
    r_work, d_work = resid.copy(), list(days)
    for i, row in enumerate(rows, start=1):
        n = len(r_work)
        mu, sd = r_work.mean(), r_work.std(ddof=1)
        maxdev = np.abs(r_work - mu).max()
        cands = [k for k in range(n) if np.abs(r_work[k] - mu) == maxdev]
        j = min(cands, key=lambda k: d_work[k])
        assert row["round"] == i
        assert str(row["anomaly_day"]).startswith(str(d_work[j]))
        assert abs(row["r_stat"] - abs(r_work[j] - mu) / sd) < 1e-3
        assert abs(row["residual_dollars"] - r_work[j] / 100) < 0.011
        r_work = np.delete(r_work, j)
        del d_work[j]


def test_copula_sigma_matches_pandas_grid(spark):
    from cdc_streamming___v2_spark.operators.stats_ext import (
        COPULA_GRID,
        copula_dependence_daily,
    )

    row = copula_dependence_daily(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    g = (
        o.groupby(o["o_orderdate"].dt.date)
        .agg(cnt=("cents", "size"), rev=("cents", "sum"))
        .reset_index()
    )
    n = len(g)
    ru_order = g.sort_values(["cnt", "o_orderdate"]).index
    rv_order = g.sort_values(["rev", "o_orderdate"]).index
    ru = np.empty(n, dtype=int)
    rv = np.empty(n, dtype=int)
    ru[ru_order] = np.arange(1, n + 1)
    rv[rv_order] = np.arange(1, n + 1)
    du, dv = (ru - 1) * COPULA_GRID // n, (rv - 1) * COPULA_GRID // n
    G2 = COPULA_GRID * COPULA_GRID
    ts = 0
    for i in range(1, COPULA_GRID + 1):
        for j in range(1, COPULA_GRID + 1):
            cc = int(((du < i) & (dv < j)).sum())
            ts += abs(G2 * cc - i * j * n)
    sigma = 12 * ts / (G2 * n * G2)
    assert row["n_days"] == n
    assert abs(row["sw_sigma"] - sigma) < 1e-6
    assert 0.0 <= row["sw_sigma"] <= 1.0


def test_distance_correlation_matches_double_centering(spark):
    """Twin: the textbook double-centered matrix formulation in numpy
    (A_ij B_ij mean), not the moment identity."""
    from cdc_streamming___v2_spark.operators.stats_ext import (
        distance_correlation_daily,
    )

    row = distance_correlation_daily(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    g = o.groupby(o["o_orderdate"].dt.date).agg(
        c=("cents", "size"), r=("cents", "sum")
    )
    x = g["c"].to_numpy().astype(float)
    y = g["r"].to_numpy().astype(float)
    n = len(x)

    def centered(v):
        d = np.abs(v[:, None] - v[None, :])
        return d - d.mean(axis=0)[None, :] - d.mean(axis=1)[:, None] + d.mean()

    A, B = centered(x), centered(y)
    dxy = (A * B).mean()
    dcor = np.sqrt(dxy / np.sqrt((A * A).mean() * (B * B).mean()))
    pr = np.corrcoef(x, y)[0, 1]
    assert row["n_days"] == n
    assert abs(row["dcov"] - np.sqrt(dxy)) < 1e-5
    assert abs(row["dcor"] - dcor) < 1e-5
    assert abs(row["pearson_r"] - pr) < 1e-5
    assert 0.0 <= row["dcor"] <= 1.0


def test_seasonal_mk_matches_per_weekday_loops(spark):
    from cdc_streamming___v2_spark.operators.stats_ext import (
        seasonal_mann_kendall,
    )

    row = seasonal_mann_kendall(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    daily = o.groupby(o["o_orderdate"].dt.date)["cents"].sum().sort_index()
    days = list(daily.index)
    x = daily.to_numpy()
    dow = np.array([d.isoweekday() % 7 + 1 for d in days])
    S, V, n_total, signs = 0, 0.0, 0, []
    for w in np.unique(dow):
        xs = x[dow == w]
        m = len(xs)
        s_w = 0
        for i in range(m):
            for j in range(i + 1, m):
                s_w += int(np.sign(xs[j] - xs[i]))
        _, t_counts = np.unique(xs, return_counts=True)
        tcorr = sum(t * (t - 1) * (2 * t + 5) for t in t_counts)
        S += s_w
        V += (m * (m - 1) * (2 * m + 5) - tcorr) / 18.0
        n_total += m
        signs.append(np.sign(s_w))
    z = (S - 1) / np.sqrt(V) if S > 0 else ((S + 1) / np.sqrt(V) if S < 0 else 0.0)
    assert row["n_days"] == n_total
    assert row["s_total"] == S
    assert abs(row["var_s"] - V) < 0.51
    assert abs(row["z_stat"] - z) < 1e-3
    assert row["homogeneous_sign"] == bool(
        min(signs) >= 0 or max(signs) <= 0
    )


def test_lorenz_asymmetry_matches_damgaard_weiner(spark):
    from cdc_streamming___v2_spark.operators.analytics import (
        lorenz_asymmetry,
    )

    row = lorenz_asymmetry(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    v = (
        np.round(o["o_totalprice"] * 100)
        .astype(np.int64)
        .groupby(o["o_custkey"])
        .sum()
        .to_numpy()
    )
    v = np.sort(v)
    n, total = len(v), v.sum()
    mu = total / n
    m = int((v < mu).sum())
    lm = int(v[v < mu].sum())
    x_m, x_m1 = v[m - 1], v[m]
    delta = (mu - x_m) / (x_m1 - x_m)
    S = (m + delta) / n + (lm + delta * x_m1) / total
    assert row["n_customers"] == n
    assert row["n_below_mean"] == m
    assert abs(row["lorenz_asymmetry"] - S) < 1e-5
    assert abs(row["f_mu"] - m / n) < 1e-6
    assert abs(row["l_mu"] - lm / total) < 1e-6


def test_xbar_r_chart_matches_pandas_weeks(spark):
    from cdc_streamming___v2_spark.operators.analytics import (
        XBARR_A2,
        XBARR_D3,
        XBARR_D4,
        xbar_r_chart,
    )

    # sf0.001's calendar is too sparse for complete 7-day weeks (the
    # operator is honestly empty there); test at sf0.01, the driver's
    # comparison scale, where 15 complete weeks emit
    sf = "/root/testdata/sf0.01"
    rows = xbar_r_chart(spark, sf).collect()
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    daily = (
        o.groupby(o["o_orderdate"].dt.date)["cents"].sum().reset_index()
    )
    daily.columns = ["day", "xc"]
    # replicate the operator's (weekofyear, CALENDAR year) key — the
    # New-Year-straddling ISO week splits and drops by design
    iso = pd.to_datetime(daily["day"]).dt.isocalendar()
    cal_year = pd.to_datetime(daily["day"]).dt.year
    daily["wk"] = list(zip(cal_year, iso["week"]))
    g = daily.groupby("wk").agg(
        nd=("xc", "size"), s=("xc", "sum"), mx=("xc", "max"),
        mn=("xc", "min"), start=("day", "min"),
    )
    g = g[g["nd"] == 7].copy()
    g["xbar"] = g["s"] / 7.0
    g["r"] = (g["mx"] - g["mn"]).astype(float)
    xbb, rb = g["xbar"].mean(), g["r"].mean()

    def sig(row):
        if row["xbar"] > xbb + XBARR_A2 * rb:
            return "xbar-high"
        if row["xbar"] < xbb - XBARR_A2 * rb:
            return "xbar-low"
        if row["r"] > XBARR_D4 * rb:
            return "range-high"
        if row["r"] < XBARR_D3 * rb:
            return "range-low"
        return "in-control"

    g["signal"] = g.apply(sig, axis=1)
    want = g.sort_values("start", ascending=False).head(15)
    assert len(rows) == len(want) == 15  # non-vacuous
    for row, (_, w) in zip(rows, want.iterrows()):
        assert row["week_start"].date() == w["start"]
        assert row["signal"] == w["signal"]
        assert abs(row["xbar_dollars"] - w["xbar"] / 100) < 0.011
        assert abs(row["range_dollars"] - w["r"] / 100) < 0.011


def test_record_highs_matches_python_walk(spark):
    from cdc_streamming___v2_spark.operators.analytics import (
        record_highs_test,
    )

    row = record_highs_test(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    daily = o.groupby(o["o_orderdate"].dt.date)["cents"].sum().sort_index()
    x = daily.to_numpy()
    n = len(x)
    best, recs = -1, 0
    for v in x:
        if v > best:
            recs += 1
            best = v
    h1 = sum(1.0 / k for k in range(1, n + 1))
    h2 = sum(1.0 / (k * k) for k in range(1, n + 1))
    z = (recs - h1) / np.sqrt(h1 - h2)
    assert row["n_days"] == n
    assert row["n_records"] == recs
    assert abs(row["expected_records"] - h1) < 1e-3
    assert abs(row["z_stat"] - z) < 1e-3


def test_lorenz_asymmetry_degenerate_equal_totals(spark, tmp_path):
    """ADVICE r6: a frame where every customer total equals the mean used
    to propagate an all-null S (x_m null -> delta null); the guard must
    emit the perfectly-equal-population answer S = 1, 'symmetric'."""
    from cdc_streamming___v2_spark.operators.analytics import (
        lorenz_asymmetry,
    )

    pd.DataFrame(
        {
            "o_custkey": [1, 2, 3, 4],
            "o_totalprice": [10.0, 10.0, 10.0, 10.0],
        }
    ).to_parquet(tmp_path / "orders.parquet")
    row = lorenz_asymmetry(spark, str(tmp_path)).collect()[0]
    assert row["n_customers"] == 4
    assert row["n_below_mean"] == 0
    assert row["f_mu"] == 0.0
    assert row["l_mu"] == 0.0
    assert row["lorenz_asymmetry"] == 1.0
    assert row["shape"] == "symmetric"
