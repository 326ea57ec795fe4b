"""ML-primitive operators (round 5): semantic invariants + plan audits
beyond the DuckDB parity gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import ml_ops as ML

from .conftest import SF_SMALL


def test_naive_bayes_confusion_covers_every_doc(spark):
    from cdc_streamming___v2_spark.sources.tables import load_table

    cm = ML.naive_bayes_lang(spark, SF_SMALL)
    n = load_table(spark, SF_SMALL, "documents").count()
    assert cm.agg(F.sum("n_docs")).first()[0] == n
    langs = {
        r["lang"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select("lang").distinct().collect()
    }
    got = {r["predicted_lang"] for r in cm.collect()}
    assert got <= langs  # predictions come from the training classes


def test_knn_majority_vote_matches_manual_recount(spark):
    from cdc_streamming___v2_spark.operators.similarity import (
        N_QUERIES,
        cosine_topk_frame,
        _embeddings,
    )

    e = _embeddings(spark, SF_SMALL)
    topk = cosine_topk_frame(e, n_queries=N_QUERIES, top_k=ML.KNN_K)
    labeled = topk.join(e.select("vec_id", "label"), "vec_id").collect()
    by_q = {}
    for r in labeled:
        by_q.setdefault(r["query_id"], []).append(r["label"])
    want = {
        q: min(
            sorted(set(ls)),
            key=lambda lab: (-ls.count(lab), lab),
        )
        for q, ls in by_q.items()
    }
    got = {
        r["query_id"]: r["predicted_label"]
        for r in ML.knn_label_predict(spark, SF_SMALL).collect()
    }
    assert got == want


def test_feature_hashing_buckets_in_range_and_counts_conserve(spark):
    from cdc_streamming___v2_spark.functions.texts import words
    from cdc_streamming___v2_spark.sources.tables import load_table

    fh = ML.feature_hashing(spark, SF_SMALL)
    stats = fh.agg(
        F.min("bucket"), F.max("bucket"), F.sum("n")
    ).first()
    assert stats[0] >= 0 and stats[1] < ML.FH_BUCKETS
    n_toks = (
        load_table(spark, SF_SMALL, "documents")
        .select(F.explode(words(F.col("text"))))
        .count()
    )
    assert stats[2] == n_toks  # hashing never drops a token


def test_heavy_hitters_exact_regardless_of_partitioning(spark):
    """The MG candidate pass depends on partitioning; the OUTPUT must not:
    compare against the plain exact groupBy computed in-Spark."""
    from cdc_streamming___v2_spark.functions.texts import words
    from cdc_streamming___v2_spark.sources.tables import load_table

    toks = (
        load_table(spark, SF_SMALL, "documents")
        .select(F.explode(words(F.col("text"))).alias("w"))
    )
    n = toks.count()
    want = {
        (r["w"], r["c"])
        for r in toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * ML.HH_K > n)
        .collect()
    }
    got = {
        (r["token"], r["n_occurrences"])
        for r in ML.heavy_hitters_topfreq(spark, SF_SMALL).collect()
    }
    assert got == want and len(got) > 0


def test_chi2_ranks_are_dense_per_source(spark):
    rows = ML.chi2_feature_select(spark, SF_SMALL).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["rank"])
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, ML.CHI2_TOP + 1)), src


def test_round5_ml_ops_never_plan_cartesian(spark):
    def _plan(df):
        qe = df._jdf.queryExecution()
        mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        return qe.explainString(mode)

    # knn's brute-force kernel broadcasts the 5-row query side (an
    # intentional BroadcastNestedLoopJoin); everything else must be
    # equi-join only
    for fn in (
        ML.naive_bayes_lang,
        ML.feature_hashing,
        ML.chi2_feature_select,
        ML.heavy_hitters_topfreq,
    ):
        p = _plan(fn(spark, SF_SMALL))
        assert "CartesianProduct" not in p, fn.__name__


def test_brier_decomposition_matches_bruteforce(spark):
    """Collect the (pi, y) score frame once, then recompute the Murphy
    decomposition with numpy along the literal per-bin definitions —
    guards the cross-multiplied cell algebra (score extraction itself is
    already oracle-proven by calibration_bins)."""
    import numpy as np
    from pyspark.sql import functions as F

    from cdc_streamming___v2_spark.operators.ml_eval import (
        CAL_BINS,
        POS_LANG,
        _prob_keep,
        brier_decomposition,
    )
    from cdc_streamming___v2_spark.sources.tables import load_table
    from .conftest import SF_SMALL

    row = brier_decomposition(spark, SF_SMALL).collect()[0]
    d = load_table(spark, SF_SMALL, "documents")
    pdf = d.select(
        F.round(F.round(_prob_keep(F.col("text")), 4) * 10000)
        .cast("long")
        .alias("pi"),
        (F.col("lang") == POS_LANG).cast("long").alias("y"),
    ).toPandas()
    p = pdf["pi"].to_numpy() / 10000.0
    y = pdf["y"].to_numpy(float)
    n = len(p)
    brier = ((p - y) ** 2).mean()
    bins = np.minimum(
        (pdf["pi"].to_numpy() // (10000 // CAL_BINS)), CAL_BINS - 1
    )
    rel = res = 0.0
    for b in np.unique(bins):
        m = bins == b
        rel += m.sum() * (p[m].mean() - y[m].mean()) ** 2
        res += m.sum() * (y[m].mean() - y.mean()) ** 2
    rel, res = rel / n, res / n
    unc = y.mean() * (1 - y.mean())
    assert row["n_docs"] == n
    assert row["brier"] == pytest.approx(brier, abs=1e-5)
    assert row["reliability"] == pytest.approx(rel, abs=1e-5)
    assert row["resolution"] == pytest.approx(res, abs=1e-5)
    assert row["uncertainty"] == pytest.approx(unc, abs=1e-5)
    # Murphy identity is exact at bin granularity only when forecasts are
    # constant per bin; the reported gap must equal the residual
    assert row["decomp_gap"] == pytest.approx(
        brier - (rel - res + unc), abs=1e-5
    )
    assert row["resolution"] <= row["uncertainty"] + 1e-9


def test_hosmer_lemeshow_matches_bruteforce(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from cdc_streamming___v2_spark.operators.ml_eval import (
        HL_GROUPS,
        POS_LANG,
        _prob_keep,
        hosmer_lemeshow,
    )
    from cdc_streamming___v2_spark.sources.tables import load_table
    from .conftest import SF_SMALL

    row = hosmer_lemeshow(spark, SF_SMALL).collect()[0]
    d = load_table(spark, SF_SMALL, "documents")
    pdf = (
        d.select(
            F.round(F.round(_prob_keep(F.col("text")), 4) * 10000)
            .cast("long")
            .alias("pi"),
            (F.col("lang") == POS_LANG).cast("long").alias("y"),
        )
        .toPandas()
        .sort_values("pi")
    )
    n = len(pdf)
    # deterministic tie-run grouping: a run of equal scores lands in the
    # decile of its first element
    grid = pdf.groupby("pi").agg(cnt=("y", "size"), ny=("y", "sum"))
    grid = grid.reset_index().sort_values("pi")
    cumb = grid["cnt"].cumsum() - grid["cnt"]
    grid["grp"] = (HL_GROUPS * cumb) // n
    hl = 0.0
    n_deg = 0
    for _, g in grid.groupby("grp"):
        ng = g["cnt"].sum()
        obs = g["ny"].sum()
        exp = (g["pi"] * g["cnt"]).sum() / 10000.0
        if exp <= 0 or exp >= ng:
            n_deg += 1
            continue
        hl += (obs - exp) ** 2 / (exp * (1 - exp / ng))
    assert row["n_groups"] == grid["grp"].nunique()
    assert row["n_degenerate"] == n_deg
    assert row["hl_stat"] == pytest.approx(hl, abs=1e-3)
