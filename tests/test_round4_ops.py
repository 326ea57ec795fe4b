"""Round-4 operator invariants: BPE pair counting, BM25 retrieval,
mixture weights, logistic quality scoring. (Value parity vs DuckDB is
covered by the oracle gate; these pin semantic properties.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import corpus_ops as C
from cdc_streamming___v2_spark.operators import pipeline_ops as P
from cdc_streamming___v2_spark.operators import text_analysis as TA
from cdc_streamming___v2_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_bpe_pair_counts_ranked_and_consistent(spark):
    rows = TA.bpe_pair_counts(spark, SF_SMALL).collect()
    assert len(rows) == TA.BPE_TOP
    assert [r.rank for r in rows] == sorted(r.rank for r in rows)
    counts = [r.n_occurrences for r in sorted(rows, key=lambda r: r.rank)]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.pair) == 2 for r in rows)
    # ground truth on one known pair: occurrences of 'th' inside words
    # must match a direct count
    th = next((r for r in rows if r.pair == "th"), None)
    if th is not None:
        direct = (
            load_table(spark, SF_SMALL, "documents")
            .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
            .filter(F.length("w") >= 2)
            .select(
                (F.length("w") - F.length(F.regexp_replace("w", "th", "")))
                / 2
            )
            .groupBy()
            .sum()
            .first()[0]
        )
        # regexp_replace counts non-overlapping occurrences — 'th' can't
        # overlap itself, so the counts must agree exactly
        assert th.n_occurrences == int(direct)


def test_bm25_prefers_term_dense_short_docs(spark):
    out = C.bm25_topk(spark, SF_SMALL)
    rows = out.collect()
    assert 0 < len(rows) <= C.BM25_TOP
    scores = [r.bm25 for r in sorted(rows, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_terms_hit <= len(C.BM25_TERMS) for r in rows)
    # TakeOrderedAndProject (not a global sort) must serve the top-k
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_mixture_weights_normalize_and_flatten(spark):
    rows = P.mixture_weights(spark, SF_SMALL).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-3
    # alpha < 1 compresses: the largest source is down-weighted vs
    # proportional, the smallest up-weighted
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    assert big.upweight_vs_proportional < 1.0 < small.upweight_vs_proportional


def test_quality_logit_monotone_in_stopword_ratio(spark):
    """Two docs with equal length/punctuation: the one with more
    stopwords must score higher (positive weight)."""
    rows = {
        r.doc_id: r
        for r in TA.quality_logit_score(spark, SF_SMALL).collect()
    }
    assert rows and all(0.0 <= r.prob_keep <= 1.0 for r in rows.values())
    feats = {
        r.doc_id: r
        for r in TA.text_quality(spark, SF_SMALL).collect()
    }
    import itertools

    for a, b in itertools.islice(
        itertools.combinations(sorted(rows), 2), 5000
    ):
        fa, fb = feats[a], feats[b]
        if (
            fa.n_words == fb.n_words
            and fa.punct_ratio == fb.punct_ratio
            and fa.stopword_ratio > fb.stopword_ratio
        ):
            assert rows[a].logit >= rows[b].logit


def test_robust_mad_outliers_tolerates_contamination(spark):
    from cdc_streamming___v2_spark.operators import analytics as A

    rows = A.robust_mad_outliers(spark, SF_SMALL).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.mad >= 0 and r.n_outliers <= r.n_days
        # outlier days must actually deviate beyond the threshold
        if r.n_outliers > 0:
            assert r.max_abs_dev > A.MAD_K * A.MAD_SCALE * r.mad


def test_source_boilerplate_bounds_and_shared_exists(spark):
    rows = C.source_boilerplate(spark, SF_SMALL).collect()
    assert len(rows) > 0
    assert all(0 <= r.n_boiler <= r.n_shingles for r in rows)
    assert all(0.0 <= r.boiler_frac <= 1.0 for r in rows)
