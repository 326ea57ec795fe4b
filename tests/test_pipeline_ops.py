"""Smoke + invariants for the training-pipeline ops at sf0.001.

Value parity against DuckDB runs via tools/check_correctness.py; these pin
cheap structural invariants.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import pipeline_ops as P

from .conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(P.QUERIES))
def test_query_runs_nonempty_schema(spark, name):
    df = P.QUERIES[name](spark, SF_SMALL)
    rows = df.collect()
    assert df.columns
    if name != "dedup_clusters":  # sf0.001 may have no near-dup pairs
        assert len(rows) > 0


def test_oracle_coverage():
    assert set(P.ORACLES) == set(P.QUERIES)


def test_dedup_clusters_labels_are_component_minima(spark):
    rows = P.dedup_clusters(spark, SF_SMALL).collect()
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        assert cid == min(members)  # label is the min doc_id in the component
        assert len(members) >= 2  # singletons are not near-dup nodes


def test_connected_components_logarithmic_rounds(spark):
    """VERDICT r2 #4: pointer-doubling bounds CC rounds at O(log diameter).
    A 64-node path graph has diameter 63 — plain label propagation needs 63
    rounds; with the shortcut the fixpoint (plus its one detection round)
    must land within ceil(log2 n) + 1."""
    import math

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels, rounds = P.connected_components(spark, pairs)
    rows = labels.collect()
    assert len(rows) == n
    assert all(r.label == 0 for r in rows)  # one component, min node 0
    assert rounds <= math.ceil(math.log2(n)) + 1


def test_doc_chunks_cover_and_overlap(spark):
    rows = P.doc_chunks(spark, SF_SMALL).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert chunks[0].chunk_idx == 0
        # every chunk except possibly the last is full-size
        assert all(c.n_tokens == P.CHUNK_TOKENS for c in chunks[:-1])
        assert 1 <= chunks[-1].n_tokens <= P.CHUNK_TOKENS
        # consecutive chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE words
        if len(chunks) > 1:
            a = chunks[0].chunk_text.split()
            b = chunks[1].chunk_text.split()
            assert a[P.CHUNK_STRIDE :] == b[: P.CHUNK_TOKENS - P.CHUNK_STRIDE]


def test_embedding_quantize_range(spark):
    rows = P.embedding_quantize(spark, SF_SMALL).collect()
    for r in rows:
        codes = [int(q) for q in r.quant.split(",")]  # comma-joined int8 codes
        assert all(-127 <= q <= 127 for q in codes)
        assert max(abs(q) for q in codes) == 127  # max-abs dim hits full scale
        assert r.l2_norm > 0


def test_gapfill_flags_and_cumsum(spark):
    rows = P.gapfill_daily_value(spark, SF_SMALL).collect()
    assert any(r.filled for r in rows) or len(rows) > 0
    for r in rows:
        if r.filled:
            assert r.n_events == 0 and r.day_value == 0.0
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for days in by_user.values():
        days.sort(key=lambda r: r.day)
        # contiguous daily calendar: span length == row count
        assert (days[-1].day - days[0].day).days + 1 == len(days)


def test_gopher_keep_consistent_with_metrics(spark):
    rows = P.gopher_repetition(spark, SF_SMALL).collect()
    for r in rows:
        if r.keep:
            assert 10 <= r.n_words <= 1000
            assert r.top_bigram_frac < 0.2 + 1e-9


def test_pii_scrub_redacts_synthesized_pii(spark):
    rows = P.pii_scrub(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # exactly one of each synthesized PII item per doc, fully redacted
        assert r.n_urls_redacted == 1
        assert r.n_emails_redacted == 1
        assert r.n_phones_redacted == 1
        assert "@" not in r.clean_text
        assert "http" not in r.clean_text
        assert "555" not in r.clean_text


def test_dataset_split_stable_and_proportional(spark):
    rows = P.dataset_split(spark, SF_SMALL).collect()
    n = len(rows)
    frac = {s: sum(1 for r in rows if r.split == s) / n for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.8) < 0.1
    assert abs(frac["val"] - 0.1) < 0.07
    assert abs(frac["test"] - 0.1) < 0.07
    again = {r.doc_id: r.split for r in P.dataset_split(spark, SF_SMALL).collect()}
    assert again == {r.doc_id: r.split for r in rows}


def test_priority_sample_k_rows_weighted(spark):
    rows = P.priority_sample(spark, SF_SMALL).collect()
    assert len(rows) == P.PRIORITY_K
    for r in rows:
        # HT weight is never below the raw weight, and priority >= weight
        # (u <= 1 implies w/u >= w)
        assert r.ht_weight >= r.w
        assert r.priority >= r.w
    again = P.priority_sample(spark, SF_SMALL).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in rows}


def test_decontaminated_corpus_partition_identity(spark):
    docs = P._docs(spark, SF_SMALL)
    total = docs.count()
    n_eval = docs.filter(F.col("doc_id") % P.DECON_EVAL_MOD == 0).count()
    contaminated = P.decontaminate(spark, SF_SMALL)
    n_bad = contaminated.count()
    clean = P.decontaminated_corpus(spark, SF_SMALL)
    # eval, contaminated, clean partition the corpus exactly
    assert clean.count() == total - n_eval - n_bad
    # nothing contaminated or held-out survives
    assert clean.filter(F.col("doc_id") % P.DECON_EVAL_MOD == 0).count() == 0
    assert clean.join(contaminated, "doc_id").count() == 0


def test_decontaminate_hits_share_a_shingle(spark):
    from cdc_streamming___v2_spark.functions.texts import word_shingles

    hit = P.decontaminate(spark, SF_SMALL).orderBy("doc_id").first()
    if hit is None:
        pytest.skip("no contamination at this SF")
    docs = P._docs(spark, SF_SMALL).select(
        "doc_id", word_shingles(F.col("text"), P.DECON_SHINGLE_N).alias("sh")
    )
    bad = docs.filter(F.col("doc_id") == hit.doc_id)
    ev = docs.filter(F.col("doc_id") % P.DECON_EVAL_MOD == 0).select(
        F.explode("sh").alias("s")
    )
    shared = (
        bad.select(F.explode("sh").alias("s")).join(ev, "s").select("s").distinct()
    )
    assert shared.count() == hit.n_shared


def test_cluster_balanced_sample_rates(spark):
    rows = P.cluster_balanced_sample(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 < r.n_kept <= r.n_cluster
        # realized kept count concentrates around target*rate
        expect = min(P.CBS_TARGET, r.n_cluster)
        assert abs(r.n_kept - expect) <= max(6, 0.6 * expect)
        assert r.ht_weight >= 1.0


def test_dedup_keepers_pick_best_member(spark):
    """Every cluster's keeper must be one of its members and carry the
    cluster's max quality score; member counts must cover all clustered
    docs exactly once."""
    from cdc_streamming___v2_spark.operators.text_analysis import text_quality

    clusters = {r.doc_id: r.cluster_id
                for r in P.dedup_clusters(spark, SF_SMALL).collect()}
    quality = {r.doc_id: r.quality_score
               for r in text_quality(spark, SF_SMALL).collect()}
    keepers = P.dedup_keepers(spark, SF_SMALL).collect()
    assert keepers
    seen_members = 0
    for r in keepers:
        assert clusters[r.keep_id] == r.cluster_id
        members = [d for d, c in clusters.items() if c == r.cluster_id]
        assert len(members) == r.n_docs
        seen_members += r.n_docs
        best = max(quality[d] for d in members)
        assert abs(best - r.best_quality) < 1e-9
        assert quality[r.keep_id] == best
    assert seen_members == len(clusters)
