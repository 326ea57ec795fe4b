"""Dedup / similarity / text-analysis behavioral tests (value parity with
DuckDB is covered by tools/check_correctness.py; these pin semantics)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_streamming___v2_spark.functions.texts import md5_hash_long, word_shingles
from cdc_streamming___v2_spark.operators import dedup as D
from cdc_streamming___v2_spark.operators import similarity as S
from cdc_streamming___v2_spark.operators import text_analysis as T

from .conftest import SF_SMALL


def test_exact_dedup_groups_duplicates(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="hello  world"),
            Row(doc_id=2, text="Hello World"),  # same after normalization
            Row(doc_id=3, text="different"),
        ]
    )
    from cdc_streamming___v2_spark.functions.texts import normalized

    out = (
        df.select("doc_id", F.md5(normalized(F.col("text"))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .collect()
    )
    by_keep = {r.keep_id: r.n_copies for r in out}
    assert by_keep == {1: 2, 3: 1}


def test_minhash_agrees_with_exact_jaccard_on_testdata(spark):
    """LSH banding at these parameters must catch every planted near-dup
    (their jaccard is ~0.9 ⇒ band-collision probability ≈ 1)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(spark, SF_SMALL).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b) for r in D.minhash_near_dup(spark, SF_SMALL).collect()
    }
    assert lsh <= exact  # verification step guarantees no false positives
    assert len(exact) > 0
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9


def test_word_shingles_short_text_no_negative_sequence(spark):
    df = spark.createDataFrame([Row(text="one two")])  # < n words
    out = df.select(word_shingles(F.col("text"), 3).alias("s")).collect()
    assert out[0].s == []


def test_md5_hash_long_deterministic(spark):
    df = spark.createDataFrame([Row(s="abc")])
    a = df.select(md5_hash_long(F.col("s"), "1|").alias("h")).first().h
    b = df.select(md5_hash_long(F.col("s"), "1|").alias("h")).first().h
    assert a == b and isinstance(a, int) and a >= 0


def test_lsh_recall_vs_brute_force(spark):
    exact = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk(spark, SF_SMALL).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in S.ann_lsh_topk(spark, SF_SMALL).collect()
    }
    # random near-orthogonal embeddings are the adversarial case for ANN;
    # expected recall at H=6 planes, <=2-bit probes is ~0.5-0.6 here
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"LSH recall too low: {recall}"


def test_ivf_recall_vs_brute_force(spark):
    exact = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk(spark, SF_SMALL).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in S.ann_ivf_topk(spark, SF_SMALL).collect()
    }
    # labels are random for these vectors → recall ≈ probes/cells (5/10)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall too low: {recall}"


def test_topk_exactly_k_per_query(spark):
    rows = S.cosine_topk(spark, SF_SMALL).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == {0, 1, 2, 3, 4}
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, 11))


def test_simhash_similar_docs_close(spark):
    """Near-identical documents must land on nearby simhashes (small
    hamming distance); unrelated vocab far away is not guaranteed, so we
    only assert the positive direction."""
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark join filter window group sort merge"),
            Row(doc_id=2, text="spark join filter window group sort scan"),
        ]
    )
    from cdc_streamming___v2_spark.functions.texts import words

    wdf = df.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    wdf = wdf.withColumn("h", md5_hash_long(F.col("w")))
    import functools

    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(D.SIMHASH_BITS)
    ]
    sig = wdf.groupBy("doc_id").agg(*aggs)
    sim = sig.select(
        "doc_id",
        functools.reduce(
            lambda acc, b: acc
            + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)),
            range(1, D.SIMHASH_BITS),
            F.when(F.col("b0") > 0, F.lit(1)).otherwise(F.lit(0)),
        ).alias("sh"),
    ).collect()
    h = {r.doc_id: r.sh for r in sim}
    hamming = bin(h[1] ^ h[2]).count("1")
    assert hamming <= 6


def test_lang_id_schema_and_determinism(spark):
    a = T.lang_id(spark, SF_SMALL).collect()
    b = T.lang_id(spark, SF_SMALL).collect()
    assert {r.doc_id: r.predicted_lang for r in a} == {
        r.doc_id: r.predicted_lang for r in b
    }


def test_simhash_hamming_pairs_bounded_and_banded(spark):
    pairs = D.simhash_hamming_pairs(spark, SF_SMALL).collect()
    assert pairs
    fp = {
        r.doc_id: r.simhash
        for r in D.simhash_fingerprint(spark, SF_SMALL).collect()
    }
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert r.hamming <= D.SIMHASH_HAMMING_MAX
        assert bin(fp[r.doc_a] ^ fp[r.doc_b]).count("1") == r.hamming


def test_ann_recall_on_planted_clustered_corpus(spark):
    """The random driver embeddings are the ANN-adversarial case (recall is
    data-bound there, asserted loosely above). On a clustered corpus — the
    shape real embeddings have — the SAME operators must deliver near-perfect
    recall, and the tuning knobs must trade recall for candidate volume:
    multi-probe LSH recovers what zero-probe misses; IVF needs only its top
    cell when cells align with clusters."""
    DIM, C, N = 64, 8, 400

    def h(i, j, salt):
        return ((i * 2654435761 + j * 40503 + salt * 97) % 65536) / 65536.0 * 2 - 1

    centers = [[h(c, j, 7) for j in range(DIM)] for c in range(C)]
    rows = [
        Row(
            vec_id=i,
            label=i % C,
            v=[centers[i % C][j] + 0.25 * h(i, j, 13) for j in range(DIM)],
        )
        for i in range(N)
    ]
    e = spark.createDataFrame(rows)

    def pairs(df):
        return {(r.query_id, r.vec_id) for r in df.collect()}

    exact = pairs(S.cosine_topk_frame(e))
    assert len(exact) == 5 * S.TOP_K

    lsh = pairs(S.lsh_topk_frame(e))
    lsh_noprobe = pairs(S.lsh_topk_frame(e, probe_bits=0))
    ivf_one_cell = pairs(S.ivf_topk_frame(e, n_probes=1))

    assert len(lsh & exact) / len(exact) >= 0.95
    assert len(ivf_one_cell & exact) / len(exact) >= 0.95
    # zero-probe LSH scans ~1/2^H of the corpus: decent here but strictly
    # weaker than multi-probe — the knob is doing its job
    r0 = len(lsh_noprobe & exact) / len(exact)
    assert 0.7 <= r0 <= len(lsh & exact) / len(exact)


def test_symmetric_delete_blocking_is_lossless(spark):
    """The SymSpell guarantee in practice: every pair within lev <= 2 must
    share a <=2-deletion variant, so blocking on the variant loses no pair
    that brute-force lev-filtering keeps — including insert/delete/replace
    mixes and short strings near the guard boundaries."""
    from itertools import combinations

    from cdc_streamming___v2_spark.operators import dedup as D

    names = [
        "hot bolt", "hot bolts", "hod bolt", "cold plate", "old plate",
        "olden plate", "blue ring", "bluf rink", "ring", "rig", "ab", "b",
        # the shapes whose alignment deletes down to "" (ADVICE r2):
        # 'a'~'b' is lev 1, 'ab'~'cd' is lev 2 — both must block via ""
        "a", "cd",
        "completely different thing",
    ]
    df = spark.createDataFrame(
        [Row(p_partkey=i, p_name=n, p_brand="B") for i, n in enumerate(names)]
    )
    ex = df.select(
        "p_partkey", F.explode(D._deletion_variants(F.col("p_name"))).alias("s")
    )
    a, b = ex.alias("a"), ex.alias("b")
    blocked = {
        (r.ka, r.kb)
        for r in a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(F.col("a.p_partkey").alias("ka"), F.col("b.p_partkey").alias("kb"))
        .distinct()
        .collect()
    }

    def lev(x, y):
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy))
                )
            prev = cur
        return prev[-1]

    true_pairs = {
        (i, j)
        for (i, x), (j, y) in combinations(enumerate(names), 2)
        if lev(x, y) <= D.FUZZY_MAX_DIST
    }
    assert true_pairs  # fixture actually exercises the bound
    assert true_pairs <= blocked  # losslessness: no true pair escapes a block


def test_jaccard_df_cap_defuses_hub_shingles(spark):
    """One stop-phrase shingle shared by every document turns the shingle
    self-join into an O(N^2) hub. The DF cap must (a) drop the hub from the
    pair generation entirely, (b) leave genuine near-dup pairs — documents
    sharing discriminative shingles — intact with their capped-universe
    jaccard."""
    from cdc_streamming___v2_spark.operators import dedup as D

    N = 30
    rows = []
    for i in range(N):
        rows.append(Row(doc_id=i, s="click here to"))  # the hub (df = N)
        rows.append(Row(doc_id=i, s=f"unique shingle {i}"))
    # docs 0 and 1 share two discriminative shingles -> jaccard 2/4 = 0.5
    for i in (0, 1):
        rows.append(Row(doc_id=i, s="rare alpha beta"))
        rows.append(Row(doc_id=i, s="rare gamma delta"))
    sh = spark.createDataFrame(rows)

    capped = D._jaccard_pairs(D._df_capped(sh, df_cap=5))
    got = {(r.doc_a, r.doc_b): r.jaccard for r in capped.collect()}
    # only the genuinely-similar pair survives; every hub-only pair is gone
    assert set(got) == {(0, 1)}
    assert abs(got[(0, 1)] - 2 / 4) < 1e-9
    # uncapped baseline: the hub manufactures all N*(N-1)/2 pairs
    assert D._jaccard_pairs(sh).count() == N * (N - 1) // 2


def test_embedding_near_dup_banded_finds_planted_duplicates(spark):
    """The banded-fingerprint near-dup must recover every PLANTED duplicate
    (cosine ~1 -> expected fingerprint hamming << bands, so the pigeonhole
    banding always surfaces the pair) that the O(N^2) brute-force kernel
    finds — the quadratic form exists only to prove this, never to run at
    scale. Deterministic fixture -> stable assert."""
    from cdc_streamming___v2_spark.operators import dedup as D

    DIM, N, DUPS = 64, 120, 15

    def h(i, j, salt):
        return ((i * 2654435761 + j * 40503 + salt * 97) % 65536) / 65536.0 * 2 - 1

    rows = [Row(vec_id=i, v=[h(i, j, 3) for j in range(DIM)]) for i in range(N)]
    # plant near-exact duplicates of the first DUPS vectors (0.3% noise)
    rows += [
        Row(
            vec_id=N + i,
            v=[rows[i].v[j] + 0.003 * h(N + i, j, 11) for j in range(DIM)],
        )
        for i in range(DUPS)
    ]
    e = spark.createDataFrame(rows)

    def pairs(df):
        return {(r.vec_a, r.vec_b) for r in df.collect()}

    brute = pairs(D.embedding_near_dup_bruteforce(e, threshold=0.98))
    banded = pairs(D.embedding_near_dup_frame(e, threshold=0.98))
    planted = {(i, N + i) for i in range(DUPS)}
    assert planted <= brute  # fixture sanity: dups really are near-identical
    assert banded == brute  # banding loses nothing at duplicate similarity


def test_kmeans_ivf_beats_label_cells_on_random_corpus(spark):
    """The driver's labels are random, so label-cell IVF recall is bounded
    by probes/cells (~0.5). k-means cells align with geometry, so at the
    same probe count the learned-cell IVF must recover (nearly) everything.
    Deterministic seeds + fixed iterations -> stable numbers."""
    def pairs(df):
        return {(r.query_id, r.vec_id) for r in df.collect()}

    exact = pairs(S.cosine_topk(spark, SF_SMALL))
    label_recall = len(pairs(S.ann_ivf_topk(spark, SF_SMALL)) & exact) / len(exact)
    km_recall = (
        len(pairs(S.ann_ivf_kmeans_topk(spark, SF_SMALL)) & exact) / len(exact)
    )
    assert km_recall >= 0.9
    assert km_recall > label_recall


def test_incremental_near_dup_matches_exact_cross_side_pairs(spark):
    """Index-probe dedup must find exactly the cross-side pairs that exact
    jaccard keeps AND the banding surfaces — and every reported jaccard
    must equal the exact value over the full shingle sets."""
    from cdc_streamming___v2_spark.operators import dedup as D

    inc = {
        (r.new_id, r.corpus_id): r.jaccard
        for r in D.incremental_near_dup(spark, SF_SMALL).collect()
    }
    exact = {
        tuple(sorted((r.doc_a, r.doc_b))): r.jaccard
        for r in D._jaccard_pairs(D._shingles(spark, SF_SMALL))
        .filter(F.col("jaccard") >= D.JACCARD_THRESHOLD)
        .collect()
    }
    for (new_id, corpus_id), j in inc.items():
        assert new_id % D.INCR_MOD == 0
        assert corpus_id % D.INCR_MOD != 0
        key = tuple(sorted((new_id, corpus_id)))
        assert key in exact
        # operator reports round(jaccard, 4); exact reference is unrounded
        assert abs(exact[key] - j) < 5.1e-5


def test_random_projection_preserves_norms(spark):
    """JL property on the driver embeddings: projected/original norm ratios
    concentrate near 1 (loose bounds — k=16 from 64 dims)."""
    from cdc_streamming___v2_spark.operators import similarity as S2

    rows = S2.random_projection(spark, SF_SMALL).collect()
    assert len(rows) > 0
    ratios = [r.norm_ratio for r in rows]
    # k=16 from 64 dims: individual ratios spread wide (sd ~ 1/sqrt(2k))
    # but must stay bounded, and the mean must sit near 1
    assert all(0.3 <= x <= 2.2 for x in ratios)
    assert 0.85 <= sum(ratios) / len(ratios) <= 1.15


def test_pagerank_nations_is_a_distribution(spark):
    from cdc_streamming___v2_spark.operators import graph as G

    rows = G.pagerank_nations(spark, SF_SMALL).collect()
    assert len(rows) == 25
    total = sum(r.pagerank for r in rows)
    # damping + dangling redistribution conserve total rank mass
    assert abs(total - 1.0) < 1e-3
    assert all(r.pagerank > 0 for r in rows)


def test_lm_bigram_quality_consistency(spark):
    """Cross-entropy must be positive (probabilities < 1 under add-one
    smoothing), perplexity must equal 2^entropy, and every doc must carry
    exactly n_tokens - 1 bigrams."""
    ent = {r.doc_id: r for r in T.lm_bigram_quality(spark, SF_SMALL).collect()}
    toks = {r.doc_id: r.n_tokens_ws for r in T.token_count(spark, SF_SMALL).collect()}
    assert ent
    for doc_id, r in ent.items():
        assert r.cross_entropy_bits > 0
        assert abs(r.perplexity - 2 ** r.cross_entropy_bits) <= 0.01 * r.perplexity
        assert r.n_bigrams == toks[doc_id] - 1


def test_prefix_join_exactly_matches_uncapped_bruteforce(spark):
    """Prefix filtering is EXACT: its output must equal brute-force
    jaccard over the full (uncapped) shingle universe — unlike banding
    (probabilistic recall) or the DF cap (changed universe)."""
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D._jaccard_pairs(D._shingles(spark, SF_SMALL))
        .filter(F.col("jaccard") >= D.JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.jaccard_prefix_join(spark, SF_SMALL).collect()
    }
    assert want  # non-vacuous at sf0.001
    assert got == want


def test_doc_novelty_consistent_with_df(spark):
    """novelty = n_unique/n_shingles, and mean_df >= 1 with equality only
    when every shingle is unique (then novelty == 1)."""
    rows = T.doc_novelty(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        # Spark rounds HALF_UP, Python rounds half-even: compare against
        # the unrounded ratio within half a 4-decimal ulp instead
        assert abs(r.novelty - r.n_unique / r.n_shingles) <= 5.0001e-5
        assert r.mean_df >= 1.0
        if r.mean_df == 1.0:
            assert r.novelty == 1.0


def test_pq_adc_ranks_planted_duplicate_first(spark):
    """A vector identical to the query gets the query's own codes, so its
    ADC distance is the per-subspace minimum — it must rank 1."""
    import random

    rnd = random.Random(7)
    base = [[rnd.uniform(-1, 1) for _ in range(64)] for _ in range(40)]
    rows = [Row(vec_id=i, label=0, v=[float(x) for x in vec])
            for i, vec in enumerate(base)]
    # vec 30..34 duplicate queries 0..4 exactly
    for q in range(5):
        rows[30 + q] = Row(vec_id=30 + q, label=0,
                           v=[float(x) for x in base[q]])
    e = spark.createDataFrame(rows)
    out = S.pq_topk_frame(e, n_queries=5, top_k=3).collect()
    first = {r.query_id: r.vec_id for r in out if r.rank == 1}
    assert first == {q: 30 + q for q in range(5)}


def test_pq_recall_vs_brute_force(spark):
    exact = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk(spark, SF_SMALL).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in S.ann_pq_topk(spark, SF_SMALL).collect()
    }
    # 8-cell x 4-subspace PQ on random near-orthogonal vectors is the
    # coarsest quantizer in the tier; still must beat random (10/N ~ 0.01)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.15, f"PQ recall too low: {recall}"


def test_pq_codes_bounded(spark):
    """Every (vec_id, m) gets exactly one code in [0, PQ_K)."""
    from cdc_streamming___v2_spark.operators.similarity import (
        PQ_K, PQ_M, _embeddings, pq_topk_frame,  # noqa: F401
    )

    e = _embeddings(spark, SF_SMALL)
    # exercise the encode path via the public frame; structural props on out
    out = S.pq_topk_frame(e).collect()
    assert all(1 <= r.rank <= 10 for r in out)
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, set()).add(r.vec_id)
    assert all(len(v) == 10 for v in per_q.values())
    assert all(r.adc_dist >= -1e-9 for r in out)  # squared distances


def test_sorted_neighborhood_no_cartesian_and_window_bound(spark):
    from .test_plans import _plan

    df = D.sorted_neighborhood_pairs(spark, SF_SMALL)
    p = _plan(spark, df)
    assert "CartesianProduct" not in p
    rows = df.collect()
    # symmetric-free: each pair emitted once, a before b in sort order
    assert all(r.name_a < r.name_b or r.lev > 0 for r in rows)
    assert all(r.lev <= D.SNM_MAX_LEV for r in rows)


def test_silhouette_separated_clusters_score_high(spark):
    """Well-separated synthetic clusters must earn silhouette near 1;
    the driver's random labels must sit near 0 (structure detection)."""
    import random

    rnd = random.Random(3)
    rows = []
    for i in range(60):
        lab = i % 3
        center = [0.0] * 64
        center[lab] = 10.0
        rows.append(
            Row(vec_id=i, label=lab,
                v=[c + rnd.uniform(-0.1, 0.1) for c in center])
        )
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("label", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    df = spark.createDataFrame(
        [(r.vec_id, r.label, r.v) for r in rows], schema
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = S.silhouette_score(spark, d).collect()
    assert all(r.mean_silhouette > 0.9 for r in out)
    real = S.silhouette_score(spark, SF_SMALL).collect()
    assert all(abs(r.mean_silhouette) < 0.2 for r in real)


def test_minhash_kernel_matches_jvm_formulation(spark):
    """The vectorized Arrow kernel must produce bit-identical signatures
    and identical shingle sets to the pure-JVM built-in formulation."""
    jvm = {
        r.doc_id: tuple(r[f"m{i}"] for i in range(D.MINHASH_K))
        for r in D._signatures_from_sets(
            D._shingle_sets(spark, SF_SMALL)
        ).collect()
    }
    ker = D._minhash_kernel(spark, SF_SMALL).collect()
    got = {r.doc_id: tuple(r[f"m{i}"] for i in range(D.MINHASH_K)) for r in ker}
    assert got == jvm
    jvm_sets = {
        r.doc_id: set(r.sa)
        for r in D._shingle_sets(spark, SF_SMALL).collect()
    }
    assert {r.doc_id: set(r.sa) for r in ker} == jvm_sets


def test_exploded_shingles_kernel_matches_jvm(spark):
    from cdc_streamming___v2_spark.sources.tables import (
        exploded_shingles, exploded_shingles_jvm, load_table,
    )

    d = load_table(spark, SF_SMALL, "documents")
    ker = {(r.doc_id, r.s) for r in exploded_shingles(d, 3).collect()}
    jvm = {(r.doc_id, r.s) for r in exploded_shingles_jvm(d, 3).collect()}
    assert ker == jvm and ker


# Edge-whitespace torture set (ADVICE r3): Spark trim strips only ' ' and
# Java \s is ASCII, while Python str.strip()/\s are Unicode-aware — the
# kernels must match the JVM on leading tabs ('' token survives), embedded
# newlines/CRs (ASCII \s splits), U+00A0 and U+2028 (NOT whitespace on the
# JVM: they stay inside tokens), and trailing whitespace runs.
_DIRTY_TEXTS = [
    "\talpha beta gamma delta",          # leading tab -> leading '' token
    "alpha beta gamma delta echo",  # NBSP glues 'alpha\xa0beta'
    "one two\nthree\rfour five",         # embedded newline/CR split
    "  padded start and end  ",          # ' '-only trim both sides
    "x\u2028y line separator a b c",     # U+2028 stays inside a token
    "tab\tsep\ttokens here now",
    "trailing newline run a b c\n\n",
    None,
    "",
    "   ",                               # spaces only -> [''] on JVM
    "short one",                         # < n tokens
]


def test_kernel_tokenization_matches_jvm_on_dirty_whitespace(spark, tmp_path):
    from cdc_streamming___v2_spark.sources.tables import (
        exploded_shingles, exploded_shingles_jvm,
    )

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_DIRTY_TEXTS)], "doc_id long, text string"
    )
    ker = {(r.doc_id, r.s) for r in exploded_shingles(d, 3).collect()}
    jvm = {(r.doc_id, r.s) for r in exploded_shingles_jvm(d, 3).collect()}
    assert ker == jvm and ker
    # the NBSP doc must produce a glued token, proving ASCII (not Unicode)
    # split semantics on both sides
    assert any("alpha beta" in s for _, s in ker)

    # minhash kernel parity on the same dirty corpus (written as a
    # documents table because the kernel loads from an sf_dir)
    sf = str(tmp_path)
    d.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    jvm_sig = {
        r.doc_id: tuple(r[f"m{i}"] for i in range(D.MINHASH_K))
        for r in D._signatures_from_sets(D._shingle_sets(spark, sf)).collect()
    }
    ker_sig = {
        r.doc_id: tuple(r[f"m{i}"] for i in range(D.MINHASH_K))
        for r in D._minhash_kernel(spark, sf).collect()
    }
    assert ker_sig == jvm_sig and ker_sig


def test_mmr_first_pick_is_top_cosine_and_diversity_improves(spark):
    """Round 1 has no diversity penalty, so the EXACT-pool variant's
    rank-1 pick must equal the exact cosine top-1 (MMR semantics), and the
    registered ANN-pool variant's rank-1 must equal the LSH top-1 (same
    greedy algebra over its own pool)."""
    mmr_exact = S.mmr_diverse_topk_exact_pool(spark, SF_SMALL).collect()
    top = {
        (r.query_id, r.rank): r.vec_id
        for r in S.cosine_topk(spark, SF_SMALL).collect()
    }
    first = {r.query_id: r.vec_id for r in mmr_exact if r.rank == 1}
    assert first == {q: top[(q, 1)] for q in first}

    mmr = S.mmr_diverse_topk(spark, SF_SMALL).collect()
    lsh_top = {
        (r.query_id, r.rank): r.vec_id
        for r in S.lsh_topk_frame(
            S._embeddings(spark, SF_SMALL), top_k=1
        ).collect()
    }
    ann_first = {r.query_id: r.vec_id for r in mmr if r.rank == 1}
    assert ann_first == {q: lsh_top[(q, 1)] for q in ann_first}
    # structural: K selections per query, all distinct — both variants
    for res in (mmr, mmr_exact):
        per_q = {}
        for r in res:
            per_q.setdefault(r.query_id, []).append(r.vec_id)
        assert all(
            len(v) == S.MMR_K and len(set(v)) == S.MMR_K
            for v in per_q.values()
        )


def test_blocking_quality_metrics_consistent(spark):
    r = D.blocking_quality(spark, SF_SMALL).collect()[0]
    assert r.n_all_pairs == r.n_names * (r.n_names - 1) // 2
    assert 0 <= r.n_found <= r.n_true_matches
    assert r.n_candidates <= r.n_all_pairs
    assert 0.0 <= r.pairs_completeness <= 1.0
    assert 0.0 <= r.reduction_ratio < 1.0
    # SNM with window 5 on a 64-name dictionary prunes hard
    assert r.reduction_ratio > 0.8


def test_emb_adaptive_band_bits_derivation():
    """The registered embedding_near_dup derives band width from corpus
    size (VERDICT r4 #3): 16 bits at the bench corpus, 32 at the 10x
    scale-evidence corpus, capped at the signed-long fingerprint width."""
    from cdc_streamming___v2_spark.operators.dedup import (
        emb_adaptive_band_bits,
    )

    assert emb_adaptive_band_bits(1) == 4
    assert emb_adaptive_band_bits(2000) == 4  # bench corpus -> 16 bits
    assert emb_adaptive_band_bits(20000) == 8  # 10x corpus -> 32 bits
    assert emb_adaptive_band_bits(1 << 40) == 15  # signed-long cap
    vals = [emb_adaptive_band_bits(n) for n in (10, 100, 10**4, 10**6, 10**9)]
    assert vals == sorted(vals)  # monotone in corpus size
