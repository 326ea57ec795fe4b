"""Classic-ML training primitives as relational plans (DRIVER surface,
round 5): the supervised/feature-engineering tier a training-data platform
runs next to its dedup/similarity/quality tiers — all expressed as
aggregations and joins (zero iterative Python, zero row-at-a-time UDFs),
each with a DuckDB oracle twin.

Operators:
- ``naive_bayes_lang``: multinomial Naive Bayes (train + predict in ONE
  plan) over the documents corpus — class priors and Laplace-smoothed token
  likelihoods are aggregations; scoring is a token-likelihood join;
  the confusion matrix is the output contract.
- ``knn_label_predict``: exact k-NN majority-vote label prediction over the
  embeddings table (the evaluation-time twin of the ANN tier's candidate
  generators).
- ``feature_hashing``: the hashing trick — sparse bucket-count feature
  vectors via an engine-portable md5 bucket hash.
- ``chi2_feature_select``: per-source top-k discriminative tokens by the
  chi-square statistic over doc-level presence contingency tables.
- ``heavy_hitters_topfreq``: EXACT frequent-item mining via the mergeable
  two-pass pattern (per-partition Misra-Gries candidate summaries ->
  exact recount of the candidate union) — the 100-TB shape for "what are
  the >0.1% tokens" questions.

Scale notes per operator inline.  Reference parity: the reference
(a 176-line Beam CDC pipeline) has no ML surface; these extend the
[DRIVER]-mandated training-pipeline tier (SURVEY.md §2.C).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.texts import md5_hash_long, words
from ..sources.tables import load_table

# --- naive bayes -------------------------------------------------------------

NB_ROUND = 6  # argmax runs on scores rounded here — cross-engine stable

_WORDS_SQL = "regexp_split_to_array(trim(text), '\\s+')"


def naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained AND applied in
    one DataFrame plan: P(c) from document counts, P(w|c) with Laplace
    smoothing from token counts, per-doc class score = log prior + sum of
    per-occurrence log likelihoods, argmax -> confusion matrix against the
    declared ``lang`` column.

    Determinism: the argmax compares round(score, NB_ROUND) with lang-name
    tie-break, so float reassociation noise (~1e-13 on hundred-term log
    sums) cannot flip predictions between engines.

    Scale: training is two token-keyed aggregations (map-side combined);
    scoring joins each token OCCURRENCE against the (token, class)
    likelihood table — |tokens| x |classes| rows, linear in corpus size
    with class count a small constant; unseen (token, class) pairs take
    the broadcast per-class smoothing default.  The confusion matrix is a
    class^2-sized final aggregate.  No driver loops: "training" IS the
    aggregation.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = d.select(
        "doc_id", "lang", F.explode(words(F.col("text"))).alias("w")
    )
    classes = d.groupBy(F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).alias("n_docs_c")
    )
    n_docs = d.count()
    # token counts per (class, token) and totals per class — materialized
    # once (class x vocab bounded): the vocabulary size, the class totals
    # and the likelihood table all fold from it, and the vocab count no
    # longer needs its own pass over the exploded token stream (r11:
    # three token passes -> two; 26-Exchange plan un-cut)
    wc = toks.groupBy(F.col("lang").alias("c"), "w").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=True)
    # every token row carries a lang, so distinct w over (c, w) counts ==
    # distinct w over the raw stream
    vocab_n = wc.select("w").distinct().count()
    tot_c = wc.groupBy("c").agg(F.sum("cnt").alias("tok_c"))
    ll = (
        wc.join(tot_c, "c")
        .select(
            "c",
            "w",
            F.log((F.col("cnt") + 1.0) / (F.col("tok_c") + F.lit(float(vocab_n))))
            .alias("ll"),
        )
    )
    # per-class smoothing default for unseen tokens + log prior
    cls = (
        classes.join(tot_c, classes.c == tot_c.c, "left")
        .select(
            classes.c.alias("c"),
            F.log(F.col("n_docs_c") / F.lit(float(n_docs))).alias("log_prior"),
            (-F.log(F.coalesce(F.col("tok_c"), F.lit(0)) + F.lit(float(vocab_n))))
            .alias("ll_default"),
        )
    )
    scored = (
        toks.select("doc_id", F.col("lang").alias("declared"), "w")
        .crossJoin(F.broadcast(cls))
        .join(ll, ["c", "w"], "left")
        .groupBy("doc_id", "declared", "c", "log_prior")
        .agg(F.sum(F.coalesce(F.col("ll"), F.col("ll_default"))).alias("s"))
        .select(
            "doc_id",
            "declared",
            "c",
            F.round(F.col("log_prior") + F.col("s"), NB_ROUND).alias("score"),
        )
    )
    pred = (
        scored.groupBy("doc_id", "declared")
        .agg(
            # max of (score, c) struct == ORDER BY score DESC, c DESC pick —
            # exactly the oracle's row_number ordering
            F.max_by(
                F.col("c"), F.struct(F.col("score"), F.col("c"))
            ).alias("predicted")
        )
    )
    return pred.groupBy(
        F.col("declared").alias("declared_lang"),
        F.col("predicted").alias("predicted_lang"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))


def _nb_oracle() -> str:
    return f"""
        WITH d AS (SELECT doc_id, lang, text FROM documents),
        toks AS (
            SELECT doc_id, lang, unnest({_WORDS_SQL}) AS w FROM d
        ),
        nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM d),
        vn AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM toks),
        classes AS (SELECT lang AS c, count(*) AS n_docs_c FROM d GROUP BY 1),
        wc AS (SELECT lang AS c, w, count(*) AS cnt FROM toks GROUP BY 1, 2),
        tot_c AS (SELECT c, sum(cnt) AS tok_c FROM wc GROUP BY c),
        ll AS (
            SELECT wc.c, wc.w, ln((wc.cnt + 1.0) / (t.tok_c + vn.v)) AS ll
            FROM wc JOIN tot_c t ON wc.c = t.c CROSS JOIN vn
        ),
        cls AS (
            SELECT cl.c, ln(cl.n_docs_c / nd.n_docs) AS log_prior,
                   -ln(coalesce(t.tok_c, 0) + vn.v) AS ll_default
            FROM classes cl
            LEFT JOIN tot_c t ON cl.c = t.c
            CROSS JOIN nd CROSS JOIN vn
        ),
        scored AS (
            SELECT tk.doc_id, tk.lang AS declared, cls.c,
                   round(cls.log_prior
                         + sum(coalesce(ll.ll, cls.ll_default)), {NB_ROUND})
                       AS score
            FROM toks tk
            CROSS JOIN cls
            LEFT JOIN ll ON ll.c = cls.c AND ll.w = tk.w
            GROUP BY tk.doc_id, tk.lang, cls.c, cls.log_prior
        ),
        pred AS (
            SELECT doc_id, declared, c AS predicted FROM (
                SELECT doc_id, declared, c,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, c DESC) AS rn
                FROM scored) WHERE rn = 1
        )
        SELECT declared AS declared_lang, predicted AS predicted_lang,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY 1, 2
    """


# --- knn ---------------------------------------------------------------------

KNN_K = 10


def knn_label_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN majority-vote label prediction for the query vectors
    (vec_id < N_QUERIES, the similarity module's query convention): find
    the KNN_K cosine-nearest OTHER vectors, vote by their ``label`` with
    (count desc, label asc) tie-break.

    Scale: reuses the broadcast-query brute-force kernel
    (similarity.cosine_topk_frame: query side broadcast, corpus never
    shuffles, per-query TakeOrdered) — the evaluation-time exact scorer;
    swap in any ANN candidate generator from the similarity module for
    the approximate production path without touching the vote.
    """
    from .similarity import N_QUERIES, cosine_topk_frame, _embeddings

    e = _embeddings(spark, sf_dir)
    topk = cosine_topk_frame(e, n_queries=N_QUERIES, top_k=KNN_K)
    votes = (
        topk.join(
            e.select(F.col("vec_id"), F.col("label")), "vec_id"
        )
        .groupBy("query_id", "label")
        .agg(
            F.count(F.lit(1)).alias("n_votes"),
            F.max("cos_sim").alias("best_sim"),
        )
    )
    pick = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("label").cast("bigint").alias("predicted_label"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
            F.col("best_sim").alias("best_sim"),
        )
    )


def _knn_oracle() -> str:
    from .similarity import N_QUERIES

    cos = (
        "list_dot_product(q.qv, e.v) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * "
        "sqrt(list_dot_product(e.v, e.v)))"
    )
    return f"""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                   FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id < {N_QUERIES}),
        pairs AS (
            SELECT q.query_id, e.vec_id, e.label,
                   round({cos}, 4) AS cos_sim
            FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
        ),
        topk AS (
            SELECT query_id, vec_id, label, cos_sim FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, vec_id ASC) AS rank
                FROM pairs) WHERE rank <= {KNN_K}
        ),
        votes AS (
            SELECT query_id, label, count(*) AS n_votes,
                   max(cos_sim) AS best_sim
            FROM topk GROUP BY 1, 2
        )
        SELECT CAST(query_id AS BIGINT) AS query_id,
               CAST(label AS BIGINT) AS predicted_label,
               CAST(n_votes AS BIGINT) AS n_votes, best_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY n_votes DESC, label ASC) AS rn
              FROM votes) WHERE rn = 1
    """


# --- feature hashing ---------------------------------------------------------

FH_BUCKETS = 64


def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): token -> bucket =
    md5_hash mod FH_BUCKETS; per-document SPARSE feature vector as
    (doc_id, bucket, count) rows — the storage format a downstream trainer
    consumes, with no vocabulary dictionary to build or broadcast.

    Scale: one narrow projection (hash + mod inside the scan stage) and
    one (doc_id, bucket)-keyed aggregation with map-side combine; output
    cardinality <= docs x FH_BUCKETS.  The engine-portable md5 bucket hash
    makes the vectors reproducible across engines and runs — the property
    that lets a 100-TB featurization job resume/backfill safely.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    return (
        toks.select(
            "doc_id",
            F.pmod(md5_hash_long(F.col("w")), F.lit(FH_BUCKETS)).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


_FH_ORACLE = f"""
    SELECT doc_id,
           CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % {FH_BUCKETS}
               AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents)
    GROUP BY 1, 2
"""


# --- chi-square feature selection --------------------------------------------

CHI2_TOP = 10


def chi2_feature_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-CHI2_TOP discriminative tokens by the chi-square
    statistic over doc-level presence (one-vs-rest contingency table per
    (source, token)): the classic supervised vocabulary-selection step
    before training a per-domain classifier.

    All four contingency cells derive from two aggregates (doc-term
    presence counts per source, term totals) plus broadcast class sizes —
    integer arithmetic into one double division, so both engines compute
    bit-identical statistics and the rank tie-break (chi2 desc, token asc)
    is exact.

    Scale: presence is a distinct doc-term aggregate (corpus-sized
    shuffle, the unavoidable one); everything after runs at vocabulary x
    sources cardinality.  The rank window partitions by source — parallel
    across classes, each over a vocab-sized frame.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    present = d.select(
        "doc_id", "source", F.explode(F.array_distinct(words(F.col("text")))).alias("w")
    ).distinct()
    n_total = d.count()
    src_sizes = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    a = present.groupBy("source", "w").agg(F.count(F.lit(1)).alias("a"))
    term_tot = present.groupBy("w").agg(F.count(F.lit(1)).alias("t"))
    cells = (
        a.join(term_tot, "w")
        .join(F.broadcast(src_sizes), "source")
        .select(
            "source",
            "w",
            F.col("a").cast("long").alias("a"),
            (F.col("t") - F.col("a")).cast("long").alias("b"),
            (F.col("n_src") - F.col("a")).cast("long").alias("c"),
            (F.lit(n_total) - F.col("n_src") - F.col("t") + F.col("a"))
            .cast("long")
            .alias("dd"),
        )
    )
    num = F.lit(float(n_total)) * F.pow(
        F.col("a") * F.col("dd") - F.col("b") * F.col("c"), F.lit(2.0)
    )
    den = (
        (F.col("a") + F.col("b"))
        * (F.col("c") + F.col("dd"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("dd"))
    ).cast("double")
    chi = cells.select(
        "source",
        "w",
        "a",
        F.round(
            F.when(den > 0, num / den).otherwise(F.lit(0.0)), 4
        ).alias("chi2"),
    )
    rank = Window.partitionBy("source").orderBy(
        F.col("chi2").desc(), F.col("w").asc()
    )
    return (
        chi.withColumn("rank", F.row_number().over(rank))
        .filter(F.col("rank") <= CHI2_TOP)
        .select(
            "source",
            F.col("w").alias("token"),
            F.col("a").alias("n_docs_with"),
            "chi2",
            "rank",
        )
    )


def _chi2_oracle() -> str:
    return f"""
        WITH d AS (SELECT doc_id, source, text FROM documents),
        present AS (
            SELECT DISTINCT doc_id, source, w
            FROM (SELECT doc_id, source, unnest({_WORDS_SQL}) AS w FROM d)
        ),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        ss AS (SELECT source, count(*) AS n_src FROM d GROUP BY 1),
        aa AS (SELECT source, w, CAST(count(*) AS BIGINT) AS a
               FROM present GROUP BY 1, 2),
        tt AS (SELECT w, count(*) AS t FROM present GROUP BY 1),
        cells AS (
            SELECT aa.source, aa.w, aa.a,
                   CAST(tt.t - aa.a AS BIGINT) AS b,
                   CAST(ss.n_src - aa.a AS BIGINT) AS c,
                   CAST(nt.n - ss.n_src - tt.t + aa.a AS BIGINT) AS dd
            FROM aa JOIN tt ON aa.w = tt.w
            JOIN ss ON aa.source = ss.source
            CROSS JOIN nt
        ),
        chi AS (
            SELECT source, w, a,
                   round(CASE WHEN (a+b)*(c+dd)*(a+c)*(b+dd) > 0
                              THEN nt.n * pow(a*dd - b*c, 2.0)
                                   / CAST((a+b)*(c+dd)*(a+c)*(b+dd) AS DOUBLE)
                              ELSE 0.0 END, 4) AS chi2
            FROM cells CROSS JOIN nt
        )
        SELECT source, w AS token, a AS n_docs_with, chi2, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY source
                          ORDER BY chi2 DESC, w ASC) AS rank
            FROM chi) WHERE rank <= {CHI2_TOP}
    """


# --- exact heavy hitters via mergeable candidates ----------------------------

HH_K = 200  # report tokens with frequency > N / HH_K


def heavy_hitters_topfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (tokens with count * HH_K > N) by the mergeable
    two-pass pattern:

    pass 1 — per-partition Misra-Gries summaries (HH_K counters each,
    Arrow-batched mapPartitions via mapInPandas, NO shuffle): the MG
    guarantee says any token with global frequency > N/HH_K survives in at
    least one partition's summary, so the union of summaries is a
    candidate SUPERSET — this is the sketch a 1000-executor job would
    ship to the driver (bytes: partitions x HH_K tokens).

    pass 2 — exact recount of candidates only: semi-join the token stream
    against the (tiny, broadcast) candidate set, count, and keep
    count * HH_K > N with INTEGER arithmetic — exact, engine-portable, no
    float threshold.

    The output is therefore EXACTLY the true heavy-hitter set with exact
    counts — partitioning changes the intermediate candidate set but never
    the result (the property the oracle's plain GROUP BY ... HAVING
    verifies).  Scale: pass 1 narrow; pass 2 shuffles only candidate-
    matching rows (<= partitions x HH_K distinct tokens).
    """
    d = load_table(spark, sf_dir, "documents").select("text")
    toks = d.select(F.explode(words(F.col("text"))).alias("w"))
    n_total = toks.count()

    k = HH_K

    def mg_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in it:
            for w in pdf["w"]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:  # decrement-all step (batched as dict rebuild)
                    counters = {
                        t: c - 1 for t, c in counters.items() if c > 1
                    }
        yield pd.DataFrame({"w": list(counters.keys())})

    candidates = (
        toks.mapInPandas(
            mg_partition, schema=T.StructType([T.StructField("w", T.StringType())])
        )
        .distinct()
    )
    return (
        toks.join(F.broadcast(candidates), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .filter(F.col("n_occurrences") * k > n_total)
        .select(F.col("w").alias("token"), "n_occurrences")
    )


_HH_ORACLE = f"""
    WITH toks AS (SELECT unnest({_WORDS_SQL}) AS w FROM documents),
    nt AS (SELECT count(*) AS n FROM toks)
    SELECT w AS token, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM toks CROSS JOIN nt
    GROUP BY w, nt.n
    HAVING count(*) * {HH_K} > nt.n
"""


QUERIES = {
    "naive_bayes_lang": naive_bayes_lang,
    "knn_label_predict": knn_label_predict,
    "feature_hashing": feature_hashing,
    "chi2_feature_select": chi2_feature_select,
    "heavy_hitters_topfreq": heavy_hitters_topfreq,
}

ORACLES = {
    "naive_bayes_lang": _nb_oracle(),
    "knn_label_predict": _knn_oracle(),
    "feature_hashing": _FH_ORACLE,
    "chi2_feature_select": _chi2_oracle(),
    "heavy_hitters_topfreq": _HH_ORACLE,
}


# --- nearest-centroid classifier ---------------------------------------------

NC_SCALE = 1000  # fixed-point quantization: 3 decimals per element


def nearest_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification over the embeddings table:
    train on even vec_ids (per-label mean vector), classify the odd half by
    smallest squared Euclidean distance, ties to the smaller label.  The
    third classifier shape next to Naive Bayes (generative) and kNN
    (instance-based): one broadcast-sized model, one scan to score.

    Exactness: elements quantize to integer thousandths in the scan, so
    centroid numerators/counts are exact integers and each centroid
    coordinate is ONE division (bit-identical doubles both engines); the
    distance sum reassociates at ~1e-16 relative, rounded at 6 far above
    the noise, and the argmin breaks ties deterministically by label.

    Scale: the centroid frame is (labels x dims) — broadcast; scoring is
    scan + explode + one (vec, label)-keyed map-side-combined agg; no
    shuffle of the raw vectors beyond the explode's doc-keyed reduce.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x").cast("double") * NC_SCALE).cast("long").alias("xi"),
    )
    tr = ex.filter(F.col("vec_id") % 2 == 0)
    te = ex.filter(F.col("vec_id") % 2 == 1)
    cent = tr.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.sum("xi").alias("num"), F.count(F.lit(1)).alias("cnt")
    )
    diff = F.col("xi") - F.col("num") / F.col("cnt")
    dist = (
        te.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", F.col("label").alias("true_label"), "clabel")
        .agg(F.round(F.sum(diff * diff), 6).alias("d"))
    )
    pick = dist.groupBy("vec_id", "true_label").agg(
        F.min(F.struct(F.col("d"), F.col("clabel"))).alias("m")
    )
    return pick.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("true_label").cast("bigint").alias("true_label"),
        F.col("m.clabel").cast("bigint").alias("pred_label"),
        (F.col("true_label") == F.col("m.clabel")).alias("correct"),
    )


QUERIES["nearest_centroid_classify"] = nearest_centroid_classify
ORACLES["nearest_centroid_classify"] = f"""
    WITH ex AS (
        SELECT vec_id, label,
               unnest(generate_series(1, len(embedding))) AS pos,
               unnest(list_transform(embedding::DOUBLE[],
                      x -> CAST(round(x * {NC_SCALE}, 0) AS BIGINT))) AS xi
        FROM embeddings
    ),
    tr AS (SELECT * FROM ex WHERE vec_id % 2 = 0),
    te AS (SELECT * FROM ex WHERE vec_id % 2 = 1),
    cent AS (SELECT label AS clabel, pos, sum(xi) AS num, count(*) AS cnt
             FROM tr GROUP BY 1, 2),
    dist AS (
        SELECT t.vec_id, t.label AS true_label, c.clabel,
               round(sum((t.xi - c.num * 1.0 / c.cnt)
                         * (t.xi - c.num * 1.0 / c.cnt)), 6) AS d
        FROM te t JOIN cent c ON t.pos = c.pos
        GROUP BY 1, 2, 3
    ),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                             ORDER BY d, clabel) AS rk
               FROM dist)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(true_label AS BIGINT) AS true_label,
           CAST(clabel AS BIGINT) AS pred_label,
           true_label = clabel AS correct
    FROM ranked WHERE rk = 1
"""


# --- decision stump ----------------------------------------------------------


def decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decision-stump training (the depth-1 CART split; Breiman et
    al., public): find the threshold t on the word-count feature that
    minimizes weighted Gini impurity of the split ``n_words <= t`` for the
    binary label ``lang == 'en'`` — the boosting/tree-ensemble base
    learner, trained as pure relational algebra.

    Construction: one corpus aggregation to the distinct-feature-value
    frame (bounded by the feature's value grid, NOT the corpus — the
    AUC/STL bounded-frame argument), cumulative class counts via one
    ordered window, the Gini of every candidate split as exact-integer
    divisions, and an argmin.  No per-candidate pass over the data: every
    candidate is scored from the same cumulative frame.

    Exactness: class counts are integers; each impurity term is division/
    multiplication of identical exact operands on both engines; the argmin
    compares 6-rounded impurity with a threshold tie-break.
    """
    from ..functions.texts import n_tokens_ws

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        n_tokens_ws(F.col("text")).alias("x"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    g = scored.groupBy("x").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = g.withColumn("cn", F.sum("n").over(w)).withColumn(
        "cp", F.sum("pos").over(w)
    )
    # grand totals as unbounded windows over the bounded value-grid frame
    # (a crossJoin against an agg of the same frame trips Spark's
    # self-join ambiguity resolver)
    c = (
        cum.withColumn("N", F.max("cn").over(wall))
        .withColumn("P", F.max("cp").over(wall))
        .filter(F.col("cn") < F.col("N"))
    )
    pl = F.col("cp") / F.col("cn")
    ql = (F.col("cn") - F.col("cp")) / F.col("cn")
    nr = F.col("N") - F.col("cn")
    pr = (F.col("P") - F.col("cp")) / nr
    qr = (nr - (F.col("P") - F.col("cp"))) / nr
    gini = (
        F.col("cn") * (F.lit(1.0) - pl * pl - ql * ql)
        + nr * (F.lit(1.0) - pr * pr - qr * qr)
    ) / F.col("N")
    ranked = c.select(
        F.col("x").alias("threshold"),
        F.round(gini, 6).alias("gini"),
        F.col("cn").cast("bigint").alias("n_left"),
        nr.cast("bigint").alias("n_right"),
        F.col("cp").cast("bigint").alias("pos_left"),
        (F.col("P") - F.col("cp")).cast("bigint").alias("pos_right"),
    )
    return ranked.orderBy(F.col("gini").asc(), F.col("threshold").asc()).limit(1)


ORACLES["decision_stump_train"] = """
    WITH scored AS (
        SELECT CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                   AS x,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    g AS (SELECT x, count(*) AS n, sum(y) AS pos FROM scored GROUP BY 1),
    cum AS (
        SELECT x,
               sum(n) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cn,
               sum(pos) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cp
        FROM g
    ),
    tot AS (SELECT max(cn) AS N, max(cp) AS P FROM cum),
    c AS (SELECT cum.*, tot.N, tot.P FROM cum, tot WHERE cn < N),
    ranked AS (
        SELECT CAST(x AS BIGINT) AS threshold,
               round((cn * (1.0 - (cp * 1.0 / cn) * (cp * 1.0 / cn)
                            - ((cn - cp) * 1.0 / cn) * ((cn - cp) * 1.0 / cn))
                      + (N - cn) * (1.0
                            - ((P - cp) * 1.0 / (N - cn))
                              * ((P - cp) * 1.0 / (N - cn))
                            - (((N - cn) - (P - cp)) * 1.0 / (N - cn))
                              * (((N - cn) - (P - cp)) * 1.0 / (N - cn))))
                     / N, 6) AS gini,
               CAST(cn AS BIGINT) AS n_left,
               CAST(N - cn AS BIGINT) AS n_right,
               CAST(cp AS BIGINT) AS pos_left,
               CAST(P - cp AS BIGINT) AS pos_right
        FROM c
    )
    SELECT * FROM ranked ORDER BY gini ASC, threshold ASC LIMIT 1
"""
QUERIES["decision_stump_train"] = decision_stump_train


# --------------------------------------------------------------------------
# round-5 restarted-session: grid-density (DBSCAN-style) clustering
# --------------------------------------------------------------------------

GRID_EPS = 0.02    # cell width on the first two embedding dimensions
GRID_MINPTS = 6    # 3x3-neighborhood density threshold for a core cell


def grid_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering (cell-granularity DBSCAN) of the embeddings
    projected onto their first two dimensions: a cell is CORE when its
    3x3 neighborhood holds >= GRID_MINPTS points; clusters are connected
    components of adjacent core cells; points in core cells join their
    cell's cluster, points in non-core cells adjacent to a core cell are
    border members (min neighboring cluster id), the rest are noise
    (cluster -1).  This is the standard at-scale DBSCAN surrogate: the
    eps-neighborhood is approximated by the 3x3 cell block, so every step
    is a bounded-grid equi-join, never a point-to-point distance join.

    Scale: points reduce to the cell grid ONCE (grid cardinality is
    bounded by the value range / eps, independent of corpus size);
    density is a 9-offset equi-join on that bounded frame; connected
    components run on the core-cell graph (pointer-doubling, O(log
    diameter) rounds) — all component machinery reused from
    pipeline_ops.connected_components.
    """
    from .pipeline_ops import connected_components
    from .similarity import _embeddings

    e = _embeddings(spark, sf_dir)
    pts = e.select(
        "vec_id",
        F.floor(F.element_at("v", 1) / GRID_EPS).cast("long").alias("cx"),
        F.floor(F.element_at("v", 2) / GRID_EPS).cast("long").alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    offs = (
        spark.range(-1, 2)
        .select(F.col("id").alias("dx"))
        .crossJoin(spark.range(-1, 2).select(F.col("id").alias("dy")))
    )
    # each cell contributes its count to all 9 neighbors; density(cell) =
    # sum of contributions landing on it (geo_grid_join offset pattern)
    contrib = cells.crossJoin(F.broadcast(offs)).select(
        (F.col("cx") + F.col("dx")).alias("tx"),
        (F.col("cy") + F.col("dy")).alias("ty"),
        "n",
    )
    dens = contrib.groupBy("tx", "ty").agg(F.sum("n").alias("density"))
    key = ((F.col("cx") + 1000) * 100000 + (F.col("cy") + 1000)).alias("k")
    core = (
        cells.join(
            dens, (cells.cx == dens.tx) & (cells.cy == dens.ty)
        )
        .filter(F.col("density") >= GRID_MINPTS)
        .select("cx", "cy", key, "n")
        .localCheckpoint(eager=True)
    )
    shifted = core.crossJoin(F.broadcast(offs)).select(
        F.col("k").alias("doc_a"),
        (F.col("cx") + F.col("dx")).alias("nx"),
        (F.col("cy") + F.col("dy")).alias("ny"),
    )
    edges = shifted.join(
        core.select(
            F.col("cx").alias("nx"), F.col("cy").alias("ny"),
            F.col("k").alias("doc_b"),
        ),
        ["nx", "ny"],
    ).select("doc_a", "doc_b")
    labels, _rounds = connected_components(spark, edges)
    # core_lab is grid-bounded and consumed three times (n_cells,
    # core_pts, border_pts) — materialize once; and BROADCAST it (and
    # core) into the point-side joins: a checkpointed frame loses its
    # size estimate, so without the hint the planner shuffled the
    # point frame into SortMergeJoins (r11 plan: 20 SMJ). The grid side
    # is bounded by value-range/eps at any corpus size — broadcasting it
    # is the 100 TB plan: the fact-sized point frame never shuffles.
    core_lab = core.join(
        labels.select(F.col("node").alias("k"), F.col("label").alias("cluster")),
        "k",
    ).localCheckpoint(eager=True)
    n_cells = core_lab.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_core_cells")
    )
    core_pts = pts.join(
        F.broadcast(core_lab.select("cx", "cy", "cluster")), ["cx", "cy"]
    ).select("vec_id", "cluster")
    non_core_pts = pts.join(
        F.broadcast(core.select("cx", "cy", F.lit(1).alias("is_core"))),
        ["cx", "cy"], "left",
    ).filter(F.col("is_core").isNull()).select("vec_id", "cx", "cy")
    border_pts = (
        non_core_pts.crossJoin(F.broadcast(offs))
        .select(
            "vec_id",
            (F.col("cx") + F.col("dx")).alias("nx"),
            (F.col("cy") + F.col("dy")).alias("ny"),
        )
        .join(
            F.broadcast(core_lab.select(
                F.col("cx").alias("nx"), F.col("cy").alias("ny"), "cluster"
            )),
            ["nx", "ny"],
        )
        .groupBy("vec_id")
        .agg(F.min("cluster").alias("cluster"))
    )
    assigned = core_pts.union(border_pts.select("vec_id", "cluster"))
    # cluster-bounded; materialized because the noise row below derives
    # n_assigned from it algebraically (sum of per-cluster counts ==
    # count of assigned) instead of re-running the whole assignment union
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    ).localCheckpoint(eager=True)
    clusters = n_cells.join(sizes, "cluster", "left").select(
        F.col("cluster").cast("bigint").alias("cluster"),
        "n_core_cells",
        F.coalesce("n_points", F.lit(0)).cast("bigint").alias("n_points"),
    )
    totals = pts.agg(F.count(F.lit(1)).alias("n_all")).crossJoin(
        sizes.agg(
            F.coalesce(F.sum("n_points"), F.lit(0)).alias("n_assigned")
        )
    )
    noise = totals.select(
        F.lit(-1).cast("bigint").alias("cluster"),
        F.lit(0).cast("bigint").alias("n_core_cells"),
        (F.col("n_all") - F.col("n_assigned")).cast("bigint").alias("n_points"),
    )
    return clusters.union(noise)


ORACLES["grid_dbscan_clusters"] = f"""
    WITH RECURSIVE pts AS (
        SELECT vec_id,
               CAST(floor(embedding[1] / {GRID_EPS}) AS BIGINT) AS cx,
               CAST(floor(embedding[2] / {GRID_EPS}) AS BIGINT) AS cy
        FROM embeddings
    ),
    cells AS (SELECT cx, cy, count(*) AS n FROM pts GROUP BY 1, 2),
    dens AS (
        SELECT c.cx, c.cy, c.n, sum(c2.n) AS density
        FROM cells c JOIN cells c2
          ON c2.cx BETWEEN c.cx - 1 AND c.cx + 1
         AND c2.cy BETWEEN c.cy - 1 AND c.cy + 1
        GROUP BY 1, 2, 3
    ),
    core AS (
        SELECT cx, cy, (cx + 1000) * 100000 + (cy + 1000) AS k, n
        FROM dens WHERE density >= {GRID_MINPTS}
    ),
    edges AS (
        SELECT a.k AS s, b.k AS d
        FROM core a JOIN core b
          ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
    ),
    reach(s, d) AS (
        SELECT k, k FROM core
        UNION
        SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    lab AS (SELECT s AS k, min(d) AS cluster FROM reach GROUP BY 1),
    core_lab AS (
        SELECT c.cx, c.cy, c.k, l.cluster
        FROM core c JOIN lab l ON c.k = l.k
    ),
    n_cells AS (
        SELECT cluster, CAST(count(*) AS BIGINT) AS n_core_cells
        FROM core_lab GROUP BY 1
    ),
    core_pts AS (
        SELECT p.vec_id, cl.cluster
        FROM pts p JOIN core_lab cl ON p.cx = cl.cx AND p.cy = cl.cy
    ),
    border_pts AS (
        SELECT p.vec_id, min(cl.cluster) AS cluster
        FROM pts p
        LEFT JOIN core pc ON p.cx = pc.cx AND p.cy = pc.cy
        JOIN core_lab cl
          ON cl.cx BETWEEN p.cx - 1 AND p.cx + 1
         AND cl.cy BETWEEN p.cy - 1 AND p.cy + 1
        WHERE pc.k IS NULL
        GROUP BY 1
    ),
    assigned AS (
        SELECT vec_id, cluster FROM core_pts
        UNION ALL
        SELECT vec_id, cluster FROM border_pts
    ),
    sizes AS (
        SELECT cluster, CAST(count(*) AS BIGINT) AS n_points
        FROM assigned GROUP BY 1
    ),
    totals AS (
        SELECT (SELECT count(*) FROM pts) AS n_all,
               (SELECT count(*) FROM assigned) AS n_assigned
    )
    SELECT CAST(n.cluster AS BIGINT) AS cluster, n.n_core_cells,
           CAST(COALESCE(s.n_points, 0) AS BIGINT) AS n_points
    FROM n_cells n LEFT JOIN sizes s ON n.cluster = s.cluster
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
           CAST(n_all - n_assigned AS BIGINT)
    FROM totals
"""
QUERIES["grid_dbscan_clusters"] = grid_dbscan_clusters


def _grid_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point cluster assignment of grid_dbscan_clusters (noise = -1):
    recomputes the same core/border/noise decomposition but keeps the
    (vec_id, cluster) frame instead of the summary."""
    from .pipeline_ops import connected_components
    from .similarity import _embeddings

    e = _embeddings(spark, sf_dir)
    pts = e.select(
        "vec_id",
        F.floor(F.element_at("v", 1) / GRID_EPS).cast("long").alias("cx"),
        F.floor(F.element_at("v", 2) / GRID_EPS).cast("long").alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    offs = (
        spark.range(-1, 2)
        .select(F.col("id").alias("dx"))
        .crossJoin(spark.range(-1, 2).select(F.col("id").alias("dy")))
    )
    contrib = cells.crossJoin(F.broadcast(offs)).select(
        (F.col("cx") + F.col("dx")).alias("tx"),
        (F.col("cy") + F.col("dy")).alias("ty"),
        "n",
    )
    dens = contrib.groupBy("tx", "ty").agg(F.sum("n").alias("density"))
    key = ((F.col("cx") + 1000) * 100000 + (F.col("cy") + 1000)).alias("k")
    core = (
        cells.join(dens, (cells.cx == dens.tx) & (cells.cy == dens.ty))
        .filter(F.col("density") >= GRID_MINPTS)
        .select("cx", "cy", key, "n")
        .localCheckpoint(eager=True)
    )
    shifted = core.crossJoin(F.broadcast(offs)).select(
        F.col("k").alias("doc_a"),
        (F.col("cx") + F.col("dx")).alias("nx"),
        (F.col("cy") + F.col("dy")).alias("ny"),
    )
    edges = shifted.join(
        core.select(
            F.col("cx").alias("nx"), F.col("cy").alias("ny"),
            F.col("k").alias("doc_b"),
        ),
        ["nx", "ny"],
    ).select("doc_a", "doc_b")
    labels, _rounds = connected_components(spark, edges)
    # grid-bounded, consumed twice; broadcast into the point-side joins
    # so the fact-sized point frame never shuffles (see
    # grid_dbscan_clusters — same r11 fix, 20 SMJ removed there)
    core_lab = core.join(
        labels.select(F.col("node").alias("k"), F.col("label").alias("cluster")),
        "k",
    ).localCheckpoint(eager=True)
    core_pts = pts.join(
        F.broadcast(core_lab.select("cx", "cy", "cluster")), ["cx", "cy"]
    ).select("vec_id", "cluster")
    non_core_pts = pts.join(
        F.broadcast(core.select("cx", "cy", F.lit(1).alias("is_core"))),
        ["cx", "cy"], "left",
    ).filter(F.col("is_core").isNull()).select("vec_id", "cx", "cy")
    border_pts = (
        non_core_pts.crossJoin(F.broadcast(offs))
        .select(
            "vec_id",
            (F.col("cx") + F.col("dx")).alias("nx"),
            (F.col("cy") + F.col("dy")).alias("ny"),
        )
        .join(
            F.broadcast(core_lab.select(
                F.col("cx").alias("nx"), F.col("cy").alias("ny"), "cluster"
            )),
            ["nx", "ny"],
        )
        .groupBy("vec_id")
        .agg(F.min("cluster").alias("cluster"))
    )
    assigned = core_pts.union(border_pts.select("vec_id", "cluster"))
    return (
        pts.select("vec_id")
        .join(assigned, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster", F.lit(-1)).cast("bigint").alias("cluster"),
        )
    )


def nmi_cluster_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized Mutual Information between the grid-density cluster
    assignment (noise as its own bucket) and the embeddings' declared
    ``label`` — the information-theoretic clustering-quality metric next
    to bcubed_cluster_eval: NMI = 2*I(C;L) / (H(C) + H(L)).

    Exactness: every probability is an exact integer ratio; the MI and
    entropy terms fold with ORDER-PINNED cumulative sums over the
    (cluster x label) contingency frame (bounded: clusters x labels).
    """
    a = _grid_assignments(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    j = a.join(e, "vec_id")
    # materialize the contingency frame: it is bounded (clusters x labels,
    # dozens of rows) yet feeds FOUR consumers (ci/lj/tot/mi_f), each of
    # which would otherwise re-expand the entire grid-DBSCAN assignment
    # DAG — measured r11: the unmaterialized plan was 3,782 lines with
    # 290 Exchanges / 80 SortMergeJoins; checkpointed it is ~60 lines
    cont = (
        j.groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("nij"))
        .localCheckpoint(eager=True)
    )
    ci = cont.groupBy("cluster").agg(F.sum("nij").alias("ni"))
    lj = cont.groupBy("label").agg(F.sum("nij").alias("nj"))
    tot = cont.agg(F.sum("nij").alias("n"))
    nd = F.col("n").cast("double")
    wmi = Window.orderBy("cluster", "label").rowsBetween(
        Window.unboundedPreceding, 0
    )
    mi_f = (
        cont.join(F.broadcast(ci), "cluster")
        .join(F.broadcast(lj), "label")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "term",
            F.col("nij").cast("double")
            / nd
            * F.log(
                nd
                * F.col("nij").cast("double")
                / (F.col("ni").cast("double") * F.col("nj").cast("double"))
            ),
        )
        .withColumn("mi", F.sum("term").over(wmi))
        .withColumn("rs", F.count(F.lit(1)).over(wmi))
    )
    mi = mi_f.orderBy(F.col("rs").desc()).limit(1).select("mi", "n")
    wc = Window.orderBy("cluster").rowsBetween(Window.unboundedPreceding, 0)
    hc_f = (
        ci.crossJoin(F.broadcast(tot))
        .withColumn(
            "t",
            -(F.col("ni").cast("double") / nd)
            * F.log(F.col("ni").cast("double") / nd),
        )
        .withColumn("hc", F.sum("t").over(wc))
        .withColumn("rs", F.count(F.lit(1)).over(wc))
    )
    hc = hc_f.orderBy(F.col("rs").desc()).limit(1).select("hc")
    wl = Window.orderBy("label").rowsBetween(Window.unboundedPreceding, 0)
    hl_f = (
        lj.crossJoin(F.broadcast(tot))
        .withColumn(
            "t",
            -(F.col("nj").cast("double") / nd)
            * F.log(F.col("nj").cast("double") / nd),
        )
        .withColumn("hl", F.sum("t").over(wl))
        .withColumn("rs", F.count(F.lit(1)).over(wl))
    )
    hl = hl_f.orderBy(F.col("rs").desc()).limit(1).select("hl")
    return (
        mi.crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .select(
            F.col("n").cast("bigint").alias("n_points"),
            F.round("mi", 6).alias("mutual_information"),
            F.round("hc", 6).alias("h_clusters"),
            F.round("hl", 6).alias("h_labels"),
            F.round(
                F.lit(2.0) * F.col("mi") / (F.col("hc") + F.col("hl")), 4
            ).alias("nmi"),
        )
    )


def _grid_assign_sql() -> str:
    """DuckDB CTE block computing (vec_id, cluster) — the oracle twin of
    _grid_assignments (recursive transitive closure over core cells)."""
    return f"""
    pts AS (
        SELECT vec_id,
               CAST(floor(embedding[1] / {GRID_EPS}) AS BIGINT) AS cx,
               CAST(floor(embedding[2] / {GRID_EPS}) AS BIGINT) AS cy
        FROM embeddings
    ),
    cells AS (SELECT cx, cy, count(*) AS n FROM pts GROUP BY 1, 2),
    dens AS (
        SELECT c.cx, c.cy, c.n, sum(c2.n) AS density
        FROM cells c JOIN cells c2
          ON c2.cx BETWEEN c.cx - 1 AND c.cx + 1
         AND c2.cy BETWEEN c.cy - 1 AND c.cy + 1
        GROUP BY 1, 2, 3
    ),
    core AS (
        SELECT cx, cy, (cx + 1000) * 100000 + (cy + 1000) AS k, n
        FROM dens WHERE density >= {GRID_MINPTS}
    ),
    gedges AS (
        SELECT a.k AS s, b.k AS d
        FROM core a JOIN core b
          ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
    ),
    reach(s, d) AS (
        SELECT k, k FROM core
        UNION
        SELECT r.s, e.d FROM reach r JOIN gedges e ON r.d = e.s
    ),
    lab AS (SELECT s AS k, min(d) AS cluster FROM reach GROUP BY 1),
    core_lab AS (
        SELECT c.cx, c.cy, c.k, l.cluster
        FROM core c JOIN lab l ON c.k = l.k
    ),
    core_pts AS (
        SELECT p.vec_id, cl.cluster
        FROM pts p JOIN core_lab cl ON p.cx = cl.cx AND p.cy = cl.cy
    ),
    border_pts AS (
        SELECT p.vec_id, min(cl.cluster) AS cluster
        FROM pts p
        LEFT JOIN core pc ON p.cx = pc.cx AND p.cy = pc.cy
        JOIN core_lab cl
          ON cl.cx BETWEEN p.cx - 1 AND p.cx + 1
         AND cl.cy BETWEEN p.cy - 1 AND p.cy + 1
        WHERE pc.k IS NULL
        GROUP BY 1
    ),
    assigned AS (
        SELECT vec_id, cluster FROM core_pts
        UNION ALL
        SELECT vec_id, cluster FROM border_pts
    ),
    allpts AS (
        SELECT p.vec_id, CAST(COALESCE(a.cluster, -1) AS BIGINT) AS cluster
        FROM pts p LEFT JOIN assigned a ON p.vec_id = a.vec_id
    )"""


ORACLES["nmi_cluster_label_eval"] = f"""
    WITH RECURSIVE {_grid_assign_sql().strip()},
    cont AS (
        SELECT ap.cluster, e.label, count(*) AS nij
        FROM allpts ap JOIN embeddings e ON ap.vec_id = e.vec_id
        GROUP BY 1, 2
    ),
    ci AS (SELECT cluster, sum(nij) AS ni FROM cont GROUP BY 1),
    lj AS (SELECT label, sum(nij) AS nj FROM cont GROUP BY 1),
    tot AS (SELECT sum(nij) AS n FROM cont),
    mi_f AS (
        SELECT sum((CAST(nij AS DOUBLE) / n)
                   * ln(n * CAST(nij AS DOUBLE)
                        / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE))))
                 OVER (ORDER BY cont.cluster, cont.label
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS mi,
               count(*) OVER (ORDER BY cont.cluster, cont.label
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS rs,
               n
        FROM cont JOIN ci ON cont.cluster = ci.cluster
        JOIN lj ON cont.label = lj.label
        CROSS JOIN tot
    ),
    mi AS (SELECT mi, n FROM mi_f ORDER BY rs DESC LIMIT 1),
    hc_f AS (
        SELECT sum(-(CAST(ni AS DOUBLE) / n)
                   * ln(CAST(ni AS DOUBLE) / n))
                 OVER (ORDER BY cluster ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS hc,
               count(*) OVER (ORDER BY cluster ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW) AS rs
        FROM ci CROSS JOIN tot
    ),
    hc AS (SELECT hc FROM hc_f ORDER BY rs DESC LIMIT 1),
    hl_f AS (
        SELECT sum(-(CAST(nj AS DOUBLE) / n)
                   * ln(CAST(nj AS DOUBLE) / n))
                 OVER (ORDER BY label ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS hl,
               count(*) OVER (ORDER BY label ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW) AS rs
        FROM lj CROSS JOIN tot
    ),
    hl AS (SELECT hl FROM hl_f ORDER BY rs DESC LIMIT 1)
    SELECT CAST(n AS BIGINT) AS n_points,
           round(mi, 6) AS mutual_information,
           round(hc, 6) AS h_clusters,
           round(hl, 6) AS h_labels,
           round(2.0 * mi / (hc + hl), 4) AS nmi
    FROM mi, hc, hl
"""
QUERIES["nmi_cluster_label_eval"] = nmi_cluster_label_eval


# --------------------------------------------------------------------------
# round-5 restarted-session: information-gain feature ranking
# --------------------------------------------------------------------------

IG_TOP = 20
IG_POS_LANG = "en"


def info_gain_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-IG_TOP tokens by information gain for the binary task
    ``lang == 'en'`` — the entropy-based twin of chi2_feature_select:
    IG(w) = H(y) - [p(w) H(y|w) + p(!w) H(y|!w)], all probabilities exact
    integer ratios from doc-level presence counts.

    Determinism: every entropy term is a single scalar expression over
    exact integers evaluated PER ROW (no cross-row float sums), so both
    engines compute bit-identical IG; ranking compares round(IG, 8) with
    token tie-break and lands in one TakeOrderedAndProject.

    Scale: one distinct doc-term aggregate, then vocabulary-cardinality
    arithmetic; top-k via orderBy().limit() — never a global rank window.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    n_total = d.count()
    n_pos = d.filter(F.col("lang") == IG_POS_LANG).count()
    present = d.select(
        "doc_id",
        (F.col("lang") == IG_POS_LANG).cast("long").alias("y"),
        F.explode(F.array_distinct(words(F.col("text")))).alias("w"),
    ).distinct()
    cells = present.groupBy("w").agg(
        F.count(F.lit(1)).alias("nw"),
        F.sum("y").alias("npw"),
    )

    def _h2(p_num, p_den):
        """Entropy of a Bernoulli(p_num/p_den) in nats, 0*ln0 = 0."""
        p = p_num.cast("double") / p_den.cast("double")
        q = F.lit(1.0) - p
        return -(
            F.when(p > 0, p * F.log(p)).otherwise(F.lit(0.0))
            + F.when(q > 0, q * F.log(q)).otherwise(F.lit(0.0))
        )

    nw, npw = F.col("nw"), F.col("npw")
    n_absent = F.lit(n_total) - nw
    npos_absent = F.lit(n_pos) - npw
    h_y = _h2(F.lit(n_pos), F.lit(n_total))
    h_given_w = _h2(npw, nw)
    h_given_not = F.when(
        n_absent > 0, _h2(npos_absent, n_absent)
    ).otherwise(F.lit(0.0))
    ig = h_y - (
        nw.cast("double") / n_total * h_given_w
        + n_absent.cast("double") / n_total * h_given_not
    )
    scored = cells.select(
        "w",
        F.col("nw").cast("bigint").alias("n_docs_with"),
        F.col("npw").cast("bigint").alias("n_pos_with"),
        F.round(ig, 8).alias("info_gain"),
    )
    return scored.orderBy(
        F.col("info_gain").desc(), F.col("w").asc()
    ).limit(IG_TOP)


ORACLES["info_gain_features"] = f"""
    WITH d AS (SELECT doc_id, lang, text FROM documents),
    nt AS (SELECT count(*) AS n_total,
                  sum(CASE WHEN lang = '{IG_POS_LANG}' THEN 1 ELSE 0 END)
                    AS n_pos
           FROM d),
    present AS (
        SELECT DISTINCT doc_id,
               CASE WHEN lang = '{IG_POS_LANG}' THEN 1 ELSE 0 END AS y, w
        FROM (SELECT doc_id, lang,
                     unnest(list_distinct({_WORDS_SQL})) AS w
              FROM d)
    ),
    cells AS (
        SELECT w, count(*) AS nw, sum(y) AS npw FROM present GROUP BY 1
    ),
    scored AS (
        SELECT w, CAST(nw AS BIGINT) AS n_docs_with,
               CAST(npw AS BIGINT) AS n_pos_with,
               round(
                 -- H(y)
                 -(CASE WHEN n_pos > 0 THEN (CAST(n_pos AS DOUBLE)/n_total)
                        * ln(CAST(n_pos AS DOUBLE)/n_total) ELSE 0 END
                   + CASE WHEN n_total - n_pos > 0
                        THEN (CAST(n_total - n_pos AS DOUBLE)/n_total)
                             * ln(CAST(n_total - n_pos AS DOUBLE)/n_total)
                        ELSE 0 END)
                 -- - p(w) H(y|w)
                 - (CAST(nw AS DOUBLE)/n_total) * (
                    -(CASE WHEN npw > 0 THEN (CAST(npw AS DOUBLE)/nw)
                           * ln(CAST(npw AS DOUBLE)/nw) ELSE 0 END
                      + CASE WHEN nw - npw > 0
                           THEN (CAST(nw - npw AS DOUBLE)/nw)
                                * ln(CAST(nw - npw AS DOUBLE)/nw)
                           ELSE 0 END))
                 -- - p(!w) H(y|!w)
                 - CASE WHEN n_total - nw > 0
                     THEN (CAST(n_total - nw AS DOUBLE)/n_total) * (
                      -(CASE WHEN n_pos - npw > 0
                            THEN (CAST(n_pos - npw AS DOUBLE)/(n_total - nw))
                                 * ln(CAST(n_pos - npw AS DOUBLE)
                                      /(n_total - nw)) ELSE 0 END
                        + CASE WHEN (n_total - nw) - (n_pos - npw) > 0
                            THEN (CAST((n_total - nw) - (n_pos - npw)
                                       AS DOUBLE)/(n_total - nw))
                                 * ln(CAST((n_total - nw) - (n_pos - npw)
                                           AS DOUBLE)/(n_total - nw))
                            ELSE 0 END))
                     ELSE 0 END, 8) AS info_gain
        FROM cells, nt
    )
    SELECT w, n_docs_with, n_pos_with, info_gain
    FROM scored ORDER BY info_gain DESC, w ASC LIMIT {IG_TOP}
"""
QUERIES["info_gain_features"] = info_gain_features


# --------------------------------------------------------------------------
# ransac_spend_fit — hash-seeded RANSAC robust line fit
# --------------------------------------------------------------------------

RANSAC_CANDIDATES = 32
RANSAC_TOL_CENTS = 50_000_000  # $500k residual tolerance (spend spans ~$3M)


def ransac_spend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC robust line fit of customer lifetime spend on account
    balance: 32 deterministic md5-seeded point pairs propose candidate
    lines, each candidate counts inliers within the residual tolerance,
    the consensus winner (inliers desc, candidate id asc) is REFIT by OLS
    on its inlier set from exact decimal(38,0) normal equations — the
    robust-regression companion of theil_sen_trend (which is quadratic in
    days; RANSAC stays linear in rows for any candidate budget).

    Determinism: sample indices are md5 hashes of the candidate id mapped
    onto a (score, custkey)-ordered row numbering — stable across engines
    and partitionings; inlier membership compares identically-computed
    doubles.

    Scale: the candidate frame is 32 rows (broadcast); scoring is one
    map-side pass over the dimension frame; the only window is the
    dimension-sized row numbering (customers are a dimension table — the
    decile_gains_table precedent).
    """
    from .causal import _spend_per_customer

    base = _spend_per_customer(spark, sf_dir).select("k", "score", "y")
    w = Window.orderBy("score", "k")
    # materialize the numbered dimension frame once: n_row/p1/p2 project
    # it three different ways and the scoring pass re-read base — 4
    # customer scans in the r12 before plan (duplicates differ
    # pre-exchange, the winning r11-§13 class); solo A/B at matched
    # canaries 1.54/1.60 -> 1.29/1.39 s (r12)
    pts = base.withColumn("rn", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    n_row = pts.groupBy().agg(F.max("rn").alias("n"))
    cand = (
        spark.range(RANSAC_CANDIDATES)
        .select(F.col("id").cast("int").alias("c"))
        .crossJoin(F.broadcast(n_row))
        .select(
            "c",
            (md5_hash_long(F.concat(F.lit("ra"), F.col("c")), "") % F.col("n") + 1)
            .alias("i1"),
            (md5_hash_long(F.concat(F.lit("rb"), F.col("c")), "") % F.col("n") + 1)
            .alias("i2"),
        )
        .filter(F.col("i1") != F.col("i2"))
    )
    p1 = pts.select(
        F.col("rn").alias("i1"), F.col("score").alias("x1"), F.col("y").alias("y1")
    )
    p2 = pts.select(
        F.col("rn").alias("i2"), F.col("score").alias("x2"), F.col("y").alias("y2")
    )
    lines = (
        cand.join(p1, "i1")
        .join(p2, "i2")
        .filter(F.col("x1") != F.col("x2"))
        .withColumn(
            "b",
            (F.col("y2") - F.col("y1")).cast("double")
            / (F.col("x2") - F.col("x1")).cast("double"),
        )
        .withColumn("a", F.col("y1").cast("double") - F.col("b") * F.col("x1").cast("double"))
        .select("c", "a", "b")
    )
    scored = pts.select("k", "score", "y").crossJoin(
        F.broadcast(lines)
    )  # 32-row broadcast; pts rows == base rows, so values are identical
    resid_ok = (
        F.abs(F.col("y").cast("double") - (F.col("a") + F.col("b") * F.col("score").cast("double")))
        <= RANSAC_TOL_CENTS
    )
    per_cand = (
        scored.filter(resid_ok)
        .groupBy("c", "a", "b")
        .agg(
            F.count(F.lit(1)).alias("n_in"),
            F.sum(F.col("score").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
            F.sum(
                F.col("score").cast("decimal(38,0)") * F.col("score").cast("decimal(38,0)")
            ).alias("sxx"),
            F.sum(
                F.col("score").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)")
            ).alias("sxy"),
        )
    )
    wbest = Window.orderBy(F.col("n_in").desc(), F.col("c"))
    best = per_cand.withColumn("rk", F.row_number().over(wbest)).filter(
        F.col("rk") == 1
    )
    nd = F.col("n_in").cast("decimal(38,0)")
    den = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    slope = F.when(den != 0, num / den)
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n_in").cast("double")
    return best.select(
        F.col("c").alias("candidate"),
        F.col("n_in").alias("n_inliers"),
        F.round(F.col("b"), 6).alias("raw_slope"),
        F.round(F.col("a") / F.lit(100.0), 6).alias("raw_intercept_dollars"),
        F.round(slope, 6).alias("refit_slope"),
        F.round(intercept / F.lit(100.0), 6).alias("refit_intercept_dollars"),
    )


QUERIES["ransac_spend_fit"] = ransac_spend_fit
ORACLES["ransac_spend_fit"] = f"""
    WITH base AS (
        SELECT c_custkey AS k, c_mktsegment AS segment,
               CAST(round(c_acctbal * 100) AS BIGINT) AS score,
               COALESCE(o.spend, 0) AS y
        FROM customer LEFT JOIN (
            SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend
            FROM orders GROUP BY 1
        ) o ON c_custkey = o_custkey
    ),
    pts AS (
        SELECT k, score, y,
               row_number() OVER (ORDER BY score, k) AS rn
        FROM base
    ),
    nn AS (SELECT max(rn) AS n FROM pts),
    cand AS (
        SELECT CAST(u.c AS INT) AS c,
               CAST('0x' || substr(md5('ra' || CAST(u.c AS VARCHAR)), 1, 8)
                    AS BIGINT) % (SELECT n FROM nn) + 1 AS i1,
               CAST('0x' || substr(md5('rb' || CAST(u.c AS VARCHAR)), 1, 8)
                    AS BIGINT) % (SELECT n FROM nn) + 1 AS i2
        FROM unnest(generate_series(0, {RANSAC_CANDIDATES - 1})) AS u(c)
    ),
    lines AS (
        SELECT c,
               CAST(p2.y - p1.y AS DOUBLE) / CAST(p2.score - p1.score AS DOUBLE)
                   AS b,
               CAST(p1.y AS DOUBLE)
               - (CAST(p2.y - p1.y AS DOUBLE)
                  / CAST(p2.score - p1.score AS DOUBLE))
                 * CAST(p1.score AS DOUBLE) AS a
        FROM cand
        JOIN pts p1 ON cand.i1 = p1.rn
        JOIN pts p2 ON cand.i2 = p2.rn
        WHERE cand.i1 <> cand.i2 AND p1.score <> p2.score
    ),
    per_cand AS (
        SELECT c, a, b, count(*) AS n_in,
               sum(CAST(score AS HUGEINT)) AS sx,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(score AS HUGEINT) * CAST(score AS HUGEINT)) AS sxx,
               sum(CAST(score AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        FROM base, lines
        WHERE abs(CAST(y AS DOUBLE) - (a + b * CAST(score AS DOUBLE)))
                  <= {RANSAC_TOL_CENTS}
        GROUP BY 1, 2, 3
    ),
    best AS (
        SELECT * FROM per_cand ORDER BY n_in DESC, c LIMIT 1
    )
    SELECT c AS candidate, CAST(n_in AS BIGINT) AS n_inliers,
           round(b, 6) AS raw_slope,
           round(a / 100.0, 6) AS raw_intercept_dollars,
           round(CASE WHEN n_in * sxx - sx * sx <> 0
                      THEN CAST(n_in * sxy - sx * sy AS DOUBLE)
                           / CAST(n_in * sxx - sx * sx AS DOUBLE) END, 6)
               AS refit_slope,
           round((CAST(sy AS DOUBLE)
                  - (CASE WHEN n_in * sxx - sx * sx <> 0
                          THEN CAST(n_in * sxy - sx * sy AS DOUBLE)
                               / CAST(n_in * sxx - sx * sx AS DOUBLE) END)
                    * CAST(sx AS DOUBLE))
                 / CAST(n_in AS DOUBLE) / 100.0, 6)
               AS refit_intercept_dollars
    FROM best
"""


# --------------------------------------------------------------------------
# logistic_newton_fit — in-engine logistic regression (3 Newton steps)
# --------------------------------------------------------------------------

LOGIT_STEPS = 3
LOGIT_X_SCALE = 10_000.0  # cents -> hundreds of dollars (keeps exp tame)


def logistic_newton_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 1-feature logistic regression IN the engine: P(event is an
    'error' | event value), fit by LOGIT_STEPS Newton-Raphson steps of
    iteratively reweighted least squares — the canonical GLM fit,
    expressed as a static DAG (the LPA / bellman_ford fixed-round
    lineage), no MLlib, no driver-side optimization loop.

    Shape: events reduce ONCE to the (cent value) grid (<= ~33k rows at
    ANY corpus size) with per-cell trial/success counts; each Newton step
    joins the 2-parameter state (a 1-row broadcast) to the grid, folds the
    six sufficient statistics (gradient + Hessian entries) with an
    ORDER-PINNED cumulative window over the bounded grid — float sums in
    a pinned sequence, so both engines add identical doubles in identical
    order — and solves the 2x2 system in closed form.

    Newton from beta = (0, 0) on a one-feature problem with bounded x is
    well inside the quadratic-convergence basin; 3 steps land within
    ~1e-6 of the MLE (the invariant test checks the gradient is ~0).
    """
    e = load_table(spark, sf_dir, "events")
    grid = (
        e.select(
            F.round(F.col("value") * 100).cast("long").alias("cv"),
            (F.col("event_type") == "error").cast("int").alias("bad"),
        )
        .groupBy("cv")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("bad").alias("k"))
        .select(
            "cv",
            "n",
            "k",
            (F.col("cv").cast("double") / F.lit(LOGIT_X_SCALE)).alias("x"),
        )
        .localCheckpoint(eager=True)  # 3 steps reference the tiny grid
    )
    beta = spark.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1")
    )
    wcum = Window.partitionBy().orderBy("cv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    for _ in range(LOGIT_STEPS):
        j = grid.crossJoin(F.broadcast(beta))  # 1-row state broadcast
        p = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-(F.col("b0") + F.col("b1") * F.col("x")))
        )
        w = p * (F.lit(1.0) - p)
        nn, kk, xx = (
            F.col("n").cast("double"),
            F.col("k").cast("double"),
            F.col("x"),
        )
        folded = j.select(
            "cv",
            "b0",
            "b1",
            F.sum(kk - nn * p).over(wcum).alias("g0"),
            F.sum((kk - nn * p) * xx).over(wcum).alias("g1"),
            F.sum(nn * w).over(wcum).alias("h00"),
            F.sum(nn * w * xx).over(wcum).alias("h01"),
            F.sum(nn * w * xx * xx).over(wcum).alias("h11"),
        )
        s = folded.groupBy("b0", "b1").agg(
            F.max_by(F.col("g0"), F.col("cv")).alias("g0"),
            F.max_by(F.col("g1"), F.col("cv")).alias("g1"),
            F.max_by(F.col("h00"), F.col("cv")).alias("h00"),
            F.max_by(F.col("h01"), F.col("cv")).alias("h01"),
            F.max_by(F.col("h11"), F.col("cv")).alias("h11"),
        )
        det = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
        beta = s.select(
            (
                F.col("b0")
                + (F.col("h11") * F.col("g0") - F.col("h01") * F.col("g1")) / det
            ).alias("b0"),
            (
                F.col("b1")
                + (F.col("h00") * F.col("g1") - F.col("h01") * F.col("g0")) / det
            ).alias("b1"),
        )
    tot = grid.groupBy().agg(
        F.sum("n").cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("n_bad"),
    )
    return beta.crossJoin(F.broadcast(tot)).select(
        "n_events",
        "n_bad",
        # + 0.0 canonicalizes IEEE negative zero (round(-1e-18, 6) is
        # -0.0 in DuckDB, 0.0 in Spark — the array_funcs class)
        (F.round("b0", 6) + F.lit(0.0)).alias("beta0"),
        (F.round("b1", 6) + F.lit(0.0)).alias("beta1"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("b0"))), 6
        ).alias("p_at_zero_value"),
    )


def _logit_oracle() -> str:
    grid = f"""grid AS (
        SELECT cv, n, k, CAST(cv AS DOUBLE) / {LOGIT_X_SCALE} AS x FROM (
            SELECT CAST(round(value * 100) AS BIGINT) AS cv, count(*) AS n,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS k
            FROM events GROUP BY 1
        )
    )"""
    ctes = [grid, "b0_state AS (SELECT 0.0 AS b0, 0.0 AS b1)"]
    prev = "b0_state"
    for i in range(1, LOGIT_STEPS + 1):
        ctes.append(f"""f{i} AS (
            SELECT g.cv, b.b0, b.b1,
                   sum(CAST(k AS DOUBLE) - CAST(n AS DOUBLE)
                       * (1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.x)))))
                       OVER wo AS g0,
                   sum((CAST(k AS DOUBLE) - CAST(n AS DOUBLE)
                        * (1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.x))))) * g.x)
                       OVER wo AS g1,
                   sum(CAST(n AS DOUBLE)
                       * (1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.x))))
                       * (1.0 - 1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.x)))))
                       OVER wo AS h00,
                   sum(CAST(n AS DOUBLE)
                       * (1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.x))))
                       * (1.0 - 1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.x))))
                       * g.x) OVER wo AS h01,
                   sum(CAST(n AS DOUBLE)
                       * (1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.x))))
                       * (1.0 - 1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.x))))
                       * g.x * g.x) OVER wo AS h11
            FROM grid g, {prev} b
            WINDOW wo AS (ORDER BY g.cv ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)
        )""")
        ctes.append(f"""s{i} AS (
            SELECT b0, b1, arg_max(g0, cv) AS g0, arg_max(g1, cv) AS g1,
                   arg_max(h00, cv) AS h00, arg_max(h01, cv) AS h01,
                   arg_max(h11, cv) AS h11
            FROM f{i} GROUP BY b0, b1
        )""")
        ctes.append(f"""b{i} AS (
            SELECT b0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
                   b1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
            FROM s{i}
        )""")
        prev = f"b{i}"
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_events,
                   CAST(sum(k) AS BIGINT) AS n_bad FROM grid)
    SELECT n_events, n_bad,
           round(b0, 6) + 0.0 AS beta0, round(b1, 6) + 0.0 AS beta1,
           round(1.0 / (1.0 + exp(-b0)), 6) AS p_at_zero_value
    FROM {prev}, tot
    """


QUERIES["logistic_newton_fit"] = logistic_newton_fit
ORACLES["logistic_newton_fit"] = _logit_oracle()


# --------------------------------------------------------------------------
# adaboost_stumps — two-round AdaBoost with EXACT integer weight arithmetic
# --------------------------------------------------------------------------


def adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of AdaBoost (Freund & Schapire, public) over threshold
    stumps on the event-value grid, label = 'error' events — with the
    boosting weight arithmetic kept EXACT: after round 1 the sample
    weights take only two values (right -> e1, wrong -> N - e1, the
    cross-multiplied form of the 1/(2(1-e)) / 1/(2e) reweighting), so
    round 2's weighted stump search is pure integer arithmetic and the
    selected split cannot flip between engines.  Only the reported alphas
    (0.5 * ln((1-e)/e)) and rates are floats, computed once from exact
    integers.

    The combined-vote tie (h1 disagrees with h2) resolves by alpha1 >
    alpha2, evaluated as the cross-multiplied integer inequality
    e1_wrong * (W - e2_wrong) < e2_wrong * (N - e1_wrong)... expressed
    directly on exact counters — no float compare in the decision path.

    Scale: ONE reduction to the cent-value grid (<= ~33k rows at any
    corpus size); both stump searches are cumulative windows over that
    bounded frame; the round-1 winner rides a 1-row broadcast.
    """
    e = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    grid = (
        e.select(
            F.round(F.col("value") * 100).cast("long").alias("cv"),
            (F.col("event_type") == "error").cast("int").alias("pos"),
        )
        .groupBy("cv")
        .agg(
            F.sum("pos").alias("np"),
            F.sum(F.lit(1) - F.col("pos")).alias("nn"),
        )
        .localCheckpoint(eager=True)
    )
    wall = Window.partitionBy()
    wcum = wall.orderBy("cv").rowsBetween(Window.unboundedPreceding, 0)

    def stump_search(frame, wp, wn):
        """frame has (cv, <weight columns>); wp/wn = weighted pos/neg
        column expressions (exact integers in decimal).  Returns the 1-row
        winner (thr, pol, err_num, w_tot)."""
        t = frame.withColumn("cp", F.sum(wp).over(wcum)).withColumn(
            "cn", F.sum(wn).over(wcum)
        )
        t = t.withColumn(
            "tp", F.max_by(F.col("cp"), F.col("cv")).over(
                wall.orderBy("cv").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        ).withColumn(
            "tn", F.max_by(F.col("cn"), F.col("cv")).over(
                wall.orderBy("cv").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        )
        # pol +1: predict pos iff cv <= thr -> wrong = (TP - cp) + cn
        # pol -1: predict pos iff cv >  thr -> wrong = cp + (TN - cn)
        cand = t.select(
            "cv",
            "tp",
            "tn",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("pol"),
                        ((F.col("tp") - F.col("cp")) + F.col("cn")).alias("err"),
                    ),
                    F.struct(
                        F.lit(-1).alias("pol"),
                        (F.col("cp") + (F.col("tn") - F.col("cn"))).alias("err"),
                    ),
                )
            ).alias("c"),
        ).select(
            "cv", "tp", "tn", F.col("c.pol").alias("pol"), F.col("c.err").alias("err")
        )
        wbest = wall.orderBy(F.col("err").asc(), F.col("cv").asc(), F.col("pol").desc())
        return (
            cand.withColumn("rk", F.row_number().over(wbest))
            .filter(F.col("rk") == 1)
            .select(
                F.col("cv").alias("thr"),
                "pol",
                F.col("err").alias("err_num"),
                (F.col("tp") + F.col("tn")).alias("w_tot"),
            )
        )

    g1 = grid.select(
        "cv", F.col("np").cast(dec).alias("wp"), F.col("nn").cast(dec).alias("wn")
    )
    best1 = stump_search(g1, F.col("wp"), F.col("wn")).localCheckpoint(eager=True)
    j = grid.crossJoin(F.broadcast(best1.select(
        F.col("thr").alias("thr1"), F.col("pol").alias("pol1"),
        F.col("err_num").alias("e1"), F.col("w_tot").alias("n_tot"),
    )))
    # stump1's prediction at this cell: +1 (pos) iff (cv <= thr1) == (pol1 == 1)
    pred_pos = (F.col("cv") <= F.col("thr1")) == (F.col("pol1") == 1)
    w_right = F.col("e1")
    w_wrong = F.col("n_tot") - F.col("e1")
    g2 = j.select(
        "cv",
        "thr1",
        "pol1",
        "e1",
        "n_tot",
        # pos rows: wrong when stump1 predicted neg
        (F.col("np").cast(dec)
         * F.when(pred_pos, w_right).otherwise(w_wrong).cast(dec)).alias("wp"),
        (F.col("nn").cast(dec)
         * F.when(pred_pos, w_wrong).otherwise(w_right).cast(dec)).alias("wn"),
        F.col("np").cast(dec).alias("np"),
        F.col("nn").cast(dec).alias("nn"),
    )
    best2 = stump_search(
        g2.select("cv", "wp", "wn"), F.col("wp"), F.col("wn")
    ).select(
        F.col("thr").alias("thr2"), F.col("pol").alias("pol2"),
        F.col("err_num").alias("e2"), F.col("w_tot").alias("w2_tot"),
    ).localCheckpoint(eager=True)
    full = g2.crossJoin(F.broadcast(best2))
    h1_pos = (F.col("cv") <= F.col("thr1")) == (F.col("pol1") == 1)
    h2_pos = (F.col("cv") <= F.col("thr2")) == (F.col("pol2") == 1)
    # alpha1 > alpha2  <=>  e1/n_tot < e2/w2_tot (cross-multiplied, exact)
    a1_wins = F.col("e1") * F.col("w2_tot") < F.col("e2") * F.col("n_tot")
    comb_pos = F.when(h1_pos == h2_pos, h1_pos).otherwise(
        F.when(a1_wins, h1_pos).otherwise(h2_pos)
    )
    acc = full.select(
        "e1",
        "n_tot",
        "e2",
        "w2_tot",
        "thr1",
        "pol1",
        "thr2",
        "pol2",
        F.when(comb_pos, F.col("np")).otherwise(F.col("nn")).alias("correct"),
        (F.col("np") + F.col("nn")).alias("n_cell"),
    )
    g = acc.groupBy(
        "thr1", "pol1", "e1", "thr2", "pol2", "e2", "n_tot", "w2_tot"
    ).agg(F.sum("correct").alias("n_correct"), F.sum("n_cell").alias("n_all"))
    e1r = F.col("e1").cast("double") / F.col("n_tot").cast("double")
    e2r = F.col("e2").cast("double") / F.col("w2_tot").cast("double")
    alpha = lambda r: F.lit(0.5) * F.log((F.lit(1.0) - r) / r)  # noqa: E731
    return g.select(
        F.col("thr1").cast("long").alias("thr1_cents"),
        F.col("pol1").cast("int").alias("pol1"),
        F.round(e1r, 6).alias("err1"),
        F.round(alpha(e1r), 6).alias("alpha1"),
        F.col("thr2").cast("long").alias("thr2_cents"),
        F.col("pol2").cast("int").alias("pol2"),
        F.round(e2r, 6).alias("err2"),
        F.round(alpha(e2r), 6).alias("alpha2"),
        F.round(
            F.col("n_correct").cast("double") / F.col("n_all").cast("double"), 6
        ).alias("train_accuracy"),
    )


QUERIES["adaboost_stumps"] = adaboost_stumps
ORACLES["adaboost_stumps"] = """
    WITH grid AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS cv,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS np,
               sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) AS nn
        FROM events GROUP BY 1
    ),
    c1 AS (
        SELECT cv,
               sum(np) OVER wo AS cp, sum(nn) OVER wo AS cn,
               sum(np) OVER () AS tp, sum(nn) OVER () AS tn
        FROM grid
        WINDOW wo AS (ORDER BY cv ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    ),
    cand1 AS (
        SELECT cv, tp, tn, 1 AS pol, (tp - cp) + cn AS err FROM c1
        UNION ALL
        SELECT cv, tp, tn, -1 AS pol, cp + (tn - cn) AS err FROM c1
    ),
    best1 AS (
        SELECT cv AS thr1, pol AS pol1, err AS e1, tp + tn AS n_tot
        FROM cand1 ORDER BY err ASC, cv ASC, pol DESC LIMIT 1
    ),
    g2 AS (
        SELECT g.cv, b.thr1, b.pol1, b.e1, b.n_tot, g.np, g.nn,
               g.np * CASE WHEN (g.cv <= b.thr1) = (b.pol1 = 1)
                           THEN b.e1 ELSE b.n_tot - b.e1 END AS wp,
               g.nn * CASE WHEN (g.cv <= b.thr1) = (b.pol1 = 1)
                           THEN b.n_tot - b.e1 ELSE b.e1 END AS wn
        FROM grid g, best1 b
    ),
    c2 AS (
        SELECT cv,
               sum(wp) OVER wo AS cp, sum(wn) OVER wo AS cn,
               sum(wp) OVER () AS tp, sum(wn) OVER () AS tn
        FROM g2
        WINDOW wo AS (ORDER BY cv ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    ),
    cand2 AS (
        SELECT cv, tp, tn, 1 AS pol, (tp - cp) + cn AS err FROM c2
        UNION ALL
        SELECT cv, tp, tn, -1 AS pol, cp + (tn - cn) AS err FROM c2
    ),
    best2 AS (
        SELECT cv AS thr2, pol AS pol2, err AS e2, tp + tn AS w2_tot
        FROM cand2 ORDER BY err ASC, cv ASC, pol DESC LIMIT 1
    ),
    fl AS (
        SELECT g.*, b2.thr2, b2.pol2, b2.e2, b2.w2_tot,
               (g.cv <= g.thr1) = (g.pol1 = 1) AS h1_pos,
               (g.cv <= b2.thr2) = (b2.pol2 = 1) AS h2_pos,
               g.e1 * b2.w2_tot < b2.e2 * g.n_tot AS a1_wins
        FROM g2 g, best2 b2
    ),
    acc AS (
        SELECT thr1, pol1, e1, n_tot, thr2, pol2, e2, w2_tot,
               CASE WHEN (CASE WHEN h1_pos = h2_pos THEN h1_pos
                               WHEN a1_wins THEN h1_pos ELSE h2_pos END)
                    THEN np ELSE nn END AS correct,
               np + nn AS n_cell
        FROM fl
    ),
    g AS (
        SELECT thr1, pol1, e1, thr2, pol2, e2, n_tot, w2_tot,
               sum(correct) AS n_correct, sum(n_cell) AS n_all
        FROM acc GROUP BY 1, 2, 3, 4, 5, 6, 7, 8
    )
    SELECT CAST(thr1 AS BIGINT) AS thr1_cents, CAST(pol1 AS INT) AS pol1,
           round(CAST(e1 AS DOUBLE) / CAST(n_tot AS DOUBLE), 6) AS err1,
           round(0.5 * ln((1.0 - CAST(e1 AS DOUBLE) / CAST(n_tot AS DOUBLE))
                          / (CAST(e1 AS DOUBLE) / CAST(n_tot AS DOUBLE))), 6)
               AS alpha1,
           CAST(thr2 AS BIGINT) AS thr2_cents, CAST(pol2 AS INT) AS pol2,
           round(CAST(e2 AS DOUBLE) / CAST(w2_tot AS DOUBLE), 6) AS err2,
           round(0.5 * ln((1.0 - CAST(e2 AS DOUBLE) / CAST(w2_tot AS DOUBLE))
                          / (CAST(e2 AS DOUBLE) / CAST(w2_tot AS DOUBLE))), 6)
               AS alpha2,
           round(CAST(n_correct AS DOUBLE) / CAST(n_all AS DOUBLE), 6)
               AS train_accuracy
    FROM g
"""


# --------------------------------------------------------------------------
# poisson_mixture_em — two-component Poisson mixture on daily counts
# --------------------------------------------------------------------------

PMIX_STEPS = 3


def poisson_mixture_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component Poisson mixture over daily purchase counts, fit by
    PMIX_STEPS EM iterations as a static DAG (the logistic/cox lineage):
    responsibilities in LOG space (the k! terms cancel in the ratio, and
    k*ln(l1/l2) - (l1 - l2) + ln(pi/(1-pi)) never overflows), M-step
    means from responsibility-weighted folds — the unsupervised
    regime-detection companion of the supervised model tier.

    Determinism: the count grid is bounded by distinct daily totals; all
    folds are ORDER-PINNED over it; init is pinned (pi = 0.5, lambda =
    0.5x / 1.5x the grand mean) so every engine walks the same path.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    grid = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    wall = Window.partitionBy()
    wcum = wall.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    m0 = grid.groupBy().agg(
        (
            F.sum(F.col("k").cast("double") * F.col("c").cast("double"))
            / F.sum(F.col("c").cast("double"))
        ).alias("m")
    )
    state = m0.select(
        F.lit(0.5).alias("pi"),
        (F.col("m") * F.lit(0.5)).alias("l1"),
        (F.col("m") * F.lit(1.5)).alias("l2"),
    )
    for _ in range(PMIX_STEPS):
        j = grid.crossJoin(F.broadcast(state))
        z = (
            F.log(F.col("pi") / (F.lit(1.0) - F.col("pi")))
            + F.col("k").cast("double") * F.log(F.col("l1") / F.col("l2"))
            - (F.col("l1") - F.col("l2"))
        )
        r = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        cd = F.col("c").cast("double")
        kd = F.col("k").cast("double")
        folded = j.select(
            "k",
            F.sum(cd * r).over(wcum).alias("sr"),
            F.sum(cd).over(wcum).alias("sc"),
            F.sum(cd * r * kd).over(wcum).alias("srk"),
            F.sum(cd * (F.lit(1.0) - r) * kd).over(wcum).alias("sqk"),
        )
        s = folded.groupBy().agg(
            F.max_by(F.col("sr"), F.col("k")).alias("sr"),
            F.max_by(F.col("sc"), F.col("k")).alias("sc"),
            F.max_by(F.col("srk"), F.col("k")).alias("srk"),
            F.max_by(F.col("sqk"), F.col("k")).alias("sqk"),
        )
        state = s.select(
            (F.col("sr") / F.col("sc")).alias("pi"),
            (F.col("srk") / F.col("sr")).alias("l1"),
            (F.col("sqk") / (F.col("sc") - F.col("sr"))).alias("l2"),
        )
    ndays = grid.groupBy().agg(F.sum("c").cast("long").alias("n_days"))
    return state.crossJoin(F.broadcast(ndays)).select(
        "n_days",
        F.round("pi", 6).alias("pi_low"),
        F.round("l1", 4).alias("lambda_low"),
        F.round("l2", 4).alias("lambda_high"),
    )


def _pmix_oracle() -> str:
    ctes = [
        """grid AS MATERIALIZED (
        SELECT k, count(*) AS c FROM (
            SELECT CAST(ts AS DATE) AS day, count(*) AS k
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ) GROUP BY 1
    )""",
        """st0 AS (
        SELECT 0.5 AS pi,
               0.5 * (sum(CAST(k AS DOUBLE) * CAST(c AS DOUBLE))
                      / sum(CAST(c AS DOUBLE))) AS l1,
               1.5 * (sum(CAST(k AS DOUBLE) * CAST(c AS DOUBLE))
                      / sum(CAST(c AS DOUBLE))) AS l2
        FROM grid
    )""",
    ]
    prev = "st0"
    for i in range(1, PMIX_STEPS + 1):
        ctes.append(f"""em{i} AS (
            SELECT g.k,
                   sum(CAST(c AS DOUBLE)
                       * (1.0 / (1.0 + exp(-(ln(pi / (1.0 - pi))
                          + CAST(g.k AS DOUBLE) * ln(l1 / l2)
                          - (l1 - l2)))))) OVER wo AS sr,
                   sum(CAST(c AS DOUBLE)) OVER wo AS sc,
                   sum(CAST(c AS DOUBLE)
                       * (1.0 / (1.0 + exp(-(ln(pi / (1.0 - pi))
                          + CAST(g.k AS DOUBLE) * ln(l1 / l2)
                          - (l1 - l2)))))
                       * CAST(g.k AS DOUBLE)) OVER wo AS srk,
                   sum(CAST(c AS DOUBLE)
                       * (1.0 - 1.0 / (1.0 + exp(-(ln(pi / (1.0 - pi))
                          + CAST(g.k AS DOUBLE) * ln(l1 / l2)
                          - (l1 - l2)))))
                       * CAST(g.k AS DOUBLE)) OVER wo AS sqk
            FROM grid g, {prev}
            WINDOW wo AS (ORDER BY g.k ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)
        )""")
        ctes.append(f"""st{i} AS (
            SELECT arg_max(sr, k) / arg_max(sc, k) AS pi,
                   arg_max(srk, k) / arg_max(sr, k) AS l1,
                   arg_max(sqk, k) / (arg_max(sc, k) - arg_max(sr, k)) AS l2
            FROM em{i}
        )""")
        prev = f"st{i}"
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    nd AS (SELECT CAST(sum(c) AS BIGINT) AS n_days FROM grid)
    SELECT n_days, round(pi, 6) AS pi_low,
           round(l1, 4) AS lambda_low, round(l2, 4) AS lambda_high
    FROM {prev}, nd
    """


QUERIES["poisson_mixture_em"] = poisson_mixture_em
ORACLES["poisson_mixture_em"] = _pmix_oracle()
