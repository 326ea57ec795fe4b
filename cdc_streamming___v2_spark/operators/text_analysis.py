"""Text-analysis operators over the ``documents`` table (DRIVER surface):
token counting, quality scoring, language-ID heuristic, fingerprinting.

All pure column expressions — at 100 TB these run entirely inside the
parquet scan stage (no shuffle, no Python), so throughput is scan-bound.
Each query has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texts import (
    EN_STOPWORDS,
    LANG_MARKERS,
    md5_hash_long,
    n_tokens_bpe_est,
    n_tokens_ws,
    normalized,
    punct_ratio,
    stopword_hits,
)
from ..sources.tables import load_table


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-estimate token counts per document."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        n_tokens_ws(t).alias("n_tokens_ws"),
        n_tokens_bpe_est(t).alias("n_tokens_bpe"),
        F.length(t).cast("long").alias("n_chars_actual"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + score."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = n_tokens_ws(t)
    sw_ratio = stopword_hits(t, EN_STOPWORDS) / n_words
    pr = punct_ratio(t)
    avg_word_len = (F.length(t) - (n_words - 1)) / n_words
    # crude composite: long enough, some stopwords, low punctuation
    score = (
        F.least(n_words / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(sw_ratio * 5, F.lit(1.0)) * 0.4
        + (1 - F.least(pr * 10, F.lit(1.0))) * 0.2
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(avg_word_len, 3).alias("avg_word_len"),
        F.round(pr, 4).alias("punct_ratio"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def lm_bigram_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality filter: per-document cross-entropy
    under an add-one-smoothed BIGRAM model trained on the corpus itself.
    Documents whose token transitions look unlike the corpus (boilerplate,
    shuffled text, wrong language) score high and get filtered.

    score = -(1/n) * sum log2( (c(w1,w2)+1) / (c(w1)+V) ) over the doc's
    bigrams; perplexity = 2^score.  Reported rounded (sum reassociation
    noise ~1e-15 sits far below 4 decimals).

    Scale: bigram extraction is one lag window per doc partition (a single
    doc_id-keyed shuffle); the count model is two groupBy aggs (bigram- and
    unigram-cardinality shuffles); scoring joins the doc bigrams against
    the model on the bigram key — all hash-partitionable, vocabulary V is
    a 1-row broadcast.  No UDF anywhere.
    """
    from pyspark.sql import Window

    from ..sources.tables import fan_out
    from ..functions.texts import words

    d = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "w")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    # consumed three times (bigram counts, unigram counts, scoring join)
    # — un-cut, the explode + lead window executed per consumer (r11:
    # 28-Exchange plan)
    bg = (
        toks.withColumn("w2", F.lead("w").over(wdoc))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("w").alias("w1"), "w2")
        .localCheckpoint(eager=True)
    )
    c_bg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cbg"))
    c_ug = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cug"))
    vocab = toks.agg(F.countDistinct("w").alias("v"))
    logp = F.log2((F.col("cbg") + 1) / (F.col("cug") + F.col("v")))
    return (
        bg.join(c_bg, ["w1", "w2"])
        .join(c_ug, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (-F.avg(logp)).alias("xent"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round("xent", 4).alias("cross_entropy_bits"),
            F.round(F.pow(F.lit(2.0), F.col("xent")), 2).alias("perplexity"),
        )
    )


def doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty/diversity signal: the fraction of a document's word
    trigrams that appear NOWHERE else in the corpus (df = 1), plus the
    mean document frequency of its shingles — boilerplate scores low
    novelty / high mean-df, original text the reverse.  The selection
    signal diversity-aware corpus builders rank on next to quality.

    Scale: ONE pass — the per-shingle df is a count over
    Window.partitionBy(shingle) on the exploded frame, then a per-doc
    agg.  One shingle-keyed shuffle total; the earlier agg+join-back
    shape ran the Arrow shingle kernel TWICE (the two consumers defeat
    exchange reuse) and carried two extra shuffles — measured 2.7x at
    the 10x corpus vs ~1x for single-pass peers (round-8 evidence).
    """
    from pyspark.sql import Window

    from ..sources.tables import exploded_shingles
    from ..sources.tables import load_table as _lt

    sh = exploded_shingles(_lt(spark, sf_dir, "documents"))
    wsh = Window.partitionBy("s")
    return (
        sh.withColumn("df", F.count(F.lit(1)).over(wsh))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).cast("bigint").alias("n_unique"),
            F.round(
                F.sum((F.col("df") == 1).cast("long")) / F.count(F.lit(1)), 4
            ).alias("novelty"),
            F.round(F.avg("df"), 4).alias("mean_df"),
        )
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic: argmax of per-language hit counts
    with fixed precedence (en > fr > de > es, ties to earlier)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    hits = {lang: stopword_hits(t, mk) for lang, mk in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.greatest(*[hits[lg] for lg in langs])
    pred = F.lit("unknown")
    for lg in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(hits[lg] == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("unknown")).otherwise(pred)
    out = d.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        *[hits[lg].alias(f"hits_{lg}") for lg in langs],
        pred.alias("predicted_lang"),
    )
    return out


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprints: md5 of normalized text plus a
    64-bit-range numeric fingerprint (hash-join-able across engines)."""
    d = load_table(spark, sf_dir, "documents")
    norm = normalized(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint_md5"),
        md5_hash_long(norm).alias("fingerprint_id"),
    )


BPE_TOP = 50


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training iteration over the corpus: count adjacent
    character pairs inside words and rank the merge candidates — the core
    counting step a distributed tokenizer trainer (BPE / WordPiece) runs
    per merge round (Sennrich et al. 2016, public algorithm).

    Scale: explode words -> explode the length-1 character pair windows
    (narrow maps over the fanned-out scan) -> one pair-keyed groupBy with
    map-side combine. The top-k cut is orderBy+limit — Spark plans
    TakeOrderedAndProject (per-partition heaps + driver merge), so the
    rank window runs on the BPE_TOP-row head, never the full pair
    vocabulary in one partition (VERDICT r4 #6; the bm25/zipf pattern).
    """
    from pyspark.sql import Window

    from ..functions.texts import words
    from ..sources.tables import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select(F.explode(words(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("pair").asc()
    ).limit(BPE_TOP)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "pair", "n_occurrences", "rank"
    )


# fixed public-style logistic weights over the quality features — a stand-in
# for a fastText/logreg quality classifier with published coefficients; the
# Spark plan and the oracle share the exact arithmetic
_QL_W = {"bias": -1.0, "n_words": 0.04, "sw_ratio": 3.0, "punct": -8.0}


def quality_logit_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic quality scorer: sigmoid over fixed-weight text features
    (length, stopword ratio, punctuation density) with a keep/drop flag at
    0.5 — the classifier-based document filter of public pipeline recipes
    (CCNet / Gopher-style), with the model weights frozen as literals so
    both engines compute bit-identical scores.

    Scale: pure column expressions inside the scan stage — no shuffle, no
    Python; throughput is scan-bound like the rest of this module.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = n_tokens_ws(t)
    sw_ratio = stopword_hits(t, EN_STOPWORDS) / n_words
    pr = punct_ratio(t)
    z = (
        F.lit(_QL_W["bias"])
        + F.lit(_QL_W["n_words"]) * n_words
        + F.lit(_QL_W["sw_ratio"]) * sw_ratio
        + F.lit(_QL_W["punct"]) * pr
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return d.select(
        "doc_id",
        F.round(z, 4).alias("logit"),
        F.round(prob, 4).alias("prob_keep"),
        (prob >= 0.5).alias("keep"),
    )


# --- oracles -----------------------------------------------------------------

_WORDS = "regexp_split_to_array(trim(text), '\\s+')"


def _sw_hits(words_expr: str, stopwords) -> str:
    lst = ", ".join(f"'{w}'" for w in stopwords)
    return (
        f"CAST(len(list_filter({words_expr}, x -> list_contains([{lst}], x)))"
        " AS BIGINT)"
    )


def _lang_id_sql() -> str:
    langs = list(LANG_MARKERS)
    hit_cols = ",\n               ".join(
        f"{_sw_hits(_WORDS, LANG_MARKERS[lg])} AS hits_{lg}" for lg in langs
    )
    best = "greatest(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'unknown' "
    for lg in langs:
        case += f"WHEN hits_{lg} = {best} THEN '{lg}' "
    case += "ELSE 'unknown' END"
    return f"""
        SELECT doc_id, declared_lang, {', '.join('hits_' + lg for lg in langs)},
               {case} AS predicted_lang
        FROM (
            SELECT doc_id, lang AS declared_lang,
               {hit_cols}
            FROM documents
        )
    """


ORACLES = {
    "token_count": f"""
        SELECT doc_id,
               CAST(len({_WORDS}) AS BIGINT)            AS n_tokens_ws,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe,
               CAST(length(text) AS BIGINT)             AS n_chars_actual
        FROM documents
    """,
    "text_quality": f"""
        SELECT doc_id,
               CAST(len({_WORDS}) AS BIGINT) AS n_words,
               round((length(text) - (len({_WORDS}) - 1)) * 1.0 / len({_WORDS}), 3)
                   AS avg_word_len,
               round(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0
                     / length(text), 4) AS punct_ratio,
               round({_sw_hits(_WORDS, EN_STOPWORDS)} * 1.0 / len({_WORDS}), 4)
                   AS stopword_ratio,
               round(least(len({_WORDS}) / 50.0, 1.0) * 0.4
                     + least({_sw_hits(_WORDS, EN_STOPWORDS)} * 1.0
                             / len({_WORDS}) * 5, 1.0) * 0.4
                     + (1 - least(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                                  * 1.0 / length(text) * 10, 1.0)) * 0.2, 4)
                   AS quality_score
        FROM documents
    """,
    "lm_bigram_quality": f"""
        WITH base AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 1, 0)),
                       i -> ws[i])) AS w1,
                   unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 1, 0)),
                       i -> ws[i + 1])) AS w2
            FROM base
        ),
        cbg AS (SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2),
        cug AS (SELECT w1, count(*) AS cug FROM bg GROUP BY 1),
        v AS (SELECT count(DISTINCT w) AS v
              FROM (SELECT unnest(ws) AS w FROM base))
        SELECT b.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(-avg(log2((c.cbg + 1.0) / (u.cug + v.v))), 4)
                   AS cross_entropy_bits,
               round(pow(2.0, -avg(log2((c.cbg + 1.0) / (u.cug + v.v)))), 2)
                   AS perplexity
        FROM bg b
        JOIN cbg c ON b.w1 = c.w1 AND b.w2 = c.w2
        JOIN cug u ON b.w1 = u.w1
        CROSS JOIN v
        GROUP BY b.doc_id
    """,
    "doc_novelty": """
        WITH sh AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 2, 0)),
                       i -> array_to_string(w[i:i+2], ' ')))) AS s
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
                  FROM documents)
        ),
        dfc AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique,
               round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS novelty,
               round(avg(df), 4) AS mean_df
        FROM sh JOIN dfc USING (s)
        GROUP BY doc_id
    """,
    "lang_id": _lang_id_sql(),
    "doc_fingerprint": """
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                   AS fingerprint_md5,
               CAST('0x' || substr(
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 8)
                   AS BIGINT) AS fingerprint_id
        FROM documents
    """,
}

ORACLES["bpe_pair_counts"] = f"""
    WITH w AS (
        SELECT unnest({_WORDS}) AS w FROM documents
    ),
    p AS (
        SELECT unnest(list_transform(
            generate_series(1, len(w) - 1), i -> substr(w, i, 2))) AS pair
        FROM w WHERE length(w) >= 2
    ),
    c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences
          FROM p GROUP BY 1)
    SELECT pair, n_occurrences, rank FROM (
        SELECT pair, n_occurrences,
               row_number() OVER (ORDER BY n_occurrences DESC, pair ASC)
                   AS rank
        FROM c
    ) WHERE rank <= {BPE_TOP}
"""

ORACLES["quality_logit_score"] = f"""
    SELECT doc_id,
           round(z, 4) AS logit,
           round(1.0 / (1.0 + exp(-z)), 4) AS prob_keep,
           (1.0 / (1.0 + exp(-z))) >= 0.5 AS keep
    FROM (
        SELECT doc_id,
               {_QL_W["bias"]}
               + {_QL_W["n_words"]} * len({_WORDS})
               + {_QL_W["sw_ratio"]} * ({_sw_hits(_WORDS, EN_STOPWORDS)} * 1.0
                                        / len({_WORDS}))
               + ({_QL_W["punct"]}) * (length(regexp_replace(text,
                       '[^.,!?;:]', '', 'g')) * 1.0 / length(text)) AS z
        FROM documents
    )
"""

ENTROPY_LOW_BITS = 3.0  # below ~3 bits/char a doc is repetitive junk


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (bits/char) — the
    classic cheap junk filter: base64 blobs, repeated padding, and
    single-character spam all sit far below natural-language entropy
    (~4 bits/char for English), so `low_entropy` flags removal candidates.

    Scale: chars explode then reduce back keyed by (doc_id, char) with
    map-side combine — shuffle volume is per-doc DISTINCT chars (≤ ~100
    cells/doc regardless of length), then one more per-doc combine. No
    Python, no global state; throughput stays scan-bound.
    """
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    # H = log2(n) - sum(c*log2(c))/n — one aggregation, no per-row p column
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
        F.sum(F.col("c") * F.log2("c")).alias("s"),
    )
    h = F.log2("n") - F.col("s") / F.col("n")
    return per_doc.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars_actual"),
        "n_distinct_chars",
        F.round(h, 4).alias("entropy_bits"),
        (h < F.lit(ENTROPY_LOW_BITS)).alias("low_entropy"),
    )


QUERIES = {
    "token_count": token_count,
    "text_quality": text_quality,
    "lm_bigram_quality": lm_bigram_quality,
    "doc_novelty": doc_novelty,
    "lang_id": lang_id,
    "doc_fingerprint": doc_fingerprint,
    "bpe_pair_counts": bpe_pair_counts,
    "quality_logit_score": quality_logit_score,
    "char_entropy": char_entropy,
}

ORACLES["char_entropy"] = f"""
    WITH chars AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, length(text)),
                                     i -> substr(text, i, 1))) AS ch
        FROM documents
    ),
    counts AS (
        SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
        FROM chars GROUP BY 1, 2
    ),
    per_doc AS (
        SELECT doc_id, sum(c) AS n,
               CAST(count(*) AS BIGINT) AS n_distinct_chars,
               sum(c * log2(c)) AS s
        FROM counts GROUP BY 1
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars_actual,
           n_distinct_chars,
           round(log2(n) - s / n, 4) AS entropy_bits,
           (log2(n) - s / n) < {ENTROPY_LOW_BITS} AS low_entropy
    FROM per_doc
"""


# --- round-5: iterative BPE merge training -----------------------------------

BPE_MERGE_ROUNDS = 3


def bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE_MERGE_ROUNDS iterations of actual BPE training — pick the
    most-frequent adjacent symbol pair, MERGE it throughout the corpus,
    recount, repeat (Sennrich et al. 2016) — where bpe_pair_counts is one
    round's counting step, this runs the full train loop with the merges
    applied, returning the learned merge table (round, merged symbol,
    occurrence count at selection time).

    Representation: each word is a pipe-delimited symbol string
    ("|h|e|l|l|o|"); a merge of (a,b) is the LITERAL string replace of
    "|a|b|" with "|ab|" — left-to-right non-overlapping in both engines
    (Spark StringReplace == DuckDB replace), which is exactly BPE's
    left-to-right merge order, and the delimiters make multi-character
    symbols unambiguous (no lookbehind regex, which RE2/DuckDB lacks).

    Scale: each round is (a) a narrow symbol-pair explode + one
    pair-keyed count with map-side combine, (b) a 1-row argmax collected
    as a scalar witness (the pagerank max-normalization house pattern),
    (c) a narrow literal string replace with the symbol stream
    localCheckpointed per round — WITHOUT the checkpoint, round r's lazy
    lineage re-ran the full scan + every earlier round's count/replace,
    an O(rounds^2) recompute that measured a 14x cliff at the 10x corpus
    (round-8 scale evidence); checkpointed, each round is one bounded
    pair shuffle + one corpus-linear replace.  The tie-break (max count,
    then lexicographically smallest pair) is deterministic, so the
    oracle unrolls the identical rounds.
    """
    from ..functions.texts import words
    from ..sources.tables import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select(F.explode(words(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    # Sennrich's own training trick: BPE depends only on word CONTENT, so
    # train on the distinct-word frame weighted by multiplicity — pair
    # counts become sum(wcnt) instead of count(*), identical by
    # replication, and every per-round materialize/replace touches a
    # VOCAB-sized frame instead of the corpus-sized token stream (the
    # corpus-sized variant measured a 6x 10x-ratio even checkpointed;
    # this is the scale-true shape).
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("wcnt"))
    s = wc.select(
        F.concat(
            F.regexp_replace(F.col("w"), "(.)", r"|$1"), F.lit("|")
        ).alias("s"),
        "wcnt",
    )
    s = s.localCheckpoint(eager=True)
    merges = []
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        pairs = (
            s.select(F.split(F.col("s"), r"\|").alias("a"), "wcnt")
            .filter(F.size("a") >= 4)  # >= 2 symbols (split adds '' ends)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(2, size(a) - 2), i -> "
                        "concat('|', element_at(a, i), '|', "
                        "element_at(a, i + 1), '|'))"
                    )
                ).alias("pair"),
                "wcnt",
            )
        )
        pc = pairs.groupBy("pair").agg(F.sum("wcnt").alias("cnt"))
        top = pc.agg(
            F.min_by(
                F.struct(F.col("pair"), F.col("cnt")),
                F.struct((-F.col("cnt")).alias("nc"), F.col("pair")),
            ).alias("m")
        ).select(F.col("m.pair"), F.col("m.cnt")).collect()[0]
        pair, cnt = top["pair"], top["cnt"]
        merges.append((r, pair.replace("|", ""), int(cnt)))
        if r < BPE_MERGE_ROUNDS:
            s = s.select(
                F.replace(
                    F.col("s"),
                    F.lit(pair),
                    F.lit("|" + pair.replace("|", "") + "|"),
                ).alias("s"),
                "wcnt",
            ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_round int, merged_symbol string, n_occurrences bigint"
    )


def _bpe_merge_oracle() -> str:
    w_sql = "regexp_split_to_array(trim(text), '\\s+')"
    ctes = [
        f"""s0 AS (
            SELECT regexp_replace(w, '(.)', '|\\1', 'g') || '|' AS s
            FROM (SELECT unnest({w_sql}) AS w FROM documents)
            WHERE length(w) >= 2
        )"""
    ]
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        prev = f"s{r - 1}"
        ctes.append(f"""pc{r} AS (
            SELECT pr AS pair, count(*) AS cnt FROM (
                SELECT unnest(list_transform(
                           generate_series(2, len(a) - 2),
                           i -> '|' || a[i] || '|' || a[i + 1] || '|')) AS pr
                FROM (SELECT string_split(s, '|') AS a FROM {prev})
                WHERE len(a) >= 4)
            GROUP BY pr
        )""")
        ctes.append(f"""m{r} AS (
            SELECT pair, cnt FROM pc{r}
            ORDER BY cnt DESC, pair ASC LIMIT 1
        )""")
        ctes.append(f"""s{r} AS (
            SELECT replace(s, m.pair,
                           '|' || replace(m.pair, '|', '') || '|') AS s
            FROM {prev}, m{r} m
        )""")
    joined = ",\n        ".join(ctes)
    rows = "\n        UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS merge_round, "
        f"replace(pair, '|', '') AS merged_symbol, "
        f"CAST(cnt AS BIGINT) AS n_occurrences FROM m{r}"
        for r in range(1, BPE_MERGE_ROUNDS + 1)
    )
    return f"""
        WITH {joined}
        {rows}
    """


ORACLES["bpe_merge_rounds"] = _bpe_merge_oracle()
QUERIES["bpe_merge_rounds"] = bpe_merge_rounds


# --- ensemble quality vote ---------------------------------------------------

ENSEMBLE_MIN_WORDS = 20


def quality_ensemble_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble document filter: the production pattern of AND-ing several
    independent cheap screens instead of trusting one — (1) length floor,
    (2) logistic quality probability >= 0.5, (3) the lang-id marker
    heuristic recognizes SOME language.  Emits each vote plus the final
    keep flag and a bitmask for drop-reason analytics.

    Scale: pure column expressions (the lang-id hits, the logit, the word
    count all inline into one projection) — runs entirely inside the scan
    stage like the rest of this module; no shuffle, no Python.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = n_tokens_ws(t)
    sw_ratio = stopword_hits(t, EN_STOPWORDS) / n_words
    z = (
        F.lit(_QL_W["bias"])
        + F.lit(_QL_W["n_words"]) * n_words
        + F.lit(_QL_W["sw_ratio"]) * sw_ratio
        + F.lit(_QL_W["punct"]) * punct_ratio(t)
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    any_lang = F.greatest(
        *[stopword_hits(t, mk) for mk in LANG_MARKERS.values()]
    ) > 0
    v_len = n_words >= ENSEMBLE_MIN_WORDS
    v_quality = prob >= 0.5
    return d.select(
        "doc_id",
        v_len.alias("vote_length"),
        v_quality.alias("vote_quality"),
        any_lang.alias("vote_lang"),
        (v_len & v_quality & any_lang).alias("keep"),
        (
            F.when(v_len, 0).otherwise(1)
            + F.when(v_quality, 0).otherwise(2)
            + F.when(any_lang, 0).otherwise(4)
        ).cast("bigint").alias("drop_mask"),
    )


def _ensemble_oracle() -> str:
    any_lang = (
        "greatest("
        + ", ".join(_sw_hits(_WORDS, mk) for mk in LANG_MARKERS.values())
        + ") > 0"
    )
    z = f"""{_QL_W["bias"]}
            + {_QL_W["n_words"]} * len({_WORDS})
            + {_QL_W["sw_ratio"]} * ({_sw_hits(_WORDS, EN_STOPWORDS)} * 1.0
                                     / len({_WORDS}))
            + ({_QL_W["punct"]}) * (length(regexp_replace(text,
                    '[^.,!?;:]', '', 'g')) * 1.0 / length(text))"""
    return f"""
        SELECT doc_id,
               v_len AS vote_length,
               v_quality AS vote_quality,
               v_lang AS vote_lang,
               v_len AND v_quality AND v_lang AS keep,
               CAST((CASE WHEN v_len THEN 0 ELSE 1 END)
                    + (CASE WHEN v_quality THEN 0 ELSE 2 END)
                    + (CASE WHEN v_lang THEN 0 ELSE 4 END) AS BIGINT)
                   AS drop_mask
        FROM (
            SELECT doc_id,
                   len({_WORDS}) >= {ENSEMBLE_MIN_WORDS} AS v_len,
                   1.0 / (1.0 + exp(-({z}))) >= 0.5 AS v_quality,
                   {any_lang} AS v_lang
            FROM documents
        )
    """


ORACLES["quality_ensemble_vote"] = _ensemble_oracle()
QUERIES["quality_ensemble_vote"] = quality_ensemble_vote


# --- readability -------------------------------------------------------------


def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per document from the
    classic published formulas (Flesch 1948 / Kincaid 1975), with the
    standard cheap approximations: sentences = '.!?' runs, syllables =
    vowel-group runs.  The readability screen sits next to the quality
    ensemble: very low ease flags legalese/boilerplate, impossible values
    flag non-text.

    Parity notes: both engines count pattern occurrences as
    ``len(split(text, pattern)) - 1`` — Spark's Java split and DuckDB's
    RE2 split both keep empty segments, so segment count minus one IS the
    match count.  The scores are computed over a COMMON INTEGER
    NUMERATOR (ease*1000*s*w and grade*100*s*w are exact bigints), so
    each published value is one division of exact integers + one
    half-away-from-zero integer round — engine round(x, k) on doubles
    diverges at decimal boundaries (Spark BigDecimal HALF_UP vs DuckDB
    multiply-based), and these formulas' small-denominator rationals land
    on those boundaries constantly; integer-numerator arithmetic
    sidesteps the divergence entirely.  Pure scan-stage expressions.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = n_tokens_ws(t)
    n_sent = F.greatest(
        F.size(F.split(t, r"[.!?]+")) - 1, F.lit(1)
    ).cast("long")
    n_syl = F.greatest(
        F.size(F.split(F.lower(t), "[aeiouy]+")) - 1, F.lit(1)
    ).cast("long")
    base = d.select(
        "doc_id",
        n_words.alias("w"),
        n_sent.alias("s"),
        n_syl.alias("syl"),
    )
    den = F.col("s") * F.col("w")
    ease_num = (
        F.lit(206835) * den
        - F.lit(1015) * F.col("w") * F.col("w")
        - F.lit(84600) * F.col("syl") * F.col("s")
    )
    grade_num = (
        F.lit(39) * F.col("w") * F.col("w")
        + F.lit(1180) * F.col("syl") * F.col("s")
        - F.lit(1559) * den
    )
    return base.select(
        "doc_id",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_sentences"),
        F.col("syl").alias("n_syllables"),
        (F.round(ease_num / den) / 1000.0).alias("flesch_ease"),
        (F.round(grade_num / den) / 100.0).alias("fk_grade"),
    )


ORACLES["readability_scores"] = f"""
    SELECT doc_id,
           n_words, n_sentences, n_syllables,
           round((206835 * (n_sentences * n_words)
                  - 1015 * n_words * n_words
                  - 84600 * n_syllables * n_sentences) * 1.0
                 / (n_sentences * n_words)) / 1000.0 AS flesch_ease,
           round((39 * n_words * n_words
                  + 1180 * n_syllables * n_sentences
                  - 1559 * (n_sentences * n_words)) * 1.0
                 / (n_sentences * n_words)) / 100.0 AS fk_grade
    FROM (
        SELECT doc_id,
               CAST(len({_WORDS}) AS BIGINT) AS n_words,
               CAST(greatest(len(regexp_split_to_array(text, '[.!?]+')) - 1,
                             1) AS BIGINT) AS n_sentences,
               CAST(greatest(len(regexp_split_to_array(lower(text),
                             '[aeiouy]+')) - 1, 1) AS BIGINT) AS n_syllables
        FROM documents
    )
"""
QUERIES["readability_scores"] = readability_scores


# --- RAKE keyword extraction -------------------------------------------------

RAKE_TOP = 30


def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, public): candidate
    phrases are maximal stopword-free token runs; each word scores
    degree/frequency (degree = sum of the lengths of the phrases it
    appears in), a phrase scores the sum of its word scores; report the
    top-RAKE_TOP phrases corpus-wide.

    Determinism: word scores become integer MICRO-scores via one exact
    division + round (identical bigints in both engines), so phrase
    scores are EXACT integer sums and the top-k ordering can never flip
    on float noise.  Scale: phrase segmentation is the gaps-and-islands
    window per doc (one doc-keyed shuffle); word stats are two
    vocabulary-sized aggs; the final cut is orderBy+limit
    (TakeOrderedAndProject).
    """
    from pyspark.sql import Window

    from ..functions.texts import words
    from ..sources.tables import fan_out

    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    d = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select(
        "doc_id",
        F.posexplode(words(F.lower(F.col("text")))).alias("pos", "w"),
    ).filter(
        (~F.array_contains(sw, F.col("w"))) & (F.length("w") >= 2)
    )
    order = Window.partitionBy("doc_id").orderBy("pos")
    run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ph = toks.withColumn(
        "start",
        F.when(
            F.lag("pos").over(order).isNull()
            | (F.col("pos") - F.lag("pos").over(order) > 1),
            1,
        ).otherwise(0),
    ).withColumn("phrase_id", F.sum("start").over(run))
    # ph feeds phrases, occ, and the scoring join; phrases feeds occ and
    # the scoring join — un-cut, the explode + two run windows executed
    # three times (measured r11: 26-Exchange plan)
    ph = ph.localCheckpoint(eager=True)
    phrases = ph.groupBy("doc_id", "phrase_id").agg(
        F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("pos", "w")))
                    .getField("w")).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    ).localCheckpoint(eager=True)
    occ = ph.join(phrases, ["doc_id", "phrase_id"]).select("w", "plen")
    wstats = occ.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree")
    )
    wscore = wstats.select(
        "w",
        F.round(F.col("degree") * 1_000_000 / F.col("freq"))
        .cast("long")
        .alias("ws_micro"),
    )
    # phrase score = sum of word micro-scores over one occurrence; the
    # same phrase text always has the same words, hence the same score
    one = (
        ph.join(phrases, ["doc_id", "phrase_id"])
        .join(wscore, "w")
        .groupBy("doc_id", "phrase_id", "phrase")
        .agg(F.sum("ws_micro").alias("score_micro"))
    )
    agg = one.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.max("score_micro").cast("bigint").alias("score_micro"),
    )
    w_rank = Window.orderBy(
        F.col("score_micro").desc(), F.col("phrase").asc()
    )
    top = agg.orderBy(
        F.col("score_micro").desc(), F.col("phrase").asc()
    ).limit(RAKE_TOP)
    return top.withColumn("rank", F.row_number().over(w_rank)).select(
        "phrase", "n_occurrences", "score_micro", "rank"
    )


def _rake_oracle() -> str:
    sw_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
    WITH toks AS (
        SELECT doc_id, pos, w FROM (
            SELECT doc_id,
                   unnest(generate_series(1, len(ws))) AS pos,
                   unnest(ws) AS w
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(lower(text)), '\\s+')
                             AS ws
                  FROM documents)
        ) WHERE NOT list_contains([{sw_list}], w) AND length(w) >= 2
    ),
    flagged AS (
        SELECT doc_id, pos, w,
               CASE WHEN lag(pos) OVER dw IS NULL
                         OR pos - lag(pos) OVER dw > 1
                    THEN 1 ELSE 0 END AS start
        FROM toks
        WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)
    ),
    ph AS (
        SELECT doc_id, pos, w,
               sum(start) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS phrase_id
        FROM flagged
    ),
    phrases AS (
        SELECT doc_id, phrase_id,
               string_agg(w, ' ' ORDER BY pos) AS phrase,
               count(*) AS plen
        FROM ph GROUP BY 1, 2
    ),
    wstats AS (
        SELECT p.w, count(*) AS freq, sum(ps.plen) AS degree
        FROM ph p JOIN phrases ps USING (doc_id, phrase_id)
        GROUP BY 1
    ),
    wscore AS (
        SELECT w, CAST(round(degree * 1000000.0 / freq, 0) AS BIGINT)
                      AS ws_micro
        FROM wstats
    ),
    one AS (
        SELECT p.doc_id, p.phrase_id, ps.phrase,
               sum(s.ws_micro) AS score_micro
        FROM ph p
        JOIN phrases ps USING (doc_id, phrase_id)
        JOIN wscore s ON p.w = s.w
        GROUP BY 1, 2, 3
    ),
    agg AS (
        SELECT phrase,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(max(score_micro) AS BIGINT) AS score_micro
        FROM one GROUP BY 1
    )
    SELECT phrase, n_occurrences, score_micro, rank FROM (
        SELECT *, row_number() OVER (ORDER BY score_micro DESC,
                                     phrase ASC) AS rank
        FROM agg
    ) WHERE rank <= {RAKE_TOP}
    """


ORACLES["rake_keywords"] = _rake_oracle()
QUERIES["rake_keywords"] = rake_keywords


# --------------------------------------------------------------------------
# round-5 restarted-session: term burst detection
# --------------------------------------------------------------------------

BURST_Z = 3.0


def term_burst_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg-style term burst detection (z-score form): for every
    (word, day) cell of the COMPLETE vocabulary x day grid (absent days
    count zero — omitting them is the classic burst-detection bug that
    inflates every mean), flag cells where the daily count sits
    >= BURST_Z sample standard deviations above the word's own daily
    mean — the trending-topic monitor over the corpus stream.

    The documents table carries no timestamps, so the day axis comes from
    joining each document's tokens to the events of the same id range —
    here, deterministically, day = doc_id mod the day-grid size of the
    events table, a synthetic but fixed publication calendar (documented;
    with real ingest timestamps the same plan applies unchanged).

    Exactness: means/variances from exact integer count sums; z is
    rounded to 6 before the threshold comparison so the flag can never
    flip on float noise.

    Scale: the grid is vocabulary x observation-window — bounded in the
    day direction; the zero-fill is a broadcast cross of the day frame.
    """
    from pyspark.sql import Window

    from ..functions.texts import words

    d = load_table(spark, sf_dir, "documents")
    # calendar-bounded and consumed three times (count row, index, grid
    # cross) — un-cut, each reference re-scanned the events table
    days = (
        load_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_days_row = days.agg(F.count(F.lit(1)).alias("nd"))
    toks = (
        d.crossJoin(F.broadcast(n_days_row))
        .select(
            (F.col("doc_id") % F.col("nd")).alias("day_idx"),
            F.explode(words(F.col("text"))).alias("w"),
        )
    )
    wday = Window.orderBy("day")
    day_idx = days.withColumn("day_idx", F.row_number().over(wday) - 1)
    # vocabulary-x-days bounded, consumed by vocab AND the grid join —
    # un-cut, both re-ran the token explode (r11: 72-Exchange plan)
    counts = (
        toks.join(F.broadcast(day_idx), "day_idx")
        .groupBy("w", "day")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    vocab = counts.select("w").distinct()
    grid = (
        vocab.crossJoin(F.broadcast(days))
        .join(counts, ["w", "day"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    stats = grid.groupBy("w").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    j = grid.join(F.broadcast(stats), "w")
    nd = F.col("nd").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - 1)
    z = F.round((F.col("c").cast("double") - mean) / F.sqrt(var), 6)
    return (
        j.filter(F.col("ss") * F.col("nd") != F.col("s") * F.col("s"))
        .withColumn("z", z)
        .filter(F.col("z") >= BURST_Z)
        .select(
            "w",
            "day",
            F.col("c").cast("bigint").alias("n_mentions"),
            F.round(mean, 4).alias("daily_mean"),
            F.round("z", 4).alias("z_score"),
        )
    )


ORACLES["term_burst_days"] = f"""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    ndr AS (SELECT count(*) AS nd FROM days),
    day_idx AS (
        SELECT day, row_number() OVER (ORDER BY day) - 1 AS day_idx
        FROM days
    ),
    toks AS (
        SELECT doc_id % ndr.nd AS day_idx, unnest({_WORDS}) AS w
        FROM documents, ndr
    ),
    counts AS (
        SELECT t.w, di.day, count(*) AS c
        FROM toks t JOIN day_idx di ON t.day_idx = di.day_idx
        GROUP BY 1, 2
    ),
    vocab AS (SELECT DISTINCT w FROM counts),
    grid AS (
        SELECT v.w, d.day, COALESCE(c.c, 0) AS c
        FROM vocab v CROSS JOIN days d
        LEFT JOIN counts c ON c.w = v.w AND c.day = d.day
    ),
    stats AS (
        SELECT w, count(*) AS nd, sum(c) AS s, sum(c * c) AS ss
        FROM grid GROUP BY 1
    ),
    z AS (
        SELECT g.w, g.day, g.c, s.s, s.nd,
               round((CAST(g.c AS DOUBLE) - CAST(s.s AS DOUBLE) / s.nd)
                     / sqrt((CAST(s.ss AS DOUBLE)
                             - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE)
                               / s.nd) / (s.nd - 1)), 6) AS zv
        FROM grid g JOIN stats s ON g.w = s.w
        WHERE s.ss * s.nd != s.s * s.s
    )
    SELECT w, day, CAST(c AS BIGINT) AS n_mentions,
           round(CAST(s AS DOUBLE) / nd, 4) AS daily_mean,
           round(zv, 4) AS z_score
    FROM z WHERE zv >= {BURST_Z}
"""
QUERIES["term_burst_days"] = term_burst_days


def fleiss_kappa_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa agreement among the THREE ensemble quality raters
    (length / logistic / lang-marker, the quality_ensemble_vote
    predicates verbatim) — the n-rater generalization of
    cohens_kappa_langid: are the filters measuring one construct, or
    voting at random?

    With n = 3 raters and 2 categories, each document contributes
    P_i = (k(k-1) + (3-k)(2-k)) / 6 for k = its keep-vote count, so the
    whole statistic reduces to the four exact integer counts c_0..c_3 of
    documents by vote count; P-bar, chance agreement P_e = p0^2 + p1^2
    and kappa are single float expressions of those integers.  The
    Landis-Koch verdict compares the unrounded double.

    Scale: one projection inside the scan (the predicates are pure
    column expressions), one 4-row groupBy fold.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = n_tokens_ws(t)
    sw_ratio = stopword_hits(t, EN_STOPWORDS) / n_words
    z = (
        F.lit(_QL_W["bias"])
        + F.lit(_QL_W["n_words"]) * n_words
        + F.lit(_QL_W["sw_ratio"]) * sw_ratio
        + F.lit(_QL_W["punct"]) * punct_ratio(t)
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    any_lang = F.greatest(
        *[stopword_hits(t, mk) for mk in LANG_MARKERS.values()]
    ) > 0
    k = (
        (n_words >= ENSEMBLE_MIN_WORDS).cast("int")
        + (prob >= 0.5).cast("int")
        + any_lang.cast("int")
    )
    counts = d.select(k.alias("k")).groupBy("k").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    agg = counts.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("c")).alias("sk"),
        F.sum(
            (
                F.col("k").cast("decimal(38,0)") * (F.col("k") - 1)
                + (3 - F.col("k")).cast("decimal(38,0)") * (2 - F.col("k"))
            )
            * F.col("c")
        ).alias("sp"),
    )
    n = F.col("n").cast("double")
    p1 = F.col("sk").cast("double") / (3.0 * n)
    pbar = F.col("sp").cast("double") / (6.0 * n)
    pe = p1 * p1 + (1.0 - p1) * (1.0 - p1)
    kappa = (pbar - pe) / (1.0 - pe)
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.lit(3).cast("int").alias("n_raters"),
        F.round(pbar, 6).alias("p_bar"),
        F.round(pe, 6).alias("p_chance"),
        F.round(kappa, 6).alias("fleiss_kappa"),
        F.when(kappa < 0.0, F.lit("poor"))
        .when(kappa < 0.2, F.lit("slight"))
        .when(kappa < 0.4, F.lit("fair"))
        .when(kappa < 0.6, F.lit("moderate"))
        .when(kappa < 0.8, F.lit("substantial"))
        .otherwise(F.lit("almost_perfect"))
        .alias("agreement"),
    )


def _fleiss_oracle() -> str:
    any_lang = (
        "greatest("
        + ", ".join(_sw_hits(_WORDS, mk) for mk in LANG_MARKERS.values())
        + ") > 0"
    )
    z = f"""{_QL_W["bias"]}
            + {_QL_W["n_words"]} * len({_WORDS})
            + {_QL_W["sw_ratio"]} * ({_sw_hits(_WORDS, EN_STOPWORDS)} * 1.0
                                     / len({_WORDS}))
            + ({_QL_W["punct"]}) * (length(regexp_replace(text,
                    '[^.,!?;:]', '', 'g')) * 1.0 / length(text))"""
    return f"""
    WITH votes AS (
        SELECT (CASE WHEN len({_WORDS}) >= {ENSEMBLE_MIN_WORDS}
                     THEN 1 ELSE 0 END)
               + (CASE WHEN 1.0 / (1.0 + exp(-({z}))) >= 0.5
                       THEN 1 ELSE 0 END)
               + (CASE WHEN {any_lang} THEN 1 ELSE 0 END) AS k
        FROM documents
    ),
    counts AS (
        SELECT k, CAST(count(*) AS HUGEINT) AS c FROM votes GROUP BY 1
    ),
    agg AS (
        SELECT sum(c) AS n, sum(CAST(k AS HUGEINT) * c) AS sk,
               sum((CAST(k AS HUGEINT) * (k - 1)
                    + CAST(3 - k AS HUGEINT) * (2 - k)) * c) AS sp
        FROM counts
    ),
    parts AS (
        SELECT CAST(n AS DOUBLE) AS n,
               CAST(sk AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) AS p1,
               CAST(sp AS DOUBLE) / (6.0 * CAST(n AS DOUBLE)) AS pbar
        FROM agg
    ),
    st AS (
        SELECT n, pbar, p1 * p1 + (1.0 - p1) * (1.0 - p1) AS pe FROM parts
    )
    SELECT CAST(n AS BIGINT) AS n_docs, CAST(3 AS INTEGER) AS n_raters,
           round(pbar, 6) AS p_bar, round(pe, 6) AS p_chance,
           round((pbar - pe) / (1.0 - pe), 6) AS fleiss_kappa,
           CASE WHEN (pbar - pe) / (1.0 - pe) < 0.0 THEN 'poor'
                WHEN (pbar - pe) / (1.0 - pe) < 0.2 THEN 'slight'
                WHEN (pbar - pe) / (1.0 - pe) < 0.4 THEN 'fair'
                WHEN (pbar - pe) / (1.0 - pe) < 0.6 THEN 'moderate'
                WHEN (pbar - pe) / (1.0 - pe) < 0.8 THEN 'substantial'
                ELSE 'almost_perfect' END AS agreement
    FROM st
"""


ORACLES["fleiss_kappa_filters"] = _fleiss_oracle()
QUERIES["fleiss_kappa_filters"] = fleiss_kappa_filters


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword-to-word ratio
    (BPE-estimate tokens per whitespace word) and chars-per-token — THE
    standard multilingual-tokenizer health metric (a fertility far above
    the English baseline means the language pays more sequence length
    for the same text, skewing both cost and mixture weights).  The
    per-language companion of token_count (corpus totals) and
    tokenizer_vocab_coverage (OOV mass).

    All numerators/denominators are exact integer sums (word counts,
    ceil(len/4) token estimates, char counts); the ratios are one float
    division each, plus each language's fertility premium over the
    corpus-wide rate.

    Scale: pure column expressions inside the scan; one 4-row groupBy.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    per = d.select(
        "lang",
        n_tokens_ws(t).alias("w"),
        n_tokens_bpe_est(t).alias("b"),
        F.length(t).alias("c"),
    )
    # the lang-bucketed aggregate is materialized once (it is lang-count
    # sized) and feeds both the output rows and the corpus totals — the
    # totals used to be a SECOND pass over per, re-running the
    # BPE-estimate regex per doc (the multi-consumer recompute class
    # audited round 8)
    g = per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("sw"),
        F.sum("b").alias("sb"),
        F.sum("c").alias("sc"),
    ).localCheckpoint(eager=True)
    tot = g.agg(F.sum("sw").alias("tw"), F.sum("sb").alias("tb"))
    out = g.crossJoin(F.broadcast(tot))
    fert = F.col("sb").cast("double") / F.col("sw").cast("double")
    base = F.col("tb").cast("double") / F.col("tw").cast("double")
    return out.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("sw").cast("long").alias("n_words"),
        F.col("sb").cast("long").alias("n_tokens_est"),
        F.round(fert, 4).alias("fertility"),
        F.round(F.col("sc").cast("double") / F.col("sb").cast("double"), 4)
        .alias("chars_per_token"),
        F.round(fert / base, 4).alias("fertility_premium"),
    ).orderBy("lang")


ORACLES["tokenizer_fertility"] = """
    WITH per AS (
        SELECT lang,
               CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                    AS BIGINT) AS w,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS b,
               CAST(length(text) AS BIGINT) AS c
        FROM documents
    ),
    g AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(w) AS BIGINT) AS sw, CAST(sum(b) AS BIGINT) AS sb,
               CAST(sum(c) AS BIGINT) AS sc
        FROM per GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(w) AS BIGINT) AS tw, CAST(sum(b) AS BIGINT) AS tb
        FROM per
    )
    SELECT lang, n_docs, sw AS n_words, sb AS n_tokens_est,
           round(sb * 1.0 / sw, 4) AS fertility,
           round(sc * 1.0 / sb, 4) AS chars_per_token,
           round((sb * 1.0 / sw) / (tb * 1.0 / tw), 4) AS fertility_premium
    FROM g, tot
    ORDER BY lang
"""
QUERIES["tokenizer_fertility"] = tokenizer_fertility


YIELD_BINS = 20  # 0.05-wide probability buckets -> thresholds 0.00..0.95


def quality_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration yield curve: for each quality-probability
    threshold 0.00, 0.05, ..., 0.95, how many documents and how much
    token mass SURVIVE the logistic quality filter (text_quality's
    model verbatim) — the table a pipeline owner reads to pick the
    operating point before a 100 TB filtering run (decile_gains_table's
    pipeline-planning cousin, keyed by threshold instead of decile).

    The per-doc probability rounds to 1e-6 (bit-identical doubles both
    engines) and buckets once into its 0.05 bin (grid thresholds make
    bucket membership EQUIVALENT to prob >= threshold — no per-threshold
    rescan, no explode); the survive-counts are suffix sums over the
    bounded 20-row bucket frame.

    Scale: one projection inside the scan, one 20-row groupBy, and a
    20x20 broadcast grid join — nothing beyond the bucket frame.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = n_tokens_ws(t)
    sw_ratio = stopword_hits(t, EN_STOPWORDS) / n_words
    z = (
        F.lit(_QL_W["bias"])
        + F.lit(_QL_W["n_words"]) * n_words
        + F.lit(_QL_W["sw_ratio"]) * sw_ratio
        + F.lit(_QL_W["punct"]) * punct_ratio(t)
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    per = d.select(
        F.least(
            F.floor(prob * YIELD_BINS).cast("int"), F.lit(YIELD_BINS - 1)
        ).alias("b"),
        n_tokens_bpe_est(t).alias("tok"),
        n_tokens_ws(t).alias("w"),
    )
    # bucket frame materialized once (YIELD_BINS rows): it feeds the
    # cumulative grid join AND the corpus totals, which used to be a
    # second full pass over per re-running the token-estimate regexes
    # (the multi-consumer recompute class audited round 8)
    buckets = per.groupBy("b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("tok").alias("toks"),
        F.sum("w").alias("words"),
    ).localCheckpoint(eager=True)
    grid = spark.range(0, YIELD_BINS).select(F.col("id").cast("int").alias("k"))
    joined = grid.join(
        F.broadcast(buckets), F.col("b") >= F.col("k"), "left"
    ).groupBy("k").agg(
        F.sum("n").alias("n_retained"),
        F.sum("toks").alias("tok_retained"),
        F.sum("words").alias("w_retained"),
    )
    tot = buckets.agg(
        F.sum("n").alias("nt"), F.sum("toks").alias("tt")
    )
    out = joined.crossJoin(F.broadcast(tot))
    return out.select(
        F.round(F.col("k") / F.lit(float(YIELD_BINS)), 2).alias("threshold"),
        F.coalesce(F.col("n_retained"), F.lit(0)).cast("long").alias(
            "n_retained"
        ),
        F.round(
            F.coalesce(F.col("n_retained"), F.lit(0))
            / F.col("nt").cast("double"),
            4,
        ).alias("doc_share"),
        F.round(
            F.coalesce(F.col("tok_retained"), F.lit(0))
            / F.col("tt").cast("double"),
            4,
        ).alias("token_share"),
        F.round(
            F.coalesce(F.col("w_retained"), F.lit(0))
            / F.nullif(
                F.coalesce(F.col("n_retained"), F.lit(0)).cast("double"),
                F.lit(0.0),
            ),
            2,
        ).alias("mean_words_retained"),
    ).orderBy("threshold")


def _yield_oracle() -> str:
    z = f"""{_QL_W["bias"]}
            + {_QL_W["n_words"]} * len({_WORDS})
            + {_QL_W["sw_ratio"]} * ({_sw_hits(_WORDS, EN_STOPWORDS)} * 1.0
                                     / len({_WORDS}))
            + ({_QL_W["punct"]}) * (length(regexp_replace(text,
                    '[^.,!?;:]', '', 'g')) * 1.0 / length(text))"""
    return f"""
    WITH per AS (
        SELECT least(CAST(floor(round(1.0 / (1.0 + exp(-({z}))), 6)
                                * {YIELD_BINS}) AS INTEGER),
                     {YIELD_BINS - 1}) AS b,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS tok,
               CAST(len({_WORDS}) AS BIGINT) AS w
        FROM documents
    ),
    buckets AS (
        SELECT b, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(tok) AS BIGINT) AS toks,
               CAST(sum(w) AS BIGINT) AS words
        FROM per GROUP BY 1
    ),
    grid AS (SELECT unnest(range(0, {YIELD_BINS})) AS k),
    joined AS (
        SELECT k, sum(n) AS n_retained, sum(toks) AS tok_retained,
               sum(words) AS w_retained
        FROM grid LEFT JOIN buckets ON b >= k
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS nt,
               CAST(sum(tok) AS BIGINT) AS tt
        FROM per
    )
    SELECT round(k / {float(YIELD_BINS)}, 2) AS threshold,
           CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
           round(coalesce(n_retained, 0) * 1.0 / nt, 4) AS doc_share,
           round(coalesce(tok_retained, 0) * 1.0 / tt, 4) AS token_share,
           round(coalesce(w_retained, 0)
                 / nullif(CAST(coalesce(n_retained, 0) AS DOUBLE), 0.0),
                 2) AS mean_words_retained
    FROM joined, tot
    ORDER BY threshold
"""


ORACLES["quality_yield_curve"] = _yield_oracle()
QUERIES["quality_yield_curve"] = quality_yield_curve


BURROWS_TOP_WORDS = 30


def burrows_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between document SOURCES —
    the classic authorship-attribution measure: z-score each source's
    relative frequency of the corpus's top-30 words against the
    across-source distribution, Delta = mean |z difference| over the
    word panel; the 10 closest (most stylistically similar) source
    pairs are reported.  The provenance-forensics companion of
    yule_richness_sources (which profiles one source at a time; Delta
    compares them).

    Determinism: the word panel is an exact-count TakeOrderedAndProject
    pick (count desc, word asc); per-(source, word) relative
    frequencies are one exact division pico-rounded to 1e-9 decimals,
    so the across-source moments fold exactly; z and Delta are float
    expressions of those decimals, 4dp-rounded, pair-name tie-broken.

    Scale: ONE shuffle of the exploded token stream on (source, word);
    everything after runs on the (n_sources x 30) panel.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    # ONE explode pass: totals, the word panel, and the per-(source,
    # word) counts all fold from the same (source, word) count frame —
    # un-factored, each of the three ran its own pass over the exploded
    # token stream (measured r11: 86-Exchange plan). wcount is
    # vocabulary-x-sources bounded, so the lineage cut is cheap.
    wcount = (
        words.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c0"))
        .localCheckpoint(eager=True)
    )
    totals = wcount.groupBy("source").agg(
        F.sum("c0").cast("bigint").alias("nw")
    )
    top = (
        wcount.groupBy("w")
        .agg(F.sum("c0").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(BURROWS_TOP_WORDS)
        .select("w")
    )
    sw = (
        wcount.join(F.broadcast(top), "w")
        .select("source", "w", F.col("c0").alias("c"))
        .join(totals, "source")
    )
    # dense panel: absent (source, word) cells are true zeros
    grid = totals.crossJoin(F.broadcast(top))
    panel = grid.join(sw.select("source", "w", "c"), ["source", "w"], "left").select(
        "source",
        "w",
        "nw",
        F.round(
            F.coalesce(F.col("c"), F.lit(0)).cast("double")
            / F.col("nw").cast("double"),
            9,
        )
        # decimal(18,9), NOT (38,9): f*f at (38,9) needs precision 77,
        # so Spark truncates the product's scale while DuckDB does not —
        # (18,9)^2 -> (37,18) stays exact in BOTH engines
        .cast("decimal(18,9)")
        .alias("f"),
    )
    # widths chosen so every decimal product stays within precision 38
    # in BOTH engines (Spark silently truncates scale past 38; DuckDB
    # does not — the 0.7998-vs-0.7999 class): ns(4,0) x f(18,9) = (23,9),
    # ns x sff(20,12) = (25,12), sf(18,9)^2 = (37,18)
    mom = panel.groupBy("w").agg(
        F.count(F.lit(1)).cast("decimal(4,0)").alias("ns"),
        F.sum("f").cast("decimal(18,9)").alias("sf"),
        F.sum(F.col("f") * F.col("f")).cast("decimal(20,12)").alias("sff"),
    )
    z = panel.join(F.broadcast(mom), "w").select(
        "source",
        "w",
        # z = (f - mu)/sd n-scaled: (ns*f - sf) / sqrt(ns*(ns*sff - sf^2)
        # / (ns - 1)) — sample sd across sources; pico-rounded to an
        # exact decimal so the pair fold below is addition-order
        # independent (a float avg flipped the top-10 boundary between
        # engines on first run)
        F.round(
            (F.col("ns") * F.col("f") - F.col("sf")).cast("double")
            / F.sqrt(
                (
                    F.col("ns") * F.col("sff") - F.col("sf") * F.col("sf")
                ).cast("double")
                * F.col("ns").cast("double")
                / (F.col("ns") - 1).cast("double")
            ),
            9,
        )
        .cast("decimal(38,9)")
        .alias("z"),
    )
    a = z.select(
        F.col("source").alias("src_a"), "w", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"), "w", F.col("z").alias("zb")
    )
    pairs = (
        a.join(b, "w")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.abs(F.col("za") - F.col("zb"))).alias("sd_abs"),
            F.count(F.lit(1)).alias("nw"),
        )
    )
    # every pair spans the full word panel (nw constant), so the EXACT
    # decimal |z|-difference sum is a rank key with no float ambiguity
    return (
        pairs.select(
            "src_a",
            "src_b",
            F.round(
                F.col("sd_abs").cast("double") / F.col("nw").cast("double"),
                4,
            ).alias("delta"),
            F.col("sd_abs").alias("_k"),
        )
        .orderBy(F.col("_k").asc(), "src_a", "src_b")
        .limit(10)
        .drop("_k")
    )


ORACLES["burrows_delta_sources"] = f"""
    WITH words AS (
        SELECT source, w
        FROM (SELECT source,
                     unnest(regexp_split_to_array(trim(lower(text)),
                                                  '\\s+')) AS w
              FROM documents)
        WHERE w != ''
    ),
    totals AS (
        SELECT source, CAST(count(*) AS BIGINT) AS nw FROM words GROUP BY 1
    ),
    top AS (
        SELECT w FROM (
            SELECT w, count(*) AS c FROM words GROUP BY 1
            ORDER BY c DESC, w ASC LIMIT {BURROWS_TOP_WORDS}
        )
    ),
    sw AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c
        FROM words JOIN top USING (w)
        GROUP BY 1, 2
    ),
    panel AS (
        SELECT t.source, g.w, t.nw,
               CAST(round(coalesce(s.c, 0) * 1.0 / t.nw, 9)
                    AS DECIMAL(18,9)) AS f
        FROM totals t CROSS JOIN top g
        LEFT JOIN sw s ON s.source = t.source AND s.w = g.w
    ),
    mom AS (
        SELECT w, CAST(count(*) AS DECIMAL(4,0)) AS ns,
               CAST(sum(f) AS DECIMAL(18,9)) AS sf,
               CAST(sum(f * f) AS DECIMAL(20,12)) AS sff
        FROM panel GROUP BY 1
    ),
    z AS (
        SELECT p.source, p.w,
               CAST(round(CAST(ns * f - sf AS DOUBLE)
                    / sqrt(CAST(ns * sff - sf * sf AS DOUBLE)
                           * CAST(ns AS DOUBLE) / CAST(ns - 1 AS DOUBLE)),
                    9) AS DECIMAL(38,9)) AS z
        FROM panel p JOIN mom USING (w)
    ),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               sum(abs(a.z - b.z)) AS sd_abs,
               CAST(count(*) AS BIGINT) AS nw
        FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           round(CAST(sd_abs AS DOUBLE) / nw, 4) AS delta
    FROM pairs
    ORDER BY sd_abs ASC, src_a, src_b
    LIMIT 10
"""
QUERIES["burrows_delta_sources"] = burrows_delta_sources
