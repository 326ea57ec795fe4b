"""Training-data pipeline operators: quality filters, chunking, cluster dedup,
embedding quantization, time-series gap-fill.

These extend the LLM-data tier (operators/dedup.py, text_analysis.py,
similarity.py) with the remaining operations a large-scale corpus pipeline
needs. All are [DRIVER]-mandated surface — the reference has no text or
vector processing at all (SURVEY.md §2.B). Heuristics follow the published
Gopher (Rae et al. 2021, §A1.1) and C4 (Raffel et al. 2020) filtering rules,
re-expressed as pure Spark SQL expressions (no UDFs anywhere in this module).

Scale themes:
- repetition metrics use one explode→two-level aggregation (per-(doc,ngram)
  then per-doc), the shape that survives 100 TB because the shuffle key is
  (doc_id, ngram) — high cardinality, no skew;
- connected-components runs label propagation with one shuffle per round and
  a localCheckpoint to cut lineage — O(diameter) rounds, the standard
  alternative to a driver-side union-find that would not distribute;
- quantization/normalization stay inside JVM array expressions
  (transform/aggregate), never per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.texts import EN_STOPWORDS, md5_hash_long
from ..sources.tables import exploded_shingles, fan_out, load_table
from . import dedup as _dedup
from .text_analysis import _WORDS as _TA_WORDS
from .text_analysis import _sw_hits as _ta_sw_hits

_TA_SW_HITS = _ta_sw_hits(_TA_WORDS, EN_STOPWORDS)

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24
CC_MAX_ITERS = 25
DECON_SHINGLE_N = 4  # word n-gram size for benchmark-overlap detection
DECON_EVAL_MOD = 97  # doc_id % MOD == 0 -> held-out "benchmark" doc


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fan_out(load_table(spark, sf_dir, "documents"))


# --- Gopher-style repetition / quality metrics -------------------------------


def gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics + keep flag (Gopher §A1.1 shape):
    type-token ratio, top-bigram coverage, duplicate-trigram fraction.

    The testdata documents are single-line (FIXTURES.md), so the line-level
    Gopher rules don't apply; the word-n-gram rules are the ones computed.

    Scale: unigram/trigram stats are array expressions (no shuffle); only
    the top-bigram mode needs an explode + (doc_id, bigram) aggregation —
    high-cardinality key, skew-free. The keep flag compares UNROUNDED
    ratios so the boolean can't flip at a rounding boundary between
    engines; displayed ratios are rounded separately.
    """
    base = _docs(spark, sf_dir).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
    )
    stats = base.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.when(
            F.size("w") > 1,
            F.expr("transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))"),
        )
        .otherwise(F.expr("array()"))
        .alias("bgs"),
        F.when(
            F.size("w") > 2,
            F.expr(
                "transform(sequence(1, size(w) - 2),"
                " i -> concat(w[i-1], ' ', w[i], ' ', w[i+1]))"
            ),
        )
        .otherwise(F.expr("array()"))
        .alias("tgs"),
    )
    top = (
        stats.select("doc_id", F.explode("bgs").alias("bg"))
        .groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_cnt"), F.sum("count").alias("n_bg"))
    )
    ttr = F.col("n_distinct") / F.col("n_words")
    top_frac = F.col("top_cnt") / F.col("n_bg")
    dup_tg = 1 - F.size(F.array_distinct("tgs")) / F.greatest(
        F.size("tgs"), F.lit(1)
    )
    keep = (
        (F.col("n_words") >= 10)
        & (F.col("n_words") <= 1000)
        & (ttr > 0.2)
        & (F.coalesce(top_frac, F.lit(0.0)) < 0.2)
    )
    return (
        stats.join(top, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.round(ttr, 4).alias("ttr"),
            F.round(F.coalesce(top_frac, F.lit(0.0)), 4).alias("top_bigram_frac"),
            F.round(dup_tg, 4).alias("dup_trigram_frac"),
            keep.alias("keep"),
        )
    )


# --- sliding-window document chunking ----------------------------------------


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping token windows (32 tokens,
    stride 24) — the standard pre-tokenization chunking pass.

    Scale: pure narrow transformation (split → sequence → explode → slice);
    no shuffle at all, so it pipelines with the parquet scan and scales
    linearly with input bytes. Chunk count per doc is bounded by
    ceil(n_words / stride).
    """
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("w"))
        .select(
            "doc_id",
            F.col("w"),
            F.explode(
                F.expr(f"sequence(1, size(w), {CHUNK_STRIDE})")
            ).alias("start"),
        )
        # stop once a window reaches the end: emit a start only if the
        # previous window did not already cover the last word (else the
        # tail spawns several redundant overlapping fragments)
        .filter(
            (F.col("start") == 1)
            | (F.col("start") <= F.size("w") - CHUNK_TOKENS + CHUNK_STRIDE)
        )
        .select(
            "doc_id",
            F.expr(f"CAST((start - 1) DIV {CHUNK_STRIDE} AS BIGINT)").alias(
                "chunk_idx"
            ),
            F.expr(f"slice(w, start, {CHUNK_TOKENS})").alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").cast("bigint").alias("n_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


# --- connected-components dedup clusters -------------------------------------


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group near-duplicate documents into clusters: connected components
    over the MinHash/LSH verified pair graph, labels = min doc_id reachable.

    Implementation is distributed label propagation with pointer-doubling
    shortcuts (see ``connected_components``): every round each node takes
    the min label among itself and its neighbors, then follows its label
    one hop (L(v) <- L(L(v))), so rounds grow O(log diameter) instead of
    O(diameter). Each round is a join on node + an aggregation + the
    shortcut self-join; `localCheckpoint` truncates the growing lineage so
    round N's plan doesn't replay rounds 1..N-1. Convergence is detected
    via the (monotonically decreasing) sum of labels — one scalar action
    per round, no full-frame comparison.

    A driver-side union-find over collect()ed pairs would be simpler but
    caps at driver memory; this formulation never materializes the graph
    on one machine.

    The per-round join/agg strategy is chosen from the MEASURED edge count
    (the count is free — edges are already checkpointed). AQE makes the
    same runtime decisions within one query, but each round here is a
    separate job rooted at a checkpointed RDD, so stats don't flow across
    rounds on their own: a small graph would otherwise pay
    ``spark.sql.shuffle.partitions`` sort-merge tasks per round for a few
    hundred rows. Small graph → broadcast the edges (no shuffle in the
    join) and a handful of agg partitions; huge graph → same code with
    shuffle joins and edge-count-proportional partitions.
    """
    pairs = _dedup.minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    labels, _ = connected_components(spark, pairs)
    return labels.select(
        F.col("label").cast("bigint").alias("cluster_id"),
        F.col("node").cast("bigint").alias("doc_id"),
    )


def connected_components(
    spark: SparkSession, pairs: DataFrame, max_iters: int = CC_MAX_ITERS
) -> tuple[DataFrame, int]:
    """Distributed connected components over an undirected pair list
    (columns ``doc_a``, ``doc_b``); returns (labels(node,label), rounds).

    Each round combines (1) neighbor-min label propagation with (2) a
    pointer-doubling shortcut ``L(v) <- L(L(v))`` (Shiloach-Vishkin style;
    every label is itself a node id, so the shortcut is a self-join).
    Propagation alone needs O(component diameter) rounds — a 1M-node path
    graph would run a million shuffles; the shortcut halves the remaining
    pointer depth every round, bounding rounds at O(log diameter)
    (tests/test_pipeline_ops.py pins <= ceil(log2 n)+1 on a path fixture
    vs n-1 without it — VERDICT r2 #4).

    Convergence is detected via the monotonically decreasing label sum —
    one scalar action per round, no full-frame comparison; both the
    propagate and shortcut steps only ever lower labels, so the sum is a
    valid fixpoint witness.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    # ~2M edges per reduce partition, floor 2 — at 100 TB this grows into
    # the thousands; at bench scale it stays tiny so a round is ~2 tasks.
    n_part = int(max(2, min(2000, n_edges // 2_000_000 + 1)))
    join_edges = F.broadcast(edges) if n_edges <= 5_000_000 else edges
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    rounds = 0
    try:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .localCheckpoint(eager=True)
        )
        prev_sum = labels.agg(F.sum("label")).collect()[0][0]
        for _ in range(max_iters):
            rounds += 1
            neighbor_min = (
                labels.join(join_edges, F.col("node") == F.col("src"))
                .select(F.col("dst").alias("node"), "label")
                .union(labels)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
            # pointer doubling: follow the label one hop (labels are node
            # ids, and min() keeps them so) — L(v) <- min(L(v), L(L(v)))
            parent = neighbor_min.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            shortcut = (
                neighbor_min.join(
                    parent, neighbor_min.label == parent.p_node, "left"
                )
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("p_label", "label")
                    ).alias("label"),
                )
            )
            labels = shortcut.localCheckpoint(eager=True)
            cur_sum = labels.agg(F.sum("label")).collect()[0][0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return labels, rounds


def dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: for every near-dup cluster, keep the
    highest-quality member — the step that actually SHRINKS a training
    corpus after clustering (near-dup graph -> connected components ->
    quality-ranked keeper per component).

    Keeper rule: max quality_score (text_analysis.text_quality, already
    deterministic at 4 decimals), ties to the lowest doc_id.  Output per
    cluster: keeper id, member count, best/worst quality — the summary a
    pipeline logs when it drops n_docs - 1 members per cluster.

    Scale: reuses dedup_clusters' distributed label propagation (never
    materializes the graph on one machine) and the narrow quality pass;
    the ranking is one window partitioned by cluster_id — shuffle keyed on
    cluster cardinality, not corpus size.
    """
    from .text_analysis import text_quality

    clusters = dedup_clusters(spark, sf_dir)
    q = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    j = clusters.join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .groupBy("cluster_id")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.max("quality_score"), 4).alias("best_quality"),
            F.round(F.min("quality_score"), 4).alias("worst_quality"),
        )
    )


# --- benchmark decontamination ------------------------------------------------


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: find training documents sharing any word
    4-gram with a held-out eval set (here: doc_id % 97 == 0 stands in for
    the benchmark corpus). Standard LLM corpus-prep step (cf. GPT-3 §C /
    Gopher §A.3 n-gram overlap filtering): any training doc overlapping an
    eval doc leaks the benchmark, so it is reported (and dropped by
    ``decontaminated_corpus``) with the count of distinct shared shingles.

    Scale: the eval side is small and fixed, so its distinct-shingle set
    broadcasts and the 100-TB training side streams through a broadcast
    hash join — no shuffle of the corpus, one narrow explode + one
    aggregation keyed by doc_id. For an eval set too large to broadcast
    exactly, a broadcast Bloom filter of eval shingles (operators/
    sketches.py machinery) gives the same plan with a verify pass.
    """
    # filter each side BEFORE the Arrow shingle kernel (r11): doc_id
    # passes through the kernel unchanged, but Spark cannot push a filter
    # below an opaque mapInPandas, so filtering the exploded frame ran the
    # full-corpus Python pass TWICE (once per side, py4 plan).  Split
    # first: 1/97 + 96/97 corpus passes instead of 2.0.  Same rows out.
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    ev = (
        exploded_shingles(docs.filter(is_eval), DECON_SHINGLE_N)
        .select("s")
        .distinct()
    )
    train = exploded_shingles(docs.filter(~is_eval), DECON_SHINGLE_N)
    return (
        train.join(F.broadcast(ev), "s")
        # word_shingles is per-doc distinct, so count(*) == distinct shingles
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
        )
    )


def decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training corpus with eval docs and contaminated docs removed —
    the downstream input a training run would consume. Anti joins broadcast
    the (small) contaminated-id list."""
    d = _docs(spark, sf_dir).filter(~(F.col("doc_id") % DECON_EVAL_MOD == 0))
    bad = decontaminate(spark, sf_dir).select("doc_id")
    return d.join(F.broadcast(bad), "doc_id", "left_anti")


# --- embedding normalization + int8 quantization -----------------------------


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm + symmetric int8 quantization (q = trunc(x·127/max|x|)) per
    embedding — the storage-compression pass before ANN indexing.

    Truncation toward zero (not round) is used deliberately: Spark's
    double→int cast truncates while DuckDB's rounds, so the portable
    formulation is sign(x)·floor(|x·127/scale|) in both engines.

    Scale: everything is a JVM array expression over one narrow pass —
    no shuffle, no UDF, vectorizable by codegen.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    return e.select(
        "vec_id",
        F.size("v").cast("bigint").alias("dim"),
        F.round(
            F.expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))"), 4
        ).alias("l2_norm"),
        F.round(F.expr("array_max(transform(v, x -> abs(x)))"), 6).alias("q_scale"),
        # comma-joined STRING, not array<int>: harnesses that canonicalize
        # via pandas sorting can't hash raw array cells (same contract fix
        # as array_agg_sorted); the int8 codes themselves are unchanged
        F.expr(
            "array_join(transform(v, x -> CAST(IF(x >= 0,"
            " floor(x * 127 / array_max(transform(v, y -> abs(y)))),"
            " -floor(-x * 127 / array_max(transform(v, y -> abs(y))))) AS INT)), ',')"
        ).alias("quant"),
    )


# --- cluster-balanced (diversity) sampling -----------------------------------

CBS_TARGET = 40  # target sample size per embedding cluster


def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling over the embedding space: k-means-cluster the
    corpus, then sample each cluster down to ~CBS_TARGET vectors with a
    deterministic hash threshold (keep iff u * n_cluster < target, i.e.
    p = min(1, target/n)) — the curation step that stops a crawl's dominant
    mode from swamping the training mix, reported per cluster with the
    realized Horvitz-Thompson weight.

    Scale: cluster sizes are k rows (broadcast); membership is decided
    per-row from the hash — no shuffle beyond kmeans_relabel's own and the
    k-row summary agg. Fully deterministic: same corpus -> same sample on
    any cluster size, any run.
    """
    from . import similarity as _sim

    # materialize the (vec_id, label) assignment once: both the size
    # aggregate and the keep filter consume it, each otherwise re-running
    # the whole Lloyd chain (r11: 68-Exchange plan, 2x the k-means work)
    e = _sim.kmeans_relabel(_sim._embeddings(spark, sf_dir)).select(
        "vec_id", "label"
    ).localCheckpoint(eager=True)
    sizes = e.groupBy("label").agg(F.count("*").alias("n_cluster"))
    u = md5_hash_long(F.col("vec_id").cast("string"), "cbs") / F.lit(2.0**32)
    kept = (
        e.join(F.broadcast(sizes), "label")
        .withColumn("u", u)
        .filter(F.col("u") * F.col("n_cluster") < F.lit(float(CBS_TARGET)))
        .groupBy("label")
        .agg(F.count("*").alias("n_kept"))
    )
    return sizes.join(kept, "label").select(
        F.col("label").cast("int").alias("cluster_id"),
        F.col("n_cluster").cast("bigint").alias("n_cluster"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.round(
            F.least(F.lit(1.0), F.lit(float(CBS_TARGET)) / F.col("n_cluster")), 4
        ).alias("sample_rate"),
        F.round(F.col("n_cluster") / F.col("n_kept"), 4).alias("ht_weight"),
    )


# --- deterministic stratified sampling ---------------------------------------

SAMPLE_BUCKETS = 256
SAMPLE_KEEP = 51  # ~20%


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) stratum: deterministic ~20% document sample via an
    md5(doc_id) bucket threshold, with Horvitz-Thompson scale-up of total
    chars. Hash-threshold sampling is reproducible across engines, runs,
    and cluster sizes (TABLESAMPLE is partition-dependent), and the sample
    membership is computable per-row with no shuffle — the stratum
    aggregation is the only exchange.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2),
        16,
        10,
    ).cast("int")
    sel = bucket < SAMPLE_KEEP
    scale = F.lit(SAMPLE_BUCKETS) / F.lit(SAMPLE_KEEP)
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_pop"),
        F.sum(F.when(sel, 1).otherwise(0)).cast("bigint").alias("n_sample"),
        F.round(F.avg(F.when(sel, F.col("n_chars"))), 2).alias("sample_mean_chars"),
        F.round(F.sum(F.when(sel, F.col("n_chars")).otherwise(0)) * scale, 2).alias(
            "est_total_chars"
        ),
    )


# --- time-series gap fill ----------------------------------------------------


def gapfill_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily event value with calendar gap-fill: every day in the
    user's [first, last] activity span appears, missing days carry zero and
    a `filled` flag, plus the running cumulative value.

    Scale: the calendar is generated per user from the aggregated span (a
    tiny frame), exploded, and joined back on (user_id, day) — both sides
    hash-partition on user_id so the join colocates with the cumulative
    window that follows; no global sort. Day values are rounded BEFORE the
    cumulative sum so both engines accumulate identical doubles in
    identical (day) order.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.round(F.sum("value"), 2).alias("day_value"),
        F.count("*").alias("n_events"),
    )
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, INTERVAL 1 DAY)")).alias("day"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        cal.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.col("day_value").isNull().alias("filled"),
            F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        )
        .withColumn("cum_value", F.round(F.sum("day_value").over(w), 2))
    )


# --- PII scrubbing -----------------------------------------------------------

# Java regex and DuckDB RE2 agree on this subset (char classes, +, {m,},
# alternation) — keep patterns inside it.
PII_URL = r"https?://[^\s]+"
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9-]{7,}[0-9]"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (C4-style cleaning pass): URL → <URL>,
    email → <EMAIL>, phone → <PHONE>, with per-doc match counts.

    The synthetic corpus contains no organic PII, so — as with the
    multimodal tier's fake media — deterministic PII is synthesized onto
    each document first (email/phone/url derived from doc_id); the scrub
    then provably finds and removes it, and the redacted text hash-checks
    against the oracle. Redaction order URL → EMAIL → PHONE is fixed so
    both engines resolve overlaps identically.

    Scale: pure narrow select — regex evaluation pipelines with the scan,
    no shuffle, no UDF.
    """
    d = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("-0199 see https://docs.example.com/d/"),
        F.col("doc_id"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(synth, PII_URL, "<URL>"), PII_EMAIL, "<EMAIL>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return d.select("doc_id", scrubbed.alias("clean_text")).select(
        "doc_id",
        "clean_text",
        (F.size(F.split("clean_text", "<URL>", -1)) - 1)
        .cast("bigint")
        .alias("n_urls_redacted"),
        (F.size(F.split("clean_text", "<EMAIL>", -1)) - 1)
        .cast("bigint")
        .alias("n_emails_redacted"),
        (F.size(F.split("clean_text", "<PHONE>", -1)) - 1)
        .cast("bigint")
        .alias("n_phones_redacted"),
    )


# --- deterministic train/val/test split --------------------------------------

SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # test gets the remainder


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test by hashed-id bucket
    (80/10/10). Hash-bucket assignment is the production pattern: stable
    under reruns, cluster resizes, and incremental arrivals (a new doc
    never moves an old one between splits), unlike randomSplit which is
    partition-dependent.

    Scale: per-row hash, no shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = (md5_hash_long(F.col("doc_id").cast("string"), "split") % 100).cast(
        "int"
    )
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return d.select("doc_id", bucket.alias("bucket"), split.alias("split"))


# --- weighted priority sampling ----------------------------------------------

PRIORITY_K = 64


def priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of documents by priority sampling (Duffield, Lund &
    Thorup): priority = weight / u with u uniform from the hashed id; the k
    highest-priority items form a sample where inclusion probability is
    proportional to weight, and tau (the (k+1)-th priority) gives the
    Horvitz-Thompson estimator weight max(w, tau). The training-data use:
    quality-weighted corpus subsampling that is reproducible run to run.

    Chosen over Efraimidis-Spirakis (u^(1/w) keys) deliberately: w/u is a
    single IEEE-exact division, so ranking is bit-identical across engines,
    while pow() may differ in the last ulp between libm implementations.

    Scale: per-row hash + a global top-(k+1) — TakeOrderedAndProject, no
    global sort; weights and priorities never shuffle more than k+1 rows.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("double").alias("w")
    )
    u = (md5_hash_long(F.col("doc_id").cast("string"), "ps") + 1) / F.lit(
        2.0**32
    )
    pri = d.select("doc_id", "w", (F.col("w") / u).alias("priority"))
    topk1 = pri.orderBy(F.col("priority").desc(), F.col("doc_id")).limit(
        PRIORITY_K + 1
    )
    tau = topk1.agg(F.min("priority").alias("tau"))
    return (
        topk1.crossJoin(F.broadcast(tau))
        .filter(F.col("priority") > F.col("tau"))
        .select(
            "doc_id",
            "w",
            F.round("priority", 4).alias("priority"),
            F.round(F.greatest("w", "tau"), 4).alias("ht_weight"),
        )
    )


MIX_ALPHA = 0.3  # sampling temperature (the multilingual-mixing exponent)


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixing weights: per-source token counts scaled by the
    sampling-temperature exponent ``alpha`` and normalized — the
    p_s ∝ n_s^alpha upweighting of small sources used by public
    multilingual / multi-corpus training recipes (alpha < 1 flattens the
    source distribution; alpha=1 is proportional sampling).

    Scale: one source-keyed aggregate over the corpus (map-side combine),
    then a 1-row broadcast of the normalizer — source cardinality frames
    only; the corpus is scanned once.
    """
    from ..functions.texts import n_tokens_ws

    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(n_tokens_ws(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    scaled = per_src.withColumn(
        "scaled", F.pow(F.col("n_tokens").cast("double"), F.lit(MIX_ALPHA))
    )
    z = scaled.agg(
        F.sum("scaled").alias("z"),
        F.sum("n_tokens").cast("bigint").alias("tot_tokens"),
    )
    return (
        scaled.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("scaled") / F.col("z"), 6).alias("mix_weight"),
            F.round(
                (F.col("scaled") / F.col("z"))
                / (F.col("n_tokens") / F.col("tot_tokens")),
                4,
            ).alias("upweight_vs_proportional"),
        )
    )


DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., DSIR): score
    every document by the log-likelihood ratio of a hashed-unigram bag
    model fit on the TARGET slice (lang = 'en') vs the RAW corpus —
    logw(doc) = Σ_w [log2 p_target(h(w)) - log2 p_raw(h(w))] with
    add-one smoothing over DSIR_BUCKETS hashed feature buckets. Docs with
    positive logw look more target-like than the corpus average and get
    upweighted when resampling a pretraining mixture.

    Determinism: per-bucket log-ratios are rounded to 1e-6 micro-units and
    carried as INTEGERS through the per-doc sum (tf x contrib), so the
    order-sensitive double addition never crosses engines (same trick as
    bm25_topk).

    Scale: one token explode reduced to (doc, bucket) tf cells keyed by
    doc; the bucket model is a DSIR_BUCKETS-row frame (broadcast); the
    final per-doc aggregate is map-side combinable. The corpus is scanned
    once; nothing global beyond the 1024-row model.
    """
    from ..functions.texts import words

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tb = fan_out(d).select(
        "doc_id",
        "lang",
        F.explode(words(F.col("text"))).alias("w"),
    ).select(
        "doc_id",
        "lang",
        (md5_hash_long(F.col("w")) % DSIR_BUCKETS).alias("b"),
    )
    tf = tb.groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    raw = tb.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("cr"))
    tgt = (
        tb.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("double").alias("ct"))
    )
    totals = tb.agg(
        F.count(F.lit(1)).cast("double").alias("nr"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).cast("double").alias("nt"),
    )
    model = (
        raw.join(tgt, "b", "left")
        .na.fill({"ct": 0.0})
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                (
                    F.log2((F.col("ct") + 1.0) / (F.col("nt") + DSIR_BUCKETS))
                    - F.log2((F.col("cr") + 1.0) / (F.col("nr") + DSIR_BUCKETS))
                )
                * 1000000.0
            ).cast("long").alias("contrib"),
        )
    )
    per_doc = (
        tf.join(F.broadcast(model), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("contrib")).cast("bigint").alias("micro"),
        )
    )
    return per_doc.select(
        "doc_id",
        "lang",
        "n_tokens",
        (F.col("micro") / 1000000.0).alias("logw_bits"),
        (F.col("micro") > 0).alias("target_like"),
    )


QUERIES = {
    "gopher_repetition": gopher_repetition,
    "doc_chunks": doc_chunks,
    "decontaminate": decontaminate,
    "cluster_balanced_sample": cluster_balanced_sample,
    "dedup_clusters": dedup_clusters,
    "dedup_keepers": dedup_keepers,
    "embedding_quantize": embedding_quantize,
    "stratified_sample": stratified_sample,
    "gapfill_daily_value": gapfill_daily_value,
    "pii_scrub": pii_scrub,
    "dataset_split": dataset_split,
    "priority_sample": priority_sample,
    "mixture_weights": mixture_weights,
    "dsir_importance_weights": dsir_importance_weights,
}

def _cbs_oracle() -> str:
    from .similarity import _kmeans_ctes

    h = "CAST('0x' || substr(md5('cbs' || r.vec_id::VARCHAR), 1, 8) AS BIGINT)"
    return f"""
        WITH {_kmeans_ctes()},
        sizes AS (SELECT label, count(*) AS n_cluster FROM relab GROUP BY label),
        kept AS (
            SELECT r.label, count(*) AS n_kept
            FROM relab r JOIN sizes s ON r.label = s.label
            WHERE ({h} / {2.0**32}) * s.n_cluster < {float(CBS_TARGET)}
            GROUP BY r.label
        )
        SELECT CAST(s.label AS INT) AS cluster_id,
               CAST(s.n_cluster AS BIGINT) AS n_cluster,
               CAST(k.n_kept AS BIGINT) AS n_kept,
               round(least(1.0, {float(CBS_TARGET)} / s.n_cluster), 4)
                   AS sample_rate,
               round(s.n_cluster * 1.0 / k.n_kept, 4) AS ht_weight
        FROM sizes s JOIN kept k ON s.label = k.label
    """


ORACLES = {
    "cluster_balanced_sample": _cbs_oracle(),
    "decontaminate": f"""
        WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
                   FROM documents),
        sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - {DECON_SHINGLE_N - 1}, 0)),
                   i -> array_to_string(w[i:i+{DECON_SHINGLE_N - 1}], ' ')))) AS s
               FROM w),
        ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % {DECON_EVAL_MOD} = 0)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM sh
        WHERE doc_id % {DECON_EVAL_MOD} <> 0 AND s IN (SELECT s FROM ev)
        GROUP BY doc_id
    """,
    "gopher_repetition": """
        WITH base AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
          FROM documents),
        stats AS (
          SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct,
                 list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                i -> w[i] || ' ' || w[i+1]) AS bgs,
                 list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS tgs
          FROM base),
        top AS (
          SELECT doc_id, max(c) AS top_cnt, sum(c) AS n_bg
          FROM (SELECT doc_id, bg, count(*) AS c
                FROM (SELECT doc_id, unnest(bgs) AS bg FROM stats) t
                GROUP BY doc_id, bg) g
          GROUP BY doc_id)
        SELECT s.doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               round(n_distinct * 1.0 / n_words, 4) AS ttr,
               round(coalesce(top_cnt * 1.0 / n_bg, 0.0), 4) AS top_bigram_frac,
               round(1 - len(list_distinct(tgs)) * 1.0 / greatest(len(tgs), 1), 4)
                 AS dup_trigram_frac,
               (n_words >= 10 AND n_words <= 1000
                AND n_distinct * 1.0 / n_words > 0.2
                AND coalesce(top_cnt * 1.0 / n_bg, 0.0) < 0.2) AS keep
        FROM stats s LEFT JOIN top t ON s.doc_id = t.doc_id
    """,
    "doc_chunks": f"""
        WITH base AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
          FROM documents),
        starts AS (
          SELECT doc_id, w, unnest(generate_series(1, len(w), {CHUNK_STRIDE})) AS s
          FROM base)
        SELECT doc_id,
               CAST((s - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(len(w[s:s+{CHUNK_TOKENS - 1}]) AS BIGINT) AS n_tokens,
               array_to_string(w[s:s+{CHUNK_TOKENS - 1}], ' ') AS chunk_text
        FROM starts
        WHERE s = 1 OR s <= len(w) - {CHUNK_TOKENS} + {CHUNK_STRIDE}
    """,
    "dedup_clusters": f"""
        WITH RECURSIVE pairs AS ({_dedup.ORACLES["minhash_near_dup"]}),
        nodes AS (SELECT DISTINCT doc_id FROM (
            SELECT doc_a AS doc_id FROM pairs
            UNION SELECT doc_b FROM pairs) t),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        cc(node, label) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT e.dst, c.label FROM cc c JOIN edges e ON c.node = e.src
            WHERE c.label < e.dst
        )
        SELECT CAST(min(label) AS BIGINT) AS cluster_id,
               CAST(node AS BIGINT) AS doc_id
        FROM cc GROUP BY node
    """,
    "dedup_keepers": f"""
        WITH RECURSIVE pairs AS ({_dedup.ORACLES["minhash_near_dup"]}),
        nodes AS (SELECT DISTINCT doc_id FROM (
            SELECT doc_a AS doc_id FROM pairs
            UNION SELECT doc_b FROM pairs) t),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        cc(node, label) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT e.dst, c.label FROM cc c JOIN edges e ON c.node = e.src
            WHERE c.label < e.dst
        ),
        clusters AS (
            SELECT CAST(min(label) AS BIGINT) AS cluster_id,
                   CAST(node AS BIGINT) AS doc_id
            FROM cc GROUP BY node
        ),
        q AS (
            SELECT doc_id,
                   round(least(len({_TA_WORDS}) / 50.0, 1.0) * 0.4
                         + least({_TA_SW_HITS} * 1.0 / len({_TA_WORDS}) * 5,
                                 1.0) * 0.4
                         + (1 - least(length(regexp_replace(text,
                                      '[^.,!?;:]', '', 'g'))
                                      * 1.0 / length(text) * 10, 1.0)) * 0.2,
                         4) AS quality_score
            FROM documents
        ),
        ranked AS (
            SELECT c.cluster_id, c.doc_id, q.quality_score,
                   row_number() OVER (PARTITION BY c.cluster_id
                                      ORDER BY q.quality_score DESC,
                                               c.doc_id ASC) AS rk
            FROM clusters c JOIN q ON c.doc_id = q.doc_id
        )
        SELECT cluster_id,
               CAST(min(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(max(quality_score), 4) AS best_quality,
               round(min(quality_score), 4) AS worst_quality
        FROM ranked GROUP BY cluster_id
    """,
    "embedding_quantize": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT vec_id,
               CAST(len(v) AS BIGINT) AS dim,
               round(sqrt(list_sum(list_transform(v, x -> x * x))), 4) AS l2_norm,
               round(list_max(list_transform(v, x -> abs(x))), 6) AS q_scale,
               array_to_string(list_transform(v, x -> CAST(
                 CASE WHEN x >= 0
                   THEN floor(x * 127 / list_max(list_transform(v, y -> abs(y))))
                   ELSE -floor(-x * 127 / list_max(list_transform(v, y -> abs(y))))
                 END AS INT)), ',') AS quant
        FROM e
    """,
    "stratified_sample": f"""
        SELECT lang, source,
               count(*) AS n_pop,
               CAST(sum(CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INT)
                                  < {SAMPLE_KEEP} THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
               round(avg(CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INT)
                                   < {SAMPLE_KEEP} THEN n_chars END), 2) AS sample_mean_chars,
               round(sum(CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INT)
                                   < {SAMPLE_KEEP} THEN n_chars ELSE 0 END)
                     * {SAMPLE_BUCKETS} / {SAMPLE_KEEP}.0, 2) AS est_total_chars
        FROM documents
        GROUP BY lang, source
    """,
    "gapfill_daily_value": """
        WITH daily AS (
          SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 round(sum(value), 2) AS day_value,
                 count(*) AS n_events
          FROM events GROUP BY 1, 2),
        span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
                 FROM daily GROUP BY 1),
        cal AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
                FROM span)
        SELECT c.user_id, c.day,
               d.day IS NULL AS filled,
               coalesce(day_value, 0.0) AS day_value,
               CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
               round(sum(coalesce(day_value, 0.0))
                     OVER (PARTITION BY c.user_id ORDER BY c.day), 2) AS cum_value
        FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
    """,
    "pii_scrub": f"""
        WITH synth AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id
                        || '@example.com or +1-555-'
                        || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                        || '-0199 see https://docs.example.com/d/' || doc_id
                       AS raw_text
            FROM documents
        ),
        clean AS (
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(raw_text, '{PII_URL}', '<URL>', 'g'),
                           '{PII_EMAIL}', '<EMAIL>', 'g'),
                       '{PII_PHONE}', '<PHONE>', 'g') AS clean_text
            FROM synth
        )
        SELECT doc_id, clean_text,
               CAST(len(string_split(clean_text, '<URL>')) - 1 AS BIGINT)
                   AS n_urls_redacted,
               CAST(len(string_split(clean_text, '<EMAIL>')) - 1 AS BIGINT)
                   AS n_emails_redacted,
               CAST(len(string_split(clean_text, '<PHONE>')) - 1 AS BIGINT)
                   AS n_phones_redacted
        FROM clean
    """,
    "dataset_split": f"""
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8)
                         AS BIGINT) % 100 AS INT) AS bucket,
               CASE WHEN CAST('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8)
                         AS BIGINT) % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN CAST('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8)
                         AS BIGINT) % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT}
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "priority_sample": f"""
        WITH pri AS (
            SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
                   CAST(n_chars AS DOUBLE)
                   / ((CAST('0x' || substr(md5('ps' || doc_id::VARCHAR), 1, 8)
                            AS BIGINT) + 1) / 4294967296.0) AS priority
            FROM documents
        ),
        topk1 AS (
            SELECT * FROM pri
            ORDER BY priority DESC, doc_id LIMIT {PRIORITY_K + 1}
        ),
        tau AS (SELECT min(priority) AS tau FROM topk1)
        SELECT doc_id, w, round(priority, 4) AS priority,
               round(greatest(w, tau), 4) AS ht_weight
        FROM topk1, tau
        WHERE priority > tau
    """,
}

ORACLES["mixture_weights"] = f"""
    WITH per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1
    ),
    sc AS (SELECT *, pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA}) AS scaled
           FROM per_src),
    z AS (SELECT sum(scaled) AS z, CAST(sum(n_tokens) AS BIGINT) AS tot
          FROM sc)
    SELECT source, n_docs, n_tokens,
           round(scaled / z.z, 6) AS mix_weight,
           round((scaled / z.z) / (n_tokens * 1.0 / z.tot), 4)
               AS upweight_vs_proportional
    FROM sc, z
"""

ORACLES["dsir_importance_weights"] = f"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5(unnest(
                   regexp_split_to_array(trim(text), '\\s+'))), 1, 8)
                   AS BIGINT) % {DSIR_BUCKETS} AS b
        FROM documents
    ),
    tf AS (
        SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY 1, 2, 3
    ),
    raw AS (SELECT b, CAST(count(*) AS DOUBLE) AS cr FROM toks GROUP BY 1),
    tgt AS (SELECT b, CAST(count(*) AS DOUBLE) AS ct FROM toks
            WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY 1),
    totals AS (
        SELECT CAST(count(*) AS DOUBLE) AS nr,
               CAST(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                             THEN 1 ELSE 0 END) AS DOUBLE) AS nt
        FROM toks
    ),
    model AS (
        SELECT r.b,
               CAST(round((log2((coalesce(t.ct, 0.0) + 1.0)
                                / (s.nt + {DSIR_BUCKETS}))
                           - log2((r.cr + 1.0) / (s.nr + {DSIR_BUCKETS})))
                          * 1000000.0) AS BIGINT) AS contrib
        FROM raw r LEFT JOIN tgt t ON r.b = t.b CROSS JOIN totals s
    )
    SELECT f.doc_id, f.lang,
           CAST(sum(f.tf) AS BIGINT) AS n_tokens,
           sum(f.tf * m.contrib) / 1000000.0 AS logw_bits,
           sum(f.tf * m.contrib) > 0 AS target_like
    FROM tf f JOIN model m ON f.b = m.b
    GROUP BY 1, 2
"""


def golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDM survivorship: collapse each exact-duplicate document cluster
    (same normalized text hash — the dedup_exact universe) into ONE
    golden record with per-attribute survival rules: smallest id wins
    identity, the longest raw text survives, the most frequent
    lang/source win with lexicographic tie-break, and lineage keeps the
    member count — the "merge" step every entity-resolution pipeline
    runs after clustering (dedup_exact/entity_resolution pick members;
    this builds the record).

    Scale: one cluster-keyed aggregation; the frequency-vote rules are
    (cluster, value)-counts reduced by max_by(struct) — two map-side-
    combined shuffles, no windows, no joins back to the fact table.
    """
    from ..functions.texts import normalized

    d = load_table(spark, sf_dir, "documents")
    c = d.select(
        F.md5(normalized(F.col("text"))).alias("cluster"),
        "doc_id",
        "lang",
        "source",
        "n_chars",
    )
    votes_lang = (
        c.groupBy("cluster", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("cluster")
        .agg(
            F.max_by(
                F.col("lang"), F.struct(F.col("n"), F.col("lang"))
            ).alias("golden_lang")
        )
    )
    votes_src = (
        c.groupBy("cluster", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("cluster")
        .agg(
            F.max_by(
                F.col("source"), F.struct(F.col("n"), F.col("source"))
            ).alias("golden_source")
        )
    )
    base = c.groupBy("cluster").agg(
        F.min("doc_id").cast("bigint").alias("golden_id"),
        F.max("n_chars").cast("bigint").alias("golden_n_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
    )
    return base.join(votes_lang, "cluster").join(votes_src, "cluster")


ORACLES["golden_record"] = """
    WITH c AS (
        SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                   AS cluster,
               doc_id, lang, source, n_chars
        FROM documents
    ),
    vl AS (
        SELECT cluster, lang AS golden_lang FROM (
            SELECT cluster, lang,
                   row_number() OVER (PARTITION BY cluster
                       ORDER BY count(*) DESC, lang DESC) AS rn
            FROM c GROUP BY cluster, lang) WHERE rn = 1
    ),
    vs AS (
        SELECT cluster, source AS golden_source FROM (
            SELECT cluster, source,
                   row_number() OVER (PARTITION BY cluster
                       ORDER BY count(*) DESC, source DESC) AS rn
            FROM c GROUP BY cluster, source) WHERE rn = 1
    ),
    base AS (
        SELECT cluster,
               CAST(min(doc_id) AS BIGINT) AS golden_id,
               CAST(max(n_chars) AS BIGINT) AS golden_n_chars,
               CAST(count(*) AS BIGINT) AS n_members
        FROM c GROUP BY cluster
    )
    SELECT b.cluster, b.golden_id, b.golden_n_chars, b.n_members,
           vl.golden_lang, vs.golden_source
    FROM base b JOIN vl ON b.cluster = vl.cluster
    JOIN vs ON b.cluster = vs.cluster
"""
QUERIES["golden_record"] = golden_record


# --- B-cubed cluster evaluation ----------------------------------------------


def bcubed_cluster_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998, the standard
    clustering-evaluation metric for dedup/coreference) of the MinHash
    near-dup clusters against exact-duplicate ground truth (md5 of
    normalized text): per item, precision = the fraction of its cluster
    sharing its class, recall = the fraction of its class sharing its
    cluster; averages over all documents.  Documents the LSH clustering
    leaves unpaired count as singleton clusters — exactly how a
    production dedup audit scores its pipeline.

    Scale: the metric reduces to the (cluster, class) contingency cells —
    one groupBy at cell cardinality plus two marginal aggs; per-cell
    contributions are n^2/size with exact-integer operands.
    """
    from ..functions.texts import normalized

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(normalized(F.col("text"))).alias("cls")
    )
    clusters = dedup_clusters(spark, sf_dir)
    asg = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        "cls",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cl"),
    )
    # materialize the contingency cells: three consumers (cs/ls/t) would
    # each re-expand the MinHash-cluster DAG + ground-truth join behind
    # asg (measured r11: 28 Exchanges / 10 SortMergeJoins in the
    # unmaterialized plan); bounded by distinct (cluster, class) pairs
    cell = (
        asg.groupBy("cl", "cls")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    cs = cell.groupBy("cl").agg(F.sum("n").alias("nc"))
    ls = cell.groupBy("cls").agg(F.sum("n").alias("nl"))
    t = (
        cell.join(cs, "cl")
        .join(ls, "cls")
        .agg(
            F.sum(F.col("n") * F.col("n") / F.col("nc")).alias("ps"),
            F.sum(F.col("n") * F.col("n") / F.col("nl")).alias("rs"),
            F.sum("n").alias("N"),
        )
    )
    p = F.col("ps") / F.col("N")
    r = F.col("rs") / F.col("N")
    return t.select(
        F.col("N").cast("bigint").alias("n_docs"),
        F.round(p, 6).alias("bcubed_precision"),
        F.round(r, 6).alias("bcubed_recall"),
        F.round(F.lit(2.0) * p * r / (p + r), 6).alias("bcubed_f1"),
    )


ORACLES["bcubed_cluster_eval"] = f"""
    WITH RECURSIVE pairs AS ({_dedup.ORACLES["minhash_near_dup"]}),
    nodes AS (SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION SELECT doc_b FROM pairs) t),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    cc(node, label) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT e.dst, c.label FROM cc c JOIN edges e ON c.node = e.src
        WHERE c.label < e.dst
    ),
    clusters AS (
        SELECT CAST(min(label) AS BIGINT) AS cluster_id,
               CAST(node AS BIGINT) AS doc_id
        FROM cc GROUP BY node
    ),
    docs AS (
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                   AS cls
        FROM documents
    ),
    asg AS (
        SELECT d.doc_id, d.cls,
               coalesce(c.cluster_id, d.doc_id) AS cl
        FROM docs d LEFT JOIN clusters c ON d.doc_id = c.doc_id
    ),
    cell AS (SELECT cl, cls, count(*) AS n FROM asg GROUP BY 1, 2),
    cs AS (SELECT cl, sum(n) AS nc FROM cell GROUP BY 1),
    ls AS (SELECT cls, sum(n) AS nl FROM cell GROUP BY 1),
    t AS (
        SELECT sum(cell.n * cell.n / cs.nc) AS ps,
               sum(cell.n * cell.n / ls.nl) AS rs,
               sum(cell.n) AS N
        FROM cell
        JOIN cs ON cell.cl = cs.cl
        JOIN ls ON cell.cls = ls.cls
    )
    SELECT CAST(N AS BIGINT) AS n_docs,
           round(ps / N, 6) AS bcubed_precision,
           round(rs / N, 6) AS bcubed_recall,
           round(2.0 * (ps / N) * (rs / N) / ((ps / N) + (rs / N)), 6)
               AS bcubed_f1
    FROM t
"""
QUERIES["bcubed_cluster_eval"] = bcubed_cluster_eval


# --- Neyman allocation --------------------------------------------------------

NEYMAN_BUDGET = 1_000


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal (Neyman) sample allocation across customer market-segment
    strata for a 1,000-unit survey budget: n_h proportional to
    N_h * sigma_h of account balance — next to stratified_sample's
    proportional allocation, this is the design that minimizes estimator
    variance for a fixed budget.

    Exactness: N_h * sigma_h = sqrt(N_h * Q_h - S_h^2) with all three
    moments exact decimal(38,0) integers, so both engines take sqrt of
    the identical double; the stratum fold is ORDER-PINNED; allocations
    use floor(x + 0.5) so the rounding rule is engine-independent.

    Scale: one map-side-combined groupBy to the stratum frame.
    """
    c = load_table(spark, sf_dir, "customer")
    dec = "decimal(38,0)"
    g = (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cv"),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_pop"),
            F.sum(F.col("cv").cast(dec)).alias("s"),
            F.sum(F.col("cv").cast(dec) * F.col("cv").cast(dec)).alias("q"),
        )
    )
    nsig = F.sqrt(
        (F.col("n_pop").cast(dec) * F.col("q") - F.col("s") * F.col("s")).cast(
            "double"
        )
    )
    wall = Window.partitionBy()
    wcum = wall.orderBy("segment").rowsBetween(Window.unboundedPreceding, 0)
    t = g.withColumn("nsig", nsig).withColumn("nsig_cum", F.sum("nsig").over(wcum))
    wfull = wall.orderBy("segment").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = t.withColumn("nsig_tot", F.max_by(F.col("nsig_cum"), F.col("segment")).over(wfull))
    t = t.withColumn("n_tot", F.sum("n_pop").over(wall))
    sigma = F.col("nsig") / F.col("n_pop").cast("double") / F.lit(100.0)
    ney = F.floor(
        F.lit(float(NEYMAN_BUDGET)) * F.col("nsig") / F.col("nsig_tot") + F.lit(0.5)
    )
    prop = F.floor(
        F.lit(float(NEYMAN_BUDGET))
        * F.col("n_pop").cast("double")
        / F.col("n_tot").cast("double")
        + F.lit(0.5)
    )
    return t.select(
        "segment",
        F.col("n_pop").cast("long").alias("n_pop"),
        F.round(sigma, 4).alias("sigma_dollars"),
        ney.cast("long").alias("neyman_n"),
        prop.cast("long").alias("proportional_n"),
    ).orderBy("segment")


QUERIES["neyman_allocation"] = neyman_allocation
ORACLES["neyman_allocation"] = f"""
    WITH g AS (
        SELECT c_mktsegment AS segment, count(*) AS n_pop,
               sum(CAST(round(c_acctbal * 100) AS HUGEINT)) AS s,
               sum(CAST(round(c_acctbal * 100) AS HUGEINT)
                   * CAST(round(c_acctbal * 100) AS HUGEINT)) AS q
        FROM customer GROUP BY 1
    ),
    t AS (
        SELECT segment, n_pop,
               sqrt(CAST(n_pop * q - s * s AS DOUBLE)) AS nsig,
               sum(sqrt(CAST(n_pop * q - s * s AS DOUBLE)))
                   OVER (ORDER BY segment
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS nsig_cum,
               sum(n_pop) OVER () AS n_tot
        FROM g
    ),
    tt AS (
        SELECT segment, n_pop, nsig, n_tot,
               arg_max(nsig_cum, segment) OVER () AS nsig_tot
        FROM t
    )
    SELECT segment, CAST(n_pop AS BIGINT) AS n_pop,
           round(nsig / n_pop / 100.0, 4) AS sigma_dollars,
           CAST(floor({NEYMAN_BUDGET}.0 * nsig / nsig_tot + 0.5) AS BIGINT)
               AS neyman_n,
           CAST(floor({NEYMAN_BUDGET}.0 * CAST(n_pop AS DOUBLE)
                      / CAST(n_tot AS DOUBLE) + 0.5) AS BIGINT)
               AS proportional_n
    FROM tt ORDER BY segment
"""


def capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of a hidden population —
    applied here as a DEDUP-RECALL audit: treat 1996 orderers and 1997
    orderers as two independent 'detectors' of the active-customer
    population; the overlap sizes the unseen mass exactly the way two
    independent duplicate-detectors size undetected duplicates (the
    standard recall-estimation trick when no ground truth exists).

    Chapman N-hat = (n1+1)(n2+1)/(m+1) - 1 with
    Var = (n1+1)(n2+1)(n1-m)(n2-m)/((m+1)^2 (m+2)); here ground truth
    IS available (customers with any 1996-97 order), so the audit also
    reports the estimator's realized error — the calibration companion
    of minhash_estimator_calibration for the census method.

    All inputs are exact integer counts from one reduce of orders;
    the estimate/CI are single float expressions.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("y")
    ).filter(F.col("y").isin(1996, 1997))
    per = o.groupBy("o_custkey").agg(
        F.max((F.col("y") == 1996).cast("int")).alias("c1"),
        F.max((F.col("y") == 1997).cast("int")).alias("c2"),
    )
    agg = per.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).alias("m"),
        F.count(F.lit(1)).alias("true_n"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m = F.col("m").cast("double")
    est = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    var = (
        (n1 + 1.0)
        * (n2 + 1.0)
        * (n1 - m)
        * (n2 - m)
        / ((m + 1.0) * (m + 1.0) * (m + 2.0))
    )
    se = F.sqrt(var)
    truth = F.col("true_n").cast("double")
    return agg.select(
        F.col("n1").cast("long").alias("captured_1996"),
        F.col("n2").cast("long").alias("captured_1997"),
        F.col("m").cast("long").alias("recaptured_both"),
        F.round(est, 2).alias("chapman_estimate"),
        F.round(se, 2).alias("se"),
        F.round(est - 1.96 * se, 2).alias("ci_low"),
        F.round(est + 1.96 * se, 2).alias("ci_high"),
        F.col("true_n").cast("long").alias("true_population"),
        F.round((est - truth) / truth * 100.0, 4).alias("error_pct"),
    )


ORACLES["capture_recapture_estimate"] = """
    WITH per AS (
        SELECT o_custkey,
               max(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
                        THEN 1 ELSE 0 END) AS c1,
               max(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
                        THEN 1 ELSE 0 END) AS c2
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)
        GROUP BY 1
    ),
    agg AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2,
               CAST(sum(c1 * c2) AS BIGINT) AS m,
               CAST(count(*) AS BIGINT) AS true_n
        FROM per
    )
    SELECT n1 AS captured_1996, n2 AS captured_1997, m AS recaptured_both,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 2)
               AS chapman_estimate,
           round(sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
                      / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 2) AS se,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
                 - 1.96 * sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m)
                               * (n2 - m)
                               / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 2)
               AS ci_low,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
                 + 1.96 * sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m)
                               * (n2 - m)
                               / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 2)
               AS ci_high,
           true_n AS true_population,
           round(((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0 - true_n)
                 / true_n * 100.0, 4) AS error_pct
    FROM agg
"""
QUERIES["capture_recapture_estimate"] = capture_recapture_estimate
