"""Deduplication operators over ``documents`` / ``embeddings`` (DRIVER
surface): exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.

Engine-parity trick: MinHash/SimHash use ``md5``-derived hashes
(functions.texts.md5_hash_long) that compute identically in Spark and
DuckDB, so even the LSH pipeline is fully oracle-checked — signatures,
banding, candidate generation, and verification all hash-match.

Scale design:
- exact dedup: hash-shuffle on text-hash; at 100 TB group on the md5 (32
  bytes) not the text itself (column pruning keeps payload out of the
  shuffle until the keeper join).
- MinHash+LSH: the shingle explode is narrow; signatures are one
  hash-partitioned agg per doc; banding turns the quadratic all-pairs
  problem into equi-joins on (band, band_hash) — only same-bucket
  candidates are verified. This is the 100 TB path.
- SimHash: one agg per doc; pairing joins on the 16-bit fingerprint
  (exact-bucket match) rather than all-pairs hamming.
- embedding near-dup: brute-force here (testdata has no planted
  neighbors); operators.similarity has the LSH-bucketed scale path.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.texts import md5_hash_long, normalized, shingles_of_words, words
from ..functions.vectors import as_double, cosine
from ..sources.tables import exploded_shingles, fan_out, load_table

MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
JACCARD_THRESHOLD = 0.5
FUZZY_MAX_DIST = 2  # max edit distance to call two names the same entity
SIMHASH_BITS = 16
COSINE_DUP_THRESHOLD = 0.45  # testdata has no planted vector dups; exercises op

# Universal hash family over ONE md5-derived base hash: h_i = (a_i*h+b_i) % P.
# 16x cheaper than 16 md5 calls per shingle, and still portable — both
# engines evaluate identical 64-bit integer arithmetic (h < 2^32, a < 2^31,
# so a*h+b < 2^63: no overflow on either side).
MINHASH_P = 4294967311  # first prime > 2^32
MINHASH_AB = [
    (
        ((1103515245 * i + 12345) % 2147483647) | 1,
        (69069 * i + 1234567) % 2147483647,
    )
    for i in range(MINHASH_K)
]


# --- exact -------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: md5(normalized text) -> keeper id + copy count."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(normalized(F.col("text"))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


# --- n-gram Jaccard ----------------------------------------------------------


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exploded_shingles: tokens materialized behind the fan-out exchange --
    # inline shingling re-splits the text per shingle index and lets the
    # explode-derived filter sink below the exchange (see tables.py)
    return exploded_shingles(load_table(spark, sf_dir, "documents"), 3)


def _hashed_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s) shingle frame with the shingle keyed to a 64-bit md5
    long (VERDICT r4 #5: 8-byte shuffle/sort/join keys instead of
    ~30-char strings).  Shared by the jaccard/containment/prefix-join
    family — and by tests/test_plans.py, which asserts the md5 lowering
    on THIS frame (operator-owned, so dropping the hashing here would
    fail the test; ADVICE r11).  Consumers localCheckpoint the (capped)
    shingle frame — corpus-scale executor-local storage; see the
    storage-semantics note on ``_minhash_kernel`` (VERDICT r11 #8)."""
    return _shingles(spark, sf_dir).select(
        "doc_id", md5_hash_long(F.col("s")).alias("s")
    )


def _jaccard_pairs(sh: DataFrame) -> DataFrame:
    """All-pairs jaccard from an exploded distinct-shingle frame."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
    )


# A shingle shared by m documents contributes m^2/2 rows to the pair join, so
# one stop-phrase shingle ("click here to subscribe") turns the shuffle into a
# hub: the cap drops shingles whose document frequency exceeds this bound from
# the shingle UNIVERSE (sizes and intersections alike), bounding every
# shingle's join fan-out at DF_CAP^2/2 while leaving discriminative shingles —
# the ones that actually signal near-duplication — untouched.
JACCARD_DF_CAP = 100


def _df_capped(sh: DataFrame, df_cap: int = JACCARD_DF_CAP) -> DataFrame:
    """Single-pass df-cap: count-over-window on the shingle key instead of
    the old agg + join-back, which put the shingle build on BOTH sides of
    a self-join and re-ran the explode kernel when exchange reuse didn't
    fire (the source_boilerplate/doc_novelty lesson from the 10x audit —
    round 8 applied it here).  One shingle-keyed exchange; the pair join
    that always follows shuffles on the same key, so the exchange is
    reusable downstream."""
    w = Window.partitionBy("s")
    return (
        sh.withColumn("df", F.count(F.lit(1)).over(w))
        .filter(F.col("df") <= df_cap)
        .drop("df")
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard near-dup pairs via the shingle self-join, with a
    document-frequency cap on the shingle universe.

    The DF cap is part of the operator contract (jaccard is computed over
    non-hub shingles only — df <= JACCARD_DF_CAP — in sizes and
    intersections alike) and is replicated in the oracle, so the result
    hash-checks at any SF.  Within that universe the pairing is exact; this
    is the exact baseline next to minhash_near_dup, which is the banded
    scale path with the same output contract.

    Physical: shingles key to 64-bit md5 longs before the df-cap and pair
    joins (the jaccard_prefix_join pattern, VERDICT r4 #5) — 8-byte
    shuffle/sort keys instead of ~30-char strings, which is what the
    shingle-keyed sort pays for at scale. The OUTPUT depends only on
    set identities, so the string-shingle oracle is unchanged; a 64-bit
    collision (likely only near ~2^32 distinct shingles) would merge two
    universe elements — same documented caveat as jaccard_prefix_join."""
    hashed = _hashed_shingles(spark, sf_dir)
    # materialize the capped shingle frame once: _jaccard_pairs consumes
    # it three times (sizes + both self-join sides), each otherwise
    # re-running the shingle kernel + df-cap window (the
    # jaccard_prefix_join r10 precedent; r11: 28-Exchange plan un-cut)
    pairs = _jaccard_pairs(_df_capped(hashed).localCheckpoint(eager=True))
    return pairs.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


# --- prefix-filtered exact jaccard join (PPJoin-lite) ------------------------


def jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT jaccard >= threshold pairs via prefix filtering (Chaudhuri et
    al. SSJoin / Xiao et al. PPJoin): each document's shingles sort by
    GLOBAL document frequency ascending (rarest first, (df, s) total
    order), and only the first |S| - ceil(t*|S|) + 1 — the "prefix" — enter
    the self-join.  Pigeonhole guarantee: two sets with jaccard >= t
    overlap in more than |S| - prefix_len elements, so they MUST share at
    least one prefix token — no pair above threshold is ever lost.

    This is the third candidate-generation strategy in this module and the
    only EXACT sub-quadratic one (minhash/simhash banding are probabilistic;
    the DF cap changes the universe).  The oracle is plain brute-force
    jaccard over the full shingle universe — the hash match itself proves
    the prefix filter loses nothing.

    Scale: hub shingles are high-df, so they sort LAST and never enter a
    prefix (except for degenerate tiny sets) — hub fan-out dies without
    giving up exactness.  Costs one df agg (shuffle at distinct-shingle
    cardinality), one per-doc sort window, the prefix equi-join, and a
    candidate-only verify, all hash-partitionable.

    On top of the prefix filter, the PPJoin LENGTH and POSITION filters
    (VERDICT r2 #5) prune candidates before the verify join:
    - length: jaccard >= t forces t*na <= nb <= na/t, a join-time predicate
      on the two set sizes;
    - position: for the FIRST joint-prefix common token at ranks (i, j),
      no common token precedes it on either side (both lists sort by the
      same (df, s) total order, so an earlier common token would itself be
      an earlier joint-prefix match), hence overlap <= 1 + min(na-i, nb-j);
      requiring that bound >= ceil(t/(1+t)*(na+nb)) per matching token is
      therefore lossless under the join's existential semantics.
    Both bounds relax by 1e-9 before ceil/floor so float noise on exact
    integers can never round a true pair out.  The oracle stays plain
    brute-force jaccard — the hash match proves losslessness end-to-end.
    Measured at sf0.01: 11,533 distinct candidate pairs from the full
    shingle self-join vs 977 via the prefix filter alone vs 27 with the
    length+position filters (the true result has 25 pairs — the filters
    leave almost nothing for the verify join), identical 25-row result.

    Physical notes: shingles key to 64-bit md5 longs up front (8-byte join
    keys and long-array intersects instead of ~30-char strings; a key
    collision needs ~2^32 distinct shingles to become likely, and even at
    corpus scales where a handful occur the effect is one candidate pair's
    overlap count off by one — swap in a dictionary id for strict
    exactness there). The shingle frame is localCheckpointed: it feeds
    THREE consumers (df counts, the ranked window, the verify sets), and
    the lazy plan re-exploded documents for each — measured r10 solo at
    sf0.1, checkpointed 2.74/3.18/4.63 s vs lazy 3.19/3.53/8.03 s
    (~14% faster warm, ~40% cold); the r8 lazy-wins note applied to the
    OLD two-consumer shape. The rank and set-size windows share one
    doc_id exchange; the verify set frame is corpus-wide but
    array-valued, joined by doc id — every step hash-partitionable, no
    driver-side state.
    """
    t = JACCARD_THRESHOLD
    sh = _hashed_shingles(spark, sf_dir).localCheckpoint(eager=True)
    df_counts = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # rank and set size from ONE doc_id-partitioned window pass (the count
    # rides the same exchange as the sort), not a separate sizes agg + join
    w_rk = Window.partitionBy("doc_id").orderBy("df", "s")
    w_n = Window.partitionBy("doc_id")
    ranked = sh.join(df_counts, "s").select(
        "doc_id",
        "s",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    prefix_len = F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1
    prefix = ranked.filter(F.col("rk") <= prefix_len).select(
        "doc_id", "s", "rk", "n"
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    na, nb = F.col("a.n"), F.col("b.n")
    # minimum shared-shingle count for jaccard >= t (1e-9: never round up
    # past an exactly-representable integer product)
    alpha = F.ceil(F.lit(t / (1.0 + t)) * (na + nb) - F.lit(1e-9))
    length_ok = (nb >= F.ceil(F.lit(t) * na - F.lit(1e-9))) & (
        nb <= F.floor(na / F.lit(t) + F.lit(1e-9))
    )
    position_ok = 1 + F.least(na - F.col("a.rk"), nb - F.col("b.rk")) >= alpha
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & length_ok
            & position_ok,
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = sh.groupBy("doc_id").agg(F.collect_set("s").alias("ss"))
    verified = (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b")),
            "doc_b",
        )
        .withColumn("common", F.size(F.array_intersect("ss_a", "ss_b")))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.size("ss_a") + F.size("ss_b") - F.col("common")),
        )
    )
    return verified.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


# --- MinHash + LSH -----------------------------------------------------------


def _signatures_from_shingles(sh: DataFrame) -> DataFrame:
    h = md5_hash_long(F.col("s"))
    return sh.withColumn("h", h).groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(
                f"m{i}"
            )
            for i, (a, b) in enumerate(MINHASH_AB)
        ]
    )


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sa): the distinct shingle ARRAY per document, built
    row-locally behind the fan-out exchange — the un-exploded twin of
    ``_shingles``. Documents too short to shingle are dropped (same
    population the exploded path yields)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = fan_out(d.select("doc_id", words(F.col("text")).alias("__w")))
    return toks.select(
        "doc_id", shingles_of_words(F.col("__w"), 3).alias("sa")
    ).filter(F.size("sa") > 0)


def _signatures_from_sets(sets: DataFrame) -> DataFrame:
    """MinHash signatures computed ROW-LOCALLY from the shingle-array frame:
    hash the array once, then each of the K permutations is an array_min
    over a transform — zero shuffle, versus the exploded path's
    corpus×shingle groupBy. Same (a*h+b) % P arithmetic and the same
    min-over-distinct-shingles semantics, so outputs are bit-identical to
    ``_signatures_from_shingles`` (the oracle's formulation)."""
    ha = sets.withColumn(
        "__ha", F.transform("sa", lambda s: md5_hash_long(s))
    )
    return ha.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(
                    "__ha", lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P)
                )
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(MINHASH_AB)
        ],
    )


def _minhash_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sa, m0..m{K-1}) in ONE Arrow-batched pass: shingling, md5
    hashing, and all K permutation minima vectorized per batch
    (hashlib + numpy), replacing an interpreted higher-order-function
    chain measured ~10x slower (Spark HOFs don't enter codegen, so each
    of the ~150 shingle slices and K x 150 modular ops per document paid
    interpreted-lambda overhead).

    Exact-parity contract with the JVM/SQL formulation (asserted in
    tests/test_llm_ops.py::test_minhash_kernel_matches_jvm_formulation and
    by the DuckDB oracle): tokens = regex \\s+ split of trimmed text,
    shingle = space-joined word 3-gram, first-occurrence-distinct; hash =
    first 8 md5 hex chars as int; min over (a*h + b) % P with a*h < 2^63
    (no int64 overflow, so numpy == JVM long == SQL hugeint arithmetic).

    Scale: mapInPandas is a narrow map over the fanned-out corpus scan —
    no shuffle, batch-sized memory, and the kernel cost is ~linear in
    corpus bytes. The shingle array rides along so the near-dup verify
    step reuses this single pass.

    Storage semantics of the consumers' localCheckpoint(eager=True)
    (VERDICT r11 #8): the materialized kernel frame is CORPUS-scale
    (one row per document incl. its shingle array) and lands in
    executor-local MEMORY_AND_DISK blocks with lineage truncated — at
    cluster scale an executor loss makes those blocks unrecomputable
    (the query fails and restarts, it cannot silently corrupt), and the
    blocks compete for local disk.  That is still strictly better than
    the alternative the cut removes — 4-6 REDUNDANT Python kernel
    passes over the corpus (band sides + verify sets; differing join
    inputs defeat runtime exchange reuse) — because the checkpoint
    spills to the same local disk the shuffle would use, exactly once.
    A deployment that cannot tolerate restart-on-executor-loss should
    swap these sites to reliable ``checkpoint()`` against the cluster
    checkpoint dir (same single-pass property, HDFS/object-store cost).
    Behavior at 30x corpus scale is probed in bench_sf1.json
    ``probe_30x.minhash_near_dup`` (r12).
    """
    import pandas as pd

    d = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    ab = list(MINHASH_AB)
    p = MINHASH_P
    n = 3
    cols = ["doc_id", "sa", *[f"m{i}" for i in range(len(ab))]]
    schema = "doc_id long, sa array<string>, " + ", ".join(
        f"m{i} long" for i in range(len(ab))
    )

    def gen(batches):
        import hashlib
        import re

        import numpy as np

        # Exact JVM/DuckDB parity (ADVICE r3): match F.split(F.trim(x),
        # "\\s+") — trim strips ONLY ' '; \s is the ASCII class (Python's
        # Unicode str.strip()/\s would diverge on tabs/newlines/U+00A0 at
        # the text edges).
        rx = re.compile(r"[ \t\n\x0b\f\r]+")
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text.strip(" ") if text else ""
                w = rx.split(t) if t else []
                if len(w) < n:
                    continue
                sh = list(
                    dict.fromkeys(
                        " ".join(w[i : i + n]) for i in range(len(w) - n + 1)
                    )
                )
                hs = np.fromiter(
                    (
                        int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                        for s in sh
                    ),
                    dtype=np.int64,
                    count=len(sh),
                )
                mins = [int(((a * hs + b) % p).min()) for a, b in ab]
                rows.append((int(doc_id), sh, *mins))
            yield pd.DataFrame(rows, columns=cols)

    return d.mapInPandas(gen, schema)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K minhash values per document (portable universal-hash family).

    Computed via the vectorized Arrow kernel (``_minhash_kernel``) — one
    narrow pass over the corpus, no exploded-shingle shuffle; the DuckDB
    oracle runs the exploded groupBy-min formulation, so the hash match
    proves the kernel equivalent."""
    k = _minhash_kernel(spark, sf_dir)
    return k.select("doc_id", *[f"m{i}" for i in range(MINHASH_K)])


def _minhash_bands(sig: DataFrame) -> DataFrame:
    band_hashes = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"m{j * MINHASH_ROWS + r}").cast("string")
                    for r in range(MINHASH_ROWS)
                ],
            )
        )
        for j in range(MINHASH_BANDS)
    ]
    return sig.select(
        "doc_id", F.posexplode(F.array(*band_hashes)).alias("band", "bh")
    )


def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH near-dup: band candidates -> exact-jaccard verification.

    Same output contract as ngram_jaccard_pairs but computed the scalable
    way: equi-join on (band, band_hash) generates candidates instead of the
    quadratic shingle self-join; only candidates are verified.

    Both the signatures and the verification sets come from the ROW-LOCAL
    shingle-array path (``_shingle_sets``): signatures are array_min
    transforms (zero shuffle — the former exploded groupBy-min paid a
    corpus×shingles exchange plus a DISK_ONLY persist to amortize it;
    dropped entirely), and the verify step array_intersects the per-doc
    arrays joined to candidates only.

    The kernel frame is localCheckpointed ONCE (r11): it feeds both
    band-join sides and both verify-set projections, and each reference
    re-ran the Arrow shingling pass (the join inputs differ, so runtime
    exchange reuse cannot dedupe them) — the jaccard_prefix_join r10
    shingle-frame precedent, corpus-bounded (one row per doc).
    """
    kernel = _minhash_kernel(spark, sf_dir).localCheckpoint(eager=True)
    sets = kernel.select("doc_id", "sa")
    bands = _minhash_bands(kernel)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify ONLY candidate pairs (never all-pairs — that's the point of
    # the banding): per-doc shingle arrays joined to the candidate list,
    # intersection computed JVM-side via array_intersect
    verified = (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("sa").alias("ss_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("sa").alias("ss_b")),
            "doc_b",
        )
        .withColumn("common", F.size(F.array_intersect("ss_a", "ss_b")))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.size("ss_a") + F.size("ss_b") - F.col("common")),
        )
    )
    return verified.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


# --- incremental near-dup (index reuse) --------------------------------------

INCR_MOD = 10  # doc_id % INCR_MOD == 0 plays the "newly arrived batch"


def incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup check of a NEW document batch against an EXISTING corpus —
    the shape dedup actually runs in a production ingestion pipeline: the
    corpus's MinHash band index already exists; only the new batch is
    shingled/signed, and candidates come from probing the new bands against
    the corpus band index (equi-join), never from re-pairing the corpus
    with itself.

    Here the "new batch" is the deterministic slice doc_id % INCR_MOD == 0
    and the corpus index is computed in-plan (the driver testdata has no
    second arrival); in deployment the corpus band frame is a materialized
    table that this plan reads instead of computing — the join and verify
    stages are unchanged, which is the point: per-arrival work scales with
    BATCH size, plus one probe join into an index of corpus-band
    cardinality.  Output: (new_id, corpus_id, jaccard >= threshold), exact
    jaccard verified on candidate pairs only, same contract as
    minhash_near_dup.

    Kernel localCheckpointed once (r11): four consumers (index/probe band
    sides + both verify-set slices) each re-ran the Arrow shingling pass.
    """
    kernel = _minhash_kernel(spark, sf_dir).localCheckpoint(eager=True)
    is_new = F.col("doc_id") % INCR_MOD == 0
    k_new, k_old = kernel.filter(is_new), kernel.filter(~is_new)
    sets_n = k_new.select("doc_id", "sa")
    sets_o = k_old.select("doc_id", "sa")
    index = _minhash_bands(k_old)  # corpus index
    probe = _minhash_bands(k_new)
    cand = (
        probe.alias("n")
        .join(
            index.alias("o"),
            (F.col("n.band") == F.col("o.band")) & (F.col("n.bh") == F.col("o.bh")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("corpus_id")
        )
        .distinct()
    )
    verified = (
        cand.join(
            sets_n.select(F.col("doc_id").alias("new_id"), F.col("sa").alias("ss_n")),
            "new_id",
        )
        .join(
            sets_o.select(
                F.col("doc_id").alias("corpus_id"), F.col("sa").alias("ss_o")
            ),
            "corpus_id",
        )
        .withColumn("common", F.size(F.array_intersect("ss_n", "ss_o")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.size("ss_n") + F.size("ss_o") - F.col("common")),
        )
    )
    return verified.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "new_id", "corpus_id", F.round("jaccard", 4).alias("jaccard")
    )


# --- SimHash -----------------------------------------------------------------


def _simhash_sig(d: DataFrame, n_bits: int) -> DataFrame:
    """``n_bits``-wide SimHash per document from word-level hashes."""
    wdf = d.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    wdf = wdf.withColumn("h", md5_hash_long(F.col("w")))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(n_bits)
    ]
    sig = wdf.groupBy("doc_id").agg(*aggs)
    simhash = functools.reduce(
        lambda acc, b: acc
        + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)),
        range(1, n_bits),
        F.when(F.col("b0") > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return sig.select("doc_id", simhash.cast("long").alias("simhash"))


def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from word-level hashes (with counts)."""
    return _simhash_sig(load_table(spark, sf_dir, "documents"), SIMHASH_BITS)


SIMHASH_BANDS_N = 4  # 4 bands x 4 bits over the 16-bit fingerprint
SIMHASH_HAMMING_MAX = 3


def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= SIMHASH_HAMMING_MAX,
    found the scalable way: band the fingerprint (pigeonhole — any pair
    within distance d < bands must agree on at least one band exactly),
    equi-join on (band, band_value) for candidates, then verify with a
    JVM-side popcount. Never an all-pairs comparison.

    Scale: the fingerprint width DERIVES from corpus size (the
    embedding_near_dup remedy — emb_adaptive_band_bits: per-band random
    collision probability ~128/N, so candidate volume stays ~linear in N
    at every scale).  A FIXED 16-bit fingerprint is inherently quadratic:
    its 2^16 value space saturates, so both random band collisions AND
    the hamming<=3 OUTPUT itself grow as N^2 (measured 14.0x at 10x docs
    before this derivation).  At <=~16k docs the derived width is exactly
    the historical 16 bits (bit-identical outputs); at 50k docs it is 36.
    The one count() driving the width is parquet-metadata-only; the
    oracle replicates the identical integer derivation from its own
    count, so hash parity holds at every SF.
    """
    d = load_table(spark, sf_dir, "documents")
    band_bits = emb_adaptive_band_bits(d.count())
    width = SIMHASH_BANDS_N * band_bits
    mask = (1 << band_bits) - 1
    sig = _simhash_sig(d, width)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), band_bits * j)
                    .bitwiseAND(F.lit(mask))
                    for j in range(SIMHASH_BANDS_N)
                ]
            )
        ).alias("band", "bv"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


# --- embedding cosine --------------------------------------------------------

EMB_FP_BITS = 16  # hyperplane sign bits per vector (floor; grows with N)
EMB_FP_BANDS = 4  # 4 bands x band_bits; fp-hamming < 4 always collides
EMB_FP_BAND_BITS = EMB_FP_BITS // EMB_FP_BANDS
EMB_DIM = 64
# widest band the signed-long fingerprint can carry (4 bands x 15 = 60 bits)
EMB_FP_MAX_BAND_BITS = 15


def emb_adaptive_band_bits(n_vectors: int) -> int:
    """Corpus-size-derived band width (VERDICT r4 #3 — the registered query
    must self-scale, not pin 16 bits).

    band_bits = clamp(ceil_log2(N) - 7, 4, 15): per-band collision
    probability for unrelated vectors is 2^-band_bits ~= 128/N, so expected
    random-pair candidates per band ~= N^2/2 * 128/N = 64*N — LINEAR in
    corpus size by construction. At the bench corpus (N=2000, ceil_log2=11)
    this yields band_bits=4 -> 16 bits, exactly the previously pinned
    default; at the 10x scale-evidence corpus (N=20000) it yields 8 -> 32
    bits, the configuration the r4 sweep measured at ~linear growth
    (bench_sf1.json: 123.8 s at fixed 16 bits -> 9.8 s at 32).

    Integer-exact in both engines: ceil_log2(N) = bit_length(N-1) here,
    ``length(bin(N-1))`` in the DuckDB oracle — no float log2 ULP risk.
    """
    ceil_log2 = max((max(n_vectors, 2) - 1).bit_length(), 1)
    return min(EMB_FP_MAX_BAND_BITS, max(EMB_FP_BAND_BITS, ceil_log2 - 7))


def _emb_fingerprint(v, n_bits: int = EMB_FP_BITS) -> F.Column:
    """Sign-bit fingerprint over the deterministic hyperplane family shared
    with operators.similarity (golden-ratio pseudo-random, engine-portable).

    One nested higher-order expression (zip_with over the literal plane
    matrix, fold-dot per plane, fold-sum of bit weights) instead of
    EMB_FP_BITS unrolled fold expressions — ~10x smaller expression tree
    and codegen unit, identical left-to-right float arithmetic, so the
    oracle's per-plane list_dot_product still bit-matches."""
    from .similarity import _hyperplanes

    planes = _hyperplanes(n_bits, EMB_DIM)
    mat = F.array(*[F.array(*[F.lit(float(x)) for x in p]) for p in planes])
    weights = F.array(
        *[F.lit(1 << i).cast("long") for i in range(n_bits)]
    )
    bits = F.zip_with(
        mat,
        weights,
        lambda p, w: F.when(
            F.aggregate(
                F.zip_with(v, p, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            w,
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs WITHOUT an all-pairs cross join: candidates
    come from a banded sign-bit fingerprint (pigeonhole — any pair whose
    16-bit hyperplane fingerprints differ in < EMB_FP_BANDS bits must agree
    exactly on at least one 4-bit band), generated by an equi-join on
    (band, band_value); the cosine kernel runs on candidates only.

    Output contract: pairs that share >= 1 fingerprint band AND have rounded
    cosine >= COSINE_DUP_THRESHOLD.  The banding is deterministic (same
    hyperplane literals both engines), so the oracle replicates it and the
    result hash-checks at any SF.  True duplicates (cosine ~1) have expected
    fingerprint hamming ~= bits * acos(cos)/pi << 4, so they are essentially
    always candidates — asserted against the brute-force kernel on a
    planted-duplicate fixture in tests/test_llm_ops.py.

    Scale: the join is an equi-shuffle on band value — candidate volume is
    governed by band width, and the band width now DERIVES from corpus size
    (emb_adaptive_band_bits: collision probability ~128/N per band, so
    random-pair candidates stay ~linear in N at every scale — no knob to
    forget at 100 TB); never O(N^2).  The quadratic brute-force form
    survives only as the small-N recall baseline
    (embedding_near_dup_bruteforce).  The one count() driving the
    derivation is parquet-metadata-only (no column read); the oracle
    replicates the same integer derivation from its own count, so hash
    parity holds at every SF.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    band_bits = emb_adaptive_band_bits(e.count())
    return embedding_near_dup_frame(
        e, n_bits=EMB_FP_BANDS * band_bits, n_bands=EMB_FP_BANDS
    )


def embedding_near_dup_frame(
    e: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    n_bits: int = EMB_FP_BITS,
    n_bands: int = EMB_FP_BANDS,
) -> DataFrame:
    """Banded-fingerprint near-dup over any (vec_id, v) frame (see
    embedding_near_dup for the contract and scale notes).

    ``n_bits``/``n_bands`` are THE scale knobs: per-bucket collision
    probability for unrelated vectors is ~2^-(n_bits/n_bands), so
    candidate volume ~ N^2 * n_bands / 2^(n_bits/n_bands) — grow the band
    width with log2(N) to hold candidates ~linear (the 10x scale-evidence
    run demonstrates exactly this: defaults curve quadratically at 10x,
    24 bits x 4 bands restores ~linear; recall on planted duplicates is
    unaffected because true near-dups have fingerprint hamming << bands).

    Norms are computed ONCE per vector before the pair join (the verify
    kernel then costs one dot product per candidate instead of three fold
    passes) — same arithmetic, so oracle parity is unaffected."""
    from ..functions.vectors import norm

    band_bits = n_bits // n_bands
    e = e.withColumn("nrm", norm(F.col("v")))
    # vector-cardinality cut (r11): the interpreted-HOF fingerprint
    # (n_bits x dim fold-dots per vector) feeds BOTH band self-join
    # sides; materializing it once guarantees one fingerprint pass
    # regardless of whether runtime exchange reuse fires.
    eb = e.withColumn("fp", _emb_fingerprint(F.col("v"), n_bits)).localCheckpoint(
        eager=True
    )
    band_mask = (1 << band_bits) - 1
    bands = eb.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("fp"), band_bits * j).bitwiseAND(
                        F.lit(band_mask)
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("band", "bv"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    from ..functions.vectors import dot

    sim = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4)
    return (
        cand.join(
            e.select(
                F.col("vec_id").alias("vec_a"),
                F.col("v").alias("va"),
                F.col("nrm").alias("na"),
            ),
            "vec_a",
        )
        .join(
            e.select(
                F.col("vec_id").alias("vec_b"),
                F.col("v").alias("vb"),
                F.col("nrm").alias("nb"),
            ),
            "vec_b",
        )
        .select("vec_a", "vec_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dup_bruteforce(
    e: DataFrame, threshold: float = COSINE_DUP_THRESHOLD
) -> DataFrame:
    """All-pairs cosine baseline over a (vec_id, v) frame — O(N^2), kept
    ONLY as the small-N recall oracle for the banded operator's tests."""
    a, b = e.alias("a"), e.alias("b")
    pairs = a.crossJoin(b).filter(F.col("a.vec_id") < F.col("b.vec_id"))
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), 4)
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# --- oracles -----------------------------------------------------------------

_SHINGLES_CTE = """
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> array_to_string(w[i:i+2], ' ')))) AS s
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents)
    )
"""

_JACCARD_CTES = f"""
    {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT doc_a, doc_b,
               common * 1.0 / (sa.n + sb.n - common) AS jaccard
        FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
    )
"""

# the capped twin of _JACCARD_CTES: hub shingles (df > cap) leave the
# universe before sizes/intersections — mirrors _df_capped exactly
_JACCARD_CTES_CAPPED = f"""
    {_SHINGLES_CTE},
    shc AS (
        SELECT sh.doc_id, sh.s
        FROM sh JOIN (SELECT s FROM sh GROUP BY s
                      HAVING count(*) <= {JACCARD_DF_CAP}) k USING (s)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT doc_a, doc_b,
               common * 1.0 / (sa.n + sb.n - common) AS jaccard
        FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
    )
"""


def _portable_hash_sql(expr: str, salt: str = "") -> str:
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"CAST('0x' || substr(md5({inner}), 1, 8) AS BIGINT)"


def _minhash_sig_cols() -> str:
    base = _portable_hash_sql("s")
    return ",\n               ".join(
        f"min(({a} * {base} + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )


def _band_selects(src: str = "sig") -> str:
    parts = []
    for j in range(MINHASH_BANDS):
        cols = " || ',' || ".join(
            f"m{j * MINHASH_ROWS + r}::VARCHAR" for r in range(MINHASH_ROWS)
        )
        parts.append(
            f"SELECT doc_id, {j} AS band, md5({cols}) AS bh FROM {src}"
        )
    return " UNION ALL ".join(parts)


def _simhash_sql() -> str:
    bit_sums = ",\n               ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""
        WITH wh AS (
            SELECT doc_id, {_portable_hash_sql('w')} AS h
            FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                  FROM documents)
        ),
        sig AS (SELECT doc_id, {bit_sums} FROM wh GROUP BY doc_id)
        SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM sig
    """


def _simhash_pairs_sql() -> str:
    """Width-adaptive twin of simhash_hamming_pairs.

    The SQL string is static but the fingerprint width is derived at RUN
    time from count(documents) — the same clamp(ceil_log2(N)-7, 4, 15)
    band-bits formula as the Spark side (integer-exact: length(bin(N-1))
    == bit_length(N-1)).  All 60 possible bit-sums are computed
    unconditionally (static column list); the assemble step masks to the
    derived width, which is exactly what building only `width` sums
    yields.  sig is MATERIALIZED: bands self-joins, and un-materialized
    CTEs re-evaluate per reference (the lpa_communities lesson).
    """
    max_bits = 4 * 15  # SIMHASH_BANDS_N * the clamp ceiling
    bit_sums = ",\n               ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(max_bits)
    )
    assemble = " + ".join(
        f"CASE WHEN {b} < 4 * bb AND b{b} > 0 THEN {1 << b}::BIGINT "
        f"ELSE 0 END"
        for b in range(max_bits)
    )
    return f"""
        WITH bbv AS (
            SELECT least(greatest(
                       length(bin(greatest(count(*), 2) - 1)) - 7, 4), 15)
                   AS bb
            FROM documents
        ),
        wh AS (
            SELECT doc_id, {_portable_hash_sql('w')} AS h
            FROM (SELECT doc_id,
                         unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                  FROM documents)
        ),
        sigraw AS (SELECT doc_id, {bit_sums} FROM wh GROUP BY doc_id),
        sig AS MATERIALIZED (
            SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash
            FROM sigraw, bbv
        ),
        bands AS (
            SELECT doc_id, simhash, j AS band,
                   (simhash >> (bb * j)) & ((1::BIGINT << bb) - 1) AS bv
            FROM sig, bbv, generate_series(0, {SIMHASH_BANDS_N - 1}) AS t(j)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS sh_a, b.simhash AS sh_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_HAMMING_MAX}
    """


_COS = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


def _emb_near_dup_oracle() -> str:
    """The banded-fingerprint pipeline in SQL: same hyperplane literals,
    same band slicing, same candidate equi-join — deterministic, so the
    approximate path hash-checks like an exact query.

    Self-scaling twin: the SQL computes the fingerprint over the FULL
    60-plane family (EMB_FP_BANDS * EMB_FP_MAX_BAND_BITS) and derives
    band_bits from its own count(*) with the same integer formula as
    emb_adaptive_band_bits (ceil_log2 via length(bin(N-1)) — bit-exact,
    no float log2).  Band j touches only bits [j*band_bits,
    (j+1)*band_bits), all below 4*band_bits = the Spark plan's n_bits, so
    the wider oracle fingerprint slices to exactly the bits Spark
    computed."""
    from .similarity import _hyperplanes

    planes = _hyperplanes(EMB_FP_BANDS * EMB_FP_MAX_BAND_BITS, EMB_DIM)
    fp = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p!r}) >= 0 THEN {1 << i}::BIGINT "
        "ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    cos = (
        "list_dot_product(ea.v, eb.v) / "
        "(sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))"
    )
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        nb AS (SELECT LEAST({EMB_FP_MAX_BAND_BITS},
                            GREATEST({EMB_FP_BAND_BITS},
                                     length(bin(greatest(count(*), 2) - 1))
                                     - 7))
                          AS band_bits
               FROM e),
        ef AS (SELECT vec_id, v, CAST({fp} AS BIGINT) AS fp FROM e),
        bands AS (
            SELECT vec_id, j AS band,
                   (fp >> (nb.band_bits * j))
                       & ((1::BIGINT << nb.band_bits) - 1) AS bv
            FROM ef, nb, generate_series(0, {EMB_FP_BANDS - 1}) AS t(j)
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id
        )
        SELECT c.vec_a, c.vec_b, round({cos}, 4) AS cos_sim
        FROM cand c
        JOIN e ea ON c.vec_a = ea.vec_id
        JOIN e eb ON c.vec_b = eb.vec_id
        WHERE round({cos}, 4) >= {COSINE_DUP_THRESHOLD}
    """

SNM_WINDOW = 5   # neighbors compared after the sort
SNM_MAX_LEV = 4  # edit-distance match threshold

_SNM_ORACLE = f"""
    WITH n AS (SELECT DISTINCT p_name FROM part),
    r AS (SELECT p_name, row_number() OVER (ORDER BY p_name) AS rk FROM n)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev
    FROM r a JOIN r b
      ON b.rk - a.rk BETWEEN 1 AND {SNM_WINDOW}
    WHERE levenshtein(a.p_name, b.p_name) <= {SNM_MAX_LEV}
"""

_BLOCKING_QUALITY_ORACLE = f"""
    WITH n0 AS (SELECT DISTINCT p_name FROM part),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM n0),
    lb AS (SELECT p_name,
                  CAST(length(p_name) // {SNM_MAX_LEV + 1} AS BIGINT) AS lb
           FROM n0),
    probe AS (
        SELECT p_name AS name_a, lb + d AS lb
        FROM lb, (SELECT unnest([-1, 0, 1]) AS d)
    ),
    truth AS (
        SELECT DISTINCT p.name_a, b.p_name AS name_b
        FROM probe p JOIN lb b ON p.lb = b.lb
        WHERE p.name_a < b.p_name
          AND levenshtein(p.name_a, b.p_name) <= {SNM_MAX_LEV}
    ),
    r AS (SELECT p_name, row_number() OVER (ORDER BY p_name) AS rk FROM n0),
    cand AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b
        FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND {SNM_WINDOW}
    ),
    f AS (SELECT count(*) AS n_found
          FROM cand c JOIN truth t
            ON c.name_a = t.name_a AND c.name_b = t.name_b),
    counts AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
               (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
               (SELECT CAST(n_found AS BIGINT) FROM f) AS n_found
    )
    SELECT tot.n AS n_names,
           CAST(tot.n * (tot.n - 1) / 2 AS BIGINT) AS n_all_pairs,
           n_cand AS n_candidates,
           n_true AS n_true_matches,
           n_found,
           round(1 - n_cand / (tot.n * (tot.n - 1) / 2.0), 6)
               AS reduction_ratio,
           round(n_found * 1.0 / n_true, 6) AS pairs_completeness
    FROM tot, counts
"""


ORACLES = {
    "sorted_neighborhood_pairs": _SNM_ORACLE,
    "blocking_quality": _BLOCKING_QUALITY_ORACLE,
    "fuzzy_match_parts": f"""
        SELECT a.p_brand AS brand,
               CAST(a.p_partkey AS BIGINT) AS part_a,
               CAST(b.p_partkey AS BIGINT) AS part_b,
               a.p_name AS name_a,
               b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM part a
        JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE abs(length(a.p_name) - length(b.p_name)) <= {FUZZY_MAX_DIST}
          AND levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    """,
    "dedup_exact": """
        SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS text_hash,
               min(doc_id) AS keep_id,
               count(*)    AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "ngram_jaccard_pairs": f"""
        WITH {_JACCARD_CTES_CAPPED}
        SELECT doc_a, doc_b, round(jaccard, 4) AS jaccard
        FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    # brute-force over the FULL universe: the hash match proves the prefix
    # filter is lossless
    "jaccard_prefix_join": f"""
        WITH {_JACCARD_CTES}
        SELECT doc_a, doc_b, round(jaccard, 4) AS jaccard
        FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    "minhash_signatures": f"""
        WITH {_SHINGLES_CTE}
        SELECT doc_id,
               {_minhash_sig_cols()}
        FROM sh GROUP BY doc_id
    """,
    "minhash_near_dup": f"""
        WITH {_JACCARD_CTES},
        sig AS (
            SELECT doc_id,
               {_minhash_sig_cols()}
            FROM sh GROUP BY doc_id
        ),
        bands AS ({_band_selects()}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        )
        SELECT j.doc_a, j.doc_b, round(j.jaccard, 4) AS jaccard
        FROM jac j JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
        WHERE j.jaccard >= {JACCARD_THRESHOLD}
    """,
    "incremental_near_dup": f"""
        WITH {_SHINGLES_CTE},
        shn AS (SELECT * FROM sh WHERE doc_id % {INCR_MOD} = 0),
        sho AS (SELECT * FROM sh WHERE doc_id % {INCR_MOD} <> 0),
        sign AS (SELECT doc_id, {_minhash_sig_cols()} FROM shn GROUP BY doc_id),
        sigo AS (SELECT doc_id, {_minhash_sig_cols()} FROM sho GROUP BY doc_id),
        bn AS ({_band_selects("sign")}),
        bo AS ({_band_selects("sigo")}),
        cand AS (
            SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS corpus_id
            FROM bn n JOIN bo o ON n.band = o.band AND n.bh = o.bh
        ),
        sizes_n AS (SELECT doc_id, count(*) AS n FROM shn GROUP BY doc_id),
        sizes_o AS (SELECT doc_id, count(*) AS n FROM sho GROUP BY doc_id),
        cm AS (
            SELECT n.doc_id AS new_id, o.doc_id AS corpus_id, count(*) AS common
            FROM shn n JOIN sho o ON n.s = o.s
            GROUP BY 1, 2
        )
        SELECT c.new_id, c.corpus_id,
               round(cm.common * 1.0 / (sn.n + so.n - cm.common), 4) AS jaccard
        FROM cand c
        JOIN cm ON c.new_id = cm.new_id AND c.corpus_id = cm.corpus_id
        JOIN sizes_n sn ON c.new_id = sn.doc_id
        JOIN sizes_o so ON c.corpus_id = so.doc_id
        WHERE cm.common * 1.0 / (sn.n + so.n - cm.common) >= {JACCARD_THRESHOLD}
    """,
    "simhash_fingerprint": _simhash_sql(),
    "simhash_hamming_pairs": _simhash_pairs_sql(),
    "embedding_near_dup": _emb_near_dup_oracle(),
}

# --- blocked fuzzy matching (entity resolution) ------------------------------


def _deletion_variants(s) -> F.Column:
    """All strings reachable from ``s`` by deleting up to FUZZY_MAX_DIST=2
    characters (the symmetric-delete / SymSpell neighborhood), as a distinct
    array — pure JVM expression (sequence + nested transform), no UDF.

    Guarantee (standard symmetric-delete result): lev(a, b) <= 2 implies
    the two variant sets intersect — align the edits, delete each
    substituted position from both strings and each inserted character from
    its own string; <= 2 deletions per side reach a common string.  The
    empty string PARTICIPATES as a variant (deleting a 1-char string once,
    or a 2-char string twice), so the guarantee holds for arbitrarily short
    inputs too — 'a'~'b' (lev 1) and 'ab'~'cd' (lev 2) meet at "" (ADVICE
    r2); short strings therefore block together via "", which only adds
    candidates the bounded-lev kernel verifies away."""
    L = F.length(s)
    d1 = F.when(
        L >= 1,
        F.transform(
            F.sequence(F.lit(1), L),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i - 1), F.substring(s, i + 1, L)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # L >= 2 guard also keeps sequence(i+1, L) ascending (Spark's sequence
    # runs DESCENDING when start > stop, which would fabricate variants)
    d2 = F.when(
        L >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), L - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, L),
                    lambda j: F.concat(
                        F.substring(s, F.lit(1), i - 1),
                        F.substring(s, i + 1, j - i - 1),
                        F.substring(s, j + 1, L),
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(F.array(s), d1, d2))


def fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: part-name pairs within FUZZY_MAX_DIST edits,
    candidate-generated by a COMPOSED blocking key — the standard
    record-linkage decomposition (block on a cheap equality key, run the
    expensive similarity kernel only inside blocks).

    Two-level decomposition:
    1. The lev relation is computed over the DISTINCT NAME DICTIONARY, not
       the rows — symmetric-delete (SymSpell) blocking generates candidate
       name pairs (each name explodes to its <=2-deletion neighborhood,
       ~1 + L + L^2/2 variants; lev(a,b) <= 2 guarantees a shared variant,
       see _deletion_variants), then the bounded Levenshtein kernel
       verifies.  Exact — no pair the brute-force filter keeps is lost
       (unit-tested), so the oracle is unchanged and still hash-matches.
    2. The verified name relation (tiny: lev-similar name pairs only)
       BROADCASTS, and two equi-joins expand it back to part pairs within
       each brand.

    Measured at sf0.1 (20k parts, 64 distinct names, 25 brands):
    brand-only blocking ran the kernel chain over 7,998,672 row pairs; the
    dictionary-level SymSpell join sees 64 names x ~60 variants and the
    verified relation is 112 name pairs — the expensive kernel runs on
    dictionary cardinality, not corpus cardinality — with the identical
    220,542-row result (wall 6.6s -> 1.1s at sf0.1).

    Scale: real catalogs keep name-dictionary cardinality orders below row
    count, and dictionary growth is absorbed by the variant equi-join
    (candidates track genuinely similar names plus rare variant
    collisions, never dictionary^2).  The expansion joins are plain
    hash/SMJ shuffles on (name, brand).  All JVM-side: sequence/transform/
    levenshtein are codegen'd built-ins, no UDF anywhere.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    rel = fuzzy_name_relation(p.select("p_name").distinct())
    return (
        p.alias("a")
        .join(F.broadcast(rel), F.col("a.p_name") == F.col("name_a"))
        .join(
            p.alias("b"),
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("b.p_name") == F.col("name_b"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_brand").alias("brand"),
            F.col("a.p_partkey").cast("bigint").alias("part_a"),
            F.col("b.p_partkey").cast("bigint").alias("part_b"),
            "name_a",
            "name_b",
            F.col("dist").cast("bigint").alias("dist"),
        )
    )


def fuzzy_name_relation(names: DataFrame) -> DataFrame:
    """The SYMMETRIC lev <= FUZZY_MAX_DIST relation over a frame of distinct
    ``p_name`` values: (name_a, name_b, dist) including the identity pairs
    (dist 0) and both orientations of every unequal pair, so any downstream
    ordering of the row pairs can look either direction up.

    Candidates come from the symmetric-delete join (see _deletion_variants);
    the |length delta| Levenshtein lower bound and the bounded 3-arg kernel
    (early-exits past the threshold, returns -1; exact for kept pairs — so
    oracle parity holds) verify them. All JVM built-ins, no UDF.
    """
    ex = names.select(
        "p_name", F.explode(_deletion_variants(F.col("p_name"))).alias("variant")
    )
    return (
        ex.alias("x")
        .join(ex.alias("y"), "variant")
        .select(
            F.col("x.p_name").alias("name_a"), F.col("y.p_name").alias("name_b")
        )
        .distinct()
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= FUZZY_MAX_DIST
        )
        .withColumn(
            "dist",
            F.levenshtein(F.col("name_a"), F.col("name_b"), FUZZY_MAX_DIST),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= FUZZY_MAX_DIST))
    )


def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage over the distinct part-name
    dictionary: sort the names, compare each against its next SNM_WINDOW
    successors, keep pairs within SNM_MAX_LEV edits — the third classic
    blocking scheme in this module (SymSpell variants in
    fuzzy_match_parts, prefix filtering in jaccard_prefix_join; SNM is
    the one that exploits a SORT ORDER instead of a key).

    Scale: the global sort rank comes from the usual two-pass
    decomposition (in-bucket row_number by first-letter bucket + broadcast
    cumulative offsets), NOT a one-task global window; the neighborhood
    join is an equi-join on rank-band (each left row probes its own and
    the next band), so comparisons are exactly N x SNM_WINDOW — never a
    name x name cross join. The oracle runs the naive global-window
    formulation, proving the decomposition exact.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("bkt", F.substring("p_name", 1, 1))
    )
    win_in = Window.partitionBy("bkt").orderBy("p_name")
    in_rank = names.withColumn("r_in", F.row_number().over(win_in))
    counts = names.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("bkt", "off")
    # dictionary-sized cut (r11): ranked feeds BOTH band-join sides (and
    # names itself fed the rank + the bucket counts) — un-cut, the
    # distinct-name build + rank decomposition ran twice per consumer.
    ranked = in_rank.join(F.broadcast(offsets), "bkt").select(
        "p_name", (F.col("off") + F.col("r_in")).alias("rk")
    ).localCheckpoint(eager=True)
    band = (F.col("rk") / (SNM_WINDOW + 1)).cast("long")
    left = ranked.select(
        F.col("p_name").alias("name_a"),
        F.col("rk").alias("rk_a"),
        F.explode(F.array(band, band + 1)).alias("band"),
    )
    right = ranked.select(
        F.col("p_name").alias("name_b"),
        F.col("rk").alias("rk_b"),
        band.alias("band"),
    )
    return (
        left.join(right, "band")
        .filter(
            (F.col("rk_b") - F.col("rk_a") >= 1)
            & (F.col("rk_b") - F.col("rk_a") <= SNM_WINDOW)
        )
        .withColumn("lev", F.levenshtein("name_a", "name_b"))
        .filter(F.col("lev") <= SNM_MAX_LEV)
        .select("name_a", "name_b", F.col("lev").cast("int").alias("lev"))
    )


# Fellegi-Sunter m/u probabilities per comparison field: m = P(agree |
# same entity), u = P(agree | different entities). Log-weights are
# precomputed in PYTHON and inlined as integer micro-units on both engines
# — the whole score is then exact integer arithmetic, no libm anywhere.
import math as _math  # noqa: E402

FS_M_U = {
    "p_brand": (0.95, 0.04),
    "p_type": (0.90, 1.0 / 150.0),
    "p_size": (0.85, 0.02),
    "price_band": (0.80, 0.01),
}
FS_W = {
    f: (
        int(round(_math.log2(m / u) * 1_000_000)),
        int(round(_math.log2((1.0 - m) / (1.0 - u)) * 1_000_000)),
    )
    for f, (m, u) in FS_M_U.items()
}


def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record-linkage scoring (Fellegi & Sunter 1969) over
    the sorted-neighborhood candidate pairs: each pair of name-similar
    part records is scored by summing per-field agreement log-weights
    (log2 m/u on agreement, log2 (1-m)/(1-u) on disagreement) across
    brand / type / size / price-band; positive total = probable same
    entity. This is the classic decision layer on top of blocking —
    SNM proposes, Fellegi-Sunter disposes.

    Each name's attribute representative is its min-partkey record
    (deterministic on both engines).

    Scale: candidates come from the already-linear SNM rank-band join;
    scoring is two broadcast-joinable attribute lookups plus pure integer
    arithmetic per candidate — no new shuffle shape beyond SNM itself.
    """
    pairs = sorted_neighborhood_pairs(spark, sf_dir)
    p = load_table(spark, sf_dir, "part")
    rep = (
        p.groupBy(F.col("p_name").alias("rep_name"))
        .agg(F.min("p_partkey").alias("repkey"))
        .join(p, F.col("repkey") == F.col("p_partkey"))
        .drop("rep_name")
        .select(
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            F.floor(F.col("p_retailprice") / 100.0).cast("long").alias("price_band"),
        )
    )
    a = rep.select(
        F.col("p_name").alias("name_a"),
        *[F.col(f).alias(f"{f}_a") for f in FS_M_U],
    )
    b = rep.select(
        F.col("p_name").alias("name_b"),
        *[F.col(f).alias(f"{f}_b") for f in FS_M_U],
    )
    scored = pairs.join(a, "name_a").join(b, "name_b")
    agree = [
        (F.col(f"{f}_a") == F.col(f"{f}_b")).cast("int") for f in FS_M_U
    ]
    n_agree = agree[0]
    for x in agree[1:]:
        n_agree = n_agree + x
    micro = F.lit(0).cast("long")
    for f, (aw, dw) in FS_W.items():
        micro = micro + F.when(
            F.col(f"{f}_a") == F.col(f"{f}_b"), F.lit(aw)
        ).otherwise(F.lit(dw))
    return scored.select(
        "name_a",
        "name_b",
        "lev",
        n_agree.cast("int").alias("n_agree"),
        (micro / 1000000.0).alias("fs_score"),
        (micro > 0).alias("is_match"),
    )


def blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-scheme evaluation for the record-linkage tier: how good is
    sorted-neighborhood blocking at finding the true edit-distance matches?
    Reports the two standard metrics — reduction ratio (fraction of the
    all-pairs comparison space pruned away) and pairs completeness
    (fraction of TRUE matches the blocking retains) — plus the raw counts.

    Ground truth comes from a LENGTH-BANDED exact sweep: lev(a,b) <= D
    implies |len(a)-len(b)| <= D, so joining length-buckets +-1 provably
    contains every true match while staying an equi-join (never a name x
    name cartesian). The SNM candidate set is the rank-band join from
    ``sorted_neighborhood_pairs`` BEFORE the edit-distance filter.

    Scale: both sides operate on the distinct-name dictionary (bounded by
    the name vocabulary, orders below row count); the all-pairs DENOMINATOR
    is computed arithmetically (n*(n-1)/2), never materialized.
    """
    # dictionary-sized, consumed three times (count, truth side, SNM side)
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
        .localCheckpoint(eager=True)
    )
    n_total = names.agg(F.count(F.lit(1)).cast("long").alias("n"))

    # --- ground truth: length-banded lev sweep ---
    lb = names.withColumn(
        "lb", (F.length("p_name") / (SNM_MAX_LEV + 1)).cast("long")
    )
    probe = lb.select(
        F.col("p_name").alias("name_a"),
        F.explode(
            F.array(F.col("lb") - 1, F.col("lb"), F.col("lb") + 1)
        ).alias("lb"),
    )
    # consumed by the found join AND its own count — un-cut, the
    # banded Levenshtein sweep ran twice (r11: 84-Exchange plan)
    truth = (
        probe.join(
            lb.select(F.col("p_name").alias("name_b"), "lb"), "lb"
        )
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= SNM_MAX_LEV)
        .select("name_a", "name_b")
        .distinct()
        .localCheckpoint(eager=True)
    )

    # --- SNM candidates: the rank-band join, pre-lev filter ---
    nb = names.withColumn("bkt", F.substring("p_name", 1, 1))
    win_in = Window.partitionBy("bkt").orderBy("p_name")
    in_rank = nb.withColumn("r_in", F.row_number().over(win_in))
    counts = nb.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("bkt", "off")
    ranked = in_rank.join(F.broadcast(offsets), "bkt").select(
        "p_name", (F.col("off") + F.col("r_in")).alias("rk")
    )
    band = (F.col("rk") / (SNM_WINDOW + 1)).cast("long")
    left = ranked.select(
        F.col("p_name").alias("name_a"),
        F.col("rk").alias("rk_a"),
        F.explode(F.array(band, band + 1)).alias("band"),
    )
    right = ranked.select(
        F.col("p_name").alias("name_b"), F.col("rk").alias("rk_b"),
        band.alias("band"),
    )
    # consumed by the found join AND its own count — rank-band-bounded
    cand = (
        left.join(right, "band")
        .filter(
            (F.col("rk_b") - F.col("rk_a") >= 1)
            & (F.col("rk_b") - F.col("rk_a") <= SNM_WINDOW)
        )
        .select("name_a", "name_b")
        .localCheckpoint(eager=True)
    )

    found = cand.join(truth, ["name_a", "name_b"])
    stats = (
        n_total.crossJoin(
            F.broadcast(cand.agg(F.count(F.lit(1)).cast("long").alias("n_cand")))
        )
        .crossJoin(
            F.broadcast(truth.agg(F.count(F.lit(1)).cast("long").alias("n_true")))
        )
        .crossJoin(
            F.broadcast(found.agg(F.count(F.lit(1)).cast("long").alias("n_found")))
        )
    )
    all_pairs = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    return stats.select(
        F.col("n").alias("n_names"),
        all_pairs.alias("n_all_pairs"),
        F.col("n_cand").alias("n_candidates"),
        F.col("n_true").alias("n_true_matches"),
        F.col("n_found").alias("n_found"),
        F.round(1 - F.col("n_cand") / all_pairs, 6).alias("reduction_ratio"),
        F.round(F.col("n_found") / F.col("n_true"), 6).alias(
            "pairs_completeness"
        ),
    )




QUERIES = {
    "sorted_neighborhood_pairs": sorted_neighborhood_pairs,
    "blocking_quality": blocking_quality,
    "dedup_exact": dedup_exact,
    "fuzzy_match_parts": fuzzy_match_parts,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "jaccard_prefix_join": jaccard_prefix_join,
    "minhash_signatures": minhash_signatures,
    "minhash_near_dup": minhash_near_dup,
    "incremental_near_dup": incremental_near_dup,
    "simhash_fingerprint": simhash_fingerprint,
    "simhash_hamming_pairs": simhash_hamming_pairs,
    "embedding_near_dup": embedding_near_dup,
}

def _fs_cte() -> str:
    """CTE chain ending at ``fs`` (scored candidate pairs with integer
    micro score), shared by the fellegi_sunter_linkage and
    entity_resolution oracles."""
    fields_sql = {
        "p_brand": ("a.p_brand", "b.p_brand"),
        "p_type": ("a.p_type", "b.p_type"),
        "p_size": ("a.p_size", "b.p_size"),
        "price_band": ("a.price_band", "b.price_band"),
    }
    n_agree = " + ".join(
        f"CASE WHEN {l} = {r} THEN 1 ELSE 0 END"
        for l, r in fields_sql.values()
    )
    micro = " + ".join(
        f"CASE WHEN {fields_sql[f][0]} = {fields_sql[f][1]} "
        f"THEN {aw} ELSE {dw} END"
        for f, (aw, dw) in FS_W.items()
    )
    return f"""
    n AS (SELECT DISTINCT p_name FROM part),
    r AS (SELECT p_name, row_number() OVER (ORDER BY p_name) AS rk FROM n),
    pairs AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev
        FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND {SNM_WINDOW}
        WHERE levenshtein(a.p_name, b.p_name) <= {SNM_MAX_LEV}
    ),
    rep AS (
        SELECT p.p_name, p.p_brand, p.p_type, p.p_size,
               CAST(floor(p.p_retailprice / 100.0) AS BIGINT) AS price_band
        FROM part p
        JOIN (SELECT p_name, min(p_partkey) AS mk FROM part GROUP BY 1) m
          ON p.p_partkey = m.mk
    ),
    fs AS (
        SELECT pr.name_a, pr.name_b, pr.lev,
               CAST({n_agree} AS INT) AS n_agree,
               ({micro}) AS micro
        FROM pairs pr
        JOIN rep a ON pr.name_a = a.p_name
        JOIN rep b ON pr.name_b = b.p_name
    )
    """


def _fs_oracle() -> str:
    return f"""
    WITH {_fs_cte()}
    SELECT name_a, name_b, lev, n_agree,
           micro / 1000000.0 AS fs_score,
           micro > 0 AS is_match
    FROM fs
    """


ORACLES["fellegi_sunter_linkage"] = _fs_oracle()
QUERIES["fellegi_sunter_linkage"] = fellegi_sunter_linkage

def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution over the part-name dictionary: SNM
    blocking proposes candidates, Fellegi-Sunter scoring accepts matches,
    and distributed connected components (pointer-doubling label
    propagation, operators/pipeline_ops.connected_components) groups the
    accepted matches into entities. Every name gets a canonical
    ``entity`` (the lexicographically smallest member) and the entity's
    member count — singletons resolve to themselves.

    Scale: names map to dense global ranks via the same two-pass
    decomposition as sorted_neighborhood_pairs (no one-task window);
    components run O(log diameter) rounds over the match-edge list; the
    final label->name joins are broadcast (entity dictionary << corpus).
    The oracle is a recursive-CTE transitive closure, so the hash match
    proves blocking + scoring + clustering end to end.
    """
    from .pipeline_ops import connected_components

    matches = fellegi_sunter_linkage(spark, sf_dir).filter(
        F.col("is_match")
    ).select("name_a", "name_b")

    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("bkt", F.substring("p_name", 1, 1))
    )
    win_in = Window.partitionBy("bkt").orderBy("p_name")
    in_rank = names.withColumn("r_in", F.row_number().over(win_in))
    counts = names.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("bkt", "off")
    # materialize the rank dictionary: five consumers below (both edge
    # endpoints, both label->name joins, the singleton union) would each
    # re-expand the two-pass window/offset tree — measured r11: 76
    # Exchanges in the unmaterialized plan; entity-dictionary-sized frame
    ranked = (
        in_rank.join(F.broadcast(offsets), "bkt")
        .select("p_name", (F.col("off") + F.col("r_in")).alias("rk"))
        .localCheckpoint(eager=True)
    )

    edges = (
        matches.join(
            F.broadcast(ranked.select(F.col("p_name").alias("name_a"),
                                      F.col("rk").alias("doc_a"))),
            "name_a",
        )
        .join(
            F.broadcast(ranked.select(F.col("p_name").alias("name_b"),
                                      F.col("rk").alias("doc_b"))),
            "name_b",
        )
        .select("doc_a", "doc_b")
    )
    labels, _ = connected_components(spark, edges)
    ent = (
        labels.join(
            F.broadcast(ranked.select(F.col("rk").alias("node"),
                                      F.col("p_name").alias("member"))),
            "node",
        )
        .join(
            F.broadcast(ranked.select(F.col("rk").alias("label"),
                                      F.col("p_name").alias("entity"))),
            "label",
        )
        .select("member", "entity")
    )
    # singletons (names untouched by any match) resolve to themselves;
    # materialized because both the size aggregate and the final join
    # consume it (one recompute would redo the match-edge joins)
    full = (
        ranked.select(F.col("p_name").alias("member"))
        .join(ent, "member", "left")
        .select(
            "member",
            F.coalesce("entity", "member").alias("entity"),
        )
        .localCheckpoint(eager=True)
    )
    sizes = full.groupBy("entity").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return full.join(F.broadcast(sizes), "entity").select(
        F.col("member").alias("name"), "entity", "n_members"
    )


ORACLES["entity_resolution"] = f"""
    WITH RECURSIVE {_fs_cte().strip().rstrip()},
    edges AS (
        SELECT name_a AS a, name_b AS b FROM fs WHERE micro > 0
        UNION ALL
        SELECT name_b AS a, name_a AS b FROM fs WHERE micro > 0
    ),
    reach(a, b) AS (
        SELECT p_name, p_name FROM n
        UNION
        SELECT r0.a, e.b FROM reach r0 JOIN edges e ON r0.b = e.a
    ),
    lab AS (SELECT a AS name, min(b) AS entity FROM reach GROUP BY a),
    sz AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_members
           FROM lab GROUP BY 1)
    SELECT l.name, l.entity, s.n_members
    FROM lab l JOIN sz s USING (entity)
"""
QUERIES["entity_resolution"] = entity_resolution

def dup_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram from exact dedup: for each cluster
    size, how many clusters and what share of all documents they hold —
    the one-glance answer to "how duplicated is this corpus?" that decides
    whether near-dup passes are even worth their cost.

    Scale: composes dedup_exact's hash-keyed aggregate with a second
    size-keyed aggregate (size cardinality is tiny); the share normalizer
    is a 1-row broadcast.
    """
    clusters = dedup_exact(spark, sf_dir)
    prof = clusters.groupBy(F.col("n_copies").cast("bigint").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )
    tot = prof.agg(
        F.sum(F.col("cluster_size") * F.col("n_clusters")).cast("double").alias("n_docs")
    )
    return prof.crossJoin(F.broadcast(tot)).select(
        "cluster_size",
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_docs_in"),
        F.round(
            F.col("cluster_size") * F.col("n_clusters") / F.col("n_docs"), 6
        ).alias("doc_share"),
    )


ORACLES["dup_size_profile"] = """
    WITH clusters AS (
        SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                   AS text_hash,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    ),
    prof AS (
        SELECT CAST(n_copies AS BIGINT) AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters
        FROM clusters GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cluster_size * n_clusters) AS DOUBLE)
                AS n_docs FROM prof)
    SELECT cluster_size, n_clusters,
           CAST(cluster_size * n_clusters AS BIGINT) AS n_docs_in,
           round(cluster_size * n_clusters / t.n_docs, 6) AS doc_share
    FROM prof CROSS JOIN tot t
"""
QUERIES["dup_size_profile"] = dup_size_profile


# --- asymmetric containment --------------------------------------------------

CONTAINMENT_THRESHOLD = 0.6
CONTAINMENT_MIN_SHINGLES = 5


def containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs: cont(a in b) = |A n B| / |A| —
    the quote/subset detector Jaccard misses (a short doc fully embedded in
    a long one has high containment but low Jaccard; Broder's original
    resemblance-vs-containment distinction).  Ordered pairs in BOTH
    directions over the df-capped shingle universe (same universe contract
    as ngram_jaccard_pairs), probe sets required to have at least
    CONTAINMENT_MIN_SHINGLES capped shingles so trivial tiny sets don't
    flood the result.

    Scale: identical physics to the jaccard pair join — 64-bit hashed
    shingle keys, df-capped fan-out (<= DF_CAP^2 rows per shingle), one
    pair-keyed agg; the containment division is one exact-integer op.
    """
    hashed = _hashed_shingles(spark, sf_dir)
    # three consumers (sizes + both ordered-pair sides) — same cut as
    # ngram_jaccard_pairs / the jaccard_prefix_join r10 precedent
    capped = _df_capped(hashed).localCheckpoint(eager=True)
    sizes = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = capped.alias("a"), capped.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(F.col("na") >= CONTAINMENT_MIN_SHINGLES)
        .withColumn("containment", F.col("common") / F.col("na"))
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            F.col("na").cast("bigint").alias("na"),
            F.col("nb").cast("bigint").alias("nb"),
            F.col("common").cast("bigint").alias("common"),
            F.round("containment", 4).alias("containment"),
        )
    )


QUERIES["containment_near_dup"] = containment_near_dup
ORACLES["containment_near_dup"] = f"""
    WITH {_SHINGLES_CTE},
    shc AS (
        SELECT sh.doc_id, sh.s
        FROM sh JOIN (SELECT s FROM sh GROUP BY s
                      HAVING count(*) <= {JACCARD_DF_CAP}) k USING (s)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           CAST(sa.n AS BIGINT) AS na,
           CAST(sb.n AS BIGINT) AS nb,
           CAST(p.common AS BIGINT) AS common,
           round(p.common * 1.0 / sa.n, 4) AS containment
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE sa.n >= {CONTAINMENT_MIN_SHINGLES}
      AND p.common * 1.0 / sa.n >= {CONTAINMENT_THRESHOLD}
"""


# --- winnowing fingerprints --------------------------------------------------

WINNOW_W = 4  # winnowing window: guarantee threshold t = W + k - 1 shingles
WINNOW_MIN_SHARED = 2


def winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-pair matching via WINNOWING fingerprints (Schleimer,
    Wilkerson & Aiken, SIGMOD'03 — the MOSS algorithm): hash every
    positioned word trigram, keep a shingle iff its hash is the minimum of
    the trailing WINNOW_W-window (the local-minima selection variant, same
    guarantee direction: any shared run of >= W+k-1 tokens shares a
    fingerprint), then match documents on shared selected fingerprints.
    Complements minhash (probabilistic global resemblance) with the
    position-robust LOCAL match detector used for plagiarism/clone
    detection.

    Scale: selection is a per-doc ordered window (one doc-keyed shuffle);
    selected fingerprints are a small fraction (~2/W) of shingles; the
    pair join runs on the df-capped fingerprint key exactly like the
    jaccard joins (hub fan-out bounded by DF_CAP^2).  Integer hashes
    end-to-end: zero float risk.
    """
    d = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    # guard BEFORE sequence(): Spark's sequence(0, n) runs DESCENDING for
    # n < 0 (it would fabricate junk shingles for <3-word docs, where
    # DuckDB's generate_series is empty)
    docs_w = d.select("doc_id", words(F.col("text")).alias("w")).filter(
        F.size("w") >= 3
    )
    sh = docs_w.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(w) - 3),"
                " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
            )
        ).alias("pos", "s"),
    ).select("doc_id", "pos", md5_hash_long(F.col("s")).alias("h"))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    picked = (
        sh.withColumn("wmin", F.min("h").over(win))
        .filter(F.col("h") == F.col("wmin"))
        .select("doc_id", "h")
        .distinct()
    )
    # both self-join sides re-ran the winnow window un-cut
    capped = _df_capped(
        picked.withColumnRenamed("h", "s")
    ).localCheckpoint(eager=True)
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


QUERIES["winnowing_pairs"] = winnowing_pairs
ORACLES["winnowing_pairs"] = f"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents
    ),
    pos_sh AS (
        SELECT doc_id,
               unnest(generate_series(0, len(w) - 3)) AS pos,
               unnest(list_transform(
                   generate_series(1, len(w) - 2),
                   i -> array_to_string(w[i:i+2], ' '))) AS s
        FROM base WHERE len(w) >= 3
    ),
    hashed AS (
        SELECT doc_id, pos,
               CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS h
        FROM pos_sh
    ),
    picked AS (
        SELECT DISTINCT doc_id, h FROM (
            SELECT doc_id, h,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                                AND CURRENT ROW) AS wmin
            FROM hashed
        ) WHERE h = wmin
    ),
    capped AS (
        SELECT p.doc_id, p.h
        FROM picked p JOIN (SELECT h FROM picked GROUP BY h
                            HAVING count(*) <= {JACCARD_DF_CAP}) k USING (h)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AF: estimator-quality audit for the LSH tier
# ---------------------------------------------------------------------------

CALIB_SCALE = 1_000_000_000_000  # error terms rounded to pico-units


def minhash_estimator_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of the MinHash Jaccard ESTIMATOR against exact
    shingle Jaccard, per exact-similarity decile, over the banded candidate
    pairs — the measurement that tells an operator whether K=16 signature
    components are enough for the dedup threshold in use (estimator SD is
    sqrt(j(1-j)/K) ~ 0.125 at j=0.5): for each candidate pair, estimate =
    (#equal components)/K; report per-bucket count, mean estimate, mean
    bias and MAE.

    Determinism: the estimate is the exact rational eq/K (bucket means sum
    integer eq counts); the exact Jaccard bucket is the integer division
    (10*common) DIV union; bias/MAE terms are single float expressions per
    pair rounded to the pico-grid and summed as decimal(38,0) — no
    cross-row float accumulation.

    Scale: candidates come from the SAME band-bucket equi-join as
    minhash_near_dup (never all-pairs); everything downstream is
    candidate-cardinality.

    Kernel localCheckpointed once (r11): six consumers (band self-join
    sides, both signature slices, both shingle-set slices) each re-ran
    the Arrow shingling pass — the most multiply-consumed kernel in the
    dedup tier.
    """
    kernel = _minhash_kernel(spark, sf_dir).localCheckpoint(eager=True)
    sets = kernel.select("doc_id", "sa")
    bands = _minhash_bands(kernel)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    siga = kernel.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"xa{i}") for i in range(MINHASH_K)],
    )
    sigb = kernel.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"xb{i}") for i in range(MINHASH_K)],
    )
    j = (
        cand.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("sa").alias("ss_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("sa").alias("ss_b")),
            "doc_b",
        )
    )
    eq = sum(
        [
            F.when(F.col(f"xa{i}") == F.col(f"xb{i}"), 1).otherwise(0)
            for i in range(MINHASH_K)
        ],
        F.lit(0),
    )
    common = F.size(F.array_intersect("ss_a", "ss_b")).cast("long")
    u = (F.size("ss_a") + F.size("ss_b")).cast("long") - common
    est = eq.cast("double") / F.lit(float(MINHASH_K))
    exact = common.cast("double") / u.cast("double")
    diff = est - exact
    t = j.select(
        F.expr(
            "CAST(10 * size(array_intersect(ss_a, ss_b)) AS BIGINT) div "
            "CAST(size(ss_a) + size(ss_b) - size(array_intersect(ss_a, ss_b))"
            " AS BIGINT)"
        ).alias("bucket"),
        eq.cast("long").cast("decimal(38,0)").alias("eq"),
        F.round(diff * CALIB_SCALE).cast("long").cast("decimal(38,0)").alias("d"),
        F.round(F.abs(diff) * CALIB_SCALE)
        .cast("long")
        .cast("decimal(38,0)")
        .alias("ad"),
    )
    g = t.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("eq").alias("seq"),
        F.sum("d").alias("sd"),
        F.sum("ad").alias("sad"),
    )
    n = F.col("n").cast("double")
    return g.select(
        F.col("bucket").cast("int").alias("jaccard_decile"),
        F.col("n").cast("long").alias("n_pairs"),
        F.round(
            F.col("seq").cast("double") / (F.lit(float(MINHASH_K)) * n), 6
        ).alias("mean_minhash_est"),
        F.round(F.col("sd").cast("double") / CALIB_SCALE / n, 6).alias("bias"),
        F.round(F.col("sad").cast("double") / CALIB_SCALE / n, 6).alias("mae"),
    ).orderBy("jaccard_decile")


QUERIES["minhash_estimator_calibration"] = minhash_estimator_calibration

_CALIB_EQ_SQL = " + ".join(
    f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(MINHASH_K)
)

ORACLES["minhash_estimator_calibration"] = f"""
    WITH {_JACCARD_CTES},
    sig AS (
        SELECT doc_id,
               {_minhash_sig_cols()}
        FROM sh GROUP BY doc_id
    ),
    bands AS ({_band_selects()}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    x AS (
        SELECT c.doc_a, c.doc_b,
               ({_CALIB_EQ_SQL}) AS eq,
               COALESCE(p.common, 0) AS common,
               za.n + zb.n - COALESCE(p.common, 0) AS u
        FROM cand c
        JOIN sig sa ON c.doc_a = sa.doc_id
        JOIN sig sb ON c.doc_b = sb.doc_id
        LEFT JOIN pairs p ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
        JOIN sizes za ON c.doc_a = za.doc_id
        JOIN sizes zb ON c.doc_b = zb.doc_id
    ),
    terms AS (
        SELECT CAST(10 * common AS BIGINT) // CAST(u AS BIGINT) AS bucket,
               eq,
               CAST(round((CAST(eq AS DOUBLE) / {float(MINHASH_K)}
                           - CAST(common AS DOUBLE) / CAST(u AS DOUBLE))
                          * {CALIB_SCALE}) AS HUGEINT) AS d,
               CAST(round(abs(CAST(eq AS DOUBLE) / {float(MINHASH_K)}
                              - CAST(common AS DOUBLE) / CAST(u AS DOUBLE))
                          * {CALIB_SCALE}) AS HUGEINT) AS ad
        FROM x
    ),
    g AS (
        SELECT bucket, count(*) AS n, sum(eq) AS seq,
               sum(d) AS sd, sum(ad) AS sad
        FROM terms GROUP BY 1
    )
    SELECT CAST(bucket AS INT) AS jaccard_decile,
           CAST(n AS BIGINT) AS n_pairs,
           round(CAST(seq AS DOUBLE)
                 / ({float(MINHASH_K)} * CAST(n AS DOUBLE)), 6)
               AS mean_minhash_est,
           round(CAST(sd AS DOUBLE) / {CALIB_SCALE} / CAST(n AS DOUBLE), 6)
               AS bias,
           round(CAST(sad AS DOUBLE) / {CALIB_SCALE} / CAST(n AS DOUBLE), 6)
               AS mae
    FROM g ORDER BY jaccard_decile
"""
