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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texts import md5_hash_long, normalized, words
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


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard near-dup pairs (exact, all-pairs via shingle join)."""
    pairs = _jaccard_pairs(_shingles(spark, sf_dir))
    return pairs.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
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


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K minhash values per document (portable universal-hash family)."""
    return _signatures_from_shingles(_shingles(spark, sf_dir))


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
    """
    # shingles feed both the signatures and the verification join — cache
    # the exploded frame so the split/slice work happens once
    sh = _shingles(spark, sf_dir).cache()
    bands = _minhash_bands(_signatures_from_shingles(sh))
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
    # the banding): per-doc shingle SETS joined to the candidate list, with
    # the intersection computed JVM-side via array_intersect. One agg + two
    # doc-keyed joins, vs. re-exploding shingles into a pairwise shuffle
    # join — far fewer shuffled rows when candidates ≪ shingles.
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


# --- SimHash -----------------------------------------------------------------


def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from word-level hashes (with counts)."""
    d = load_table(spark, sf_dir, "documents")
    wdf = d.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    wdf = wdf.withColumn("h", md5_hash_long(F.col("w")))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    sig = wdf.groupBy("doc_id").agg(*aggs)
    simhash = functools.reduce(
        lambda acc, b: acc
        + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)),
        range(1, SIMHASH_BITS),
        F.when(F.col("b0") > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return sig.select("doc_id", simhash.cast("long").alias("simhash"))


SIMHASH_BANDS_N = 4  # 4 bands x 4 bits over the 16-bit fingerprint
SIMHASH_HAMMING_MAX = 3


def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= SIMHASH_HAMMING_MAX,
    found the scalable way: band the fingerprint (pigeonhole — any pair
    within distance d < bands must agree on at least one band exactly),
    equi-join on (band, band_value) for candidates, then verify with a
    JVM-side popcount. Never an all-pairs comparison.

    Scale: candidate volume is governed by band width; the verify step is
    two integer ops per candidate. At 100 TB you widen the fingerprint
    (64/128 bits) and the bands with it — same plan shape.
    """
    sig = simhash_fingerprint(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 4 * j).bitwiseAND(F.lit(15))
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


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine near-dup pairs over embeddings (threshold on the
    ROUNDED similarity so the engine-boundary decision is deterministic)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.crossJoin(b).filter(F.col("a.vec_id") < F.col("b.vec_id"))
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), 4)
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= COSINE_DUP_THRESHOLD)
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


def _portable_hash_sql(expr: str, salt: str = "") -> str:
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"CAST('0x' || substr(md5({inner}), 1, 8) AS BIGINT)"


def _minhash_sig_cols() -> str:
    base = _portable_hash_sql("s")
    return ",\n               ".join(
        f"min(({a} * {base} + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )


def _band_selects() -> str:
    parts = []
    for j in range(MINHASH_BANDS):
        cols = " || ',' || ".join(
            f"m{j * MINHASH_ROWS + r}::VARCHAR" for r in range(MINHASH_ROWS)
        )
        parts.append(
            f"SELECT doc_id, {j} AS band, md5({cols}) AS bh FROM sig"
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


_COS = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)

ORACLES = {
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
    "simhash_fingerprint": _simhash_sql(),
    "simhash_hamming_pairs": f"""
        WITH sim AS ({_simhash_sql()}),
        bands AS (
            SELECT doc_id, simhash, j AS band,
                   (simhash >> (4 * j)) & 15 AS bv
            FROM sim, generate_series(0, {SIMHASH_BANDS_N - 1}) AS t(j)
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
    """,
    "embedding_near_dup": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({_COS}, 4) AS cos_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round({_COS}, 4) >= {COSINE_DUP_THRESHOLD}
    """,
}

# --- blocked fuzzy matching (entity resolution) ------------------------------


def fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: part-name pairs within FUZZY_MAX_DIST edits,
    candidate-generated by a blocking key — the standard record-linkage
    decomposition (block on a cheap equality key, run the expensive
    similarity kernel only inside blocks).

    Scale: the self-join is an EQUI-join on the blocking key (p_brand), so
    candidate pairs grow with block size squared, never corpus squared —
    at 100 TB you block on (brand, name-length bucket) to keep blocks
    bounded and the join stays a hash/SMJ shuffle Spark can partition.
    Inside a block, a |length delta| <= d pre-filter (a Levenshtein lower
    bound) rejects most pairs before the O(len^2) edit-distance kernel,
    and p_a < p_b halves the space. All JVM-side: F.levenshtein is a
    codegen'd built-in, no UDF. At 100 TB the single blocking key is too
    coarse (block sizes grow with the table) — compose it with a
    name-length bucket or first-token key so block cardinality, not block
    size, absorbs the growth.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(
            F.abs(F.length("a.p_name") - F.length("b.p_name"))
            <= FUZZY_MAX_DIST
        )
        # bounded kernel: 3-arg levenshtein early-exits past the threshold
        # (returns -1), ~2x over the unbounded kernel at sf0.1; for kept
        # pairs the returned distance is exact, so oracle parity holds
        .withColumn(
            "dist",
            F.levenshtein(
                F.col("a.p_name"), F.col("b.p_name"), FUZZY_MAX_DIST
            ),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= FUZZY_MAX_DIST))
        .select(
            F.col("a.p_brand").alias("brand"),
            F.col("a.p_partkey").cast("bigint").alias("part_a"),
            F.col("b.p_partkey").cast("bigint").alias("part_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("dist").cast("bigint").alias("dist"),
        )
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "fuzzy_match_parts": fuzzy_match_parts,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_signatures": minhash_signatures,
    "minhash_near_dup": minhash_near_dup,
    "simhash_fingerprint": simhash_fingerprint,
    "simhash_hamming_pairs": simhash_hamming_pairs,
    "embedding_near_dup": embedding_near_dup,
}
