"""Deterministic sketch operators (DRIVER surface): KMV distinct-count,
Count-Min frequency, Bloom-filter pre-filter join.

The reference has no sketches or approximate aggregation of any kind
(SURVEY.md §2.B — no Combine/GroupByKey at all); these are the approximate
primitives a 100 TB pipeline leans on when exact distinct/frequency state
no longer fits. Spark's built-ins (approx_count_distinct = HLL++,
count_min_sketch) use engine-private seeds, so their outputs can't be
value-checked against another engine. These formulations instead build the
classic sketches from the portable md5 hash family
(functions.texts.md5_hash_long), which DuckDB reproduces bit-for-bit —
so even the APPROXIMATE paths are full value-parity checked, including the
estimation error itself.

Scale design:
- KMV: the sketch is "k smallest distinct hash values per group" — a
  per-group top-k, computed as distinct → windowed rank → filter. The
  shuffle key is the group; state per group is k doubles regardless of
  cardinality. (At extreme per-group cardinality replace the single sort
  with salted partial top-k then merge — the estimator is unchanged
  because min-k of a union is min-k of the partial min-k's.)
- Count-Min: the sketch is a d×w counter grid — the explode is narrow
  (d rows per input), the aggregation collapses to d*w cells, and the
  point-query join touches only d cells per key. Grid size is independent
  of input cardinality: this is the frequency structure that fits in
  memory at any scale.
- Bloom: the bit set built from the dim side is tiny (≤ m distinct bit
  positions) and broadcast; the fact side probes it with an equi-join per
  hash — exactly how runtime row-group filters work in production engines.
  The query reports the false-positive count, which is deterministic here
  and therefore asserted, not just sampled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.texts import md5_hash_long
from ..sources.tables import load_table

KMV_K = 64
CM_D = 4  # count-min hash rows
CM_W = 512  # counters per row
CM_QUERY_KEYS = 10
BLOOM_M = 4096  # bits
BLOOM_K = 3  # hashes per key
HASH_RANGE = 2.0**32  # md5_hash_long is uniform on [0, 2^32)


# --- KMV distinct-count ------------------------------------------------------


def _min_k_by(du: DataFrame, key: str, k: int = KMV_K) -> DataFrame:
    """(key, n_mins, u_k): the k smallest distinct u values per key via a
    two-level min-k merge — per-input-partition sorted top-k arrays, then
    one k-bounded merge per key. Replaces row_number() over a per-key
    global sort: sort input drops from ALL distinct values to
    partitions x k rows (5x at sf0.1, unbounded at 100 TB, where a per-key
    global sort serializes millions of rows through one task per key).
    Exact and partition-independent — min-k over distinct hashes does not
    depend on how rows are split — so the SQL oracle keeps the simple
    window formulation and still value-matches.
    """
    per_part = (
        du.withColumn("pid", F.spark_partition_id())
        .groupBy(key, "pid")
        .agg(F.slice(F.array_sort(F.collect_list("u")), 1, k).alias("mins"))
    )
    return (
        per_part.groupBy(key)
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("mins"))), 1, k
            ).alias("mins")
        )
        .select(
            key,
            F.size("mins").cast("bigint").alias("n_mins"),
            F.element_at("mins", F.size("mins")).alias("u_k"),
        )
    )


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count estimate of users per event_type,
    next to the exact count and the realized relative error.

    Estimator (Bar-Yossef et al. 2002): hash values to uniform (0,1); if
    the k-th smallest distinct hash is u_k, distinct ≈ (k-1)/u_k; groups
    with fewer than k distinct hashes are exact.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    u = (
        md5_hash_long(F.col("user_id").cast("string"), "kmv") / F.lit(HASH_RANGE)
    ).alias("u")
    du = e.select("event_type", u).distinct()
    sk = _min_k_by(du, "event_type")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_mins") < KMV_K, F.col("n_mins").cast("double")
    ).otherwise((KMV_K - 1) / F.col("u_k"))
    return (
        sk.join(exact, "event_type")
        .select(
            "event_type",
            F.round(est, 2).alias("est_distinct"),
            "exact_distinct",
            F.round(
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 4
            ).alias("rel_err"),
        )
    )


# --- Count-Min frequency -----------------------------------------------------


def _cm_idx(key: F.Column, row: int) -> F.Column:
    return (md5_hash_long(key, f"cm{row}") % CM_W).cast("int")


def countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point queries: estimated vs exact order count for the
    CM_QUERY_KEYS smallest customer keys, plus the (non-negative)
    overestimate — CMS can only err upward, and the test asserts it.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("key")
    )
    # build the d x w grid: d narrow rows per input, then d*w cells
    cell_rows = [
        o.select(F.lit(r).alias("row"), _cm_idx(F.col("key"), r).alias("idx"))
        for r in range(CM_D)
    ]
    grid_in = cell_rows[0]
    for cr in cell_rows[1:]:
        grid_in = grid_in.union(cr)
    grid = grid_in.groupBy("row", "idx").agg(F.count("*").alias("c"))

    keys = (
        o.select(F.col("key").cast("long").alias("custkey"))
        .distinct()
        .orderBy("custkey")
        .limit(CM_QUERY_KEYS)
        .select("custkey", F.col("custkey").cast("string").alias("key"))
    )
    probes = keys.select(
        "custkey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cm_idx(F.col("key"), r).alias("idx")
                    )
                    for r in range(CM_D)
                ]
            )
        ).alias("p"),
    ).select("custkey", F.col("p.row").alias("row"), F.col("p.idx").alias("idx"))
    est = (
        F.broadcast(probes)
        .join(grid, ["row", "idx"])
        .groupBy("custkey")
        .agg(F.min("c").alias("est_count"))
    )
    exact = (
        o.select(F.col("key").cast("long").alias("custkey"))
        .groupBy("custkey")
        .agg(F.count("*").alias("exact_count"))
    )
    return (
        est.join(exact, "custkey")
        .select(
            "custkey",
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count")).alias("overestimate"),
        )
    )


# --- Bloom-filter pre-filter join --------------------------------------------


def _bloom_bits(key: F.Column) -> F.Column:
    return F.array(
        *[
            (md5_hash_long(key, f"bf{i}") % BLOOM_M).cast("int")
            for i in range(BLOOM_K)
        ]
    )


def bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime pre-filter: bits built from high-balance
    customers, probed by every order. One summary row: orders passing the
    filter, orders truly matching, and the deterministic false-positive
    count (pass − true ≥ 0, the Bloom guarantee of no false negatives).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").cast("string").alias("key")
    )
    bits = (
        dim.select(F.explode(_bloom_bits(F.col("key"))).alias("bit")).distinct()
    )
    probed = o.select(
        "o_orderkey",
        F.col("o_custkey").cast("string").alias("key"),
        F.explode(_bloom_bits(F.col("o_custkey").cast("string"))).alias("bit"),
    )
    # an order passes iff all BLOOM_K probe rows find their bit set
    passing = (
        probed.join(F.broadcast(bits), "bit")
        .groupBy("o_orderkey", "key")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") == BLOOM_K)
    )
    n_pass = passing.agg(F.count("*").alias("n_bloom_pass"))
    n_true = (
        o.join(
            dim.select(F.col("key").cast("long").alias("o_custkey")),
            "o_custkey",
            "left_semi",
        )
        .agg(F.count("*").alias("n_true_match"))
    )
    # two one-row aggregates combined lazily — no driver-side collect
    return n_pass.crossJoin(F.broadcast(n_true)).select(
        "n_bloom_pass",
        "n_true_match",
        (F.col("n_bloom_pass") - F.col("n_true_match")).alias("n_false_pos"),
    )


# --- histogram quantile sketch -----------------------------------------------

# --- ANALYZE-style table statistics ------------------------------------------

# (column, is_numeric) — the per-column stats surface over lineitem
STATS_COLS = (
    ("l_orderkey", True),
    ("l_partkey", True),
    ("l_suppkey", True),
    ("l_returnflag", False),
    ("l_linestatus", False),
)


def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics in two scan-free-after-unpivot
    passes: row count, null count, exact NDV, KMV NDV estimate, and numeric
    min/max for each profiled column — the stats a cost-based optimizer
    feeds on (ndv -> join cardinality, min/max -> range pruning).

    Shape: one ``stack`` unpivot (narrow, no shuffle) to (col_name, value)
    grain, then a col_name-keyed aggregation. Everything is mergeable
    (counts add, min/max combine, KMV min-k unions), so at 100 TB this
    runs as map-side partials + a k-row final — no per-column table scans
    the way naive ANALYZE loops do it. The KMV estimate deliberately sits
    NEXT to the exact NDV so the realized error is a checked value, not a
    claim (same discipline as kmv_distinct).
    """
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for name, numeric in STATS_COLS:
        num = f"CAST({name} AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        parts.append(f"'{name}', CAST({name} AS STRING), {num}")
    long_df = li.select(
        F.expr(
            f"stack({len(STATS_COLS)}, {', '.join(parts)}) "
            "AS (col_name, val_str, num_val)"
        )
    )
    base = long_df.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val_str").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null"),
        F.countDistinct("val_str").alias("ndv_exact"),
        F.round(F.min("num_val"), 4).alias("min_num"),
        F.round(F.max("num_val"), 4).alias("max_num"),
    )
    u = (md5_hash_long(F.col("val_str"), "ts") / F.lit(HASH_RANGE)).alias("u")
    du = (
        long_df.filter(F.col("val_str").isNotNull())
        .select("col_name", u)
        .distinct()
    )
    sk = _min_k_by(du, "col_name")
    est = F.when(
        F.col("n_mins") < KMV_K, F.col("n_mins").cast("double")
    ).otherwise((KMV_K - 1) / F.col("u_k"))
    return base.join(sk, "col_name").select(
        "col_name",
        "n_rows",
        "n_null",
        "ndv_exact",
        F.round(est, 2).alias("ndv_kmv_est"),
        "min_num",
        "max_num",
    )


QS_BINS = 128
QS_PROBES = (0.5, 0.9, 0.99)


def quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles of event value from a fixed-width histogram
    (the mergeable fixed-size structure behind approximate percentiles),
    with linear interpolation inside the hit bin — reported next to the
    exact percentile and the realized error.

    Spark's approx_percentile (KLL-like) is seeded engine-side and can't be
    cross-checked by value; a histogram sketch is deterministic, mergeable
    (bin counts add), and O(bins) state — the same scalability story.

    Scale: one min/max pass, one bin aggregation (128 cells after map-side
    partials), then driver-sized frames; the exact percentile alongside is
    the expensive sort-based op the sketch replaces at 100 TB.
    """
    v = (
        load_table(spark, sf_dir, "events")
        .select(F.col("value").cast("double").alias("x"))
        .filter(F.col("x").isNotNull())
    )
    stats = v.agg(
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
        F.count("*").alias("n"),
        *[
            F.round(F.expr(f"percentile(x, {p})"), 4).alias(f"exact_{i}")
            for i, p in enumerate(QS_PROBES)
        ],
    )
    width = (F.col("hi") - F.col("lo")) / QS_BINS
    idx = F.least(
        F.floor((F.col("x") - F.col("lo")) / width), F.lit(QS_BINS - 1)
    ).cast("int")
    bins = (
        v.crossJoin(F.broadcast(stats))
        .select(idx.alias("idx"), "lo", "hi", "n")
        .groupBy("idx", "lo", "hi", "n")
        .agg(F.count("*").alias("cnt"))
    )
    wcum = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.withColumn("cum", F.sum("cnt").over(wcum))
    probes = spark.range(len(QS_PROBES)).select(
        F.col("id").cast("int").alias("pi"),
        F.element_at(
            F.array(*[F.lit(float(p)) for p in QS_PROBES]),
            F.col("id").cast("int") + 1,
        ).alias("p"),
    )
    hit = (
        probes.crossJoin(cum)
        .filter(F.col("cum") >= F.col("p") * F.col("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("pi").orderBy("idx")
            ),
        )
        .filter(F.col("rk") == 1)
    )
    w = (F.col("hi") - F.col("lo")) / QS_BINS
    est = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.col("lo")
        + F.col("idx") * w
        + (F.col("p") * F.col("n") - (F.col("cum") - F.col("cnt")))
        / F.col("cnt")
        * w
    )
    exact = F.element_at(
        F.array(*[F.col(f"exact_{i}") for i in range(len(QS_PROBES))]),
        F.col("pi") + 1,
    )
    return (
        hit.crossJoin(
            F.broadcast(
                stats.select(*[f"exact_{i}" for i in range(len(QS_PROBES))])
            )
        )
        .select(
            "p",
            F.round(est, 4).alias("est_q"),
            exact.alias("exact_q"),
            F.round(F.abs(est - exact) / F.abs(exact), 4).alias("rel_err"),
        )
    )


# --- HyperLogLog distinct-count ----------------------------------------------

HLL_P = 8  # bucket bits
HLL_M = 1 << HLL_P  # 256 registers
HLL_VBITS = 24  # rho is measured on the low 24 hash bits
HLL_VRANGE = 1 << HLL_VBITS
# alpha_m * m^2 * 2^25 precomputed in Python; repr() round-trips the exact
# double into both engines so the single final division is bit-identical.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_EST_NUM = HLL_ALPHA * float(HLL_M) * float(HLL_M) * float(2 * HLL_VRANGE)


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count of orders per return flag (Flajolet et al.
    2007), next to the exact count and the realized relative error.

    Register build: bucket = top 8 bits of the portable md5 hash, rho =
    leading-zero count + 1 of the low 24 bits (computed exactly via the
    length of ``bin()``, which both engines implement — no floating log).
    The estimate's harmonic mean is kept in EXACT integer arithmetic:
    sum(2^-rho_j) is accumulated as sum(2^(25-rho_j)) — every term and every
    partial sum is an integer < 2^53, so the result is addition-order
    independent and the DuckDB twin value-matches bit-for-bit, including
    the realized error. The small-range linear-counting correction (which
    needs ln()) is deliberately not applied — n >> 2.5m here; the zero-
    register count is emitted so a caller could apply it.

    Scale: the sketch state is <= 256 (bucket, max-rho) rows per group
    regardless of input cardinality, built by a map-side-partial max —
    the canonical mergeable distinct sketch for 100 TB inputs. (The exact
    count alongside is for error reporting only.)
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey"
    )
    h = md5_hash_long(F.col("l_orderkey").cast("string"), "hll")
    v = h % HLL_VRANGE
    regs = (
        li.select(
            "l_returnflag",
            F.floor(h / HLL_VRANGE).cast("int").alias("bucket"),
            F.when(v == 0, HLL_VBITS + 1)
            .otherwise(F.lit(HLL_VBITS + 1) - F.length(F.bin(v)))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("l_returnflag", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    g = regs.groupBy("l_returnflag").agg(
        F.count("*").alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), F.lit(HLL_VBITS + 1) - F.col("mj")))
        .cast("long")
        .alias("s_present"),
    )
    zeros = F.lit(HLL_M) - F.col("n_regs")
    s = F.col("s_present") + zeros * F.lit(2 * HLL_VRANGE)
    est = F.lit(HLL_EST_NUM) / s
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    return g.join(exact, "l_returnflag").select(
        "l_returnflag",
        F.col("n_regs").cast("bigint").alias("n_regs"),
        zeros.cast("bigint").alias("n_zero_regs"),
        F.round(est, 2).alias("hll_est"),
        "exact_distinct",
        F.round(
            F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 4
        ).alias("rel_err"),
    )


# --- oracles -----------------------------------------------------------------


def _h(expr: str, salt: str) -> str:
    return f"CAST('0x' || substr(md5('{salt}' || {expr}), 1, 8) AS BIGINT)"


def _cm_idx_sql(expr: str, row: int) -> str:
    return f"CAST({_h(expr, f'cm{row}')} % {CM_W} AS INT)"


def _cm_grid_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT {r} AS row, {_cm_idx_sql('o_custkey::VARCHAR', r)} AS idx"
        " FROM orders"
        for r in range(CM_D)
    )


def _cm_probe_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT custkey, {r} AS row, {_cm_idx_sql('custkey::VARCHAR', r)} AS idx"
        " FROM keys"
        for r in range(CM_D)
    )


def _bloom_bits_sql(expr: str) -> str:
    return ", ".join(
        f"CAST({_h(expr, f'bf{i}')} % {BLOOM_M} AS INT)" for i in range(BLOOM_K)
    )


ORACLES = {
    "table_stats": f"""
        WITH long AS ({" UNION ALL ".join(
            f"SELECT '{name}' AS col_name, CAST({name} AS VARCHAR) AS val_str, "
            + (f"CAST({name} AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)")
            + " AS num_val FROM lineitem"
            for name, numeric in STATS_COLS
        )}),
        base AS (
            SELECT col_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) FILTER (val_str IS NULL) AS BIGINT) AS n_null,
                   CAST(count(DISTINCT val_str) AS BIGINT) AS ndv_exact,
                   round(min(num_val), 4) AS min_num,
                   round(max(num_val), 4) AS max_num
            FROM long GROUP BY col_name
        ),
        du AS (
            SELECT DISTINCT col_name,
                   {_h("val_str", "ts")} / {HASH_RANGE} AS u
            FROM long WHERE val_str IS NOT NULL
        ),
        ranked AS (
            SELECT col_name, u,
                   row_number() OVER (PARTITION BY col_name ORDER BY u) AS rk
            FROM du
        ),
        sk AS (
            SELECT col_name, count(*) AS n_mins, max(u) AS u_k
            FROM ranked WHERE rk <= {KMV_K} GROUP BY col_name
        )
        SELECT b.col_name, n_rows, n_null, ndv_exact,
               round(CASE WHEN n_mins < {KMV_K} THEN n_mins * 1.0
                          ELSE ({KMV_K} - 1) / u_k END, 2) AS ndv_kmv_est,
               min_num, max_num
        FROM base b JOIN sk s ON b.col_name = s.col_name
    """,
    "kmv_distinct": f"""
        WITH du AS (
            SELECT DISTINCT event_type,
                   {_h("user_id::VARCHAR", "kmv")} / {HASH_RANGE} AS u
            FROM events
        ),
        ranked AS (
            SELECT event_type, u,
                   row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk
            FROM du
        ),
        sk AS (
            SELECT event_type, count(*) AS n_mins, max(u) AS u_k
            FROM ranked WHERE rk <= {KMV_K} GROUP BY event_type
        ),
        exact AS (
            SELECT event_type, count(DISTINCT user_id) AS exact_distinct
            FROM events GROUP BY event_type
        )
        SELECT s.event_type,
               round(CASE WHEN n_mins < {KMV_K} THEN n_mins * 1.0
                          ELSE ({KMV_K} - 1) / u_k END, 2) AS est_distinct,
               exact_distinct,
               round(abs(CASE WHEN n_mins < {KMV_K} THEN n_mins * 1.0
                              ELSE ({KMV_K} - 1) / u_k END - exact_distinct)
                     / exact_distinct, 4) AS rel_err
        FROM sk s JOIN exact e ON s.event_type = e.event_type
    """,
    "countmin_freq": f"""
        WITH grid AS (
            SELECT row, idx, count(*) AS c
            FROM ({_cm_grid_sql()}) GROUP BY row, idx
        ),
        keys AS (
            SELECT DISTINCT o_custkey AS custkey FROM orders
            ORDER BY custkey LIMIT {CM_QUERY_KEYS}
        ),
        probes AS ({_cm_probe_sql()}),
        est AS (
            SELECT custkey, min(c) AS est_count
            FROM probes JOIN grid USING (row, idx)
            GROUP BY custkey
        ),
        exact AS (
            SELECT o_custkey AS custkey, count(*) AS exact_count
            FROM orders GROUP BY o_custkey
        )
        SELECT custkey, est_count, exact_count,
               est_count - exact_count AS overestimate
        FROM est JOIN exact USING (custkey)
    """,
    "bloom_prefilter": f"""
        WITH dim AS (
            SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        ),
        bits AS (
            SELECT DISTINCT unnest([{_bloom_bits_sql('c_custkey::VARCHAR')}]) AS bit
            FROM dim
        ),
        probed AS (
            SELECT o_orderkey,
                   unnest([{_bloom_bits_sql('o_custkey::VARCHAR')}]) AS bit
            FROM orders
        ),
        passing AS (
            SELECT o_orderkey
            FROM probed JOIN bits USING (bit)
            GROUP BY o_orderkey
            HAVING count(*) = {BLOOM_K}
        )
        SELECT (SELECT count(*) FROM passing) AS n_bloom_pass,
               (SELECT count(*) FROM orders
                WHERE o_custkey IN (SELECT c_custkey FROM dim)) AS n_true_match,
               (SELECT count(*) FROM passing)
               - (SELECT count(*) FROM orders
                  WHERE o_custkey IN (SELECT c_custkey FROM dim)) AS n_false_pos
    """,
}

_QS_EXACTS = ",\n                   ".join(
    f"round(quantile_cont(x, CAST({p} AS DOUBLE)), 4) AS exact_{i}"
    for i, p in enumerate(QS_PROBES)
)
_QS_PROBE_ROWS = " UNION ALL ".join(
    f"SELECT {i} AS pi, CAST({p} AS DOUBLE) AS p" for i, p in enumerate(QS_PROBES)
)
_QS_EXACT_CASE = " ".join(
    f"WHEN pi = {i} THEN exact_{i}" for i in range(len(QS_PROBES))
)
_QS_W = f"(hi - lo) / {QS_BINS}"
_QS_EST = (
    f"CASE WHEN hi = lo THEN lo ELSE lo + idx * ({_QS_W})"
    f" + (p * n - (cum - cnt)) / cnt * ({_QS_W}) END"
)

ORACLES["quantile_sketch"] = f"""
    WITH v AS (SELECT CAST(value AS DOUBLE) AS x FROM events
               WHERE value IS NOT NULL),
    stats AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n,
                   {_QS_EXACTS}
              FROM v),
    bins AS (
        SELECT CAST(least(floor((x - lo) / ({_QS_W})), {QS_BINS - 1}) AS INT)
                   AS idx,
               count(*) AS cnt
        FROM v, stats GROUP BY 1
    ),
    cum AS (SELECT idx, cnt, sum(cnt) OVER (ORDER BY idx) AS cum FROM bins),
    probes AS ({_QS_PROBE_ROWS}),
    hit AS (
        SELECT pi, p, idx, cnt, cum, n, lo, hi,
               row_number() OVER (PARTITION BY pi ORDER BY idx) AS rk
        FROM probes, cum, stats
        WHERE cum >= p * n
    )
    SELECT p,
           round({_QS_EST}, 4) AS est_q,
           CASE {_QS_EXACT_CASE} END AS exact_q,
           round(abs(({_QS_EST}) - CASE {_QS_EXACT_CASE} END)
                 / abs(CASE {_QS_EXACT_CASE} END), 4) AS rel_err
    FROM hit, (SELECT {", ".join(f"exact_{i}" for i in range(len(QS_PROBES)))}
               FROM stats) s
    WHERE rk = 1
"""

ORACLES["hll_distinct"] = f"""
    WITH h AS (
        SELECT l_returnflag, {_h("l_orderkey::VARCHAR", "hll")} AS hv
        FROM lineitem
    ),
    regs AS (
        SELECT l_returnflag,
               CAST(floor(hv / {HLL_VRANGE}) AS INT) AS bucket,
               max(CASE WHEN hv % {HLL_VRANGE} = 0 THEN {HLL_VBITS + 1}
                        ELSE {HLL_VBITS + 1} - length(bin(hv % {HLL_VRANGE}))
                   END) AS mj
        FROM h GROUP BY 1, 2
    ),
    g AS (
        SELECT l_returnflag, count(*) AS n_regs,
               CAST(sum(power(2.0, {HLL_VBITS + 1} - mj)) AS BIGINT)
                   AS s_present
        FROM regs GROUP BY 1
    ),
    ex AS (
        SELECT l_returnflag,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
        FROM lineitem GROUP BY 1
    )
    SELECT g.l_returnflag,
           CAST(n_regs AS BIGINT) AS n_regs,
           CAST({HLL_M} - n_regs AS BIGINT) AS n_zero_regs,
           round({HLL_EST_NUM!r}
                 / (s_present + ({HLL_M} - n_regs) * {2 * HLL_VRANGE}), 2)
               AS hll_est,
           exact_distinct,
           round(abs({HLL_EST_NUM!r}
                     / (s_present + ({HLL_M} - n_regs) * {2 * HLL_VRANGE})
                     - exact_distinct) / exact_distinct, 4) AS rel_err
    FROM g JOIN ex USING (l_returnflag)
"""


ORACLES["hll_merge_groups"] = f"""
    WITH h AS (
        SELECT event_type, {_h("user_id::VARCHAR", "hllg")} AS hv
        FROM events
    ),
    regs AS (
        SELECT event_type,
               CAST(floor(hv / {HLL_VRANGE}) AS INT) AS bucket,
               max(CASE WHEN hv % {HLL_VRANGE} = 0 THEN {HLL_VBITS + 1}
                        ELSE {HLL_VBITS + 1} - length(bin(hv % {HLL_VRANGE}))
                   END) AS mj
        FROM h GROUP BY 1, 2
    ),
    allregs AS (
        SELECT event_type, bucket, mj FROM regs
        UNION ALL
        SELECT '__all__', bucket, max(mj) FROM regs GROUP BY 2
    ),
    g AS (
        SELECT event_type, count(*) AS n_regs,
               CAST(sum(power(2.0, {HLL_VBITS + 1} - mj)) AS BIGINT)
                   AS s_present
        FROM allregs GROUP BY 1
    ),
    ex AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY 1
        UNION ALL
        SELECT '__all__', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
    )
    SELECT g.event_type,
           round({HLL_EST_NUM!r}
                 / (s_present + ({HLL_M} - n_regs) * {2 * HLL_VRANGE}), 2)
               AS hll_est,
           exact_distinct,
           round(abs({HLL_EST_NUM!r}
                     / (s_present + ({HLL_M} - n_regs) * {2 * HLL_VRANGE})
                     - exact_distinct) / exact_distinct, 4) AS rel_err
    FROM g JOIN ex USING (event_type)
"""


def hll_merge_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY in-plan: per-event-type sketches of distinct users,
    PLUS a ``__all__`` row whose estimate comes from MERGING the per-group
    registers (bucket-wise max) — never from rescanning the data.

    This is the pre-aggregate pattern that pays at 100 TB: persist one
    256-row register set per partition/day/group, answer global distinct
    questions later by register max-merge at query time. The merged
    estimate is mathematically identical to a sketch built directly over
    the union (max is associative/commutative), which the test asserts.

    Same exact-integer harmonic-mean arithmetic as hll_distinct, so both
    engines value-match bit-for-bit including realized error.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    h = md5_hash_long(F.col("user_id").cast("string"), "hllg")
    v = h % HLL_VRANGE
    base = e.select(
        "event_type",
        F.floor(h / HLL_VRANGE).cast("int").alias("bucket"),
        F.when(v == 0, HLL_VBITS + 1)
        .otherwise(F.lit(HLL_VBITS + 1) - F.length(F.bin(v)))
        .cast("int")
        .alias("rho"),
    )
    regs = base.groupBy("event_type", "bucket").agg(F.max("rho").alias("mj"))
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("mj").alias("mj"))
        .withColumn("event_type", F.lit("__all__"))
    )

    def _est(grouped: DataFrame) -> DataFrame:
        g = grouped.groupBy("event_type").agg(
            F.count("*").alias("n_regs"),
            F.sum(F.pow(F.lit(2.0), F.lit(HLL_VBITS + 1) - F.col("mj")))
            .cast("long")
            .alias("s_present"),
        )
        zeros = F.lit(HLL_M) - F.col("n_regs")
        s = F.col("s_present") + zeros * F.lit(2 * HLL_VRANGE)
        return g.select(
            "event_type", (F.lit(HLL_EST_NUM) / s).alias("est")
        )
    ests = _est(regs).unionByName(_est(merged))
    exact = (
        e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
        .unionByName(
            e.agg(
                F.countDistinct("user_id").alias("exact_distinct")
            ).withColumn("event_type", F.lit("__all__"))
        )
    )
    return ests.join(exact, "event_type").select(
        "event_type",
        F.round("est", 2).alias("hll_est"),
        "exact_distinct",
        F.round(
            F.abs(F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


ROLL_DAYS = 7


def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day — the sliding-DISTINCT problem
    (non-associative, so no partial agg helps the exact path) solved twice:

    - EXACT: each (day, user) pair contributes to its day and the 6
      following days (a 7x explode), then count distinct per target day.
      At 100 TB this shuffles 7x the distinct (day, user) volume — the
      cost that motivates the sketch path.
    - HLL: per-day registers (<= 256 rows/day regardless of volume)
      explode 7x and bucket-wise max-merge per target day — the window
      state is constant-size, which is how production metrics pipelines
      actually compute rolling uniques.

    Output: (day, exact_7d, hll_7d, rel_err), realized error included —
    both paths fully value-checked against DuckDB.
    """
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    days = e.select("day").distinct()
    offs = F.explode(F.sequence(F.lit(0), F.lit(ROLL_DAYS - 1))).alias("off")

    du = e.distinct()
    exact = (
        du.select("day", "user_id", offs)
        .select(F.date_add("day", F.col("off")).alias("day"), "user_id")
        .join(days, "day")  # drop target days past the calendar
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_7d"))
    )

    h = md5_hash_long(F.col("user_id").cast("string"), "hllr")
    v = h % HLL_VRANGE
    regs = (
        e.select(
            "day",
            F.floor(h / HLL_VRANGE).cast("int").alias("bucket"),
            F.when(v == 0, HLL_VBITS + 1)
            .otherwise(F.lit(HLL_VBITS + 1) - F.length(F.bin(v)))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    merged = (
        regs.select("day", "bucket", "mj", offs)
        .select(F.date_add("day", F.col("off")).alias("day"), "bucket", "mj")
        .join(days, "day")
        .groupBy("day", "bucket")
        .agg(F.max("mj").alias("mj"))
    )
    g = merged.groupBy("day").agg(
        F.count("*").alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), F.lit(HLL_VBITS + 1) - F.col("mj")))
        .cast("long")
        .alias("s_present"),
    )
    zeros = F.lit(HLL_M) - F.col("n_regs")
    s = F.col("s_present") + zeros * F.lit(2 * HLL_VRANGE)
    raw = F.lit(HLL_EST_NUM) / s
    # small-range (linear counting) correction: rolling windows can hold
    # few distinct users, where the raw harmonic estimate biases high —
    # unlike hll_distinct (n >> 2.5m by construction), this op must be
    # correct across regimes. ln() evaluates identically in both engines
    # under the round(2) output contract (same libm doubles).
    est = F.when(
        (raw <= 2.5 * HLL_M) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)
    return (
        exact.join(g, "day")
        .select(
            "day",
            "exact_7d",
            F.round(est, 2).alias("hll_7d"),
            F.round(F.abs(est - F.col("exact_7d")) / F.col("exact_7d"), 4).alias(
                "rel_err"
            ),
        )
    )


def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV theta-sketch SET OPERATIONS: union / intersection / Jaccard
    estimates between per-event-type distinct-user sketches, with the exact
    values and realized error alongside.

    This is the capability that makes KMV sketches worth shipping at 100 TB:
    two min-k sketches built independently (e.g. on different days, different
    clusters) combine WITHOUT rescanning the base data — union = min-k of the
    merged hash lists; Jaccard = fraction of the union's k smallest hashes
    present in both sketches (Beyer et al., SIGMOD'07); intersection =
    Jaccard x union. Per-pair work is O(k log k) on arrays of 64 doubles —
    driver-trivial next to the one distinct-shuffle that builds the sketches.

    The brute pairwise-exact comparison frame is the oracle's check that the
    estimates land; at scale only the sketch path runs.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    u = (
        md5_hash_long(F.col("user_id").cast("string"), "kmv") / F.lit(HASH_RANGE)
    ).alias("u")
    du = e.select("event_type", u).distinct()
    per_part = (
        du.withColumn("pid", F.spark_partition_id())
        .groupBy("event_type", "pid")
        .agg(F.slice(F.array_sort(F.collect_list("u")), 1, KMV_K).alias("mins"))
    )
    sk = per_part.groupBy("event_type").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("mins"))), 1, KMV_K).alias(
            "mins"
        )
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("mins").alias("mins_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("mins").alias("mins_b"))
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("mins_a"), F.col("mins_b")))),
        1,
        KMV_K,
    )
    calc = pairs.select(
        "type_a",
        "type_b",
        F.size(merged).alias("un"),
        F.element_at(merged, F.size(merged)).alias("u_k"),
        F.size(
            F.filter(
                merged,
                lambda x: F.array_contains(F.col("mins_a"), x)
                & F.array_contains(F.col("mins_b"), x),
            )
        ).alias("in_both"),
    )
    est_union = F.when(F.col("un") < KMV_K, F.col("un").cast("double")).otherwise(
        (KMV_K - 1) / F.col("u_k")
    )
    est_jacc = F.col("in_both") / F.col("un")
    exact_n = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n"))
    d2 = e.distinct()
    exact_i = (
        d2.alias("x")
        .join(d2.alias("y"), (F.col("x.user_id") == F.col("y.user_id"))
              & (F.col("x.event_type") < F.col("y.event_type")))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    # LEFT join + coalesce: a pair whose exact intersection is empty must
    # still appear (inter = 0, jaccard = 0) — an inner join would silently
    # drop disjoint event-type pairs from the "all pairs" contract
    inter0 = F.coalesce(F.col("inter"), F.lit(0))
    exact_union = F.col("na") + F.col("nb") - inter0
    return (
        calc.join(exact_i, ["type_a", "type_b"], "left")
        .join(
            F.broadcast(exact_n.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))),
            "type_a",
        )
        .join(
            F.broadcast(exact_n.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            F.round(est_union, 2).alias("est_union"),
            F.round(est_jacc, 4).alias("est_jaccard"),
            F.round(est_jacc * est_union, 2).alias("est_inter"),
            exact_union.alias("exact_union"),
            F.round(inter0 / exact_union, 4).alias("exact_jaccard"),
        )
    )



_KMV_SET_OPS_SQL = f"""
    WITH du AS (
        SELECT DISTINCT event_type,
               {_h("user_id::VARCHAR", "kmv")} / {HASH_RANGE} AS u
        FROM events
    ),
    ranked AS (
        SELECT event_type, u,
               row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk
        FROM du
    ),
    sk AS (
        SELECT event_type, list(u ORDER BY u) AS mins
        FROM ranked WHERE rk <= {KMV_K} GROUP BY event_type
    ),
    m AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.mins AS mins_a, b.mins AS mins_b,
               list_sort(list_distinct(list_concat(a.mins, b.mins)))[1:{KMV_K}]
                   AS merged
        FROM sk a JOIN sk b ON a.event_type < b.event_type
    ),
    calc AS (
        SELECT type_a, type_b, len(merged) AS un, merged[len(merged)] AS u_k,
               len(list_filter(merged,
                   x -> list_contains(mins_a, x) AND list_contains(mins_b, x)))
                   AS in_both
        FROM m
    ),
    exact_n AS (
        SELECT event_type, count(DISTINCT user_id) AS n
        FROM events GROUP BY event_type
    ),
    d2 AS (SELECT DISTINCT event_type, user_id FROM events),
    exact_i AS (
        SELECT x.event_type AS type_a, y.event_type AS type_b,
               count(*) AS inter
        FROM d2 x JOIN d2 y ON x.user_id = y.user_id
                  AND x.event_type < y.event_type
        GROUP BY 1, 2
    )
    SELECT c.type_a, c.type_b,
           round(CASE WHEN un < {KMV_K} THEN un * 1.0
                      ELSE ({KMV_K} - 1) / u_k END, 2) AS est_union,
           round(in_both / un, 4) AS est_jaccard,
           round((in_both / un)
                 * CASE WHEN un < {KMV_K} THEN un * 1.0
                        ELSE ({KMV_K} - 1) / u_k END, 2) AS est_inter,
           CAST(na.n + nb.n - coalesce(xi.inter, 0) AS BIGINT) AS exact_union,
           round(coalesce(xi.inter, 0)
                 / (na.n + nb.n - coalesce(xi.inter, 0)), 4) AS exact_jaccard
    FROM calc c
    LEFT JOIN exact_i xi ON c.type_a = xi.type_a AND c.type_b = xi.type_b
    JOIN exact_n na ON na.event_type = c.type_a
    JOIN exact_n nb ON nb.event_type = c.type_b
"""

QUERIES = {
    "table_stats": table_stats,
    "kmv_distinct": kmv_distinct,
    "countmin_freq": countmin_freq,
    "bloom_prefilter": bloom_prefilter,
    "quantile_sketch": quantile_sketch,
    "hll_distinct": hll_distinct,
    "hll_merge_groups": hll_merge_groups,
    "rolling_distinct_users": rolling_distinct_users,
    "kmv_set_ops": kmv_set_ops,
}

ORACLES["kmv_set_ops"] = _KMV_SET_OPS_SQL

ORACLES["rolling_distinct_users"] = f"""
    WITH e AS (
        SELECT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM e),
    du AS (SELECT DISTINCT day, user_id FROM e),
    ex AS (
        SELECT t.day, count(DISTINCT d.user_id) AS exact_7d
        FROM (SELECT du.day + CAST(o AS INT) AS day, du.user_id
              FROM du, generate_series(0, {ROLL_DAYS - 1}) AS g(o)) d
        JOIN days t ON d.day = t.day
        GROUP BY t.day
    ),
    h AS (
        SELECT day, {_h("user_id::VARCHAR", "hllr")} AS hv FROM e
    ),
    regs AS (
        SELECT day,
               CAST(floor(hv / {HLL_VRANGE}) AS INT) AS bucket,
               max(CASE WHEN hv % {HLL_VRANGE} = 0 THEN {HLL_VBITS + 1}
                        ELSE {HLL_VBITS + 1} - length(bin(hv % {HLL_VRANGE}))
                   END) AS mj
        FROM h GROUP BY 1, 2
    ),
    merged AS (
        SELECT t.day, r.bucket, max(r.mj) AS mj
        FROM (SELECT regs.day + CAST(o AS INT) AS day, bucket, mj
              FROM regs, generate_series(0, {ROLL_DAYS - 1}) AS g(o)) r
        JOIN days t ON r.day = t.day
        GROUP BY 1, 2
    ),
    g AS (
        SELECT day, count(*) AS n_regs,
               CAST(sum(power(2.0, {HLL_VBITS + 1} - mj)) AS BIGINT)
                   AS s_present
        FROM merged GROUP BY 1
    )
    , est AS (
        SELECT day,
               {HLL_EST_NUM!r}
                   / (s_present + ({HLL_M} - n_regs) * {2 * HLL_VRANGE}) AS raw,
               {HLL_M} - n_regs AS zeros
        FROM g
    ),
    corrected AS (
        SELECT day,
               CASE WHEN raw <= 2.5 * {HLL_M} AND zeros > 0
                    THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / zeros)
                    ELSE raw END AS est
        FROM est
    )
    SELECT ex.day,
           CAST(exact_7d AS BIGINT) AS exact_7d,
           round(est, 2) AS hll_7d,
           round(abs(est - exact_7d) / exact_7d, 4) AS rel_err
    FROM ex JOIN corrected USING (day)
"""


# --------------------------------------------------------------------------
# round-5 restarted-session: AMS F2 (second frequency moment) sketch
# --------------------------------------------------------------------------

AMS_R = 64       # independent sign hashes
AMS_GROUPS = 8   # median-of-means groups (8 means of 8)


def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) sketch of the second frequency moment F2
    of the ``events.user_id`` stream — the self-join-size / repeat-rate
    estimator: S_r = sum_x sign_r(x) * f_x for AMS_R portable md5 sign
    hashes, E[S_r^2] = F2; the estimate is the median of AMS_GROUPS group
    means (median-of-means variance reduction), reported next to exact F2.

    Mergeability (the 100-TB shape): each S_r is a plain linear sum, so
    per-partition/per-day sketches merge by ADDING the 64 counters —
    constant state, one pass, no rescan.

    Exactness: sign hashes, S_r, S_r^2 and group sums are exact integers
    (decimal(38,0) for the squares); the group mean is one exact division;
    the median of the 8 means is the average of the two middle order
    statistics on a deterministic (mean, group) ordering.

    Scale: the stream reduces to the distinct-user frequency frame first,
    so the 64-way explode runs over distinct keys, not raw events.
    """
    e = load_table(spark, sf_dir, "events").select("user_id")
    freq = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    exact = freq.agg(
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)"))
        .alias("f2_exact")
    )
    rep = freq.select(
        "user_id", "c", F.explode(F.sequence(F.lit(0), F.lit(AMS_R - 1))).alias("r")
    )
    h = md5_hash_long(
        F.concat(
            F.lit("ams"), F.col("r").cast("string"), F.lit("|"),
            F.col("user_id").cast("string"),
        )
    )
    signed = rep.withColumn(
        "s", F.when(h % 2 == 0, F.col("c")).otherwise(-F.col("c"))
    )
    s_r = signed.groupBy("r").agg(F.sum("s").alias("sr"))
    grouped = s_r.groupBy((F.col("r") % AMS_GROUPS).alias("g")).agg(
        F.sum(F.col("sr").cast("decimal(38,0)") * F.col("sr").cast("decimal(38,0)"))
        .alias("ssum"),
        F.count(F.lit(1)).alias("k"),
    )
    means = grouped.select(
        "g", (F.col("ssum").cast("double") / F.col("k").cast("double")).alias("m")
    )
    w = Window.orderBy("m", "g")
    ranked = means.withColumn("rn", F.row_number().over(w))
    med = ranked.filter(
        F.col("rn").isin(AMS_GROUPS // 2, AMS_GROUPS // 2 + 1)
    ).agg(F.avg("m").alias("est"))
    return med.crossJoin(F.broadcast(exact)).select(
        F.col("f2_exact").cast("bigint").alias("exact_f2"),
        F.round("est", 2).alias("est_f2"),
        F.round(
            F.abs(F.col("est") - F.col("f2_exact").cast("double"))
            / F.col("f2_exact").cast("double"),
            4,
        ).alias("rel_err"),
        F.lit(AMS_R).cast("int").alias("n_hashes"),
    )


ORACLES["ams_f2_sketch"] = f"""
    WITH freq AS (
        SELECT user_id, count(*) AS c FROM events GROUP BY 1
    ),
    exact AS (SELECT sum(c * c) AS f2_exact FROM freq),
    rep AS (
        SELECT user_id, c, r
        FROM freq, (SELECT unnest(generate_series(0, {AMS_R - 1})) AS r)
    ),
    signed AS (
        SELECT r,
               CASE WHEN CAST('0x' || substr(md5('ams' || r || '|'
                        || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
                        % 2 = 0
                    THEN c ELSE -c END AS s
        FROM rep
    ),
    s_r AS (SELECT r, sum(s) AS sr FROM signed GROUP BY 1),
    grouped AS (
        SELECT r % {AMS_GROUPS} AS g, sum(sr * sr) AS ssum,
               count(*) AS k
        FROM s_r GROUP BY 1
    ),
    means AS (
        SELECT g, CAST(ssum AS DOUBLE) / CAST(k AS DOUBLE) AS m
        FROM grouped
    ),
    ranked AS (
        SELECT m, row_number() OVER (ORDER BY m, g) AS rn FROM means
    ),
    med AS (
        SELECT avg(m) AS est FROM ranked
        WHERE rn IN ({AMS_GROUPS // 2}, {AMS_GROUPS // 2 + 1})
    )
    SELECT CAST(f2_exact AS BIGINT) AS exact_f2,
           round(est, 2) AS est_f2,
           round(abs(est - CAST(f2_exact AS DOUBLE))
                 / CAST(f2_exact AS DOUBLE), 4) AS rel_err,
           CAST({AMS_R} AS INT) AS n_hashes
    FROM med, exact
"""
QUERIES["ams_f2_sketch"] = ams_f2_sketch


def hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set-algebra at query time: for every event-type pair, the
    inclusion-exclusion intersection estimate |A n B| ~= est(A) + est(B)
    - est(A u B), where est(A u B) comes from register MAX-MERGE of the
    two persisted sketches — never from rescanning the data.  The
    companion of hll_merge_groups (union) and kmv_set_ops (KMV algebra):
    inclusion-exclusion is THE reason mergeable sketches beat exact
    distinct counts at 100 TB, and its error (union errors compound) is
    exactly what this audit reports against the exact intersection.

    Same exact-integer register arithmetic as hll_distinct (rho on the
    low 24 hash bits, harmonic sum with zero-register imputation), so
    both engines match bit-for-bit including the realized error.

    Scale: one events reduce to (type x 256 registers); pair expansion
    joins the register frame to a k(k-1)/2-row broadcast pair list; the
    exact check reduces (user, type) distinct pairs user-keyed.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    h = md5_hash_long(F.col("user_id").cast("string"), "hllg")
    v = h % HLL_VRANGE
    base = e.select(
        "event_type",
        F.floor(h / HLL_VRANGE).cast("int").alias("bucket"),
        F.when(v == 0, HLL_VBITS + 1)
        .otherwise(F.lit(HLL_VBITS + 1) - F.length(F.bin(v)))
        .cast("int")
        .alias("rho"),
    )
    regs = base.groupBy("event_type", "bucket").agg(F.max("rho").alias("mj"))

    def est_of(grouped: DataFrame, keys: list) -> DataFrame:
        g = grouped.groupBy(*keys).agg(
            F.count("*").alias("n_regs"),
            F.sum(F.pow(F.lit(2.0), F.lit(HLL_VBITS + 1) - F.col("mj")))
            .cast("long")
            .alias("s_present"),
        )
        s = F.col("s_present") + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(
            2 * HLL_VRANGE
        )
        return g.select(*keys, (F.lit(HLL_EST_NUM) / s).alias("est"))

    types = regs.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .join(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    per = est_of(regs, ["event_type"])
    union_regs = (
        regs.join(
            F.broadcast(pairs),
            (F.col("event_type") == F.col("ta"))
            | (F.col("event_type") == F.col("tb")),
        )
        .groupBy("ta", "tb", "bucket")
        .agg(F.max("mj").alias("mj"))
    )
    uest = est_of(union_regs, ["ta", "tb"]).withColumnRenamed("est", "est_u")
    ut = e.distinct()
    exact = (
        ut.select(F.col("event_type").alias("ta"), F.col("user_id").alias("u"))
        .join(
            ut.select(F.col("event_type").alias("tb"), F.col("user_id").alias("u")),
            "u",
        )
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    j = (
        uest.join(
            F.broadcast(per.select(F.col("event_type").alias("ta"),
                                   F.col("est").alias("est_a"))), "ta")
        .join(
            F.broadcast(per.select(F.col("event_type").alias("tb"),
                                   F.col("est").alias("est_b"))), "tb")
        .join(exact, ["ta", "tb"], "left")
    )
    inter = F.col("est_a") + F.col("est_b") - F.col("est_u")
    ex = F.coalesce(F.col("exact_intersection"), F.lit(0)).cast("double")
    return j.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.round(F.col("est_a"), 2).alias("est_a"),
        F.round(F.col("est_b"), 2).alias("est_b"),
        F.round(F.col("est_u"), 2).alias("est_union"),
        F.round(inter, 2).alias("est_intersection"),
        F.coalesce(F.col("exact_intersection"), F.lit(0)).alias(
            "exact_intersection"
        ),
        F.when(ex > 0, F.round(F.abs(inter - ex) / ex, 4)).alias("rel_err"),
    ).orderBy("type_a", "type_b")


ORACLES["hll_intersection_estimate"] = f"""
    WITH h AS (
        SELECT event_type, {_h("user_id::VARCHAR", "hllg")} AS hv
        FROM events
    ),
    regs AS (
        SELECT event_type,
               CAST(floor(hv / {HLL_VRANGE}) AS INT) AS bucket,
               max(CASE WHEN hv % {HLL_VRANGE} = 0 THEN {HLL_VBITS + 1}
                        ELSE {HLL_VBITS + 1} - length(bin(hv % {HLL_VRANGE}))
                   END) AS mj
        FROM h GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT event_type FROM regs),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM types a, types b WHERE a.event_type < b.event_type
    ),
    per AS (
        SELECT event_type,
               {HLL_EST_NUM!r}
                   / (CAST(sum(power(2.0, {HLL_VBITS + 1} - mj)) AS BIGINT)
                      + ({HLL_M} - count(*)) * {2 * HLL_VRANGE}) AS est
        FROM regs GROUP BY 1
    ),
    uregs AS (
        SELECT p.ta, p.tb, r.bucket, max(r.mj) AS mj
        FROM regs r JOIN pairs p
          ON r.event_type = p.ta OR r.event_type = p.tb
        GROUP BY 1, 2, 3
    ),
    uest AS (
        SELECT ta, tb,
               {HLL_EST_NUM!r}
                   / (CAST(sum(power(2.0, {HLL_VBITS + 1} - mj)) AS BIGINT)
                      + ({HLL_M} - count(*)) * {2 * HLL_VRANGE}) AS est_u
        FROM uregs GROUP BY 1, 2
    ),
    ut AS (SELECT DISTINCT event_type, user_id FROM events),
    exact AS (
        SELECT a.event_type AS ta, b.event_type AS tb,
               CAST(count(*) AS BIGINT) AS exact_intersection
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT u.ta AS type_a, u.tb AS type_b,
           round(pa.est, 2) AS est_a, round(pb.est, 2) AS est_b,
           round(u.est_u, 2) AS est_union,
           round(pa.est + pb.est - u.est_u, 2) AS est_intersection,
           coalesce(e.exact_intersection, 0) AS exact_intersection,
           CASE WHEN coalesce(e.exact_intersection, 0) > 0
                THEN round(abs(pa.est + pb.est - u.est_u
                               - CAST(coalesce(e.exact_intersection, 0)
                                      AS DOUBLE))
                           / CAST(coalesce(e.exact_intersection, 0)
                                  AS DOUBLE), 4)
                END AS rel_err
    FROM uest u
    JOIN per pa ON pa.event_type = u.ta
    JOIN per pb ON pb.event_type = u.tb
    LEFT JOIN exact e ON e.ta = u.ta AND e.tb = u.tb
    ORDER BY 1, 2
"""
QUERIES["hll_intersection_estimate"] = hll_intersection_estimate


DD_GAMMA = 1.02  # relative-accuracy parameter: alpha = (g-1)/(g+1) ~ 0.99%


def ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch (Masson et al., VLDB'19) relative-error quantiles of
    order totals — the RELATIVE-guarantee member of the sketch tier:
    quantile_sketch's fixed-width histogram bounds ABSOLUTE rank error
    and degrades on heavy tails, while DDSketch's log-spaced buckets
    (index = ceil(log_gamma x)) guarantee every estimate within
    (gamma-1)/(gamma+1) ~ 1% of the true VALUE at any scale — and the
    audit columns report the realized error beside that guarantee.

    Buckets are mergeable integer counters (~900 for cent values up to
    6e7) — the canonical 100-TB shape.  The bucket index pico-rounds
    ln(x)/ln(gamma) before ceil so a 1-ulp libm difference can't flip a
    boundary; exact quantiles come from a cross-multiplied integer rank
    pick on the distinct-cents grid (100*cum >= q*N).

    Scale: one groupBy onto the bucket grid (map-side combined), one
    exact-rank pass on the bounded distinct-cents frame for the audit.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    lng = 0.019802627296178876  # ln(1.02), Python literal (no engine log)
    b = F.ceil(F.round(F.log(F.col("cents").cast("double")) / lng, 9))
    buckets = o.groupBy(b.cast("long").alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = buckets.agg(F.sum("c").alias("n"))
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.crossJoin(F.broadcast(tot)).withColumn(
        "cum", F.sum("c").over(w_cum)
    )
    qs = spark.createDataFrame(
        [(50,), (90,), (99,)], "q int"
    )
    # smallest bucket with 100*cum >= q*n (exact integer test)
    pick = (
        cum.join(
            F.broadcast(qs), 100 * F.col("cum") >= F.col("q") * F.col("n")
        )
        .groupBy("q")
        .agg(F.min("b").alias("bq"), F.max("n").alias("n"))
    )
    # gamma^b as exp(b*ln gamma) with the ln literal: pow(double,double)
    # is the least-consistent libm entry point across engines, exp/ln the
    # most (the accepted KM/ln-fold class)
    est = (
        2.0
        * F.exp(F.col("bq").cast("double") * lng)
        / (1.0 + DD_GAMMA)
    )
    # exact quantiles: same integer rank test on the distinct-cents grid
    grid = o.groupBy("cents").agg(F.count(F.lit(1)).alias("gc"))
    gcum = grid.crossJoin(F.broadcast(tot)).withColumn(
        "cum", F.sum("gc").over(Window.orderBy("cents").rowsBetween(
            Window.unboundedPreceding, 0
        ))
    )
    exact = (
        gcum.join(
            F.broadcast(qs), 100 * F.col("cum") >= F.col("q") * F.col("n")
        )
        .groupBy("q")
        .agg(F.min("cents").alias("xq"))
    )
    out = pick.join(exact, "q")
    estv = est / 100.0
    exv = F.col("xq").cast("double") / 100.0
    return out.select(
        "q",
        F.round(estv, 2).alias("dd_estimate"),
        F.round(exv, 2).alias("exact_value"),
        F.round(F.abs(estv - exv) / exv, 6).alias("rel_err"),
        F.round(F.lit((DD_GAMMA - 1.0) / (DD_GAMMA + 1.0)), 6).alias(
            "guarantee"
        ),
    ).orderBy("q")


ORACLES["ddsketch_quantiles"] = f"""
    WITH o AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    buckets AS (
        SELECT CAST(ceil(round(ln(CAST(cents AS DOUBLE))
                               / 0.019802627296178876, 9)) AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM o GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM buckets),
    cum AS (
        SELECT b, c, n,
               sum(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM buckets, tot
    ),
    qs AS (SELECT unnest([50, 90, 99]) AS q),
    pick AS (
        SELECT q, min(b) AS bq, max(n) AS n
        FROM cum JOIN qs ON 100 * cum >= q * n
        GROUP BY 1
    ),
    grid AS (SELECT cents, CAST(count(*) AS BIGINT) AS gc FROM o GROUP BY 1),
    gcum AS (
        SELECT cents, n,
               sum(gc) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cum
        FROM grid, tot
    ),
    exact AS (
        SELECT q, min(cents) AS xq
        FROM gcum JOIN qs ON 100 * cum >= q * n
        GROUP BY 1
    )
    SELECT p.q AS q,
           round(2.0 * exp(CAST(bq AS DOUBLE) * 0.019802627296178876)
                 / (1.0 + {DD_GAMMA}) / 100.0, 2) AS dd_estimate,
           round(CAST(xq AS DOUBLE) / 100.0, 2) AS exact_value,
           round(abs(2.0 * exp(CAST(bq AS DOUBLE) * 0.019802627296178876)
                     / (1.0 + {DD_GAMMA}) / 100.0
                     - CAST(xq AS DOUBLE) / 100.0)
                 / (CAST(xq AS DOUBLE) / 100.0), 6) AS rel_err,
           round(({DD_GAMMA} - 1.0) / ({DD_GAMMA} + 1.0), 6) AS guarantee
    FROM pick p JOIN exact e ON p.q = e.q
    ORDER BY q
"""
QUERIES["ddsketch_quantiles"] = ddsketch_quantiles
