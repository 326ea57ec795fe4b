"""Warehouse-maintenance operators: incremental aggregate-view refresh and
z-order data layout.

These are the two table-maintenance jobs a CDC warehouse (the reference's
deployment target — src/dataflow-cdc-stream.py writes append logs that
downstream marts aggregate, README.md:57) runs on a schedule, expressed the
way a 1000-executor cluster runs them:

* ``incremental_agg_maintain`` — refresh a per-group aggregate
  materialized view from yesterday's MV + today's delta batch, NEVER
  rescanning the fact log. All maintained aggregates are mergeable
  (count/sum/min/max; avg derived from sum/count), so refresh cost is
  O(delta) + one join at touched-group cardinality. The oracle is the
  full-log re-aggregation — equality proves the incremental algebra.
* ``zorder_layout`` — multi-dimensional data clustering: interleave the
  bits of two quantized dimensions (customer key x order date) into a
  Z-value and pack rows into files by Z-range. Each file then covers a
  small RECTANGLE in (custkey, date) space, so a scan filtered on EITHER
  dimension prunes most files — the layout trick Delta/Iceberg OPTIMIZE
  ZORDER runs. Output is the per-file extent report (the thing min/max
  file statistics store); the oracle recomputes the same integer bit
  arithmetic in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

MV_SPLIT_TS = "2024-01-20 00:00:00"  # base snapshot | delta batch boundary

def _mv_agg(df: DataFrame) -> DataFrame:
    # sum over DECIMAL, not DOUBLE: decimal addition is exact and
    # associative, so base_sum + delta_sum is bit-identical to the oracle's
    # one-pass full-log sum regardless of grouping or order — double
    # addition is not, and round(±ulp) could flip at a rounding boundary
    # (ADVICE r3). min/max/count are order-insensitive already.
    return df.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(20,6)")).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def incremental_agg_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refresh the (user_id, event_type) aggregate MV incrementally: merge
    the stored base aggregates (events up to MV_SPLIT_TS) with the delta
    batch's aggregates (events after it) via a full-outer group join and
    mergeable combine rules — count/sum add, min/max fold, avg re-derives.

    At 100 TB the base agg IS the stored MV (group-cardinality-sized, not
    fact-sized): the refresh scans only the delta partition (partition
    pruning on ts), shuffles delta-group-cardinality rows, and the merge
    join is keyed by group — the fact log is never re-read. The oracle
    aggregates the full log directly; equality proves the merge algebra.
    """
    e = load_table(spark, sf_dir, "events")
    base = _mv_agg(e.filter(F.col("ts") <= F.lit(MV_SPLIT_TS)))
    delta = _mv_agg(e.filter(F.col("ts") > F.lit(MV_SPLIT_TS)))

    keys = ["user_id", "event_type"]
    b = base.select(*keys, *[F.col(c).alias(f"b_{c}") for c in
                             ("n_events", "sum_value", "min_value", "max_value")])
    d = delta.select(*keys, *[F.col(c).alias(f"d_{c}") for c in
                              ("n_events", "sum_value", "min_value", "max_value")])
    z = F.lit(0).cast("bigint")
    zd = F.lit(0).cast("decimal(20,6)")
    merged = b.join(d, keys, "full").select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_type",
        (F.coalesce("b_n_events", z) + F.coalesce("d_n_events", z))
        .cast("bigint").alias("n_events"),
        (F.coalesce("b_sum_value", zd)
         + F.coalesce("d_sum_value", zd)).alias("sv"),
        F.least("b_min_value", "d_min_value").alias("lo"),
        F.greatest("b_max_value", "d_max_value").alias("hi"),
    )
    # least/greatest skip NULLs in both Spark and DuckDB, so a group seen
    # on only one side folds correctly without special-casing.  sv is exact
    # decimal by here; cast to double only at presentation so the final
    # round() sees the identical value the oracle's one-pass sum produces.
    sv = F.col("sv").cast("double")
    return merged.select(
        "user_id",
        "event_type",
        "n_events",
        F.round(sv, 2).alias("sum_value"),
        F.round(sv / F.col("n_events"), 6).alias("avg_value"),
        F.round("lo", 2).alias("min_value"),
        F.round("hi", 2).alias("max_value"),
    )


_MV_ORACLE = """
    SELECT CAST(user_id AS BIGINT) AS user_id,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE), 2)
               AS sum_value,
           round(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
                 / count(*), 6) AS avg_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Z-order layout

Z_BITS = 4          # bits per dimension -> 16x16 grid, 256 Z-cells
Z_CELLS_PER_FILE = 4  # file_id = z div 4 -> 64 target files


def _interleave_expr(bx: str, by: str) -> str:
    """SQL for the bit-interleaved Z-value — built once, shared verbatim by
    the Spark plan and the DuckDB oracle so the arithmetic cannot drift.
    Pure integer div/mod, exact in both engines."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({bx} div {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({by} div {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering report for orders over (o_custkey, o_orderdate):
    quantize each dimension to 2^Z_BITS range buckets, interleave the bits
    into a Z-value, assign files by Z-range, and report each file's row
    count and per-dimension bucket extent. Low per-file extents are the
    point: a predicate on either dimension alone prunes most files.

    Scale: the quantization bounds come from one tiny agg (broadcast); the
    Z-value is a narrow per-row map; the report is one shuffle at file
    cardinality. The real write path is
    ``df.repartitionByRange(N, "z").sortWithinPartitions("z").write`` —
    range partitioning by Z is what produces the packed files; the report
    here is the min/max statistics a lakehouse stores per file.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    bounds = o.agg(
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.min("o_orderdate").alias("min_d"),
        F.max("o_orderdate").alias("max_d"),
    )
    g = 1 << Z_BITS
    q = o.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            f"(o_custkey - min_ck) * {g} div (max_ck - min_ck + 1)"
        ).alias("bx"),
        F.expr(
            f"datediff(o_orderdate, min_d) * {g}"
            f" div (datediff(max_d, min_d) + 1)"
        ).alias("by"),
    )
    z = q.withColumn("z", F.expr(_interleave_expr("bx", "by")))
    return (
        z.withColumn("file_id", F.expr(f"z div {Z_CELLS_PER_FILE}").cast("int"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("bx").cast("int").alias("min_bx"),
            F.max("bx").cast("int").alias("max_bx"),
            F.min("by").cast("int").alias("min_by"),
            F.max("by").cast("int").alias("max_by"),
        )
        .withColumn(
            "extent_cells",
            (
                (F.col("max_bx") - F.col("min_bx") + 1)
                * (F.col("max_by") - F.col("min_by") + 1)
            ).cast("int"),
        )
    )


def _zorder_oracle() -> str:
    g = 1 << Z_BITS
    # DuckDB: integer // is div; date_diff gives the day index
    inter = _interleave_expr("bx", "by").replace(" div ", " // ")
    return f"""
        WITH bounds AS (
            SELECT min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
                   min(o_orderdate) AS min_d, max(o_orderdate) AS max_d
            FROM orders
        ),
        q AS (
            SELECT (o_custkey - min_ck) * {g} // (max_ck - min_ck + 1) AS bx,
                   date_diff('day', min_d, o_orderdate) * {g}
                       // (date_diff('day', min_d, max_d) + 1) AS by
            FROM orders, bounds
        ),
        zv AS (SELECT bx, by, {inter} AS z FROM q)
        SELECT CAST(z // {Z_CELLS_PER_FILE} AS INT) AS file_id,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(bx) AS INT) AS min_bx, CAST(max(bx) AS INT) AS max_bx,
               CAST(min(by) AS INT) AS min_by, CAST(max(by) AS INT) AS max_by,
               CAST((max(bx) - min(bx) + 1) * (max(by) - min(by) + 1) AS INT)
                   AS extent_cells
        FROM zv
        GROUP BY 1
    """



def incremental_join_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN materialized view — the delta-join
    algebra (Blakeley et al. 1986's counting method, aggregate form): for
    V = orders |><| customer aggregated to (segment, n_orders, revenue),
    when BOTH sides receive deltas the refresh is

        V_new = V_old + agg(dO |><| C_old) + agg(O_old |><| dC)
                      + agg(dO |><| dC)

    because the four join terms partition the new pair set exactly.  Here
    orders AND customers split into old/delta slices (key mod 4 / mod 3),
    the view is maintained through the three delta joins, and the oracle
    recomputes the full join directly — equality proves the algebra, which
    is what lets a 100-TB MV refresh scan only the arriving slices plus
    the (dimension-sized) other side instead of re-joining history.

    Sums run over DECIMAL (exact, associative) so base+delta equals the
    oracle's one-pass sum bit-for-bit; counts merge additively.

    Scale: each delta join shuffles delta-sized rows against a broadcast
    or co-partitioned other side; V_old is group-cardinality-sized.  The
    final merge is a segment-keyed union+sum over 4 tiny aggregates.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o_old = o.filter(F.col("o_orderkey") % 4 != 0)
    o_new = o.filter(F.col("o_orderkey") % 4 == 0)
    c_old = c.filter(F.col("c_custkey") % 3 != 0)
    c_new = c.filter(F.col("c_custkey") % 3 == 0)

    def view(orders, custs):
        return (
            orders.join(F.broadcast(custs), orders.o_custkey == custs.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(20,2)")).alias("rev"),
            )
        )

    v_old = view(o_old, c_old)            # the stored MV
    d1 = view(o_new, c_old)               # dO |><| C_old
    d2 = view(o_old, c_new)               # O_old |><| dC
    d3 = view(o_new, c_new)               # dO |><| dC
    merged = (
        v_old.unionByName(d1).unionByName(d2).unionByName(d3)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("rev").alias("rev"),
        )
    )
    return merged.select(
        "c_mktsegment",
        "n_orders",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
    )


_MV_JOIN_ORACLE = """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE), 2)
               AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
"""


QUERIES = {
    "incremental_join_maintain": incremental_join_maintain,
    "incremental_agg_maintain": incremental_agg_maintain,
    "zorder_layout": zorder_layout,
}

ORACLES = {
    "incremental_join_maintain": _MV_JOIN_ORACLE,
    "incremental_agg_maintain": _MV_ORACLE,
    "zorder_layout": _zorder_oracle(),
}


def partition_skew_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key advisor: for each CANDIDATE partition scheme of
    lineitem (return flag, ship month, supplier), the group-size
    distribution a planner reads before choosing table layout — group
    count, the biggest partition's share (the straggler bound: one task
    per partition means max_share caps parallel speedup), the exact
    p50/p99 group sizes, and the p99/p50 skew ratio.  The advisory
    companion of skew_diagnostics (which profiles ONE join key;
    this compares layout candidates).

    Exactness: group sizes are exact counts; p50/p99 are exact
    order-statistic rank picks (integer-div ranks, row_number over the
    bounded group-size frame); shares and ratios are single float
    divisions rounded 6dp.

    Scale: one groupBy per candidate over lineitem (map-side combined,
    k = 3 scans that AQE can't fuse — acceptable for an offline
    advisor); every window runs on a candidate's bounded group frame.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_shipdate", "l_suppkey"
    )
    cands = [
        ("returnflag_linestatus",
         F.concat_ws("|", "l_returnflag", "l_linestatus")),
        ("ship_month", F.date_format("l_shipdate", "yyyy-MM")),
        ("suppkey", F.col("l_suppkey").cast("string")),
    ]
    frames = []
    for name, expr in cands:
        g = li.groupBy(expr.alias("g")).agg(F.count(F.lit(1)).alias("c"))
        frames.append(g.select(F.lit(name).alias("candidate"), "g", "c"))
    sizes = frames[0].unionAll(frames[1]).unionAll(frames[2])
    w_rank = Window.partitionBy("candidate").orderBy("c", "g")
    ranked = sizes.withColumn("r", F.row_number().over(w_rank))
    stats = ranked.groupBy("candidate").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("c").alias("total"),
        F.max("c").alias("max_rows"),
    )
    # exact rank picks: lower p50 = rank ceil(n/2), p99 = rank ceil(99n/100)
    picks = (
        ranked.join(stats, "candidate")
        .filter(
            (F.col("r") == F.expr("(n_groups + 1) div 2"))
            | (F.col("r") == F.expr("(99 * n_groups + 99) div 100"))
        )
        .groupBy("candidate")
        .agg(
            F.min(
                F.when(
                    F.col("r") == F.expr("(n_groups + 1) div 2"), F.col("c")
                )
            ).alias("p50_rows"),
            F.max(
                F.when(
                    F.col("r") == F.expr("(99 * n_groups + 99) div 100"),
                    F.col("c"),
                )
            ).alias("p99_rows"),
        )
    )
    out = stats.join(picks, "candidate")
    return out.select(
        "candidate",
        F.col("n_groups").cast("long").alias("n_groups"),
        F.col("total").cast("long").alias("total_rows"),
        F.col("max_rows").cast("long").alias("max_rows"),
        F.round(
            F.col("max_rows") / F.col("total").cast("double"), 6
        ).alias("max_share"),
        F.col("p50_rows").cast("long").alias("p50_rows"),
        F.col("p99_rows").cast("long").alias("p99_rows"),
        F.round(
            F.col("p99_rows") / F.col("p50_rows").cast("double"), 6
        ).alias("p99_p50_ratio"),
    ).orderBy("candidate")


_SKEW_CAND_SQL = """
        SELECT 'returnflag_linestatus' AS candidate,
               concat_ws('|', l_returnflag, l_linestatus) AS g
        FROM lineitem
        UNION ALL
        SELECT 'ship_month', strftime(CAST(l_shipdate AS DATE), '%Y-%m')
        FROM lineitem
        UNION ALL
        SELECT 'suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
"""

ORACLES_partition_skew = f"""
    WITH sizes AS (
        SELECT candidate, g, CAST(count(*) AS BIGINT) AS c
        FROM ({_SKEW_CAND_SQL})
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY candidate
                                     ORDER BY c, g) AS r,
               count(*) OVER (PARTITION BY candidate) AS n_groups,
               sum(c) OVER (PARTITION BY candidate) AS total,
               max(c) OVER (PARTITION BY candidate) AS max_rows
        FROM sizes
    ),
    picks AS (
        SELECT candidate,
               min(CASE WHEN r = (n_groups + 1) // 2 THEN c END) AS p50_rows,
               max(CASE WHEN r = (99 * n_groups + 99) // 100 THEN c END)
                   AS p99_rows,
               max(n_groups) AS n_groups, max(total) AS total,
               max(max_rows) AS max_rows
        FROM ranked
        GROUP BY 1
    )
    SELECT candidate, CAST(n_groups AS BIGINT) AS n_groups,
           CAST(total AS BIGINT) AS total_rows,
           CAST(max_rows AS BIGINT) AS max_rows,
           round(max_rows * 1.0 / total, 6) AS max_share,
           CAST(p50_rows AS BIGINT) AS p50_rows,
           CAST(p99_rows AS BIGINT) AS p99_rows,
           round(p99_rows * 1.0 / p50_rows, 6) AS p99_p50_ratio
    FROM picks
    ORDER BY candidate
"""

QUERIES["partition_skew_advisor"] = partition_skew_advisor
ORACLES["partition_skew_advisor"] = ORACLES_partition_skew


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key health across every star-schema edge: per edge, child
    rows, ORPHANS (children whose parent key is missing — the signature
    of out-of-order CDC apply: a lineitem change landing before its
    order's insert), parents, and CHILDLESS parents (real business
    signal: customers who never ordered).  The audit a CDC warehouse
    runs after every backfill; pairs with fd_violations (functional
    dependencies) on the constraint-audit shelf.

    ONE declarative plan (a union of five 1-row edge aggregates — no
    driver-side .count() loop; the first cut launched ~20 sequential
    jobs and paid ~1 s of scheduling overhead each): per edge, a full
    outer join of the distinct child keys (with multiplicities) against
    the distinct parent keys, folded into the four counts with
    conditional sums.  Parent sides broadcast where they are dims.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    def edge(name, child, ck, parent, pk):
        ckeys = child.groupBy(F.col(ck).alias("__k")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        pkeys = parent.select(F.col(pk).alias("__k")).distinct().withColumn(
            "__p", F.lit(1)
        )
        j = ckeys.join(pkeys, "__k", "full_outer")
        return j.agg(
            F.lit(name).alias("edge"),
            F.sum(F.coalesce(F.col("__n"), F.lit(0))).alias("n_child"),
            F.sum(
                F.when(F.col("__p").isNull(), F.col("__n")).otherwise(0)
            ).alias("n_orphans"),
            F.sum(F.coalesce(F.col("__p"), F.lit(0))).alias("n_parents"),
            F.sum(
                F.when(F.col("__n").isNull() & F.col("__p").isNotNull(), 1)
                .otherwise(0)
            ).alias("n_childless"),
        )

    edges = [
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey", s, "s_suppkey"),
        edge("orders->customer", o, "o_custkey", c, "c_custkey"),
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out.select(
        "edge",
        "n_child",
        "n_orphans",
        F.round(F.col("n_orphans") / F.col("n_child"), 6).alias(
            "orphan_share"
        ),
        "n_parents",
        "n_childless",
        F.round(F.col("n_childless") / F.col("n_parents"), 6).alias(
            "childless_share"
        ),
    ).orderBy("edge")


ORACLES["referential_integrity_audit"] = """
    WITH edges AS (
        SELECT 'lineitem->orders' AS edge,
               (SELECT count(*) FROM lineitem) AS n_child,
               (SELECT count(*) FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
                   AS n_orphans,
               (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_parents,
               (SELECT count(*) FROM (
                    SELECT DISTINCT o_orderkey FROM orders
                    WHERE o_orderkey NOT IN
                          (SELECT l_orderkey FROM lineitem))) AS n_childless
        UNION ALL
        SELECT 'lineitem->part',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem
                WHERE l_partkey NOT IN (SELECT p_partkey FROM part)),
               (SELECT count(DISTINCT p_partkey) FROM part),
               (SELECT count(*) FROM (
                    SELECT DISTINCT p_partkey FROM part
                    WHERE p_partkey NOT IN
                          (SELECT l_partkey FROM lineitem)))
        UNION ALL
        SELECT 'lineitem->supplier',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem
                WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)),
               (SELECT count(DISTINCT s_suppkey) FROM supplier),
               (SELECT count(*) FROM (
                    SELECT DISTINCT s_suppkey FROM supplier
                    WHERE s_suppkey NOT IN
                          (SELECT l_suppkey FROM lineitem)))
        UNION ALL
        SELECT 'orders->customer',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders
                WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
               (SELECT count(DISTINCT c_custkey) FROM customer),
               (SELECT count(*) FROM (
                    SELECT DISTINCT c_custkey FROM customer
                    WHERE c_custkey NOT IN
                          (SELECT o_custkey FROM orders)))
        UNION ALL
        SELECT 'customer->nation',
               (SELECT count(*) FROM customer),
               (SELECT count(*) FROM customer
                WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)),
               (SELECT count(DISTINCT n_nationkey) FROM nation),
               (SELECT count(*) FROM (
                    SELECT DISTINCT n_nationkey FROM nation
                    WHERE n_nationkey NOT IN
                          (SELECT c_nationkey FROM customer)))
    )
    SELECT edge, CAST(n_child AS BIGINT) AS n_child,
           CAST(n_orphans AS BIGINT) AS n_orphans,
           round(n_orphans * 1.0 / n_child, 6) AS orphan_share,
           CAST(n_parents AS BIGINT) AS n_parents,
           CAST(n_childless AS BIGINT) AS n_childless,
           round(n_childless * 1.0 / n_parents, 6) AS childless_share
    FROM edges
    ORDER BY edge
"""
QUERIES["referential_integrity_audit"] = referential_integrity_audit


def key_candidate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery over orders: for each candidate column
    set, total vs distinct rows, duplicate mass, and the is_unique
    verdict — the profiling step before declaring a MERGE key or a
    bucketing column (a non-unique merge key silently fans out
    updates).  Companion of fd_violations (which checks a DECLARED
    dependency; this discovers candidates).

    Exact integer counts; one aggregate per candidate (4 scans, an
    offline profiler's cost).
    """
    o = load_table(spark, sf_dir, "orders")
    cands = [
        ("o_orderkey", [F.col("o_orderkey")]),
        ("o_custkey", [F.col("o_custkey")]),
        ("o_custkey+o_orderdate", [F.col("o_custkey"), F.col("o_orderdate")]),
        ("o_orderdate", [F.col("o_orderdate")]),
    ]
    frames = []
    for name, cols in cands:
        g = o.groupBy(*cols).agg(F.count(F.lit(1)).alias("c"))
        agg = g.agg(
            F.lit(name).alias("candidate"),
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "dup_rows"
            ),
        )
        frames.append(agg)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.select(
        "candidate",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("dup_rows").cast("long").alias("dup_rows"),
        (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
        F.round(F.col("n_distinct") / F.col("n_rows").cast("double"), 6)
        .alias("uniqueness"),
    ).orderBy("candidate")


ORACLES["key_candidate_scan"] = """
    WITH c1 AS (
        SELECT 'o_orderkey' AS candidate, sum(c) AS n_rows,
               count(*) AS n_distinct,
               sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_rows
        FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
    ),
    c2 AS (
        SELECT 'o_custkey', sum(c), count(*),
               sum(CASE WHEN c > 1 THEN c ELSE 0 END)
        FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey)
    ),
    c3 AS (
        SELECT 'o_custkey+o_orderdate', sum(c), count(*),
               sum(CASE WHEN c > 1 THEN c ELSE 0 END)
        FROM (SELECT count(*) AS c FROM orders
              GROUP BY o_custkey, o_orderdate)
    ),
    c4 AS (
        SELECT 'o_orderdate', sum(c), count(*),
               sum(CASE WHEN c > 1 THEN c ELSE 0 END)
        FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderdate)
    ),
    u AS (
        SELECT * FROM c1 UNION ALL SELECT * FROM c2
        UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
    )
    SELECT candidate, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(dup_rows AS BIGINT) AS dup_rows,
           n_rows = n_distinct AS is_unique,
           round(n_distinct * 1.0 / n_rows, 6) AS uniqueness
    FROM u
    ORDER BY candidate
"""
QUERIES["key_candidate_scan"] = key_candidate_scan
