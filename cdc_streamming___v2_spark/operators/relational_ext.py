"""Extended relational surface: adapted TPC-H shapes + scalar-function tiers.

Continues operators/relational.py (same parity discipline: identical aliases,
round() on float aggregates, BIGINT casts, deterministic LIMIT orders). The
testdata is trimmed TPC-H (no partsupp, no comment/commitdate/shipmode
columns — FIXTURES.md), so the classic queries are adapted to the columns
that exist while keeping their plan shapes: correlated EXISTS (q4), 2-nation
volume join (q7), top-k join agg (q10), outer-join distribution (q13),
conditional-ratio agg (q14), correlated scalar subquery (q17), HAVING on a
fact rollup (q18), disjunctive join predicates (q19), scalar subquery +
anti join (q22), plus CUBE / GROUPING SETS / PIVOT and the math / array
scalar-function tiers (SURVEY.md §2.B rows "math", "array/map").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, dot
from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- adapted TPC-H join/subquery shapes --------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: orders (1996 H1) with a lineitem shipped >60 days
    after the order date, counted by priority.

    Scale: left-semi join shuffles both sides on orderkey once; the date
    predicate rides inside the join condition so no second pass.
    """
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-nation bidirectional volume: revenue between NATION_1 and NATION_2
    by (supp_nation, cust_nation, ship year).

    Scale: nation is broadcast twice under different aliases; the 3 fact
    joins shuffle on orderkey/custkey/suppkey; the disjunctive nation-pair
    predicate is applied post-join on broadcast columns (cheap).
    """
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ),
                2,
            ).cast("double").alias("revenue")
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by lost revenue on returned items (flag 'R') for
    orders placed in 1996 Q1, with nation name.

    Scale: TakeOrderedAndProject for the limit; nation broadcast; filters
    pushed below both shuffle joins.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # exact decimal sum + explicit round(): order-independent and
            # half-up on the true value in both engines (a decimal downcast
            # would truncate in DuckDB but round in Spark)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count distribution: for each order count, how many customers
    have it (customers with zero orders included via LEFT join).

    Scale: two aggregations; the first shuffles on custkey, the second on
    the (tiny-cardinality) count value — AQE coalesces its partitions.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_custs"))


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share (conditional-sum ratio) for Jan 1996 shipments."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-02-01"))
    )
    p = _t(spark, sf_dir, "part")
    # per-term decimal casts make both sums exact and order-independent
    # (the q7 10x lesson); one double ratio at the end
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", disc).otherwise(zero)
                ).cast("double")
                / F.sum(disc).cast("double"),
                2,
            ).alias("promo_revenue_pct")
        )
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: yearly revenue lost to small orders —
    lineitems of Brand#11 parts with quantity < 20% of that part's average.

    Scale: expressed as per-part agg + equi-join (the decorrelated plan a
    good optimizer produces); both sides shuffle on partkey once.
    """
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = _t(spark, sf_dir, "lineitem")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING on a fact rollup: orders whose total quantity exceeds 300,
    with customer and order attributes.

    Scale: the HAVING agg collapses lineitem before the joins — the join
    input is only the qualifying orderkeys (tiny), which AQE then
    broadcasts.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "total_qty",
        )
    )


def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of conjunctive brand/size/quantity bands over the
    part-lineitem join (Catalyst extracts the common partkey equi-key;
    the OR residual evaluates post-join)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    bands = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(bands)
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ),
                2,
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q22_prospect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + anti join: customers with above-average (positive)
    balance and no orders in 1997 Q1, summarized per market segment.
    (The synthetic data gives every customer lifetime orders, so the anti
    join is date-restricted to stay a meaningful shape.)

    Scale: the scalar average is a 1-row agg broadcast into the filter;
    the anti join shuffles on custkey, with the date filter pushed to the
    orders scan so the build side is one quarter of the fact.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# --- grouping-sets machinery -------------------------------------------------


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping combinations of (status, priority)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: (flag), (status), () — sub-cube selection."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: quantity sums per linestatus with returnflag as columns
    (explicit value list keeps the schema static for planning)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"A": "qty_a", "N": "qty_n", "R": "qty_r"})
    )


# --- scalar function tiers ---------------------------------------------------


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/sqrt/floor/ceil/mod/ln over supplier balances."""
    s = _t(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.round(F.abs(bal), 2).alias("abs_bal"),
        F.round(F.sqrt(F.abs(bal)), 4).alias("sqrt_bal"),
        F.floor(bal).cast("long").alias("floor_bal"),
        F.ceil(bal).cast("long").alias("ceil_bal"),
        (F.col("s_suppkey") % 7).cast("long").alias("mod7"),
        F.round(F.log(F.lit(1.0) + F.abs(bal)), 4).alias("ln_bal"),
    )


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over embeddings: size / element_at / aggregate-based
    L2 norm / array_max — all JVM-side lambda expressions, no UDF."""
    e = _t(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    # + 0.0 canonicalizes IEEE negative zero: round(-1e-5, 4) yields -0.0
    # in DuckDB but +0.0 in Spark, and the hash compare distinguishes them
    # (first caught at sf0.1, where a tiny-negative leading component
    # exists). -0.0 + 0.0 == +0.0 under round-to-nearest in both engines.
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        (F.round(F.element_at(v, 1), 4) + F.lit(0.0)).alias("first_val"),
        F.round(F.sqrt(dot(v, v)), 4).alias("l2_norm"),
        F.round(F.array_max(v), 4).alias("max_val"),
    )


def union_all_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two heterogeneous projections + downstream agg."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_acctbal").alias("bal"), F.lit("customer").alias("role")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").alias("bal"), F.lit("supplier").alias("role")
    )
    return (
        c.unionByName(s)
        .groupBy("role")
        .agg(
            F.count("*").alias("n_accounts"),
            F.round(F.sum("bal"), 2).alias("total_bal"),
        )
    )


def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended window-function tier: ntile quartiles, percent_rank,
    cume_dist, lead, and a 3-row moving average — one window spec, unique
    total order (acctbal, custkey) so every engine agrees on frames."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.lead("c_acctbal", 1).over(w), 2).alias("next_bal"),
        F.round(F.avg("c_acctbal").over(w.rowsBetween(-2, 0)), 2).alias("mavg3"),
    )


def window_frame_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-boundary window tier: first_value / last_value / nth_value
    over explicit ROWS frames per customer's orders. The growing frame
    (unbounded preceding .. current) vs the full frame (unbounded ..
    unbounded) distinction is the classic last_value gotcha this pins.
    Unique total order (o_orderdate, o_orderkey) so engines agree."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    grow = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.round(F.first_value("o_totalprice").over(grow), 2).alias(
            "first_price"
        ),
        F.round(F.last_value("o_totalprice").over(grow), 2).alias(
            "running_last_price"
        ),
        F.round(F.last_value("o_totalprice").over(full), 2).alias(
            "final_price"
        ),
        F.round(F.nth_value("o_totalprice", 2).over(full), 2).alias(
            "second_price"
        ),
        F.count(F.lit(1)).over(full).cast("bigint").alias("n_orders"),
    )


def central_tendency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / mode / mean per group. Mode is built explicitly —
    count per (group, value), then rank by (count DESC, value ASC) — because
    the built-in mode() breaks ties arbitrarily in both engines; the
    explicit tie-break makes it deterministic and portable.

    Scale: the (group, value) pre-aggregation is the whole trick — the
    ranking window runs over distinct values per group, not rows. Exact
    interpolated median does need a per-group sort (percentile); at 100 TB
    swap in the mergeable histogram sketch (quantile_sketch) — same
    output contract, bounded state."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity").asc()
    )
    mode = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("cnt").cast("bigint").alias("mode_n"),
        )
    )
    med = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return med.join(mode, "l_returnflag")


def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + string-manipulation tier over part attributes."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), r"^(\S+)", 1).alias("first_word"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("no_vowels"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.reverse(F.col("p_brand")).alias("rev_brand"),
        F.instr(F.col("p_name"), "o").cast("long").alias("pos_o"),
        F.col("p_type").startswith("PROMO").alias("is_promo"),
    )


def array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per nation, the sorted list of its supplier keys
    plus count — sort_array makes the collected order deterministic.

    Output contract: the sorted keys are emitted as a comma-joined STRING
    (not a raw array column) so a harness that canonicalizes results via
    pandas sorting never sees an unhashable list cell; the array semantics
    are unchanged (numeric sort happens before the join)."""
    s = _t(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("s_suppkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("supp_keys"),
        F.count("*").alias("n_suppliers"),
    )


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: build a map per row, extract by key, count keys
    (scalar outputs only, so both engines compare values not map reprs)."""
    o = _t(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "priority").alias("priority_val"),
        F.size(m).cast("long").alias("n_keys"),
    )


WORD_TOP_N = 25


def word_freq_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode word count: top-25 most frequent words across the
    corpus (deterministic ties via word asc). The classic explode ->
    groupBy -> TakeOrdered pipeline; partial aggregation keeps the shuffle
    at distinct-word cardinality, not token count."""
    from ..functions.texts import words
    from ..sources.tables import fan_out

    d = fan_out(_t(spark, sf_dir, "documents"))
    return (
        d.select(F.explode(words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(WORD_TOP_N)
    )


def except_all_bags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL: per-status order-date multiset minus the
    high-value subset — duplicates preserved (vs set-semantics subtract)."""
    o = _t(spark, sf_dir, "orders")
    all_rows = o.select("o_orderstatus", F.year("o_orderdate").alias("yr"))
    rich = o.filter(F.col("o_totalprice") > 200000.0).select(
        "o_orderstatus", F.year("o_orderdate").alias("yr")
    )
    return (
        all_rows.exceptAll(rich)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_remaining"))
    )


def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics tier: nullif/coalesce/null-aware equality and
    NULLS FIRST ordering, over a derived nullable column."""
    o = _t(spark, sf_dir, "orders")
    maybe = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.select(
            "o_orderkey",
            maybe.alias("status_or_null"),
            F.coalesce(maybe, F.lit("OPEN")).alias("status_filled"),
            maybe.eqNullSafe(F.lit("F")).alias("is_f_nullsafe"),
            F.col("o_totalprice").alias("price"),
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_first(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: wide per-flag aggregate -> long (flag, metric, value) rows."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "avg_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --- embedding near-dup (dedup tier, embedding-cosine variant) ---------------



# --- registries --------------------------------------------------------------

def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type: the
    ``props`` JSON column parses once to VARIANT (binary, shreddable —
    the modern path that replaces per-access get_json_object string
    re-parsing), ``variant_get`` extracts the typed field, then plain
    typed aggregation per event type.

    Scale: parse_json + variant_get pipeline inside the scan stage (no
    shuffle before the per-type combine); at 100 TB VARIANT's binary
    encoding avoids N re-parses of the same JSON string per field.
    """
    from ..sources.tables import load_table as _lt

    e = _lt(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count("k").cast("bigint").alias("n_with_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
            F.round(F.sum("k").cast("double") / F.count("k"), 4).alias(
                "avg_k"
            ),
            F.count_distinct("k").cast("bigint").alias("n_distinct_k"),
        )
    )


QUERIES = {
    "variant_props_stats": variant_props_stats,
    "q4_order_priority": q4_order_priority,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_join": q19_disjunctive_join,
    "q22_prospect_customers": q22_prospect_customers,
    "cube_agg": cube_agg,
    "grouping_sets_agg": grouping_sets_agg,
    "pivot_agg": pivot_agg,
    "math_funcs": math_funcs,
    "array_funcs": array_funcs,
    "union_all_agg": union_all_agg,
    "window_ntile_dist": window_ntile_dist,
    "window_frame_funcs": window_frame_funcs,
    "central_tendency": central_tendency,
    "regex_funcs": regex_funcs,
    "array_agg_sorted": array_agg_sorted,
    "map_funcs": map_funcs,
    "word_freq_topn": word_freq_topn,
    "except_all_bags": except_all_bags,
    "null_handling": null_handling,
    "unpivot_metrics": unpivot_metrics,
}

ORACLES = {
    "variant_props_stats": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(k) AS BIGINT) AS n_with_k,
               CAST(min(k) AS INT) AS min_k,
               CAST(max(k) AS INT) AS max_k,
               round(CAST(sum(k) AS DOUBLE) / count(k), 4) AS avg_k,
               CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        GROUP BY event_type
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL '60 days')
        GROUP BY o_orderpriority
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, n_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS revenue,
               round(max(c_acctbal), 2) AS c_acctbal
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q13_customer_distribution": """
        SELECT n_orders, count(*) AS n_custs
        FROM (
            SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY n_orders
    """,
    "q14_promo_effect": """
        SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                      THEN CAST(l_extendedprice * (1 - l_discount)
                                                AS DECIMAL(18,4))
                                      ELSE CAST(0 AS DECIMAL(18,4)) END)
                              AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(18,4))) AS DOUBLE), 2)
                   AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
    "q17_small_qty_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part ON l.l_partkey = p_partkey
        WHERE p_brand = 'Brand#11'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l_quantity) FROM lineitem li
              WHERE li.l_partkey = l.l_partkey)
    """,
    "q18_large_orders": """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice, total_qty
        FROM (
            SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(l_quantity) > 300
        )
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "q19_disjunctive_join": """
        SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_prospect_customers": """
        SELECT c_mktsegment,
               count(*) AS n_custs,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderdate >= TIMESTAMP '1997-01-01'
                            AND o_orderdate <  TIMESTAMP '1997-04-01')
        GROUP BY c_mktsegment
    """,
    "cube_agg": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "grouping_sets_agg": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS total_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "pivot_agg": """
        SELECT l_linestatus,
               round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_a,
               round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_n,
               round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_r
        FROM lineitem
        GROUP BY l_linestatus
    """,
    "math_funcs": """
        SELECT s_suppkey,
               round(abs(s_acctbal), 2)            AS abs_bal,
               round(sqrt(abs(s_acctbal)), 4)      AS sqrt_bal,
               CAST(floor(s_acctbal) AS BIGINT)    AS floor_bal,
               CAST(ceil(s_acctbal)  AS BIGINT)    AS ceil_bal,
               CAST(s_suppkey % 7    AS BIGINT)    AS mod7,
               round(ln(1.0 + abs(s_acctbal)), 4)  AS ln_bal
        FROM supplier
    """,
    "array_funcs": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT vec_id,
               CAST(len(v) AS BIGINT)  AS dim,
               round(v[1], 4) + 0.0    AS first_val,
               round(sqrt(list_dot_product(v, v)), 4) AS l2_norm,
               round(list_max(v), 4)   AS max_val
        FROM e
    """,
    "union_all_agg": """
        SELECT role, count(*) AS n_accounts, round(sum(bal), 2) AS total_bal
        FROM (
            SELECT c_acctbal AS bal, 'customer' AS role FROM customer
            UNION ALL
            SELECT s_acctbal AS bal, 'supplier' AS role FROM supplier
        )
        GROUP BY role
    """,
    "window_ntile_dist": """
        SELECT c_custkey, c_mktsegment,
               round(c_acctbal, 2) AS acctbal,
               ntile(4)       OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist()    OVER w, 6) AS cume,
               round(lead(c_acctbal, 1) OVER w, 2) AS next_bal,
               round(avg(c_acctbal) OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal ASC, c_custkey ASC
                                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                     2) AS mavg3
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
    "window_frame_funcs": """
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_custkey AS BIGINT) AS o_custkey,
               round(first_value(o_totalprice) OVER grow, 2) AS first_price,
               round(last_value(o_totalprice)  OVER grow, 2) AS running_last_price,
               round(last_value(o_totalprice)  OVER whole, 2) AS final_price,
               round(nth_value(o_totalprice, 2) OVER whole, 2) AS second_price,
               CAST(count(*) OVER whole AS BIGINT) AS n_orders
        FROM orders
        WINDOW grow AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate ASC, o_orderkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               whole AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate ASC, o_orderkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)
    """,
    "central_tendency": """
        WITH counts AS (
          SELECT l_returnflag, l_quantity, count(*) AS cnt
          FROM lineitem GROUP BY 1, 2),
        md AS (
          SELECT l_returnflag, l_quantity AS mode_qty,
                 CAST(cnt AS BIGINT) AS mode_n
          FROM (SELECT *, row_number() OVER (
                    PARTITION BY l_returnflag
                    ORDER BY cnt DESC, l_quantity ASC) AS rk
                FROM counts) r
          WHERE rk = 1),
        med AS (
          SELECT l_returnflag,
                 round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
                 round(avg(l_quantity), 4) AS avg_qty,
                 CAST(count(*) AS BIGINT) AS n
          FROM lineitem GROUP BY 1)
        SELECT med.l_returnflag, median_qty, avg_qty, n, mode_qty, mode_n
        FROM med JOIN md USING (l_returnflag)
    """,
    "regex_funcs": """
        SELECT p_partkey,
               regexp_extract(p_name, '^(\\S+)', 1)          AS first_word,
               regexp_replace(p_name, '[aeiou]', '', 'g')    AS no_vowels,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0')      AS key_padded,
               reverse(p_brand)                              AS rev_brand,
               CAST(strpos(p_name, 'o') AS BIGINT)           AS pos_o,
               starts_with(p_type, 'PROMO')                  AS is_promo
        FROM part
    """,
    "array_agg_sorted": """
        SELECT s_nationkey,
               array_to_string(list_sort(list(s_suppkey)), ',') AS supp_keys,
               count(*) AS n_suppliers
        FROM supplier
        GROUP BY s_nationkey
    """,
    "map_funcs": """
        SELECT o_orderkey,
               o_orderstatus   AS status_val,
               o_orderpriority AS priority_val,
               CAST(2 AS BIGINT) AS n_keys
        FROM orders
    """,
    "word_freq_topn": f"""
        SELECT w, count(*) AS n
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
              FROM documents)
        GROUP BY w
        ORDER BY n DESC, w ASC
        LIMIT {WORD_TOP_N}
    """,
    "except_all_bags": """
        SELECT o_orderstatus, count(*) AS n_remaining
        FROM (
            SELECT o_orderstatus, year(o_orderdate) AS yr FROM orders
            EXCEPT ALL
            SELECT o_orderstatus, year(o_orderdate) AS yr FROM orders
            WHERE o_totalprice > 200000.0
        )
        GROUP BY o_orderstatus
    """,
    "null_handling": """
        SELECT o_orderkey,
               nullif(o_orderstatus, 'O')                    AS status_or_null,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN')  AS status_filled,
               nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F'
                                                             AS is_f_nullsafe,
               o_totalprice AS price
        FROM orders
        ORDER BY status_or_null ASC NULLS FIRST, o_orderkey ASC
        LIMIT 100
    """,
    "unpivot_metrics": """
        WITH wide AS (
            SELECT l_returnflag,
                   round(sum(l_quantity), 2)      AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_price,
                   round(avg(l_discount), 4)      AS avg_disc
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, metric, value
        FROM wide
        UNPIVOT (value FOR metric IN (sum_qty, sum_price, avg_disc))
    """,
}
