"""Relational operator surface (SURVEY.md §2.B) as named queries.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable built with the
DataFrame API (declarative — Catalyst does pushdown/pruning/join selection),
paired with an ANSI-SQL oracle string for DuckDB in ``ORACLES``.

Parity discipline (SURVEY.md §7 risk register):
- every computed column is aliased identically on both sides;
- every float aggregate is ``round(x, 2)`` on both sides (FP sum-order);
- ints produced by functions (year, size, ...) are cast to BIGINT on both
  sides (Spark int vs DuckDB bigint);
- every LIMIT has a deterministic total order (rounded measure + key).

Scale notes per query are inline; the general pattern: small dims
(region/nation, fixed cardinality) are explicitly broadcast; fact-fact
joins shuffle on their keys and rely on AQE for skew; aggregations are
partial+final automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- scans / filter / aggregation -------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg, 8 aggregates, 2 group keys.

    Scale: partial aggregation map-side collapses ~600k rows/SF0.1 to 8
    groups before the shuffle; at 100 TB the same plan moves only
    n_partitions x n_groups rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-group filtered aggregate; all predicates pushed to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / count-distinct / avg per group."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with subtotal rows (grouping-sets machinery)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def case_when_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot-style manual buckets)."""
    li = _t(spark, sf_dir, "lineitem")
    big = F.when(F.col("l_quantity") > 25, 1).otherwise(0)
    return li.groupBy("l_returnflag").agg(
        F.sum(big).cast("long").alias("n_big"),
        F.sum(1 - big).cast("long").alias("n_small"),
        F.round(
            F.avg(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 2
        ).alias("avg_price_high_disc"),
    )


# --- joins -------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-10.

    Scale: customer->orders is a shuffle join on custkey; orders->lineitem
    shuffles on orderkey. Filters applied before the joins (Catalyst pushes
    them below). Top-10 runs as TakeOrderedAndProject — no global sort.
    """
    cutoff = F.lit("1996-06-15")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
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
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join; region/nation broadcast, customer==supplier nation.

    Scale: the two fixed-cardinality dims are broadcast (no shuffle);
    the fact joins shuffle on orderkey/custkey; the c_nationkey=s_nationkey
    equality is an extra join predicate, not a separate join.
    """
    r = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
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


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers that placed at least one order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey")


def join_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + null handling: order count per customer incl. zero."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (TakeOrderedAndProject)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


# --- window functions --------------------------------------------------------


def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / lag / running sum over per-customer order history."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_total"),
    )


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand (row_number <= k pattern)."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rk")
    )


# --- set operations ----------------------------------------------------------


def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1995 and 1996."""
    o = _t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


def set_ops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers active in 1995 but not in 1996."""
    o = _t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.subtract(y96)


# --- scalar function surface -------------------------------------------------


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substring/length/split/instr over part names."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("up_name"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.size(F.split(F.col("p_name"), " ")).cast("long").alias("n_words"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
    )


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / year / month rollup of order volume by month."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_revenue"),
        )
        .withColumn("order_year", F.year("order_month").cast("long"))
        .withColumn("order_mm", F.month("order_month").cast("long"))
    )


def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_id", "event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# --- registries --------------------------------------------------------------

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q6_forecast_revenue": q6_forecast_revenue,
    "agg_distinct": agg_distinct,
    "rollup_agg": rollup_agg,
    "case_when_agg": case_when_agg,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_outer_coalesce": join_outer_coalesce,
    "top_customers": top_customers,
    "window_rank_lag": window_rank_lag,
    "window_topk_per_group": window_topk_per_group,
    "set_ops_customers": set_ops_customers,
    "set_ops_except": set_ops_except,
    "string_funcs": string_funcs,
    "date_funcs": date_funcs,
    "json_funcs": json_funcs,
}

# DuckDB oracle SQL twins. Tables are pre-registered views; aliases and
# rounding mirror the Spark side exactly (driver hash-compares values).
ORACLES = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                    AS sum_qty,
               round(sum(l_extendedprice), 2)                               AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 2)                                    AS avg_qty,
               round(avg(l_extendedprice), 2)                               AS avg_price,
               round(avg(l_discount), 4)                                    AS avg_disc,
               count(*)                                                     AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 25
    """,
    "agg_distinct": """
        SELECT c_mktsegment,
               count(*)                      AS n_customers,
               count(DISTINCT c_nationkey)   AS n_nations,
               round(avg(c_acctbal), 2)      AS avg_bal,
               round(min(c_acctbal), 2)      AS min_bal,
               round(max(c_acctbal), 2)      AS max_bal
        FROM customer
        GROUP BY c_mktsegment
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus,
               count(*)                 AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "case_when_agg": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
               CAST(sum(CASE WHEN l_quantity > 25 THEN 0 ELSE 1 END) AS BIGINT) AS n_small,
               round(avg(CASE WHEN l_discount > 0.05 THEN l_extendedprice END), 2)
                   AS avg_price_high_disc
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "q3_shipping_priority": """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-06-15'
          AND l_shipdate  > TIMESTAMP '1996-06-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "join_semi": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_anti": """
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_outer_coalesce": """
        SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "top_customers": """
        SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS total_spent
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY total_spent DESC, c_custkey ASC
        LIMIT 10
    """,
    "window_rank_lag": """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn,
               round(lag(o_totalprice) OVER w, 2) AS prev_price,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        FROM orders
        WHERE o_custkey <= 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    "window_topk_per_group": """
        SELECT p_brand, p_partkey, p_name, p_retailprice, rk
        FROM (
            SELECT p_brand, p_partkey, p_name, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
            FROM part
        )
        WHERE rk <= 3
    """,
    "set_ops_customers": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "set_ops_except": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "string_funcs": """
        SELECT p_partkey,
               upper(p_name)                                    AS up_name,
               substr(p_name, 1, 8)                             AS name_prefix,
               CAST(length(p_name) AS BIGINT)                   AS name_len,
               CAST(length(string_split(p_name, ' ')) AS BIGINT) AS n_words,
               p_brand || '#' || p_type                         AS brand_type
        FROM part
    """,
    "date_funcs": """
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               count(*)                                AS n_orders,
               round(sum(o_totalprice), 2)             AS month_revenue,
               CAST(year(o_orderdate)  AS BIGINT)      AS order_year,
               CAST(month(o_orderdate) AS BIGINT)      AS order_mm
        FROM orders
        GROUP BY date_trunc('month', o_orderdate),
                 year(o_orderdate), month(o_orderdate)
    """,
    "json_funcs": """
        SELECT event_type,
               count(*)                                              AS n_events,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
               round(sum(value), 2)                                  AS sum_value
        FROM events
        GROUP BY event_type
    """,
}
