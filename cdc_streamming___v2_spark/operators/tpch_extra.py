"""Remaining TPC-H query shapes (q2, q8, q9, q11, q12, q15, q16, q20, q21).

Completes the 22-query TPC-H shape coverage started in operators/relational.py
and operators/relational_ext.py. The testdata has no partsupp table and no
l_shipmode / l_commitdate / l_receiptdate columns (FIXTURES.md §1), so the
five queries that need them are adapted onto a lineitem-derived supply
relation (distinct (l_partkey, l_suppkey) pairs with shipped-quantity /
unit-cost aggregates) while preserving the *plan shapes* that make each query
interesting:

- q2  : correlated scalar MIN subquery over a shared CTE (decorrelated here
        into a per-part min aggregate + equality join)
- q8  : 8-way join with two roles of nation, conditional-share aggregate
- q9  : profit expression over a 5-way join, group by (nation, year)
- q11 : HAVING-style comparison against a scalar subquery over the same data
- q12 : conditional 2-way counts off a join with an inequality predicate
- q15 : CTE revenue view + scalar MAX subquery equality
- q16 : NOT IN subquery + count(DISTINCT) rollup
- q20 : nested IN subqueries with a correlated quantity threshold
- q21 : EXISTS + NOT EXISTS self-joins on the fact table

Parity discipline (see relational_ext.py): every computed column aliased
identically in Spark and SQL, decimal(18,4) per-term casts for
order-independent float sums, round(...,2) half-up in both engines, BIGINT
casts on counts/years.

Scale notes are per-query in docstrings; the common themes at 100 TB:
supply/CTE relations are computed once and reused (Spark reuses the exchange
when the subtree is identical), scalar subqueries become broadcast
crossJoins (never a single-partition window), and semi/anti joins replace
IN / NOT IN so null-handling and shuffle strategy stay explicit.

Reference parity: the reference (src/dataflow-cdc-stream.py) has no joins or
aggregations at all (SURVEY.md §2.B) — this whole tier is [DRIVER]-mandated
relational surface over the driver's TPC-H-ish testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col: F.Column) -> F.Column:
    """Per-term decimal cast: makes sums exact and order-independent."""
    return col.cast("decimal(18,4)")


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- q2: min-cost supplier (correlated scalar MIN over supply CTE) -----------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every ECONOMY part of size 15, the ASIA supplier(s) offering the
    minimum unit cost (min l_extendedprice/l_quantity over shipped lines).

    Plan shape of TPC-H q2: a correlated scalar-min subquery over the supply
    relation, decorrelated into groupBy(partkey).min + equality join — the
    same rewrite Catalyst's scalar-subquery decorrelation produces, stated
    explicitly so the shuffle structure is visible.

    Scale: supply is one shuffle on (partkey, suppkey); the per-part min is a
    second shuffle on partkey only; supplier/nation/region are broadcast.
    The min-equality join is partkey-partitioned on both sides, so it
    colocates with the per-part min without a third shuffle.
    """
    # r12 audit: asia_supply feeds both the per-part min and the
    # min-equality join, but the duplicate subtrees are IDENTICAL up to
    # the (partkey, suppkey) exchange, so runtime ReusedExchange dedupes
    # the lineitem pass (the r11-§13 losing class for a cut), and the
    # frame is supply-cardinality (NOT bounded) — an eager checkpoint
    # would materialize a fact-scale frame for no saved pass. Left as is.
    li = _t(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))

    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))

    asia_supply = (
        supply.join(s, F.col("sp_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    per_part_min = asia_supply.groupBy(F.col("sp_partkey").alias("mp_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(
            (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
        )
    )
    return (
        asia_supply.join(
            per_part_min,
            (F.col("sp_partkey") == F.col("mp_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(p, F.col("sp_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- q8: national market share ----------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_1's share of ECONOMY-part revenue sold into ASIA customers,
    by order year (1996–1997).

    Scale: the three fact joins (lineitem→part, →orders, →customer) shuffle
    on their keys; both nation roles + region are broadcast so the
    supplier-nation/customer-region attribution adds no shuffle. The share
    is a conditional sum over one grouped pass — no second aggregation.
    """
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    c = _t(spark, sf_dir, "customer")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
        )
    )
    r = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = _dec(_rev())
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("c_nk"))
        .join(r, F.col("c_rk") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- q9: product-type profit (cost proxy: 0.6 * retail price) ----------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on 'widget' parts by supplier nation and order year, with unit
    cost approximated as 0.6 × p_retailprice (no partsupp.ps_supplycost in
    the testdata — FIXTURES.md §1).

    Scale: part is filtered then broadcast (name predicate pushed to the
    scan); lineitem→orders is the only large-large shuffle; per-term
    decimal casts keep the profit sum order-independent across partials.
    """
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    profit_term = _dec(
        _rev() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit_term), 2).cast("double").alias("profit"))
    )


# --- q11: important parts (scalar-subquery threshold) ------------------------


_Q11_NATIONS = ("NATION_1", "NATION_2", "NATION_3")


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue from suppliers in three nations exceeds 0.1% of
    the total such revenue (TPC-H q11's HAVING-vs-scalar-subquery shape).

    Scale: the filtered fact is aggregated once by partkey; the grand total
    is a second aggregate of the *same* grouped result (sum of group sums),
    so the fact is scanned and shuffled once, then the one-row total is
    broadcast back via crossJoin — never a single-partition window.
    """
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(
        _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*_Q11_NATIONS))
    )
    li = _t(spark, sf_dir, "lineitem")
    per_part = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec(_rev())).alias("value"))
    )
    total = per_part.agg(
        (F.sum("value").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("threshold"))
        .select(
            "l_partkey",
            F.round("value", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# --- q12: late shipments by priority class (q12's conditional counts) --------


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems shipped >90 days after their order date in 1996–1997,
    split into high- vs low-priority counts per ship year (adaptation of
    q12's l_shipmode grouping — no shipmode/commitdate in the testdata).

    Scale: one shuffle join on orderkey with the lateness inequality inside
    the join condition; the two conditional counts fold into one partial
    aggregation (map-side combine) per year.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


# --- q15: top supplier (CTE view + scalar MAX equality) ----------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum revenue in 1996 Q1 (TPC-H q15: revenue
    CTE referenced twice — once grouped, once for its max).

    Scale: revenue is one shuffle on suppkey; the scalar max is an
    aggregate of that small grouped result broadcast back via crossJoin.
    Exact decimal equality (not float) makes the tie semantics portable.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec(_rev())).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --- q16: supplier counts per part attribute (NOT IN + count distinct) -------


_Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) over the observed
    supply pairs, excluding brand 1, PROMO types, and suppliers whose name
    contains '7' (TPC-H q16's NOT IN complaint-supplier shape → anti join).

    Scale: supply dedups (partkey, suppkey) in one shuffle; the excluded
    suppliers are a broadcast anti join (NOT IN on a non-null key is
    exactly left_anti); count(DISTINCT) re-shuffles on the group keys only.
    """
    li = _t(spark, sf_dir, "lineitem")
    supply = li.select(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).distinct()
    bad = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").like("PROMO%"))
            & (F.col("p_size").isin(*_Q16_SIZES))
        )
    )
    return (
        supply.join(bad, F.col("sp_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("sp_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("sp_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- q20: suppliers over a correlated quantity threshold ---------------------


_Q20_NATIONS = ("NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5")


def q20_supply_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers (in five nations) who shipped >30% of any widget part's
    total 1997 volume (TPC-H q20's nested IN + correlated threshold, with
    the supply pair's shipped quantity standing in for ps_availqty).

    Scale: pair quantities and per-part totals are two aggregations off one
    shuffle on partkey (pair agg re-used for the total via a second partial
    agg); parts filter is broadcast-semi; the final supplier IN is a
    suppkey semi join against the small qualifying-pair set.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    pairs = li.groupBy(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).agg(F.sum("l_quantity").alias("qty97"))
    part_total = pairs.groupBy(F.col("sp_partkey").alias("pt_partkey")).agg(
        F.sum("qty97").alias("part_qty97")
    )
    widget = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    qualifying = (
        pairs.join(widget, F.col("sp_partkey") == F.col("p_partkey"), "left_semi")
        .join(part_total, F.col("sp_partkey") == F.col("pt_partkey"))
        .filter(F.col("qty97") > 0.3 * F.col("part_qty97"))
        .select("sp_suppkey")
    )
    n = F.broadcast(
        _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*_Q20_NATIONS))
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("sp_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


# --- q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ------------


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier count of finalized multi-supplier orders where ONLY this
    supplier shipped late (>90 days after order date) — TPC-H q21's
    EXISTS / NOT EXISTS pair, with shipdate lateness standing in for the
    receipt/commit comparison (columns absent, FIXTURES.md §1).

    Scale: l1 (late lines of 'F' orders) carries o_orderdate so both the
    semi and anti self-joins correlate on orderkey alone — all three legs
    shuffle on orderkey and colocate; supplier/nation are broadcast.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
    ).select("l_orderkey", "l_suppkey", "o_orderdate")

    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    other_exists = (F.col("l_orderkey") == F.col("x_orderkey")) & (
        F.col("l_suppkey") != F.col("x_suppkey")
    )
    waiting = l1.join(l2, other_exists, "left_semi").join(
        l2,
        other_exists
        & (F.col("x_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_anti",
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(
        _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*_Q20_NATIONS))
    )
    return (
        waiting.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_late_shipments": q12_late_shipments,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_count": q16_supplier_part_count,
    "q20_supply_threshold": q20_supply_threshold,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": """
        WITH supply AS (
          SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
                 min(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem GROUP BY 1, 2)
        SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_brand
        FROM part
        JOIN supply   ON p_partkey = sp_partkey
        JOIN supplier ON sp_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND p_type = 'ECONOMY' AND r_name = 'ASIA'
          AND unit_cost = (SELECT min(s2.unit_cost)
                           FROM supply s2
                           JOIN supplier sp2 ON s2.sp_suppkey = sp2.s_suppkey
                           JOIN nation n2 ON sp2.s_nationkey = n2.n_nationkey
                           JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                           WHERE r2.r_name = 'ASIA' AND s2.sp_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q8_market_share": """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                     / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
        FROM (SELECT o_orderdate,
                     CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
                     n2.n_name AS nation
              FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
                AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                    AND TIMESTAMP '1997-12-31') t
        GROUP BY o_year
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   - 0.6 * p_retailprice * l_quantity
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, o_year
    """,
    "q11_important_parts": """
        WITH pv AS (
          SELECT l_partkey,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS value
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
          GROUP BY l_partkey)
        SELECT l_partkey, CAST(round(value, 2) AS DOUBLE) AS part_value
        FROM pv
        WHERE CAST(value AS DOUBLE) >
              (SELECT CAST(sum(value) AS DOUBLE) * 0.001 FROM pv)
    """,
    "q12_late_shipments": """
        SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL '90 days'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY ship_year
    """,
    "q15_top_supplier": """
        WITH rev AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY 1)
        SELECT s_suppkey, s_name, CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT max(total_rev) FROM rev)
        ORDER BY s_suppkey
    """,
    "q16_supplier_part_count": """
        WITH supply AS (SELECT DISTINCT l_partkey AS sp_partkey,
                                        l_suppkey AS sp_suppkey
                        FROM lineitem)
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT sp_suppkey) AS BIGINT) AS supplier_cnt
        FROM part JOIN supply ON p_partkey = sp_partkey
        WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1,5,10,15,20,25,30,35)
          AND sp_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_name LIKE '%7%')
        GROUP BY p_brand, p_type, p_size
    """,
    "q20_supply_threshold": """
        WITH supply AS (
          SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
                 sum(l_quantity) AS qty97
          FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1, 2)
        SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
          AND s_suppkey IN (
            SELECT sp_suppkey FROM supply
            WHERE sp_partkey IN (SELECT p_partkey FROM part
                                 WHERE p_name LIKE '%widget%')
              AND qty97 > (SELECT 0.3 * sum(l_quantity) FROM lineitem l2
                           WHERE l2.l_partkey = supply.sp_partkey
                             AND year(l2.l_shipdate) = 1997))
    """,
    "q21_waiting_suppliers": """
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL '90 days'
          AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL '90 days')
        GROUP BY s_name
    """,
}
