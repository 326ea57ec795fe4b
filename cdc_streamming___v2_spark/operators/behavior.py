"""Behavioral sequence/affinity operators over the events stream history.

Companions to operators/analytics.py's funnel + retention tier: the
event-transition (Markov) matrix and market-basket affinity — classic
"query the CDC history table" workloads the reference delegates to BigQuery
(README.md:57); here they are first-class.

Scale notes (100 TB events):
- Each operator shuffles the big table on exactly ONE key (user_id or
  l_orderkey); downstream aggregations are on tiny derived frames.
- Basket pairing bounds fan-out by basket size (distinct parts per order,
  max 13 in this corpus): O(k^2) per order after a distinct-prune, never a
  global part x part cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: per-user consecutive event bigrams,
    counted and row-normalized into transition probabilities.

    Plan: one window (lag over user_id ordered by ts, event_id tiebreak for
    determinism) -> (src, dst) count -> probability via a window sum over
    src. The only wide shuffle is the lag's partitionBy(user_id); the
    5x5 transition table is driver-trivial from there.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        e.withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count("*").alias("n"))
    )
    wsrc = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") / F.sum("n").over(wsrc), 6).alias("prob"),
    )


MARKET_BASKET_TOPN = 100


def market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket part affinity: top co-ordered part pairs with support
    and lift, over lineitem baskets (l_orderkey = basket).

    Plan: distinct (order, part) prune first, then a self equi-join on
    l_orderkey with part_a < part_b — fan-out bounded by basket size k
    (O(k^2) per order, k<=13 here), NOT a global part x part cross join.
    Lift denominators come from a per-part order count joined in (part side
    is dimension-sized relative to lineitem -> broadcastable at any SF).
    Deterministic top-N: order by pair count desc, then keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    # scalar total as a broadcast 1-row frame: keeps the whole query one DAG
    # (no driver-side count() action blocking plan reuse)
    tot = op.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_orders")
    )
    part_cnt = op.groupBy("l_partkey").agg(F.count("*").alias("n_ord"))
    a = op.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_n"))
    )
    out = (
        pairs.join(
            F.broadcast(part_cnt.select(F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("n_a"))),
            "part_a",
        )
        .join(
            F.broadcast(part_cnt.select(F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("n_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "pair_n",
            F.round(F.col("pair_n") / F.col("n_orders"), 6).alias("support"),
            F.round(
                (F.col("pair_n") * F.col("n_orders"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("pair_n").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(MARKET_BASKET_TOPN)
    )
    return out


ORACLES = {
    "markov_transitions": """
        WITH seq AS (
            SELECT user_id, event_type AS dst,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts ASC, event_id ASC) AS src
            FROM events
        ),
        pairs AS (
            SELECT src, dst, count(*) AS n
            FROM seq WHERE src IS NOT NULL
            GROUP BY src, dst
        )
        SELECT src, dst, n,
               round(n / sum(n) OVER (PARTITION BY src), 6) AS prob
        FROM pairs
    """,
    "market_basket": f"""
        WITH op AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
        part_cnt AS (
            SELECT l_partkey, count(*) AS n_ord FROM op GROUP BY l_partkey
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*) AS pair_n
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        )
        SELECT part_a, part_b, pair_n,
               round(pair_n / CAST(tot.n_orders AS DOUBLE), 6) AS support,
               round((pair_n * CAST(tot.n_orders AS DOUBLE))
                     / (ca.n_ord * cb.n_ord), 6) AS lift
        FROM pairs
        CROSS JOIN tot
        JOIN part_cnt ca ON pairs.part_a = ca.l_partkey
        JOIN part_cnt cb ON pairs.part_b = cb.l_partkey
        ORDER BY pair_n DESC, part_a ASC, part_b ASC
        LIMIT {MARKET_BASKET_TOPN}
    """,
}

QUERIES = {
    "markov_transitions": markov_transitions,
    "market_basket": market_basket,
}
