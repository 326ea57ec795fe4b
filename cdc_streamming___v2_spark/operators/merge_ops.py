"""Scale-pattern operators with algebraic correctness proofs: CDC MERGE
(snapshot + change batch) and salted skew-join.

Both queries are implemented the way you'd run them on a 1000-executor
cluster, and their oracles are the SIMPLE formulation of the same result —
so the check proves the scale construction is semantics-preserving:

* ``cdc_merge_apply``: snapshot-as-of-T  MERGE  changes-after-T  ==
  latest-state over the full log. This is the incremental-materialization
  path a real CDC warehouse runs (compact yesterday's snapshot + today's
  changes) instead of re-windowing the entire history — the full-log window
  re-shuffles ALL of history every refresh; the merge shuffles only the
  day's delta plus one join against the (much smaller) snapshot.
* ``skew_salted_join``: fact side salted into SALT sub-keys, dim side
  replicated per salt — the standard hot-key decomposition (what AQE
  skew-join does adaptively, expressed manually so it also works where AQE
  can't see the skew, e.g. pre-AQE engines or streaming joins). Oracle is
  the unsalted join: identical result, SALT× smaller max-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .history import latest_state

SPLIT_TS = "2024-01-20 00:00:00"
_TOMBSTONE = "error"
SALT = 8


def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a change batch into a snapshot: full-outer join on the key,
    newest side wins, tombstones delete. Result provably equals the
    latest-state window over the whole log (the oracle)."""
    e = load_table(spark, sf_dir, "events")
    cols = ["user_id", "event_id", "event_type", "ts", "value"]

    base = latest_state(
        e.filter(F.col("ts") <= F.lit(SPLIT_TS)),
        keys=["user_id"],
        order_col="ts",
        action_col="event_type",
        tiebreakers=["event_id"],
        delete_actions=(_TOMBSTONE,),
    ).select(*cols)

    ch_w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    changes = (
        e.filter(F.col("ts") > F.lit(SPLIT_TS))
        .withColumn("__rn", F.row_number().over(ch_w))
        .filter(F.col("__rn") == 1)
        .select(*cols)
    )

    b = base.select(
        "user_id", *[F.col(c).alias(f"b_{c}") for c in cols if c != "user_id"]
    )
    c = changes.select(
        "user_id", *[F.col(c_).alias(f"c_{c_}") for c_ in cols if c_ != "user_id"]
    )
    take_change = F.col("c_event_id").isNotNull()
    merged = b.join(c, "user_id", "full").select(
        "user_id",
        *[
            F.when(take_change, F.col(f"c_{col}"))
            .otherwise(F.col(f"b_{col}"))
            .alias(col)
            for col in cols
            if col != "user_id"
        ],
    )
    return merged.filter(F.col("event_type") != _TOMBSTONE)


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority via a SALTED orders-lineitem join: the
    fact side gets a deterministic salt in [0, SALT), the build side is
    replicated once per salt, and the join key becomes (key, salt) — any
    hot orderkey now spreads across SALT reducers."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", ((F.col("l_partkey") + F.col("l_linenumber")) % SALT).cast("int")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    o_rep = o.withColumn(
        "salt", F.explode(F.array(*[F.lit(s).cast("int") for s in range(SALT)]))
    )
    joined = li.join(o_rep, (F.col("l_orderkey") == F.col("o_orderkey"))
                     & (li["salt"] == o_rep["salt"]))
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,4)")
            ),
            2,
        ).cast("double").alias("revenue"),
    )


QUERIES = {
    "cdc_merge_apply": cdc_merge_apply,
    "skew_salted_join": skew_salted_join,
}

ORACLES = {
    # the SIMPLE formulation: latest state over the full log — equality
    # proves the incremental merge preserves SCD2 semantics
    "cdc_merge_apply": """
        SELECT user_id, event_id, event_type, ts, value
        FROM (
            SELECT user_id, event_id, event_type, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1 AND event_type <> 'error'
    """,
    # the UNSALTED join — equality proves salting preserves the result
    "skew_salted_join": """
        SELECT o_orderpriority,
               count(*) AS n_items,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
}
