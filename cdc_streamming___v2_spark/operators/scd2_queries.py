"""Flagship SCD2 / point-in-time queries over the driver's ``events`` table.

The ``events`` table is treated as a change log (key = ``user_id``, version
order = ``ts``, ``event_type`` plays the role of the reference's ``action``
column with ``error`` as the tombstone verb). This reproduces README.md:57's
query semantic — "presence or absence in the query depends on the moment the
information is fetched" — on driver data that the DuckDB oracle can verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .history import as_of, latest_state

_TOMBSTONE = ("error",)
AS_OF_TS = "2024-01-15 00:00:00"


def scd2_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current state per user: newest event wins; tombstoned users hidden."""
    e = load_table(spark, sf_dir, "events")
    return latest_state(
        e,
        keys=["user_id"],
        order_col="ts",
        action_col="event_type",
        tiebreakers=["event_id"],
        delete_actions=_TOMBSTONE,
    ).select("user_id", "event_id", "event_type", "ts", "value")


def scd2_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State as of AS_OF_TS — the reference's point-in-time read."""
    e = load_table(spark, sf_dir, "events")
    return as_of(
        e,
        keys=["user_id"],
        ts=AS_OF_TS,
        order_col="ts",
        action_col="event_type",
        tiebreakers=["event_id"],
        delete_actions=_TOMBSTONE,
    ).select("user_id", "event_id", "event_type", "ts", "value")


_SCD2_TEMPLATE = """
    SELECT user_id, event_id, event_type, ts, value
    FROM (
        SELECT user_id, event_id, event_type, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        {where}
    )
    WHERE rn = 1 AND event_type <> 'error'
"""

_STREAM_A = ("view", "click")  # "browsing profile" change stream
_STREAM_B = ("purchase", "signup")  # "account activity" change stream


def scd2_join_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time JOIN of two histories — the query a history-table
    user actually runs: reconstruct the state of TWO change streams as of
    the same instant and join them on the business key, so every output
    row is a time-consistent pair (no mixing of a new profile with a stale
    activity row or vice versa).

    Here both streams derive from ``events`` (browsing vs account verbs,
    ``error`` tombstoning a user in either stream), standing in for the
    reference's two registered tables (olist_produtos / olist_users) whose
    histories land side by side.

    Scale: each as-of state is one user-partitioned window over its
    (pre-filtered, partition-pruned at real layouts) history; the final
    equi-join shuffles state-sized frames, not history-sized ones.
    """
    e = load_table(spark, sf_dir, "events")
    verbs_a = _STREAM_A + _TOMBSTONE
    verbs_b = _STREAM_B + _TOMBSTONE
    a = as_of(
        e.filter(e.event_type.isin(*verbs_a)),
        keys=["user_id"],
        ts=AS_OF_TS,
        order_col="ts",
        action_col="event_type",
        tiebreakers=["event_id"],
        delete_actions=_TOMBSTONE,
    ).select(
        "user_id",
        F.col("event_id").alias("a_event_id"),
        F.col("event_type").alias("a_type"),
        F.col("ts").alias("a_ts"),
        F.col("value").alias("a_value"),
    )
    b = as_of(
        e.filter(e.event_type.isin(*verbs_b)),
        keys=["user_id"],
        ts=AS_OF_TS,
        order_col="ts",
        action_col="event_type",
        tiebreakers=["event_id"],
        delete_actions=_TOMBSTONE,
    ).select(
        "user_id",
        F.col("event_id").alias("b_event_id"),
        F.col("event_type").alias("b_type"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
    )
    return a.join(b, "user_id")


DIFF_T1 = "2024-01-15 00:00:00"
DIFF_T2 = "2024-01-25 00:00:00"


def scd2_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two point-in-time reads of the history table: which keys were
    INSERTed, DELETEd (tombstoned/removed), or UPDATEd between the state
    as of DIFF_T1 and as of DIFF_T2 — the audit query behind "what changed
    since yesterday's extract" and the generator of a downstream change
    feed from any two snapshots (README.md:57's time-dependent read, taken
    twice and compared).

    Scale: each as-of state is one user-partitioned window (partition
    pruning at real layouts caps the scan at ts <= T2); the diff is a
    full-outer equi-join of two STATE-sized frames, never history-sized.
    Unchanged keys drop out, so output is delta-sized.
    """
    e = load_table(spark, sf_dir, "events")

    def state(ts: str, prefix: str) -> DataFrame:
        return as_of(
            e,
            keys=["user_id"],
            ts=ts,
            order_col="ts",
            action_col="event_type",
            tiebreakers=["event_id"],
            delete_actions=_TOMBSTONE,
        ).select(
            "user_id",
            F.col("event_id").alias(f"{prefix}_event_id"),
            F.col("ts").alias(f"{prefix}_ts"),
            F.col("value").alias(f"{prefix}_value"),
        )

    old = state(DIFF_T1, "old")
    new = state(DIFF_T2, "new")
    d = old.join(new, "user_id", "full")
    change = (
        F.when(F.col("old_event_id").isNull(), F.lit("INSERT"))
        .when(F.col("new_event_id").isNull(), F.lit("DELETE"))
        .when(F.col("old_event_id") != F.col("new_event_id"), F.lit("UPDATE"))
    )
    return (
        d.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            "user_id",
            "change_type",
            "old_event_id",
            "new_event_id",
            "old_ts",
            "new_ts",
            F.round(F.col("new_value") - F.col("old_value"), 2).alias(
                "value_delta"
            ),
        )
    )


QUERIES = {
    "scd2_latest_state": scd2_latest_state,
    "scd2_as_of": scd2_as_of,
    "scd2_join_as_of": scd2_join_as_of,
    "scd2_snapshot_diff": scd2_snapshot_diff,
}

def _stream_state_sql(verbs: tuple, prefix: str) -> str:
    inlist = ", ".join(f"'{v}'" for v in verbs + _TOMBSTONE)
    return f"""
        SELECT user_id,
               event_id AS {prefix}_event_id,
               event_type AS {prefix}_type,
               ts AS {prefix}_ts,
               value AS {prefix}_value
        FROM (
            SELECT user_id, event_id, event_type, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE event_type IN ({inlist})
              AND ts <= TIMESTAMP '{AS_OF_TS}'
        )
        WHERE rn = 1 AND event_type <> 'error'
    """


ORACLES = {
    "scd2_latest_state": _SCD2_TEMPLATE.format(where=""),
    "scd2_as_of": _SCD2_TEMPLATE.format(
        where=f"WHERE ts <= TIMESTAMP '{AS_OF_TS}'"
    ),
    "scd2_join_as_of": f"""
        WITH a AS ({_stream_state_sql(_STREAM_A, "a")}),
        b AS ({_stream_state_sql(_STREAM_B, "b")})
        SELECT a.user_id, a_event_id, a_type, a_ts, a_value,
               b_event_id, b_type, b_ts, b_value
        FROM a JOIN b ON a.user_id = b.user_id
    """,
    "scd2_snapshot_diff": f"""
        WITH old_s AS (
            SELECT user_id, event_id AS old_event_id, ts AS old_ts,
                   value AS old_value
            FROM (
                SELECT user_id, event_id, ts, value, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC)
                           AS rn
                FROM events WHERE ts <= TIMESTAMP '{DIFF_T1}'
            ) WHERE rn = 1 AND event_type <> 'error'
        ),
        new_s AS (
            SELECT user_id, event_id AS new_event_id, ts AS new_ts,
                   value AS new_value
            FROM (
                SELECT user_id, event_id, ts, value, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC)
                           AS rn
                FROM events WHERE ts <= TIMESTAMP '{DIFF_T2}'
            ) WHERE rn = 1 AND event_type <> 'error'
        )
        SELECT coalesce(o.user_id, n.user_id) AS user_id,
               CASE WHEN o.old_event_id IS NULL THEN 'INSERT'
                    WHEN n.new_event_id IS NULL THEN 'DELETE'
                    WHEN o.old_event_id <> n.new_event_id THEN 'UPDATE'
               END AS change_type,
               o.old_event_id, n.new_event_id, o.old_ts, n.new_ts,
               round(n.new_value - o.old_value, 2) AS value_delta
        FROM old_s o FULL OUTER JOIN new_s n ON o.user_id = n.user_id
        WHERE CASE WHEN o.old_event_id IS NULL THEN 'INSERT'
                   WHEN n.new_event_id IS NULL THEN 'DELETE'
                   WHEN o.old_event_id <> n.new_event_id THEN 'UPDATE'
              END IS NOT NULL
    """,
}


BT_VALID_TS = "2024-01-10 00:00:00"  # valid-time axis pin
BT_TXN_TS = "2024-01-15 00:00:00"  # transaction-time axis pin (= AS_OF_TS)


def bitemporal_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL point-in-time read: state per user as it was VALID at
    BT_VALID_TS, using only what the system KNEW by BT_TXN_TS — the
    two-axis generalization of scd2_as_of (one axis) that answers the
    audit question single-axis SCD2 cannot: "what did we believe on the
    15th about the world of the 10th?"  Late-arriving facts (recorded
    after they became true) are the whole point: a fact recorded on the
    14th with validity from the 9th IS visible here, while a correction
    recorded on the 16th is not.

    Valid time synthesizes deterministically as
    ts - (event_id % 72) hours (every event became true 0-71 h before
    the system recorded it — the classic late-fact shape).  Within the
    two cuts the winner per user is the newest by (valid_from, ts,
    event_id); tombstones hide the key exactly as in latest_state.

    Scale: two pushdown-able cuts + the same single keyed window as
    every SCD2 read.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").withColumn(
        "valid_from",
        F.col("ts")
        - F.make_interval(hours=(F.col("event_id") % 72).cast("int")),
    )
    cut = e.filter(
        (F.col("ts") <= F.lit(BT_TXN_TS).cast("timestamp"))
        & (F.col("valid_from") <= F.lit(BT_VALID_TS).cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("valid_from").desc(), F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        cut.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select("user_id", "event_id", "event_type", "valid_from", "ts", "value")
    )


ORACLES["bitemporal_as_of"] = f"""
    SELECT user_id, event_id, event_type, valid_from, ts, value
    FROM (
        SELECT user_id, event_id, event_type, ts, value,
               ts - to_hours(CAST(event_id % 72 AS BIGINT)) AS valid_from,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts - to_hours(CAST(event_id % 72 AS BIGINT))
                            DESC, ts DESC, event_id DESC) AS rn
        FROM events
        WHERE ts <= TIMESTAMP '{BT_TXN_TS}'
          AND ts - to_hours(CAST(event_id % 72 AS BIGINT))
              <= TIMESTAMP '{BT_VALID_TS}'
    )
    WHERE rn = 1 AND event_type <> 'error'
"""
QUERIES["bitemporal_as_of"] = bitemporal_as_of
