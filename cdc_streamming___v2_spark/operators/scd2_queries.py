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


QUERIES = {
    "scd2_latest_state": scd2_latest_state,
    "scd2_as_of": scd2_as_of,
    "scd2_join_as_of": scd2_join_as_of,
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
}
