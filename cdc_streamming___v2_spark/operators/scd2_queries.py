"""Flagship SCD2 / point-in-time queries over the driver's ``events`` table.

The ``events`` table is treated as a change log (key = ``user_id``, version
order = ``ts``, ``event_type`` plays the role of the reference's ``action``
column with ``error`` as the tombstone verb). This reproduces README.md:57's
query semantic — "presence or absence in the query depends on the moment the
information is fetched" — on driver data that the DuckDB oracle can verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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

QUERIES = {
    "scd2_latest_state": scd2_latest_state,
    "scd2_as_of": scd2_as_of,
}

ORACLES = {
    "scd2_latest_state": _SCD2_TEMPLATE.format(where=""),
    "scd2_as_of": _SCD2_TEMPLATE.format(
        where=f"WHERE ts <= TIMESTAMP '{AS_OF_TS}'"
    ),
}
