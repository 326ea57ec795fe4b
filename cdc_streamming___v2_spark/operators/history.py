"""SCD2 / point-in-time resolution over append-only history tables.

This is the reference's one real query semantic (README.md:57): every
INSERT/UPDATE-INSERT/DELETE lands as a new row stamped with ``action`` +
``update_date``; "current state" and "state as of T" are resolved at query
time by taking the newest version per key and hiding keys whose newest
version is a DELETE. The reference delegates this to whoever queries
BigQuery; here it is a first-class operator.

Scale notes: the window runs as a single hash-partitioned shuffle on the
key column(s). At 100 TB the history table should be written partitioned by
date (see streaming.ingest) so ``as_of`` prunes partitions before the
shuffle; the per-key window itself is embarrassingly parallel and
skew-tolerant (one user's history fits easily in a partition).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DELETE_ACTIONS = ("DELETE", "delete")


def _latest_version(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Newest row per key; deterministic via explicit tiebreaker columns."""
    order: list[Column] = [F.col(order_col).desc()]
    order += [F.col(c).desc() for c in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_state(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str = "update_date",
    action_col: str = "action",
    tiebreakers: Sequence[str] = (),
    delete_actions: Sequence[str] = DELETE_ACTIONS,
) -> DataFrame:
    """Current state of a versioned history table.

    Equivalent of the reference's query-time resolution over its BigQuery
    history tables (src/dataflow-cdc-stream.py:86-92 writes; README.md:57
    describes the read).
    """
    latest = _latest_version(df, keys, order_col, tiebreakers)
    return latest.filter(~F.col(action_col).isin(*delete_actions))


PARTITION_COLUMNS = ("update_day", "update_month")


def as_of(
    df: DataFrame,
    keys: Sequence[str],
    ts,
    order_col: str = "update_date",
    action_col: str = "action",
    tiebreakers: Sequence[str] = (),
    delete_actions: Sequence[str] = DELETE_ACTIONS,
) -> DataFrame:
    """State of the table as of timestamp ``ts`` (inclusive).

    When the history table carries a date partition column (update_day /
    update_month, written by streaming.ingest), the same bound is also
    applied to it: the row filter on ``update_date`` alone can't prune
    parquet partitions (Catalyst won't infer day(update_date) <= day(ts)
    across columns), while the explicit partition predicate turns a
    6-year backfill scan into only the partitions at or before ``ts``
    (asserted in tests/test_cdc_ingest.py). Day/month truncation only
    rounds DOWN, so the partition bound never excludes a qualifying row.
    """
    bounded = df.filter(F.col(order_col) <= F.lit(ts))
    for pcol in PARTITION_COLUMNS:
        if pcol in df.columns:
            bounded = bounded.filter(
                F.col(pcol) <= F.to_date(F.lit(ts).cast("timestamp"))
            )
    return latest_state(
        bounded,
        keys,
        order_col,
        action_col,
        tiebreakers,
        delete_actions,
    )


def history_of(
    df: DataFrame,
    keys: Sequence[str],
    key_values: Sequence,
    order_col: str = "update_date",
) -> DataFrame:
    """Full version chain for one key, oldest first (audit view)."""
    cond = None
    for k, v in zip(keys, key_values):
        c = F.col(k) == F.lit(v)
        cond = c if cond is None else (cond & c)
    return df.filter(cond).orderBy(F.col(order_col).asc())
