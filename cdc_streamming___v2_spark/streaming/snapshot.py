"""Incremental latest-state snapshot maintenance over a CDC stream.

The history sink (streaming/ingest.py) is the system of record; this is the
serving-side complement: a materialized "current state" table kept fresh by
MERGE-ing each micro-batch, so readers get latest-state without running the
SCD2 window over the whole history on every query.

Mechanics: ``foreachBatch`` + the same full-outer-join merge proven
equivalent to the full-log window in operators/merge_ops.cdc_merge_apply.
Each batch is first reduced to one row per key (newest wins), then merged
with the previous snapshot version. Tombstone rows are RETAINED in storage
(so late replays of older versions cannot resurrect deleted keys) and
hidden by the ``current()`` serving view. Writes go to
alternating version directories (v0/v1) with an atomic pointer file — the
parquet stand-in for what Delta/Iceberg transactions give you; swap
``_write_version`` for a real ``MERGE INTO`` when a table format is
available.

Scale: per batch the work is (delta shuffle on key) + (join against the
snapshot). The snapshot side is key-partitioned on disk, so at 100 TB the
join co-partitions instead of re-shuffling the full snapshot; the delta is
micro-batch-sized. Compare: recomputing latest-state from history re-windows
the ENTIRE log every refresh.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass
class SnapshotMaintainer:
    """Maintains a latest-state snapshot for one keyed change stream."""

    spark: SparkSession
    path: str
    keys: tuple[str, ...]
    order_col: str
    action_col: str
    delete_actions: tuple[str, ...] = ("DELETE",)
    tiebreakers: tuple[str, ...] = ()
    _version: int = field(default=0, init=False)

    # -- version bookkeeping (parquet stand-in for table-format commits) -----

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def _current_dir(self) -> str | None:
        try:
            with open(self._pointer) as f:
                return os.path.join(self.path, f.read().strip())
        except FileNotFoundError:
            return None

    def _write_version(self, df: DataFrame) -> None:
        self._version += 1
        name = f"v{self._version % 2}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, name))
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, self._pointer)  # atomic pointer swap

    # -- merge logic ---------------------------------------------------------

    def read(self) -> DataFrame | None:
        """Raw snapshot INCLUDING tombstone rows (the merge input).
        Tombstones are retained so a late replay of an older version
        cannot resurrect a deleted key."""
        cur = self._current_dir()
        if cur is None:
            return None
        return self.spark.read.parquet(cur)

    def current(self) -> DataFrame | None:
        """Visible latest-state (tombstoned keys hidden) — the serving view."""
        raw = self.read()
        if raw is None:
            return None
        return raw.filter(~F.col(self.action_col).isin(*self.delete_actions))

    def _latest_per_key(self, batch: DataFrame) -> DataFrame:
        order = [F.col(self.order_col).desc()]
        order += [F.col(c).desc() for c in self.tiebreakers]
        w = Window.partitionBy(*self.keys).orderBy(*order)
        return (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def merge_batch(self, batch: DataFrame) -> None:
        """Apply one micro-batch of change rows to the snapshot."""
        delta = self._latest_per_key(batch)
        prev = self.read()
        if prev is None:
            merged = delta
        else:
            cols = prev.columns
            non_keys = [c for c in cols if c not in self.keys]
            b = prev.select(
                *self.keys, *[F.col(c).alias(f"b_{c}") for c in non_keys]
            )
            c_ = delta.select(
                *self.keys, *[F.col(c).alias(f"c_{c}") for c in non_keys]
            )
            # a change wins only if it is NEWER than the snapshot row
            # (lexicographic on order_col + tiebreakers) — late replays of
            # old versions must not regress the snapshot
            ver = [self.order_col, *self.tiebreakers]
            c_ver = F.struct(*[F.col(f"c_{v}") for v in ver])
            b_ver = F.struct(*[F.col(f"b_{v}") for v in ver])
            take_change = F.col(f"c_{self.order_col}").isNotNull() & (
                F.col(f"b_{self.order_col}").isNull() | (c_ver >= b_ver)
            )
            merged = b.join(c_, list(self.keys), "full").select(
                *self.keys,
                *[
                    F.when(take_change, F.col(f"c_{c}"))
                    .otherwise(F.col(f"b_{c}"))
                    .alias(c)
                    for c in non_keys
                ],
            )
        self._write_version(merged)

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""

        def apply(batch: DataFrame, batch_id: int) -> None:
            if batch.isEmpty():
                return
            self.merge_batch(batch)

        return apply

    def attach(self, stream: DataFrame, checkpoint_dir: str, available_now: bool = False):
        """Wire a streaming DataFrame of change rows into this snapshot."""
        writer = (
            stream.writeStream.foreachBatch(self.foreach_batch())
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
