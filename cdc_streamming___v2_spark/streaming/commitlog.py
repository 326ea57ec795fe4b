"""Manifest-based commit log for parquet tables — the object-store-portable
successor to the rename-based transactional publish in ingest.py.

The reference's sink is BigQuery ``WRITE_APPEND`` with no dedup key
(src/dataflow-cdc-stream.py:86-92), which is at-least-once: a Dataflow retry
after a partial write duplicates history rows. ``ingest.py`` fixed that with
an atomic directory rename per (table, batch) — correct locally, but object
stores have no atomic rename. This module removes the rename dependency the
way Delta Lake / Iceberg do (public designs — Armbrust et al., VLDB 2020):

- data files land under ``data/<txn>/`` in any order, possibly half-written;
- READERS NEVER LIST THE DATA DIRECTORY — they read exactly the files named
  by the commit log, so uncommitted or torn files are invisible;
- a commit is one tiny JSON file ``_commit_log/<version>.json`` whose
  APPEARANCE is the atomic event (local FS: O_EXCL create; object store:
  put-if-absent — same contract);
- each commit carries a writer-supplied ``txn`` id; a replayed transaction
  finds its id in the log and becomes a no-op, so every (table, batch) lands
  exactly once across any crash window;
- commits record ``add`` and ``remove`` file lists, which gives compaction
  (OPTIMIZE-style small-file rewrite) and version-addressed time travel —
  the table-level analogue of the row-level ``as_of`` the reference's
  history schema enables (README.md:57).

Scale: the log is O(commits) tiny JSON files read once on the driver;
data-file IO is fully parallel Spark. Snapshot reconstruction is a replay
of add/remove sets — checkpointing that into a single manifest parquet
every N commits is the standard growth fix and slots in here unchanged.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LOG_DIR = "_commit_log"
DATA_DIR = "data"
_VERSION_W = 20  # zero-padded width -> lexicographic == numeric order


@dataclass
class Commit:
    version: int
    txn: str
    add: list[str]
    remove: list[str]


class CommitLogTable:
    """Single-writer-per-table transactional parquet table.

    Concurrent writers are detected (version-file create fails) and retry
    against the refreshed log — optimistic concurrency, same shape as
    Delta's; the CDC pipeline runs one writer per table so retries are
    crash-replays in practice.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, LOG_DIR), exist_ok=True)

    # -- log primitives ------------------------------------------------------

    def commits(self) -> list[Commit]:
        log = os.path.join(self.path, LOG_DIR)
        out: list[Commit] = []
        for name in sorted(os.listdir(log)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(log, name)) as f:
                d = json.load(f)
            out.append(
                Commit(
                    version=int(name[: -len(".json")]),
                    txn=d["txn"],
                    add=d.get("add", []),
                    remove=d.get("remove", []),
                )
            )
        return out

    def version(self) -> int:
        cs = self.commits()
        return cs[-1].version if cs else -1

    def committed_txns(self) -> set[str]:
        return {c.txn for c in self.commits()}

    def _try_commit(self, txn: str, add: list[str], remove: list[str]) -> bool:
        """One optimistic attempt: claim version v+1 with an O_EXCL create
        (object-store equivalent: put-if-absent). False = lost the race;
        caller refreshes the log and retries or discovers its txn landed."""
        v = self.version() + 1
        target = os.path.join(self.path, LOG_DIR, f"{v:0{_VERSION_W}d}.json")
        body = json.dumps({"txn": txn, "add": add, "remove": remove})
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(body)
        return True

    def _commit(self, txn: str, add: list[str], remove: list[str]) -> bool:
        """Commit with idempotence: returns False iff ``txn`` already
        committed (replay). Loops only while losing create races."""
        while True:
            if txn in self.committed_txns():
                return False
            if self._try_commit(txn, add, remove):
                return True

    # -- writes --------------------------------------------------------------

    def _data_files(self, subdir: str) -> list[str]:
        root = os.path.join(self.path, subdir)
        files = []
        for dirpath, _, names in os.walk(root):
            for n in names:
                if n.endswith(".parquet"):
                    rel = os.path.relpath(os.path.join(dirpath, n), self.path)
                    files.append(rel)
        return sorted(files)

    def write_append(self, df: DataFrame, txn: str) -> bool:
        """Exactly-once append. The scratch dir is keyed by txn, so a
        crashed attempt's replay OVERWRITES its own torn files before
        committing — leftover garbage never accumulates under a new name
        and is never visible (readers go through the log)."""
        if txn in self.committed_txns():
            return False
        subdir = os.path.join(DATA_DIR, _safe(txn))
        df.write.mode("overwrite").parquet(os.path.join(self.path, subdir))
        return self._commit(txn, add=self._data_files(subdir), remove=[])

    def compact(self, txn: str, target_partitions: int = 1) -> bool:
        """OPTIMIZE: rewrite the current snapshot into ``target_partitions``
        files and swap them in atomically (add new + remove old in ONE
        commit). Readers before the commit see old files, after it new ones
        — never a mix. Removed files stay on disk for time travel; a VACUUM
        that deletes unreferenced files after a retention window is the
        standard companion (not needed at test scale)."""
        if txn in self.committed_txns():
            return False
        live = self.snapshot_files()
        if not live:
            return False
        subdir = os.path.join(DATA_DIR, _safe(txn))
        df = self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in live]
        )
        df.coalesce(target_partitions).write.mode("overwrite").parquet(
            os.path.join(self.path, subdir)
        )
        return self._commit(txn, add=self._data_files(subdir), remove=live)

    # -- reads ---------------------------------------------------------------

    def snapshot_files(self, version: int | None = None) -> list[str]:
        files: list[str] = []
        for c in self.commits():
            if version is not None and c.version > version:
                break
            files = [f for f in files if f not in set(c.remove)]
            files.extend(c.add)
        return files

    def read(
        self, schema: T.StructType | None = None, version: int | None = None
    ) -> DataFrame:
        files = self.snapshot_files(version)
        if not files:
            if schema is None:
                raise ValueError(f"empty table at {self.path} needs a schema")
            return self.spark.createDataFrame([], schema)
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*[os.path.join(self.path, f) for f in files])


def _safe(txn: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", txn)
