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

Data skipping (zone maps): every ``add`` entry carries per-file column
min/max/null-count stats harvested from the parquet footer at commit time
(footer-only read — no data pages touched; at cluster scale the footer
reads run on the executors that just wrote the files). ``read(where=...)``
prunes files whose [min, max] envelope cannot satisfy the predicate BEFORE
Spark ever lists them — on a 100 TB table a selective key predicate turns
a full scan into a handful of file reads, which is the same mechanism
Delta/Iceberg use on top of parquet's own row-group skipping. ``compact``
optionally Z-orders the rewrite (bit-interleaved range buckets) so
min/max envelopes stay tight on MULTIPLE columns at once.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_DIR = "_commit_log"
DATA_DIR = "data"
_VERSION_W = 20  # zero-padded width -> lexicographic == numeric order
CKPT_SUFFIX = ".checkpoint.json"


@dataclass
class Commit:
    version: int
    txn: str
    add: list[str]
    remove: list[str]
    # per added file: {column: {"min": x, "max": x, "nulls": n, "rows": n}}
    stats: dict[str, dict]


class CommitLogTable:
    """Single-writer-per-table transactional parquet table.

    Concurrent writers are detected (version-file create fails) and retry
    against the refreshed log — optimistic concurrency, same shape as
    Delta's; the CDC pipeline runs one writer per table so retries are
    crash-replays in practice.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        checkpoint_every: int = 10,
    ):
        self.spark = spark
        self.path = path
        self.checkpoint_every = checkpoint_every
        os.makedirs(os.path.join(path, LOG_DIR), exist_ok=True)

    # -- log primitives ------------------------------------------------------

    def _log_dir(self) -> str:
        return os.path.join(self.path, LOG_DIR)

    def _commit_versions(self) -> list[int]:
        return sorted(
            int(n[: -len(".json")])
            for n in os.listdir(self._log_dir())
            if n.endswith(".json") and not n.endswith(CKPT_SUFFIX)
        )

    def _checkpoint_versions(self) -> list[int]:
        return sorted(
            int(n[: -len(CKPT_SUFFIX)])
            for n in os.listdir(self._log_dir())
            if n.endswith(CKPT_SUFFIX)
        )

    def commits(self, after: int = -1) -> list[Commit]:
        """Commits with version > ``after``, ascending. With checkpoints,
        callers replay only the suffix — O(commits since checkpoint), not
        O(table lifetime)."""
        out: list[Commit] = []
        for v in self._commit_versions():
            if v <= after:
                continue
            with open(
                os.path.join(self._log_dir(), f"{v:0{_VERSION_W}d}.json")
            ) as f:
                d = json.load(f)
            out.append(
                Commit(
                    version=v,
                    txn=d["txn"],
                    add=d.get("add", []),
                    remove=d.get("remove", []),
                    stats=d.get("stats", {}),
                )
            )
        return out

    def version(self) -> int:
        vs = self._commit_versions() + self._checkpoint_versions()
        return max(vs) if vs else -1

    def committed_txns(self) -> set[str]:
        cp = self._latest_checkpoint()
        if cp is None:
            return {c.txn for c in self.commits()}
        v, body = cp
        return set(body["txns"]) | {c.txn for c in self.commits(after=v)}

    # -- checkpoints ---------------------------------------------------------

    def _latest_checkpoint(
        self, max_version: int | None = None
    ) -> tuple[int, dict] | None:
        """(version, body) of the newest checkpoint at or below
        ``max_version`` (latest overall when None)."""
        usable = [
            v
            for v in self._checkpoint_versions()
            if max_version is None or v <= max_version
        ]
        if not usable:
            return None
        v = usable[-1]
        with open(
            os.path.join(self._log_dir(), f"{v:0{_VERSION_W}d}{CKPT_SUFFIX}")
        ) as f:
            return v, json.load(f)

    def _maybe_checkpoint(self) -> None:
        """Write a full-snapshot checkpoint every ``checkpoint_every``
        commits: live (file, stats) entries + the complete txn set, so both
        snapshot reads AND idempotence survive a later log vacuum. Written
        with put-if-absent; losing a race or crashing mid-write is harmless
        (readers fall back to older checkpoints / raw commits — the
        replayed state is identical, just slower to assemble)."""
        v = self.version()
        if v < 0 or (v + 1) % self.checkpoint_every != 0:
            return
        body = json.dumps(
            {
                "version": v,
                "entries": self._entries_from_log(v),
                "txns": sorted(self.committed_txns()),
            }
        )
        target = os.path.join(
            self._log_dir(), f"{v:0{_VERSION_W}d}{CKPT_SUFFIX}"
        )
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return
        with os.fdopen(fd, "w") as f:
            f.write(body)

    def vacuum_log(self) -> int:
        """Delete commit files already folded into the newest checkpoint.
        Time travel to versions >= that checkpoint (and txn idempotence)
        are unaffected; older versions become unreachable — the same
        retention trade Delta's log cleanup makes. Returns files removed."""
        cp = self._latest_checkpoint()
        if cp is None:
            return 0
        v, _ = cp
        n = 0
        for cv in self._commit_versions():
            if cv <= v:
                os.remove(
                    os.path.join(self._log_dir(), f"{cv:0{_VERSION_W}d}.json")
                )
                n += 1
        return n

    def vacuum(self, keep_last: int = 1, min_age_seconds: float = 3600) -> int:
        """VACUUM data files: delete every file under ``data/`` that no
        retained snapshot references — the companion to ``compact`` (whose
        removed files stay on disk for time travel until vacuumed) and to
        ``vacuum_log`` (which prunes the LOG; this prunes the DATA).

        ``keep_last`` = how many trailing versions stay time-travelable
        (1 = current snapshot only). Uncommitted garbage — torn files from
        a crashed writer whose txn never replayed — is unreferenced by
        every snapshot and so is swept too, but only once it is older
        than ``min_age_seconds`` (mtime): a writer commits AFTER its data
        files land, so a concurrent in-flight append's files are briefly
        unreferenced-but-live — the age floor is what keeps a scheduled
        vacuum from racing it (the same wall-clock retention trade
        Delta's VACUUM makes; the version-based part alone would only be
        safe if the vacuum caller IS the single writer). Reads at
        vacuumed-away versions fail loudly at ``read()`` (the listed
        files are gone). Returns the number of files deleted."""
        import time as _time

        v_cur = self.version()
        if v_cur < 0:
            return 0
        keep: set[str] = set()
        for v in range(max(0, v_cur - keep_last + 1), v_cur + 1):
            try:
                keep.update(p for p, _ in self.snapshot_entries(v))
            except ValueError:
                continue  # version already log-vacuumed away
        data_root = os.path.join(self.path, DATA_DIR)
        if not os.path.isdir(data_root):
            return 0
        cutoff = _time.time() - min_age_seconds
        removed = 0
        for dirpath, _, names in os.walk(data_root):
            for nm in names:
                full = os.path.join(dirpath, nm)
                rel = os.path.relpath(full, self.path)
                if nm.endswith(".parquet") and rel not in keep:
                    # two maintain runs racing: a file the sibling already
                    # swept is the desired end state, not an error — skip
                    # (ADVICE r9: getmtime/remove between walk and delete)
                    try:
                        if os.path.getmtime(full) <= cutoff:
                            os.remove(full)
                            removed += 1
                    except FileNotFoundError:
                        continue
        # sweep dirs left holding only write markers (_SUCCESS, .crc) —
        # files only; an in-flight writer's _temporary SUBDIR means the
        # dir is still in use and stays
        for dirpath, dirnames, _names in os.walk(data_root, topdown=False):
            if dirpath == data_root:
                continue
            try:
                leftover = os.listdir(dirpath)
                if all(
                    n.startswith(("_", "."))
                    and os.path.isfile(os.path.join(dirpath, n))
                    for n in leftover
                ):
                    for n in leftover:
                        os.remove(os.path.join(dirpath, n))
                    os.rmdir(dirpath)
            except OSError:
                # sibling vacuum already swept this dir (FileNotFoundError)
                # OR a concurrent writer landed a file/_temporary subdir
                # between our listdir and the rmdir (ENOTEMPTY) — both are
                # the same "someone else raced us" end state the file
                # sweep above tolerates; skip, never abort the maintain run
                continue
        return removed

    def _try_commit(
        self, txn: str, add: list[str], remove: list[str], stats: dict
    ) -> bool:
        """One optimistic attempt: claim version v+1 with an O_EXCL create
        (object-store equivalent: put-if-absent). False = lost the race;
        caller refreshes the log and retries or discovers its txn landed."""
        v = self.version() + 1
        target = os.path.join(self.path, LOG_DIR, f"{v:0{_VERSION_W}d}.json")
        body = json.dumps({"txn": txn, "add": add, "remove": remove, "stats": stats})
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(body)
        return True

    def _commit(
        self,
        txn: str,
        add: list[str],
        remove: list[str],
        stats: dict | None = None,
    ) -> bool:
        """Commit with idempotence: returns False iff ``txn`` already
        committed (replay). Loops only while losing create races."""
        stats = stats if stats is not None else self._collect_stats(add)
        while True:
            if txn in self.committed_txns():
                return False
            if self._try_commit(txn, add, remove, stats):
                self._maybe_checkpoint()
                return True

    # -- writes --------------------------------------------------------------

    def _collect_stats(self, rel_files: list[str]) -> dict[str, dict]:
        """Per-file zone maps from parquet footers (no data pages read).

        Driver-side here because local commits are small; at cluster scale
        the executors that wrote each file return the same footer digest
        with the write status, so the commit never re-reads remotely.
        Only int / float / string / timestamp leaves are recorded — a
        column without usable footer stats is simply absent, which the
        pruner treats as "cannot prune on this column".
        """
        import pyarrow.parquet as pq

        out: dict[str, dict] = {}
        for rel in rel_files:
            md = pq.ParquetFile(os.path.join(self.path, rel)).metadata
            cols: dict[str, dict] = {}
            bad: set[str] = set()  # stats missing in ANY row group → unusable
            for rg_i in range(md.num_row_groups):
                rg = md.row_group(rg_i)
                for c_i in range(rg.num_columns):
                    col = rg.column(c_i)
                    name = col.path_in_schema
                    if "." in name or name in bad:  # nested leaf / no stats
                        continue
                    st = col.statistics
                    mn = _json_scalar(st.min) if st and st.has_min_max else None
                    mx = _json_scalar(st.max) if st and st.has_min_max else None
                    if mn is None or mx is None:
                        bad.add(name)
                        cols.pop(name, None)
                        continue
                    nulls = st.null_count if st.has_null_count else 0
                    prev = cols.get(name)
                    if prev is None:
                        cols[name] = {
                            "min": mn,
                            "max": mx,
                            "nulls": nulls,
                            "rows": rg.num_rows,
                        }
                    else:
                        prev["min"] = min(prev["min"], mn)
                        prev["max"] = max(prev["max"], mx)
                        prev["nulls"] += nulls
                        prev["rows"] += rg.num_rows
            out[rel] = cols
        return out

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

    def write_replace(
        self, df: DataFrame, txn: str, remove: list[str] | None = None
    ) -> bool:
        """Exactly-once REPLACE: swap files out for ``df`` in one commit
        (add the new files + remove the old ones atomically) — the
        commit-log analogue of a transactional overwrite. Readers before
        the commit see the old snapshot, after it the new one, never a
        mix; a replayed txn is a no-op.

        ``remove=None`` replaces EVERY live file. An explicit ``remove``
        list replaces exactly those files, so rows APPENDED concurrently
        (new files committed after the caller snapshotted) survive the
        swap — the dead-letter replay (streaming/ingest.py) passes its
        pinned snapshot here so a row quarantined mid-replay is never
        silently dropped (ADVICE r9). Files in ``remove`` that are no
        longer live raise: the caller's snapshot was already replaced by
        someone else, and committing would double-remove."""
        if txn in self.committed_txns():
            return False
        live = self.snapshot_files()
        if remove is None:
            remove = live
        else:
            gone = sorted(set(remove) - set(live))
            if gone:
                raise ValueError(
                    f"write_replace txn={txn}: {len(gone)} file(s) in the "
                    f"remove set are no longer live (e.g. {gone[0]}) — "
                    "snapshot superseded by a concurrent replace/compact"
                )
        subdir = os.path.join(DATA_DIR, _safe(txn))
        df.write.mode("overwrite").parquet(os.path.join(self.path, subdir))
        return self._commit(txn, add=self._data_files(subdir), remove=remove)

    def compact(
        self,
        txn: str,
        target_partitions: int = 1,
        zorder_by: list[str] | None = None,
    ) -> bool:
        """OPTIMIZE: rewrite the current snapshot into ``target_partitions``
        files and swap them in atomically (add new + remove old in ONE
        commit). Readers before the commit see old files, after it new ones
        — never a mix. Removed files stay on disk for time travel; a VACUUM
        that deletes unreferenced files after a retention window is the
        standard companion (not needed at test scale).

        ``zorder_by`` clusters the rewrite on a Z-value (bit-interleaved
        per-column range buckets, computed JVM-side) before range-
        partitioning, so every output file covers a tight min/max envelope
        on EVERY listed column — multi-column data skipping, where a plain
        sort only tightens the leading column."""
        if txn in self.committed_txns():
            return False
        live = self.snapshot_files()
        if not live:
            return False
        subdir = os.path.join(DATA_DIR, _safe(txn))
        df = self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in live]
        )
        if zorder_by:
            z = _zvalue(df, zorder_by)
            df = (
                df.withColumn("__z", z)
                .repartitionByRange(target_partitions, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            df = df.coalesce(target_partitions)
        df.write.mode("overwrite").parquet(os.path.join(self.path, subdir))
        return self._commit(txn, add=self._data_files(subdir), remove=live)

    # -- reads ---------------------------------------------------------------

    def snapshot_files(self, version: int | None = None) -> list[str]:
        return [p for p, _ in self.snapshot_entries(version)]

    def snapshot_entries(
        self, version: int | None = None
    ) -> list[tuple[str, dict]]:
        """Live (path, column-stats) pairs at ``version`` (default: latest).
        Starts from the newest checkpoint at/below the target and replays
        only the commits after it."""
        cp = self._latest_checkpoint(version)
        if cp is not None:
            base_v, body = cp
            entries = [(p, s) for p, s in body["entries"]]
        else:
            base_v = -1
            entries = []
            cvs = self._commit_versions()
            if cvs and cvs[0] != 0:
                raise ValueError(
                    f"commit log vacuumed before version {cvs[0]} and no "
                    f"checkpoint at/below version {version} — unreachable"
                )
        for c in self.commits(after=base_v):
            if version is not None and c.version > version:
                break
            removed = set(c.remove)
            entries = [(p, s) for p, s in entries if p not in removed]
            entries.extend((p, c.stats.get(p, {})) for p in c.add)
        return entries

    def _entries_from_log(self, version: int) -> list[list]:
        return [[p, s] for p, s in self.snapshot_entries(version)]

    def read(
        self,
        schema: T.StructType | None = None,
        version: int | None = None,
        where: list[tuple] | None = None,
    ) -> DataFrame:
        """Snapshot read; ``where`` is a list of simple conjunctive
        predicates ``(col, op, value)`` with op in ``= < <= > >= between``
        (``between`` takes a ``(lo, hi)`` value). Files whose zone map
        proves no row can match are never handed to Spark; the predicate is
        then applied as a real filter too, so pruning is purely a physical
        optimization — results are identical with or without stats."""
        entries = self.snapshot_entries(version)
        if where:
            entries = [
                (p, s) for p, s in entries if _file_may_match(s, where)
            ]
        files = [p for p, _ in entries]
        if not files:
            if schema is None:
                raise ValueError(f"empty table at {self.path} needs a schema")
            return self.spark.createDataFrame([], schema)
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(*[os.path.join(self.path, f) for f in files])
        if where:
            df = df.filter(_where_column(where))
        return df

    def read_changes(
        self,
        from_version: int,
        to_version: int | None = None,
        schema: T.StructType | None = None,
    ) -> DataFrame:
        """Change-data-feed between two snapshot versions (the Delta Lake
        CDF analogue, VERDICT r3 #8): every row added gets
        ``_change_type='insert'``, every row removed ``'delete'``, plus
        ``_commit_version = to_version``; bag semantics, so applying the
        feed to the ``from_version`` snapshot (union inserts, exceptAll
        deletes) reconstructs the ``to_version`` snapshot exactly.

        Files live in BOTH snapshots are immutable and identical, so only
        files added or removed between the versions are ever read; a
        compaction's rewrite (same rows, new files) nets to an EMPTY feed
        because the add-side and remove-side bags cancel in the two
        ``exceptAll``s. At 100 TB the feed between adjacent versions
        touches one commit's files — never the table.
        """
        if to_version is None:
            to_version = self.version()
        if from_version > to_version:
            raise ValueError(
                f"from_version {from_version} > to_version {to_version}"
            )
        f_from = set(self.snapshot_files(from_version))
        f_to = set(self.snapshot_files(to_version))
        added = sorted(f_to - f_from)
        removed = sorted(f_from - f_to)

        def _rd(files: list[str]) -> DataFrame:
            reader = self.spark.read
            if schema is not None:
                reader = reader.schema(schema)
            return reader.parquet(*[os.path.join(self.path, f) for f in files])

        if not added and not removed:
            if schema is None:
                raise ValueError(
                    "empty change feed needs a schema to build a 0-row frame"
                )
            base = self.spark.createDataFrame([], schema)
            add_df = rem_df = base
        else:
            add_df = _rd(added) if added else None
            rem_df = _rd(removed) if removed else None
            if add_df is None:
                add_df = self.spark.createDataFrame([], rem_df.schema)
            if rem_df is None:
                rem_df = self.spark.createDataFrame([], add_df.schema)
        inserts = add_df.exceptAll(rem_df).withColumn(
            "_change_type", F.lit("insert")
        )
        deletes = rem_df.exceptAll(add_df).withColumn(
            "_change_type", F.lit("delete")
        )
        return inserts.unionByName(deletes).withColumn(
            "_commit_version", F.lit(to_version).cast("long")
        )

    def files_scanned(
        self, where: list[tuple] | None = None, version: int | None = None
    ) -> tuple[int, int]:
        """(files after pruning, total live files) — observability hook the
        tests and EXPLAIN-style tooling use to prove skipping happened."""
        entries = self.snapshot_entries(version)
        kept = [
            e for e in entries if not where or _file_may_match(e[1], where)
        ]
        return len(kept), len(entries)


def _safe(txn: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", txn)


def _json_scalar(v):
    """Footer stat → JSON-comparable scalar, or None if not representable.

    bytes decode as UTF-8 (parquet string stats arrive as bytes from some
    writers); datetimes serialize to ISO-8601, which compares in the same
    order as the timestamps themselves, so range pruning stays valid as a
    plain string comparison."""
    import datetime

    if isinstance(v, bool) or v is None:
        return None  # boolean zone maps are useless (2 values) — skip
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return None


def _coerce_bound(value, bound):
    """Make a user predicate value comparable with a stored bound."""
    import datetime

    if isinstance(value, datetime.datetime) and isinstance(bound, str):
        return value.isoformat(), bound
    if isinstance(value, (int, float)) and isinstance(bound, (int, float)):
        return value, bound
    if isinstance(value, str) and isinstance(bound, str):
        return value, bound
    return None, None  # incomparable → caller must not prune


def _file_may_match(stats: dict, where: list[tuple]) -> bool:
    """True unless the zone map PROVES no row satisfies the conjunction.
    Missing stats for a column → that predicate cannot prune this file.
    All ops are null-rejecting, so an all-null column also prunes."""
    for col, op, value in where:
        st = stats.get(col)
        if not st:
            continue
        if st.get("rows") and st.get("nulls") == st.get("rows"):
            return False  # every value NULL → null-rejecting op matches none
        lo, hi = st["min"], st["max"]
        if op == "between":
            a, lo_c = _coerce_bound(value[0], hi)
            b, hi_c = _coerce_bound(value[1], lo)
            if a is not None and a > lo_c:
                return False  # range entirely above file max
            if b is not None and b < hi_c:
                return False  # range entirely below file min
            continue
        v_hi, hi_c = _coerce_bound(value, hi)
        v_lo, lo_c = _coerce_bound(value, lo)
        if v_hi is None or v_lo is None:
            continue
        if op == "=" and (v_lo < lo_c or v_hi > hi_c):
            return False
        if op in ("<", "<=") and (v_lo < lo_c or (op == "<" and v_lo == lo_c)):
            return False
        if op in (">", ">=") and (v_hi > hi_c or (op == ">" and v_hi == hi_c)):
            return False
    return True


def _where_column(where: list[tuple]) -> Column:
    """The same conjunction as a real Spark filter (pruning is advisory)."""
    ops = {
        "=": lambda c, v: c == v,
        "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
        "between": lambda c, v: c.between(v[0], v[1]),
    }
    conds = [ops[op](F.col(col), value) for col, op, value in where]
    return reduce(lambda a, b: a & b, conds)


_Z_BITS = 16  # per-column bucket resolution (65536 range buckets)


def _zvalue(df: DataFrame, cols: list[str]) -> Column:
    """Bit-interleaved Z-value over width-bucketed columns, all JVM-side.

    Each (numeric or timestamp) column maps to a 16-bit bucket with
    ``width_bucket`` over its global [min, max] — ONE tiny all-column
    aggregate on the driver, then pure narrow per-row arithmetic; no
    global window, no extra shuffle beyond the repartitionByRange the
    compaction does anyway. A deliberately simpler bucketing than Delta's
    rank-space range IDs: uniform widths lose skipping power on heavily
    skewed columns (upgrade path: approxQuantile boundaries), but never
    affect correctness — the zone maps stay exact either way."""
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"lo_{c}"), F.max(v).alias(f"hi_{c}")]
    bounds = df.agg(*aggs).first()

    n_buckets = 1 << _Z_BITS
    buckets = []
    for c in cols:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        v = F.col(c).cast("double")
        if lo is None or hi is None or lo == hi:
            buckets.append(F.lit(0).cast("long"))
            continue
        wb = F.width_bucket(v, F.lit(lo), F.lit(hi), F.lit(n_buckets))
        buckets.append(
            F.coalesce(
                F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), wb - 1)),
                F.lit(0),
            ).cast("long")
        )
    n = len(buckets)
    terms = []
    for bit in range(_Z_BITS):
        for ci, b in enumerate(buckets):
            # source bit `bit` of column ci → interleaved position
            pos = bit * n + (n - 1 - ci)
            terms.append(
                F.shiftleft(F.shiftright(b, bit).bitwiseAND(F.lit(1)), pos)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)
