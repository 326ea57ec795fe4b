"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares row count, column names, and an
order-insensitive value hash (floats canonicalized via repr of round-trip).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from cdc_streamming___v2_spark import TABLES  # noqa: E402
from cdc_streamming___v2_spark.session import get_spark  # noqa: E402


def _canon(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NaN"
        # collapse float noise below 1e-9 relative
        return repr(round(v, 9))
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


_DRIVER_UNSAFE_TYPES = ("HUGEINT", "UHUGEINT")


def driver_unsafe_columns(con, sql: str) -> list:
    """Final-output columns whose DuckDB type the driver canonicalizes lossily.

    The driver hashes the oracle side from a pandas frame: HUGEINT/UHUGEINT
    become float64 (``3750.0``) while the Spark twin emits int64 (``3750``) —
    a guaranteed hash mismatch even when values are identical (round-6 verdict:
    dynamodb/debezium_flat went red exactly this way).  ``fetchall()`` — which
    this checker hashes from — yields native Python ints and hides the class,
    so we flag it from the *bound relation types* instead.  DECIMAL final
    columns are verified-safe (media_byte_histogram carried one and passed).
    """
    rel = con.sql(sql)
    return [
        c for c, t in zip(rel.columns, rel.types)
        if str(t) in _DRIVER_UNSAFE_TYPES
    ]


def table_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            unsafe = driver_unsafe_columns(con, oracles[name])
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if unsafe:
            failures.append(name)
            print(
                f"FAIL  {name}: oracle emits driver-unsafe final column "
                f"type(s) {unsafe} (HUGEINT -> pandas float64 vs Spark "
                f"int64); CAST(... AS BIGINT) in the oracle"
            )
            continue

        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = table_hash([tuple(r) for r in srows], scols)
        dh = table_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK  " if (ok_count and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name}: rows {len(srows)}/{len(drows)} "
            f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"hash={'ok' if ok_hash else 'MISMATCH'} [{time.time()-t0:.1f}s]"
        )
        if not ok_hash and ok_count and ok_cols:
            # print a few diffing rows to debug
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sset = {"|".join(_canon(r[i]) for i in order_s) for r in srows}
            dset = {"|".join(_canon(r[i]) for i in order_d) for r in drows}
            for r in list(sset - dset)[:3]:
                print(f"      spark-only: {r[:200]}")
            for r in list(dset - sset)[:3]:
                print(f"      duck-only:  {r[:200]}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
