"""Schema registry: maps CDC source-object names to sink table + schema.

Format-compatible with the reference's registry document
(/root/reference/src/data-stream.json:1-36): a JSON object
``{object_name: {"table_name": str, "schema": {"fields": [{"name","type"}]}}}``
with BigQuery types STRING | FLOAT | INT64 | TIMESTAMP.

Unlike the reference — which re-downloads and re-parses this document from
GCS for EVERY CDC record (src/dataflow-cdc-stream.py:71-74, the N+1
anti-pattern called out in SURVEY.md §4) — we load it once on the driver.
The dict is tiny and closure-captured into the streaming query; at cluster
scale it rides along in the serialized plan (no per-record I/O, no
broadcast needed for a handful of table schemas).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import types as T

# BigQuery field type -> Spark type (SURVEY.md §1.2). The reference's
# registry declares update_date as STRING for one table and TIMESTAMP for
# the other (data-stream.json:17 vs :31); the loader preserves that quirk.
BQ_TO_SPARK: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "INT64": T.LongType(),
    "INTEGER": T.LongType(),
    "TIMESTAMP": T.TimestampType(),
    "BOOL": T.BooleanType(),
    "BOOLEAN": T.BooleanType(),
    # engine extensions beyond BigQuery's vocabulary: narrow physical
    # types a source system may start with, so the registry can express
    # the WIDENING evolutions below (BigQuery itself has no 32-bit types)
    "INT32": T.IntegerType(),
    "FLOAT32": T.FloatType(),
}

# Value-preserving type widenings safe for an append-only parquet history
# read with an explicit schema: old files keep their narrow physical type
# and the parquet reader up-converts at scan time. This is EXACTLY the
# set Spark 4's vectorized reader supports (measured here on 4.1.2:
# int32->int64 / float32->float64 / int32->double read fine; int64->double
# raises PARQUET_COLUMN_DATA_TYPE_MISMATCH — so INT64->FLOAT64 is NOT
# safe and stays rejected).
SAFE_WIDENINGS: set[tuple[T.DataType, T.DataType]] = {
    (T.IntegerType(), T.LongType()),
    (T.FloatType(), T.DoubleType()),
    (T.IntegerType(), T.DoubleType()),
}


def is_safe_widening(old: T.DataType, new: T.DataType) -> bool:
    return (old, new) in SAFE_WIDENINGS


# simpleString -> DataType, for tombstone entries (which persist as JSON)
_SIMPLE_TO_SPARK: dict[str, T.DataType] = {
    t.simpleString(): t
    for t in (
        T.StringType(), T.IntegerType(), T.LongType(), T.FloatType(),
        T.DoubleType(), T.TimestampType(), T.BooleanType(),
    )
}

# Columns the engine adds to every history row (reference py:66-67).
ENGINE_COLUMNS = ("action", "update_date")


@dataclass(frozen=True)
class TableSpec:
    """One registered source object.

    ``renames`` maps new column name -> immediate predecessor name, from
    the registry document's per-field ``renamed_from`` declarations (the
    Avro-alias pattern: a schema rename is declared ON the new field, so
    the reader can tell a RENAME from an unrelated drop+add — which is
    otherwise indistinguishable from the document diff alone).
    """

    object_name: str
    table_name: str
    schema: T.StructType  # full sink schema incl. action/update_date
    renames: dict = field(default_factory=dict)  # new name -> old name

    @property
    def payload_schema(self) -> T.StructType:
        """Schema of the source row image (sink schema minus engine cols)."""
        return T.StructType(
            [f for f in self.schema.fields if f.name not in ENGINE_COLUMNS]
        )


class SchemaRegistry:
    """Parsed registry; lookup by source object name."""

    def __init__(self, tables: dict[str, TableSpec]):
        self._tables = tables

    @classmethod
    def from_dict(cls, doc: dict) -> "SchemaRegistry":
        tables = {}
        for obj_name, entry in doc.items():
            fields = [
                T.StructField(f["name"], BQ_TO_SPARK[f["type"].upper()], True)
                for f in entry["schema"]["fields"]
            ]
            renames = {
                f["name"]: f["renamed_from"]
                for f in entry["schema"]["fields"]
                if f.get("renamed_from")
            }
            tables[obj_name] = TableSpec(
                object_name=obj_name,
                table_name=entry["table_name"],
                schema=T.StructType(fields),
                renames=renames,
            )
        return cls(tables)

    @classmethod
    def from_json(cls, text: str) -> "SchemaRegistry":
        return cls.from_dict(json.loads(text))

    @classmethod
    def from_file(cls, path: str) -> "SchemaRegistry":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def get(self, object_name: str) -> TableSpec | None:
        return self._tables.get(object_name)

    def __iter__(self):
        return iter(self._tables.values())

    def __len__(self) -> int:
        return len(self._tables)

    @property
    def object_names(self) -> list[str]:
        return list(self._tables)

    def check_evolution(
        self,
        new: "SchemaRegistry",
        allow_column_drops: bool = False,
        tombstones: dict[str, str] | None = None,
        renames: dict[str, str] | None = None,
    ) -> dict[str, str]:
        """Validate that ``new`` is a safe successor registry for history
        tables already written under ``self`` (the ALTER TABLE story the
        reference's static registry has no answer to).

        Safe evolution for an append-only parquet history read with an
        explicit schema:
        - add a table (new object) — trivially safe;
        - add a column — old files simply project NULL for it (the same
          "absent field" semantics the CDC envelope already has);
        - WIDEN a column's type along ``SAFE_WIDENINGS`` (int32->int64,
          float32->float64, int32->float64) — old files keep their narrow
          physical type; Spark 4's parquet reader up-converts at scan
          time (measured; int64->double is NOT supported and stays
          rejected);
        - DROP a column, only when ``allow_column_drops=True`` (opt-in:
          an accidental drop must fail loudly by default) — old files
          retain the data physically, reads project it away. The drop is
          returned as a TOMBSTONE entry ``{"obj.col": old_type}`` the
          caller must persist: re-ADDING a tombstoned column later with a
          type the buried physical data can't be read as (not equal, not
          a safe widening of it) is rejected via ``tombstones``, because
          the old files still contain the column under its original type
          and an explicit-schema scan over them would fail;
        - anything else — dropping a table, a non-widening type change,
          or renaming a sink table — would silently corrupt or orphan
          existing history, so it is rejected here, BEFORE a stream
          restart starts writing mixed-schema files.

        Raises ``ValueError`` listing every violation; returns the newly
        dropped columns as tombstones to merge-and-persist (a RENAME also
        buries its old name — see ``check_evolution_full`` for the rename
        continuity map that pairs with these tombstones).
        """
        dropped, _renamed = self.check_evolution_full(
            new,
            allow_column_drops=allow_column_drops,
            tombstones=tombstones,
            renames=renames,
        )
        return dropped

    def check_evolution_full(
        self,
        new: "SchemaRegistry",
        allow_column_drops: bool = False,
        tombstones: dict[str, str] | None = None,
        renames: dict[str, str] | None = None,
    ) -> tuple[dict[str, str], dict[str, str]]:
        """``check_evolution`` plus the admitted-rename map.

        A column RENAME is declared ON the new field via ``renamed_from``
        in the registry document (the Avro schema-resolution alias
        pattern: from the document diff alone, drop(a)+add(b) and
        rename(a→b) are indistinguishable — the declaration is what
        carries identity).  Admission rules:

        - the predecessor must exist in the old schema, must be RETIRED
          by the rename (still present = a copy/alias, rejected), must
          not be an engine column, and at most one new field may claim
          it;
        - the new type must equal the old or be a safe parquet widening
          of it (history files physically hold the OLD name at the OLD
          type — an unsafe type under the new name would sever them);
        - the old name is tombstoned exactly like a drop (the buried
          files still hold it), and additionally may NEVER be re-added:
          unlike a dropped column, renamed-away data is LIVE under its
          new name — re-introducing the old name would double-expose the
          buried values and corrupt read continuity.

        Returns ``(tombstones_to_merge, renames_to_merge)`` where the
        second maps ``"obj.new_name" -> old_name``; the caller persists
        both sink-side so history reads can coalesce the buried
        predecessor columns (and chains of them) into the current name.
        ``renames`` is the previously persisted map, consulted for the
        re-add rejection above.
        """
        problems: list[str] = []
        dropped: dict[str, str] = {}
        renamed: dict[str, str] = {}
        ts = tombstones or {}
        rn = renames or {}
        for obj, old_spec in self._tables.items():
            new_spec = new.get(obj)
            if new_spec is None:
                problems.append(f"{obj}: table dropped")
                continue
            if new_spec.table_name != old_spec.table_name:
                problems.append(
                    f"{obj}: sink renamed {old_spec.table_name!r} -> "
                    f"{new_spec.table_name!r} (orphans existing history)"
                )
            old_fields = {f.name: f.dataType for f in old_spec.schema.fields}
            new_fields = {f.name: f.dataType for f in new_spec.schema.fields}

            # -- rename admissions (declared on the new fields) ---------
            admitted: dict[str, str] = {}  # old name -> new name
            for b, a in (new_spec.renames or {}).items():
                if a == b or a not in old_fields or b not in new_fields:
                    continue  # inert alias (Avro semantics: no match)
                if a in ENGINE_COLUMNS:
                    problems.append(
                        f"{obj}.{b}: renamed_from engine column {a!r}"
                    )
                    continue
                if a in new_fields:
                    problems.append(
                        f"{obj}.{b}: renamed_from {a!r} but {a!r} is "
                        f"still present — a rename must retire the old "
                        f"name (a live-column copy is not an evolution)"
                    )
                    continue
                if a in admitted:
                    problems.append(
                        f"{obj}: both {admitted[a]!r} and {b!r} declare "
                        f"renamed_from {a!r} — ambiguous"
                    )
                    continue
                old_t, new_t = old_fields[a], new_fields[b]
                if new_t != old_t and not is_safe_widening(old_t, new_t):
                    problems.append(
                        f"{obj}.{b}: renamed from {a!r} with unsafe type "
                        f"change {old_t.simpleString()} -> "
                        f"{new_t.simpleString()} (history files hold "
                        f"{a!r} as {old_t.simpleString()}; only equal or "
                        f"safe-widened types keep them readable)"
                    )
                    continue
                admitted[a] = b
                dropped[f"{obj}.{a}"] = old_t.simpleString()
                renamed[f"{obj}.{b}"] = a

            for name, old_t in old_fields.items():
                if name not in new_fields:
                    if name in admitted:
                        continue  # retired by a rename; data lives on
                    if allow_column_drops and name not in ENGINE_COLUMNS:
                        dropped[f"{obj}.{name}"] = old_t.simpleString()
                    else:
                        problems.append(f"{obj}.{name}: column dropped")
                elif new_fields[name] != old_t and not is_safe_widening(
                    old_t, new_fields[name]
                ):
                    problems.append(
                        f"{obj}.{name}: type changed "
                        f"{old_t.simpleString()} -> "
                        f"{new_fields[name].simpleString()} (not a safe "
                        f"parquet widening)"
                    )

            # names retired by a rename — persisted chains plus this
            # round's admissions — may never come back (see docstring)
            pref = obj + "."
            live_preds = {
                old for key, old in rn.items() if key.startswith(pref)
            } | set(admitted)
            for name, new_t in new_fields.items():
                key = f"{obj}.{name}"
                if name in old_fields:
                    continue
                if name in live_preds:
                    problems.append(
                        f"{key}: re-added but this name was renamed away "
                        f"— its history is live under the successor "
                        f"column; re-introducing it would double-expose "
                        f"the buried values"
                    )
                    continue
                if key not in ts:
                    continue
                buried = _SIMPLE_TO_SPARK.get(ts[key])
                if buried is not None and buried != new_t and not (
                    is_safe_widening(buried, new_t)
                ):
                    problems.append(
                        f"{key}: re-added as {new_t.simpleString()} but "
                        f"history files hold it as {ts[key]} (tombstoned "
                        f"drop) — reads over old files would fail"
                    )
        if problems:
            raise ValueError(
                "unsafe registry evolution: " + "; ".join(problems)
            )
        return dropped, renamed
