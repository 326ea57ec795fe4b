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
from dataclasses import dataclass

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
}

# Columns the engine adds to every history row (reference py:66-67).
ENGINE_COLUMNS = ("action", "update_date")


@dataclass(frozen=True)
class TableSpec:
    """One registered source object."""

    object_name: str
    table_name: str
    schema: T.StructType  # full sink schema incl. action/update_date

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
            tables[obj_name] = TableSpec(
                object_name=obj_name,
                table_name=entry["table_name"],
                schema=T.StructType(fields),
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

    def check_evolution(self, new: "SchemaRegistry") -> None:
        """Validate that ``new`` is a safe successor registry for history
        tables already written under ``self`` (the ALTER TABLE story the
        reference's static registry has no answer to).

        Safe evolution for an append-only parquet history read with an
        explicit schema:
        - add a table (new object) — trivially safe;
        - add a column — old files simply project NULL for it (the same
          "absent field" semantics the CDC envelope already has);
        - anything else — dropping a table/column, changing a column's
          type, or renaming a sink table — would silently corrupt or
          orphan existing history, so it is rejected here, BEFORE a
          stream restart starts writing mixed-schema files.

        Raises ``ValueError`` listing every violation.
        """
        problems: list[str] = []
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
            new_fields = {f.name: f.dataType for f in new_spec.schema.fields}
            for f in old_spec.schema.fields:
                if f.name not in new_fields:
                    problems.append(f"{obj}.{f.name}: column dropped")
                elif new_fields[f.name] != f.dataType:
                    problems.append(
                        f"{obj}.{f.name}: type changed "
                        f"{f.dataType.simpleString()} -> "
                        f"{new_fields[f.name].simpleString()}"
                    )
        if problems:
            raise ValueError(
                "unsafe registry evolution: " + "; ".join(problems)
            )
