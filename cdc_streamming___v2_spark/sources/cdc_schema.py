"""Datastream-style CDC envelope handling.

Envelope shape (FIXTURES.md §2; consumed fields exactly as the reference
reads them, src/dataflow-cdc-stream.py:64-69):

    {"object": "...", "source_timestamp": "...",
     "source_metadata": {"change_type": "INSERT|UPDATE-INSERT|DELETE"},
     "payload": {...full row image...}}

Parsing strategy (Spark-first): read each NDJSON line as raw text and pull
envelope fields with ``get_json_object`` — crucially ``$.payload`` comes out
as the RAW JSON STRING, which lets ONE stream with ONE fixed schema carry
rows destined for tables with DIFFERENT schemas. Each route then applies its
own ``from_json(payload_json, table_schema)``. All JVM-side, no Python UDFs.

This solves the "per-table dynamic schemas in one stream" problem flagged in
SURVEY.md §7 without custom Catalyst machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Canonical envelope columns extracted from the raw line.
ENVELOPE_COLS = ("object", "action", "update_date_raw", "payload_json", "raw")


def parse_envelope(raw_lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Raw text lines -> envelope columns. Malformed lines yield nulls
    (routed to dead-letter downstream) instead of failing the stream — the
    reference instead re-raises and retries the bundle forever
    (src/dataflow-cdc-stream.py:99-100); dead-lettering is strictly better.
    """
    line = F.col(line_col)
    # json_tuple parses the line ONCE for all four top-level fields (vs one
    # full re-parse per get_json_object call); nested objects come out as
    # their raw JSON text, which is exactly what the routing design needs
    # for payload. Only source_metadata (a tiny string) needs a second
    # parse for change_type. Malformed lines yield nulls all the way.
    return raw_lines.select(
        F.json_tuple(line, "object", "source_timestamp", "source_metadata", "payload")
        .alias("object", "update_date_raw", "meta_json", "payload_json"),
        line.alias("raw"),
    ).select(
        "object",
        F.get_json_object(F.col("meta_json"), "$.change_type").alias("action"),
        "update_date_raw",
        "payload_json",
        "raw",
    )


def update_date_expr(spark_type) -> Column:
    """Coerce the raw source_timestamp per the registry-declared type.

    Preserves the reference registry's quirk: update_date is STRING for one
    table and TIMESTAMP for another (data-stream.json:17 vs :31).
    """
    from pyspark.sql import types as T

    raw = F.col("update_date_raw")
    if isinstance(spark_type, T.TimestampType):
        return F.to_timestamp(raw)
    return raw.cast(spark_type)
