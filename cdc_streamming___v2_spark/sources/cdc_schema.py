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


# Debezium op codes -> the engine's canonical action vocabulary (the one
# the reference's registry/sink path speaks, src/dataflow-cdc-stream.py:64-69).
# 'r' is a snapshot read — semantically an initial-load INSERT.
DEBEZIUM_ACTIONS = (
    ("c", "INSERT"),
    ("u", "UPDATE-INSERT"),
    ("d", "DELETE"),
    ("r", "INSERT"),
)


def parse_envelope_debezium(
    raw_lines: DataFrame, line_col: str = "value"
) -> DataFrame:
    """Debezium change records -> the SAME canonical envelope columns as
    ``parse_envelope``, so the entire downstream pipeline (registry route,
    from_json payload decode, enrich, sinks, dead-letter) is shared
    verbatim between the two producer ecosystems (VERDICT r4 #1: the
    north-star "Debezium/Kafka integration" was an envelope-adapter gap,
    not a source gap).

    Field mapping (Debezium's public envelope: ``op`` in c/u/d/r,
    ``before``/``after`` row images, ``ts_ms`` epoch millis,
    ``source.table``):

    - ``op`` c/u/d/r -> action INSERT / UPDATE-INSERT / DELETE / INSERT
      ('r' = snapshot read = initial-load insert); unknown/absent op
      yields a NULL action row that dead-letters downstream.
    - payload = ``after`` image; for deletes (``after`` is null by the
      Debezium contract) the ``before`` image — richer than the
      reference's blank-row DELETE (README.md:57): consumers get the full
      last-known row, and key columns are present either way.
    - ``ts_ms`` -> ``update_date_raw`` as a UTC
      ``yyyy-MM-dd HH:mm:ss.SSS`` string, so the registry's STRING and
      TIMESTAMP update_date declarations both coerce through
      ``update_date_expr`` exactly as with the Datastream envelope.
    - ``source.table`` -> object (the registry routing key).

    Both wire forms are accepted: the schema-wrapped Kafka Connect shape
    ``{"schema": ..., "payload": {op, ...}}`` and the bare record (the
    common ExtractNewRecordState-less payload after schemas are disabled)
    — ``coalesce($.payload, line)`` normalizes to the record body first.
    All JVM-side json expressions; malformed lines yield nulls (routed to
    dead-letter), never a stream failure.
    """
    line = F.col(line_col)
    body = F.coalesce(F.get_json_object(line, "$.payload"), line)
    parsed = raw_lines.select(
        F.json_tuple(body, "op", "ts_ms", "before", "after").alias(
            "op", "ts_ms", "before", "after"
        ),
        F.get_json_object(body, "$.source.table").alias("object"),
        line.alias("raw"),
    )
    action: Column = F.lit(None).cast("string")
    for code, act in DEBEZIUM_ACTIONS:
        action = F.when(F.col("op") == code, F.lit(act)).otherwise(action)
    update_raw = F.date_format(
        F.timestamp_millis(F.col("ts_ms").cast("long")),
        "yyyy-MM-dd HH:mm:ss.SSS",
    )
    payload = F.when(
        F.col("op") == "d", F.coalesce(F.col("after"), F.col("before"))
    ).otherwise(F.col("after"))
    return parsed.select(
        "object",
        action.alias("action"),
        update_raw.alias("update_date_raw"),
        payload.alias("payload_json"),
        "raw",
    )


def parse_envelope_auto(
    raw_lines: DataFrame, line_col: str = "value"
) -> DataFrame:
    """Per-LINE envelope dispatch for mixed streams: a topic/directory
    carrying BOTH Datastream-style and Debezium records parses into one
    canonical envelope frame.  A line is Debezium iff it has an ``op``
    field (bare or under ``$.payload``); everything else takes the
    Datastream path (whose unknown-field lines null out and dead-letter).

    Plan shape: two filtered narrow projections of the same source,
    unioned — no shuffle, no join; each row is json-parsed by exactly one
    branch plus the two cheap ``op`` probes.  In single-pass ingest the
    downstream per-table routing persists the unioned envelope batch, so
    the source is still scanned once per micro-batch."""
    line = F.col(line_col)
    is_dbz = (
        F.get_json_object(line, "$.op").isNotNull()
        | F.get_json_object(line, "$.payload.op").isNotNull()
    )
    ds = parse_envelope(raw_lines.filter(~is_dbz), line_col)
    dz = parse_envelope_debezium(raw_lines.filter(is_dbz), line_col)
    return ds.unionByName(dz)


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
