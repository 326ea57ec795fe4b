"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference CDC pipeline (brenonogueirasilva/cdc-streamming---V2).

The reference (see /root/reference, SURVEY.md) is a GCP change-data-capture
pipeline: MySQL binlog -> Datastream -> GCS NDJSON logs -> Beam -> BigQuery
append-only versioned history tables, queried "as of" a point in time.

This package re-expresses those semantics Spark-first:

- ``sources``   — parquet/JSON table loaders, CDC envelope schema, schema registry
                  (compatible with the reference's src/data-stream.json).
- ``streaming`` — Structured Streaming CDC ingest (file source -> parse -> enrich
                  -> route -> per-table append sinks + dead-letter), replacing
                  src/dataflow-cdc-stream.py's Beam graph.
- ``operators`` — batch query surface: SCD2/history resolution, relational
                  (joins/aggs/windows/set-ops), dedup, similarity search,
                  text analysis, multimodal plumbing.
- ``functions`` — reusable column expressions (vector math, text metrics).
- ``plans``     — plan-inspection helpers (explain capture, shuffle counting).

Everything is public PySpark DataFrame/SQL API; no custom Catalyst rules are
required (SURVEY.md §4).
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
