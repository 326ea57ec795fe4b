"""Batch file-format IO: CSV, ORC, NDJSON (plain or gzip), Parquet, XML.

The reference's only formats are GZIP NDJSON in (Datastream logs,
build/stream/stream.tf:148-151) and BigQuery out; this module gives the
engine the full interchange surface a standalone deployment needs. Every
reader takes an EXPLICIT schema — schema inference re-scans the data
(2x reads at 100 TB) and silently drifts when a partition is missing a
field; declared schemas fail loudly instead, matching the reference's
fixed-registry stance (SURVEY.md §1.1 item 3).

Scale notes:
- CSV/JSON are row formats with no column pruning or predicate pushdown —
  fine as ingest/egress boundaries, wrong as the analytic store. ORC and
  Parquet both push filters and prune columns (verified in
  tests/test_formats.py via PushedFilters in the explain output).
- Writers accept ``partition_cols`` so big outputs land partition-pruned;
  compression defaults to the format's best-practice codec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Timestamps in text formats need an explicit round-trippable pattern;
# default CSV formatting drops sub-second precision inconsistently.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_csv(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    compression: str = "gzip",
) -> None:
    w = (
        df.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", _TS_FMT)
        .option("compression", compression)
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", _TS_FMT)
        # malformed rows -> null row + preserved raw line when the schema
        # declares a _corrupt_record column; never silently dropped
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_orc(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite").option("compression", "zlib")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).orc(path)


def write_ndjson(
    df: DataFrame, path: str, compression: str = "gzip"
) -> None:
    """NDJSON out — the reference's own log interchange format."""
    df.write.mode("overwrite").option("timestampFormat", _TS_FMT).option(
        "compression", compression
    ).json(path)


def read_ndjson(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """GZIP decodes transparently from the file extension, exactly as the
    streaming ingest path does for Datastream logs."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def write_parquet(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite").option("compression", "snappy")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).parquet(path)


def write_xml(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    """Spark 4 native XML writer (rowTag records); timestamps use the same
    round-trippable pattern as CSV."""
    w = (
        df.write.mode("overwrite")
        .format("xml")
        .option("rowTag", "row")
        .option("timestampFormat", _TS_FMT)
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.save(path)


def read_xml(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "row")
        .option("timestampFormat", _TS_FMT)
        .load(path)
    )


FORMATS = {
    "csv": (write_csv, read_csv),
    "orc": (write_orc, read_orc),
    "json": (write_ndjson, read_ndjson),
    "parquet": (write_parquet, read_parquet),
    "xml": (write_xml, read_xml),
}
