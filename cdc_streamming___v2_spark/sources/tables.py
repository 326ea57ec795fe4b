"""Batch table loaders for the driver's parquet testdata.

Scans are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown / column pruning / row-group skipping for free (SURVEY.md §4).
At cluster scale the same call reads a partitioned parquet/Delta layout;
nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import TABLES

# Tables small enough to broadcast at ANY scale factor (dimension tables whose
# cardinality is fixed or near-fixed: 5 regions, 25 nations). Used by operators
# to hint broadcast joins explicitly rather than trusting the size estimator.
ALWAYS_BROADCAST = {"region", "nation"}



def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Coerce an events frame's ts to TIMESTAMP(MICROS) regardless of how the
    parquet encoded it.

    Generations of the driver testdata have stored ts as TIMESTAMP(NANOS)
    (Spark reads it only as a nanosecond long under
    spark.sql.legacy.parquet.nanosAsLong) and as tz-less TIMESTAMP(MICROS)
    (reads directly as TimestampType with inferTimestampNTZ disabled —
    session.configure_existing). Micros is DuckDB's TIMESTAMP precision, so
    oracle parity holds either way.
    """
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a small single-file scan across the cluster before per-row
    compute that dwarfs the scan cost (shingling: ~50 hashes/row).

    A tiny parquet file arrives as ONE partition, serializing downstream
    work onto one core. Gate on scan-reported input files/size so the
    repartition only fires for under-partitioned scans — at real scale the
    scan already carries >= parallelism splits and this is a no-op (no
    extra shuffle on the 100 TB path).
    """
    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files and len(files) < max(2, parallelism // 4):
        return df.repartition(parallelism)
    return df


def exploded_shingles(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    keys: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """One row per distinct word n-gram shingle: (*keys, s).

    The fast formulation of ``explode(word_shingles(text))`` for
    corpus-scale inputs, addressing two Catalyst behaviors that otherwise
    serialize the whole shingling pass onto the scan's partitions:

    - the token array is materialized in a projection BELOW the fan-out
      exchange, so the regex split runs once per row (inlined into the
      shingle lambda it would run once per shingle index — O(tokens²)),
      and the exchange is a collapse barrier that keeps it materialized;
    - ``explode_outer`` + ``IS NOT NULL`` replaces ``explode``: the
      not-null filter is on the GENERATOR output, which cannot be pushed
      below the exchange, whereas explode's derived ``size(sh) > 0``
      predicate sinks to the un-fanned-out scan and re-evaluates the full
      shingle expression there, single-threaded.

    Measured on sf0.1 decontaminate: 10.1s → 0.9s, identical output.
    """
    from ..functions.texts import shingles_of_words, words

    toks = fan_out(df.select(*keys, words(F.col(text_col)).alias("__w")))
    sh = shingles_of_words(F.col("__w"), n)
    return toks.select(*keys, F.explode_outer(sh).alias("s")).filter(
        F.col("s").isNotNull()
    )


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view for the SQL API surface."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
