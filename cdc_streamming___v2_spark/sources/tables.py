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

    Arrow-kernel formulation: tokenize + shingle + first-occurrence-dedup
    per row in a vectorized mapInPandas batch, emitting the exploded rows
    directly. Replaces the JVM higher-order-function chain
    (``exploded_shingles_jvm``) measured ~3x slower at sf0.1 — Spark HOFs
    evaluate interpreted (no codegen), so each of the ~150 slice+join
    lambda invocations per document paid interpreter overhead. The kernel
    is a narrow map over the fanned-out scan: no shuffle, batch-sized
    memory, same parity contract as the minhash kernel (regex \\s+ split
    of trimmed text, space-joined n-grams, distinct) — equivalence vs the
    JVM form is pinned by tests/test_llm_ops.py and every consumer's
    DuckDB oracle.
    """
    import pandas as pd

    ktypes = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    )
    schema = f"{ktypes}, s string"
    src = fan_out(df.select(*keys, F.col(text_col).alias("__t")))
    kl = list(keys)

    def gen(batches):
        import re

        # Exact JVM/DuckDB parity (ADVICE r3): the twin expression is
        # F.split(F.trim(text), "\\s+") — Spark trim strips ONLY ' ' and
        # Java/RE2 \s is the ASCII class, while Python str.strip()/\s are
        # Unicode-aware (e.g. they'd eat U+00A0 and leading tabs).  Strip
        # ' ' only and split on the explicit ASCII class so '\tfoo bar'
        # yields ['', 'foo', 'bar'] on every engine.
        rx = re.compile(r"[ \t\n\x0b\f\r]+")
        for pdf in batches:
            out = {k: [] for k in kl}
            ss = []
            for vals in zip(*(pdf[k] for k in kl), pdf["__t"]):
                text = vals[-1]
                t = text.strip(" ") if text else ""
                w = rx.split(t) if t else []
                if len(w) < n:
                    continue
                sh = dict.fromkeys(
                    " ".join(w[i : i + n]) for i in range(len(w) - n + 1)
                )
                for s in sh:
                    for k, v in zip(kl, vals):
                        out[k].append(v)
                    ss.append(s)
            out["s"] = ss
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema)


def exploded_shingles_jvm(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    keys: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """The pure-JVM built-in formulation of ``exploded_shingles`` (kept as
    the equivalence-test twin): token array materialized in a projection
    BELOW the fan-out exchange so the regex split runs once per row, and
    ``explode_outer`` + IS NOT NULL so the derived size(sh) > 0 predicate
    cannot sink below the exchange onto the un-fanned-out scan."""
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
