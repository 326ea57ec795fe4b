"""Streaming corpus-cleaning operators: the batch training-data pipeline
ops re-expressed as stream-static plans, so a document stream is scrubbed
per micro-batch instead of in a nightly batch.

Scale notes: everything here is stream-static — the static side is tiny
(an eval benchmark's shingle set) and broadcasts; the streaming side stays
narrow (no shuffle, no state store), so a 100-TB/day document stream
partitions freely across executors. For an eval set too large for an
in-row array, swap the exact array_intersect for a broadcast Bloom filter
of eval shingles (operators/sketches.py) — same plan shape, probabilistic
verify pass downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texts import word_shingles
from ..operators.pipeline_ops import DECON_SHINGLE_N


def eval_shingle_row(eval_docs: DataFrame, n: int = DECON_SHINGLE_N) -> DataFrame:
    """Static side: the eval corpus collapsed to ONE row holding the
    distinct shingle set as an array — the broadcastable form a stream-
    static cross join can consume (a stream can't be the build side of a
    join, and stream-static anti joins over an exploded grain aren't
    supported; one array row + array_intersect is the streaming-legal
    equivalent of the batch broadcast semi join)."""
    return (
        eval_docs.select(F.explode(word_shingles(F.col("text"), n)).alias("s"))
        .agg(F.collect_set("s").alias("eval_sh"))
    )


def decontaminate_stream(
    docs: DataFrame, eval_docs: DataFrame, n: int = DECON_SHINGLE_N
) -> DataFrame:
    """Streaming benchmark decontamination: flag each streamed document
    with its count of distinct word n-grams shared with the (static) eval
    corpus. Same semantics as operators/pipeline_ops.decontaminate; filter
    ``n_shared = 0`` downstream for the clean stream.

    The eval side re-collapses per stream start (not per record — Spark
    evaluates the static subplan once per micro-batch at most), so a
    registry-style eval refresh just restarts the query.
    """
    ev = eval_shingle_row(eval_docs, n)
    return (
        docs.withColumn("sh", word_shingles(F.col("text"), n))
        .crossJoin(F.broadcast(ev))
        .withColumn(
            "n_shared", F.size(F.array_intersect("sh", "eval_sh")).cast("bigint")
        )
        .drop("sh", "eval_sh")
    )
