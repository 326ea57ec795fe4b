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


# --- streaming near-dup against a static corpus index ------------------------


def corpus_minhash_index(corpus_docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Static side of the streaming near-dup check: the corpus's MinHash
    band index (doc_id, band, bh) and its per-doc shingle sets — in
    deployment both are materialized tables maintained by the batch
    pipeline (operators/dedup.py), recomputed here for self-containment."""
    from ..operators.dedup import (
        _minhash_bands,
        _signatures_from_shingles,
    )
    from ..sources.tables import exploded_shingles

    sh = exploded_shingles(corpus_docs)
    bands = _minhash_bands(_signatures_from_shingles(sh))
    sets = sh.groupBy("doc_id").agg(F.collect_set("s").alias("corpus_sh"))
    return bands, sets


def near_dup_check(
    docs: DataFrame, corpus_docs: DataFrame, n: int = 3
) -> DataFrame:
    """MinHash near-dup of a document batch against the STATIC corpus band
    index, exact-jaccard-verified — the plan the streaming runner executes
    per micro-batch (batch semantics: candidate dedup is scoped to the
    batch, so no unbounded stream state store is ever created).  Identical
    output contract to operators/dedup.incremental_near_dup: (doc_id,
    corpus_id, jaccard >= threshold); equality with the batch operator is
    asserted in tests.

    The per-document signature is computed ROW-LOCALLY — m_i = array_min(
    transform(shingles, s -> (a_i*h(s)+b_i) % P)) — no explode-groupBy;
    min over the row's shingle array equals min over the exploded distinct
    shingles, so signatures match the batch pipeline bit-for-bit.  Bands
    explode to (band, bh) rows and candidates come from an equi-join
    against the index; the verify join brings in the matched corpus doc's
    shingle set and intersects it with the streamed doc's own array.  Per
    batch work: O(batch size) plus index-probe joins — nothing
    proportional to corpus size on the probe side.
    """
    from ..functions.texts import md5_hash_long, word_shingles
    from ..operators.dedup import (
        JACCARD_THRESHOLD,
        MINHASH_AB,
        MINHASH_BANDS,
        MINHASH_P,
        MINHASH_ROWS,
    )

    bands_ix, sets_ix = corpus_minhash_index(corpus_docs)

    sh = word_shingles(F.col("text"), n)
    d = docs.select("doc_id", sh.alias("sh")).filter(F.size("sh") > 0)
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("sh"),
                lambda s: (F.lit(a) * md5_hash_long(s) + F.lit(b))
                % F.lit(MINHASH_P),
            )
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    d = d.select("doc_id", "sh", *sig_cols)
    band_hashes = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"m{j * MINHASH_ROWS + r}").cast("string")
                    for r in range(MINHASH_ROWS)
                ],
            )
        )
        for j in range(MINHASH_BANDS)
    ]
    probe = d.select(
        "doc_id",
        "sh",
        F.posexplode(F.array(*band_hashes)).alias("band", "bh"),
    )
    cand = (
        probe.join(
            bands_ix.select(F.col("doc_id").alias("corpus_id"), "band", "bh"),
            ["band", "bh"],
        )
        .select("doc_id", "sh", "corpus_id")
        .dropDuplicates(["doc_id", "corpus_id"])
    )
    verified = (
        cand.join(
            sets_ix.select(F.col("doc_id").alias("corpus_id"), "corpus_sh"),
            "corpus_id",
        )
        .withColumn("common", F.size(F.array_intersect("sh", "corpus_sh")))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.size("sh") + F.size("corpus_sh") - F.col("common")),
        )
    )
    return verified.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_id", "corpus_id", F.round("jaccard", 4).alias("jaccard")
    )


def near_dup_stream(
    doc_stream: DataFrame,
    corpus_docs: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Streaming runner: near_dup_check per micro-batch via foreachBatch,
    appended to a parquet sink.  foreachBatch (not a direct streaming
    plan) because the candidate dedup is then batch-scoped — a plan-level
    dropDuplicates on a stream would open an unbounded state store keyed
    by every (doc, corpus) pair ever seen."""

    def _write(batch: DataFrame, batch_id: int) -> None:
        near_dup_check(batch, corpus_docs).write.mode("append").parquet(
            sink_dir
        )

    writer = doc_stream.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
