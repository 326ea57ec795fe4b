"""Multimodal column plumbing (DRIVER surface): images/audio/video as
opaque ``binary`` columns with typed metadata, processed through
Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed:
``decoder="fake"`` derives deterministic pseudo-metadata/features from the
bytes (testable end-to-end); ``decoder="real"`` raises NotImplementedError
at the exact point a PIL/ffmpeg call would go. Everything Spark-side —
schema, partitioning, UDF signatures, Arrow batch shapes — is real.

Scale: mapInPandas streams Arrow record batches through Python; per-batch
(not per-row) overhead. Binary payloads stay in the executor — no
collect(). Batch size is governed by spark.sql.execution.arrow.
maxRecordsPerBatch; at 100 TB you additionally partition by a content-size
bucket so one giant video doesn't skew a task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 8


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a media table from ``documents`` (text bytes as stand-in
    payload) — gives the plumbing a real binary column to flow."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    content = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        content.alias("content"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.length(F.col("text")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic pseudo-decode: dimensions/frames/features derived from
    a digest of the payload. Replace with PIL/torchaudio/ffmpeg in prod."""
    d = hashlib.sha256(content or b"").digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    n_frames = 1 + d[2] % 30
    feats = [round((b / 255.0) * 2 - 1, 6) for b in d[3 : 3 + FEATURE_DIM]]
    return width, height, n_frames, feats


def decode_media(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """binary content -> typed metadata + feature vector via mapInPandas."""
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "real":
                # PIL.Image.open(io.BytesIO(content)) / ffmpeg would go here
                raise NotImplementedError(
                    "real media codecs are not available in this container"
                )
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": [], "height": [], "n_frames": [], "features": [],
            }
            for content in pdf["content"]:
                w, h, nf, feats = _fake_decode(
                    bytes(content) if content is not None else b""
                )
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def resize_spec(decoded: DataFrame, max_side: int = 64) -> DataFrame:
    """Compute resize plan (pure column math — no Python). The actual pixel
    resample would live in the decode UDF; the plan (scale factor, output
    dims) is exactly what a distributed image pipeline shuffles on."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return decoded.select(
        "media_id",
        "kind",
        F.round(scale, 4).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
    )


def sample_frames(decoded: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame-sampling plan for videos: one row per kept frame index."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
    return (
        decoded.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )


# --- driver-surface query (oracle-checked end to end) ------------------------


def multimodal_decode(spark, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline as one plan: synthesize binary media from
    documents -> Arrow-batched mapInPandas decode -> resize plan ->
    frame-sampling counts.

    Oracle-checkable because the fake decoder is sha256-byte arithmetic,
    which DuckDB reproduces exactly — so the mapInPandas plumbing (schema,
    Arrow batch shapes, binary columns) is verified by value, not just
    smoke-tested.
    """
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # mapInPandas input is opaque to Catalyst — column pruning can't reach
    # inside the Python stage, so drop the unused meta struct from the
    # Arrow exchange explicitly
    media = synthesize_media(docs).select("media_id", "kind", "content")
    dec = decode_media(media, "fake")
    # ONE Python stage, zero self-joins: the earlier formulation referenced
    # `dec` from three subtrees (select + resize join + frame-count join),
    # so Spark executed the mapInPandas decode three times and shuffled the
    # results back together on media_id. The resize plan is 1:1 column
    # math (resize_spec's expressions inline here) and the kept-frame count
    # of sample_frames' every-nth sequence has the closed form
    # (n_frames-1) div nth + 1 — both fuse into the decode projection.
    # resize_spec / sample_frames stay as the per-op APIs for pipelines
    # that need the exploded rows (tests/test_multimodal.py).
    scale = F.least(
        F.lit(1.0), F.lit(64) / F.greatest(F.col("width"), F.col("height"))
    )
    kept = (
        F.when(
            F.col("kind") == "video",
            F.floor((F.col("n_frames") - 1) / 5) + 1,
        )
        .otherwise(0)
        .cast("long")
    )
    return dec.select(
        "media_id",
        "kind",
        "width",
        "height",
        "n_frames",
        F.size("features").alias("n_features"),
        F.round(scale, 4).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
        kept.alias("n_kept_frames"),
    )


ORACLES = {
    "multimodal_decode": f"""
        WITH m AS (
            SELECT doc_id AS media_id,
                   ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
                   sha256(text) AS hx
            FROM documents
        ),
        d AS (
            SELECT media_id, kind,
                   16 + CAST('0x' || substr(hx, 1, 2) AS INT) % 240 AS width,
                   16 + CAST('0x' || substr(hx, 3, 2) AS INT) % 240 AS height,
                   1  + CAST('0x' || substr(hx, 5, 2) AS INT) % 30  AS n_frames
            FROM m
        )
        SELECT media_id, kind, width, height, n_frames,
               CAST({FEATURE_DIM} AS INT) AS n_features,
               round(least(1.0, 64.0 / greatest(width, height)), 4) AS scale,
               CAST(ceil(width  * least(1.0, 64.0 / greatest(width, height)))
                    AS INT) AS out_width,
               CAST(ceil(height * least(1.0, 64.0 / greatest(width, height)))
                    AS INT) AS out_height,
               CAST(CASE WHEN kind = 'video' THEN (n_frames - 1) // 5 + 1
                         ELSE 0 END AS BIGINT) AS n_kept_frames
        FROM d
    """,
}

QUERIES = {
    "multimodal_decode": multimodal_decode,
}
