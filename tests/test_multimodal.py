"""Multimodal plumbing tests: schema, Arrow batch flow, stub gating."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.operators import multimodal as M
from cdc_streamming___v2_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _media(spark):
    return M.synthesize_media(load_table(spark, SF_SMALL, "documents"))


def test_media_schema(spark):
    m = _media(spark)
    assert dict(m.dtypes) == {
        "media_id": "bigint",
        "kind": "string",
        "content": "binary",
        "meta": "struct<mime:string,n_bytes:bigint>",
    }
    assert m.count() == 500


def test_decode_fake_deterministic(spark):
    m = _media(spark).limit(20)
    a = {r.media_id: (r.width, r.height, tuple(r.features))
         for r in M.decode_media(m).collect()}
    b = {r.media_id: (r.width, r.height, tuple(r.features))
         for r in M.decode_media(m).collect()}
    assert a == b
    for w, h, feats in a.values():
        assert 16 <= w < 256 and 16 <= h < 256
        assert len(feats) == M.FEATURE_DIM
        assert all(-1.0 <= f <= 1.0 for f in feats)


def test_decode_real_on_non_image_payload_yields_nulls(spark):
    """decoder='real' no longer raises (VERDICT r4 #9): the synthetic text
    payloads aren't image containers, so the header parse nulls the
    dimensions while features (byte histogram) stay real."""
    rows = M.decode_media(_media(spark).limit(3), decoder="real").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["width"] is None and r["height"] is None
        assert len(r["features"]) == M.FEATURE_DIM


def test_resize_spec_bounds(spark):
    out = M.resize_spec(M.decode_media(_media(spark).limit(50)), max_side=64)
    for r in out.collect():
        assert max(r.out_width, r.out_height) <= 64
        assert 0 < r.scale <= 1.0


def test_sample_frames_only_videos(spark):
    dec = M.decode_media(_media(spark).limit(60))
    frames = M.sample_frames(dec, every_nth=5)
    kinds = dec.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == kinds
    assert frames.filter(F.col("frame_idx") % 5 != 0).count() == 0


def test_multimodal_decode_query(spark):
    from .conftest import SF_SMALL

    rows = M.multimodal_decode(spark, SF_SMALL).collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert r.n_features == M.FEATURE_DIM
        assert max(r.out_width, r.out_height) <= 64
        if r.kind == "video":
            assert r.n_kept_frames == (r.n_frames - 1) // 5 + 1
        else:
            assert r.n_kept_frames == 0


# --- real decoders (VERDICT r4 #9) -------------------------------------------


def _png_bytes(width: int, height: int) -> bytes:
    """Hand-assembled VALID single-pixel-per-row PNG (stdlib only)."""
    import struct
    import zlib

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray8
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _gif_bytes(width: int, height: int, n_frames: int) -> bytes:
    """Minimal GIF89a with n_frames image descriptors."""
    hdr = (
        b"GIF89a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + b"\x00\x00\x00"  # no global color table
    )
    frame = (
        b"\x2c" + b"\x00\x00\x00\x00"
        + width.to_bytes(2, "little") + height.to_bytes(2, "little")
        + b"\x00"          # no local color table
        + b"\x02"          # LZW min code size
        + b"\x01\x00"      # one 1-byte data sub-block, then terminator
        + b"\x00"
    )
    return hdr + frame * n_frames + b"\x3b"


def _jpeg_bytes(width: int, height: int) -> bytes:
    """JPEG header walk fixture: SOI + APP0 + SOF0 (enough for the header
    scan; not a full decodable scan body)."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">H", height)
        + struct.pack(">H", width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _media_df(spark, payloads):
    rows = [
        (i, "image", bytearray(p), ("image/x-test", len(p)))
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)


def test_header_decoder_parses_real_containers(spark):
    df = _media_df(
        spark,
        [
            _png_bytes(48, 32),
            _gif_bytes(20, 10, 3),
            _jpeg_bytes(64, 24),
            b"not an image at all",
        ],
    )
    got = {
        r["media_id"]: (r["width"], r["height"], r["n_frames"])
        for r in M.decode_media(df, "headers").collect()
    }
    assert got[0] == (48, 32, 1)
    assert got[1] == (20, 10, 3)
    assert got[2] == (64, 24, 1)
    assert got[3] == (None, None, None)  # unrecognized -> nulls, no crash


def test_header_decoder_features_are_real_histogram(spark):
    payload = _png_bytes(8, 8)
    df = _media_df(spark, [payload])
    feats = M.decode_media(df, "headers").collect()[0]["features"]
    assert len(feats) == M.FEATURE_DIM
    assert abs(sum(feats) - 1.0) < 1e-3  # normalized histogram


def test_real_decoder_no_longer_raises(spark):
    df = _media_df(spark, [_png_bytes(5, 7)])
    row = M.decode_media(df, "real").collect()[0]
    assert (row["width"], row["height"]) == (5, 7)


def test_pil_decoder_roundtrips_real_png(spark):
    pytest.importorskip("PIL")
    df = _media_df(spark, [_png_bytes(31, 17)])
    row = M.decode_media(df, "pil").collect()[0]
    assert (row["width"], row["height"]) == (31, 17)
