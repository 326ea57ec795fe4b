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


def test_decode_real_raises_not_implemented(spark):
    m = _media(spark).limit(1)
    with pytest.raises(Exception) as ei:
        M.decode_media(m, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


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
