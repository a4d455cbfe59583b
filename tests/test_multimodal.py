"""Multimodal plumbing: schema, batching, deterministic fake features,
frame-sampling row expansion, and the stubbed decode contract."""

import hashlib

import numpy as np
import pytest

from elasticsearch_analysis_hashsplitter_spark.operators.multimodal import (
    decode_image,
    extract_features,
    fake_image_features,
    sample_frames,
    synthetic_media,
)


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_features_deterministic():
    a = fake_image_features(b"payload", dim=8)
    b = fake_image_features(b"payload", dim=8)
    assert np.array_equal(a, b)
    assert a.dtype == np.float32 and a.shape == (8,)
    assert not np.array_equal(a, fake_image_features(b"other", dim=8))


def test_extract_features_pipeline(spark):
    media = synthetic_media(spark, 50)
    feats = extract_features(media, dim=8, target_rows_per_batch=16)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 50
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, r in rows.items():
        assert r.payload_sha256 == hashlib.sha256(payloads[mid]).hexdigest()
        exp = fake_image_features(payloads[mid], dim=8)
        assert np.allclose(r.feature, exp, atol=1e-6)


def test_sample_frames_row_expansion(spark):
    media = synthetic_media(spark, 30)
    frames = sample_frames(media, every_ms=1000)
    got = (
        frames.groupBy("media_id").count().toPandas()
        .set_index("media_id")["count"].to_dict()
    )
    durs = {r.media_id: r.duration_ms for r in media.collect()}
    for mid, dur in durs.items():
        exp = (dur or 0) // 1000
        assert got.get(mid, 0) == exp
