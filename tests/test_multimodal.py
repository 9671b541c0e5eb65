"""Multimodal plumbing: feature extraction, resize, frame sampling."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_spark.operators.multimodal import (
    extract_media_features,
    resize_images,
    sample_frames,
    synth_media,
)


def test_media_features_deterministic(spark):
    m = synth_media(spark, 24)
    a = {r.media_id: (r.payload_crc, tuple(r.feature)) for r in extract_media_features(m).collect()}
    b = {r.media_id: (r.payload_crc, tuple(r.feature)) for r in extract_media_features(m).collect()}
    assert a == b and len(a) == 24


def test_resize_images(spark):
    m = synth_media(spark, 24)
    out = resize_images(m, out_w=8, out_h=8)
    rows = out.collect()
    assert len(rows) == 8  # kind == image is every 3rd of 24
    for r in rows:
        assert r.width == 8 and r.height == 8 and len(r.pixels) == 64
        assert all(0.0 <= p <= 1.0 for p in r.pixels)


def test_sample_frames(spark):
    m = synth_media(spark, 24)
    out = sample_frames(m, every_n=4)
    rows = out.collect()
    # videos: every 3rd row (media_id % 3 == 2), n_frames=16, every 4th frame
    assert len(rows) == 8 * 4
    per = out.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)
    assert {r.frame_no for r in rows} == {0, 4, 8, 12}
    # distinct frames hash differently
    one = [r for r in rows if r.media_id == rows[0].media_id]
    assert len({r.frame_crc for r in one}) == 4
