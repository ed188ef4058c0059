"""Multimodal payload operators: Arrow-batch decode, invariant
verification, resize, payload re-attachment, stubbed video path."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm_merge_spark.data import images as codec
from osm_merge_spark.data.synth import synth_images
from osm_merge_spark.operators import multimodal


def test_decode_stats(spark):
    df = synth_images(spark, 40, with_bytes=True)
    stats = multimodal.decode_stats(df).collect()
    assert len(stats) == 40
    for r in stats:
        assert r.decode_ok
        assert 0.0 <= r.mean_r <= 255.0


def test_verify_payload_invariant(spark):
    df = synth_images(spark, 60, with_bytes=True)
    res = multimodal.verify_payload(df)
    rows = res.collect()
    assert len(rows) == 60 and all(r.ok for r in rows)
    # lossless rows are exactly inf; lossy rows sit in [40, 50] dB
    lossy = [r.psnr_db for r in rows if r.psnr_db != float("inf")]
    assert lossy and all(40.0 <= p <= 50.0 for p in lossy)


def test_resize_roundtrip(spark):
    df = synth_images(spark, 12, with_bytes=True, w=16, h=16)
    small = multimodal.resize_images(df, 8, 8).collect()
    assert len(small) == 12
    for r in small:
        px = codec.decode(bytes(r.bytes), r.fmt)
        assert px.shape == (8, 8, 3)


def test_attach_payload_joins_bytes_back(spark):
    full = synth_images(spark, 30, with_bytes=True)
    slim = full.select("image_id", "caption")
    out = multimodal.attach_payload(slim, full)
    assert out.columns == ["image_id", "caption", "bytes"]
    assert out.filter(F.col("bytes").isNotNull()).count() == 30


def test_frame_sample_stub_raises(spark):
    df = synth_images(spark, 4, with_bytes=True)
    with pytest.raises(Exception, match="NotImplementedError|video decode"):
        multimodal.frame_sample(df).collect()
