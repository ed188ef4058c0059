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


def test_audio_features_pcm16_exact(spark):
    """pcm16 is a REAL decode (dtype view, no codec lib): features must
    equal an independent numpy pass, including clip counting at ±32767 and
    the int64-exact energy."""
    import numpy as np
    import pyspark.sql.functions as F

    from osm_merge_spark.operators.multimodal import audio_features

    rows = []
    want = {}
    for i in range(7):
        n = 1000 + 137 * i
        rng = (np.arange(n, dtype=np.int64) * (2654435761 + i) % 65536) - 32768
        s = rng.astype("<i2")
        rows.append((f"aud-{i}", s.tobytes(), "pcm16"))
        s64 = s.astype(np.int64)
        want[f"aud-{i}"] = (
            n, int((s64 * s64).sum()), int(np.abs(s64).max()),
            int((np.abs(s64) >= 32767).sum()), n // 1024,
        )
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    got = {
        r["audio_id"]: (r["n_samples"], r["energy"], r["peak"],
                        r["n_clipped"], r["n_windows"])
        for r in audio_features(df).collect()
    }
    assert got == want

    # honest env-limit policy: compressed formats raise, not silently skip
    bad = spark.createDataFrame(
        [("x", b"\x00\x01", "mp3")], "audio_id string, bytes binary, fmt string"
    )
    import pytest

    with pytest.raises(Exception, match="NotImplementedError|external library"):
        audio_features(bad).collect()
