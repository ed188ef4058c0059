"""Deterministic image augmentation (operators/augment.py)."""

from __future__ import annotations

import numpy as np
import pytest

from osm_merge_spark.data import images as codec
from osm_merge_spark.operators import augment


def test_view_identities():
    px = codec.pixels_for_seed(42, 12, 8)  # non-square: catches axis swaps
    assert np.array_equal(augment.apply_view(
        augment.apply_view(px, "hflip"), "hflip"), px)
    assert np.array_equal(augment.apply_view(
        augment.apply_view(px, "vflip"), "vflip"), px)
    r = px
    for _ in range(4):
        r = augment.apply_view(r, "rot90")
    assert np.array_equal(r, px)
    c = augment.apply_view(px, "crop")
    assert c.shape == (4, 6, 3)
    assert np.array_equal(c, px[2:6, 3:9])


def test_augment_images_exact_pixels(spark):
    rows = []
    for i in range(6):
        px = codec.pixels_for_seed(i, 16, 16)
        fmt = "qnt" if i % 3 == 0 else "png"
        rows.append((f"img-{i}", codec.encode(px, fmt), fmt))
    rows.append(("img-bad", b"\xff\xd8", "jpeg"))  # skipped, not failed
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = augment.augment_images(df).collect()

    assert len(out) == 6 * len(augment.DEFAULT_VIEWS)
    assert not any(r["image_id"] == "img-bad" for r in out)
    by_key = {(r["image_id"], r["aug"]): r for r in out}
    for i in range(6):
        fmt = "qnt" if i % 3 == 0 else "png"
        src = codec.decode(
            codec.encode(codec.pixels_for_seed(i, 16, 16), fmt), fmt)
        for aug in augment.DEFAULT_VIEWS:
            r = by_key[(f"img-{i}", aug)]
            got = codec.decode(bytes(r["bytes"]), fmt)
            want = augment.apply_view(src, aug)
            if fmt == "png":
                assert np.array_equal(got, want), (i, aug)
            else:
                # QNT re-encode re-quantizes already-dequantized pixels;
                # bin centers are fixed points, so this is also exact
                assert np.array_equal(got, want), (i, aug)
            assert (r["h"], r["w"]) == want.shape[:2]


def test_augment_plan_is_exchange_free(spark):
    df = spark.createDataFrame(
        [("a", codec.encode(codec.pixels_for_seed(1, 16, 16), "png"), "png")],
        "image_id string, bytes binary, fmt string",
    )
    plan = augment.augment_images(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
