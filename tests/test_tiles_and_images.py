"""Tile assignment vs floor-arithmetic oracle; image codec PSNR invariant."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_merge_spark.data import images as codec
from osm_merge_spark.data import synth
from osm_merge_spark.functions.cells import TileGrid
from osm_merge_spark.operators import tiles as tile_ops

R = 6378137.0


def _merc(lon, lat):
    return (R * math.radians(lon),
            R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)))


def test_assign_tiles_matches_floor_oracle(spark):
    tg = TileGrid(10_000.0)
    df = synth.synth_images(spark, 300)
    got = tile_ops.assign_tiles(df, tg).select("image_id", "lon", "lat", "tile_id").collect()
    for r in got:
        mx, my = _merc(r["lon"], r["lat"])
        want = math.floor(my / tg.tile_m) * tg.nx + math.floor(mx / tg.tile_m)
        assert r["tile_id"] == want


def test_generate_tiles_covers_all_images(spark):
    tg = TileGrid(10_000.0)
    tiles = tile_ops.generate_tiles(
        spark, synth.LON_MIN, synth.LAT_MIN, synth.LON_MAX, synth.LAT_MAX, tg)
    imgs = tile_ops.assign_tiles(synth.synth_images(spark, 300), tg)
    # every image's tile is in the generated bbox grid
    missing = imgs.join(tiles, "tile_id", "left_anti").count()
    assert missing == 0
    # AOI clipping drops some tiles but keeps all in-AOI images
    aoi_tiles = tile_ops.generate_tiles(
        spark, synth.LON_MIN, synth.LAT_MIN, synth.LON_MAX, synth.LAT_MAX, tg,
        aoi_ring=(synth.AOI_RING_X, synth.AOI_RING_Y))
    assert aoi_tiles.count() < tiles.count()


def test_png_roundtrip_lossless():
    px = codec.pixels_for_seed(123, 16, 16)
    buf = codec.encode_png(px)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    back = codec.decode_png(buf)
    assert np.array_equal(px, back)
    assert codec.psnr_db(px, back) == float("inf")


def test_qnt_lossy_psnr_above_40():
    for seed in (1, 7, 99):
        px = codec.pixels_for_seed(seed, 16, 16)
        back = codec.decode_qnt(codec.encode_qnt(px))
        p = codec.psnr_db(px, back)
        assert 40.0 <= p < 60.0, p


def test_images_table_payload_invariant(spark):
    """Per-row invariant from BASELINE.json input_hint: decoded pixels vs
    re-synthesized reference pixels — PSNR ≥ 40 dB (∞ for png), caption
    stable under re-synthesis (determinism)."""
    df = synth.synth_images(spark, 60, with_bytes=True)
    rows = df.collect()
    caps1 = {r["image_id"]: r["caption"] for r in rows}
    for r in rows:
        ref = codec.pixels_for_seed(r["i"], r["w"], r["h"])
        got = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert codec.psnr_db(ref, got) >= 40.0
    rows2 = synth.synth_images(spark, 60, with_bytes=False).collect()
    assert {r["image_id"]: r["caption"] for r in rows2} == caps1


def test_unsupported_format_raises():
    with pytest.raises(NotImplementedError):
        codec.encode(codec.pixels_for_seed(1, 4, 4), "jpg")


def test_tile_image_stats_matches_numpy(spark):
    """Per-tile pixel rollup: counts and channel means must equal a local
    decode of the same deterministic corpus; undecodable rows are excluded."""
    import numpy as np

    from osm_merge_spark.data import images as codec, synth
    from osm_merge_spark.functions.cells import TileGrid
    from osm_merge_spark.operators import multimodal as mm
    from osm_merge_spark.operators import tiles as tile_ops

    n = 120
    tg = TileGrid(tile_m=20000.0)
    imgs = synth.synth_images(spark, n, with_bytes=True)
    got = {r["tile_id"]: r for r in mm.tile_image_stats(imgs, tg).collect()}

    local = tile_ops.assign_tiles(
        synth.synth_images(spark, n), tg
    ).select("image_id", "i", "w", "h", "fmt", "tile_id").collect()
    agg = {}
    for r in local:
        px = codec.pixels_for_seed(int(r["i"]), r["w"], r["h"])
        if r["fmt"] == "qnt":  # lossy round trip — decode of encode
            px = codec.decode(codec.encode(px, "qnt"), "qnt")
        m = px.reshape(-1, 3).mean(axis=0)
        agg.setdefault(r["tile_id"], []).append(m)
    assert set(got) == set(agg)
    for tid, ms in agg.items():
        mean = np.mean(ms, axis=0)
        row = got[tid]
        assert row["n_images"] == len(ms)
        assert abs(row["avg_r"] - round(float(mean[0]), 4)) <= 1e-4
        assert abs(row["avg_g"] - round(float(mean[1]), 4)) <= 1e-4
        assert abs(row["avg_b"] - round(float(mean[2]), 4)) <= 1e-4


def test_image_patches_conserve_channel_sums(spark):
    """Σ over an image's patches == the whole-image channel sums, and the
    patch grid is exactly (H/P)×(W/P)."""
    from pyspark.sql import functions as F

    from osm_merge_spark.data import synth
    from osm_merge_spark.queries.geo5 import (
        IP_P, TIS_W, TIS_H, _decode_channel_sums, patchify_sums,
    )

    img = synth.synth_images(spark, 24, with_bytes=True)
    whole = {r["image_id"]: (r["sr"], r["sg"], r["sb"])
             for r in _decode_channel_sums(img).collect()}
    per_img = (
        patchify_sums(img)
        .groupBy("image_id")
        .agg(F.count("*").alias("n"),
             F.sum("pr").alias("sr"), F.sum("pg").alias("sg"),
             F.sum("pb").alias("sb"))
        .collect()
    )
    assert len(per_img) == 24
    expect_n = (TIS_H // IP_P) * (TIS_W // IP_P)
    for r in per_img:
        assert r["n"] == expect_n
        assert (r["sr"], r["sg"], r["sb"]) == whole[r["image_id"]]


def test_tile_luma_hist_matches_numpy_and_conserves_pixels(spark):
    """Per-tile luma histogram: equals a local decode + Rec.601 fixed-point
    binning of the same corpus, and the four bins conserve the pixel count
    (sum == n_images * w * h per tile)."""
    import numpy as np

    from osm_merge_spark.data import images as codec, synth
    from osm_merge_spark.functions.cells import TileGrid
    from osm_merge_spark.operators import tiles as tile_ops
    from osm_merge_spark.queries.geo5 import (
        TIS_N, TIS_TILE_M, q_tile_luma_hist,
    )

    got = {r["tile_id"]: r for r in q_tile_luma_hist(spark, "").collect()}

    tg = TileGrid(tile_m=TIS_TILE_M)
    local = tile_ops.assign_tiles(
        synth.synth_images(spark, TIS_N), tg
    ).select("i", "w", "h", "fmt", "tile_id").collect()
    agg: dict = {}
    for r in local:
        px = codec.pixels_for_seed(int(r["i"]), r["w"], r["h"])
        if r["fmt"] == "qnt":
            px = codec.decode(codec.encode(px, "qnt"), "qnt")
        flat = px.astype(np.int64).reshape(-1, 3)
        luma = (77 * flat[:, 0] + 150 * flat[:, 1] + 29 * flat[:, 2]) >> 8
        h = np.bincount(luma >> 6, minlength=4)
        a = agg.setdefault(r["tile_id"], np.zeros(5, dtype=np.int64))
        a[0] += 1
        a[1:] += h
    assert set(got) == set(agg)
    for tid, a in agg.items():
        row = got[tid]
        assert row["n_images"] == a[0]
        bins = [row["lum_q0"], row["lum_q1"], row["lum_q2"], row["lum_q3"]]
        assert bins == list(a[1:])
        assert sum(bins) == a[0] * 16 * 16
