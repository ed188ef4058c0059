"""hog_hist: per-image gradient-orientation histogram over decoded luma
(queries/geo5.py) — conservation and planted-structure checks."""

from pyspark.sql import functions as F


def test_hog_conservation_and_structure(spark, sf_dir):
    from osm_merge_spark.queries.geo5 import TIS_H, TIS_N, TIS_W, q_hog_hist

    df = q_hog_hist(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == TIS_N
    interior = (TIS_W - 2) * (TIS_H - 2)
    for r in rows:
        total = sum(r[f"o{b}"] for b in range(8)) + r["n_flat"]
        assert total == interior, r
        assert all(r[f"o{b}"] >= 0 for b in range(8))
    # splitmix64 noise has gradients: structure must dominate flatness
    agg = df.agg(
        F.sum(sum(F.col(f"o{b}") for b in range(8))).alias("o"),
        F.sum("n_flat").alias("f"),
    ).collect()[0]
    assert agg["o"] > agg["f"]


def test_hog_matches_direct_numpy(spark, sf_dir):
    # recompute one image's histogram with an independent numpy spelling
    # (shift-based diffs instead of slicing) and compare exactly
    import numpy as np

    from osm_merge_spark.data import images as codec
    from osm_merge_spark.data import synth
    from osm_merge_spark.queries.geo5 import TIS_H, TIS_N, TIS_W, q_hog_hist

    img = synth.synth_images(spark, TIS_N, with_bytes=True)
    row = img.where(F.col("image_id") == "img-7").select(
        "bytes", "fmt").collect()[0]
    px = codec.decode(bytes(row["bytes"]), row["fmt"]).astype(np.int64)
    flat = px.reshape(-1, 3)
    luma = ((77 * flat[:, 0] + 150 * flat[:, 1] + 29 * flat[:, 2]) >> 8
            ).reshape(TIS_H, TIS_W)
    exp = [0] * 8
    n_flat = 0
    for y in range(1, TIS_H - 1):
        for x in range(1, TIS_W - 1):
            dx = int(luma[y, x + 1]) - int(luma[y, x - 1])
            dy = int(luma[y + 1, x]) - int(luma[y - 1, x])
            if dx == 0 and dy == 0:
                n_flat += 1
                continue
            exp[(dx > 0) + 2 * (dy > 0) + 4 * (abs(dx) >= abs(dy))] += 1
    got = q_hog_hist(spark, sf_dir).where(
        F.col("image_id") == "img-7").collect()[0]
    assert [got[f"o{b}"] for b in range(8)] == exp
    assert got["n_flat"] == n_flat


def test_gps_spikes_exact_planted_set(spark, sf_dir):
    # every trace_id % SPIKE_EVERY == 0 yields EXACTLY one spike at
    # SPIKE_IDX; no other (trace, idx) ever fires
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.geo5 import (
        SPIKE_EVERY, SPIKE_IDX, _dwell_trace_df, q_gps_spikes,
    )

    out = q_gps_spikes(spark, sf_dir)
    n_traces = _dwell_trace_df(spark, sf_dir).count()
    expected = {t for t in range(n_traces) if t % SPIKE_EVERY == 0}
    got = {(r.trace_id, r.spike_idx) for r in out.collect()}
    assert got == {(t, SPIKE_IDX) for t in expected}
    assert out.where(F.col("leg_in_mm") <= 1_500_000).count() == 0
