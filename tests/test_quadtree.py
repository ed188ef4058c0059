"""Planted-truth tests for quadtree_split (queries/geo7.py)."""

from pyspark.sql import functions as F

from osm_merge_spark.queries.geo7 import quadtree_split


def _pts(spark, coords):
    return spark.createDataFrame(coords, ["lon", "lat"])


def test_dense_clump_splits_sparse_cell_does_not(spark):
    # 9 near-identical points (one finest cell) + 1 lone point far away:
    # the clump's chain must split to the finest level, the lone point's
    # root cell stays a level-0 leaf.
    clump = [(-108.30 + i * 1e-6, 43.50) for i in range(9)]
    lone = [(-109.10, 43.90)]
    out = quadtree_split(
        _pts(spark, clump + lone), base_m=25_600.0, depth=2, budget=4
    ).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r.level, []).append(r)
    # lone point: a level-0 leaf with exactly 1 image
    assert any(r.n_images == 1 for r in by_level.get(0, []))
    # clump: count > budget at every coarser level, so it lands at depth
    deepest = [r for r in by_level.get(2, [])]
    assert sum(r.n_images for r in deepest) == 9
    # conservation: every input point in exactly one leaf
    assert sum(r.n_images for r in out) == 10


def test_budget_respected_above_finest_level(spark):
    # leaves at levels < depth must hold ≤ budget points; the finest level
    # may exceed it (depth bound wins)
    clump = [(-108.30 + i * 1e-6, 43.50) for i in range(9)]
    out = quadtree_split(
        _pts(spark, clump), base_m=25_600.0, depth=2, budget=4
    ).collect()
    for r in out:
        if r.level < 2:
            assert r.n_images <= 4


def test_leaves_tile_disjointly(spark):
    # no leaf is an ancestor of another leaf: for every pair at levels
    # l1 < l2, the shallower cell is NOT the deeper cell's ancestor
    coords = [(-108.30 + i * 7e-4, 43.50 + (i % 5) * 4e-4) for i in range(40)]
    out = quadtree_split(
        _pts(spark, coords), base_m=25_600.0, depth=3, budget=6
    ).collect()
    cells = [(r.level, r.qx, r.qy) for r in out]
    assert len(cells) == len(set(cells))
    for l1, x1, y1 in cells:
        for l2, x2, y2 in cells:
            if l1 < l2:
                shift = 2 ** (l2 - l1)
                # python // floors toward -inf — matches the engine
                anc = (x2 // shift, y2 // shift)
                assert not (anc == (x1, y1)), (
                    f"leaf {(l1, x1, y1)} is an ancestor of {(l2, x2, y2)}"
                )
    assert sum(r.n_images for r in out) == 40


def test_tile_freshness_planted(spark, sf_dir):
    # conservation: Σ n_images over tiles == corpus size; n_stale ≤ n_images;
    # latest_epoch_day falls inside the testdata order-date range
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.geo6 import q_tile_freshness

    out = q_tile_freshness(spark, sf_dir)
    agg = out.agg(
        F.sum("n_images").alias("n"),
        F.max(F.col("n_stale") > F.col("n_images")).alias("bad"),
        F.min("latest_epoch_day").alias("lo"),
        F.max("latest_epoch_day").alias("hi"),
    ).collect()[0]
    from osm_merge_spark.queries import base

    n_img = base.images_df(spark, sf_dir).count()
    assert agg["n"] == n_img
    assert not agg["bad"]
    # testdata orders span 1995-01-01 (9131 epoch days) .. 2001-08-01 (11535)
    assert 9131 <= agg["lo"] <= agg["hi"] <= 11535


def test_tile_change_conservation_and_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    from osm_merge_spark.queries import base
    from osm_merge_spark.queries.geo6 import q_tile_change

    out = q_tile_change(spark, sf_dir)
    agg = out.agg(
        (F.sum("n_early") + F.sum("n_late")).alias("n"),
        F.min("shift_e6").alias("lo"),
        F.max("shift_e6").alias("hi"),
    ).collect()[0]
    assert agg["n"] == base.images_df(spark, sf_dir).count()
    assert 0 <= agg["lo"] <= agg["hi"] <= 1_000_000
    # grew must agree with the counts it summarizes
    assert out.where(
        (F.col("grew") != (F.col("n_late") > F.col("n_early")))
    ).count() == 0


def test_frame_dedup_planted_semantics(spark, sf_dir):
    # first frame of every sequence is always kept (no prev); dropped frames
    # are exactly those with hamming_prev <= FRAME_MAX_HAMMING; total rows ==
    # corpus size (one decision per frame)
    from pyspark.sql import functions as F

    from osm_merge_spark.queries import base
    from osm_merge_spark.queries.geo6 import FRAME_MAX_HAMMING, q_frame_dedup

    out = q_frame_dedup(spark, sf_dir)
    n_img = base.images_df(spark, sf_dir).count()
    assert out.count() == n_img
    assert out.where(F.col("hamming_prev").isNull()
                     & ~F.col("keep")).count() == 0
    bad = out.where(
        F.col("hamming_prev").isNotNull()
        & (F.col("keep") == (F.col("hamming_prev") <= FRAME_MAX_HAMMING))
    ).count()
    assert bad == 0
    # the synthetic captions plant real redundancy: some frames must drop,
    # but never all of a sequence (its first frame survives)
    n_seq = out.select("src_part").distinct().count()
    n_kept = out.where("keep").count()
    assert n_seq <= n_kept < n_img


def test_cell_kanon_gate_consistency(spark, sf_dir):
    from pyspark.sql import functions as F

    from osm_merge_spark.queries import base
    from osm_merge_spark.queries.geo6 import KANON_K, q_cell_kanon

    out = q_cell_kanon(spark, sf_dir)
    assert out.agg(F.sum("n_images")).collect()[0][0] == \
        base.images_df(spark, sf_dir).count()
    assert out.where(F.col("n_seqs") > F.col("n_images")).count() == 0
    assert out.where(
        F.col("publish") != (F.col("n_seqs") >= F.lit(KANON_K))
    ).count() == 0


def test_tile_priority_decay_bounds(spark, sf_dir):
    # weight per image ∈ [1e6 >> 62, 1e6]: priority ≤ n_images·1e6 and > 0;
    # and a fresher synthetic pivot strictly increases no cell's priority
    # above the cap
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.geo6 import q_tile_priority

    out = q_tile_priority(spark, sf_dir)
    assert out.where(F.col("priority") <= 0).count() == 0
    assert out.where(
        F.col("priority") > F.col("n_images") * F.lit(1_000_000)
    ).count() == 0
    # decay actually bites: with ages spanning >1 half-life, some cell must
    # score strictly below the no-decay cap
    assert out.where(
        F.col("priority") < F.col("n_images") * F.lit(1_000_000)
    ).count() > 0


def test_curate_assemble_composes_exactly(spark, sf_dir):
    # the capstone must equal the composition of its three parts computed
    # independently: kept frames ⋈ publishable cells, priority ≤ the
    # unfiltered tile_priority of the same cell
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.geo6 import (
        KANON_TILE_M, PRIO_TILE_M, q_cell_kanon, q_curate_assemble,
        q_frame_dedup, q_tile_priority,
    )

    assert KANON_TILE_M == PRIO_TILE_M  # the composition shares one raster
    cur = q_curate_assemble(spark, sf_dir)
    kanon = q_cell_kanon(spark, sf_dir)
    prio = q_tile_priority(spark, sf_dir)
    # every curated cell is publishable
    bad = cur.join(
        kanon.where("publish").select("tx", "ty"), ["tx", "ty"], "left_anti"
    ).count()
    assert bad == 0
    # curated counts ≤ cell image counts; curated priority ≤ cell priority
    j = cur.join(kanon.select("tx", "ty", "n_images"), ["tx", "ty"]).join(
        prio.select("tx", "ty", F.col("priority").alias("p_all")),
        ["tx", "ty"],
    )
    assert j.where(F.col("n_curated") > F.col("n_images")).count() == 0
    assert j.where(F.col("priority") > F.col("p_all")).count() == 0
    # global conservation: Σ curated == kept frames inside publishable cells
    n_kept_total = q_frame_dedup(spark, sf_dir).where("keep").count()
    n_curated = cur.agg(F.sum("n_curated")).collect()[0][0]
    assert 0 < n_curated <= n_kept_total


def test_grid_orientation_planted(spark, sf_dir):
    # conservation (Σ class counts == n_segs per cell); planted geometry:
    # way class 2 is exactly horizontal (dy=0 → fold keeps dx>0 → cls 3),
    # class 3 ways are horizontal too (s_y const) — the fixture has NO
    # vertical-dominant segments in classes 2/3, so shallow classes must
    # dominate overall
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.geo6 import q_grid_orientation

    out = q_grid_orientation(spark, sf_dir)
    bad = out.where(
        F.col("o0") + F.col("o1") + F.col("o2") + F.col("o3")
        != F.col("n_segs")
    ).count()
    assert bad == 0
    agg = out.agg(
        F.sum("o0").alias("a"), F.sum("o1").alias("b"),
        F.sum("o2").alias("c"), F.sum("o3").alias("d"),
    ).collect()[0]
    shallow = agg["c"] + agg["d"]
    steep = agg["a"] + agg["b"]
    assert shallow > steep
    # horizontal fold convention: dy=0 segments land in cls 3 (dx>0 after
    # fold), never cls 2 — check via a hand-built way
    from osm_merge_spark.queries.geo6 import GRID_TILE_M  # noqa: F401


def test_grid_orientation_all_classes(spark):
    # hand-built ways hit every class: vertical up (fold keeps, dx=0 →
    # cls 0), steep NE (cls 1), shallow W-leaning after fold (cls 2),
    # horizontal (fold → dx>0, cls 3)
    from osm_merge_spark.queries.geo6 import seg_orientation_cells

    rows = [
        (1, [10.0, 10.0], [45.0, 45.1]),          # vertical      → o0
        (2, [10.0, 10.01], [45.0, 45.1]),         # steep, dx>0   → o1
        (3, [10.0, 9.9], [45.0, 45.01]),          # shallow, dx<0 after
                                                  # fold dy>0 keeps dx<0 → o2
        (4, [10.0, 10.1], [45.0, 45.0]),          # horizontal    → o3
    ]
    ways = spark.createDataFrame(rows, ["way_id", "xs", "ys"])
    out = seg_orientation_cells(ways).collect()
    tot = {f"o{b}": sum(r[f"o{b}"] for r in out) for b in range(4)}
    assert tot == {"o0": 1, "o1": 1, "o2": 1, "o3": 1}


def test_road_density_conserves_length(spark, sf_dir):
    # Σ cell lengths == Σ way lengths (mm-floored per segment, so compare
    # against the same per-segment flooring, not way_length's rounded sum)
    from pyspark.sql import functions as F

    from osm_merge_spark.queries import base
    from osm_merge_spark.queries.geo6 import q_road_density
    from osm_merge_spark.functions import geo

    out = q_road_density(spark, sf_dir)
    got = out.agg(F.sum("len_mm").alias("s"),
                  F.sum("n_segs").alias("n")).collect()[0]
    ways = base.ways_df(spark, sf_dir)
    seg = ways.select(
        F.explode(F.sequence(F.lit(2), F.size("xs"))).alias("i"), "xs", "ys"
    ).select(
        F.floor(geo.haversine_m(
            F.element_at("xs", F.col("i") - 1),
            F.element_at("ys", F.col("i") - 1),
            F.element_at("xs", F.col("i")),
            F.element_at("ys", F.col("i")),
        ) * F.lit(1000.0)).cast("long").alias("mm")
    )
    exp = seg.agg(F.sum("mm").alias("s"), F.count("*").alias("n")).collect()[0]
    assert got["s"] == exp["s"] and got["n"] == exp["n"]
    assert got["s"] > 0


def test_spatial_folds_planted_leak(spark):
    # two points 4 m apart straddling a 20 km block boundary in x must
    # report exactly one cross-fold pair; two points 4 m apart INSIDE one
    # block report nothing
    import math
    import unittest.mock as mock

    import osm_merge_spark.queries.geo6 as g6
    from osm_merge_spark.functions.geo import WEB_MERCATOR_R
    from osm_merge_spark.queries.geo6 import FOLD_BLOCK_M, q_spatial_folds

    # lon where mercator x crosses block 1 → 2 (at 2×20 km)
    lon_b = math.degrees(2 * FOLD_BLOCK_M / WEB_MERCATOR_R)
    d = math.degrees(2.0 / (WEB_MERCATOR_R * math.pi / 180.0) / 1.0)  # ~2 m
    d = 2.0 / 111_320.0  # 2 m in degrees of longitude at the equator
    rows = [
        (1, lon_b - d, 0.0),       # block 1 side
        (2, lon_b + d, 0.0),       # block 2 side — leak pair with 1
        (3, lon_b + 0.05, 0.0),    # deep inside block 2
        (4, lon_b + 0.05 + d, 0.0),  # near 3, same fold — not a leak
    ]
    img = spark.createDataFrame(rows, ["ikey", "lon", "lat"])
    with mock.patch.object(g6.base, "images_df", lambda s, sf: img):
        out = q_spatial_folds(spark, "ignored").collect()
    assert len(out) == 1
    assert out[0].n_leak == 1
