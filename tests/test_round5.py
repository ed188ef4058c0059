"""Round-5 verdict-item pins: ivf_search and pq_adc_topk share the agg
top-k (item #2 — no WindowExec in any default ANN selection)."""

from pyspark.sql import functions as F

from osm_merge_spark.queries import vectors


def test_ivf_search_plan_has_no_window(spark, sf_dir):
    """r4 verdict #2: ivf_search's post-probe selection must be the same
    hash-agg top-k cosine_topk graduated to — no Window node, no SortExec
    feeding one."""
    plan = vectors.q_ivf_search(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "ObjectHashAggregate" in plan


def test_pq_adc_topk_plan_has_no_window(spark, sf_dir):
    plan = vectors.q_ann_pq_topk(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "ObjectHashAggregate" in plan


def test_hist_cumsum_matches_naive_window(spark):
    """Two-level partitioned cumsum == single-partition window, row for
    row, including negative keys and both directions."""
    from pyspark.sql import Window

    from osm_merge_spark.functions.histogram import hist_cumsum

    rows = [(k, (k * 7919) % 13 + 1) for k in range(-5000, 5000, 7)]
    hist = spark.createDataFrame(rows, ["k", "v"])
    for desc in (False, True):
        order = F.col("k").desc() if desc else F.col("k").asc()
        w = Window.orderBy(order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        naive = {r["k"]: r["c"] for r in
                 hist.select("k", F.sum("v").over(w).alias("c")).collect()}
        ours = {r["k"]: r["cum"] for r in
                hist_cumsum(hist, "k", "v", descending=desc).collect()}
        assert ours == naive


def test_no_unpartitioned_window_in_percentile_plans(spark, sf_dir):
    """r4 verdict nit #1: clip_percentile and key_skew must not compile a
    single-partition WindowExec (windowspecdefinition with no partition
    columns)."""
    import re

    from osm_merge_spark.queries.relational import q_key_skew
    from osm_merge_spark.queries.vectors import q_clip_percentile

    pat = re.compile(r"windowspecdefinition\([^(),]*\s(?:ASC|DESC)\sNULLS")
    for q in (q_clip_percentile, q_key_skew):
        plan = q(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        assert not pat.search(plan), q.__name__


def _scan_partition_count(df):
    """numPartitions metric of the executed FileSourceScan (directory
    partitions selected post-pruning) — df must have been executed."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "FileSourceScan" in node.getClass().getName():
            return int(node.metrics().apply("numPartitions").value())
    raise AssertionError("no file scan leaf found")


def test_zlayout_aoi_clip_scans_fewer_buckets_than_layout_has(spark, sf_dir):
    """r4 verdict item #1 'done' criterion: the end-to-end query's scan
    selects strictly fewer directory partitions than the layout holds, and
    its rows match the flat-scan twin exactly."""
    from osm_merge_spark.queries import zlayout
    from osm_merge_spark.queries.geo import q_aoi_clip

    df = zlayout.q_zlayout_aoi_clip(spark, sf_dir)
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, q_aoi_clip(spark, sf_dir).collect()))
    assert got == want and len(got) > 0

    out = zlayout._image_layout(spark, sf_dir)
    n_dirs = len({f.split("/zb=")[1].split("/")[0]
                  for f in spark.read.parquet(out).inputFiles()})
    n_selected = _scan_partition_count(df)
    assert 0 < n_selected < n_dirs


def test_zlayout_delta_is_the_snapshot_diff(spark, sf_dir):
    """The conflated feature set must be exactly the snapshot diff — every
    output feature is odd (new in v2) or %10==0 (version-bumped), with
    v2's version value — and no unchanged feature leaks through."""
    from osm_merge_spark.queries import zlayout

    rows = zlayout.q_zlayout_delta_conflate(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        fid = r["feature_id"]
        assert fid % 2 == 1 or fid % 10 == 0
        base_version = (fid % 3) + 1
        expect = base_version + 1 if fid % 10 == 0 else base_version
        assert r["version"] == expect


def test_zonal_membership_is_joinless_fanout(spark, sf_dir):
    """Zone membership must be ONE scan with a codegen array fan-out —
    no join node before the rollup's single exchange (the sums join is
    the only join in the full query)."""
    from osm_merge_spark.queries.geo5 import ZONES, q_zonal_stats

    plan = q_zonal_stats(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    # exactly one join (membership x sums); membership itself adds none
    assert plan.count("HashJoin") == 1
    # overlap fan-out is real: members exceed any single zone's count
    out = {r["zone_id"]: r["n_images"]
           for r in q_zonal_stats(spark, sf_dir).collect()}
    assert set(out) == set(ZONES)
    assert sum(out.values()) > max(out.values())


def test_pyramid_levels_conserve_mass(spark, sf_dir):
    """Every overview level must aggregate to the same image count and
    channel totals as level 0 (2x2 rollup loses nothing), and parent tile
    counts must shrink or hold level over level."""
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.geo5 import PYR_LEVELS, q_pyramid_pixel_rollup

    agg = q_pyramid_pixel_rollup(spark, sf_dir).groupBy("level").agg(
        F.sum("n_images").alias("n"),
        F.sum("sum_r").alias("r"),
        F.count("*").alias("tiles"),
    ).collect()
    by_level = {r["level"]: r for r in agg}
    assert set(by_level) == set(range(PYR_LEVELS + 1))
    base = by_level[0]
    for lvl in range(1, PYR_LEVELS + 1):
        assert (by_level[lvl]["n"], by_level[lvl]["r"]) == (base["n"], base["r"])
        assert by_level[lvl]["tiles"] <= by_level[lvl - 1]["tiles"]


def test_tile_mosaic_plan_one_hash_agg_no_window(spark, sf_dir):
    """tile_mosaic's selection is a single hash aggregation: no Window, no
    SortExec, no join anywhere — tile assignment is floor arithmetic."""
    from osm_merge_spark.queries.geo6 import q_tile_mosaic

    plan = q_tile_mosaic(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    # min(struct) would silently fall back to SortAggregate (a full
    # re-sort of the scored table); the collect_list formulation must
    # stay an ObjectHashAggregate with no Sort node anywhere
    assert "SortAggregate" not in plan and "Sort " not in plan
    assert "ObjectHashAggregate" in plan


def test_tile_gaps_joins_are_broadcast_only(spark, sf_dir):
    """tile_gaps' grid is geometry-bounded, so every join (anti, neighbor
    probe, final left) must be broadcast — the corpus is touched once by
    the distinct-tile aggregation."""
    from osm_merge_spark.queries.geo6 import q_tile_gaps

    plan = q_tile_gaps(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_tile_gaps_holes_are_really_empty(spark, sf_dir):
    """Every reported gap tile holds zero images, and a sampled covered
    tile is never reported."""
    from osm_merge_spark.queries import base
    from osm_merge_spark.queries.geo6 import GAP_TG, q_tile_gaps

    gaps = {r.tile_id for r in q_tile_gaps(spark, sf_dir).collect()}
    img = base.images_df(spark, sf_dir).select(
        GAP_TG.tile_id(F.col("lon"), F.col("lat")).alias("tile_id")
    )
    covered = {r.tile_id for r in img.distinct().collect()}
    assert not (gaps & covered)


def test_tile_mosaic_winner_has_max_score(spark, sf_dir):
    """The mosaic pick per tile is the max-quality image (tie: min ikey)."""
    from osm_merge_spark.queries import base
    from osm_merge_spark.queries.geo6 import MOSAIC_TG, q_tile_mosaic

    out = {r.tile_id: (r.image_id, r.n_images)
           for r in q_tile_mosaic(spark, sf_dir).collect()}
    img = base.images_df(spark, sf_dir).select(
        MOSAIC_TG.tile_id(F.col("lon"), F.col("lat")).alias("tile_id"),
        "ikey",
        base.u01(F.col("ikey"), 21).alias("q"),
    ).collect()
    import collections
    best: dict = {}
    cnt: collections.Counter = collections.Counter()
    for r in img:
        cnt[r.tile_id] += 1
        k = (-r.q, r.ikey)
        if r.tile_id not in best or k < best[r.tile_id][0]:
            best[r.tile_id] = (k, r.ikey)
    assert len(out) == len(best)
    for t, (_, ik) in best.items():
        assert out[t] == (f"img-{ik}", cnt[t])


def test_hotspot_cells_surface_the_planted_cluster(spark, sf_dir):
    """The fixture plants a ~100 m-wide hot cluster at (HOT_LON, HOT_LAT);
    hotspot_cells must report that cell, and every reported cell must sit
    within one window of it OR hold genuinely >=2x-expectation mass."""
    import math

    from osm_merge_spark.functions import geo
    from osm_merge_spark.queries import base
    from osm_merge_spark.queries.geo6 import (
        HOTSPOT_MIN_EXCESS_E6, HOTSPOT_TILE_M, q_hotspot_cells,
    )

    R = geo.WEB_MERCATOR_R
    hx = math.floor(R * math.radians(base.HOT_LON) / HOTSPOT_TILE_M)
    hy = math.floor(
        R * math.log(math.tan(math.pi / 4 + math.radians(base.HOT_LAT) / 2))
        / HOTSPOT_TILE_M
    )
    rows = q_hotspot_cells(spark, sf_dir).collect()
    assert rows, "hotspot gate fired nowhere — planted cluster missed"
    cells = {(r.tx, r.ty) for r in rows}
    assert (hx, hy) in cells
    for r in rows:
        assert r.excess_e6 >= HOTSPOT_MIN_EXCESS_E6
