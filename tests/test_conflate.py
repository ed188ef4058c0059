"""Golden tests: the conflation pipeline vs a brute-force O(N·M) NumPy
oracle with reference semantics (the same role the reference's nested loop
plays — conflator.py:134-330), on deterministic synthetic tables.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_merge_spark.data import synth
from osm_merge_spark.functions.fuzzy import indel_ratio_oracle
from osm_merge_spark.operators.conflate import ConflateParams, conflate

N_IMAGES = 400
PARAMS = ConflateParams(threshold_m=7.0, hot_threshold=100, n_salt=4)


def _haversine(lon1, lat1, lon2, lat2):
    R = 6371008.8
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (math.sin((p2 - p1) / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin((math.radians(lon2 - lon1)) / 2) ** 2)
    return 2 * R * math.asin(math.sqrt(a))


def _point_line_dist_m(plon, plat, xs, ys):
    """Planar mercator point→polyline × cos(lat) — engine's line metric."""
    R = 6378137.0

    def mx(lon):
        return R * math.radians(lon)

    def my(lat):
        return R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))

    px, py = mx(plon), my(plat)
    best = float("inf")
    for k in range(len(xs) - 1):
        ax, ay, bx, by = mx(xs[k]), my(ys[k]), mx(xs[k + 1]), my(ys[k + 1])
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        t = 0.0 if seg2 == 0 else max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / seg2))
        best = min(best, math.hypot(px - (ax + t * dx), py - (ay + t * dy)))
    return best * math.cos(math.radians(plat))


def _oracle(images, layer, params: ConflateParams):
    """Brute-force reference-semantics conflation. Returns
    {image_id: (feature_id, hits)} for matches and set of new image_ids."""
    matches, new = {}, set()
    for img in images:
        cands = []
        for f in layer:
            if len(f["xs"]) == 1:
                d = _haversine(img["lon"], img["lat"], f["xs"][0], f["ys"][0])
            else:
                d = _point_line_dist_m(img["lon"], img["lat"], f["xs"], f["ys"])
            if d <= params.threshold_m:
                cands.append((d, f))
        cands.sort(key=lambda t: (t[0], t[1]["feature_id"]))
        cands = cands[: params.candidate_cap]
        scored = []
        for d, f in cands:
            ratio = indel_ratio_oracle(img["caption"], f["caption"])
            name_hit = int(ratio > params.fuzz_min
                           and abs(len(img["caption"]) - len(f["caption"])) <= params.len_diff_max)
            geom_hit = int(d == 0.0)
            scored.append((name_hit + geom_hit, d, f["feature_id"]))
        if scored:
            scored.sort(key=lambda t: (-t[0], t[1], t[2]))
            matches[img["image_id"]] = (scored[0][2], scored[0][0])
        else:
            new.add(img["image_id"])
    return matches, new


@pytest.fixture(scope="module")
def data(spark):
    images = synth.synth_images(spark, N_IMAGES).collect()
    layer = synth.synth_layer(spark, N_IMAGES).collect()
    return ([r.asDict() for r in images], [r.asDict() for r in layer])


def _run_engine(spark, broadcast):
    images = synth.synth_images(spark, N_IMAGES)
    layer = synth.synth_layer(spark, N_IMAGES)
    matched, new = conflate(images, layer, PARAMS, broadcast_layer=broadcast)
    got_m = {r["image_id"]: (r["feature_id"], r["hits"]) for r in matched.collect()}
    got_new = {r["image_id"] for r in new.collect()}
    return got_m, got_new


@pytest.mark.parametrize("broadcast", [True, False], ids=["broadcast", "salted-shuffle"])
def test_conflate_matches_bruteforce_oracle(spark, data, broadcast):
    images, layer = data
    want_m, want_new = _oracle(images, layer, PARAMS)
    got_m, got_new = _run_engine(spark, broadcast)
    assert got_new == want_new
    assert set(got_m) == set(want_m)
    for iid, (fid, hits) in want_m.items():
        assert got_m[iid][0] == fid, f"{iid}: engine {got_m[iid]} vs oracle {(fid, hits)}"
        assert got_m[iid][1] == hits, f"{iid}: hits differ"


def test_planted_classes_behave(spark, data):
    """Generative sanity: planted duplicates match their source feature with
    dist 0; class 6/7-9 images that the oracle calls new are new."""
    images, layer = data
    want_m, want_new = _oracle(images, layer, PARAMS)
    # exact dups (i%10==4, not hot: i%5!=0 → class 4 is never hot? 4%5!=0 ok)
    for img in images:
        i = img["i"]
        if i % 10 == 4 and img["image_id"] in want_m:
            # its own planted feature should win (dist 0 + caption equal)
            assert want_m[img["image_id"]][0] == i + 1


def test_match_and_version_semantics(spark):
    images = synth.synth_images(spark, 100)
    layer = synth.synth_layer(spark, 100)
    matched, new = conflate(images, layer, PARAMS, broadcast_layer=True)
    m = matched.collect()
    assert all(r["version"] >= 2 for r in m)  # bump (conflator.py:945-947)
    tag_keys = {k for r in m for k in r["tags"]}
    assert {"hits", "dist", "ratio"} <= tag_keys  # debug counters (conflator.py:250-253)
    n = new.collect()
    assert all(r["version"] == 1 for r in n)
    assert all(r["tags"]["informal"] == "yes" for r in n)
    # every image lands in exactly one of the two outputs
    assert len(m) + len(n) == 100


def test_suppress_identical_props(spark):
    """U2: a match whose incoming tags are already a subset of the existing
    feature's tags is suppressed (nothing to edit)."""
    from pyspark.sql import functions as F

    from osm_merge_spark.operators.conflate import suppress_identical

    rows = [
        ("a", {"name": "Cedar Lake Road"}, {"name": "Cedar Lake Road", "surface": "dirt"}),
        ("b", {"name": "Pine Creek Trail"}, {"name": "Pine Ck Trail"}),
        ("c", {"name": "Elk Ridge", "ref": "FR 12"}, {"name": "Elk Ridge"}),
    ]
    df = spark.createDataFrame(rows, ["image_id", "p_tags", "s_tags"])
    kept = {r.image_id for r in suppress_identical(df).collect()}
    assert kept == {"b", "c"}  # 'a' adds nothing → suppressed


def test_salted_join_balances_hot_cells(spark):
    """North-rule skew handling: with the hot cluster planted, the salted
    shuffle join must spread each hot cell's pairs over n_salt sub-keys —
    verified by per-partition output counts."""
    from pyspark.sql import functions as F

    from osm_merge_spark.data.synth import synth_images, synth_layer
    from osm_merge_spark.functions.cells import CellGrid
    from osm_merge_spark.operators import cell_join
    from osm_merge_spark.operators.conflate import prepare_images

    n = 4000
    # coarse grid (~100 m cells): the whole hot cluster lands in ONE cell —
    # the genuine single-hot-key scenario salting exists for. Point-only
    # layer → the points fast path, whose output partitioning IS the join
    # exchange (the generic path's pair-dedup would re-shuffle uniformly
    # and mask the layout under test).
    grid = CellGrid.for_radius(100.0, max_abs_lat=70.0)
    p = prepare_images(synth_images(spark, n)).select("image_id", "lon", "lat")
    s = synth_layer(spark, n).filter(F.size("xs") == 1).select(
        "feature_id", "xs", "ys"
    )

    def partition_counts(df):
        return [
            r["count"]
            for r in df.groupBy(F.spark_partition_id().alias("pid")).count().collect()
        ]

    # AQE's coalescing would merge the (tiny) test shuffle into one
    # partition and mask the layout; the skew question is about the raw
    # hash distribution of the join keys.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # ...and force real shuffle joins — static broadcast planning would
    # bypass the exchange whose layout we're asserting on
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        unsalted = cell_join.candidate_pairs(
            p, s, grid, broadcast_secondary=None, secondary_points=True
        )
        salted = cell_join.candidate_pairs(
            p, s, grid, broadcast_secondary=False, n_salt=8, hot_threshold=50,
            secondary_points=True,
        )
        cu = partition_counts(unsalted)
        cs = partition_counts(salted)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert sum(cu) == sum(cs) > 0  # same pair set either way
    # the hot cluster concentrates ~90%+ of all pairs into ~9 ring cells →
    # without salting a couple of shuffle partitions dominate; salting
    # multiplies the hot keys by n_salt and must flatten the layout.
    assert max(cs) / sum(cs) < max(cu) / sum(cu)
    assert max(cs) / sum(cs) < 0.15, (max(cs), sum(cs), cs)


def test_salted_join_same_pairs_as_unsalted(spark):
    """Salting must never change the candidate SET — only its layout."""
    from osm_merge_spark.data.synth import synth_images, synth_layer
    from osm_merge_spark.functions.cells import CellGrid
    from osm_merge_spark.operators import cell_join
    from osm_merge_spark.operators.conflate import prepare_images
    from pyspark.sql import functions as F

    n = 1500
    grid = CellGrid.for_radius(60.0, max_abs_lat=70.0)
    p = prepare_images(synth_images(spark, n)).select("image_id", "lon", "lat")
    s = synth_layer(spark, n).filter(F.size("xs") == 1).select(
        "feature_id", "xs", "ys"
    )
    plain = cell_join.candidate_pairs(
        p, s, grid, broadcast_secondary=True, secondary_points=True
    )
    salted = cell_join.candidate_pairs(
        p, s, grid, broadcast_secondary=False, n_salt=8, hot_threshold=20,
        secondary_points=True,
    )
    a = {(r.image_id, r.feature_id) for r in plain.collect()}
    b = {(r.image_id, r.feature_id) for r in salted.collect()}
    assert a == b and len(a) > 0
