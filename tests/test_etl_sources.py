"""Per-source ETL mappers (F8) — hand-computed conversions plus the
reference repo's own shipped fixtures (tests/data/mvum-test.geojson,
osm.osm) driven end-to-end through the engine's readers, cell join, and
refine, checked against an independent brute-force oracle."""

from __future__ import annotations

import math
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import pytest
from pyspark.sql import functions as F

from osm_merge_spark.operators import etl_sources as es

REF_DATA = "/root/reference/tests/data"


# ---------------------------------------------------------------------------
# hand-computed MVUM conversions (mvum.py:90-224 semantics)
# ---------------------------------------------------------------------------
MVUM_COLS = ("rid string, ID string, NAME string, OPERATIONALMAINTLEVEL string,"
             " PRIMARY_MAINTAINER string, SURFACETYPE string,"
             " SBS_SYMBOL_NAME string, HIGHCLEARANCEVEHICLE string,"
             " SEASONAL string")


def _mvum(spark, rows):
    df = spark.createDataFrame(rows, MVUM_COLS)
    return {r.rid: r.tags_canon for r in es.etl_mvum(df).collect()}


def test_mvum_basic_row(spark):
    got = _mvum(spark, [(
        "a", "502.1a", "BEAR CRK RD", "3 - SUITABLE FOR PASSENGER CARS",
        "FS - FOREST SERVICE", "NAT - NATIVE MATERIAL", None, None,
        "yearlong",
    )])
    # title-case + Crk/Rd expansion, ' Road' already present so no append,
    # ref uppercased, maint level 3 → smoothness=good, NAT → dirt
    assert got["a"] == (
        "highway=unclassified;name=Bear Creek Road;operator=Forest Service;"
        "ref:usfs=FR 502.1A;seasonal=no;smoothness=good;surface=dirt"
    )


def test_mvum_road_append_and_default_operator(spark):
    got = _mvum(spark, [("b", "77", "ELK LK", None, None, None, None,
                         None, None)])
    # no ' Road' in expanded name → appended; missing maintainer →
    # US Forest Service default (mvum.py:169-170)
    assert got["b"] == (
        "highway=unclassified;name=Elk Lake Road;"
        "operator=US Forest Service;ref:usfs=FR 77"
    )


def test_mvum_symbol_overrides_maint_and_ref_fix(spark):
    got = _mvum(spark, [(
        "c", "31522", "PINE MTN", "4 - MODERATE DEGREE OF USER COMFORT",
        None, None, "Paved Road", None, None,
    )])
    # symbol 'Pave' overwrites maint smoothness=bad → good; plain 5-digit
    # ref drops the region prefix + note (mvum.py:196-202)
    assert got["c"] == (
        "highway=unclassified;name=Pine Mountain Road;note=Validate this"
        " changed ref!;operator=US Forest Service;ref:usfs=FR 522;"
        "smoothness=good"
    )


def test_mvum_drop_rows(spark):
    got = _mvum(spark, [
        # degenerate maint value (len <= 1) → dropped (mvum.py:152-153)
        ("d", "1", "X Y", "D", None, None, None, None, None),
        # single-space surface → dropped (mvum.py:179-180)
        ("e", "2", "X Y", None, None, " ", None, None, None),
        # symbol but no ID/ref → dropped (mvum.py:196-197)
        ("f", None, "X Y", None, None, None, "Dirt Road", None, None),
        ("keep", "3", None, None, None, None, None, "Y", None),
    ])
    assert set(got) == {"keep"}
    assert got["keep"] == ("4wd_only=yes;highway=unclassified;"
                           "operator=US Forest Service;ref:usfs=FR 3")


def test_roadcore_smoothness_space_variant(spark):
    df = spark.createDataFrame(
        [("a", "88", "OTTER CG", "2 - HIGH CLEARANCE", "IMP")],
        "rid string, ID string, NAME string, OPER_MAINT string,"
        " SURFACE_TY string",
    )
    got = {r.rid: r.tags_canon for r in es.etl_roadcore(df).collect()}
    # 'very bad' WITH space (roadcore.py:104) — as in the shipped
    # mvum-test.geojson fixture; IMP → compacted (gravel overwritten)
    assert got["a"] == ("name=Otter Campground Road;ref:usfs=FR 88;"
                        "smoothness=very bad;surface=compacted")


# ---------------------------------------------------------------------------
# reference fixture: converted-output vocabulary parity
# ---------------------------------------------------------------------------
def test_mvum_fixture_matches_mapper_vocabulary(spark):
    """The shipped mvum-test.geojson IS the output of the reference's
    converter chain. Every property key and every enum value in it must be
    producible by our mappers (proves the mapper's output space covers the
    reference's real output)."""
    with open(f"{REF_DATA}/mvum-test.geojson") as f:
        fc = json.load(f)
    our_keys = set(es.roadcore_entries(
        F.lit("x"), F.lit("x"), F.lit("1"), F.lit("NAT")).keys())
    our_keys |= {"operator"}  # mvum adds operator; roadcore does not
    smoothness_vals = {v for _, (k, v) in es.ROADCORE_MAINT.items()
                       if k == "smoothness"}
    for feat in fc["features"]:
        props = feat["properties"]
        assert set(props) <= our_keys | {"highway"}
        if "smoothness" in props:
            assert props["smoothness"] in smoothness_vals
        if "ref:usfs" in props:
            assert props["ref:usfs"].startswith("FR ")
        if "surface" in props:
            assert props["surface"] in {"dirt", "gravel", "compacted",
                                        "paved"}


# ---------------------------------------------------------------------------
# reference fixtures end-to-end: mvum-test.geojson × osm.osm through the
# engine (GeoJSON reader → OSM XML reader → way deref → cell join → exact
# refine) vs an independent brute-force oracle
# ---------------------------------------------------------------------------
THRESH_M = 100.0
R = 6378137.0


def _merc(lon, lat):
    return (R * math.radians(lon),
            R * math.log(math.tan(math.pi / 4.0 + math.radians(lat) / 2.0)))


def _haversine(lon1, lat1, lon2, lat2):
    la1, la2 = math.radians(lat1), math.radians(lat2)
    dla, dlo = la2 - la1, math.radians(lon2) - math.radians(lon1)
    a = (math.sin(dla / 2.0) ** 2
         + math.cos(la1) * math.cos(la2) * math.sin(dlo / 2.0) ** 2)
    return 2.0 * 6371008.8 * math.asin(math.sqrt(a))


def _brute_min_dists(mvum_feats, ways):
    """For each (mvum feature, way): min over mvum vertices of the
    mercator point→way-polyline distance × cos(lat) — the engine's exact
    refine math, O(N·M) like the reference's conflator (numpy-vectorized
    over the vertex×segment plane so the oracle runs in seconds)."""
    import numpy as np

    wsegs = {}
    for wid, wcoords in ways.items():
        m = np.array([_merc(x, y) for x, y in wcoords])
        if len(m) >= 2:
            wsegs[wid] = (m[:-1], m[1:])
        else:
            wsegs[wid] = (m, m)  # degenerate; haversine path below
    out = {}
    for pid, coords in mvum_feats.items():
        P = np.array([_merc(x, y) for x, y in coords])          # (V, 2)
        scale = np.cos(np.radians(np.array([c[1] for c in coords])))
        for wid, (a, b) in wsegs.items():
            if len(ways[wid]) == 1:
                wx, wy = ways[wid][0]
                best = min(
                    _haversine(lon, lat, wx, wy) for lon, lat in coords
                )
            else:
                ab = b - a                                       # (S, 2)
                seg2 = (ab * ab).sum(1)                          # (S,)
                ap = P[:, None, :] - a[None, :, :]               # (V, S, 2)
                t_raw = (ap * ab[None]).sum(2) / np.where(seg2 == 0.0, 1.0,
                                                          seg2)[None]
                t = np.where(seg2[None] == 0.0, 0.0,
                             np.clip(t_raw, 0.0, 1.0))
                c = a[None] + t[..., None] * ab[None]            # (V, S, 2)
                d = np.sqrt(((P[:, None, :] - c) ** 2).sum(2))   # (V, S)
                best = float((d.min(1) * scale).min())
            if best <= THRESH_M:
                out[(pid, wid)] = best
    return out


@pytest.fixture(scope="module")
def fixture_inputs(spark):
    from osm_merge_spark.sources.geojson import read_feature_collection
    from osm_merge_spark.sources.osm_xml import (deref_ways, read_nodes,
                                                 read_ways)

    feats = read_feature_collection(
        spark, f"{REF_DATA}/mvum-test.geojson"
    ).withColumn("pid", F.col("tags")["ref:usfs"]).cache()
    ways = deref_ways(
        read_ways(spark, f"{REF_DATA}/osm.osm"),
        read_nodes(spark, f"{REF_DATA}/osm.osm"),
    ).cache()
    return feats, ways


def test_fixture_engine_vs_bruteforce(spark, fixture_inputs):
    from osm_merge_spark.functions.cells import CellGrid
    from osm_merge_spark.operators import cell_join
    from osm_merge_spark.operators.conflate import refine_distance

    feats, ways = fixture_inputs
    pts = feats.select(
        "pid", F.posexplode(F.arrays_zip("xs", "ys")).alias("pos", "pt")
    ).select(
        F.concat("pid", F.lit("#"), F.col("pos")).alias("image_id"),
        "pid",
        F.col("pt.xs").alias("lon"), F.col("pt.ys").alias("lat"),
    )
    grid = CellGrid.for_radius(THRESH_M * 1.05, max_abs_lat=70.0)
    pairs = cell_join.candidate_pairs(
        pts, ways.withColumnRenamed("way_id", "feature_id"), grid,
        p_key="image_id", s_key="feature_id",
    )
    refined = refine_distance(pairs).filter(
        F.col("dist_m") <= F.lit(THRESH_M)
    )
    got = {
        (r.pid, r.feature_id): r.d
        for r in refined.groupBy("pid", "feature_id")
        .agg(F.min("dist_m").alias("d")).collect()
    }

    # independent brute force on raw files
    with open(f"{REF_DATA}/mvum-test.geojson") as f:
        fc = json.load(f)
    # pid = ref:usfs, which repeats (two FR 503 segments) — concatenate
    # coords per ref, matching the engine's groupBy(pid) min
    mvum_feats: dict[str, list] = {}
    for feat in fc["features"]:
        mvum_feats.setdefault(
            feat["properties"]["ref:usfs"], []
        ).extend(feat["geometry"]["coordinates"])
    root = ET.parse(f"{REF_DATA}/osm.osm").getroot()
    nodes = {
        n.get("id"): (float(n.get("lon")), float(n.get("lat")))
        for n in root.iter("node")
    }
    ways_raw = {}
    for w in root.iter("way"):
        refs = [nd.get("ref") for nd in w.iter("nd")]
        coords = [nodes[r] for r in refs if r in nodes]
        if coords:
            ways_raw[int(w.get("id"))] = coords
    want = _brute_min_dists(mvum_feats, ways_raw)

    assert set(got) == set(want)
    assert len(got) > 0
    for k, d in want.items():
        # abs tolerance: numpy vs JVM trig differ in the last ulp, which
        # catastrophic cancellation amplifies for near-zero distances
        # (observed 5.092121e-4 vs 5.092114e-4 METERS on one pair)
        assert got[k] == pytest.approx(d, rel=1e-6, abs=1e-6), k


def test_fixture_nearest_way_name_agreement(spark, fixture_inputs):
    """Best-way selection over the real fixtures: for each MVUM road the
    nearest OSM way within threshold, plus the fuzzy name gate — end to end
    through the engine's ranking + Arrow LCS kernel."""
    from osm_merge_spark.functions import fuzzy
    from osm_merge_spark.functions.cells import CellGrid
    from osm_merge_spark.operators import cell_join, knn
    from osm_merge_spark.operators.conflate import refine_distance

    feats, ways = fixture_inputs
    pts = feats.select(
        "pid", F.col("tags")["name"].alias("p_name"),
        F.posexplode(F.arrays_zip("xs", "ys")).alias("pos", "pt"),
    ).select(
        "pid", "p_name",
        F.col("pt.xs").alias("lon"), F.col("pt.ys").alias("lat"),
    )
    grid = CellGrid.for_radius(THRESH_M * 1.05, max_abs_lat=70.0)
    pairs = cell_join.candidate_pairs(
        pts.withColumn("image_id", F.col("pid")).drop("pid"),
        ways.withColumnRenamed("way_id", "feature_id"), grid,
        p_key="image_id", s_key="feature_id", dedup_pairs=False,
    )
    refined = refine_distance(pairs).filter(
        F.col("dist_m") <= F.lit(THRESH_M)
    )
    per_pair = refined.groupBy("image_id", "feature_id").agg(
        F.min("dist_m").alias("dist_m"),
        F.first("p_name").alias("p_name"),
        F.first(F.col("tags")["name"]).alias("s_name"),
    )
    best = knn.top_k_agg(
        per_pair.withColumn("ratio", F.coalesce(
            fuzzy.ratio_indel(F.col("p_name"), F.col("s_name")), F.lit(0.0)
        )),
        "image_id", "dist_m", "feature_id", 1,
        const_cols=["p_name"], payload_cols=["ratio", "s_name"],
    ).collect()
    assert len(best) > 0
    for r in best:
        # the fixture pair (mvum-test, osm.osm) covers the same roads: the
        # nearest way either has no name or a fuzzy-comparable one
        if r.s_name is not None and r.ratio > 85.0:
            from osm_merge_spark.functions.fuzzy import indel_ratio_oracle
            assert indel_ratio_oracle(r.p_name, r.s_name) == pytest.approx(
                r.ratio)
