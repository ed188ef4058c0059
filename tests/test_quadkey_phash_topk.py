"""Brute-force checks for quadkey encoding and phash hamming top-k."""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm_merge_spark.functions import geo
from osm_merge_spark.queries import base, geo3, text2


def _brute_quadkey(lon, lat, z=geo3.QK_ZOOM):
    r = geo.WEB_MERCATOR_R
    world = 2.0 * math.pi * r
    mx = r * math.radians(lon)
    my = r * math.log(math.tan(math.pi / 4.0 + math.radians(lat) / 2.0))
    n = 1 << z
    xt = min(max(int(math.floor((mx + world / 2) / world * n)), 0), n - 1)
    yt = min(max(int(math.floor((world / 2 - my) / world * n)), 0), n - 1)
    return "".join(
        str(((xt >> i) & 1) + 2 * ((yt >> i) & 1))
        for i in range(z - 1, -1, -1)
    )


def test_quadkey_matches_brute_force(spark, sf_dir):
    rows = (
        base.images_df(spark, sf_dir)
        .select("lon", "lat", geo3.quadkey(F.col("lon"), F.col("lat")).alias("qk"))
        .limit(500)
        .collect()
    )
    assert len(rows) == 500
    for r in rows:
        assert r["qk"] == _brute_quadkey(r["lon"], r["lat"])
        assert len(r["qk"]) == geo3.QK_ZOOM
        assert set(r["qk"]) <= set("0123")


def test_quadkey_prefix_is_parent_tile(spark, sf_dir):
    # the z-prefix property the operator exposes: encoding at zoom 10
    # directly equals the first 10 chars of the zoom-13 key
    img = base.images_df(spark, sf_dir).limit(200)
    chk = img.select(
        geo3.quadkey(F.col("lon"), F.col("lat"), geo3.QK_ZOOM).alias("qk13"),
        geo3.quadkey(F.col("lon"), F.col("lat"), geo3.QK_PARENT).alias("qk10"),
    ).collect()
    # exact because multiplying by a power of two is IEEE-exact:
    # floor(fx*2^10) == floor(fx*2^13) >> 3 always
    assert all(r["qk13"][: geo3.QK_PARENT] == r["qk10"] for r in chk)


def test_quadkey_stats_counts_conserved(spark, sf_dir):
    out = geo3.q_quadkey_stats(spark, sf_dir)
    total = out.agg(F.sum("n_images")).collect()[0][0]
    assert total == base.images_df(spark, sf_dir).count()


def test_phash_topk_matches_brute_force(spark, sf_dir):
    from osm_merge_spark.queries.text import _derived_phash_col

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", _derived_phash_col().alias("phash"))
        .collect()
    )
    ph = {r["doc_id"]: r["phash"] for r in docs}
    expect = {}
    for qid in ph:
        if qid % text2.PHASH_PROBE_MOD != 0:
            continue
        cands = sorted(
            (bin((ph[qid] ^ ph[c]) & ((1 << 64) - 1)).count("1"), c)
            for c in ph if c != qid
        )[: text2.PHASH_TOPK]
        expect[qid] = [(c, h) for h, c in cands]

    got = {}
    for r in text2.q_phash_topk(spark, sf_dir).collect():
        got.setdefault(r["qid"], []).append((r["cand_id"], r["hamming"]))
    assert got == expect
