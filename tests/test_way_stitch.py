"""Planted-truth tests for way_stitch (queries/geo7.py): chains assemble
across shared snapped endpoints, gaps split, star nodes fan in, and the
fixture's planted splits/merges appear in the registry query output."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from osm_merge_spark.queries.geo7 import (
    WS_M, q_way_stitch, route_segments, stitch_chains,
)

SCHEMA = T.StructType([
    T.StructField("seg_id", T.LongType()),
    T.StructField("ax", T.DoubleType()),
    T.StructField("ay", T.DoubleType()),
    T.StructField("bx", T.DoubleType()),
    T.StructField("by", T.DoubleType()),
])


def _chains(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = stitch_chains(df).collect()
    assert len(out) == len(rows)  # every segment labeled exactly once
    groups: dict = {}
    for r in out:
        groups.setdefault(r.chain_id, set()).add(r.seg_id)
    return set(frozenset(v) for v in groups.values())


def test_three_segment_chain_stitches(spark):
    rows = [
        (1, 0.0, 0.0, 1.0, 0.0),
        (2, 1.0, 0.0, 2.0, 0.0),
        (3, 2.0, 0.0, 3.0, 1.0),
    ]
    assert _chains(spark, rows) == {frozenset({1, 2, 3})}


def test_gap_splits_and_singleton_survives(spark):
    rows = [
        (1, 0.0, 0.0, 1.0, 0.0),
        (2, 1.0, 0.0, 2.0, 0.0),
        # gap: starts 0.01 deg away (>> the 1e-4 snap lattice)
        (3, 2.01, 0.0, 3.0, 0.0),
        # far-away singleton
        (9, 5.0, 5.0, 6.0, 5.0),
    ]
    assert _chains(spark, rows) == {
        frozenset({1, 2}), frozenset({3}), frozenset({9}),
    }


def test_snap_tolerance_joins_within_lattice_cell(spark):
    # endpoints differing by < 1e-4 deg land in the same snap cell
    rows = [
        (1, 0.0, 0.0, 1.00002, 0.0),
        (2, 1.00003, 0.0, 2.0, 0.0),
    ]
    assert _chains(spark, rows) == {frozenset({1, 2})}


def test_star_node_fans_in(spark):
    # three segments radiating from one node -> one chain (star edges,
    # not a clique, but the component is the same)
    rows = [
        (1, 0.0, 0.0, 1.0, 1.0),
        (2, 0.0, 0.0, -1.0, 1.0),
        (3, 0.0, 0.0, 0.0, -1.0),
    ]
    assert _chains(spark, rows) == {frozenset({1, 2, 3})}


def test_fixture_planted_split_and_merge(spark, sf_dir):
    segs = route_segments(spark, sf_dir)
    lab = {r.seg_id: r.chain_id
           for r in stitch_chains(segs).collect()}

    # s=7: no gap (7 % 3 != 0), no merge -> all 6 segments in one chain
    one = {lab[7 * 8 + j] for j in range(WS_M)}
    assert len(one) == 1

    # s=9: gap at j=3 -> segments 0-2 and 3-5 in different chains
    left = {lab[9 * 8 + j] for j in range(3)}
    right = {lab[9 * 8 + j] for j in range(3, WS_M)}
    assert len(left) == 1 and len(right) == 1 and left != right

    # merge: the smallest s ≡ 0 (mod 5), s > 5 starts at chain (s-5)'s
    # tail -> same component (sf0.001 has suppliers 0-9 only: skip there)
    if any(s >= 10 for s in (k // 8 for k in lab)):
        assert lab[10 * 8] == lab[5 * 8]

    # registry rollup: chain sizes sum to the segment count
    total = q_way_stitch(spark, sf_dir).agg(F.sum("n_segs")).collect()[0][0]
    assert total == segs.count()
