"""Planted-truth tests for way_crossings (queries/geo7.py): proper
crossings found exactly; touches, shared endpoints, parallels, and
near-misses excluded; cell-boundary crossings still caught (ring-1)."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from osm_merge_spark.queries.geo7 import WC_GRID, way_crossings

SCHEMA = T.StructType([
    T.StructField("way_id", T.LongType()),
    T.StructField("xs", T.ArrayType(T.DoubleType())),
    T.StructField("ys", T.ArrayType(T.DoubleType())),
])


def _ways(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_planted_x_crossing_found_with_exact_point(spark):
    # two diagonals of the unit square around (0.5, 0.5)
    ways = _ways(spark, [
        (1, [0.0, 1.0], [0.0, 1.0]),
        (2, [0.0, 1.0], [1.0, 0.0]),
    ])
    out = way_crossings(ways).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.way_a, r.way_b, r.seg_a, r.seg_b) == (1, 2, 1, 1)
    assert (r.ix_e6, r.iy_e6) == (500000, 500000)


def test_touch_shared_endpoint_and_parallel_excluded(spark):
    ways = _ways(spark, [
        (1, [0.0, 1.0], [0.0, 0.0]),
        # T-touch: way 2 STARTS on way 1's interior (d3·d4 = 0) — not proper
        (2, [0.5, 0.5], [0.0, 1.0]),
        # shares endpoint (0,0) with way 1 — not proper
        (3, [0.0, -1.0], [0.0, -1.0]),
        # parallel offset east of way 2's x — never crosses anything
        (4, [0.6, 1.0], [0.5, 0.5]),
    ])
    out = way_crossings(ways).collect()
    assert out == []


def test_near_miss_excluded_and_offset_cross_found(spark):
    ways = _ways(spark, [
        (1, [0.0, 1.0], [0.2, 0.2]),
        (2, [0.3, 0.3], [0.25, 0.21]),   # stops just above way 1 — miss
        (3, [0.7, 0.7], [0.25, 0.15]),   # passes through way 1 — hit
    ])
    out = way_crossings(ways).collect()
    assert [(r.way_a, r.way_b) for r in out] == [(1, 3)]


def test_cell_boundary_crossing_caught_by_ring1(spark):
    # plant the crossing exactly on a grid-cell corner: both sample
    # trains may land in different cells; ring-1 must still pair them
    res = WC_GRID.res_deg
    cx = -180.0 + 1000 * res   # a cell corner in lon
    cy = -90.0 + 700 * res     # …and in lat
    d = res * 0.4
    ways = _ways(spark, [
        (1, [cx - d, cx + d], [cy - d, cy + d]),
        (2, [cx - d, cx + d], [cy + d, cy - d]),
    ])
    out = way_crossings(ways).collect()
    assert len(out) == 1
    assert (out[0].way_a, out[0].way_b) == (1, 2)


def test_multi_segment_ways_report_segment_indices(spark):
    # way 1 zig-zags; way 2 is one long horizontal at y=0.2 crossing all
    # three zig-zag segments (slopes ±2 ≠ 0, so every hit is proper)
    ways = _ways(spark, [
        (1, [0.0, 0.2, 0.4, 0.6], [0.0, 0.4, 0.0, 0.4]),
        (2, [-0.1, 0.7], [0.2, 0.2]),
    ])
    out = sorted(way_crossings(ways).collect(),
                 key=lambda r: (r.seg_a, r.seg_b))
    assert [(r.way_a, r.seg_a, r.way_b, r.seg_b) for r in out] \
        == [(1, 1, 2, 1), (1, 2, 2, 1), (1, 3, 2, 1)]


def test_plan_is_hash_join_no_cartesian(spark, sf_dir):
    from osm_merge_spark.queries.geo7 import q_way_crossings

    plan = q_way_crossings(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_random_segments_match_brute_force(spark):
    """Candidate completeness: on pseudo-random segment sets (spans from a
    fraction of a cell to several cells), the cell-join + ring-1 pipeline
    finds EXACTLY the proper crossings an all-pairs brute force finds."""

    def brute(segs):
        hits = set()
        for i in range(len(segs)):
            for jj in range(i + 1, len(segs)):
                ax, ay, bx, by = segs[i]
                cx, cy, ex, ey = segs[jj]
                d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
                d2 = (bx - ax) * (ey - ay) - (by - ay) * (ex - ax)
                d3 = (ex - cx) * (ay - cy) - (ey - cy) * (ax - cx)
                d4 = (ex - cx) * (by - cy) - (ey - cy) * (bx - cx)
                if d1 * d2 < 0 and d3 * d4 < 0:
                    hits.add((i + 1, jj + 1))
        return hits

    def lcg(seed):
        s = seed
        while True:
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            yield (s >> 11) / float(1 << 53)

    for seed in (7, 99, 12345):
        u = lcg(seed)
        segs = []
        for _ in range(40):
            x0, y0 = next(u) * 0.8, next(u) * 0.8
            # spans 0.002°–0.25° — sub-cell through multi-cell
            dx = (next(u) - 0.5) * 0.5
            dy = (next(u) - 0.5) * 0.5
            segs.append((x0, y0, x0 + dx, y0 + dy))
        ways = _ways(spark, [
            (i + 1, [s[0], s[2]], [s[1], s[3]]) for i, s in enumerate(segs)
        ])
        got = {(r.way_a, r.way_b) for r in way_crossings(ways).collect()}
        assert got == brute(segs), f"seed {seed}"
