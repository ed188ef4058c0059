"""Planted-truth tests for khop_reach (queries/graph.py)."""

from pyspark.sql import functions as F

from osm_merge_spark.queries.graph import khop_reach


def _g(spark, edges, seeds):
    e = spark.createDataFrame(edges, ["src", "dst"])
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    s = spark.createDataFrame([(x,) for x in seeds], ["node_id"])
    return und.distinct(), s


def test_path_graph_min_hop_distances(spark):
    # 1-2-3-4-5-6 path, seed at 1, k=3 → nodes 5,6 unreachable within k
    edges, seeds = _g(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], [1])
    out = {r.node_id: r.dist for r in khop_reach(edges, seeds, k=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_cycle_takes_shorter_arm(spark):
    # 6-cycle, seed at 0: the far node is 3 hops via either arm
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    edges, seeds = _g(spark, cyc, [0])
    out = {r.node_id: r.dist for r in khop_reach(edges, seeds, k=3).collect()}
    assert out == {0: 0, 1: 1, 5: 1, 2: 2, 4: 2, 3: 3}


def test_multi_seed_takes_nearest(spark):
    # two seeds; node 3 is 1 hop from seed 4, not 3 hops from seed 0
    edges, seeds = _g(spark, [(0, 1), (1, 2), (2, 3), (3, 4)], [0, 4])
    out = {r.node_id: r.dist for r in khop_reach(edges, seeds, k=2).collect()}
    assert out == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_single_lazy_plan_no_actions(spark):
    # the traversal must stay one lazy plan: building it triggers no jobs
    edges, seeds = _g(spark, [(1, 2), (2, 3)], [1])
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = khop_reach(edges, seeds, k=3)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert before == after
    assert df.count() == 3


def test_graph_clustering_planted_triangle_and_square(spark):
    """K3 ∪ C4 through the REAL operator: triangle nodes count 1 triangle,
    square nodes 0, every node degree 2."""
    from osm_merge_spark.queries.graph import clustering_counts

    tri = [(1, 2), (2, 3), (1, 3)]
    sq = [(10, 11), (11, 12), (12, 13), (13, 10)]
    edges, _ = _g(spark, tri + sq, [1])
    out = {r.node_id: (r.degree, r.n_tri)
           for r in clustering_counts(edges).collect()}
    assert out == {
        1: (2, 1), 2: (2, 1), 3: (2, 1),
        10: (2, 0), 11: (2, 0), 12: (2, 0), 13: (2, 0),
    }


def _wg(spark, edges, seeds):
    """Directed weighted edges as given (no symmetrization)."""
    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    s = spark.createDataFrame([(x,) for x in seeds], ["node_id"])
    return e, s


def test_sssp_cheap_long_path_beats_expensive_edge(spark):
    # 1→3 direct costs 10; 1→2→3 costs 2 — Bellman-Ford must take the
    # 2-edge walk even though BFS hop count prefers the direct edge
    from osm_merge_spark.queries.graph import sssp_bounded

    edges, seeds = _wg(spark, [(1, 3, 10), (1, 2, 1), (2, 3, 1)], [1])
    out = {r.node_id: r.dist for r in sssp_bounded(edges, seeds, k=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2}


def test_sssp_hop_bound_cuts_cheaper_but_longer_walk(spark):
    # within k=2 the 5-cost 2-edge walk wins; the 3-cost walk needs 3 edges
    from osm_merge_spark.queries.graph import sssp_bounded

    edges, seeds = _wg(
        spark,
        [(1, 2, 4), (2, 5, 1), (1, 3, 1), (3, 4, 1), (4, 5, 1)],
        [1],
    )
    k2 = {r.node_id: r.dist for r in sssp_bounded(edges, seeds, k=2).collect()}
    assert k2[5] == 5
    k3 = {r.node_id: r.dist for r in sssp_bounded(edges, seeds, k=3).collect()}
    assert k3[5] == 3


def test_sssp_multi_seed_min_and_lazy_plan(spark):
    from osm_merge_spark.queries.graph import sssp_bounded

    edges, seeds = _wg(spark, [(0, 1, 7), (9, 1, 2)], [0, 9])
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = sssp_bounded(edges, seeds, k=2)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert before == after
    out = {r.node_id: r.dist for r in df.collect()}
    assert out == {0: 0, 9: 0, 1: 2}


def test_isochrone_cells_conservation(spark, sf_dir):
    # every reachable node lands in exactly one tile; min_cost per tile is
    # ≤ the cost of any node in it
    from osm_merge_spark.queries.graph import (
        SSSP_K, KHOP_SEED_MOD, q_isochrone_cells, q_sssp_bounded,
    )
    from pyspark.sql import functions as F

    iso = q_isochrone_cells(spark, sf_dir)
    reach = q_sssp_bounded(spark, sf_dir)
    total = iso.agg(F.sum("n_nodes")).collect()[0][0]
    assert total == reach.count()
    assert iso.where(F.col("min_cost") < 0).count() == 0
    # seeds (cost 0) exist, so at least one tile has min_cost == 0
    assert iso.where(F.col("min_cost") == 0).count() >= 1


def _pure_pagerank(edge_list, k):
    # the same fixed-point recurrence in plain python ints — the strongest
    # possible check: Spark must match bit-for-bit
    from osm_merge_spark.queries.graph import PR_D_DEN, PR_D_NUM, PR_ONE

    nodes = sorted({u for u, _ in edge_list})
    outdeg = {u: 0 for u in nodes}
    for u, _ in edge_list:
        outdeg[u] += 1
    n = len(nodes)
    rank = {u: PR_ONE // n for u in nodes}
    base = 15 * PR_ONE // PR_D_DEN // n
    for _ in range(k):
        c = {u: rank[u] * PR_D_NUM // (PR_D_DEN * outdeg[u]) for u in nodes}
        nxt = {u: base for u in nodes}
        for u, v in edge_list:
            nxt[v] += c[u]
        rank = nxt
    return rank


def test_pagerank_matches_pure_python(spark):
    from osm_merge_spark.queries.graph import pagerank_fixed

    # asymmetric degrees, a triangle, and a pendant — every node is a src
    raw = [(0, 1), (1, 2), (2, 0), (0, 2), (1, 3)]
    und = raw + [(v, u) for u, v in raw]
    edges = spark.createDataFrame(und, ["src", "dst"])
    got = {r.node_id: r.rank_p for r in pagerank_fixed(edges, k=3).collect()}
    assert got == _pure_pagerank(und, 3)


def test_pagerank_mass_bounded(spark, sf_dir):
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.graph import PR_ONE, q_pagerank_fixed

    df = q_pagerank_fixed(spark, sf_dir)
    agg = df.agg(F.sum("rank_p").alias("s"), F.min("rank_p").alias("lo"),
                 F.count("*").alias("n")).collect()[0]
    # floor division only LEAKS mass: total ≤ 1.0, and every node holds at
    # least the teleport base > 0
    assert 0 < agg["s"] <= PR_ONE
    assert agg["lo"] > 0
    assert agg["n"] == df.select("node_id").distinct().count()


def test_onion_layers_planted(spark):
    # clique K6 glued to a path: at k=3 the path peels immediately (layer 0),
    # the clique survives every round (layer R: internal degree 5 ≥ 3 and
    # peeling the path never lowers it)
    from osm_merge_spark.queries.graph import KCORE_R, onion_layers

    clique = [(u, v) for u in range(6) for v in range(6) if u != v]
    path = [(6, 7), (7, 6), (7, 8), (8, 7), (5, 6), (6, 5)]
    edges = spark.createDataFrame(clique + path, ["src", "dst"])
    got = {r.node_id: r.layer for r in onion_layers(edges, k=3).collect()}
    for u in range(5):
        assert got[u] == KCORE_R, (u, got[u])
    assert got[7] == 0 and got[8] == 0
    # node 5 has degree 6 (clique + bridge) and stays with the clique
    assert got[5] == KCORE_R


def test_onion_layers_monotone_histogram(spark, sf_dir):
    # layers are a partition of all nodes; survivor counts shrink per round
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.graph import (
        KCORE_R, _cooccur_edges, q_onion_layers,
    )

    out = q_onion_layers(spark, sf_dir)
    edges = _cooccur_edges(spark, sf_dir)
    assert out.count() == edges.select("src").distinct().count()
    hist = {r.layer: r.n for r in
            out.groupBy("layer").agg(F.count("*").alias("n")).collect()}
    assert all(0 <= ly <= KCORE_R for ly in hist)
    # survivors after round i = Σ_{layer ≥ i}: must be non-increasing
    surv = [sum(n for ly, n in hist.items() if ly >= i)
            for i in range(KCORE_R + 1)]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    # the peel must actually bite on this fixture (measured: it collapses)
    assert surv[KCORE_R] < surv[0]
