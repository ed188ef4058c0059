"""Bounded-hop graph traversal (BFS) on Spark DataFrames.

The engine already has the O(log n) pointer-jumping connected-components
kernel (operators/components.py); this adds the OTHER graph primitive a
conflation/routing stack needs: hop-bounded reachability — "everything
within K edges of these seeds" (road-network service areas, blast-radius
of an edit, co-occurrence neighborhoods).

Graph fixture: the part co-occurrence graph — an undirected edge links
parts appearing on CONSECUTIVE lineitem rows of one order (lag window per
order, bounded per-key state). Seeds are p_partkey % 997 == 0.

Scale shape: K static rounds of frontier ⋈ edges (shuffled-hash equi-join
on the node key) + an anti-join against the visited set — the textbook
Pregel superstep expressed as DataFrames, ONE lazy plan (no driver-side
convergence actions; contrast snap_points' data-dependent ladder, which
documents why it needs them). Frontier dedup is a hash agg; nothing is
broadcast, nothing is collected; each round's shuffle is keyed by node id
so AQE's skew split handles hub nodes. At a 10^12-edge layer you'd persist
the edge table once and reuse it across rounds — here the plan's shared
scan does it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict = {}

KHOP_K = 3
KHOP_SEED_MOD = 997


def khop_reach(edges: DataFrame, seeds: DataFrame, k: int = KHOP_K) -> DataFrame:
    """Min-hop distance (≤ k) from any seed. edges: (src, dst) directed
    rows (pass both directions for an undirected graph); seeds: (node_id).
    Returns (node_id, dist) — first-reach round == min-hop distance, so no
    per-node min is ever recomputed."""
    visited = seeds.select("node_id", F.lit(0).alias("dist"))
    frontier = seeds.select("node_id")
    for d in range(1, k + 1):
        # per-round aliases: round d+1's frontier DERIVES from edges, so an
        # unaliased re-join trips Spark's ambiguous-self-join analyzer
        # shuffle_hash on BOTH joins: the frontier is seed-sized here but
        # corpus-sized at a 10^12-edge layer, so nothing may broadcast and
        # nothing may sort (SMJ) — the equi-keys are hash keys
        fr, ed = frontier.hint("shuffle_hash").alias(f"f{d}"), edges.alias(f"e{d}")
        nxt = (
            fr.join(
                ed.hint("shuffle_hash"),
                F.col(f"f{d}.node_id") == F.col(f"e{d}.src"),
            )
            .select(F.col(f"e{d}.dst").alias("node_id"))
            .distinct()
            .join(
                visited.select("node_id").hint("shuffle_hash"),
                "node_id", "left_anti",
            )
        )
        visited = visited.unionByName(nxt.withColumn("dist", F.lit(d)))
        frontier = nxt
    return visited.select("node_id", F.col("dist").cast("int").alias("dist"))


def _cooccur_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (l_orderkey, l_linenumber) is NOT unique in the driver's synthetic
    # data — collapse to min(l_partkey) per line first (way_assemble's
    # dedup pattern) so the lag sequence is a deterministic total order.
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.min("l_partkey").alias("pk"))
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    pairs = (
        li.select(F.lag("pk").over(w).alias("a"), F.col("pk").alias("b"))
        .where(F.col("a").isNotNull() & (F.col("a") != F.col("b")))
    )
    return (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )


def q_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _cooccur_edges(spark, sf_dir)
    seeds = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where((F.col("p_partkey") % F.lit(KHOP_SEED_MOD)) == F.lit(0))
        .select(F.col("p_partkey").alias("node_id"))
    )
    return khop_reach(edges, seeds, KHOP_K)


def _sql_khop_reach() -> str:
    return (
        "WITH RECURSIVE li AS ("
        " SELECT l_orderkey, l_linenumber, min(l_partkey) AS pk"
        " FROM lineitem GROUP BY 1, 2), "
        "pairs AS ("
        " SELECT lag(pk) OVER (PARTITION BY l_orderkey"
        "  ORDER BY l_linenumber) AS a, pk AS b FROM li), "
        "edges AS ("
        " SELECT a AS src, b AS dst FROM pairs"
        "  WHERE a IS NOT NULL AND a <> b"
        " UNION"
        " SELECT b AS src, a AS dst FROM pairs"
        "  WHERE a IS NOT NULL AND a <> b), "
        "seeds AS (SELECT p_partkey AS node_id FROM part"
        f" WHERE p_partkey % {KHOP_SEED_MOD} = 0), "
        "r(node_id, dist) AS ("
        " SELECT node_id, 0 FROM seeds"
        " UNION"
        " SELECT e.dst, r.dist + 1 FROM r JOIN edges e ON e.src = r.node_id"
        f" WHERE r.dist < {KHOP_K}) "
        "SELECT node_id, CAST(min(dist) AS INT) AS dist FROM r GROUP BY node_id"
    )


QUERIES["khop_reach"] = (q_khop_reach, _sql_khop_reach())


# ---------------------------------------------------------------------------
# graph_clustering — per-node degree + triangle count (local clustering)
# ---------------------------------------------------------------------------
# The second classic distributed-graph staple after BFS: triangles per
# node over the same co-occurrence graph (community density; wedges =
# C(degree,2) gives the local clustering coefficient downstream without
# another pass). Counts are integers, so both engines match exactly —
# the reason this query is oracle-checkable where float PageRank isn't.
#
# Scale shape: the standard wedge-then-close plan — one self-join on the
# hub node builds wedges (u; v<w), one equi-join against the edge list
# closes them; all shuffled-hash on node keys, counts reduce map-side.
# Wedge fan-out is Σ deg² — the hub-dominated term every triangle counter
# pays; at 10^12 edges you cap it the standard way (count on the
# degree-ordered orientation so each wedge forms at its lowest-degree
# vertex), which this fixture's bounded degrees don't need.
def clustering_counts(edges: DataFrame) -> DataFrame:
    """(src, dst) undirected-as-directed edges → (node_id, degree, n_tri)."""
    deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
    e1 = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = edges.select(F.col("src").alias("u2"), F.col("dst").alias("w"))
    wedges = e1.join(
        e2.hint("shuffle_hash"),
        (F.col("u") == F.col("u2")) & (F.col("v") < F.col("w")),
    ).select("u", "v", "w")
    closer = edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = (
        wedges.join(closer.hint("shuffle_hash"), ["v", "w"])
        .groupBy("u")
        .agg(F.count("*").alias("n_tri"))
    )
    return (
        deg.join(tri.hint("shuffle_hash"),
                 deg["src"] == tri["u"], "left")
        .select(
            F.col("src").alias("node_id"),
            F.col("degree").cast("long").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
        )
    )


def q_graph_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering_counts(_cooccur_edges(spark, sf_dir))


def _sql_graph_clustering() -> str:
    return (
        "WITH li AS ("
        " SELECT l_orderkey, l_linenumber, min(l_partkey) AS pk"
        " FROM lineitem GROUP BY 1, 2), "
        "pairs AS ("
        " SELECT lag(pk) OVER (PARTITION BY l_orderkey"
        "  ORDER BY l_linenumber) AS a, pk AS b FROM li), "
        "edges AS ("
        " SELECT a AS src, b AS dst FROM pairs"
        "  WHERE a IS NOT NULL AND a <> b"
        " UNION"
        " SELECT b AS src, a AS dst FROM pairs"
        "  WHERE a IS NOT NULL AND a <> b), "
        "deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY src), "
        "wedges AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w"
        " FROM edges e1 JOIN edges e2 ON e1.src = e2.src"
        " AND e1.dst < e2.dst), "
        "tri AS (SELECT u, count(*) AS n_tri FROM wedges"
        " JOIN edges c ON c.src = wedges.v AND c.dst = wedges.w"
        " GROUP BY u) "
        "SELECT d.src AS node_id, CAST(d.degree AS BIGINT) AS degree,"
        " CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri"
        " FROM deg d LEFT JOIN tri t ON t.u = d.src"
    )


QUERIES["graph_clustering"] = (q_graph_clustering, _sql_graph_clustering())

# ---------------------------------------------------------------------------
# sssp_bounded — hop-bounded WEIGHTED shortest path (Bellman-Ford rounds)
# ---------------------------------------------------------------------------
# The weighted twin of khop_reach: min-cost over walks of ≤ K edges from the
# seed set (travel-time service areas over the road graph, where khop_reach
# only counts hops). Weights are deterministic ints (1 + (src+dst) % 7) so
# both engines are integer-exact end to end.
#
# Scale shape: K static Bellman-Ford relaxation rounds as ONE lazy plan.
# Round d's frontier holds min cost over walks of EXACTLY d edges — a
# (d+1)-walk decomposes into a d-walk plus one edge, so taking the per-node
# min before extending preserves the global min (the hash agg after each
# expansion is the map-side-combining compaction that keeps the frontier at
# ≤ |V| rows instead of walk-enumeration blowup — the thing the naive
# recursive-CTE oracle does NOT do, which is why the oracle is the slow
# twin). Frontier ⋈ edges is shuffled-hash both sides (frontier is
# corpus-sized at a 10^12-edge layer: nothing broadcasts, nothing sorts);
# the final answer is one more hash-agg min across the K+1 round tables.
SSSP_K = 3


def sssp_bounded(edges: DataFrame, seeds: DataFrame,
                 k: int = SSSP_K) -> DataFrame:
    """edges: (src, dst, w int) directed rows (pass both directions for an
    undirected graph); seeds: (node_id). Returns (node_id, dist long) =
    min total weight over walks from any seed using ≤ k edges."""
    dist = seeds.select("node_id", F.lit(0).cast("long").alias("dist"))
    frontier = dist
    out = dist
    for d in range(1, k + 1):
        fr = frontier.hint("shuffle_hash").alias(f"f{d}")
        ed = edges.alias(f"e{d}")
        frontier = (
            fr.join(ed.hint("shuffle_hash"),
                    F.col(f"f{d}.node_id") == F.col(f"e{d}.src"))
            .select(
                F.col(f"e{d}.dst").alias("node_id"),
                (F.col(f"f{d}.dist")
                 + F.col(f"e{d}.w").cast("long")).alias("dist"),
            )
            .groupBy("node_id")
            .agg(F.min("dist").alias("dist"))
        )
        out = out.unionByName(frontier)
    return out.groupBy("node_id").agg(F.min("dist").alias("dist"))


def _weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cooccur_edges(spark, sf_dir).withColumn(
        "w", (F.lit(1) + (F.col("src") + F.col("dst")) % F.lit(7)).cast("int")
    )


def q_sssp_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    seeds = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where((F.col("p_partkey") % F.lit(KHOP_SEED_MOD)) == F.lit(0))
        .select(F.col("p_partkey").alias("node_id"))
    )
    return sssp_bounded(_weighted_edges(spark, sf_dir), seeds, SSSP_K)


def _sql_sssp_bounded() -> str:
    # UNION (not UNION ALL) keeps the walk enumeration bounded: distinct
    # (node, dist, hops) is at most |V| × (7K+1) × (K+1) rows.
    return (
        "WITH RECURSIVE li AS ("
        " SELECT l_orderkey, l_linenumber, min(l_partkey) AS pk"
        " FROM lineitem GROUP BY 1, 2), "
        "pairs AS ("
        " SELECT lag(pk) OVER (PARTITION BY l_orderkey"
        "  ORDER BY l_linenumber) AS a, pk AS b FROM li), "
        "edges0 AS ("
        " SELECT a AS src, b AS dst FROM pairs"
        "  WHERE a IS NOT NULL AND a <> b"
        " UNION"
        " SELECT b AS src, a AS dst FROM pairs"
        "  WHERE a IS NOT NULL AND a <> b), "
        "edges AS (SELECT src, dst,"
        " CAST(1 + (src + dst) % 7 AS INT) AS w FROM edges0), "
        "seeds AS (SELECT p_partkey AS node_id FROM part"
        f" WHERE p_partkey % {KHOP_SEED_MOD} = 0), "
        "r(node_id, dist, hops) AS ("
        " SELECT node_id, CAST(0 AS BIGINT), 0 FROM seeds"
        " UNION"
        " SELECT e.dst, r.dist + e.w, r.hops + 1"
        " FROM r JOIN edges e ON e.src = r.node_id"
        f" WHERE r.hops < {SSSP_K}) "
        "SELECT node_id, CAST(min(dist) AS BIGINT) AS dist"
        " FROM r GROUP BY node_id"
    )


QUERIES["sssp_bounded"] = (q_sssp_bounded, _sql_sssp_bounded())


# ---------------------------------------------------------------------------
# isochrone_cells — cost-bounded service-area raster (sssp × tile grid)
# ---------------------------------------------------------------------------
# The graph+geo composition query: which map cells are reachable from the
# seed set within the hop-bounded cost budget, and at what minimum cost —
# the isochrone raster a routing/coverage product renders directly. Nodes
# are layer features (partkeys), whose deterministic positions the layer
# fixture already SQL-replays; costs come from sssp_bounded.
#
# Scale shape: sssp's K static relaxation rounds (see sssp_bounded), then
# ONE shuffled-hash join of the ≤|V|-row distance table against the layer
# positions (both corpus-scale at a planet layer: nothing broadcasts),
# one tile hash-agg. The raster output is bounded by AOI/tile-area.
ISO_TILE_M = 5_000.0


def q_isochrone_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import geo
    from . import base

    seeds = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where((F.col("p_partkey") % F.lit(KHOP_SEED_MOD)) == F.lit(0))
        .select(F.col("p_partkey").alias("node_id"))
    )
    dist = sssp_bounded(_weighted_edges(spark, sf_dir), seeds, SSSP_K)
    pos = base.layer_df(spark, sf_dir).select(
        F.col("feature_id").alias("node_id"), "s_lon", "s_lat"
    )
    keyed = dist.join(pos.hint("shuffle_hash"), "node_id").select(
        F.floor(geo.mercator_x(F.col("s_lon")) / F.lit(ISO_TILE_M))
        .alias("tx"),
        F.floor(geo.mercator_y(F.col("s_lat")) / F.lit(ISO_TILE_M))
        .alias("ty"),
        "dist",
    )
    return keyed.groupBy("tx", "ty").agg(
        F.count("*").alias("n_nodes"),
        F.min("dist").alias("min_cost"),
    )


def _sql_isochrone_cells() -> str:
    from ..functions import geo
    from . import base

    size = geo.dlit(ISO_TILE_M)
    sssp = _sql_sssp_bounded()
    return (
        f"WITH d AS ({sssp}), "
        f"pos AS (SELECT p_partkey AS node_id,"
        f" {base.part_lon_sql('p_partkey')} AS s_lon,"
        f" {base.part_lat_sql('p_partkey')} AS s_lat FROM part) "
        f"SELECT CAST(floor(({geo.mercator_x_sql('s_lon')}) / {size})"
        f" AS BIGINT) AS tx,"
        f" CAST(floor(({geo.mercator_y_sql('s_lat')}) / {size})"
        f" AS BIGINT) AS ty,"
        f" CAST(count(*) AS BIGINT) AS n_nodes,"
        f" CAST(min(d.dist) AS BIGINT) AS min_cost"
        f" FROM d JOIN pos ON pos.node_id = d.node_id"
        f" GROUP BY 1, 2"
    )


QUERIES["isochrone_cells"] = (q_isochrone_cells, _sql_isochrone_cells())

# ---------------------------------------------------------------------------
# pagerank_fixed — K-round link analysis in fixed-point integer arithmetic
# ---------------------------------------------------------------------------
# The stationary-distribution staple this module's clustering comment calls
# out as "not oracle-checkable" in floats — made exact by running the whole
# recurrence in integer pico-units: rank lives as BIGINT (1.0 ≡ 10^12),
# the damping step is `rank * 85 div (100 * outdeg)` (one integer division
# per NODE per round, not per edge), and the teleport base is
# `15 * 10^12 div (100 * N)`. Every operation is closed over int64
# (max intermediate ≈ 8.5e13), so Spark and DuckDB agree bit-for-bit —
# float PageRank would diverge in summation order alone.
#
# Semantics: K static power-iteration rounds from the uniform vector over
# the symmetric co-occurrence graph (symmetry ⇒ no dangling nodes, so no
# dangling-mass term). Floor-division leaks mass (sinks it, deliberately,
# ~1 pico-unit per node-round) rather than redistributing it — the
# convention is stated here because both engines must share it.
#
# Scale shape: per round, ONE map-side integer division per node (the
# contribution join rank ⋈ outdeg is keyed by node id), one shuffled-hash
# join contribution ⋈ edges on src, one hash-agg sum keyed by dst with
# map-side combine, one left join back to the node set — all equi-joins on
# the node key, nothing broadcast (the rank vector is |V| rows — corpus-
# scale at a web graph), no sorts. K rounds compose into ONE lazy plan;
# at a 10^12-edge layer you'd persist edges+deg once across rounds (here
# the shared scan does it).
PR_K = 3
PR_ONE = 10**12          # fixed-point scale: 1.0 rank unit
PR_D_NUM, PR_D_DEN = 85, 100   # damping 0.85 as an integer ratio


def pagerank_fixed(edges: DataFrame, k: int = PR_K) -> DataFrame:
    """edges: (src, dst) directed rows with every node appearing as a src
    (true for symmetrized graphs). Returns (node_id, rank_p) with rank_p in
    pico-units after k fixed-point power-iteration rounds."""
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_nodes = deg.select(F.count("*").alias("n"))
    # teleport base: 0.15/N in pico-units — a 1-row broadcast scalar
    # `div` is Spark's exact int64 division — the double-`/`-then-cast
    # spelling can round across an integer boundary near 2^53/den and
    # diverge from DuckDB's exact `//`
    base = n_nodes.select(
        F.expr(f"CAST({15 * PR_ONE} div {PR_D_DEN} div n AS BIGINT)")
        .alias("base"),
        F.col("n"),
    )
    ranks = deg.crossJoin(F.broadcast(n_nodes)).select(
        F.col("src").alias("node_id"),
        F.expr(f"CAST({PR_ONE} div n AS BIGINT)").alias("rank_p"),
    )
    for i in range(1, k + 1):
        contrib = (
            ranks.hint("shuffle_hash").alias(f"r{i}")
            .join(deg.hint("shuffle_hash").alias(f"d{i}"),
                  F.col(f"r{i}.node_id") == F.col(f"d{i}.src"))
            .select(
                F.col(f"d{i}.src").alias("src"),
                F.expr(
                    f"CAST(rank_p * {PR_D_NUM}"
                    f" div ({PR_D_DEN} * outdeg) AS BIGINT)"
                ).alias("c"),
            )
        )
        inflow = (
            contrib.join(edges.hint("shuffle_hash").alias(f"e{i}"), "src")
            .groupBy(F.col(f"e{i}.dst").alias("node_id"))
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            deg.select(F.col("src").alias("node_id"))
            .join(inflow.hint("shuffle_hash"), "node_id", "left")
            .crossJoin(F.broadcast(base))
            .select(
                "node_id",
                (F.col("base") + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("long").alias("rank_p"),
            )
        )
    return ranks


def q_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank_fixed(_cooccur_edges(spark, sf_dir), PR_K)


def _sql_pagerank_fixed() -> str:
    one, dn, dd = PR_ONE, PR_D_NUM, PR_D_DEN
    head = (
        "WITH li AS ("
        " SELECT l_orderkey, l_linenumber, min(l_partkey) AS pk"
        " FROM lineitem GROUP BY 1, 2), "
        "pairs AS ("
        " SELECT lag(pk) OVER (PARTITION BY l_orderkey"
        "  ORDER BY l_linenumber) AS a, pk AS b FROM li), "
        "edges AS ("
        " SELECT a AS src, b AS dst FROM pairs"
        "  WHERE a IS NOT NULL AND a <> b"
        " UNION"
        " SELECT b AS src, a AS dst FROM pairs"
        "  WHERE a IS NOT NULL AND a <> b), "
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src), "
        "nn AS (SELECT count(*) AS n FROM deg), "
        f"r0 AS (SELECT src AS node_id, CAST({one} // n AS BIGINT)"
        " AS rank_p FROM deg, nn)"
    )
    body = ""
    for i in range(1, PR_K + 1):
        body += (
            f", c{i} AS (SELECT r.node_id AS src,"
            f" CAST(r.rank_p * {dn} // ({dd} * d.outdeg) AS BIGINT) AS c"
            f" FROM r{i-1} r JOIN deg d ON d.src = r.node_id)"
            f", f{i} AS (SELECT e.dst AS node_id, sum(c.c) AS inflow"
            f" FROM c{i} c JOIN edges e ON e.src = c.src GROUP BY e.dst)"
            f", r{i} AS (SELECT d.src AS node_id,"
            f" CAST({15 * one} // {dd} // nn.n"
            f" + coalesce(f.inflow, 0) AS BIGINT) AS rank_p"
            f" FROM deg d CROSS JOIN nn"
            f" LEFT JOIN f{i} f ON f.node_id = d.src)"
        )
    return head + body + f" SELECT node_id, rank_p FROM r{PR_K}"


QUERIES["pagerank_fixed"] = (q_pagerank_fixed, _sql_pagerank_fixed())


# ---------------------------------------------------------------------------
# onion_layers — bounded-round k-core peeling depth (onion decomposition)
# ---------------------------------------------------------------------------
# The fourth distributed-graph staple after BFS / triangles / PageRank:
# iteratively remove nodes of degree < K and label every node with HOW MANY
# peel rounds it survived (its onion layer, Hébert-Dufresne et al.) — the
# coreness proxy hub analysis and community seeding start from. The layer
# label is the right bounded-round output: on homogeneous graphs a plain
# survivor set is degenerate (all nodes or none — measured on this very
# fixture: k=32 keeps 884/2000 after round 1, 14 after round 2, 0 after 3),
# while the layer histogram is informative at every K. R static rounds,
# same unroll convention as khop/sssp/pagerank; layer ∈ [0, R], R = the
# bounded core.
#
# Scale shape per round: one map-side-combined degree count keyed by node,
# two semi-joins (src/dst ∈ survivors) — all shuffled-hash on node keys,
# survivor sets corpus-scale so nothing broadcasts; the final labeling is
# R slim left joins against ≤|V|-row keep sets; ONE lazy plan.
KCORE_K = 32
KCORE_R = 3


def onion_layers(edges: DataFrame, k: int = KCORE_K,
                 r: int = KCORE_R) -> DataFrame:
    """edges: (src, dst) symmetric directed rows. Returns (node_id, layer)
    where layer = number of peel rounds survived at threshold k (0 = peeled
    in round 1, r = still in the bounded core after r rounds)."""
    nodes = edges.select(F.col("src").alias("node_id")).distinct()
    cur = edges
    keeps = []
    for i in range(1, r + 1):
        deg = cur.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.where(F.col("deg") >= F.lit(k)).select("src")
        keeps.append(keep)
        cur = (
            cur.join(keep.hint("shuffle_hash"), "src", "left_semi")
            .join(
                keep.hint("shuffle_hash")
                .withColumnRenamed("src", "dst"),
                "dst", "left_semi",
            )
        )
    out = nodes
    layer = F.lit(0).cast("int")
    for i, keep in enumerate(keeps, 1):
        flag = keep.withColumnRenamed("src", "node_id").withColumn(
            f"in{i}", F.lit(1)
        )
        out = out.join(flag.hint("shuffle_hash"), "node_id", "left")
        layer = layer + F.coalesce(F.col(f"in{i}"), F.lit(0))
    return out.select("node_id", layer.cast("int").alias("layer"))


def q_onion_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return onion_layers(_cooccur_edges(spark, sf_dir))


def _sql_onion_layers() -> str:
    head = (
        "WITH li AS ("
        " SELECT l_orderkey, l_linenumber, min(l_partkey) AS pk"
        " FROM lineitem GROUP BY 1, 2), "
        "pairs AS ("
        " SELECT lag(pk) OVER (PARTITION BY l_orderkey"
        "  ORDER BY l_linenumber) AS a, pk AS b FROM li), "
        "e0 AS ("
        " SELECT a AS src, b AS dst FROM pairs"
        "  WHERE a IS NOT NULL AND a <> b"
        " UNION"
        " SELECT b AS src, a AS dst FROM pairs"
        "  WHERE a IS NOT NULL AND a <> b), "
        "nodes AS (SELECT DISTINCT src AS node_id FROM e0)"
    )
    body = ""
    for i in range(1, KCORE_R + 1):
        body += (
            f", k{i} AS (SELECT src FROM e{i-1}"
            f" GROUP BY src HAVING count(*) >= {KCORE_K})"
            f", e{i} AS (SELECT e.src, e.dst FROM e{i-1} e"
            f" WHERE e.src IN (SELECT src FROM k{i})"
            f" AND e.dst IN (SELECT src FROM k{i}))"
        )
    layer = " + ".join(
        f"(CASE WHEN k{i}.src IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(1, KCORE_R + 1)
    )
    joins = " ".join(
        f"LEFT JOIN k{i} ON k{i}.src = n.node_id"
        for i in range(1, KCORE_R + 1)
    )
    return (
        head + body
        + f" SELECT n.node_id, CAST({layer} AS INT) AS layer"
        f" FROM nodes n {joins}"
    )


QUERIES["onion_layers"] = (q_onion_layers, _sql_onion_layers())
