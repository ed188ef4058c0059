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
