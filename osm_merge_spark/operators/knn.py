"""Candidate ranking / kNN selection (J3, T1-T3 in SURVEY §2).

The reference caps candidate lists at 5 (scan order — nondeterministic,
conflator.py:262-267) then picks best by max hits / min distance
(conflator.py:285-298). Spark-first: ranking windows with explicit
deterministic tie-breaks (id ascending) — a documented semantic fix over
the reference's scan-order dependence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(pairs: DataFrame, partition_key: str, order_by: list[Column], k: int,
          rank_col: str = "__rk") -> DataFrame:
    """Keep the k best rows per partition_key (deterministic superset of the
    reference's early-exit-at-5, T1)."""
    w = Window.partitionBy(partition_key).orderBy(*order_by)
    return (
        pairs.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop(rank_col)
    )


def best_candidate(pairs: DataFrame, partition_key: str, hits_col: str = "hits",
                   dist_col: str = "dist_m", tie_col: str = "feature_id") -> DataFrame:
    """Pick one winner per primary: max hits, then min distance, then id
    (J3; sort keys mirror hitsSort/distSort at conflator.py:72-84)."""
    w = Window.partitionBy(partition_key).orderBy(
        F.desc(hits_col), F.asc(dist_col), F.asc(tie_col)
    )
    return pairs.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") == 1).drop("__rk")


def knn(pairs: DataFrame, partition_key: str, dist_col: str, k: int,
        tie_col: str = "feature_id") -> DataFrame:
    """Plain k-nearest-neighbors per primary over refined distances
    (the POI path's ORDER BY ST_Distance, conflatePOI.py:318)."""
    return top_k(pairs, partition_key, [F.asc(dist_col), F.asc(tie_col)], k)


def knn_unbounded(primary: DataFrame, secondary: DataFrame, k: int,
                  initial_radius_m: float = 100.0, max_expansions: int = 8,
                  p_key: str = "image_id", s_key: str = "feature_id",
                  growth: float = 4.0) -> DataFrame:
    """kNN with no distance bound: cell-ring EXPANSION (north rule).

    Round i joins the still-unsatisfied primaries at radius r·growth^i —
    each round is a fresh (coarser) cell grid, so far-apart neighbors are
    found without ever widening the join for primaries already satisfied.
    Unsatisfied set shrinks geometrically; ≤ max_expansions rounds. A found
    neighbor at radius r is only final once the round radius guarantees no
    closer unseen candidate exists — guaranteed because round i's candidate
    superset contains every feature within r_i and we keep global top-k
    over all rounds' pairs.

    primary: (p_key, lon, lat); secondary: (s_key, xs, ys) points.
    Returns (p_key, s_key, rank, dist_m).
    """
    from ..functions import geo
    from ..functions.cells import CellGrid
    from . import cell_join

    remaining = primary
    all_pairs = None
    radius = initial_radius_m
    for _ in range(max_expansions):
        if not remaining.take(1):
            break
        grid = CellGrid.for_radius(radius, max_abs_lat=75.0)
        pairs = cell_join.candidate_pairs(
            remaining, secondary, grid, p_key=p_key, s_key=s_key,
            secondary_points=True,
        ).withColumn(
            "dist",
            geo.haversine_m(
                F.col("lon"), F.col("lat"),
                F.element_at("xs", 1), F.element_at("ys", 1),
            ),
        ).filter(F.col("dist") <= F.lit(radius)).select(p_key, s_key, "dist")
        all_pairs = pairs if all_pairs is None else all_pairs.unionByName(pairs)
        have_k = (
            pairs.groupBy(p_key).count().filter(F.col("count") >= k).select(p_key)
        )
        remaining = remaining.join(have_k, p_key, "left_anti")
        radius *= growth
    if all_pairs is None:
        return primary.sparkSession.createDataFrame(
            [], f"{p_key} string, {s_key} long, rank int, dist_m double"
        )
    deduped = all_pairs.dropDuplicates([p_key, s_key])
    w = Window.partitionBy(p_key).orderBy(F.asc("dist"), F.asc(s_key))
    return (
        deduped.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(p_key, s_key, F.col("rank").cast("int").alias("rank"),
                F.round("dist", 3).alias("dist_m"))
    )
