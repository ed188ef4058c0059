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
