"""Connected components over near-dup pair graphs — the cluster-assignment
stage of a dedup pass.

Every pairwise near-dup detector in this engine (phash hamming, MinHash LSH,
n-gram Jaccard, embedding LSH) emits edges (d1, d2). A training-data pipeline
cannot drop duplicates from pairs alone: if A~B and B~C, keeping "one of each
pair" keeps two of {A,B,C}. The fix is to label each document with the id of
its connected component and keep one representative per component. The
reference stops at pairwise duplicate lists (poidup.py emits pair features
only); this operator is the pipeline extension the pairs feed into.

Spark-first design (no GraphFrames dependency — plain DataFrame joins):

  - alternating **neighbor-min propagation** (each vertex takes the min label
    over itself and its neighbors; one shuffle hash join + one groupBy per
    round) and **pointer jumping** (label <- label(label); one self-join),
    the same two primitives as the large-star/small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14). Pointer jumping halves the label-tree depth every round, so
    convergence is O(log d) rounds for diameter d, not O(d).
  - **lineage truncation per round** via localCheckpoint(eager=True) —
    without it round i's plan recomputes rounds 1..i-1 from scratch (the
    exact knn_unbounded pathology fixed in round 3); with it each round
    costs one join over materialized partitions.
  - **convergence by monotone invariant**: labels only ever decrease, so
    the label sum is strictly decreasing until fixpoint; one cheap agg per
    round detects convergence without a change-count join.
  - at 10^12 edges each round is one shuffle on (vertex id) — AQE handles
    skewed super-components; the edge list is never collected or crossed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 25


def connected_components(edges: DataFrame, src: str = "d1", dst: str = "d2",
                         max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """Label every vertex of the undirected pair graph with the minimum
    vertex id reachable from it. Returns (doc, cluster_id); only vertices
    that appear in at least one edge are emitted (callers re-attach
    singletons with a left join + coalesce).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.distinct().localCheckpoint(eager=True)

    labels = (
        e.select(F.col("a").alias("doc")).distinct()
        .select("doc", F.col("doc").alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for _ in range(max_rounds):
        # neighbor-min: vertex a receives the labels of all its neighbors b
        nb = e.join(
            labels.select(
                F.col("doc").alias("b"), F.col("label").alias("nb_label")
            ),
            "b",
        ).select(F.col("a").alias("doc"), F.col("nb_label").alias("label"))
        stepped = (
            labels.select("doc", "label").union(nb)
            .groupBy("doc").agg(F.min("label").alias("label"))
        )
        # pointer jump: label <- label(label). Every label value is itself a
        # vertex id (min over vertex ids), so the lookup side covers it; the
        # coalesce is belt-and-braces for the join's left rows only.
        parent = stepped.select(
            F.col("doc").alias("label"), F.col("label").alias("jumped")
        )
        new = (
            stepped.join(parent, "label", "left")
            .select(
                "doc", F.coalesce(F.col("jumped"), F.col("label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
        labels.unpersist()
        labels = new
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:  # labels are monotone non-increasing
            break
        prev_sum = cur_sum
    return labels.select("doc", F.col("label").alias("cluster_id"))


def cluster_assign_sql(pairs_sql: str, table: str = "documents",
                       id_col: str = "doc_id") -> str:
    """DuckDB oracle: transitive closure by recursive CTE (min reachable id),
    then every table row labeled — singletons become their own cluster.
    Output: (doc_id, cluster_id, keep) with keep=1 on the representative.
    pairs_sql must select columns d1, d2 (it may carry its own WITH clause —
    it is wrapped as a derived table).
    """
    return (
        "WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ("
        + pairs_sql
        + ") raw_pairs), "
        "und AS (SELECT d1 AS a, d2 AS b FROM pairs "
        "UNION SELECT d2 AS a, d1 AS b FROM pairs), "
        "reach(doc, o) AS ("
        " SELECT a AS doc, a AS o FROM (SELECT DISTINCT a FROM und) v"
        " UNION"
        " SELECT r.doc, u.b AS o FROM reach r JOIN und u ON u.a = r.o), "
        "cc AS (SELECT doc, min(o) AS cluster_id FROM reach GROUP BY doc) "
        f"SELECT t.{id_col} AS doc_id,"
        f" coalesce(cc.cluster_id, t.{id_col}) AS cluster_id,"
        f" CAST(CASE WHEN coalesce(cc.cluster_id, t.{id_col}) = t.{id_col}"
        " THEN 1 ELSE 0 END AS INT) AS keep"
        f" FROM {table} t LEFT JOIN cc ON cc.doc = t.{id_col}"
    )
