"""Planted-truth test for emb_coherence (queries/vectors.py): the sum
identity Σ_{i≠j}<v_i,v_j> = ||Σv||² − Σ||v||² on known clusters."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
)


def _run(spark, rows, dim):
    from osm_merge_spark.queries import vectors

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ])
    emb = spark.createDataFrame(rows, schema)
    old_dim, vectors.DIM = vectors.DIM, dim
    try:
        qv = emb.select(
            "label",
            F.transform(
                F.col("embedding"),
                lambda e: F.floor(
                    e.cast("double") * F.lit(vectors.EMB_Q3)
                ).cast("long"),
            ).alias("q"),
        )
        per_vec = qv.select(
            "label", "q",
            F.aggregate(
                "q", F.lit(0).cast("long"), lambda a, x: a + x * x
            ).alias("norm2"),
        )
        sums = [F.sum(F.col("q")[i]).alias(f"s{i}") for i in range(dim)]
        agg = per_vec.groupBy("label").agg(
            F.count("*").alias("n_vecs"), F.sum("norm2").alias("sum_norm2_q"),
            *sums,
        )
        gram = None
        for i in range(dim):
            t = F.col(f"s{i}") * F.col(f"s{i}")
            gram = t if gram is None else gram + t
        out = agg.select(
            "label", "n_vecs", "sum_norm2_q",
            (gram - F.col("sum_norm2_q")).alias("pair_dot_q"),
        )
        return {r.label: r.asDict() for r in out.collect()}
    finally:
        vectors.DIM = old_dim


def test_collapsed_cluster_vs_orthogonal_cluster(spark):
    # label 0: three copies of (1,0,0,0) → collapsed. ||v||²_q3 = 1e6 each,
    # pair_dot = n(n-1)·1e6 = 6e6. label 1: the 4 unit basis vectors →
    # orthogonal, pair_dot = 0.
    rows = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(3)]
    rows += [(10 + k, [float(j == k) for j in range(4)], 1) for k in range(4)]
    out = _run(spark, rows, dim=4)
    assert out[0]["n_vecs"] == 3
    assert out[0]["sum_norm2_q"] == 3 * 1_000_000
    assert out[0]["pair_dot_q"] == 6 * 1_000_000
    assert out[1]["n_vecs"] == 4
    assert out[1]["pair_dot_q"] == 0


def test_identity_matches_explicit_pairs(spark):
    # arbitrary small cluster: identity must equal the brute-force pair sum
    # computed on the SAME quantized ints
    import itertools
    import math

    vecs = [[0.25, -0.5, 0.125], [0.75, 0.1, -0.3], [-0.2, 0.4, 0.9]]
    # brute force over quantized components (float32 storage rounds the
    # literals, so quantize from the float32 value like the engine does)
    import numpy as np

    q = [[math.floor(float(np.float32(x)) * 1000.0) for x in v] for v in vecs]
    expect = sum(
        sum(a * b for a, b in zip(q[i], q[j]))
        for i, j in itertools.permutations(range(3), 2)
    )
    rows = [(i, [float(x) for x in v], 7) for i, v in enumerate(vecs)]
    out = _run(spark, rows, dim=3)
    assert out[7]["pair_dot_q"] == expect
