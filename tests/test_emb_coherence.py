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


def test_outliers_sum_matches_coherence_identity(spark, sf_dir):
    # Σ_v n²·dist²(v, centroid) = n·(n·Σ‖v‖² − ‖Σv‖²) — the same moments
    # emb_coherence reports, so the two queries must agree exactly
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.vectors import (
        q_emb_coherence, q_emb_outliers,
    )

    out = (
        q_emb_outliers(spark, sf_dir)
        .groupBy("label").agg(F.sum("d2n2").alias("sum_d2n2"),
                              F.count("*").alias("n"))
    )
    coh = q_emb_coherence(spark, sf_dir).select(
        "label", "n_vecs", "sum_norm2_q", "gram_q"
    )
    j = out.join(coh, "label")
    bad = j.where(
        F.col("sum_d2n2")
        != F.col("n_vecs") * (F.col("n_vecs") * F.col("sum_norm2_q")
                              - F.col("gram_q"))
    ).count()
    assert bad == 0
    assert j.where(F.col("n") != F.col("n_vecs")).count() == 0


def test_outliers_queue_semantics(spark, sf_dir):
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.vectors import OUT_TOPK, q_emb_outliers

    df = q_emb_outliers(spark, sf_dir)
    assert df.where(F.col("d2n2") < 0).count() == 0
    # exactly min(OUT_TOPK, label size) queued per label, and queue members
    # are exactly ranks 1..K
    per = df.groupBy("label").agg(
        F.sum(F.col("in_queue").cast("int")).alias("q"),
        F.count("*").alias("n"),
        F.max(F.when(F.col("in_queue"),
                     F.col("review_rank"))).alias("maxq"),
    ).collect()
    for r in per:
        assert r.q == min(OUT_TOPK, r.n)
        assert r.maxq == r.q
    # queued d2n2 dominates unqueued within the label
    j = (
        df.where("in_queue").groupBy("label")
        .agg(F.min("d2n2").alias("qmin"))
        .join(df.where(~F.col("in_queue")).groupBy("label")
              .agg(F.max("d2n2").alias("omax")), "label")
    )
    assert j.where(F.col("qmin") < F.col("omax")).count() == 0
