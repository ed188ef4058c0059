"""SQ8 int8 quantization: representation invariants + recall of the
quantized scorer against the exact float scorer (the property that matters
— top-k under SQ8 should almost always agree at 64-d)."""

from __future__ import annotations

import pyspark.sql.functions as F

from osm_merge_spark.operators import similarity
from osm_merge_spark.queries.vectors import QUERY_MOD, _emb


def test_quantize8_invariants(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0]),
         (3, [1e-6, -1e-6, 5e-7, 0.0])],
        "vec_id long, embedding array<float>",
    )
    qv, scale = similarity.quantize8(F.col("embedding"))
    rows = {r.vec_id: r for r in
            df.select("vec_id", qv.alias("q"), scale.alias("s")).collect()}
    # symmetric range, extreme component hits ±127 exactly
    assert rows[1].q == [64, -127, 32, 0]
    assert abs(rows[1].s - 1.0 / 127) < 1e-12
    # zero vector: scale 1.0, all-zero code (no div-by-zero)
    assert rows[2].q == [0, 0, 0, 0] and rows[2].s == 1.0
    # tiny vectors still normalize to full code range
    assert max(abs(v) for v in rows[3].q) == 127


def test_q8_topk_recall_vs_exact(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = similarity.cosine_topk(emb, queries, k=5).collect()
    quant = similarity.q8_topk(emb, queries, k=5).collect()

    def by_q(rows):
        out: dict[int, set[int]] = {}
        for r in rows:
            out.setdefault(r.qid, set()).add(r.nid)
        return out

    e, q = by_q(exact), by_q(quant)
    assert e.keys() == q.keys() and len(e) > 0
    hits = sum(len(e[k] & q[k]) for k in e)
    total = sum(len(e[k]) for k in e)
    recall = hits / total
    # 64-d embeddings at 8 bits/component: SQ8 cosine error ~1e-3, large
    # vs ~nothing — top-5 should be nearly identical
    assert recall >= 0.9, f"SQ8 recall@5 = {recall:.3f}"
    # and rank-1 (the nearest neighbor) should never be lost
    e1 = {r.qid: r.nid for r in exact if r.rank == 1}
    q1 = {r.qid: r.nid for r in quant if r.rank == 1}
    agree = sum(e1[k] == q1[k] for k in e1) / len(e1)
    assert agree >= 0.9, f"SQ8 rank-1 agreement = {agree:.3f}"


def test_clip_align_gate(spark, sf_dir):
    from osm_merge_spark.queries.vectors import CLIP_THRESH, q_clip_align

    rows = q_clip_align(spark, sf_dir).collect()
    n_emb = _emb(spark, sf_dir).count()
    assert len(rows) == n_emb // 2          # one row per (image, text) pair
    assert len({r.pair_id for r in rows}) == len(rows)  # join key unique
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)             # the gate is selective, not all/none
    for r in rows:
        assert r.keep == (r.clip_score >= CLIP_THRESH)
