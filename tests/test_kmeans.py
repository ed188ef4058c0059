"""kmeans_rounds (queries/vectors.py): the oracle-exact Lloyd trainer —
bit-equality against a pure-python replica of the quantize/assign/update
recurrence, plus assignment invariants."""

import math

from pyspark.sql import functions as F


def _pure_kmeans(vecs, k, r):
    # identical recurrence in plain python ints
    def quant(v):
        return [math.floor(x * 1000.0) for x in v]

    q = {vid: quant(v) for vid, v in vecs.items()}
    cents = {c: list(q[c]) for c in range(k) if c in q}

    def assign():
        out = {}
        for vid, v in q.items():
            best = None
            for c in sorted(cents):
                d2 = sum((a - b) * (a - b) for a, b in zip(v, cents[c]))
                if best is None or d2 < best[0]:
                    best = (d2, c)
            out[vid] = best
        return out

    for _ in range(r):
        asg = assign()
        nxt = {}
        for vid, (_, c) in asg.items():
            s, n = nxt.setdefault(c, ([0] * len(q[vid]), 0))
            nxt[c] = ([a + b for a, b in zip(s, q[vid])], n + 1)
        # Spark `div` and DuckDB `//` both truncate toward zero on
        # negatives; python's // floors — use int(/) truncation
        cents = {c: [int(s_i / n) if s_i < 0 else s_i // n for s_i in s]
                 for c, (s, n) in nxt.items()}
    return assign()


def test_kmeans_matches_pure_python(spark, sf_dir):
    from osm_merge_spark.queries.vectors import KM_K, KM_R, q_kmeans_rounds

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {r.vec_id: list(r.embedding)
            for r in emb.limit(2000).collect()}
    exp = _pure_kmeans(vecs, KM_K, KM_R)
    got = {r.vec_id: (r.d2, r.cluster)
           for r in q_kmeans_rounds(spark, sf_dir).collect()}
    assert got == exp


def test_kmeans_assignment_invariants(spark, sf_dir):
    from osm_merge_spark.queries.vectors import KM_K, q_kmeans_rounds

    df = q_kmeans_rounds(spark, sf_dir)
    n = df.count()
    assert df.select("vec_id").distinct().count() == n
    agg = df.agg(F.min("cluster"), F.max("cluster"),
                 F.min("d2")).collect()[0]
    assert 0 <= agg[0] <= agg[1] < KM_K
    assert agg[2] >= 0
    # the trainer must actually separate: more than one surviving cluster
    assert df.select("cluster").distinct().count() > 1
