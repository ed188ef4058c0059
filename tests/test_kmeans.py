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


def test_bpe_pairs_planted(spark):
    # hand corpus: "aba ab b" → within-word pairs: ab, ba, ab → counts
    # ab:2, ba:1; one-char word emits nothing (the sequence(1,0) guard)
    from osm_merge_spark.queries.text2 import q_bpe_pairs

    import osm_merge_spark.queries.text2 as t2
    docs = spark.createDataFrame(
        [(1, "aba ab b")], ["doc_id", "text"])
    import unittest.mock as mock
    with mock.patch.object(t2, "_docs", lambda s, d: docs), \
         mock.patch.object(t2, "BPE_MIN_COUNT", 1):
        out = {(r.a, r.b): r.cnt
               for r in q_bpe_pairs(spark, "ignored").collect()}
    assert out == {("a", "b"): 2, ("b", "a"): 1}


def test_assoc_pairs_planted(spark, sf_dir):
    # support is BASKET count: repeats inside one order never double-count;
    # pairs are canonical a < b
    from pyspark.sql import functions as F

    from osm_merge_spark.queries.relational import (
        ASSOC_MIN_SUPPORT, q_assoc_pairs,
    )

    out = q_assoc_pairs(spark, sf_dir)
    assert out.where(F.col("a") >= F.col("b")).count() == 0
    assert out.where(F.col("support") < ASSOC_MIN_SUPPORT).count() == 0
    # support can never exceed the number of baskets containing the rarer
    # item: check against single-item basket counts
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
    ).distinct()
    item = li.groupBy("pk").agg(F.count("*").alias("n1"))
    j = (
        out.join(item.withColumnRenamed("pk", "a"), "a")
        .withColumnRenamed("n1", "na")
        .join(item.withColumnRenamed("pk", "b"), "b")
    )
    assert j.where((F.col("support") > F.col("na"))
                   | (F.col("support") > F.col("n1"))).count() == 0


def test_tpch_q3_top10_deterministic(spark, sf_dir):
    from osm_merge_spark.queries.relational import q_tpch_q3

    rows = q_tpch_q3(spark, sf_dir).collect()
    assert len(rows) == 10
    revs = [(r.revenue_e6, r.l_orderkey) for r in rows]
    # descending revenue, orderkey ascending on ties
    assert revs == sorted(revs, key=lambda t: (-t[0], t[1]))


def test_table_fingerprint_detects_change(spark, sf_dir):
    # same table → identical fingerprint; dropping one row flips it while
    # keeping the XOR of the remainder consistent (removed_row_hash =
    # fp_full XOR fp_without)
    from pyspark.sql import functions as F

    from osm_merge_spark.functions import hashes
    from osm_merge_spark.queries.relational import q_table_fingerprint

    fp = {r.tbl: (r.row_count, r.fingerprint)
          for r in q_table_fingerprint(spark, sf_dir).collect()}
    assert set(fp) == {"region", "nation", "customer", "part"}
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    row = hashes.md5i(
        F.concat_ws("\x1f", "n_nationkey", "n_name", "n_regionkey"), 15
    )
    hashes_all = [r.h for r in nat.select(row.alias("h")).collect()]
    import functools
    import operator
    full = functools.reduce(operator.xor, hashes_all)
    assert full == fp["nation"][1]
    without = functools.reduce(operator.xor, hashes_all[1:], 0)
    assert without == full ^ hashes_all[0]
