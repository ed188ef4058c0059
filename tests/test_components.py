"""Connected-components cluster assignment (operators/components.py) +
the round-3 pipeline queries built on it (dedup_cluster, decontaminate,
sample_stratified)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from osm_merge_spark.operators.components import connected_components


def _cc_bruteforce(edges, verts):
    """Union-find ground truth: min vertex id per component."""
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in verts}


def test_cc_chain_and_islands(spark):
    # chain 1-2-3-4, pair 10-11, triangle 20-21-22 (+ redundant edge)
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {r["doc"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_cc_matches_union_find_random(spark):
    rng = random.Random(7)
    verts = list(range(200))
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _cc_bruteforce(edges, {v for e in edges for v in e})
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {r["doc"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == expected


def test_cc_long_path_converges_fast(spark):
    # a 64-vertex path has diameter 63; pointer jumping must converge well
    # under MAX_ROUNDS (plain min-propagation alone would need 63 rounds)
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    got = connected_components(df, max_rounds=10)
    assert got.filter(F.col("cluster_id") != 0).count() == 0
    assert got.count() == 64


def test_dedup_cluster_keeps_one_per_component(spark, sf_dir):
    from osm_merge_spark.queries.text import q_dedup_cluster

    out = q_dedup_cluster(spark, sf_dir).cache()
    n_docs = out.count()
    # every cluster has exactly one keeper, and it is the min doc_id
    per = out.groupBy("cluster_id").agg(
        F.sum("keep").alias("keepers"), F.min("doc_id").alias("mn")
    )
    assert per.filter(F.col("keepers") != 1).count() == 0
    assert per.filter(F.col("mn") != F.col("cluster_id")).count() == 0
    assert out.select("doc_id").distinct().count() == n_docs
    out.unpersist()


def test_decontaminate_planted_overlap(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),        # eval (0 % 37 == 0)
        (1, "prefix words alpha beta gamma delta tail"),   # shares the 4-gram
        (2, "completely different content here okay now"),  # clean
        (37, "another eval document with unique words"),    # eval
        (3, "another eval document with unique words too"),  # hits doc 37
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from osm_merge_spark.operators import dedup
    from osm_merge_spark.queries.text import DECON_K, DECON_MOD

    is_eval = F.col("doc_id") % DECON_MOD == 0
    ev = (dedup._doc_shingles(df.filter(is_eval), "text", "doc_id", DECON_K)
          .select("sh").distinct())
    tr = dedup._doc_shingles(df.filter(~is_eval), "text", "doc_id", DECON_K)
    got = {r["doc"]: r["n_hits"] for r in
           tr.join(F.broadcast(ev), "sh").groupBy("doc")
           .agg(F.count("*").alias("n_hits")).collect()}
    assert set(got) == {1, 3}
    assert got[1] == 1   # shares exactly "alpha beta gamma delta"
    assert got[3] == 3   # three 4-grams of doc 37's text


def test_sample_stratified_deterministic_and_thresholded(spark, sf_dir):
    import hashlib

    from osm_merge_spark.queries.text import (
        SAMPLE_RATES, q_sample_stratified,
    )

    out1 = q_sample_stratified(spark, sf_dir).collect()
    out2 = q_sample_stratified(spark, sf_dir).collect()
    assert sorted(r["doc_id"] for r in out1) == sorted(
        r["doc_id"] for r in out2)  # pure function of the input
    # verify the hash threshold row-by-row against an independent md5
    for r in out1:
        bucket = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8],
                     16) % 1000
        assert bucket < SAMPLE_RATES.get(r["lang"], 1000)


def test_repetition_stats_planted(spark, tmp_path):
    import os

    rows = [
        (1, "a a a a"),                       # dup=3/4, top bigram "a a"=3/3
        (2, "w x y z"),                       # dup=0, each bigram 1/3
        (3, "solo"),                          # 1 word, no bigrams → 0
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).withColumn("lang", F.lit("en"))
    p = os.path.join(str(tmp_path), "documents.parquet")
    df.write.parquet(p)
    # point the query at a dir shaped like an sf dir
    from osm_merge_spark.queries.text import q_repetition_stats

    got = {r["doc_id"]: r for r in
           q_repetition_stats(spark, str(tmp_path)).collect()}
    assert got[1]["dup_word_frac_e6"] == 750_000
    assert got[1]["top_bigram_frac_e6"] == 1_000_000
    assert got[2]["dup_word_frac_e6"] == 0
    assert got[2]["top_bigram_frac_e6"] == 333_333
    assert got[3]["top_bigram_frac_e6"] == 0


def test_merge_upsert_actions(spark, sf_dir):
    from osm_merge_spark.queries.relational import q_merge_upsert

    out = q_merge_upsert(spark, sf_dir).cache()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = cust.count()
    n_upd = cust.filter(F.col("c_custkey") % 10 == 0).count()
    n_ins = cust.filter(F.col("c_custkey") % 25 == 0).count()
    by = {r["merge_action"]: r["n"] for r in
          out.groupBy("merge_action").agg(F.count("*").alias("n")).collect()}
    assert by.get("update", 0) == n_upd
    assert by.get("insert", 0) == n_ins
    assert by.get("keep", 0) == n - n_upd
    assert out.count() == n + n_ins       # merged table size
    assert out.select("c_custkey").distinct().count() == n + n_ins
    out.unpersist()


def test_tile_pyramid_levels_conserve_mass(spark, sf_dir):
    from osm_merge_spark.queries.geo import q_tile_pyramid

    out = q_tile_pyramid(spark, sf_dir).cache()
    sums = {r["level"]: r["s"] for r in
            out.groupBy("level").agg(F.sum("n_images").alias("s")).collect()}
    # every level partitions the same image set
    assert sums[0] == sums[1] == sums[2]
    counts = {r["level"]: r["n"] for r in
              out.groupBy("level").agg(F.count("*").alias("n")).collect()}
    assert counts[0] >= counts[1] >= counts[2]  # tiles coarsen monotonically
    out.unpersist()


def test_corpus_filter_reasons_consistent(spark, sf_dir):
    from osm_merge_spark.queries.text import q_corpus_filter

    out = q_corpus_filter(spark, sf_dir).cache()
    # keep <=> no reasons, and both verdicts occur in the corpus
    assert out.filter((F.col("keep") == 1) & (F.col("drop_reasons") != "")).count() == 0
    assert out.filter((F.col("keep") == 0) & (F.col("drop_reasons") == "")).count() == 0
    assert out.filter(F.col("keep") == 1).count() > 0
    assert out.filter(F.col("keep") == 0).count() > 0
    # every zh doc is dropped with a lang reason
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    zh = out.join(docs, "doc_id").filter(F.col("lang") == "zh")
    assert zh.filter(~F.col("drop_reasons").contains("lang")).count() == 0
    out.unpersist()


def test_corpus_filter_stream_equals_batch(spark, sf_dir, tmp_path):
    from osm_merge_spark.queries.text import q_corpus_filter
    from osm_merge_spark.streaming import jobs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs_src")
    # several files → several micro-batches
    docs.repartition(4).write.parquet(src)
    stream = jobs.chunked_ingest(spark, src, docs.schema,
                                 max_files_per_trigger=1)
    got = jobs.run_available_now(
        jobs.corpus_filter_stream(stream), str(tmp_path / "ck"),
        output_mode="append", query_name="cfs",
    ).collect()
    want = q_corpus_filter(spark, sf_dir).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
