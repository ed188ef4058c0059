"""dbscan_core — density classification invariants + plan shape.

Exact output parity vs DuckDB is covered by the registry replica in
test_oracle_parity.py; these tests pin the DBSCAN semantics (role/count
consistency, full labeling) and the distributed plan shape (cell
self-join, no cartesian/NLJ, no broadcast of the corpus-scale core set).
"""

from pyspark.sql import functions as F

from osm_merge_spark.queries import base, geo7


def test_dbscan_full_labeling_and_role_invariants(spark, sf_dir):
    df = geo7.q_dbscan_core(spark, sf_dir).cache()
    try:
        n_img = base.images_df(spark, sf_dir).count()
        assert df.count() == n_img  # one row per image, nothing dropped

        stats = {
            r["role"]: r
            for r in df.groupBy("role")
            .agg(
                F.count("*").alias("n"),
                F.min("n_eps").alias("min_n"),
                F.max("n_eps").alias("max_n"),
            )
            .collect()
        }
        # the fixture genuinely exercises all three classes: per-part image
        # clusters are dense (core), far/uniform classes 6-9 isolate
        # (noise), and cluster fringes sit within eps of a core (border)
        assert set(stats) == {0, 1, 2}
        # core  ⟺ n_eps ≥ minPts
        assert stats[2]["min_n"] >= geo7.DB_MINPTS
        # noise and border are both sub-minPts ...
        assert stats[0]["max_n"] < geo7.DB_MINPTS
        assert stats[1]["max_n"] < geo7.DB_MINPTS
        # ... but a border point has ≥1 neighbor (its core witness)
        assert stats[1]["min_n"] >= 1
    finally:
        df.unpersist()


def test_dbscan_plan_no_cartesian_no_corpus_broadcast(spark, sf_dir):
    plan = (
        geo7.q_dbscan_core(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the eps-graph and the core-semi ride shuffled-hash joins — the core
    # set is corpus-scale at 100 TB and must never be a broadcast build
    assert "ShuffledHashJoin" in plan
