"""Round-5 verdict-item pins: ivf_search and pq_adc_topk share the agg
top-k (item #2 — no WindowExec in any default ANN selection)."""

from pyspark.sql import functions as F

from osm_merge_spark.queries import vectors


def test_ivf_search_plan_has_no_window(spark, sf_dir):
    """r4 verdict #2: ivf_search's post-probe selection must be the same
    hash-agg top-k cosine_topk graduated to — no Window node, no SortExec
    feeding one."""
    plan = vectors.q_ivf_search(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "ObjectHashAggregate" in plan


def test_pq_adc_topk_plan_has_no_window(spark, sf_dir):
    plan = vectors.q_ann_pq_topk(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "ObjectHashAggregate" in plan


def test_hist_cumsum_matches_naive_window(spark):
    """Two-level partitioned cumsum == single-partition window, row for
    row, including negative keys and both directions."""
    from pyspark.sql import Window

    from osm_merge_spark.functions.histogram import hist_cumsum

    rows = [(k, (k * 7919) % 13 + 1) for k in range(-5000, 5000, 7)]
    hist = spark.createDataFrame(rows, ["k", "v"])
    for desc in (False, True):
        order = F.col("k").desc() if desc else F.col("k").asc()
        w = Window.orderBy(order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        naive = {r["k"]: r["c"] for r in
                 hist.select("k", F.sum("v").over(w).alias("c")).collect()}
        ours = {r["k"]: r["cum"] for r in
                hist_cumsum(hist, "k", "v", descending=desc).collect()}
        assert ours == naive


def test_no_unpartitioned_window_in_percentile_plans(spark, sf_dir):
    """r4 verdict nit #1: clip_percentile and key_skew must not compile a
    single-partition WindowExec (windowspecdefinition with no partition
    columns)."""
    import re

    from osm_merge_spark.queries.relational import q_key_skew
    from osm_merge_spark.queries.vectors import q_clip_percentile

    pat = re.compile(r"windowspecdefinition\([^(),]*\s(?:ASC|DESC)\sNULLS")
    for q in (q_clip_percentile, q_key_skew):
        plan = q(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        assert not pat.search(plan), q.__name__
