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
