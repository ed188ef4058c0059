"""Physical-plan regression guards: the conflation ladder's hot path must
stay free of the operators that killed scaling when they silently crept in
(WindowExec full sorts, SortMergeJoin of the ring-exploded probe side,
filter pushdown dragging the refine into a join condition)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: F401


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_conflate_plan_has_no_window_or_smj(spark):
    from osm_merge_spark.data.synth import synth_images, synth_layer
    from osm_merge_spark.operators.conflate import ConflateParams, conflate

    images = synth_images(spark, 2000)
    layer = synth_layer(spark, 2000)
    matched, _ = conflate(images, layer, ConflateParams())
    plan = _plan(matched)

    # the top-5 cap and best-candidate must be aggregations, not windows
    assert "Window" not in plan
    # shuffled-hash fallback engine-wide: SMJ would sort the ring-exploded
    # probe side (the n=8M regression)
    assert "SortMergeJoin" not in plan
    # the cap must be the ObjectHashAggregate (collect_list) formulation
    assert "ObjectHashAggregate" in plan
    # scalar math (haversine/bbox) in a BHJ condition is fine — it runs
    # codegen'd on the streamed side. The regression to guard is the
    # INTERPRETED higher-order refine (transform/aggregate lambdas over
    # the geometry arrays) being dragged into a join condition, which
    # re-projects whole arrays per candidate (the n=8M incident).
    for line in plan.splitlines():
        if "Join" in line:
            assert "lambdafunction" not in line, line[:200]


def test_dedup_ngram_plan_broadcasts_stop_shingles(spark):
    """The stop_df guard must be a BROADCAST anti-join (the stop list is
    tiny by construction) — a shuffle anti-join would re-shuffle the whole
    shingle table just to drop a handful of hot keys."""
    from osm_merge_spark.operators import dedup

    df = spark.createDataFrame(
        [(f"d{i}", f"one two three common{i % 2}") for i in range(20)],
        "doc_id string, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(df, stop_df=5)
    plan = _plan(pairs)
    assert "BroadcastHashJoin LeftAnti" in plan or (
        "LeftAnti" in plan and "BroadcastExchange" in plan
    )
