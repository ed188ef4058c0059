"""Checkpoint/resume/lineage semantics of plans.pipeline (north rule)."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm_merge_spark.data.synth import synth_images, synth_layer
from osm_merge_spark.plans import PipelineContext
from osm_merge_spark.plans.pipeline import conflation_pipeline, run_stage

N = 400


def _ctx(spark, tmp_path, name):
    base = str(tmp_path / name)
    if os.path.exists(base):
        shutil.rmtree(base)
    return PipelineContext(spark, base)


def test_stage_commit_lineage_and_metrics(spark, tmp_path):
    ctx = _ctx(spark, tmp_path, "p1")
    df = run_stage(
        ctx, "imgs",
        lambda s: synth_images(s, N).repartition(4),
        observe_metrics={"n": F.count(F.lit(1))},
    )
    assert df.count() == N
    man = ctx.manifest()
    assert len(man) == 1 and man[0]["status"] == "committed"
    assert man[0]["rows_out"] == N
    assert man[0]["metrics"]["n"] == N
    lin = ctx.lineage("imgs")
    assert sum(r["rows_out"] for r in lin) == N
    assert len(lin) == 4  # one lineage row per physical partition


def test_resume_skips_committed_stages(spark, tmp_path):
    ctx = _ctx(spark, tmp_path, "p2")
    run_stage(ctx, "a", lambda s: synth_images(s, 50))
    assert ctx.executed == ["a"]

    calls = []

    def build_a(s):
        calls.append("a")
        return synth_images(s, 50)

    # same base dir, fresh context → committed stage must be skipped and
    # its build function never invoked
    ctx2 = PipelineContext(spark, ctx.base_dir)
    df = run_stage(ctx2, "a", build_a)
    assert ctx2.skipped == ["a"] and not calls
    assert df.count() == 50


def test_conflation_pipeline_end_to_end_and_resume(spark, tmp_path):
    ctx = _ctx(spark, tmp_path, "p3")
    images = synth_images(spark, N)
    layer = synth_layer(spark, N)
    out = conflation_pipeline(ctx, images, layer, tile_m=5000.0)
    n_matched = out["matched"].count()
    n_new = out["new"].count()
    assert n_matched + n_new == N
    assert n_matched > 0 and n_new > 0
    assert out["tiles"].select("tile_id").distinct().count() > 1
    stages = {m["stage"] for m in ctx.manifest()}
    assert stages == {
        "images_normalized", "layer_normalized", "matched",
        "new_features", "tile_assignment",
    }

    # crash-resume: drop the last stage's output → only it re-executes
    shutil.rmtree(ctx.stage_path("tile_assignment"))
    ctx2 = PipelineContext(spark, ctx.base_dir)
    out2 = conflation_pipeline(ctx2, images, layer, tile_m=5000.0)
    assert ctx2.executed == ["tile_assignment"]
    assert set(ctx2.skipped) == {
        "images_normalized", "layer_normalized", "matched", "new_features",
    }
    assert out2["matched"].count() == n_matched


def test_pipeline_with_aoi_clip(spark, tmp_path):
    """aoi_ring clips the image stream before conflation (boundary-clip
    stage, geosupport.py:139-173 semantics)."""
    from osm_merge_spark.data import synth

    ctx = _ctx(spark, tmp_path, "p4")
    images = synth_images(spark, 300)
    layer = synth_layer(spark, 300)
    ring = list(zip(synth.AOI_RING_X[:-1], synth.AOI_RING_Y[:-1]))
    out = conflation_pipeline(ctx, images, layer, tile_m=5000.0, aoi_ring=ring)
    n_in = out["matched"].count() + out["new"].count()
    assert 0 < n_in < 300  # NE-corner cut drops a slice of the images
