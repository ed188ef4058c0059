"""Checkpoint-resumable stage execution with per-partition lineage rows and
metric counters (north rule; SURVEY §2.9/§4).

The reference restarts from scratch on any failure (single process, RAM
lists); its only "checkpointing" is chunked file reads (readjson.py:69-167).
This engine gives every pipeline stage:

  - an atomic materialization (write to tmp dir + rename — the parquet
    stand-in for an Iceberg snapshot commit; table IO is abstracted so an
    Iceberg catalog slots in where available),
  - a manifest row (stage, status, rows_out, n_partitions, t_start, t_end,
    wall_s) appended only after the commit,
  - per-partition lineage rows (stage, partition_id, rows_out) collected by
    a Spark accumulator inside the same action — no second scan,
  - resume: a re-run skips any stage whose manifest row is committed and
    whose output exists, so a failed 40-stage job at 100 TB re-executes
    only the incomplete suffix.

All driver-side bookkeeping is O(stages + partitions), never O(rows).
"""

from __future__ import annotations

import json
import os
import time

from dataclasses import dataclass, field
from typing import Callable

from pyspark import AccumulatorParam, TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class _DictMaxParam(AccumulatorParam):
    """Accumulator merging {partition_id: row count} dicts by MAX per key.

    Spark guarantees exactly-once accumulator updates only for actions;
    task retries and speculative attempts re-run the lineage pass-through
    and would double-count under a sum merge. Each attempt adds its FULL
    partition count exactly once (at generator exhaustion), so every add
    for a given partition carries the same value and max-per-key is both
    retry-proof and exact."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            a[k] = max(a.get(k, 0), v)
        return a


@dataclass
class PipelineContext:
    """One pipeline run rooted at base_dir.

    Layout: <base>/<stage>/part-*.parquet, <base>/_manifest.jsonl,
    <base>/_lineage/<stage>.jsonl
    """

    spark: SparkSession
    base_dir: str
    executed: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)

    def __post_init__(self):
        os.makedirs(self.base_dir, exist_ok=True)
        os.makedirs(os.path.join(self.base_dir, "_lineage"), exist_ok=True)

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.base_dir, "_manifest.jsonl")

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def manifest(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def committed(self, stage: str) -> bool:
        from ..sources.tables import table_exists

        return any(
            m["stage"] == stage and m["status"] == "committed"
            for m in self.manifest()
        ) and table_exists(self.spark, self.stage_path(stage))

    def _append_manifest(self, row: dict) -> None:
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def lineage(self, stage: str) -> list[dict]:
        p = os.path.join(self.base_dir, "_lineage", f"{stage}.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]


def _with_lineage(df: DataFrame, acc) -> DataFrame:
    """Count rows per physical partition inside the write action itself
    (mapInPandas pass-through + accumulator — no extra scan, no driver
    O(rows) state)."""

    schema = df.schema

    def count_rows(batches):
        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in batches:
            n += len(pdf)
            yield pdf
        acc.add({str(pid): n})

    return df.mapInPandas(count_rows, schema=schema)


def run_stage(
    ctx: PipelineContext,
    stage: str,
    build: Callable[[SparkSession], DataFrame],
    partition_by: list[str] | None = None,
    observe_metrics: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Execute (or resume-skip) one stage; returns the stage output DF.

    build() is only called when the stage is not already committed — the
    lazy plan is materialized exactly once per pipeline lifetime.
    """
    from ..sources.tables import commit_table, read_table

    out = ctx.stage_path(stage)
    if ctx.committed(stage):
        ctx.skipped.append(stage)
        return read_table(ctx.spark, out)

    t0 = time.time()
    df = build(ctx.spark)
    observation = None
    if observe_metrics:
        from pyspark.sql import Observation

        observation = Observation(f"stage:{stage}")
        df = df.observe(observation, *[c.alias(k) for k, c in observe_metrics.items()])

    acc = ctx.spark.sparkContext.accumulator({}, _DictMaxParam())
    df = _with_lineage(df, acc)

    # atomic commit THROUGH THE TABLE SEAM (an Iceberg snapshot commit
    # when a catalog is configured; tmp+rename on the parquet fallback —
    # see sources/tables.commit_table), then the manifest row
    commit_table(df, out, partition_by)

    lineage_rows = [
        {"stage": stage, "partition_id": int(k), "rows_out": v}
        for k, v in sorted(acc.value.items(), key=lambda kv: int(kv[0]))
    ]
    with open(os.path.join(ctx.base_dir, "_lineage", f"{stage}.jsonl"), "w") as f:
        for row in lineage_rows:
            f.write(json.dumps(row) + "\n")

    rows_out = sum(r["rows_out"] for r in lineage_rows)
    manifest_row = {
        "stage": stage,
        "status": "committed",
        "rows_out": rows_out,
        "n_partitions": len(lineage_rows),
        "t_start": t0,
        "t_end": time.time(),
        "wall_s": round(time.time() - t0, 3),
    }
    if observation is not None:
        manifest_row["metrics"] = {
            k: v for k, v in observation.get.items()
        }
    ctx._append_manifest(manifest_row)
    ctx.executed.append(stage)
    return read_table(ctx.spark, out)


def conflation_pipeline(
    ctx: PipelineContext,
    images: DataFrame,
    layer: DataFrame,
    tile_m: float = 50_000.0,
    aoi_ring: list[tuple[float, float]] | None = None,
) -> dict[str, DataFrame]:
    """The flagship end-to-end pipeline as checkpoint-resumable stages:
    ingest-normalize → conflate (matched / new) → tile-assign → outputs.

    Each stage boundary is a durable snapshot; re-running after a crash
    resumes from the last committed stage. The image `bytes` payload never
    enters the join (SURVEY §7.3-4): callers pass the slim projection and
    re-attach payloads by image_id equi-join downstream.
    """
    from ..functions.cells import TileGrid
    from ..operators.conflate import ConflateParams, conflate
    from ..operators.tiles import assign_tiles

    if aoi_ring is not None:
        # boundary clip first (geosupport.py:139-173 clips DB views before
        # any conflation) — native ray-cast, eval_once barrier since the
        # parity sum reads the coordinates many times
        from ..functions.barrier import eval_once
        from ..functions.geo import point_in_fixed_ring

        clipped = eval_once(images, ["lon", "lat"]).filter(
            point_in_fixed_ring(F.col("lon"), F.col("lat"), aoi_ring)
        )
        images = clipped

    img_n = run_stage(
        ctx, "images_normalized", lambda s: images,
        observe_metrics={"rows": F.count(F.lit(1))},
    )
    layer_n = run_stage(ctx, "layer_normalized", lambda s: layer)

    def build_matched(s):
        m, _ = conflate(img_n, layer_n, ConflateParams())
        return m

    matched = run_stage(ctx, "matched", build_matched)

    # "new" anti-joins against the *matched checkpoint* — the expensive
    # cell join is executed exactly once per pipeline lifetime.
    from ..operators.conflate import new_features, prepare_images

    new = run_stage(
        ctx, "new_features",
        lambda s: new_features(prepare_images(img_n), matched.select("image_id")),
    )

    grid = TileGrid(tile_m=tile_m)
    tiles = run_stage(
        ctx, "tile_assignment",
        lambda s: assign_tiles(matched, grid),
        partition_by=["tile_id"],
    )
    return {"matched": matched, "new": new, "tiles": tiles}
