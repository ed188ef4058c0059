"""spark-submit entry point.

Usage (cluster or local — same code path; SURVEY §7.1-8):

    spark-submit --py-files osm_merge_spark.zip -m osm_merge_spark.cli \\
        conflate --images <path> --layer <path> --out <dir> [--resume]
    python -m osm_merge_spark.cli tile    --images <path> --out <dir> --tile-m 50000
    python -m osm_merge_spark.cli synth   --n 100000 --out <dir> [--bytes]
    python -m osm_merge_spark.cli verify  --images <path>

The conflate command runs the checkpoint-resumable pipeline
(plans/pipeline.py): re-running with the same --out resumes from the last
committed stage. On a real cluster pass no --master and let spark-submit
own it; locally local[$SPARK_GRAFT_CPUS] is used.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from .session import get_spark

    return get_spark("osm-merge-spark-cli", master=args.master)


def cmd_synth(args) -> int:
    from .data.synth import synth_images, synth_layer

    spark = _spark(args)
    synth_images(spark, args.n, with_bytes=args.with_bytes).write.mode(
        "overwrite"
    ).parquet(f"{args.out}/images")
    synth_layer(spark, args.n).write.mode("overwrite").parquet(f"{args.out}/layer")
    print(json.dumps({"images": f"{args.out}/images", "layer": f"{args.out}/layer"}))
    return 0


def cmd_conflate(args) -> int:
    from .plans import PipelineContext
    from .plans.pipeline import conflation_pipeline

    spark = _spark(args)
    images = spark.read.parquet(args.images)
    layer = spark.read.parquet(args.layer)
    ctx = PipelineContext(spark, args.out)
    out = conflation_pipeline(ctx, images, layer, tile_m=args.tile_m)
    print(json.dumps({
        "matched": out["matched"].count(),
        "new": out["new"].count(),
        "stages_executed": ctx.executed,
        "stages_skipped": ctx.skipped,
        "manifest": ctx.manifest_path,
    }))
    return 0


def cmd_tile(args) -> int:
    from .functions.cells import TileGrid
    from .operators.tiles import assign_tiles

    spark = _spark(args)
    images = spark.read.parquet(args.images)
    out = assign_tiles(images, TileGrid(tile_m=args.tile_m))
    out.write.mode("overwrite").partitionBy("tile_id").parquet(args.out)
    print(json.dumps({"rows": spark.read.parquet(args.out).count(), "out": args.out}))
    return 0


def cmd_verify(args) -> int:
    from .operators.multimodal import verify_payload

    spark = _spark(args)
    images = spark.read.parquet(args.images)
    res = verify_payload(images)
    bad = res.filter(~res.ok).count()
    total = res.count()
    print(json.dumps({"total": total, "failed": bad, "ok": bad == 0}))
    return 0 if bad == 0 else 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="osm-merge-spark")
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("synth")
    s.add_argument("--n", type=int, required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--bytes", dest="with_bytes", action="store_true")
    s.set_defaults(fn=cmd_synth)

    c = sub.add_parser("conflate")
    c.add_argument("--images", required=True)
    c.add_argument("--layer", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--tile-m", type=float, default=50_000.0)
    c.set_defaults(fn=cmd_conflate)

    t = sub.add_parser("tile")
    t.add_argument("--images", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--tile-m", type=float, default=50_000.0)
    t.set_defaults(fn=cmd_tile)

    v = sub.add_parser("verify")
    v.add_argument("--images", required=True)
    v.set_defaults(fn=cmd_verify)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
