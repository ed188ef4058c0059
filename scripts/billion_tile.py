"""10^9-row tile-assignment wall-time — the BASELINE.json headline metric
measured at the scale it names.

The metric: "tile-assignment wall-time on [an] image+caption table sampled
to 10^9 rows". No small-SF run evidences that; this script synthesizes the
position columns of 10^9 images (the assignment reads ONLY lon/lat — at
100 TB the parquet scan prunes to those two columns, so an in-memory
projection of exactly those columns is the honest stand-in, not a smaller
table), assigns every record its web-mercator tile, and forces full
evaluation with a per-tile count aggregation (so the timing includes the
one shuffle a real per-tile sink would pay).

Protocol matches bench.py: warmup run, then min of --reps fresh plans.

Usage: python scripts/billion_tile.py [--n 1000000000] [--cpus 32]
Prints one JSON line for BASELINE.md §5.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tile-m", type=float, default=2_000.0)
    ap.add_argument(
        "--table", default=None, metavar="DIR",
        help="materialize (lon, lat) to parquet at DIR once and time"
             " scan → assign → agg instead of fusing the synth into the"
             " timed plan — the md5-based position synthesis costs ~6× the"
             " assignment itself, so the fused wall measures the generator;"
             " the table mode measures the operator the metric names"
             " (parquet scan pruned to 2 columns + floor-arith key + agg)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osm_merge_spark.data.synth import _hot_spread, _position
    from osm_merge_spark.functions.cells import TileGrid
    from osm_merge_spark.session import get_spark

    spark = get_spark(
        "billion-tile", master=f"local[{args.cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(args.cpus * 4),
            "spark.driver.memory": f"{max(8, args.cpus * 2)}g",
            "spark.local.dir": "/dev/shm/spark-graft-shuffle",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    grid = TileGrid(tile_m=args.tile_m)

    if args.table:
        # row count baked into the path: a rerun with a different --n must
        # never silently time stale data while reporting the new n_rows
        src = f"{args.table}/positions_{args.n}"
        if not os.path.exists(src):
            df = spark.range(args.n).withColumnRenamed("id", "i")
            lon, lat = _position(F.col("i"), _hot_spread(args.n))
            df.select(lon.alias("lon"), lat.alias("lat")).write.mode(
                "overwrite"
            ).parquet(src)

    def plan():
        if args.table:
            pos = spark.read.parquet(src)
            lon, lat = F.col("lon"), F.col("lat")
        else:
            pos = spark.range(args.n).withColumnRenamed("id", "i")
            lon, lat = _position(F.col("i"), _hot_spread(args.n))
        # per-tile count: forces every row through the tile key and one
        # partial-agg shuffle (map-side combine reduces 10^9 rows to
        # |tiles| per task before the exchange)
        return (
            pos.select(grid.tile_id(lon, lat).alias("tile_id"))
            .groupBy("tile_id").count()
        )

    n_tiles = plan().count()  # warmup (JIT + codegen)
    walls = []
    for _ in range(args.reps):
        p = plan()
        t0 = time.perf_counter()
        p.count()
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    print(json.dumps({
        "metric": "tile-assignment wall time at 10^9 rows",
        "n_rows": args.n,
        "n_tiles": n_tiles,
        "tile_m": args.tile_m,
        "cpus": args.cpus,
        "wall_sec": round(best, 2),
        "all_walls": [round(w, 2) for w in walls],
        "throughput_rows_per_sec": round(args.n / best),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
