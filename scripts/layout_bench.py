"""Measure what the Z-order bucketed layout buys: the same bbox query over
(a) a flat parquet table (full scan + filter) and (b) the write_zordered
layout (directory pruning + row-group skipping). Same rows out, same
machine, warmup + min-of-N fresh plans each.

Usage: python scripts/layout_bench.py [--n 50000000] [--cpus 32]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# a task-tile-sized window (~1% of the AOI): the realistic read pattern —
# a 27%-of-table bbox measures the filter, not the layout
BBOX = (-108.78, 43.62, -108.70, 43.67)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dir", default="/dev/shm/zlayout_bench")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osm_merge_spark.data.synth import _hot_spread, _position
    from osm_merge_spark.operators import layout
    from osm_merge_spark.session import get_spark

    spark = get_spark(
        "layout-bench", master=f"local[{args.cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(args.cpus * 4),
            "spark.driver.memory": f"{max(8, args.cpus)}g",
            "spark.local.dir": "/dev/shm/spark-graft-shuffle",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    flat_dir = os.path.join(args.dir, "flat")
    z_dir = os.path.join(args.dir, "zorder")
    src = spark.range(args.n).withColumnRenamed("id", "i")
    lon, lat = _position(F.col("i"), _hot_spread(args.n))
    pos = src.select(F.col("i").alias("row_id"), lon.alias("lon"),
                     lat.alias("lat"))
    pos.write.mode("overwrite").parquet(flat_dir)
    flat = spark.read.parquet(flat_dir)
    layout.write_zordered(flat, z_dir)

    def flat_plan():
        df = spark.read.parquet(flat_dir)
        return df.filter(
            (F.col("lon") >= BBOX[0]) & (F.col("lon") <= BBOX[2])
            & (F.col("lat") >= BBOX[1]) & (F.col("lat") <= BBOX[3])
        )

    def z_plan():
        return layout.read_bbox(spark, z_dir, *BBOX)

    def best_of(mk) -> tuple[float, int]:
        n = mk().count()  # warmup
        walls = []
        for _ in range(args.reps):
            df = mk()
            t0 = time.perf_counter()
            assert df.count() == n
            walls.append(time.perf_counter() - t0)
        return min(walls), n

    t_flat, n_flat = best_of(flat_plan)
    t_z, n_z = best_of(z_plan)
    assert n_flat == n_z, (n_flat, n_z)
    n_buckets = len({f.split("/zb=")[1].split("/")[0]
                     for f in spark.read.parquet(z_dir).inputFiles()})
    n_probed = len(layout.buckets_for_bbox(
        *BBOX,
        lon_range=tuple(layout.layout_meta(z_dir)["lon_range"]),
        lat_range=tuple(layout.layout_meta(z_dir)["lat_range"]),
    ))
    print(json.dumps({
        "metric": "bbox query: flat scan vs Z-order bucketed layout",
        "n_rows": args.n, "rows_out": n_flat,
        "flat_wall_sec": round(t_flat, 3), "zorder_wall_sec": round(t_z, 3),
        "speedup": round(t_flat / t_z, 2),
        "layout_buckets": n_buckets, "buckets_probed": n_probed,
    }))
    shutil.rmtree(args.dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
