"""Sequence-window frame-dedup at scale: the zero-join consecutive-frame
pass (queries/geo6.q_frame_dedup's shape) on n synthetic frames in
50-frame capture sequences — measures the cost of the ONE sequence-keyed
shuffle + per-key sort + codegen bit_count that the operator is.

Usage: python scripts/frame_scale.py [--n 100000000] [--cpus 32]
Prints one JSON line: {"n":..., "cpus":..., "wall_s":..., "frames_per_s":...,
"kept":...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from osm_merge_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=50)
    ap.add_argument("--shuf", type=int, default=0,
                    help="shuffle partitions (default cpus*4)")
    args = ap.parse_args()

    spark = get_spark(
        "frame-scale", master=f"local[{args.cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(args.shuf or args.cpus * 4),
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/spark-graft-shuffle",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic burst stream: xxhash-derived phash, every 4th frame a
    # near-dup of its neighborhood (low-bit perturbation of a shared base)
    frames = spark.range(args.n).select(
        F.col("id").alias("ikey"),
        (F.col("id") / args.seq_len).cast("long").alias("src_part"),
        F.when(
            (F.col("id") % 4) < 3,
            # base hash per 4-frame burst + 0-2 low bits flipped
            F.xxhash64((F.col("id") / 4).cast("long"))
            .bitwiseXOR(F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(id % 3 AS INT)) - 1"
            )),
        ).otherwise(F.xxhash64("id")).alias("ph"),
    )
    w = Window.partitionBy("src_part").orderBy("ikey")
    lagged = frames.select(
        "ikey", "src_part", "ph", F.lag("ph").over(w).alias("prev_ph"),
    )
    ham = F.when(F.col("prev_ph").isNull(), F.lit(None)).otherwise(
        F.bit_count(F.col("ph").bitwiseXOR(F.col("prev_ph")))
    )
    out = lagged.select(
        (ham.isNull() | (ham > F.lit(3))).alias("keep")
    )
    t0 = time.time()
    kept = out.where("keep").count()
    wall = time.time() - t0
    print(json.dumps({
        "n": args.n, "cpus": args.cpus, "seq_len": args.seq_len,
        "wall_s": round(wall, 2),
        "frames_per_s": int(args.n / wall), "kept": kept,
    }))


if __name__ == "__main__":
    main()
