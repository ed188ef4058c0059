"""DBSCAN classification throughput at two parallelism levels — the
north-rule N→4N scaling evidence for the density operator family
(operators/density.dbscan_classify), matching the protocol of §6-§7 in
BASELINE.md: same materialized input, same plan, local[8] vs local[32],
warmup + min-of-reps, throughput ratio / 4 = efficiency.

Fixture: n points, 90% in 8-point micro-clusters (centers hash-spread over
the AOI-sized box, offsets ±~4 m so clusters straddle the eps=7 m gate and
all three roles occur) + 10% uniform noise. Deliberately NO planted hot
cell: a single O(k²) blob measures the skew ladder (bench'd elsewhere via
cell_join's salting), not the operator's linear-region scaling, and at
n=10^7 a 5% blob would be 10^11 intra-cell pairs — the regime the salting
doctrine exists to split, pointless to time here.

Usage:
  python scripts/dbscan_scale.py --n 16000000 --cpus 8  --table /dev/shm/dbs
  python scripts/dbscan_scale.py --n 16000000 --cpus 32 --table /dev/shm/dbs
Prints one JSON line per run for BASELINE.md §7.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLUSTER = 8          # points per micro-cluster
NOISE_MOD = 10       # i % NOISE_MOD == NOISE_MOD-1 → uniform noise point
EPS_M = 7.0
MIN_PTS = 4

_A = 2654435761   # lon-axis multiplicative hash
_B = 2246822519   # lat-axis — a DIFFERENT multiplier: with one multiplier,
                  # u01(i, s2) is a constant shift of u01(i, s1) mod 1, so
                  # "uniform" (lon, lat) pairs collapse onto one dense line
                  # across the box (measured: every noise point became core)
_M = 1000003
LON_MIN, LON_MAX = -109.2, -108.2
LAT_MIN, LAT_MAX = 43.4, 44.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--table", default="/dev/shm/dbscan-scale")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osm_merge_spark.operators.density import dbscan_classify
    from osm_merge_spark.session import get_spark

    spark = get_spark(
        "dbscan-scale", master=f"local[{args.cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(args.cpus * 4),
            "spark.driver.memory": f"{max(8, args.cpus * 2)}g",
            "spark.local.dir": "/dev/shm/spark-graft-shuffle",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # row count baked into the path (BASELINE r4 advice: a rerun with a
    # different --n must never silently time stale data)
    src = f"{args.table}/positions_{args.n}"
    if not os.path.exists(src):
        i = F.col("id")

        def u01(k, salt, mult=_A):
            return (
                (k.cast("long") * F.lit(mult) + F.lit(salt * 7919)) % F.lit(_M)
            ).cast("double") / F.lit(float(_M))

        c = (i / F.lit(CLUSTER)).cast("long")
        clon = F.lit(LON_MIN) + u01(c, 21) * F.lit(LON_MAX - LON_MIN)
        clat = F.lit(LAT_MIN) + u01(c, 22, _B) * F.lit(LAT_MAX - LAT_MIN)
        # ±~4 m offsets (7e-5 deg spread) — clusters straddle the eps gate
        lon = clon + (u01(i, 23) - F.lit(0.5)) * F.lit(7.0e-5)
        lat = clat + (u01(i, 24, _B) - F.lit(0.5)) * F.lit(7.0e-5)
        noise = (i % F.lit(NOISE_MOD)) == F.lit(NOISE_MOD - 1)
        ulon = F.lit(LON_MIN) + u01(i, 25) * F.lit(LON_MAX - LON_MIN)
        ulat = F.lit(LAT_MIN) + u01(i, 26, _B) * F.lit(LAT_MAX - LAT_MIN)
        (
            spark.range(args.n)
            .select(
                i.alias("pid"),
                F.when(noise, ulon).otherwise(lon).alias("lon"),
                F.when(noise, ulat).otherwise(lat).alias("lat"),
            )
            .write.mode("overwrite").parquet(src)
        )

    got = spark.read.parquet(src).count()
    assert got == args.n, f"stale table: {got} rows != --n {args.n}"

    def plan():
        pts = spark.read.parquet(src)
        return (
            dbscan_classify(
                pts, eps_m=EPS_M, min_pts=MIN_PTS, key="pid",
                max_abs_lat=45.0,
            )
            .groupBy("role")
            .agg(F.count("*").alias("n"), F.sum("n_eps").alias("s"))
        )

    roles = {r["role"]: r["n"] for r in plan().collect()}  # warmup
    walls = []
    for _ in range(args.reps):
        p = plan()
        t0 = time.perf_counter()
        p.collect()
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    print(json.dumps({
        "metric": "dbscan_classify wall time (eps-graph + roles)",
        "n_rows": args.n,
        "cpus": args.cpus,
        "roles": {str(k): v for k, v in sorted(roles.items())},
        "wall_sec": round(best, 2),
        "all_walls": [round(w, 2) for w in walls],
        "throughput_rows_per_sec": round(args.n / best),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
