"""North-rule scaling probe for a compute-dense ENGINE operator.

BASELINE.md §5 established that the end-to-end conflation job's 8→32
scaling (0.62) equals the single socket's memory-bus scaling (0.62), while
a pure-compute numpy probe reaches 3.95×. This script closes the remaining
gap in that argument with a real engine operator instead of a numpy loop:
PQ encode (operators/pq.py) is a codegen'd projection doing ~1k flops per
row over data it reads once — high arithmetic intensity, minimal bus
traffic — so if the ENGINE (scheduler, codegen, Python driver, task
dispatch) had a hidden serial term, it would show here. Protocol is
identical to scripts/scaling_bench.py: per-level pinned subprocess
(taskset), same parquet input for both levels, fresh plan per rep, warmup
+ min-of-reps.

Usage:
    python scripts/pq_scaling.py --n 8000000 --levels 8,32 --reps 3
Prints one JSON line: {"n": .., "levels": {..}, "speedup": .., "efficiency": ..}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64


def _synth(n: int, path: str) -> None:
    """n deterministic 64-d vectors, written once; both levels read it."""
    from pyspark.sql import functions as F

    from osm_merge_spark.session import get_spark

    spark = get_spark("pq-scaling-synth", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    a, m = 2654435761, 1000003
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda d: (
                ((F.col("id") * F.lit(DIM) + d) * F.lit(a) % F.lit(m))
                .cast("double") / F.lit(float(m)) - F.lit(0.5)
            ).cast("float"),
        ).alias("embedding"),
    )
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def _worker(args) -> None:
    from pyspark.sql import functions as F

    from osm_merge_spark.operators import pq
    from osm_merge_spark.session import get_spark

    shm = "/dev/shm/spark-pq-scaling-tmp"
    os.makedirs(shm, exist_ok=True)
    spark = get_spark(
        f"pq-scaling-{args.cores}",
        master=f"local[{args.cores}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(args.cores * 4),
            "spark.driver.memory": f"{max(8, args.cores)}g",
            "spark.local.dir": shm,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cb = pq.codebook()

    def run() -> tuple[float, int]:
        t0 = time.time()
        emb = spark.read.parquet(args.input)
        codes = emb.select(
            pq.pq_encode_udf(cb)(F.col("embedding")).alias("code")
        )
        # force full evaluation of every code; flat element_at sum keeps
        # the checksum itself codegen'd (no per-row interpreted fold)
        row_sum = None
        for mi in range(pq.M_SUB):
            t = F.element_at("code", mi + 1).cast("long")
            row_sum = t if row_sum is None else row_sum + t
        out = codes.agg(F.sum(row_sum).alias("s")).collect()[0]["s"]
        return time.time() - t0, int(out)

    run()  # warmup
    spark.sparkContext._jvm.System.gc()
    walls, chk = [], 0
    for _ in range(args.reps):
        w, chk = run()
        walls.append(w)
        spark.sparkContext._jvm.System.gc()
    best = min(walls)
    print(json.dumps({
        "cores": args.cores, "wall_s": round(best, 2),
        "walls": [round(w, 2) for w in walls], "checksum": chk,
        "throughput_vec_s": round(args.n / best),
    }))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_000_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--input", default=None)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    if args.worker:
        _worker(args)
        return 0

    levels = [int(x) for x in args.levels.split(",")]
    tmp = args.input or tempfile.mkdtemp(prefix="pq_scaling_input_")
    own_tmp = args.input is None
    try:
        if own_tmp or not os.path.exists(tmp):
            print(f"synthesizing n={args.n} → {tmp}", file=sys.stderr)
            _synth(args.n, tmp)
        results: dict[str, dict] = {}
        for cores in levels:
            cmd = [
                "taskset", "-c", f"0-{cores - 1}",
                sys.executable, os.path.abspath(__file__),
                "--worker", "--cores", str(cores), "--n", str(args.n),
                "--reps", str(args.reps), "--input", tmp,
            ]
            print(f"running pinned local[{cores}] ...", file=sys.stderr)
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 cwd=REPO, check=True)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            results[str(cores)] = json.loads(line)
            print(line, file=sys.stderr)
        lo, hi = str(min(levels)), str(max(levels))
        assert results[lo]["checksum"] == results[hi]["checksum"], \
            "levels disagree on results"
        speed = (results[hi]["throughput_vec_s"]
                 / results[lo]["throughput_vec_s"])
        factor = max(levels) / min(levels)
        print(json.dumps({
            "n": args.n, "levels": results,
            "speedup": round(speed, 2),
            "efficiency": round(speed / factor, 2),
        }))
    finally:
        if own_tmp:
            shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
