"""Benchmark harness (driver contract + scaling evidence).

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "rows": {...}}

--scaling: run the same workload in two subprocesses at local[8] and
local[32] (the sandbox stand-in for N vs 4N executor clusters) and print
throughput at both plus scaling efficiency; results belong in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tile_assign",
    "cell_stats",
    "dist_join",
    "conflate_best",
    "conflate_new",
    "aoi_clip",
    "dedup_minhash_pairs",
    "ann_cosine_topk",
]


def _sf_label(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_once(sf_dir: str, cpus: str) -> dict:
    from osm_merge_spark.session import get_spark

    import __spark_entry__ as contract

    spark = get_spark("osm-merge-spark-bench", master=f"local[{cpus}]")
    qs = contract.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    total_rows = 0
    for name in HEADLINE:
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        rows[name] = n
        total_rows += n
    return {
        "metric": "headline suite wall time (conflation join + tiling + dedup/ann)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(sf_dir),
        "rows": rows,
        "cpus": cpus,
    }


def run_scaling(sf_dir: str, levels: tuple[str, str] = ("8", "32")) -> dict:
    """Same job at two parallelism levels via fresh subprocesses (clean JVM
    per level). Efficiency = (thr_hi / thr_lo) / (cores_hi / cores_lo)."""
    results = {}
    for cpus in levels:
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    lo, hi = levels
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    speedup = t_lo / t_hi if t_hi > 0 else float("inf")
    eff = speedup / (int(hi) / int(lo))
    return {
        "metric": "scaling efficiency local[%s] -> local[%s]" % (lo, hi),
        "sf": results[lo]["sf"],
        "wall_sec": {lo: t_lo, hi: t_hi},
        "queries": {c: results[c]["queries"] for c in levels},
        "speedup": round(speedup, 3),
        "cores_ratio": int(hi) / int(lo),
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        print(json.dumps(run_once(sf_dir, cpus)))
