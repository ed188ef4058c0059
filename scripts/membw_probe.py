"""Memory-bandwidth saturation probe (north-rule evidence, BASELINE.md §4).

Measures sustained aggregate copy bandwidth (numpy memcpy of a 256 MiB
array, far beyond L3) at k = 1, 4, 8, 16, 32 pinned worker processes.
On a real N-node vs 4N-node cluster, aggregate memory bandwidth grows 4×
with the node count; in this sandbox both simulated "clusters" share ONE
socket's memory controllers. If aggregate GB/s stops growing past some
core count, every byte-streaming stage (the candidate join, shuffles,
Arrow transfers) is capped by a resource a real cluster scales and this
sandbox cannot — which is exactly the decomposition the scaling table
must be read against.

Usage: python scripts/membw_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

ARR_BYTES = 256 * 1024 * 1024  # 8x the 260 MiB L3 across 32 workers? no -
# each worker owns src+dst of 256 MiB: working set 512 MiB/worker, far
# beyond any cache level; traffic is 2 bytes moved per byte copied (read
# + write, ignoring write-allocate) - we report copied GB/s, a lower
# bound on bus traffic.
SECONDS = 3.0


def _worker(cpu: int, q: "mp.Queue[float]") -> None:
    import numpy as np

    os.sched_setaffinity(0, {cpu})
    src = np.ones(ARR_BYTES // 8, dtype=np.float64)
    dst = np.empty_like(src)
    # warmup (page faults, TLB)
    np.copyto(dst, src)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECONDS:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    q.put(n * ARR_BYTES / dt)


def measure(k: int) -> float:
    q: "mp.Queue[float]" = mp.Queue()
    procs = [mp.Process(target=_worker, args=(cpu, q)) for cpu in range(k)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total


def main() -> None:
    out = {}
    for k in (1, 4, 8, 16, 32):
        gbs = measure(k) / 1e9
        out[str(k)] = round(gbs, 1)
    base = out["1"]
    print(json.dumps({
        "metric": "aggregate copy bandwidth by pinned core count",
        "unit": "GB/s copied (bus traffic >= 2x this)",
        "cores": out,
        "scaling_vs_1core": {k: round(v / base, 2) for k, v in out.items()},
    }))


if __name__ == "__main__":
    main()
