"""Plan-shape audit over the whole query registry.

For every `queries()` entry, compile the physical plan at a given sf dir and
flag scale anti-patterns: SortMergeJoin (two needless full sorts on hash
keys), CartesianProduct, and count Exchanges / Sorts / broadcast joins.
This is the tool that caught the banded-join SMJ (fixed with shuffle_hash
hints — BASELINE.md §5.9); run it after adding any join.

Usage: python scripts/plan_audit.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from osm_merge_spark.session import get_spark  # noqa: E402

# Named waivers: queries whose flagged construct is PROVEN bounded by a
# data-independent quantity (each must cite the pinning test). A waiver is
# not an exemption from review — the audit still prints the flag, it just
# doesn't count it against the run.
WAIVED = {
    # lattice-bounded cartesian over row-extreme candidates: ≤ 2·|y-lattice|
    # rows (NOT corpus rows) feed the all-triples test — bound pinned by
    # tests/test_hull_cells.py::test_candidate_bound_is_lattice_not_corpus
    "hull_cells": "CARTESIAN",
    # rank window over the per-tile count table: input is raster-bounded
    # (≤ box-area/tile² cells, NOT corpus rows) — bound pinned by
    # tests/test_dbscan.py::test_coverage_gini_raster_bound_and_range
    "coverage_gini": "NOPART-WINDOW",
}


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    spark = get_spark("plan-audit", master="local[8]")
    qs = contract.queries()
    names = args or sorted(qs)
    flagged = 0
    for name in names:
        try:
            plan = (
                qs[name](spark, sf)._jdf.queryExecution()
                .executedPlan().toString()
            )
        except Exception as exc:  # surface, keep auditing
            print(f"{name:24s} ERROR {type(exc).__name__}: {exc}")
            flagged += 1
            continue
        smj = "SortMergeJoin" in plan
        cart = "CartesianProduct" in plan
        # a windowspecdefinition whose FIRST argument is already an
        # ordering (ASC/DESC) has no partition columns — the
        # single-partition WindowExec Spark itself warns about
        nopart = bool(re.search(
            r"windowspecdefinition\([^(),]*\s(?:ASC|DESC)\sNULLS", plan
        ))
        n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
        n_sort = len(re.findall(r"\bSort \[", plan))
        n_bc = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoop", plan))
        flags = (("SMJ " if smj else "") + ("CARTESIAN " if cart else "")
                 + ("NOPART-WINDOW" if nopart else ""))
        waived = flags.strip() and WAIVED.get(name) == flags.strip()
        if (smj or cart or nopart) and not waived:
            flagged += 1
        if waived:
            flags += "(waived: bounded, see WAIVED)"
        print(f"{name:24s} exchanges={n_ex} sorts={n_sort}"
              f" bcast={n_bc} {flags}")
    print(f"\n{flagged} flagged / {len(names)} audited")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
