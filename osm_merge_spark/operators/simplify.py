"""Polyline simplification over packed coordinate arrays — pure Catalyst.

The reference simplifies geometry driver-side with shapely before writing
task tiles (osm_merge/utilities/ fieldwork prep keeps geometries small for
ODK/JOSM payloads). At 10^12 ways a driver loop is impossible; the engine
needs simplification as a distributed projection.

Spark-first design: a single-pass Visvalingam–Whyatt filter. Classic VW
iteratively removes the globally-smallest-area vertex and recomputes — an
inherently sequential loop. The one-pass variant used here keeps a vertex
iff it is an endpoint or the triangle it forms with its immediate
neighbours has area ≥ eps (the first VW sweep, equivalently a local
collinearity test). That drops every vertex whose removal displaces the
line by < ~eps/segment-length while compiling to ONE codegen'd projection
over the packed arrays:

    kept = filter(sequence(1, n), i -> i=1 OR i=n OR area(i) >= eps)
    xs'  = transform(kept, i -> xs[i])

— no explode, no shuffle, no Python, no per-way driver work. The whole
operator is `F.filter`/`F.transform` array intrinsics (WholeStageCodegen),
and the DuckDB oracle mirrors it with list_filter/list_transform
bit-identically (areas are IEEE doubles computed in the same operation
order).

Projection: triangle areas are measured in m² after an equirectangular
scaling (mx, my) = meters-per-degree at the dataset's latitude band,
passed in as literals (no per-row trig — cos() last-ulp behaviour differs
between JVM StrictMath and C libm, which would break oracle bit-equality).
For a global dataset, call once per latitude band or pass my=111320,
mx=cos(lat_band)·111320 from the partition value.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# meters per degree at the fixture's ~43.7°N band (cos(43.7°)≈0.723)
MX = 80480.0
MY = 110574.0


def _tri_area_m2(xs: Column, ys: Column, i: Column, mx: float, my: float) -> Column:
    """Area of the triangle (p[i-1], p[i], p[i+1]), 1-based index i."""
    x1 = F.element_at(xs, i - 1) * F.lit(mx)
    y1 = F.element_at(ys, i - 1) * F.lit(my)
    x2 = F.element_at(xs, i) * F.lit(mx)
    y2 = F.element_at(ys, i) * F.lit(my)
    x3 = F.element_at(xs, i + 1) * F.lit(mx)
    y3 = F.element_at(ys, i + 1) * F.lit(my)
    return F.abs(
        (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    ) * F.lit(0.5)


def kept_indices(xs: Column, ys: Column, eps_m2: float,
                 mx: float = MX, my: float = MY) -> Column:
    """1-based indices of the vertices the one-pass VW filter keeps."""
    n = F.size(xs)
    return F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1) | (i == n)
        | (_tri_area_m2(xs, ys, i, mx, my) >= F.lit(eps_m2)),
    )


def simplify(xs: Column, ys: Column, eps_m2: float,
             mx: float = MX, my: float = MY) -> tuple[Column, Column, Column]:
    """(kept_idx, xs', ys') — simplified packed polyline."""
    kept = kept_indices(xs, ys, eps_m2, mx, my)
    xs2 = F.transform(kept, lambda i: F.element_at(xs, i))
    ys2 = F.transform(kept, lambda i: F.element_at(ys, i))
    return kept, xs2, ys2


# --- DuckDB mirrors ----------------------------------------------------------
def _tri_area_m2_sql(xs: str, ys: str, i: str, mx: float, my: float) -> str:
    from ..functions.geo import dlit

    x1 = f"({xs}[{i} - 1] * {dlit(mx)})"
    y1 = f"({ys}[{i} - 1] * {dlit(my)})"
    x2 = f"({xs}[{i}] * {dlit(mx)})"
    y2 = f"({ys}[{i}] * {dlit(my)})"
    x3 = f"({xs}[{i} + 1] * {dlit(mx)})"
    y3 = f"({ys}[{i} + 1] * {dlit(my)})"
    return (
        f"(abs(({x2} - {x1}) * ({y3} - {y1})"
        f" - ({x3} - {x1}) * ({y2} - {y1})) * {dlit(0.5)})"
    )


def kept_indices_sql(xs: str, ys: str, eps_m2: float,
                     mx: float = MX, my: float = MY) -> str:
    from ..functions.geo import dlit

    area = _tri_area_m2_sql(xs, ys, "i", mx, my)
    return (
        f"list_filter(range(1, len({xs}) + 1),"
        f" i -> i = 1 OR i = len({xs}) OR {area} >= {dlit(eps_m2)})"
    )


# --- Douglas–Peucker (full, iterative) ---------------------------------------
# The classic max-deviation simplifier: recursively keep the vertex farthest
# from the current chord while it deviates more than eps. Unlike the VW
# one-pass above, DP gives a hard guarantee — every dropped vertex lies
# within eps meters of the SIMPLIFIED line — but the recursion is inherently
# sequential per feature, so it genuinely cannot be a Catalyst expression.
# This is the engine's designated slow path done right: an Arrow-batched
# pandas UDF (numpy stack loop per polyline, no per-row Python boxing), a
# pure per-row projection — no shuffle, scales embarrassingly at 10^12 ways.
# The reference reaches the same operation through shapely's
# geometry.simplify (GEOS DP) when preparing small fieldwork payloads.
def dp_keep_mask(x, y, eps: float, max_depth: int | None = None):
    """numpy reference DP: boolean keep-mask over one polyline (meters).

    max_depth=None is classic unbounded DP. A fixed max_depth bounds the
    recursion (an interval at depth d splits only while d < max_depth) —
    the depth-limited contract the DuckDB recursive-CTE oracle replays
    exactly (queries/geo5.py). Expression forms mirror that SQL: the
    degenerate-chord branch is sqrt(px²+py²), not np.hypot (hypot rounds
    differently and would break oracle bit-equality if ever hit)."""
    import numpy as np

    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1, 0)]
    while stack:
        i, j, depth = stack.pop()
        if j <= i + 1 or (max_depth is not None and depth >= max_depth):
            continue
        dx, dy = x[j] - x[i], y[j] - y[i]
        seg2 = dx * dx + dy * dy
        px, py = x[i + 1:j] - x[i], y[i + 1:j] - y[i]
        if seg2 == 0.0:
            d = np.sqrt(px * px + py * py)
        else:
            d = np.abs(px * dy - py * dx) / np.sqrt(seg2)
        k = int(d.argmax())
        if d[k] > eps:
            ki = i + 1 + k
            keep[ki] = True
            stack.append((i, ki, depth + 1))
            stack.append((ki, j, depth + 1))
    return keep


def dp_kept_indices_udf(eps_m: float, mx: float = MX, my: float = MY,
                        max_depth: int | None = None):
    """pandas_udf (array<double>, array<double>) -> array<int> of 1-based
    kept indices under Douglas–Peucker with tolerance eps_m meters
    (optionally depth-limited — see dp_keep_mask)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _dp(xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(xs, ys):
            x = np.asarray(x, dtype=np.float64) * mx
            y = np.asarray(y, dtype=np.float64) * my
            if len(x) <= 2:
                out.append(list(range(1, len(x) + 1)))
                continue
            keep = dp_keep_mask(x, y, eps_m, max_depth)
            out.append((np.flatnonzero(keep) + 1).tolist())
        return pd.Series(out)

    return _dp
