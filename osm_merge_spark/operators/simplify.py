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
