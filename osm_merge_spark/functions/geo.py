"""Geodesic / planar geometry as native Catalyst column expressions.

Reproduces the scalar geo semantics of the reference (hotosm/osm-merge):
  - haversine meters        (ref: osm_merge/conflatePOI.py:122-124)
  - EPSG:4326→3857 project  (ref: osm_merge/conflator.py:477-495,
                             utilities/tm-splitter.py:88-92)
  - line slope & inter-line angle gates (ref: osm_merge/conflator.py:361-454,
                             formula at :406,:424,:429; thresholds :206-207)
  - ring centroid           (ref: osm_merge/conflatePOI.py:112-113,180-183)

All pure `pyspark.sql.functions` expression trees: they run in whole-stage
codegen with zero Python, and the identical formulas are emitted as ANSI SQL
for the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # mean Earth radius (IUGG)
WEB_MERCATOR_R = 6378137.0  # WGS84 semi-major axis used by EPSG:3857


def dlit(x: float) -> str:
    """Float literal for generated SQL, forced to DOUBLE.

    DuckDB parses plain decimal literals (`0.0015`) as DECIMAL and then does
    exact decimal arithmetic — which diverges from Spark's IEEE-double math
    at cell/tile floor boundaries. E-notation literals are DOUBLE in both
    engines, keeping every generated formula bit-identical to the Catalyst
    expression it mirrors.
    """
    return format(float(x), ".17e")


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters. Pure column math — no UDF.

    Same semantics as the reference's haversine(... METERS) call
    (conflatePOI.py:122-124) and its PostGIS geography ST_Distance pushdowns
    (conflatePOI.py:76,318,365).
    """
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (
        F.pow(F.sin(dlat / F.lit(2.0)), F.lit(2.0))
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / F.lit(2.0)), F.lit(2.0))
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_m_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """The exact same formula as ANSI SQL text, runnable by DuckDB (oracle)."""
    two = dlit(2.0)
    return (
        f"{dlit(2.0 * EARTH_RADIUS_M)} * asin(sqrt("
        f"pow(sin((radians({lat2}) - radians({lat1})) / {two}), {two})"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin((radians({lon2}) - radians({lon1})) / {two}), {two})))"
    )


def mercator_x(lon: Column) -> Column:
    """EPSG:3857 x in meters (ref projects via pyproj to 3857 for all
    planar distance work, conflator.py:477-484; tm-splitter.py:88-92)."""
    return F.lit(WEB_MERCATOR_R) * F.radians(lon)


def mercator_y(lat: Column) -> Column:
    """EPSG:3857 y in meters: R * ln(tan(pi/4 + lat/2))."""
    import math

    return F.lit(WEB_MERCATOR_R) * F.log(
        F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / F.lit(2.0))
    )


def mercator_x_sql(lon: str) -> str:
    return f"{dlit(WEB_MERCATOR_R)} * radians({lon})"


def mercator_y_sql(lat: str) -> str:
    return (
        f"{dlit(WEB_MERCATOR_R)} * ln(tan(pi() / {dlit(4.0)}"
        f" + radians({lat}) / {dlit(2.0)}))"
    )


def line_slope(xs: Column, ys: Column) -> Column:
    """Slope Δy/Δx between a packed linestring's endpoints.

    The reference computes slope between points taken near each end of the
    line (conflator.py:406: `slope = (y2 - y1) / (x2 - x1)`), with NaN→0.
    Division by zero → 0.0 (the reference relies on numpy nan handling).
    """
    n = F.size(xs)
    dy = F.element_at(ys, n) - F.element_at(ys, F.lit(1))
    dx = F.element_at(xs, n) - F.element_at(xs, F.lit(1))
    return F.when(dx == F.lit(0.0), F.lit(0.0)).otherwise(dy / dx)


def angle_between(slope1: Column, slope2: Column) -> Column:
    """Angle in degrees between two lines given their slopes.

    Reference formula (conflator.py:424,429):
        angle = degrees(atan((s2 - s1) / (1 + s2*s1))),  NaN→0
    Gates: |angle| > 20° or |Δslope| > 4.0 rejects a candidate
    (conflator.py:206-207,215).
    """
    denom = F.lit(1.0) + slope1 * slope2
    raw = F.degrees(F.atan((slope2 - slope1) / denom))
    return F.when(F.isnan(raw) | denom.eqNullSafe(F.lit(0.0)), F.lit(0.0)).otherwise(raw)


def point_in_fixed_ring(lon: Column, lat: Column,
                        ring: list[tuple[float, float]]) -> Column:
    """Ray-cast PIP against ONE fixed polygon as a pure Catalyst
    expression — the ring's edges unroll into an XOR-parity sum inside
    whole-stage codegen (no Python, unlike the per-row-ring pandas UDF in
    functions/kernels.py). Same half-open convention as kernels._raycast.
    """
    n = len(ring)
    crossings: Column = F.lit(0)
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[(i - 1) % n]
        if yj == yi:
            # A horizontal edge can never satisfy (yi > lat) XOR (yj > lat):
            # drop it entirely rather than emit the degenerate expression
            # `lit(y) > lat != lit(y) > lat`, which is dead weight in codegen
            # and trips Spark's "trivially true equals predicate" warning.
            continue
        crossing = (F.lit(yi) > lat) != (F.lit(yj) > lat)
        xint = F.lit(xj - xi) * (lat - F.lit(yi)) / F.lit(yj - yi) + F.lit(xi)
        crossings = crossings + F.when(crossing & (lon < xint), F.lit(1)).otherwise(F.lit(0))
    return crossings % 2 == 1


def point_in_fixed_polygon(lon: Column, lat: Column,
                           rings: list[list[tuple[float, float]]]) -> Column:
    """Even-odd PIP against ONE fixed polygon WITH interior rings (holes):
    XOR of per-ring ray casts — a point in a hole crosses the outer ring
    (odd) and the hole ring (odd) → even → outside, matching shapely
    contains (geosupport.py:201-224). rings[0] is the outer ring, the rest
    are holes; a 1-ring list degenerates to point_in_fixed_ring."""
    inside: Column = F.lit(False)
    for ring in rings:
        inside = inside != point_in_fixed_ring(lon, lat, ring)  # boolean XOR
    return inside


def any_vertex_in_fixed_ring(xs: Column, ys: Column,
                             ring: list[tuple[float, float]]) -> Column:
    """True when ANY vertex of a packed line lies inside the fixed ring —
    the `contains` half of the reference's way filter
    (utilities/osmhighways.py:243-253: keep a way when the boundary
    contains OR intersects it)."""
    return F.exists(
        F.sequence(F.lit(1), F.size(xs)),
        lambda i: point_in_fixed_ring(
            F.element_at(xs, i), F.element_at(ys, i), ring
        ),
    )


def segments_cross_fixed_ring(xs: Column, ys: Column,
                              ring: list[tuple[float, float]]) -> Column:
    """True when ANY segment of a packed line PROPERLY crosses ANY edge of
    the fixed ring — the `intersects` half of osmhighways.py:243-253. This
    catches the ways vertex-PIP silently drops: a road passing straight
    through the AOI whose vertices all fall outside.

    Proper-crossing test per (segment, edge): the two endpoints of each
    straddle the other's supporting line (strict orientation-sign products
    < 0). Endpoint-touching contacts are measure-zero for survey data and
    excluded by BOTH engines identically, so the SQL mirror is exact. The
    ring's edges unroll into the exists-lambda — all whole-stage codegen,
    no Python, no explode (the per-way fan-out stays inside one row).

    Guarded for 1-vertex degenerates (sequence(1,0) would descend and
    element_at(_, 0) throws under ANSI); CASE WHEN branches lazily.
    """
    n_edges = len(ring)

    def seg_hits(i: Column) -> Column:
        px, py = F.element_at(xs, i), F.element_at(ys, i)
        qx, qy = F.element_at(xs, i + 1), F.element_at(ys, i + 1)
        hit = F.lit(False)
        for e in range(n_edges):
            ax, ay = ring[e]
            bx, by = ring[(e + 1) % n_edges]
            # orient(P,Q,R) = (Qx-Px)(Ry-Py) - (Qy-Py)(Rx-Px)
            d1 = (qx - px) * (F.lit(ay) - py) - (qy - py) * (F.lit(ax) - px)
            d2 = (qx - px) * (F.lit(by) - py) - (qy - py) * (F.lit(bx) - px)
            d3 = (F.lit(bx - ax)) * (py - F.lit(ay)) - (F.lit(by - ay)) * (px - F.lit(ax))
            d4 = (F.lit(bx - ax)) * (qy - F.lit(ay)) - (F.lit(by - ay)) * (qx - F.lit(ax))
            hit = hit | ((d1 * d2 < F.lit(0.0)) & (d3 * d4 < F.lit(0.0)))
        return hit

    return F.when(
        F.size(xs) >= F.lit(2),
        F.exists(F.sequence(F.lit(1), F.size(xs) - 1), seg_hits),
    ).otherwise(F.lit(False))


def point_in_fixed_ring_sql(lon: str, lat: str,
                            ring: list[tuple[float, float]]) -> str:
    """ANSI-SQL mirror of point_in_fixed_ring (same edge order, same
    half-open crossing convention) for the DuckDB oracles."""
    n = len(ring)
    terms = []
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[(i - 1) % n]
        terms.append(
            f"(CASE WHEN (({dlit(yi)} > {lat}) != ({dlit(yj)} > {lat})) THEN"
            f" (CASE WHEN {lon} < (({dlit(xj)} - {dlit(xi)}) * ({lat} - {dlit(yi)})"
            f" / ({dlit(yj)} - {dlit(yi)}) + {dlit(xi)}) THEN 1 ELSE 0 END)"
            " ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def segment_crosses_fixed_ring_sql(px: str, py: str, qx: str, qy: str,
                                   ring: list[tuple[float, float]]) -> str:
    """ANSI-SQL mirror of segments_cross_fixed_ring's per-segment test:
    OR over the ring's edges of the strict proper-crossing predicate."""
    n = len(ring)
    clauses = []
    for e in range(n):
        ax, ay = ring[e]
        bx, by = ring[(e + 1) % n]
        d1 = f"(({qx} - {px}) * ({dlit(ay)} - {py}) - ({qy} - {py}) * ({dlit(ax)} - {px}))"
        d2 = f"(({qx} - {px}) * ({dlit(by)} - {py}) - ({qy} - {py}) * ({dlit(bx)} - {px}))"
        d3 = f"({dlit(bx - ax)} * ({py} - {dlit(ay)}) - {dlit(by - ay)} * ({px} - {dlit(ax)}))"
        d4 = f"({dlit(bx - ax)} * ({qy} - {dlit(ay)}) - {dlit(by - ay)} * ({qx} - {dlit(ax)}))"
        clauses.append(f"({d1} * {d2} < 0 AND {d3} * {d4} < 0)")
    return "(" + " OR ".join(clauses) + ")"


def ring_area(xs: Column, ys: Column) -> Column:
    """Shoelace area of a packed ring in squared input units (T4:
    tm-splitter.py:181-184 drops polygons with shapely .area < 1e-5 —
    same deg² quantity). Wrapping index handles open and closed rings;
    the fold is strict left-to-right so a SQL mirror is bit-exact."""
    n = F.size(xs)
    # translate to the first vertex before the cross products: raw
    # lon/lat shoelace terms are ~1e4 in magnitude while sliver areas are
    # ~1e-9 — catastrophic cancellation loses 4+ digits of the result.
    x1, y1 = F.element_at(xs, 1), F.element_at(ys, 1)

    def nxt(i):
        return F.when(i == n, F.lit(1)).otherwise(i + 1)

    terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (F.element_at(xs, i) - x1) * (F.element_at(ys, nxt(i)) - y1)
        - (F.element_at(xs, nxt(i)) - x1) * (F.element_at(ys, i) - y1),
    )
    return F.abs(
        F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)
    ) / F.lit(2.0)


def tiny_polygon_filter(df, xs: str = "xs", ys: str = "ys",
                        min_area: float = 1e-5):
    """T4: drop administrative-sliver polygons below min_area deg²
    (tm-splitter.py:181-184)."""
    return df.filter(ring_area(F.col(xs), F.col(ys)) >= F.lit(min_area))


def ring_centroid_x(xs: Column) -> Column:
    """Vertex-average centroid x of a packed ring (ref uses shapely
    .centroid, conflatePOI.py:112-113; vertex average is the documented
    approximation — exactness not required by any downstream gate)."""
    return F.aggregate(xs, F.lit(0.0), lambda acc, v: acc + v) / F.size(xs)


def ring_centroid_y(ys: Column) -> Column:
    return F.aggregate(ys, F.lit(0.0), lambda acc, v: acc + v) / F.size(ys)
