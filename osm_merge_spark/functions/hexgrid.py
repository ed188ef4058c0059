"""Hexagonal spatial binning — the H3-res-9 analog of the cell index.

The north rule names "H3 res-9 / S2 level-13" encodings. Canonical S2 is
implemented exactly (functions/s2.py); canonical H3 needs the icosahedral
gnomonic projection + aperture-7 rotated subdivision, which cannot be
reproduced bit-for-bit without the published base-cell tables — so this
module is the honest substitute: a regular pointy-top hexagon grid over
web-mercator meters with H3-res-9-sized cells (edge chosen so mean
cell area equals H3 res 9's 0.1053 km²), implemented as pure Catalyst
arithmetic with an exact DuckDB SQL mirror. Hexagons keep H3's two
desirable properties over squares: uniform 6-neighborhoods (no diagonal
ambiguity) and lower perimeter/area (tighter density kernels), which is
what downstream per-cell density/rollup stats actually consume.

Axial-coordinate hex assignment (standard public construction):
  fractional axial  q = (√3/3·x − 1/3·y)/R,  r = (2/3·y)/R
  cube rounding: round q/r/s=−q−r to nearest ints, fix the axis with the
  largest rounding error so q+r+s == 0 (branchy CASE — identical text in
  both engines).

The hex id packs (q, r) into one int64: (q + 2^25)·2^26 + (r + 2^25) —
collision-free for |q|,|r| < 2^25 (±5.6e9 km at res-9 size: the whole
planet with 8 orders of margin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import geo

# H3 res 9: mean hexagon area 0.1053 km². A REGULAR hex of that area has
# edge √(A·2/(3√3)) ≈ 201.3 m (H3's published 174 m edge belongs to its
# slightly irregular icosahedral hexes). Matching mean area — the quantity
# per-cell density statistics actually normalize by — is the faithful
# calibration for a regular-grid substitute.
H3_RES9_EDGE_M = 201.3

_OFF = 1 << 25
_PACK = 1 << 26


def _axial_exprs(x: str, y: str, edge_m: float) -> tuple[str, str]:
    """Fractional axial (q, r) from planar meters, as engine-neutral SQL
    text. Every fractional constant goes through dlit(): a bare `2.0/3.0`
    parses as DECIMAL division in BOTH engines, with different scales —
    observed as a 5e-7 relative drift that moved 1% of points across hex
    boundaries."""
    import math

    s3_3 = geo.dlit(math.sqrt(3.0) / 3.0)
    third = geo.dlit(1.0 / 3.0)
    two3 = geo.dlit(2.0 / 3.0)
    q = f"((({x}) * {s3_3} - ({y}) * {third}) / {geo.dlit(edge_m)})"
    r = f"((({y}) * {two3}) / {geo.dlit(edge_m)})"
    return q, r


def _round_exprs(qf: str, rf: str) -> tuple[str, str]:
    """Cube rounding (Redblobgames' canonical algorithm): round all three
    cube coords, re-derive the worst-rounded axis. floor(v+0.5) is the
    deterministic half-up round both engines share (DuckDB round() is
    half-away, Spark bround() half-even — avoid both)."""
    sf = f"(-({qf}) - ({rf}))"
    rq = f"CAST(floor({qf} + 0.5) AS BIGINT)"
    rr = f"CAST(floor({rf} + 0.5) AS BIGINT)"
    rs = f"CAST(floor({sf} + 0.5) AS BIGINT)"
    dq = f"abs({rq} - ({qf}))"
    dr = f"abs({rr} - ({rf}))"
    ds = f"abs({rs} - ({sf}))"
    q = (
        f"(CASE WHEN {dq} > {dr} AND {dq} > {ds}"
        f" THEN -({rr}) - ({rs}) ELSE {rq} END)"
    )
    r = (
        f"(CASE WHEN NOT ({dq} > {dr} AND {dq} > {ds}) AND {dr} > {ds}"
        f" THEN -({rq}) - ({rs}) ELSE {rr} END)"
    )
    return q, r


def hex_id_sql(lon: str, lat: str, edge_m: float = H3_RES9_EDGE_M) -> str:
    """Packed hex id over mercator meters — one SQL string, parsed by both
    Spark (F.expr) and DuckDB; trig risk limited to the shared mercator_y
    (tan/log — the same accepted oracle risk as every tile query)."""
    x = geo.mercator_x_sql(lon)
    y = geo.mercator_y_sql(lat)
    qf, rf = _axial_exprs(x, y, edge_m)
    q, r = _round_exprs(qf, rf)
    return f"(({q} + {_OFF}) * {_PACK} + ({r} + {_OFF}))"


def with_hex_id(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    edge_m: float = H3_RES9_EDGE_M,
    out: str = "hex_id",
) -> DataFrame:
    return df.withColumn(out, F.expr(hex_id_sql(lon, lat, edge_m)).cast("long"))


def hex_unpack(hex_col: Column) -> tuple[Column, Column]:
    """Recover (q, r) axial ints from a packed id (for neighbor math:
    the 6 neighbors of (q,r) are (q±1,r), (q,r±1), (q+1,r−1), (q−1,r+1))."""
    # ids are < 2^51, so the double quotient q + r/2^26 is exact (≤51
    # mantissa bits) and floor recovers q precisely
    q = F.floor(hex_col / F.lit(_PACK)).cast("long") - F.lit(_OFF)
    r = (hex_col % F.lit(_PACK)).cast("long") - F.lit(_OFF)
    return q, r
