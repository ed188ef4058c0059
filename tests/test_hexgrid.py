"""Hex binning: the assigned hexagon must be the NEAREST hex center
(that is the defining property of cube rounding), ids must round-trip
through the (q, r) packing, and the Spark expression must equal the
DuckDB mirror (same formula text, independent engines)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osm_merge_spark.functions import hexgrid

EDGE = hexgrid.H3_RES9_EDGE_M


def _centers(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pointy-top axial → planar center: x = R√3(q + r/2), y = R·3/2·r."""
    return EDGE * np.sqrt(3.0) * (q + r / 2.0), EDGE * 1.5 * r


def _merc(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    R = 6378137.0
    return (
        R * np.radians(lon),
        R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)),
    )


def test_assignment_is_nearest_center():
    rng = np.random.default_rng(3)
    n = 5000
    lon = rng.uniform(-109.2, -108.2, n)
    lat = rng.uniform(43.4, 44.0, n)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"pid": range(n), "lon": lon, "lat": lat}))
    ids = con.execute(
        f"SELECT CAST({hexgrid.hex_id_sql('lon', 'lat')} AS BIGINT) AS h"
        " FROM pts ORDER BY pid"
    ).df()["h"].to_numpy()
    q = ids // (1 << 26) - (1 << 25)
    r = ids % (1 << 26) - (1 << 25)
    x, y = _merc(lon, lat)
    cx, cy = _centers(q.astype(float), r.astype(float))
    own = np.hypot(x - cx, y - cy)
    # own distance never exceeds the circumradius (= edge length)
    assert own.max() <= EDGE * 1.0001
    # and no neighbor center is strictly closer
    for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
        nx, ny = _centers((q + dq).astype(float), (r + dr).astype(float))
        assert (np.hypot(x - nx, y - ny) >= own - 1e-6).all()


def test_spark_equals_duckdb_and_unpack(spark):
    rng = np.random.default_rng(9)
    n = 2000
    pdf = pd.DataFrame({
        "pid": range(n),
        "lon": rng.uniform(-179, 179, n),
        "lat": rng.uniform(-80, 80, n),
    })
    got = (
        hexgrid.with_hex_id(spark.createDataFrame(pdf))
        .select("pid", "hex_id")
        .toPandas().sort_values("pid")["hex_id"].to_numpy()
    )
    con = duckdb.connect()
    con.register("pts", pdf)
    want = con.execute(
        f"SELECT CAST({hexgrid.hex_id_sql('lon', 'lat')} AS BIGINT) AS h"
        " FROM pts ORDER BY pid"
    ).df()["h"].to_numpy()
    assert (got == want).all()

    # unpack inverts the packing
    df = hexgrid.with_hex_id(spark.createDataFrame(pdf))
    qc, rc = hexgrid.hex_unpack(F.col("hex_id"))
    upk = df.select("pid", qc.alias("q"), rc.alias("r")).toPandas().sort_values("pid")
    assert (upk["q"].to_numpy() == want // (1 << 26) - (1 << 25)).all()
    assert (upk["r"].to_numpy() == want % (1 << 26) - (1 << 25)).all()


def test_cell_size_matches_h3_res9():
    """Mean cell area at the equator ≈ H3 res 9's 0.1053 km²."""
    area_km2 = 1.5 * np.sqrt(3.0) * EDGE**2 / 1e6
    assert abs(area_km2 - 0.1053) < 0.03 * 0.1053
