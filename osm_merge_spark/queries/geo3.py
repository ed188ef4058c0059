"""Web-mercator slippy-map tile addressing (quadkey), round-3 batch 2.

The engine's TileGrid (functions/cells.py) is the reference's arbitrary-
size EPSG:3857 tiling (tm-splitter.py); quadkeys are the other tile-id
convention a raster<->vector pipeline meets in the wild (Bing/slippy XYZ
with the z-prefix property: a tile's ancestor at zoom z' is its quadkey's
first z' characters). Encoding is pure floor arithmetic over the proven
mercator_x/mercator_y helpers plus 13 codegen'd shift-and-mask digits —
no UDF, no shuffle beyond the final count.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo
from . import base

QK_ZOOM = 13
_N = 1 << QK_ZOOM
_WORLD = 2.0 * math.pi * geo.WEB_MERCATOR_R
_HALF = _WORLD / 2.0


def _tile_x(lon: Column, zoom: int = QK_ZOOM) -> Column:
    n = 1 << zoom
    fx = (geo.mercator_x(lon) + F.lit(_HALF)) / F.lit(_WORLD)
    return F.least(
        F.greatest(F.floor(fx * F.lit(float(n))), F.lit(0)), F.lit(n - 1)
    )


def _tile_y(lat: Column, zoom: int = QK_ZOOM) -> Column:
    n = 1 << zoom
    fy = (F.lit(_HALF) - geo.mercator_y(lat)) / F.lit(_WORLD)
    return F.least(
        F.greatest(F.floor(fy * F.lit(float(n))), F.lit(0)), F.lit(n - 1)
    )


def quadkey(lon: Column, lat: Column, zoom: int = QK_ZOOM) -> Column:
    """Bing quadkey string at `zoom` — digit i (MSB first) interleaves bit
    (zoom-1-i) of the tile x/y indices. 2*zoom shift-and-mask ops, all
    inside WholeStageCodegen."""
    xt, yt = _tile_x(lon, zoom), _tile_y(lat, zoom)
    digits = [
        (
            F.shiftright(xt, i).bitwiseAND(F.lit(1))
            + F.shiftright(yt, i).bitwiseAND(F.lit(1)) * F.lit(2)
        ).cast("string")
        for i in range(zoom - 1, -1, -1)
    ]
    return F.concat(*digits)


def _tile_x_sql(lon: str) -> str:
    fx = f"(({geo.mercator_x_sql(lon)}) + {geo.dlit(_HALF)}) / {geo.dlit(_WORLD)}"
    return (f"least(greatest(CAST(floor(({fx}) * {geo.dlit(float(_N))})"
            f" AS BIGINT), 0), {_N - 1})")


def _tile_y_sql(lat: str) -> str:
    fy = f"({geo.dlit(_HALF)} - ({geo.mercator_y_sql(lat)})) / {geo.dlit(_WORLD)}"
    return (f"least(greatest(CAST(floor(({fy}) * {geo.dlit(float(_N))})"
            f" AS BIGINT), 0), {_N - 1})")


def quadkey_sql(xt: str, yt: str, zoom: int = QK_ZOOM) -> str:
    digits = " || ".join(
        f"CAST((({xt} >> {i}) & 1) + 2 * (({yt} >> {i}) & 1) AS VARCHAR)"
        for i in range(zoom - 1, -1, -1)
    )
    return f"({digits})"


# quadkey_stats: images → zoom-13 quadkey → per-tile counts, with the zoom-10
# ancestor emitted as a pure prefix (string head — no re-encode, the property
# that makes quadkeys a hierarchy-friendly partition key at 10^12 rows).
QK_PARENT = 10


def q_quadkey_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    img = base.images_df(spark, sf_dir)
    return (
        img.select(quadkey(F.col("lon"), F.col("lat")).alias("quadkey"))
        .groupBy("quadkey")
        .agg(F.count("*").alias("n_images"))
        .select(
            "quadkey",
            F.substring("quadkey", 1, QK_PARENT).alias("parent_z10"),
            "n_images",
        )
    )


def _sql_quadkey_stats() -> str:
    qk = quadkey_sql("xt", "yt")
    return (
        f"WITH img AS ({base.IMAGES_SQL}), "
        f"t AS (SELECT {_tile_x_sql('lon')} AS xt, {_tile_y_sql('lat')} AS yt"
        " FROM img), "
        f"g AS (SELECT {qk} AS quadkey, count(*) AS n_images FROM t GROUP BY 1) "
        f"SELECT quadkey, substr(quadkey, 1, {QK_PARENT}) AS parent_z10,"
        " n_images FROM g"
    )


QUERIES = {
    "quadkey_stats": (q_quadkey_stats, _sql_quadkey_stats()),
}
