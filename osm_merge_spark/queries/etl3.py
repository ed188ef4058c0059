"""Third ETL batch: tag-schema normalization (F1) and task-grid generation
(A6) as oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo
from ..functions.cells import TileGrid
from . import base

# ---------------------------------------------------------------------------
# normalize_tags — F1 (utilities/osmhighways.py:77-184): drop tiger:* and
# ^_[A-Z]+ import junk; a name that is really a forest-road ref moves to
# ref:usfs. Output canonicalized as sorted "k=v;..." (map oracles are
# string math).
# ---------------------------------------------------------------------------
def q_normalize_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_name")
    pk = F.col("p_partkey")
    # synthesize a raw OSM-ish tag map with junk keys and sometimes a
    # ref-like name ("FS 1234")
    refname = F.concat(F.lit("FS "), (pk % 9000 + 100).cast("string"))
    name = F.when(pk % 4 == 0, refname).otherwise(F.col("p_name"))
    raw = F.map_from_arrays(
        F.array(F.lit("name"), F.lit("highway"), F.lit("tiger:cfcc"),
                F.lit("_FID"), F.lit("surface")),
        F.array(name, F.lit("track"), F.lit("A41"),
                pk.cast("string"), F.lit("dirt")),
    )
    cleaned = F.map_filter(
        raw,
        lambda k, v: ~k.startswith("tiger:") & (F.regexp_extract(k, r"^_[A-Z]+", 0) == ""),
    )
    is_ref = F.col("name_v").rlike(r"^FS [0-9]+$")
    with_name = (
        pt.withColumn("m", cleaned)
        .withColumn("name_v", F.element_at("m", "name"))
    )
    moved = with_name.withColumn(
        "m2",
        F.when(
            is_ref,
            F.map_concat(
                F.map_filter(F.col("m"), lambda k, v: k != F.lit("name")),
                F.create_map(F.lit("ref:usfs"), F.col("name_v")),
            ),
        ).otherwise(F.col("m")),
    )
    canon = F.concat_ws(
        ";",
        F.array_sort(
            F.transform(
                F.map_entries("m2"),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            )
        ),
    )
    return moved.select("p_partkey", canon.alias("tags"))


def _sql_normalize_tags() -> str:
    # after dropping tiger:/_FID, surviving keys sorted:
    #   ref case:  highway < ref:usfs < surface
    #   name case: highway < name < surface
    refname = "'FS ' || CAST(p_partkey % 9000 + 100 AS VARCHAR)"
    return (
        "SELECT p_partkey,"
        " CASE WHEN p_partkey % 4 = 0 THEN"
        f" 'highway=track;ref:usfs=' || ({refname}) || ';surface=dirt'"
        " ELSE 'highway=track;name=' || p_name || ';surface=dirt' END AS tags"
        " FROM part"
    )


# ---------------------------------------------------------------------------
# tile_grid — A6 (tm-splitter.py:103-113): EPSG:3857 task grid over the
# AOI bbox, generated distributively (range × range)
# ---------------------------------------------------------------------------
_TG = TileGrid(tile_m=5000.0)


def q_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tiles import generate_tiles

    tiles = generate_tiles(
        spark, base.LON_MIN, base.LAT_MIN, base.LON_MAX, base.LAT_MAX, _TG
    )
    return tiles.select(
        "tile_id", "tx", "ty",
        F.round("xmin", 2).alias("xmin"), F.round("ymin", 2).alias("ymin"),
    )


def _sql_tile_grid() -> str:
    import math

    R = geo.WEB_MERCATOR_R
    mx0 = R * math.radians(base.LON_MIN)
    mx1 = R * math.radians(base.LON_MAX)
    my0 = R * math.log(math.tan(math.pi / 4 + math.radians(base.LAT_MIN) / 2))
    my1 = R * math.log(math.tan(math.pi / 4 + math.radians(base.LAT_MAX) / 2))
    tx0, tx1 = math.floor(mx0 / _TG.tile_m), math.floor(mx1 / _TG.tile_m)
    ty0, ty1 = math.floor(my0 / _TG.tile_m), math.floor(my1 / _TG.tile_m)
    size = geo.dlit(_TG.tile_m)
    return (
        f"SELECT CAST(ty * {_TG.nx} + tx AS BIGINT) AS tile_id, tx, ty,"
        f" round(tx * {size}, 2) AS xmin, round(ty * {size}, 2) AS ymin"
        f" FROM (SELECT unnest(range({tx0}, {tx1 + 1})) AS tx) a"
        f" CROSS JOIN (SELECT unnest(range({ty0}, {ty1 + 1})) AS ty) b"
    )


QUERIES = {
    "normalize_tags": (q_normalize_tags, _sql_normalize_tags()),
    "tile_grid": (q_tile_grid, _sql_tile_grid()),
}
