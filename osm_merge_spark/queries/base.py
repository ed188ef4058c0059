"""Shared derivation of the image+caption/layer tables from the driver's
TPC-H-ish parquet — every formula exists twice, as a Catalyst expression and
as the identical ANSI SQL string, so the DuckDB oracle reproduces the Spark
result bit-for-bit.

Geometry synthesis is pure integer-hash arithmetic (multiply/mod — no
transcendental "randomness"), making coordinates IEEE-identical across
engines. Match classes are planted exactly like data/synth.py (FIXTURES.md
§2): an image's class = key % 10 decides jitter/typo/far/absent — so the
conflation ladder's expected output is known by construction AND
SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import dlit

# AOI bbox (matches data/synth.py) + non-convex AOI ring (NE corner cut).
LON_MIN, LON_MAX = -109.2, -108.2
LAT_MIN, LAT_MAX = 43.4, 44.0
AOI_RING = [
    (LON_MIN, LAT_MIN), (LON_MAX, LAT_MIN), (LON_MAX, LAT_MAX - 0.25),
    (LON_MIN + 0.7, LAT_MAX), (LON_MIN, LAT_MAX - 0.1),
]
HOT_LON, HOT_LAT = -108.70003, 43.70007  # hot-cell cluster center (skew test)
HOT_MOD = 20                              # p_partkey % 20 == 0 → hot part

THRESHOLD_M = 7.0  # reference class default (osm_merge/conflator.py:357)

_A = 2654435761  # Knuth multiplicative constant
_M = 1000003     # prime modulus


def u01(k: Column, salt: int) -> Column:
    """Deterministic uniform-ish double in [0,1) from an integer key.

    Pure int64 multiply/mod then one division — IEEE-identical in DuckDB.
    """
    return ((k.cast("long") * F.lit(_A) + F.lit(salt * 7919)) % F.lit(_M)).cast(
        "double"
    ) / F.lit(float(_M))


def u01_sql(k: str, salt: int) -> str:
    return (
        f"(CAST((CAST({k} AS BIGINT) * {_A} + {salt * 7919}) % {_M} AS DOUBLE)"
        f" / {dlit(float(_M))})"
    )


# --- part positions (the "existing layer" geometry) -------------------------
def part_lon(pk: Column) -> Column:
    hot = (pk % F.lit(HOT_MOD)) == F.lit(0)
    return F.when(
        hot, F.lit(HOT_LON) + (u01(pk, 1) - F.lit(0.5)) * F.lit(0.0009)
    ).otherwise(F.lit(LON_MIN) + u01(pk, 1) * F.lit(LON_MAX - LON_MIN))


def part_lat(pk: Column) -> Column:
    hot = (pk % F.lit(HOT_MOD)) == F.lit(0)
    return F.when(
        hot, F.lit(HOT_LAT) + (u01(pk, 2) - F.lit(0.5)) * F.lit(0.0009)
    ).otherwise(F.lit(LAT_MIN) + u01(pk, 2) * F.lit(LAT_MAX - LAT_MIN))


def part_lon_sql(pk: str) -> str:
    return (
        f"(CASE WHEN ({pk} % {HOT_MOD}) = 0 THEN {dlit(HOT_LON)}"
        f" + ({u01_sql(pk, 1)} - {dlit(0.5)}) * {dlit(0.0009)}"
        f" ELSE {dlit(LON_MIN)} + {u01_sql(pk, 1)} * {dlit(LON_MAX - LON_MIN)} END)"
    )


def part_lat_sql(pk: str) -> str:
    return (
        f"(CASE WHEN ({pk} % {HOT_MOD}) = 0 THEN {dlit(HOT_LAT)}"
        f" + ({u01_sql(pk, 2)} - {dlit(0.5)}) * {dlit(0.0009)}"
        f" ELSE {dlit(LAT_MIN)} + {u01_sql(pk, 2)} * {dlit(LAT_MAX - LAT_MIN)} END)"
    )


# --- the derived layer table (feature per part) -----------------------------
def layer_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    pk = F.col("p_partkey")
    return pt.select(
        pk.alias("feature_id"),
        ((pk % 3) + 1).cast("int").alias("version"),
        part_lon(pk).alias("s_lon"),
        part_lat(pk).alias("s_lat"),
        F.col("p_name").alias("s_caption"),
    )


LAYER_SQL = (
    "SELECT p_partkey AS feature_id,"
    " CAST((p_partkey % 3) + 1 AS INT) AS version,"
    f" {part_lon_sql('p_partkey')} AS s_lon,"
    f" {part_lat_sql('p_partkey')} AS s_lat,"
    " p_name AS s_caption"
    " FROM part"
)


# --- the derived images table (one image per lineitem) ----------------------
# class = key % 10 (mirrors data/synth.py classes):
#   0-4: near part position (4 = exact dup, dist==0), caption same (2,3 typo)
#   5  : near, unrelated caption                  → match by dist, hits=0
#   6  : caption same, planted FAR (+0.08°)       → NEW
#   7-9: unrelated position                       → NEW
_DEG_PER_M_LAT = 1.0 / 110_574.0
_JIT = THRESHOLD_M * 0.45 * _DEG_PER_M_LAT


_IMG_CACHE: dict[tuple[str, str], DataFrame] = {}


def images_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived image table, persisted once per (session, sf_dir): every
    geo query starts from it, and the lineitem dedup + part join would
    otherwise re-run per query (~2.5 s each at sf0.1).

    Keyed by applicationId, not id(spark): CPython reuses object ids after
    GC, so an id-keyed cache can hand a new session a DataFrame bound to a
    stopped SparkContext. Entries from any other application are dropped
    (their context is gone or irrelevant; persist() state dies with it)."""
    app = spark.sparkContext.applicationId
    for stale in [k for k in _IMG_CACHE if k[0] != app]:
        _IMG_CACHE.pop(stale, None)
    key = (app, sf_dir)
    if key not in _IMG_CACHE:
        df = _images_df_plan(spark, sf_dir)
        try:
            df = df.persist()
        except Exception:
            pass
        _IMG_CACHE[key] = df
    return _IMG_CACHE[key]


def _images_df_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (l_orderkey, l_linenumber) is NOT unique in the driver's lineitem —
    # deduplicate deterministically (min partkey) so the image key is unique
    # and the oracle reproduces the exact same row set.
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.min("l_partkey").alias("l_partkey"))
    )
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    df = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    key = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long")
    cls = key % 10
    pk = F.col("p_partkey")
    dlon = (
        F.when(cls == 4, F.lit(0.0))
        .when(cls == 6, F.lit(0.08))
        .otherwise((u01(key, 3) - F.lit(0.5)) * F.lit(2.0 * _JIT))
    )
    dlat = (
        F.when(cls == 4, F.lit(0.0))
        .when(cls == 6, F.lit(0.08))
        .otherwise((u01(key, 4) - F.lit(0.5)) * F.lit(2.0 * _JIT))
    )
    lon = F.when(
        cls >= 7, F.lit(LON_MIN) + u01(key, 5) * F.lit(LON_MAX - LON_MIN)
    ).otherwise(part_lon(pk) + dlon)
    lat = F.when(
        cls >= 7, F.lit(LAT_MIN) + u01(key, 6) * F.lit(LAT_MAX - LAT_MIN)
    ).otherwise(part_lat(pk) + dlat)
    typo = F.concat(
        F.substring("p_name", 1, 2), F.lit("x"), F.expr("substring(p_name, 4)")
    )
    caption = (
        F.when(cls.isin(2, 3), typo)
        .when(cls == 5, F.concat(F.lit("misc object "), (key % 7).cast("string")))
        .otherwise(F.col("p_name"))
    )
    return df.select(
        F.concat(F.lit("img-"), key.cast("string")).alias("image_id"),
        key.alias("ikey"),
        cls.cast("int").alias("cls"),
        caption.alias("caption"),
        lon.alias("lon"),
        lat.alias("lat"),
        pk.alias("src_part"),
    )


# --- derived ways table (packed polylines; AOI line-clip fixture) -----------
# class = s_suppkey % 4 plants the four boundary relationships by
# construction (FIXTURES-style known truth):
#   0: fully inside (3 vertices)          → kept via vertex PIP
#   1: fully outside, west of the AOI     → dropped
#   2: spans the whole AOI east-west with ZERO interior vertices — the
#      case vertex-PIP alone silently drops (osmhighways.py:243-253 keeps
#      it: boundary `intersects` the way)  → kept via segment crossing only
#   3: hugs the south boundary from outside, never crossing → dropped
def ways_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    k = F.col("s_suppkey").cast("long")
    cls = (k % 4).cast("int")
    u1, u2 = u01(k, 11), u01(k, 12)
    in_x = F.lit(LON_MIN) + F.lit(0.15) + u1 * F.lit(0.5)
    in_y = F.lit(LAT_MIN) + F.lit(0.1) + u2 * F.lit(0.3)
    w_x = F.lit(LON_MIN) - F.lit(0.3) + u1 * F.lit(0.2)
    w_y = F.lit(LAT_MIN) + u2 * F.lit(0.5)
    x_y = F.lit(LAT_MIN) + F.lit(0.05) + u2 * F.lit(0.4)
    s_x = F.lit(LON_MIN) + u1 * F.lit(0.8)
    s_y = F.lit(LAT_MIN) - F.lit(0.07) + u2 * F.lit(0.05)
    xs = (
        F.when(cls == 0, F.array(in_x, in_x + F.lit(0.01), in_x + F.lit(0.02)))
        .when(cls == 1, F.array(w_x, w_x + F.lit(0.05)))
        .when(cls == 2, F.array(F.lit(LON_MIN - 0.05), F.lit(LON_MAX + 0.05)))
        .otherwise(F.array(s_x, s_x + F.lit(0.1)))
    )
    ys = (
        F.when(cls == 0, F.array(in_y, in_y + F.lit(0.008), in_y))
        .when(cls == 1, F.array(w_y, w_y + F.lit(0.02)))
        .when(cls == 2, F.array(x_y, x_y))
        .otherwise(F.array(s_y, s_y))
    )
    return sup.select(
        k.alias("way_id"), cls.alias("wcls"), xs.alias("xs"), ys.alias("ys")
    )


def _ways_sql() -> str:
    k = "CAST(s_suppkey AS BIGINT)"
    u1, u2 = u01_sql(k, 11), u01_sql(k, 12)
    in_x = f"({dlit(LON_MIN)} + {dlit(0.15)} + {u1} * {dlit(0.5)})"
    in_y = f"({dlit(LAT_MIN)} + {dlit(0.1)} + {u2} * {dlit(0.3)})"
    w_x = f"({dlit(LON_MIN)} - {dlit(0.3)} + {u1} * {dlit(0.2)})"
    w_y = f"({dlit(LAT_MIN)} + {u2} * {dlit(0.5)})"
    x_y = f"({dlit(LAT_MIN)} + {dlit(0.05)} + {u2} * {dlit(0.4)})"
    s_x = f"({dlit(LON_MIN)} + {u1} * {dlit(0.8)})"
    s_y = f"({dlit(LAT_MIN)} - {dlit(0.07)} + {u2} * {dlit(0.05)})"
    xs = (
        f"(CASE WHEN ({k} % 4) = 0 THEN [{in_x}, {in_x} + {dlit(0.01)},"
        f" {in_x} + {dlit(0.02)}]"
        f" WHEN ({k} % 4) = 1 THEN [{w_x}, {w_x} + {dlit(0.05)}]"
        f" WHEN ({k} % 4) = 2 THEN [{dlit(LON_MIN - 0.05)}, {dlit(LON_MAX + 0.05)}]"
        f" ELSE [{s_x}, {s_x} + {dlit(0.1)}] END)"
    )
    ys = (
        f"(CASE WHEN ({k} % 4) = 0 THEN [{in_y}, {in_y} + {dlit(0.008)}, {in_y}]"
        f" WHEN ({k} % 4) = 1 THEN [{w_y}, {w_y} + {dlit(0.02)}]"
        f" WHEN ({k} % 4) = 2 THEN [{x_y}, {x_y}]"
        f" ELSE [{s_y}, {s_y}] END)"
    )
    return (
        f"SELECT {k} AS way_id, CAST(({k} % 4) AS INT) AS wcls,"
        f" {xs} AS xs, {ys} AS ys FROM supplier"
    )


WAYS_SQL = _ways_sql()


_KEY_SQL = "(CAST(l_orderkey * 8 + l_linenumber AS BIGINT))"
_CLS_SQL = f"({_KEY_SQL} % 10)"

IMAGES_SQL = (
    "SELECT 'img-' || CAST(k AS VARCHAR) AS image_id, k AS ikey,"
    " CAST(cls AS INT) AS cls, caption, lon, lat, p_partkey AS src_part FROM ("
    "SELECT k, cls,"
    " CASE WHEN cls IN (2,3) THEN substr(p_name,1,2) || 'x' || substr(p_name,4)"
    "      WHEN cls = 5 THEN 'misc object ' || CAST(k % 7 AS VARCHAR)"
    "      ELSE p_name END AS caption,"
    " CASE WHEN cls >= 7 THEN "
    f"{dlit(LON_MIN)} + {u01_sql('k', 5)} * {dlit(LON_MAX - LON_MIN)}"
    f" ELSE {part_lon_sql('p_partkey')} + (CASE WHEN cls = 4 THEN {dlit(0.0)}"
    f" WHEN cls = 6 THEN {dlit(0.08)}"
    f" ELSE ({u01_sql('k', 3)} - {dlit(0.5)}) * {dlit(2.0 * _JIT)} END) END AS lon,"
    " CASE WHEN cls >= 7 THEN "
    f"{dlit(LAT_MIN)} + {u01_sql('k', 6)} * {dlit(LAT_MAX - LAT_MIN)}"
    f" ELSE {part_lat_sql('p_partkey')} + (CASE WHEN cls = 4 THEN {dlit(0.0)}"
    f" WHEN cls = 6 THEN {dlit(0.08)}"
    f" ELSE ({u01_sql('k', 4)} - {dlit(0.5)}) * {dlit(2.0 * _JIT)} END) END AS lat,"
    " p_partkey FROM ("
    f"SELECT {_KEY_SQL} AS k, {_CLS_SQL} AS cls, p_name, p_partkey"
    " FROM (SELECT l_orderkey, l_linenumber, min(l_partkey) AS l_partkey"
    " FROM lineitem GROUP BY 1, 2) li"
    " JOIN part ON l_partkey = p_partkey) t) t2"
)
