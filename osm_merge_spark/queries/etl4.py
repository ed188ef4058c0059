"""Per-source ETL queries (F8): the five reference dataset converters run
end-to-end over deterministically synthesized raw-schema tables, each with a
full DuckDB oracle built from the same SQL mirrors in
operators/etl_sources.py.

Raw inputs are derived from the driver parquet with the multiply-mod hash
used across the engine (etl.py _ck_h) so every nullable pick is
IEEE/byte-identical in both engines. Output is (rid, tags_canon): the
canonical sorted 'k=v;...' tag string — map columns can't be value-hashed
by the driver, the canonical string can.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import etl_sources as es
from .etl import _ck_h, _ck_h_sql


def _pickn(arr: list[str | None], h: Column) -> Column:
    """Deterministic pick from a list that may contain None (→ NULL)."""
    n = len(arr)
    idx = (h % F.lit(n)).cast("int")
    expr = F.lit(None).cast("string")
    for i, v in enumerate(arr):
        if v is not None:
            expr = F.when(idx == F.lit(i), F.lit(v)).otherwise(expr)
    return expr


def _pickn_sql(arr: list[str | None], h: str) -> str:
    whens = " ".join(
        f"WHEN CAST(({h}) % {len(arr)} AS INT) = {i} THEN '{v}'"
        for i, v in enumerate(arr) if v is not None
    )
    return f"(CASE {whens} ELSE NULL END)"


# ---------------------------------------------------------------------------
# MVUM over part
# ---------------------------------------------------------------------------
_MVUM_MAINT_VALS = [
    "1 - BASIC CUSTODIAL CARE (CLOSED)", "2 - HIGH CLEARANCE VEHICLES",
    "3 - SUITABLE FOR PASSENGER CARS", "4 - MODERATE DEGREE OF USER COMFORT",
    "5 - HIGH DEGREE OF USER COMFORT", "NA", "D", None,
]
_MVUM_MAINTAINER_VALS = ["FS - FOREST SERVICE", "BLM - BUREAU OF LAND MGMT",
                         "CO - COUNTY", "", None]
_MVUM_SURFACE_VALS = ["NAT - NATIVE MATERIAL", "AGG - CRUSHED AGGREGATE",
                      "AC - ASPHALT", "BST - BITUMINOUS SURFACE",
                      "IMP - IMPROVED NATIVE", "CSOIL - COMPACTED SOIL",
                      " ", None]
_MVUM_SYMBOL_VALS = ["Road Not Maintained for Passenger Car", "Paved Road",
                     "High Clearance Road", "Dirt Road Suitable",
                     "Gravel Road", None, None]
_MVUM_HCV_VALS = [None, "Y", None]
_MVUM_SEASONAL_VALS = ["yearlong", "yes", "no", None]
_MVUM_W1 = ["BEAR", "CEDAR", "ELK", "PINE", "SILVER"]
_MVUM_W2 = ["CR", "CRK", "LK", "MTN", "RDG", "SPG", "BIG"]
_MVUM_W3 = ["RD", "TRAIL", "LOOP", None]


def _mvum_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey")
    pk = F.col("p_partkey")
    five_digit = (_ck_h(pk, 11) % 7) == 0
    id_null = (_ck_h(pk, 12) % 13) == 0
    base_id = F.concat(
        (pk % 9000 + 100).cast("string"),
        F.coalesce(_pickn(["", ".1", ".1a", ""], _ck_h(pk, 13)), F.lit("")),
    )
    id_c = F.when(id_null, F.lit(None).cast("string")).when(
        five_digit, (pk % 90000 + 10000).cast("string")
    ).otherwise(base_id)
    name_null = (_ck_h(pk, 24) % 11) == 0
    name_c = F.when(name_null, F.lit(None).cast("string")).otherwise(
        F.concat_ws(
            " ", _pickn(_MVUM_W1, _ck_h(pk, 21)),
            _pickn(_MVUM_W2, _ck_h(pk, 22)), _pickn(_MVUM_W3, _ck_h(pk, 23)),
        )
    )
    return pt.select(
        pk.alias("rid"),
        id_c.alias("ID"),
        name_c.alias("NAME"),
        _pickn(_MVUM_MAINT_VALS, _ck_h(pk, 31)).alias("OPERATIONALMAINTLEVEL"),
        _pickn(_MVUM_MAINTAINER_VALS, _ck_h(pk, 41)).alias("PRIMARY_MAINTAINER"),
        _pickn(_MVUM_SURFACE_VALS, _ck_h(pk, 51)).alias("SURFACETYPE"),
        _pickn(_MVUM_SYMBOL_VALS, _ck_h(pk, 61)).alias("SBS_SYMBOL_NAME"),
        _pickn(_MVUM_HCV_VALS, _ck_h(pk, 71)).alias("HIGHCLEARANCEVEHICLE"),
        _pickn(_MVUM_SEASONAL_VALS, _ck_h(pk, 81)).alias("SEASONAL"),
    )


def _mvum_raw_sql() -> str:
    pk = "p_partkey"
    five = f"(({_ck_h_sql(pk, 11)}) % 7) = 0"
    id_null = f"(({_ck_h_sql(pk, 12)}) % 13) = 0"
    base_id = (
        f"(CAST({pk} % 9000 + 100 AS VARCHAR) ||"
        f" coalesce({_pickn_sql(['', '.1', '.1a', ''], _ck_h_sql(pk, 13))}, ''))"
    )
    id_c = (
        f"(CASE WHEN {id_null} THEN NULL WHEN {five}"
        f" THEN CAST({pk} % 90000 + 10000 AS VARCHAR) ELSE {base_id} END)"
    )
    name_null = f"(({_ck_h_sql(pk, 24)}) % 11) = 0"
    name_c = (
        f"(CASE WHEN {name_null} THEN NULL ELSE concat_ws(' ',"
        f" {_pickn_sql(_MVUM_W1, _ck_h_sql(pk, 21))},"
        f" {_pickn_sql(_MVUM_W2, _ck_h_sql(pk, 22))},"
        f" {_pickn_sql(_MVUM_W3, _ck_h_sql(pk, 23))}) END)"
    )
    return (
        f"SELECT {pk} AS rid, {id_c} AS id, {name_c} AS name,"
        f" {_pickn_sql(_MVUM_MAINT_VALS, _ck_h_sql(pk, 31))} AS maint,"
        f" {_pickn_sql(_MVUM_MAINTAINER_VALS, _ck_h_sql(pk, 41))} AS maintainer,"
        f" {_pickn_sql(_MVUM_SURFACE_VALS, _ck_h_sql(pk, 51))} AS surfacetype,"
        f" {_pickn_sql(_MVUM_SYMBOL_VALS, _ck_h_sql(pk, 61))} AS symbol,"
        f" {_pickn_sql(_MVUM_HCV_VALS, _ck_h_sql(pk, 71))} AS hcv,"
        f" {_pickn_sql(_MVUM_SEASONAL_VALS, _ck_h_sql(pk, 81))} AS seasonal"
        " FROM part"
    )


def q_etl_mvum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return es.etl_mvum(_mvum_raw(spark, sf_dir)).select("rid", "tags_canon")


def _sql_etl_mvum() -> str:
    entries, keep = es.mvum_entries_sql(
        "id", "name", "maint", "maintainer", "surfacetype", "symbol",
        "hcv", "seasonal",
    )
    return (
        f"WITH raw AS ({_mvum_raw_sql()}) "
        f"SELECT rid, {es._canon_tags_sql(entries)} AS tags_canon"
        f" FROM raw WHERE {keep}"
    )


# ---------------------------------------------------------------------------
# RoadCore over supplier
# ---------------------------------------------------------------------------
_RC_MAINT_VALS = ["1 - BASIC", "2 - HIGH CLEARANCE", "3 - PASSENGER CARS",
                  "4 - MODERATE", "5 - HIGH COMFORT", "NA", None]
_RC_SURF_VALS = ["NAT", "AGG", "AC", "BST", "IMP", "CSOIL", "P - PAVED", None]
_RC_W1 = ["BEAR", "ELK", "OTTER", "GRANITE"]
_RC_W2 = ["CR", "CG", "MTN", "RD", "LAKE"]


def _roadcore_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey")
    sk = F.col("s_suppkey")
    id_c = F.when((_ck_h(sk, 91) % 13) == 0, F.lit(None).cast("string")) \
        .otherwise((sk % 9000 + 50).cast("string"))
    name_c = F.when((_ck_h(sk, 92) % 9) == 0, F.lit(None).cast("string")) \
        .otherwise(F.concat_ws(" ", _pickn(_RC_W1, _ck_h(sk, 93)),
                               _pickn(_RC_W2, _ck_h(sk, 94))))
    return sup.select(
        sk.alias("rid"), id_c.alias("ID"), name_c.alias("NAME"),
        _pickn(_RC_MAINT_VALS, _ck_h(sk, 95)).alias("OPER_MAINT"),
        _pickn(_RC_SURF_VALS, _ck_h(sk, 96)).alias("SURFACE_TY"),
    )


def _roadcore_raw_sql() -> str:
    sk = "s_suppkey"
    id_c = (
        f"(CASE WHEN (({_ck_h_sql(sk, 91)}) % 13) = 0 THEN NULL"
        f" ELSE CAST({sk} % 9000 + 50 AS VARCHAR) END)"
    )
    name_c = (
        f"(CASE WHEN (({_ck_h_sql(sk, 92)}) % 9) = 0 THEN NULL"
        f" ELSE concat_ws(' ', {_pickn_sql(_RC_W1, _ck_h_sql(sk, 93))},"
        f" {_pickn_sql(_RC_W2, _ck_h_sql(sk, 94))}) END)"
    )
    return (
        f"SELECT {sk} AS rid, {id_c} AS id, {name_c} AS name,"
        f" {_pickn_sql(_RC_MAINT_VALS, _ck_h_sql(sk, 95))} AS maint,"
        f" {_pickn_sql(_RC_SURF_VALS, _ck_h_sql(sk, 96))} AS surfacety"
        " FROM supplier"
    )


def q_etl_roadcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return es.etl_roadcore(_roadcore_raw(spark, sf_dir)).select(
        "rid", "tags_canon"
    )


def _sql_etl_roadcore() -> str:
    entries = es.roadcore_entries_sql("id", "name", "maint", "surfacety")
    return (
        f"WITH raw AS ({_roadcore_raw_sql()}) "
        f"SELECT rid, {es._canon_tags_sql(entries)} AS tags_canon FROM raw"
    )


# ---------------------------------------------------------------------------
# NPS over customer
# ---------------------------------------------------------------------------
_NPS_SRC_VALS = ["NPS Yellowstone GIS", "USGS Topo Quad", None]
_NPS_SURF_VALS = ["Gravel", "Native", "Asphalt", None]
_NPS_SEAS_VALS = ["Yes", "NO", None]
_NPS_W = ["OLD FAITHFUL", "LAMAR VALLEY", "MYSTIC FALLS", "SPECIMEN RIDGE"]


def _nps_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    ck = F.col("c_custkey")
    name_c = F.when((_ck_h(ck, 101) % 7) == 0, F.lit(None).cast("string")) \
        .otherwise(F.concat(_pickn(_NPS_W, _ck_h(ck, 102)), F.lit(" TRAIL")))
    return cu.select(
        ck.alias("rid"),
        _pickn(_NPS_SRC_VALS, _ck_h(ck, 103)).alias("MAPSOURCE"),
        name_c.alias("TRLNAME"),
        _pickn(_NPS_SURF_VALS, _ck_h(ck, 104)).alias("TRLSURFACE"),
        _pickn(_NPS_SEAS_VALS, _ck_h(ck, 105)).alias("SEASONAL"),
    )


def _nps_raw_sql() -> str:
    ck = "c_custkey"
    name_c = (
        f"(CASE WHEN (({_ck_h_sql(ck, 101)}) % 7) = 0 THEN NULL"
        f" ELSE {_pickn_sql(_NPS_W, _ck_h_sql(ck, 102))} || ' TRAIL' END)"
    )
    return (
        f"SELECT {ck} AS rid,"
        f" {_pickn_sql(_NPS_SRC_VALS, _ck_h_sql(ck, 103))} AS mapsource,"
        f" {name_c} AS trlname,"
        f" {_pickn_sql(_NPS_SURF_VALS, _ck_h_sql(ck, 104))} AS trlsurface,"
        f" {_pickn_sql(_NPS_SEAS_VALS, _ck_h_sql(ck, 105))} AS seasonal"
        " FROM customer"
    )


def q_etl_nps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return es.etl_nps(_nps_raw(spark, sf_dir)).select("rid", "tags_canon")


def _sql_etl_nps() -> str:
    entries = es.nps_entries_sql("mapsource", "trlname", "trlsurface",
                                 "seasonal")
    canon = es._canon_tags_sql(entries)
    return (
        f"WITH raw AS ({_nps_raw_sql()}) "
        f"SELECT rid, {canon} AS tags_canon FROM raw"
        f" WHERE length({canon}) > 0"
    )


# ---------------------------------------------------------------------------
# Trails (NPS branch) over customer
# ---------------------------------------------------------------------------
_TR_MAINT_VALS = ["National Park Service", "Volunteers"]
_TR_ALT_VALS = ["Unknown", "OLD WAGON PATH", None]
_TR_USE_VALS = [
    "Hiker/Pedestrian", "Bike|Hiker/Pedestrian", "Motorcycle|ATV",
    "Pack and Saddle", "Cross-Country Ski|Snowshoe",
    "ATV|Four-Wheel Drive Vehicle", "Motorized", "Unknown",
    "Horse, Hiking, and Bicycle", None,
]
_TR_SURF_VALS = ["Gravel and Dirt", "Earth", "Snow", "Concrete",
                 "Bituminous", None]
_TR_SEAS_VALS = ["Yes", "", None]


def _trails_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    ck = F.col("c_custkey")
    return cu.select(
        ck.alias("rid"),
        _pickn(_TR_MAINT_VALS, _ck_h(ck, 111)).alias("MAINTAINER"),
        F.concat(_pickn(_NPS_W, _ck_h(ck, 112)), F.lit(" Trail")).alias("TRLNAME"),
        _pickn(_TR_ALT_VALS, _ck_h(ck, 113)).alias("TRLALTNAME"),
        _pickn(_TR_USE_VALS, _ck_h(ck, 114)).alias("TRLUSE"),
        _pickn(_TR_SURF_VALS, _ck_h(ck, 115)).alias("TRLSURFACE"),
        _pickn(_TR_SEAS_VALS, _ck_h(ck, 116)).alias("SEASONAL"),
    )


def _trails_raw_sql() -> str:
    ck = "c_custkey"
    return (
        f"SELECT {ck} AS rid,"
        f" {_pickn_sql(_TR_MAINT_VALS, _ck_h_sql(ck, 111))} AS maintainer,"
        f" {_pickn_sql(_NPS_W, _ck_h_sql(ck, 112))} || ' Trail' AS trlname,"
        f" {_pickn_sql(_TR_ALT_VALS, _ck_h_sql(ck, 113))} AS trlaltname,"
        f" {_pickn_sql(_TR_USE_VALS, _ck_h_sql(ck, 114))} AS trluse,"
        f" {_pickn_sql(_TR_SURF_VALS, _ck_h_sql(ck, 115))} AS trlsurface,"
        f" {_pickn_sql(_TR_SEAS_VALS, _ck_h_sql(ck, 116))} AS seasonal"
        " FROM customer"
    )


def q_etl_trails(spark: SparkSession, sf_dir: str) -> DataFrame:
    return es.etl_trails_nps(_trails_raw(spark, sf_dir)).select(
        "rid", "tags_canon"
    )


def _sql_etl_trails() -> str:
    entries = es.trails_nps_entries_sql(
        "maintainer", "trlname", "trlaltname", "trluse", "trlsurface",
        "seasonal",
    )
    return (
        f"WITH raw AS ({_trails_raw_sql()}) "
        f"SELECT rid, {es._canon_tags_sql(entries)} AS tags_canon FROM raw"
    )


# ---------------------------------------------------------------------------
# Trails (USFS branch) over supplier
# ---------------------------------------------------------------------------
_USFS_FLAG_COLS = [
    "HIKER_PEDESTRIAN_MANAGED", "BICYCLE_ACCPT", "ATV_RESTRICTED",
    "MOTORCYCLE_ACCPT_DISC", "SNOWMOBILE_DISC", "PACK_SADDLE_MANAGED",
    "SNOWSHOE_ACCPT", "XCOUNTRY_SKI_MANAGED",
]
_YN_VALS = ["Y", "N", None]


def _trails_usfs_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey")
    sk = F.col("s_suppkey")
    cols = [
        sk.alias("rid"),
        F.when((_ck_h(sk, 121) % 11) == 0, F.lit(None).cast("string"))
        .otherwise(F.concat((sk % 900 + 10).cast("string"),
                            _pickn(["", ".1", "a"], _ck_h(sk, 122))))
        .alias("TRAIL_NO"),
        F.concat(_pickn(_NPS_W, _ck_h(sk, 123)), F.lit(" TRAIL")).alias("TRAIL_NAME"),
    ]
    for i, c in enumerate(_USFS_FLAG_COLS):
        cols.append(_pickn(_YN_VALS, _ck_h(sk, 130 + i)).alias(c))
    return sup.select(*cols)


def _trails_usfs_raw_sql() -> str:
    sk = "s_suppkey"
    trail_no = (
        f"(CASE WHEN (({_ck_h_sql(sk, 121)}) % 11) = 0 THEN NULL"
        f" ELSE CAST({sk} % 900 + 10 AS VARCHAR) ||"
        f" coalesce({_pickn_sql(['', '.1', 'a'], _ck_h_sql(sk, 122))}, '') END)"
    )
    flags = ", ".join(
        f"{_pickn_sql(_YN_VALS, _ck_h_sql(sk, 130 + i))} AS f{i}"
        for i in range(len(_USFS_FLAG_COLS))
    )
    return (
        f"SELECT {sk} AS rid, {trail_no} AS trail_no,"
        f" {_pickn_sql(_NPS_W, _ck_h_sql(sk, 123))} || ' TRAIL' AS trail_name,"
        f" {flags} FROM supplier"
    )


def q_etl_trails_usfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return es.etl_trails_usfs(
        _trails_usfs_raw(spark, sf_dir), flag_col_names=_USFS_FLAG_COLS
    ).select("rid", "tags_canon")


def _sql_etl_trails_usfs() -> str:
    entries = es.trails_usfs_entries_sql(
        "trail_no", "trail_name",
        {c: f"f{i}" for i, c in enumerate(_USFS_FLAG_COLS)},
    )
    return (
        f"WITH raw AS ({_trails_usfs_raw_sql()}) "
        f"SELECT rid, {es._canon_tags_sql(entries)} AS tags_canon FROM raw"
    )


# ---------------------------------------------------------------------------
# USGS topo highways over part
# ---------------------------------------------------------------------------
_USGS_NAME_VALS = ["USFS Rd 1234", "Rd 55", "Co Rd 12", "ELK CRK RD",
                   "BIG BEND HWY", "OTTER LN", None]
_USGS_SRC_VALS = ["USGS Topo 2018", None]
_USGS_US_VALS = [None, "30", None]
_USGS_CNTY_VALS = [None, "117", None, None]
_USGS_STATE_VALS = [None, "789", None]
_USGS_FED_VALS = [None, "3522", None, None]


def _usgs_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey")
    pk = F.col("p_partkey")
    return pt.select(
        pk.alias("rid"),
        _pickn(_USGS_NAME_VALS, _ck_h(pk, 141)).alias("name"),
        _pickn(_USGS_SRC_VALS, _ck_h(pk, 142)).alias("source_ori"),
        _pickn(_USGS_US_VALS, _ck_h(pk, 143)).alias("us_route"),
        _pickn(_USGS_CNTY_VALS, _ck_h(pk, 144)).alias("county_rou"),
        _pickn(_USGS_STATE_VALS, _ck_h(pk, 145)).alias("state_rout"),
        _pickn(_USGS_FED_VALS, _ck_h(pk, 146)).alias("federal_la"),
    )


def _usgs_raw_sql() -> str:
    pk = "p_partkey"
    return (
        f"SELECT {pk} AS rid,"
        f" {_pickn_sql(_USGS_NAME_VALS, _ck_h_sql(pk, 141))} AS name,"
        f" {_pickn_sql(_USGS_SRC_VALS, _ck_h_sql(pk, 142))} AS source_ori,"
        f" {_pickn_sql(_USGS_US_VALS, _ck_h_sql(pk, 143))} AS us_route,"
        f" {_pickn_sql(_USGS_CNTY_VALS, _ck_h_sql(pk, 144))} AS county_rou,"
        f" {_pickn_sql(_USGS_STATE_VALS, _ck_h_sql(pk, 145))} AS state_rout,"
        f" {_pickn_sql(_USGS_FED_VALS, _ck_h_sql(pk, 146))} AS federal_la"
        " FROM part"
    )


def q_etl_usgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return es.etl_usgs_highways(_usgs_raw(spark, sf_dir)).select(
        "rid", "tags_canon"
    )


def _sql_etl_usgs() -> str:
    entries, keep = es.usgs_highway_entries_sql(
        "name", "source_ori", "us_route", "county_rou", "state_rout",
        "federal_la",
    )
    return (
        f"WITH raw AS ({_usgs_raw_sql()}) "
        f"SELECT rid, {es._canon_tags_sql(entries)} AS tags_canon"
        f" FROM raw WHERE {keep}"
    )


# ---------------------------------------------------------------------------
# USGS topo trails over part
# ---------------------------------------------------------------------------
_USGS_TRAIL_FLAGS = ["bicycle", "atv", "packsaddle", "motorcycle",
                     "snowmobile", "motorizedw", "snowshoe", "crosscount"]


def _usgs_trails_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey")
    pk = F.col("p_partkey")
    cols = [
        pk.alias("rid"),
        F.concat(_pickn(_NPS_W, _ck_h(pk, 151)), F.lit(" Trail")).alias("name"),
        _pickn(["USFS", "NPS", None], _ck_h(pk, 152)).alias("sourceorig"),
        _pickn([None, "401.2", None], _ck_h(pk, 153)).alias("trailnumbe"),
    ]
    for i, c in enumerate(_USGS_TRAIL_FLAGS):
        cols.append(_pickn(_YN_VALS, _ck_h(pk, 160 + i)).alias(c))
    return pt.select(*cols)


def _usgs_trails_raw_sql() -> str:
    pk = "p_partkey"
    flags = ", ".join(
        f"{_pickn_sql(_YN_VALS, _ck_h_sql(pk, 160 + i))} AS {c}"
        for i, c in enumerate(_USGS_TRAIL_FLAGS)
    )
    return (
        f"SELECT {pk} AS rid,"
        f" {_pickn_sql(_NPS_W, _ck_h_sql(pk, 151))} || ' Trail' AS name,"
        f" {_pickn_sql(['USFS', 'NPS', None], _ck_h_sql(pk, 152))} AS sourceorig,"
        f" {_pickn_sql([None, '401.2', None], _ck_h_sql(pk, 153))} AS trailnumbe,"
        f" {flags} FROM part"
    )


def q_etl_usgs_trails(spark: SparkSession, sf_dir: str) -> DataFrame:
    return es.etl_usgs_trails(_usgs_trails_raw(spark, sf_dir)).select(
        "rid", "tags_canon"
    )


def _sql_etl_usgs_trails() -> str:
    entries = es.usgs_trail_entries_sql(
        "name", "sourceorig", "trailnumbe",
        {c: c for c in _USGS_TRAIL_FLAGS},
    )
    return (
        f"WITH raw AS ({_usgs_trails_raw_sql()}) "
        f"SELECT rid, {es._canon_tags_sql(entries)} AS tags_canon FROM raw"
    )


# ---------------------------------------------------------------------------
# Multi-part geometry explode (conflator.py:485-528 dispatch) over part
# ---------------------------------------------------------------------------
_MP_LON0 = -108.9
_MP_LAT0 = 43.5


def q_multipart_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-part NaN-separated synthetic polylines through the generic
    operators/multipart.explode_parts — the oracle recomputes each part
    from the same closed-form construction."""
    from ..operators.multipart import explode_parts

    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey")
    pk = F.col("p_partkey")
    n1 = (pk % 3 + 2).cast("int")
    n2 = ((pk % 5) % 3 + 2).cast("int")

    def seg(n, base_lon, base_lat):
        xs = F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.lit(base_lon) + i.cast("double") * F.lit(0.001),
        )
        ys = F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.lit(base_lat) + i.cast("double") * F.lit(0.0005),
        )
        return xs, ys

    xs1, ys1 = seg(n1, _MP_LON0, _MP_LAT0)
    xs2, ys2 = seg(n2, _MP_LON0 + 1.0, _MP_LAT0 + 0.1)
    nan = F.array(F.lit(float("nan")))
    df = pt.select(
        pk.alias("rid"),
        F.concat(xs1, nan, xs2).alias("xs"),
        F.concat(ys1, nan, ys2).alias("ys"),
    )
    parts = explode_parts(df)
    return parts.select(
        "rid",
        F.col("part_idx").cast("int").alias("part_idx"),
        F.size("xs").alias("n_pts"),
        F.floor(F.element_at("xs", 1) * F.lit(1.0e6)).cast("long").alias("x0_e6"),
        F.floor(F.element_at("xs", -1) * F.lit(1.0e6)).cast("long").alias("xl_e6"),
        F.floor(F.element_at("ys", -1) * F.lit(1.0e6)).cast("long").alias("yl_e6"),
    )


def _sql_multipart_explode() -> str:
    from ..functions.geo import dlit

    n1 = "(CAST(p_partkey % 3 + 2 AS INT))"
    n2 = "(CAST((p_partkey % 5) % 3 + 2 AS INT))"

    def part_select(idx, n, lon0, lat0):
        x0 = dlit(lon0)
        last_x = f"({x0} + CAST({n} - 1 AS DOUBLE) * {dlit(0.001)})"
        last_y = f"({dlit(lat0)} + CAST({n} - 1 AS DOUBLE) * {dlit(0.0005)})"
        return (
            f"SELECT p_partkey AS rid, {idx} AS part_idx,"
            f" {n} AS n_pts,"
            f" CAST(floor({x0} * 1.0e6) AS BIGINT) AS x0_e6,"
            f" CAST(floor({last_x} * 1.0e6) AS BIGINT) AS xl_e6,"
            f" CAST(floor({last_y} * 1.0e6) AS BIGINT) AS yl_e6"
            " FROM part"
        )

    return (
        part_select(0, n1, _MP_LON0, _MP_LAT0)
        + " UNION ALL "
        + part_select(1, n2, _MP_LON0 + 1.0, _MP_LAT0 + 0.1)
    )


# ---------------------------------------------------------------------------
# T4 tiny-polygon filter: shoelace ring area vs the closed-form oracle
# ---------------------------------------------------------------------------
def q_ring_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square rings of side (pk%200)/20000 deg; the engine computes the
    generic shoelace area + T4 filter, the oracle knows side² in closed
    form (independent check of the fold)."""
    from ..functions.geo import ring_area

    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey")
    pk = F.col("p_partkey")
    side = (pk % 200).cast("double") / F.lit(20000.0)
    x0 = F.lit(-108.9) + (pk % 7).cast("double") * F.lit(0.01)
    y0 = F.lit(43.5)
    xs = F.array(x0, x0 + side, x0 + side, x0, x0)
    ys = F.array(y0, y0, y0 + side, y0 + side, y0)
    area = ring_area(xs, ys)
    return pt.select(
        pk.alias("rid"),
        # round, not floor: the shoelace fold lands within ulps of the
        # exact side² (never near .5), while floor flips at the boundary
        F.round(area * F.lit(1.0e12), 0).cast("long").alias("area_e12"),
        (area < F.lit(1e-5)).alias("tiny"),
    )


def _sql_ring_area() -> str:
    from ..functions.geo import dlit

    side = "(CAST(p_partkey % 200 AS DOUBLE) / 20000.0e0)"
    area = f"({side} * {side})"
    return (
        f"SELECT p_partkey AS rid,"
        f" CAST(round({area} * 1.0e12, 0) AS BIGINT) AS area_e12,"
        f" ({area} < {dlit(1e-5)}) AS tiny FROM part"
    )


QUERIES = {
    "multipart_explode": (q_multipart_explode, _sql_multipart_explode()),
    "ring_area": (q_ring_area, _sql_ring_area()),
    "etl_mvum": (q_etl_mvum, _sql_etl_mvum()),
    "etl_roadcore": (q_etl_roadcore, _sql_etl_roadcore()),
    "etl_nps": (q_etl_nps, _sql_etl_nps()),
    "etl_trails": (q_etl_trails, _sql_etl_trails()),
    "etl_trails_usfs": (q_etl_trails_usfs, _sql_etl_trails_usfs()),
    "etl_usgs": (q_etl_usgs, _sql_etl_usgs()),
    "etl_usgs_trails": (q_etl_usgs_trails, _sql_etl_usgs_trails()),
}
