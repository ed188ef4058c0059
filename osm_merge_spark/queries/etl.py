"""ETL / scalar-function queries (SURVEY §2.2, §2.8): fuzzy ratio ladder
(X1), ref extraction + prefix normalization (X8), title-case + abbreviation
expansion (X7), tag-map merge with old_* preservation (X10), slope/angle
gates (X4).

Inputs are synthesized deterministically from the driver tables with the
same integer-hash machinery as queries/base.py so oracles are exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import fuzzy, geo
from . import base

# ---------------------------------------------------------------------------
# fuzzy_name — X1: pairwise fuzzy caption similarity within p_brand blocks
# (blocked self-join = the reference's candidate pruning before fuzz.ratio)
# ---------------------------------------------------------------------------
def q_fuzzy_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_name", "p_brand"
    )
    a = pt.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("p1"),
        F.col("p_name").alias("n1"),
    )
    b = pt.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("p2"),
        F.col("p_name").alias("n2"),
    )
    ratio = fuzzy.ratio_lev(F.col("n1"), F.col("n2"))
    return (
        a.join(b, "brand")
        .filter(F.col("p1") < F.col("p2"))
        .withColumn("ratio", ratio)
        .filter(F.col("ratio") > F.lit(50.0))
        .select("p1", "p2", F.round("ratio", 2).alias("ratio"))
    )


def _sql_fuzzy_name() -> str:
    ratio = fuzzy.ratio_lev_sql("a.p_name", "b.p_name")
    return (
        "SELECT a.p_partkey AS p1, b.p_partkey AS p2,"
        f" round({ratio}, 2) AS ratio"
        " FROM part a JOIN part b ON a.p_brand = b.p_brand"
        f" AND a.p_partkey < b.p_partkey WHERE {ratio} > {geo.dlit(50.0)}"
    )


# ---------------------------------------------------------------------------
# ref_extract — X8: trailing-number extraction + FS/FR/FSR/CR normalization
# (utilities/osmhighways.py:42-75,116-176)
# ---------------------------------------------------------------------------
_PREFIXES = ["FS", "FR", "FSR", "CR", ""]


def _raw_ref(pk: Column) -> Column:
    pfx = F.element_at(
        F.array(*[F.lit(p) for p in _PREFIXES]),
        (pk % F.lit(len(_PREFIXES))).cast("int") + F.lit(1),
    )
    num = (pk % F.lit(9000) + F.lit(100)).cast("string")
    return F.trim(F.concat_ws(" ", pfx, num))


def _raw_ref_sql(pk: str) -> str:
    arr = "', '".join(_PREFIXES)
    return (
        f"trim(concat_ws(' ', (['{arr}'])[CAST({pk} % {len(_PREFIXES)} AS INT) + 1],"
        f" CAST({pk} % 9000 + 100 AS VARCHAR)))"
    )


def q_ref_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey")
    raw = _raw_ref(F.col("p_partkey"))
    num = F.regexp_extract(raw, r"([0-9]+)$", 1)
    pfx = F.regexp_extract(raw, r"^([A-Z]+) ", 1)
    norm = (
        F.when(pfx.isin("FS", "FSR", "FR"), F.concat(F.lit("FR "), num))
        .when(pfx == "CR", F.concat(F.lit("CR "), num))
        .otherwise(num)
    )
    return pt.select("p_partkey", raw.alias("raw_ref"), norm.alias("ref"))


def _sql_ref_extract() -> str:
    raw = _raw_ref_sql("p_partkey")
    num = f"regexp_extract({raw}, '([0-9]+)$', 1)"
    pfx = f"regexp_extract({raw}, '^([A-Z]+) ', 1)"
    return (
        f"SELECT p_partkey, {raw} AS raw_ref,"
        f" CASE WHEN {pfx} IN ('FS', 'FSR', 'FR') THEN 'FR ' || {num}"
        f" WHEN {pfx} = 'CR' THEN 'CR ' || {num}"
        f" ELSE {num} END AS ref FROM part"
    )


# ---------------------------------------------------------------------------
# title_abbrev — X7: title-case + abbreviation expansion + suffix append
# (utilities/mvum.py:126-144; dict mvum.yaml:2-22)
# ---------------------------------------------------------------------------
_ABBREV = {
    "Lk": "Lake", "Rd": "Road", "Crk": "Creek", "Mtn": "Mountain",
    "Cyn": "Canyon", "Spr": "Spring", "Vly": "Valley", "Rdg": "Ridge",
}
_UP1 = [w.upper() for w in
        ["cedar", "pine", "bear", "elk", "aspen", "juniper", "willow", "eagle"]]
_UP2 = ["LK", "RDG", "CRK", "CYN", "MTN", "SPR", "VLY", "BIG"]
_UP3 = ["RD", "TRAIL", "LN", "LOOP"]
_SUFFIX_WORDS = ["Road", "Trail", "Lane", "Loop"]


def _pick(arr: list[str], h: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(w) for w in arr]), (h % F.lit(len(arr))).cast("int") + F.lit(1)
    )


def _pick_sql(arr: list[str], h: str) -> str:
    lit = "', '".join(arr)
    return f"(['{lit}'])[CAST(({h}) % {len(arr)} AS INT) + 1]"


def _ck_h(ck: Column, salt: int) -> Column:
    return (ck.cast("long") * F.lit(2654435761) + F.lit(salt)) % F.lit(997)


def _ck_h_sql(ck: str, salt: int) -> str:
    return f"((CAST({ck} AS BIGINT) * 2654435761 + {salt}) % 997)"


def q_title_abbrev(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    ck = F.col("c_custkey")
    raw = F.concat_ws(
        " ", _pick(_UP1, _ck_h(ck, 1)), _pick(_UP2, _ck_h(ck, 2)),
        _pick(_UP3, _ck_h(ck, 3)),
    )
    titled = F.initcap(F.lower(raw))
    amap = F.create_map(
        *[F.lit(x) for kv in _ABBREV.items() for x in kv]
    )
    expanded = F.concat_ws(
        " ",
        F.transform(F.split(titled, " "), lambda w: F.coalesce(amap[w], w)),
    )
    has_suffix = F.element_at(F.split(expanded, " "), -1).isin(_SUFFIX_WORDS)
    named = F.when(has_suffix, expanded).otherwise(F.concat(expanded, F.lit(" Road")))
    return cu.select("c_custkey", raw.alias("raw_name"), named.alias("name"))


def _sql_title_abbrev() -> str:
    raw = (
        f"concat_ws(' ', {_pick_sql(_UP1, _ck_h_sql('c_custkey', 1))},"
        f" {_pick_sql(_UP2, _ck_h_sql('c_custkey', 2))},"
        f" {_pick_sql(_UP3, _ck_h_sql('c_custkey', 3))})"
    )
    titled = (
        f"array_to_string(list_transform(string_split(lower({raw}), ' '),"
        " w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ')"
    )
    cases = " ".join(
        f"WHEN w = '{k}' THEN '{v}'" for k, v in _ABBREV.items()
    )
    expanded = (
        f"array_to_string(list_transform(string_split({titled}, ' '),"
        f" w -> CASE {cases} ELSE w END), ' ')"
    )
    sfx = "', '".join(_SUFFIX_WORDS)
    return (
        f"SELECT c_custkey, {raw} AS raw_name,"
        f" CASE WHEN list_extract(string_split({expanded}, ' '),"
        f" len(string_split({expanded}, ' '))) IN ('{sfx}')"
        f" THEN {expanded} ELSE {expanded} || ' Road' END AS name"
        " FROM customer"
    )


# ---------------------------------------------------------------------------
# tag_merge — X10: map merge with precedence + old_* preservation, output
# canonicalized as a sorted "k=v;..." string so the oracle is string math
# ---------------------------------------------------------------------------
def q_tag_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.conflate import merged_tags_col

    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_name")
    typo = F.concat(
        F.substring("p_name", 1, 2), F.lit("x"), F.expr("substring(p_name, 4)")
    )
    p_name_new = F.when(F.col("p_partkey") % 3 == 0, typo).otherwise(F.col("p_name"))
    df = pt.select(
        "p_partkey",
        F.map_from_arrays(
            F.array(F.lit("name"), F.lit("source")),
            F.array(p_name_new, F.lit("survey")),
        ).alias("p_tags"),
        F.map_from_arrays(
            F.array(F.lit("name"), F.lit("surface")),
            F.array(F.col("p_name"), F.lit("dirt")),
        ).alias("s_tags"),
    )
    merged = merged_tags_col()
    canon = F.concat_ws(
        ";",
        F.array_sort(
            F.transform(
                F.map_entries(merged),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            )
        ),
    )
    return df.select("p_partkey", canon.alias("tags"))


def _sql_tag_merge() -> str:
    newname = (
        "CASE WHEN p_partkey % 3 = 0 THEN"
        " substr(p_name, 1, 2) || 'x' || substr(p_name, 4)"
        " ELSE p_name END"
    )
    # merged keys sorted: name < old_name < source < surface
    return (
        "SELECT p_partkey,"
        f" CASE WHEN ({newname}) != p_name THEN"
        f" 'name=' || ({newname}) || ';old_name=' || p_name"
        " || ';source=survey;surface=dirt'"
        f" ELSE 'name=' || p_name || ';source=survey;surface=dirt' END AS tags"
        " FROM part"
    )


# ---------------------------------------------------------------------------
# slope_angle — X4: endpoint slope of two lines + inter-line angle gate
# (conflator.py:361-454; thresholds at :206-207)
# ---------------------------------------------------------------------------
def q_slope_angle(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey")
    sk = F.col("s_suppkey")

    def ln(salts: tuple[int, int, int, int]):
        x1 = F.lit(base.LON_MIN) + base.u01(sk, salts[0])
        y1 = F.lit(base.LAT_MIN) + base.u01(sk, salts[1])
        x2 = x1 + (base.u01(sk, salts[2]) - F.lit(0.5)) * F.lit(0.01)
        y2 = y1 + (base.u01(sk, salts[3]) - F.lit(0.5)) * F.lit(0.01)
        return F.array(x1, x2), F.array(y1, y2)

    xs1, ys1 = ln((11, 12, 13, 14))
    xs2, ys2 = ln((21, 22, 23, 24))
    s1 = geo.line_slope(xs1, ys1)
    s2 = geo.line_slope(xs2, ys2)
    ang = geo.angle_between(s1, s2)
    rejected = (F.abs(ang) > F.lit(20.0)) | (F.abs(s1 - s2) > F.lit(4.0))
    return sup.select(
        "s_suppkey",
        F.round(s1, 6).alias("slope1"),
        F.round(s2, 6).alias("slope2"),
        F.round(ang, 4).alias("angle"),
        rejected.alias("rejected"),
    )


def _sql_slope_angle() -> str:
    def ln_sql(salts):
        x1 = f"({geo.dlit(base.LON_MIN)} + {base.u01_sql('s_suppkey', salts[0])})"
        y1 = f"({geo.dlit(base.LAT_MIN)} + {base.u01_sql('s_suppkey', salts[1])})"
        x2 = f"({x1} + ({base.u01_sql('s_suppkey', salts[2])} - {geo.dlit(0.5)}) * {geo.dlit(0.01)})"
        y2 = f"({y1} + ({base.u01_sql('s_suppkey', salts[3])} - {geo.dlit(0.5)}) * {geo.dlit(0.01)})"
        return x1, y1, x2, y2

    ax1, ay1, ax2, ay2 = ln_sql((11, 12, 13, 14))
    bx1, by1, bx2, by2 = ln_sql((21, 22, 23, 24))
    s1 = f"(CASE WHEN ({ax2} - {ax1}) = 0 THEN {geo.dlit(0.0)} ELSE ({ay2} - {ay1}) / ({ax2} - {ax1}) END)"
    s2 = f"(CASE WHEN ({bx2} - {bx1}) = 0 THEN {geo.dlit(0.0)} ELSE ({by2} - {by1}) / ({bx2} - {bx1}) END)"
    denom = f"({geo.dlit(1.0)} + {s1} * {s2})"
    ang = (
        f"(CASE WHEN {denom} = {geo.dlit(0.0)} THEN {geo.dlit(0.0)}"
        f" ELSE degrees(atan(({s2} - {s1}) / {denom})) END)"
    )
    rej = f"(abs({ang}) > {geo.dlit(20.0)} OR abs({s1} - {s2}) > {geo.dlit(4.0)})"
    return (
        f"SELECT s_suppkey, round({s1}, 6) AS slope1, round({s2}, 6) AS slope2,"
        f" round({ang}, 4) AS angle, {rej} AS rejected FROM supplier"
    )


QUERIES = {
    "fuzzy_name": (q_fuzzy_name, _sql_fuzzy_name()),
    "ref_extract": (q_ref_extract, _sql_ref_extract()),
    "title_abbrev": (q_title_abbrev, _sql_title_abbrev()),
    "tag_merge": (q_tag_merge, _sql_tag_merge()),
    "slope_angle": (q_slope_angle, _sql_slope_angle()),
}
