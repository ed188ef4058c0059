"""Per-source ETL mappers (F8 in SURVEY §2): whole-schema conversions of the
reference's five external highway/trail datasets into OSM tagging, composed
from the X7/X8/X11/X12 component operators as single Catalyst projections.

Reference parity (each mapper cites its source):
  - mvum:     osm_merge/utilities/mvum.py:90-224 + utilities/mvum.yaml
  - roadcore: osm_merge/utilities/roadcore.py:59-140
  - trails:   osm_merge/utilities/trails.py:66-232 (NPS + USFS branches)
  - usgs:     osm_merge/utilities/usgs.py:50-213 (topo trails + highways)
  - nps:      osm_merge/utilities/nps.py:65-105

Each mapper is a pure column expression set over a raw-schema DataFrame —
one narrow projection, no shuffle, no Python; at 100 TB these run entirely
inside whole-stage codegen at scan speed. Every mapper has an exact ANSI-SQL
mirror (same module) so the DuckDB oracle reproduces the full conversion.

Documented divergences from the reference implementation (intentional —
the reference's row loops contain several string-handling bugs we do not
reproduce; each is noted at the expression it affects):
  - mvum name expansion joins expanded words with single spaces
    (mvum.py:130-135 concatenates the dict value with NO surrounding
    spaces, gluing expanded words together);
  - trails USFS access-flag suffix mapping implements the *intended*
    _ACCPT/_DISC/_MANAGED/_RESTRICTED transforms (trails.py:203-211
    compares `key[:-6] == "_ACCPT"` — prefix-vs-suffix inversion that can
    never be true, making the mapping dead code in the original);
  - trails fixes the reference's literal "bicyle"/"bicyclMAINTAINERe"
    key typos (trails.py:86,215) to "bicycle";
  - roadcore name expansion expands abbreviations in the title
    (roadcore.py:86-99 calls .replace on a still-empty string, so any
    name containing an abbreviation maps to "" in the original);
  - null-vs-missing GeoJSON properties collapse to SQL NULL (a columnar
    schema has no "key absent" state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared helpers (Spark + SQL mirrors)
# ---------------------------------------------------------------------------


def _titlecase(c: Column) -> Column:
    """Python str.title() for space-separated words (initcap(lower))."""
    return F.initcap(F.lower(c))


def _titlecase_sql(c: str) -> str:
    return (
        f"array_to_string(list_transform(string_split(lower({c}), ' '),"
        " w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ')"
    )


def _first_token(c: Column) -> Column:
    return F.element_at(F.split(c, " "), 1)


def _first_token_sql(c: str) -> str:
    return f"list_extract(string_split({c}, ' '), 1)"


def _expand_words(c: Column, abbrev: dict[str, str]) -> Column:
    """Word-level abbreviation expansion (X7), space-joined."""
    amap = F.create_map(*[F.lit(x) for kv in abbrev.items() for x in kv])
    return F.concat_ws(
        " ", F.transform(F.split(c, " "), lambda w: F.coalesce(amap[w], w))
    )


def _expand_words_sql(c: str, abbrev: dict[str, str]) -> str:
    cases = " ".join(f"WHEN w = '{k}' THEN '{v}'" for k, v in abbrev.items())
    return (
        f"array_to_string(list_transform(string_split({c}, ' '),"
        f" w -> CASE {cases} ELSE w END), ' ')"
    )


def _canon_tags(entries: dict[str, Column]) -> Column:
    """Canonical sorted 'k=v;...' tag string; null values drop out
    (concat_ws skips nulls in both Spark and DuckDB)."""
    frags = [
        F.when(v.isNotNull(), F.concat(F.lit(k + "="), v))
        for k, v in sorted(entries.items())
    ]
    return F.concat_ws(";", *frags)


def _canon_tags_sql(entries: dict[str, str]) -> str:
    frags = [
        f"(CASE WHEN ({v}) IS NOT NULL THEN '{k}=' || ({v}) END)"
        for k, v in sorted(entries.items())
    ]
    return "concat_ws(';', " + ", ".join(frags) + ")"


def _tags_map(entries: dict[str, Column]) -> Column:
    """The same entries as a real map<string,string> (API surface); keys
    are unique by construction so no dedup policy is involved."""
    structs = [
        F.struct(F.lit(k).alias("key"), v.alias("value"))
        for k, v in sorted(entries.items())
    ]
    return F.map_from_entries(
        F.filter(F.array(*structs), lambda e: e["value"].isNotNull())
    )


def _truthy(c: Column) -> Column:
    """Python truthiness for nullable strings: non-null and non-empty."""
    return c.isNotNull() & (c != F.lit(""))


def _truthy_sql(c: str) -> str:
    return f"({c} IS NOT NULL AND {c} != '')"


# ---------------------------------------------------------------------------
# MVUM (mvum.py:90-224, mvum.yaml)
# ---------------------------------------------------------------------------
# mvum.yaml "abbreviations" (title-cased forms, as seen after .title()):
MVUM_ABBREV = {
    "Cr": "Creek", "Crk": "Creek", "Cg": "Campground", "Rd": "Road",
    "Disp": "Dispersed", "Mt": "Mountain", "Mtn": "Mountain", "Lk": "Lake",
    "Resvr": "Reservoir", "Spg": "Spring", "Br": "Bridge",
    "N": "North", "W": "West", "E": "East", "S": "South", "So": "South",
}
# mvum.yaml tags.smoothness (index = first token of OPER MAINT LEVEL)
MVUM_MAINT = {"0": ("access", "unknown"), "1": ("access", "no"),
              "2": ("smoothness", "very_bad"), "3": ("smoothness", "good"),
              "4": ("smoothness", "bad"), "5": ("smoothness", "excellent")}
MVUM_SURFACE = {"NAT": "dirt", "AGG": "gravel", "AC": "gravel",
                "BST": "paved", "IMP": "compacted", "CSOIL": "compacted"}
# mvum.yaml tags.symbol (first 4 chars of the symbol name)
MVUM_SYMBOL = {"Road": ("smoothness", "very_bad"),
               "Pave": ("smoothness", "good"),
               "High": ("smoothness", "excellent"),
               "Dirt": ("surface", "dirt"), "Grav": ("surface", "gravel")}
MVUM_OPERATOR = {"BLM": "Bureau Of Land Management", "FS": "Forest Service"}
MVUM_SEASONAL = {"yearlong": "no", "yes": "yes", "no": "no"}


def _mvum_name(name_col: Column) -> Column:
    """NAME → OSM name (mvum.py:126-144): title-case, expand abbreviations,
    append ' Road' unless already present past position 0 (find() <= 0 ⇔
    1-based locate <= 1), escape '<50' for osmium."""
    expanded = _expand_words(_titlecase(name_col), MVUM_ABBREV)
    roadified = F.when(
        F.locate(" Road", expanded) <= 1, F.concat(expanded, F.lit(" Road"))
    ).otherwise(expanded)
    return F.replace(roadified, F.lit("<50"), F.lit("&lt;50"))


def _mvum_name_sql(name_col: str) -> str:
    expanded = _expand_words_sql(_titlecase_sql(name_col), MVUM_ABBREV)
    return (
        f"replace(CASE WHEN strpos({expanded}, ' Road') <= 1"
        f" THEN {expanded} || ' Road' ELSE {expanded} END, '<50', '&lt;50')"
    )


def _pair_case(tok: Column, mapping: dict[str, tuple[str, str]],
               want_key: str) -> Column:
    """Value for want_key from a (token → (key, value)) table, else null."""
    expr = F.lit(None).cast("string")
    for t, (k, v) in mapping.items():
        if k == want_key:
            expr = F.when(tok == F.lit(t), F.lit(v)).otherwise(expr)
    return expr


def _pair_case_sql(tok: str, mapping: dict[str, tuple[str, str]],
                   want_key: str) -> str:
    whens = " ".join(
        f"WHEN ({tok}) = '{t}' THEN '{v}'"
        for t, (k, v) in mapping.items() if k == want_key
    )
    return f"(CASE {whens} ELSE NULL END)" if whens else "NULL"


def mvum_entries(
    id_c: Column, name_c: Column, maint_c: Column, maintainer_c: Column,
    surface_c: Column, symbol_c: Column, hcv_c: Column, seasonal_c: Column,
) -> tuple[dict[str, Column], Column]:
    """(tag entries, keep predicate) for one MVUM/RoadCore-format row.

    Column roles map to both header spellings (MVUM:
    OPERATIONALMAINTLEVEL/SURFACETYPE/SBS_SYMBOL_NAME/HIGHCLEARANCEVEHICLE,
    RoadCore: OPER_MAINT_LEVEL/SURFACE_TYPE/SYMBOL_NAME/
    HIGH_CLEARANCE_VEHICLE) — the reference picks per-row (mvum.py:115-118);
    columnar schemas fix it per-table, so callers pass the right columns.
    """
    ref0 = F.when(id_c.isNotNull(), F.upper(F.concat(F.lit("FR "), id_c)))
    maint_tok = _first_token(maint_c)
    sym4 = F.substring(symbol_c, 1, 4)
    sym_on = _truthy(symbol_c)

    # symbol-block ref rewrite (mvum.py:196-202): plain 5-digit ref → drop
    # the 2-digit region prefix, flag for validation
    ref_num = F.element_at(F.split(ref0, " "), 2)
    ref_fix = sym_on & ref_num.rlike("^[0-9]{5}$")
    ref = F.when(ref_fix, F.concat(F.lit("FR "), F.substring(ref_num, 3, 3))) \
        .otherwise(ref0)
    note = F.when(ref_fix, F.lit("Validate this changed ref!"))

    maint_smooth = _pair_case(maint_tok, MVUM_MAINT, "smoothness")
    maint_access = _pair_case(maint_tok, MVUM_MAINT, "access")
    sym_smooth = F.when(sym_on, _pair_case(sym4, MVUM_SYMBOL, "smoothness"))
    sym_surface = F.when(sym_on, _pair_case(sym4, MVUM_SYMBOL, "surface"))
    surf_tok = _first_token(surface_c)
    surf_map = F.create_map(
        *[F.lit(x) for kv in MVUM_SURFACE.items() for x in kv]
    )
    raw_surface = F.when(_truthy(surface_c), surf_map[surf_tok])

    op_tok = _first_token(maintainer_c)
    op_map = F.create_map(
        *[F.lit(x) for kv in MVUM_OPERATOR.items() for x in kv]
    )
    operator = F.when(~_truthy(maintainer_c), F.lit("US Forest Service")) \
        .otherwise(op_map[op_tok])

    seas_map = F.create_map(
        *[F.lit(x) for kv in MVUM_SEASONAL.items() for x in kv]
    )
    seasonal = F.when(_truthy(seasonal_c), seas_map[seasonal_c])

    fourwd = F.when(
        (maint_tok == F.lit("2")) | _truthy(hcv_c), F.lit("yes")
    )

    entries = {
        "ref:usfs": ref,
        "name": F.when(name_c.isNotNull(), _mvum_name(name_c)),
        "note": note,
        "access": maint_access,
        # symbol block runs after the maint-level block and overwrites
        # (mvum.py:191-195 assigns unconditionally)
        "smoothness": F.coalesce(sym_smooth, maint_smooth),
        "surface": F.coalesce(sym_surface, raw_surface),
        "operator": operator,
        "seasonal": seasonal,
        "4wd_only": fourwd,
        "highway": F.lit("unclassified"),
    }
    # reference `continue`s that drop the whole feature:
    keep = (
        # degenerate maint-level value (mvum.py:152-153)
        ~(maint_c.isNotNull() & (F.length(maint_c) <= 1))
        # single-space surface (mvum.py:179-180)
        & ~(_truthy(surface_c) & (surface_c == F.lit(" ")))
        # symbol present but no usable ref to rewrite (mvum.py:196-197)
        & ~(sym_on & (ref0.isNull() | (F.size(F.split(ref0, " ")) <= 1)))
    )
    return entries, keep


def mvum_entries_sql(
    id_c: str, name_c: str, maint_c: str, maintainer_c: str,
    surface_c: str, symbol_c: str, hcv_c: str, seasonal_c: str,
) -> tuple[dict[str, str], str]:
    """Exact SQL mirror of mvum_entries."""
    ref0 = f"(CASE WHEN {id_c} IS NOT NULL THEN upper('FR ' || {id_c}) END)"
    maint_tok = _first_token_sql(maint_c)
    sym4 = f"substr({symbol_c}, 1, 4)"
    sym_on = _truthy_sql(symbol_c)
    ref_num = f"list_extract(string_split({ref0}, ' '), 2)"
    ref_fix = f"({sym_on} AND regexp_matches({ref_num}, '^[0-9]{{5}}$'))"
    ref = (
        f"(CASE WHEN {ref_fix} THEN 'FR ' || substr({ref_num}, 3, 3)"
        f" ELSE {ref0} END)"
    )
    note = f"(CASE WHEN {ref_fix} THEN 'Validate this changed ref!' END)"

    maint_smooth = _pair_case_sql(maint_tok, MVUM_MAINT, "smoothness")
    maint_access = _pair_case_sql(maint_tok, MVUM_MAINT, "access")
    sym_smooth = f"(CASE WHEN {sym_on} THEN {_pair_case_sql(sym4, MVUM_SYMBOL, 'smoothness')} END)"
    sym_surface = f"(CASE WHEN {sym_on} THEN {_pair_case_sql(sym4, MVUM_SYMBOL, 'surface')} END)"
    surf_tok = _first_token_sql(surface_c)
    surf_whens = " ".join(
        f"WHEN ({surf_tok}) = '{k}' THEN '{v}'" for k, v in MVUM_SURFACE.items()
    )
    raw_surface = (
        f"(CASE WHEN {_truthy_sql(surface_c)} THEN"
        f" (CASE {surf_whens} ELSE NULL END) END)"
    )
    op_tok = _first_token_sql(maintainer_c)
    op_whens = " ".join(
        f"WHEN ({op_tok}) = '{k}' THEN '{v}'" for k, v in MVUM_OPERATOR.items()
    )
    operator = (
        f"(CASE WHEN NOT {_truthy_sql(maintainer_c)} THEN 'US Forest Service'"
        f" ELSE (CASE {op_whens} ELSE NULL END) END)"
    )
    seas_whens = " ".join(
        f"WHEN ({seasonal_c}) = '{k}' THEN '{v}'"
        for k, v in MVUM_SEASONAL.items()
    )
    seasonal = (
        f"(CASE WHEN {_truthy_sql(seasonal_c)} THEN"
        f" (CASE {seas_whens} ELSE NULL END) END)"
    )
    fourwd = (
        f"(CASE WHEN ({maint_tok}) = '2' OR {_truthy_sql(hcv_c)}"
        " THEN 'yes' END)"
    )
    entries = {
        "ref:usfs": ref,
        "name": f"(CASE WHEN {name_c} IS NOT NULL THEN {_mvum_name_sql(name_c)} END)",
        "note": note,
        "access": maint_access,
        "smoothness": f"coalesce({sym_smooth}, {maint_smooth})",
        "surface": f"coalesce({sym_surface}, {raw_surface})",
        "operator": operator,
        "seasonal": seasonal,
        "4wd_only": fourwd,
        "highway": "'unclassified'",
    }
    keep = (
        f"(NOT ({maint_c} IS NOT NULL AND length({maint_c}) <= 1)"
        f" AND NOT ({_truthy_sql(surface_c)} AND {surface_c} = ' ')"
        f" AND NOT ({sym_on} AND ({ref0} IS NULL"
        f" OR len(string_split({ref0}, ' ')) <= 1)))"
    )
    return entries, keep


def etl_mvum(df: DataFrame, id_col: str = "rid") -> DataFrame:
    """MVUM raw schema → (id, tags map, tags_canon). Expects columns ID,
    NAME, OPERATIONALMAINTLEVEL, PRIMARY_MAINTAINER, SURFACETYPE,
    SBS_SYMBOL_NAME, HIGHCLEARANCEVEHICLE, SEASONAL (all nullable string).
    """
    entries, keep = mvum_entries(
        F.col("ID"), F.col("NAME"), F.col("OPERATIONALMAINTLEVEL"),
        F.col("PRIMARY_MAINTAINER"), F.col("SURFACETYPE"),
        F.col("SBS_SYMBOL_NAME"), F.col("HIGHCLEARANCEVEHICLE"),
        F.col("SEASONAL"),
    )
    return df.filter(keep).select(
        id_col, _tags_map(entries).alias("tags"),
        _canon_tags(entries).alias("tags_canon"),
    )


# ---------------------------------------------------------------------------
# RoadCore (roadcore.py:59-140)
# ---------------------------------------------------------------------------
ROADCORE_ABBREV = {"Cr": "Creek", "Cg": "Campground", "Rd": "Road",
                   "Mtn": "Mountain"}
# roadcore.py:101-114: note 'very bad' WITH A SPACE (unlike mvum.yaml) —
# visible in the shipped mvum-test.geojson fixture properties.
ROADCORE_MAINT = {"1": ("access", "no"), "2": ("smoothness", "very bad"),
                  "3": ("smoothness", "good"), "4": ("smoothness", "bad"),
                  "5": ("smoothness", "excellent")}


def roadcore_entries(id_c: Column, name_c: Column, maint_c: Column,
                     surface_c: Column) -> dict[str, Column]:
    title = _titlecase(name_c)
    # intended semantics of roadcore.py:86-95 (the original replaces on an
    # empty string — see module docstring): expand abbreviations in the
    # title, then append ' Road' when absent past position 0 (:96-97)
    expanded = _expand_words(title, ROADCORE_ABBREV)
    name = F.when(
        F.locate("Road", expanded) <= 1, F.concat(expanded, F.lit(" Road"))
    ).otherwise(expanded)

    maint1 = F.substring(maint_c, 1, 1)
    s3 = F.substring(surface_c, 1, 3)
    surface = (
        F.when(s3 == F.lit("NAT"), F.lit("dirt"))
        # IMP/CSOIL: roadcore.py:127-129 assigns gravel then immediately
        # overwrites with compacted — net effect is compacted
        .when(s3 == F.lit("IMP"), F.lit("compacted"))
        .when(F.substring(surface_c, 1, 5) == F.lit("CSOIL"), F.lit("compacted"))
        .when(s3 == F.lit("AGG"), F.lit("gravel"))
        .when(F.substring(surface_c, 1, 2) == F.lit("AC"), F.lit("gravel"))
        .when(s3 == F.lit("BST"), F.lit("paved"))
        .when(F.substring(surface_c, 1, 2) == F.lit("P "), F.lit("paved"))
    )
    return {
        "ref:usfs": F.when(id_c.isNotNull(), F.concat(F.lit("FR "), id_c)),
        "name": F.when(name_c.isNotNull(), name),
        "access": F.when(maint1 == F.lit("1"), F.lit("no")),
        "smoothness": _pair_case(maint1, ROADCORE_MAINT, "smoothness"),
        "surface": surface,
    }


def roadcore_entries_sql(id_c: str, name_c: str, maint_c: str,
                         surface_c: str) -> dict[str, str]:
    title = _titlecase_sql(name_c)
    expanded = _expand_words_sql(title, ROADCORE_ABBREV)
    name = (
        f"(CASE WHEN strpos({expanded}, 'Road') <= 1"
        f" THEN {expanded} || ' Road' ELSE {expanded} END)"
    )
    maint1 = f"substr({maint_c}, 1, 1)"
    s3 = f"substr({surface_c}, 1, 3)"
    surface = (
        f"(CASE WHEN {s3} = 'NAT' THEN 'dirt'"
        f" WHEN {s3} = 'IMP' THEN 'compacted'"
        f" WHEN substr({surface_c}, 1, 5) = 'CSOIL' THEN 'compacted'"
        f" WHEN {s3} = 'AGG' THEN 'gravel'"
        f" WHEN substr({surface_c}, 1, 2) = 'AC' THEN 'gravel'"
        f" WHEN {s3} = 'BST' THEN 'paved'"
        f" WHEN substr({surface_c}, 1, 2) = 'P ' THEN 'paved' END)"
    )
    smooth_whens = " ".join(
        f"WHEN ({maint1}) = '{t}' THEN '{v}'"
        for t, (k, v) in ROADCORE_MAINT.items() if k == "smoothness"
    )
    return {
        "ref:usfs": f"(CASE WHEN {id_c} IS NOT NULL THEN 'FR ' || {id_c} END)",
        "name": f"(CASE WHEN {name_c} IS NOT NULL THEN {name} END)",
        "access": f"(CASE WHEN ({maint1}) = '1' THEN 'no' END)",
        "smoothness": f"(CASE {smooth_whens} ELSE NULL END)",
        "surface": surface,
    }


def etl_roadcore(df: DataFrame, id_col: str = "rid") -> DataFrame:
    """RoadCore raw schema → (id, tags map, tags_canon). Expects columns
    ID, NAME, OPER_MAINT, SURFACE_TY."""
    entries = roadcore_entries(
        F.col("ID"), F.col("NAME"), F.col("OPER_MAINT"), F.col("SURFACE_TY")
    )
    return df.select(
        id_col, _tags_map(entries).alias("tags"),
        _canon_tags(entries).alias("tags_canon"),
    )


# ---------------------------------------------------------------------------
# NPS (nps.py:65-105)
# ---------------------------------------------------------------------------
def nps_entries(mapsource_c: Column, trlname_c: Column, trlsurface_c: Column,
                seasonal_c: Column) -> dict[str, Column]:
    return {
        "source": F.when(mapsource_c.isNotNull(), mapsource_c),
        "name": F.when(trlname_c.isNotNull(), _titlecase(trlname_c)),
        "surface": F.when(trlsurface_c.isNotNull(), F.lower(trlsurface_c)),
        "seasonal": F.when(seasonal_c.isNotNull(), F.lower(seasonal_c)),
    }


def nps_entries_sql(mapsource_c: str, trlname_c: str, trlsurface_c: str,
                    seasonal_c: str) -> dict[str, str]:
    return {
        "source": mapsource_c,
        "name": (
            f"(CASE WHEN {trlname_c} IS NOT NULL"
            f" THEN {_titlecase_sql(trlname_c)} END)"
        ),
        "surface": f"lower({trlsurface_c})",
        "seasonal": f"lower({seasonal_c})",
    }


def etl_nps(df: DataFrame, id_col: str = "rid") -> DataFrame:
    """NPS raw schema → (id, tags map, tags_canon); drops all-empty rows
    (nps.py:100-101). Expects MAPSOURCE, TRLNAME, TRLSURFACE, SEASONAL."""
    entries = nps_entries(
        F.col("MAPSOURCE"), F.col("TRLNAME"), F.col("TRLSURFACE"),
        F.col("SEASONAL"),
    )
    canon = _canon_tags(entries)
    return df.select(
        id_col, _tags_map(entries).alias("tags"), canon.alias("tags_canon")
    ).filter(F.length("tags_canon") > 0)


# ---------------------------------------------------------------------------
# Trails (trails.py:66-232) — NPS branch (MAINTAINER present) + USFS branch
# ---------------------------------------------------------------------------
# TRLUSE '|'-separated usage → tag (trails.py:107-151; the distinct flags)
TRLUSE_TAGS = {
    "Bike": ("bicycle", "yes"), "Bicycle": ("bicycle", "yes"),
    "ATV": ("atv", "yes"), "Motorcycle": ("motorcycle", "yes"),
    "ADA": ("wheelchair", "yes"),
    "Bicycle/Motorized": ("bicycle", "yes"),
    "Cross-Country Ski": ("ski", "yes"), "Dog Sled": ("dog_sled", "yes"),
    "Snowmobile": ("snowmobile", "yes"), "Snowshoe": ("snowshoe", "yes"),
    "Motorized": ("motor_vehicle", "yes"),
    "Wheelchair Accessible Trail": ("wheelchair", "yes"),
}
TRAILS_SURFACE_TYPES = ["metal", "rubber", "snow", "clay", "brick",
                        "concrete", "asphalt", "wood", "sand"]


def _trluse_flag(trluse_c: Column, usages: list[str]) -> Column:
    """'yes' when any '|'-separated TRLUSE token is in usages."""
    arr = F.array(*[F.lit(u) for u in usages])
    hit = F.exists(
        F.split(F.trim(trluse_c), r"\|"),
        lambda u: F.array_contains(arr, F.trim(u)),
    )
    return F.when(trluse_c.isNotNull() & hit, F.lit("yes"))


def _trluse_flag_sql(trluse_c: str, usages: list[str]) -> str:
    lits = "', '".join(usages)
    return (
        f"(CASE WHEN {trluse_c} IS NOT NULL AND len(list_filter("
        f"string_split(trim({trluse_c}), '|'),"
        f" u -> trim(u) IN ('{lits}'))) > 0 THEN 'yes' END)"
    )


def trails_nps_entries(maintainer_c: Column, trlname_c: Column,
                       trlaltname_c: Column, trluse_c: Column,
                       trlsurface_c: Column, seasonal_c: Column
                       ) -> dict[str, Column]:
    """NPS trail branch (trails.py:88-178). Defaults: highway=path,
    foot=designated, bicycle=no, motor_vehicle=no (:85-88, typo fixed) —
    usage flags overwrite the defaults."""
    surf = F.lower(trlsurface_c)
    surface = (
        F.when(F.substring(surf, 1, 6) == F.lit("gravel"), F.lit("gravel"))
        .when(surf.isin("earth", "dirt", "soil"), F.lit("dirt"))
        .when(surf.isin(*TRAILS_SURFACE_TYPES), surf)
        # trails.py:171-176 compares 'Native'/'Aggregate'/'Bituminous'
        # against the lowercased value — dead branches, not reproduced
    )
    bicycle = F.coalesce(
        _trluse_flag(trluse_c, ["Bike", "Bicycle", "Bicycle/Motorized",
                                "Foot/Bicycle/Motorized",
                                "Horse, Hiking, and Bicycle"]),
        F.lit("no"),
    )
    motor = F.coalesce(
        _trluse_flag(trluse_c, ["Bicycle/Motorized", "Foot/Bicycle/Motorized",
                                "Horse/Motorized", "Motorized"]),
        F.lit("no"),
    )
    horse = F.coalesce(
        _trluse_flag(trluse_c, ["Horse and Hiking", "Horse/Hiking",
                                "Horse, Hiking, and Bicycle",
                                "Horse/Motorized"]),
        # usage.find("Saddle") > 0 (trails.py:117)
        F.when(
            trluse_c.isNotNull() & (F.locate("Saddle", trluse_c) > 1),
            F.lit("yes"),
        ),
    )
    fourwd = F.when(
        trluse_c.isNotNull() & (F.locate("Four-Wheel", trluse_c) > 1),
        F.lit("yes"),
    )
    atv = _trluse_flag(trluse_c, ["ATV"])
    atv = F.coalesce(
        atv,
        F.when(
            trluse_c.isNotNull()
            & F.exists(
                F.split(F.trim(trluse_c), r"\|"),
                lambda u: F.substring(F.trim(u), 1, 12) == F.lit("All-Terrain "),
            ),
            F.lit("yes"),
        ),
    )
    return {
        "highway": F.lit("path"),
        "foot": F.lit("designated"),
        "operator": maintainer_c,
        "name": trlname_c,
        "alt_name": F.when(
            trlaltname_c.isNotNull() & (trlaltname_c != F.lit("Unknown")),
            _titlecase(trlaltname_c),
        ),
        "bicycle": bicycle,
        "motor_vehicle": motor,
        "atv": atv,
        "motorcycle": _trluse_flag(trluse_c, ["Motorcycle"]),
        "wheelchair": _trluse_flag(
            trluse_c, ["ADA", "Wheelchair Accessible Trail"]
        ),
        "horse": horse,
        "ski": _trluse_flag(trluse_c, ["Cross-Country Ski"]),
        "dog_sled": _trluse_flag(trluse_c, ["Dog Sled"]),
        "snowmobile": _trluse_flag(trluse_c, ["Snowmobile"]),
        "snowshoe": _trluse_flag(trluse_c, ["Snowshoe"]),
        "4wd_only": fourwd,
        "surface": surface,
        "seasonal": F.when(_truthy(seasonal_c), F.lit("yes")),
    }


def trails_nps_entries_sql(maintainer_c: str, trlname_c: str,
                           trlaltname_c: str, trluse_c: str,
                           trlsurface_c: str, seasonal_c: str
                           ) -> dict[str, str]:
    surf = f"lower({trlsurface_c})"
    types = "', '".join(TRAILS_SURFACE_TYPES)
    surface = (
        f"(CASE WHEN substr({surf}, 1, 6) = 'gravel' THEN 'gravel'"
        f" WHEN {surf} IN ('earth', 'dirt', 'soil') THEN 'dirt'"
        f" WHEN {surf} IN ('{types}') THEN {surf} END)"
    )
    bicycle = _trluse_flag_sql(
        trluse_c, ["Bike", "Bicycle", "Bicycle/Motorized",
                   "Foot/Bicycle/Motorized", "Horse, Hiking, and Bicycle"])
    motor = _trluse_flag_sql(
        trluse_c, ["Bicycle/Motorized", "Foot/Bicycle/Motorized",
                   "Horse/Motorized", "Motorized"])
    horse_list = _trluse_flag_sql(
        trluse_c, ["Horse and Hiking", "Horse/Hiking",
                   "Horse, Hiking, and Bicycle", "Horse/Motorized"])
    horse = (
        f"coalesce({horse_list}, (CASE WHEN {trluse_c} IS NOT NULL"
        f" AND strpos({trluse_c}, 'Saddle') > 1 THEN 'yes' END))"
    )
    atv = (
        f"coalesce({_trluse_flag_sql(trluse_c, ['ATV'])},"
        f" (CASE WHEN {trluse_c} IS NOT NULL AND len(list_filter("
        f"string_split(trim({trluse_c}), '|'),"
        " u -> substr(trim(u), 1, 12) = 'All-Terrain ')) > 0"
        " THEN 'yes' END))"
    )
    return {
        "highway": "'path'",
        "foot": "'designated'",
        "operator": maintainer_c,
        "name": trlname_c,
        "alt_name": (
            f"(CASE WHEN {trlaltname_c} IS NOT NULL AND"
            f" {trlaltname_c} != 'Unknown'"
            f" THEN {_titlecase_sql(trlaltname_c)} END)"
        ),
        "bicycle": f"coalesce({bicycle}, 'no')",
        "motor_vehicle": f"coalesce({motor}, 'no')",
        "atv": atv,
        "motorcycle": _trluse_flag_sql(trluse_c, ["Motorcycle"]),
        "wheelchair": _trluse_flag_sql(
            trluse_c, ["ADA", "Wheelchair Accessible Trail"]),
        "horse": horse,
        "ski": _trluse_flag_sql(trluse_c, ["Cross-Country Ski"]),
        "dog_sled": _trluse_flag_sql(trluse_c, ["Dog Sled"]),
        "snowmobile": _trluse_flag_sql(trluse_c, ["Snowmobile"]),
        "snowshoe": _trluse_flag_sql(trluse_c, ["Snowshoe"]),
        "4wd_only": (
            f"(CASE WHEN {trluse_c} IS NOT NULL AND"
            f" strpos({trluse_c}, 'Four-Wheel') > 1 THEN 'yes' END)"
        ),
        "surface": surface,
        "seasonal": f"(CASE WHEN {_truthy_sql(seasonal_c)} THEN 'yes' END)",
    }


def etl_trails_nps(df: DataFrame, id_col: str = "rid") -> DataFrame:
    """NPS-trail schema → (id, tags map, tags_canon). Expects MAINTAINER,
    TRLNAME, TRLALTNAME, TRLUSE, TRLSURFACE, SEASONAL."""
    entries = trails_nps_entries(
        F.col("MAINTAINER"), F.col("TRLNAME"), F.col("TRLALTNAME"),
        F.col("TRLUSE"), F.col("TRLSURFACE"), F.col("SEASONAL"),
    )
    return df.select(
        id_col, _tags_map(entries).alias("tags"),
        _canon_tags(entries).alias("tags_canon"),
    )


# USFS trail access-flag columns → OSM key (trails.py:212-228 prefixes)
USFS_FLAG_KEYS = {
    "HIKER_PEDESTRIAN": "foot", "SNOWMOBILE": "snowmobile",
    "BICYCLE": "bicycle", "ATV": "atv", "MOTORCYCLE": "motorcycle",
    "PACK_SADDLE": "horse", "SNOWSHOE": "snowshoe", "XCOUNTRY_SKI": "ski",
}
# intended suffix → value mapping (trails.py:203-211; see module docstring)
USFS_SUFFIX_VALUES = {
    "_MANAGED": "designated", "_ACCPT_DISC": "permissive",
    "_ACCPT": "yes", "_DISC": "discouraged", "_RESTRICTED": "no",
}


def trails_usfs_entries(trail_no_c: Column, trail_name_c: Column,
                        flag_cols: dict[str, Column]) -> dict[str, Column]:
    """USFS trail branch (trails.py:179-228). flag_cols maps raw column
    names like HIKER_PEDESTRIAN_MANAGED → their columns ('Y'/'N'/null);
    the suffix picks the OSM value, the prefix picks the OSM key. Later
    (more specific) suffixes win within one key, matching dict order."""
    entries: dict[str, Column] = {
        "highway": F.lit("path"),
        "operator": F.lit("US Forest Service"),
        "ref:usfs": F.when(
            trail_no_c.isNotNull(),
            F.upper(F.concat(F.lit("FR "), trail_no_c)),
        ),
        "name": F.when(trail_name_c.isNotNull(), _titlecase(trail_name_c)),
        "foot": F.lit("designated"),
        "bicycle": F.lit("no"),
        "motor_vehicle": F.lit("no"),
    }
    for raw_name, col in flag_cols.items():
        osm_key = None
        osm_val = None
        for prefix, key in USFS_FLAG_KEYS.items():
            if raw_name.startswith(prefix):
                osm_key = key
                suffix = raw_name[len(prefix):]
                osm_val = USFS_SUFFIX_VALUES.get(suffix, "yes")
                break
        if osm_key is None:
            continue
        flagged = F.when(col == F.lit("Y"), F.lit(osm_val))
        prev = entries.get(osm_key)
        entries[osm_key] = F.coalesce(flagged, prev) if prev is not None \
            else flagged
    return entries


def trails_usfs_entries_sql(trail_no_c: str, trail_name_c: str,
                            flag_cols: dict[str, str]) -> dict[str, str]:
    """Exact SQL mirror of trails_usfs_entries."""
    entries: dict[str, str] = {
        "highway": "'path'",
        "operator": "'US Forest Service'",
        "ref:usfs": (
            f"(CASE WHEN {trail_no_c} IS NOT NULL"
            f" THEN upper('FR ' || {trail_no_c}) END)"
        ),
        "name": (
            f"(CASE WHEN {trail_name_c} IS NOT NULL"
            f" THEN {_titlecase_sql(trail_name_c)} END)"
        ),
        "foot": "'designated'",
        "bicycle": "'no'",
        "motor_vehicle": "'no'",
    }
    for raw_name, col in flag_cols.items():
        osm_key = None
        osm_val = None
        for prefix, key in USFS_FLAG_KEYS.items():
            if raw_name.startswith(prefix):
                osm_key = key
                osm_val = USFS_SUFFIX_VALUES.get(raw_name[len(prefix):], "yes")
                break
        if osm_key is None:
            continue
        flagged = f"(CASE WHEN {col} = 'Y' THEN '{osm_val}' END)"
        prev = entries.get(osm_key)
        entries[osm_key] = f"coalesce({flagged}, {prev})" \
            if prev is not None else flagged
    return entries


def etl_trails_usfs(df: DataFrame, id_col: str = "rid",
                    flag_col_names: list[str] = ()) -> DataFrame:
    """USFS-trail schema → (id, tags map, tags_canon). Expects TRAIL_NO,
    TRAIL_NAME plus any access-flag columns named <PREFIX><SUFFIX>."""
    entries = trails_usfs_entries(
        F.col("TRAIL_NO"), F.col("TRAIL_NAME"),
        {c: F.col(c) for c in flag_col_names},
    )
    return df.select(
        id_col, _tags_map(entries).alias("tags"),
        _canon_tags(entries).alias("tags_canon"),
    )


# ---------------------------------------------------------------------------
# USGS topo (usgs.py:50-213) — highways branch (the topo-test.geojson shape)
# ---------------------------------------------------------------------------
def usgs_highway_entries(name_c: Column, source_c: Column,
                         us_route_c: Column, county_route_c: Column,
                         state_route_c: Column, federal_c: Column,
                         state: str = "WY") -> tuple[dict[str, Column], Column]:
    """USGS topo highways (usgs.py:148-213): route-number refs by priority,
    then name-prefix rewrites (USFS Rd/Rd/Co Rd/...), else title-case +
    abbreviation expansion. Returns (entries, keep): rows without a name
    are dropped (usgs.py:178-179)."""
    nm = name_c
    # ref priority: federal_la overrides state_rout overrides county_rou
    # overrides us_route (later assignments win in the reference loop)
    ref = F.coalesce(
        F.when(state_route_c.isNotNull(),
               F.concat(F.lit(state + " "), state_route_c)),
        F.when(county_route_c.isNotNull(),
               F.concat(F.lit("US "), county_route_c)),
        F.when(us_route_c.isNotNull(), F.concat(F.lit("US "), us_route_c)),
    )
    ref_usfs0 = F.when(federal_c.isNotNull(),
                       F.concat(F.lit("FR "), federal_c))

    is_usfs = F.substring(nm, 1, 8) == F.lit("USFS Rd ")
    is_rd = F.substring(nm, 1, 3) == F.lit("Rd ")
    is_cord = F.substring(nm, 1, 6) == F.lit("Co Rd ")
    # expansion table mirrors usgs.py:199-208 (word-level, sane spacing)
    expanded = _expand_words(
        _titlecase(nm),
        {"Rd": "Road", "Hwy": "Highway", "Ln": "Lane", "Mnt": "Mountain",
         "E": "East", "W": "West", "N": "North", "S": "South"},
    )
    def tail(start: int) -> Column:
        # substring-from (Column-safe: nm may be a map access, not a
        # physical column named 'name')
        return nm.substr(F.lit(start), F.length(nm))

    name = (
        F.when(nm.isNull() | is_usfs, F.lit(None).cast("string"))
        .when(is_rd, F.concat(F.lit("County Road "), tail(4)))
        .when(is_cord, F.concat(F.lit("County Road "), tail(7)))
        # null guard required: Spark's concat_ws collapses a null words
        # array to '' while the SQL mirror keeps NULL
        .otherwise(expanded)
    )
    ref_final = (
        F.when(is_rd, F.concat(F.lit("CR "), tail(4)))
        .when(is_cord, F.concat(F.lit("CR "), tail(7)))
        .otherwise(ref)
    )
    ref_usfs = F.when(
        is_usfs, F.concat(F.lit("FR "), tail(9))
    ).otherwise(ref_usfs0)
    entries = {
        "highway": F.lit("unclassified"),
        "source": source_c,
        "ref": ref_final,
        "ref:usfs": ref_usfs,
        "name": name,
    }
    # usgs.py:178-179 drops rows whose properties lack the 'name' KEY; a
    # columnar schema cannot distinguish key-absent from null, and the
    # highway default makes props non-empty, so all rows are kept here.
    return entries, F.lit(True)


def usgs_highway_entries_sql(name_c: str, source_c: str, us_route_c: str,
                             county_route_c: str, state_route_c: str,
                             federal_c: str, state: str = "WY"
                             ) -> tuple[dict[str, str], str]:
    nm = name_c
    ref = (
        "coalesce("
        f"(CASE WHEN {state_route_c} IS NOT NULL THEN '{state} ' || {state_route_c} END), "
        f"(CASE WHEN {county_route_c} IS NOT NULL THEN 'US ' || {county_route_c} END), "
        f"(CASE WHEN {us_route_c} IS NOT NULL THEN 'US ' || {us_route_c} END))"
    )
    ref_usfs0 = f"(CASE WHEN {federal_c} IS NOT NULL THEN 'FR ' || {federal_c} END)"
    is_usfs = f"(substr({nm}, 1, 8) = 'USFS Rd ')"
    is_rd = f"(substr({nm}, 1, 3) = 'Rd ')"
    is_cord = f"(substr({nm}, 1, 6) = 'Co Rd ')"
    expanded = _expand_words_sql(
        _titlecase_sql(nm),
        {"Rd": "Road", "Hwy": "Highway", "Ln": "Lane", "Mnt": "Mountain",
         "E": "East", "W": "West", "N": "North", "S": "South"},
    )
    name = (
        f"(CASE WHEN {is_usfs} THEN NULL"
        f" WHEN {is_rd} THEN 'County Road ' || substr({nm}, 4)"
        f" WHEN {is_cord} THEN 'County Road ' || substr({nm}, 7)"
        f" ELSE {expanded} END)"
    )
    ref_final = (
        f"(CASE WHEN {is_rd} THEN 'CR ' || substr({nm}, 4)"
        f" WHEN {is_cord} THEN 'CR ' || substr({nm}, 7)"
        f" ELSE {ref} END)"
    )
    ref_usfs = (
        f"(CASE WHEN {is_usfs} THEN 'FR ' || substr({nm}, 9)"
        f" ELSE {ref_usfs0} END)"
    )
    entries = {
        "highway": "'unclassified'",
        "source": source_c,
        "ref": ref_final,
        "ref:usfs": ref_usfs,
        "name": name,
    }
    return entries, "TRUE"


def etl_usgs_highways(df: DataFrame, id_col: str = "rid",
                      state: str = "WY") -> DataFrame:
    """USGS topo highway schema → (id, tags map, tags_canon). Expects
    name, source_ori, us_route, county_rou, state_rout, federal_la."""
    entries, keep = usgs_highway_entries(
        F.col("name"), F.col("source_ori"), F.col("us_route"),
        F.col("county_rou"), F.col("state_rout"), F.col("federal_la"),
        state=state,
    )
    return df.filter(keep).select(
        id_col, _tags_map(entries).alias("tags"),
        _canon_tags(entries).alias("tags_canon"),
    )


def usgs_trail_entries(name_c: Column, sourceorig_c: Column,
                       trailnumber_c: Column,
                       flag_cols: dict[str, Column]) -> dict[str, Column]:
    """USGS topo trails branch (usgs.py:79-147): Y-flags → designated,
    snowshoe → piste:type=hike, crosscount → ski + piste:type=nordic."""
    entries: dict[str, Column] = {
        "highway": F.lit("path"),
        "name": name_c,
        "source": sourceorig_c,
        "ref:usfs": trailnumber_c,
    }
    simple = {"bicycle": "bicycle", "atv": "atv", "packsaddle": "horse",
              "motorcycle": "motorcycle", "snowmobile": "snowmobile",
              "motorizedw": "motorized"}
    for raw, key in simple.items():
        if raw in flag_cols:
            entries[key] = F.when(
                flag_cols[raw] == F.lit("Y"), F.lit("designated")
            )
    if "snowshoe" in flag_cols:
        entries["piste:type"] = F.when(
            flag_cols["snowshoe"] == F.lit("Y"), F.lit("hike")
        )
    if "crosscount" in flag_cols:
        entries["ski"] = F.when(
            flag_cols["crosscount"] == F.lit("Y"), F.lit("yes")
        )
        nordic = F.when(flag_cols["crosscount"] == F.lit("Y"), F.lit("nordic"))
        prev = entries.get("piste:type")
        entries["piste:type"] = F.coalesce(nordic, prev) \
            if prev is not None else nordic
    return entries


def usgs_trail_entries_sql(name_c: str, sourceorig_c: str,
                           trailnumber_c: str,
                           flag_cols: dict[str, str]) -> dict[str, str]:
    """Exact SQL mirror of usgs_trail_entries."""
    entries: dict[str, str] = {
        "highway": "'path'",
        "name": name_c,
        "source": sourceorig_c,
        "ref:usfs": trailnumber_c,
    }
    simple = {"bicycle": "bicycle", "atv": "atv", "packsaddle": "horse",
              "motorcycle": "motorcycle", "snowmobile": "snowmobile",
              "motorizedw": "motorized"}
    for raw, key in simple.items():
        if raw in flag_cols:
            entries[key] = (
                f"(CASE WHEN {flag_cols[raw]} = 'Y' THEN 'designated' END)"
            )
    if "snowshoe" in flag_cols:
        entries["piste:type"] = (
            f"(CASE WHEN {flag_cols['snowshoe']} = 'Y' THEN 'hike' END)"
        )
    if "crosscount" in flag_cols:
        entries["ski"] = (
            f"(CASE WHEN {flag_cols['crosscount']} = 'Y' THEN 'yes' END)"
        )
        nordic = f"(CASE WHEN {flag_cols['crosscount']} = 'Y' THEN 'nordic' END)"
        prev = entries.get("piste:type")
        entries["piste:type"] = f"coalesce({nordic}, {prev})" \
            if prev is not None else nordic
    return entries


def etl_usgs_trails(df: DataFrame, id_col: str = "rid") -> DataFrame:
    """USGS topo trail schema → (id, tags map, tags_canon). Expects name,
    sourceorig, trailnumbe + flag columns."""
    flags = {c: F.col(c) for c in
             ["bicycle", "atv", "packsaddle", "motorcycle", "snowmobile",
              "motorizedw", "snowshoe", "crosscount"] if c in df.columns}
    entries = usgs_trail_entries(
        F.col("name"), F.col("sourceorig"), F.col("trailnumbe"), flags
    )
    return df.select(
        id_col, _tags_map(entries).alias("tags"),
        _canon_tags(entries).alias("tags_canon"),
    )
