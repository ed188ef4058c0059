"""Round-3 additions: geohash addressing, polyline length, and the
image-side corpus quality gate.

- geohash_stats completes the addressing family (S2 cells, quadkeys,
  hex bins, z-order) with the scheme lake tables are most often
  partitioned by in practice; prefix truncation = hierarchy, same as the
  quadkey parent column.
- way_length is the A-family length aggregate the reference computes with
  shapely/pyproj line length (osm_merge/conflator.py:477-484 projects to
  meters for all planar measurement); here it is a per-row left fold of
  native haversine segments — no explode, no shuffle, one codegen'd
  projection per way.
- image_filter is the image-axis twin of corpus_filter (queries/text2.py):
  the LAION/DataComp-style keep/drop gate over (w, h, fmt, caption) with
  machine-readable reason codes — the first pass any 10^12-image
  training-data pipeline runs before dedup. Width/height/format derive
  deterministically from the image key (same u01 scheme as every other
  synthetic column) so the DuckDB oracle reproduces them bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo, geohash
from . import base

# ---------------------------------------------------------------------------
# geohash_stats — per-geohash6 density with the precision-4 parent prefix
# ---------------------------------------------------------------------------
GH_PARENT = 4


def q_geohash_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    img = base.images_df(spark, sf_dir)
    return (
        img.select(geohash.geohash(F.col("lon"), F.col("lat")).alias("gh"))
        .groupBy("gh")
        .agg(F.count("*").alias("n_images"))
        .select("gh", F.substring("gh", 1, GH_PARENT).alias("parent_gh4"),
                "n_images")
    )


def _sql_geohash_stats() -> str:
    v = geohash._interleaved_sql("lon", "lat", geohash.PRECISION)
    gh = geohash.geohash_chars_sql("v", geohash.PRECISION)
    return (
        f"WITH img AS ({base.IMAGES_SQL}), "
        f"t AS (SELECT {v} AS v FROM img), "
        f"g AS (SELECT {gh} AS gh, count(*) AS n_images FROM t GROUP BY 1) "
        f"SELECT gh, substr(gh, 1, {GH_PARENT}) AS parent_gh4, n_images FROM g"
    )


# ---------------------------------------------------------------------------
# way_length — haversine length of each packed polyline (A-family)
# ---------------------------------------------------------------------------
def q_way_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    ways = base.ways_df(spark, sf_dir)
    # left fold over consecutive vertex pairs: ((0 + d1) + d2) + ... —
    # IEEE-identical to the oracle's explicit d1 + d2 sum, and a single
    # codegen'd projection (no explode → no shuffle, no row blowup at
    # 10^12 ways, unlike the seg_explode_min per-segment form which only
    # exists because that query needs the per-segment MINIMUM).
    length = F.aggregate(
        F.sequence(F.lit(1), F.size("xs") - 1),
        F.lit(0.0),
        lambda acc, k: acc + geo.haversine_m(
            F.element_at("xs", k), F.element_at("ys", k),
            F.element_at("xs", k + 1), F.element_at("ys", k + 1),
        ),
    )
    return ways.select(
        "way_id", "wcls", F.round(length, 3).alias("length_m")
    )


def _sql_way_length() -> str:
    d1 = geo.haversine_m_sql("xs[1]", "ys[1]", "xs[2]", "ys[2]")
    d2 = geo.haversine_m_sql("xs[2]", "ys[2]", "xs[3]", "ys[3]")
    return (
        f"WITH ways AS ({base.WAYS_SQL}) "
        f"SELECT way_id, wcls, round({d1} + CASE WHEN len(xs) > 2"
        f" THEN {d2} ELSE 0.0 END, 3) AS length_m FROM ways"
    )


# ---------------------------------------------------------------------------
# image_filter — LAION-style keep/drop gate on image metadata + caption
# ---------------------------------------------------------------------------
MIN_DIM = 64          # smallest acceptable side, px
MAX_ASPECT = 3.0      # max(w,h)/min(w,h) ceiling
FORMATS = ("jpeg", "png", "webp")   # gif/bmp are dropped
MIN_CAPTION = 8       # chars
_FMT_ALL = ("jpeg", "png", "webp", "gif", "bmp")


def _dims(key):
    w = F.floor(F.lit(16.0) + base.u01(key, 21) * F.lit(2048.0)).cast("int")
    h = F.floor(F.lit(16.0) + base.u01(key, 22) * F.lit(2048.0)).cast("int")
    return w, h


def q_image_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    img = base.images_df(spark, sf_dir)
    key = F.col("ikey")
    w, h = _dims(key)
    fmt = F.element_at(F.array(*[F.lit(f) for f in _FMT_ALL]),
                       (key % 5).cast("int") + 1)
    df = img.select("image_id", "caption", w.alias("w"), h.alias("h"),
                    fmt.alias("fmt"))
    small = F.least("w", "h") < F.lit(MIN_DIM)
    aspect = (F.greatest("w", "h").cast("double")
              / F.least("w", "h").cast("double")) > F.lit(MAX_ASPECT)
    badfmt = ~F.col("fmt").isin(*FORMATS)
    shortcap = F.length("caption") < F.lit(MIN_CAPTION)
    reasons = F.concat(
        F.when(small, F.lit("small;")).otherwise(F.lit("")),
        F.when(aspect, F.lit("aspect;")).otherwise(F.lit("")),
        F.when(badfmt, F.lit("format;")).otherwise(F.lit("")),
        F.when(shortcap, F.lit("caption;")).otherwise(F.lit("")),
    )
    return df.select(
        "image_id", "w", "h", "fmt",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def _sql_image_filter() -> str:
    w = f"CAST(floor(16.0e0 + {base.u01_sql('ikey', 21)} * 2048.0e0) AS INT)"
    h = f"CAST(floor(16.0e0 + {base.u01_sql('ikey', 22)} * 2048.0e0) AS INT)"
    fmts = ", ".join(f"'{f}'" for f in _FMT_ALL)
    keep_fmts = ", ".join(f"'{f}'" for f in FORMATS)
    return (
        f"WITH img AS ({base.IMAGES_SQL}), "
        f"m AS (SELECT image_id, caption, {w} AS w, {h} AS h,"
        f" ([{fmts}])[CAST(ikey % 5 AS INT) + 1] AS fmt FROM img), "
        "r AS (SELECT image_id, w, h, fmt,"
        f" (CASE WHEN least(w, h) < {MIN_DIM} THEN 'small;' ELSE '' END ||"
        " CASE WHEN CAST(greatest(w, h) AS DOUBLE) / CAST(least(w, h) AS DOUBLE)"
        f" > {geo.dlit(MAX_ASPECT)} THEN 'aspect;' ELSE '' END ||"
        f" CASE WHEN fmt NOT IN ({keep_fmts}) THEN 'format;' ELSE '' END ||"
        f" CASE WHEN length(caption) < {MIN_CAPTION} THEN 'caption;' ELSE '' END)"
        " AS reasons FROM m) "
        "SELECT image_id, w, h, fmt, reasons = '' AS keep, reasons FROM r"
    )


QUERIES = {
    "geohash_stats": (q_geohash_stats, _sql_geohash_stats()),
    "way_length": (q_way_length, _sql_way_length()),
    "image_filter": (q_image_filter, _sql_image_filter()),
}


# ---------------------------------------------------------------------------
# conflate_delta — incremental conflation (the reference's "re-run batch ETL
# every ~24 h" framing, README.md:60-62 / docs/highways.md:142, done as a
# delta job instead of a full recompute)
# ---------------------------------------------------------------------------
# Only the increment's images conflate, and — the part that matters at a
# 10^12-row layer — the LAYER is pruned to cells near the delta BEFORE the
# join: distinct delta cells, ring-1 dilated (a tiny set for any real daily
# increment), broadcast semi-join against the layer's cell key. A 1%
# increment then reads ~1% of a cell-partitioned layer (partition pruning
# composes with the semi-join) instead of rebuilding the world. The prune is
# a pure optimization — the oracle computes the same answer from the
# unpruned join — and the plan shape is pinned by
# tests/test_geo4.py::test_conflate_delta_prunes_layer.
DELTA_MOD = 16  # ikey % 16 == 1 → the synthetic "daily increment" (~6%;
# residue 1 because ikey = orderkey*8 + linenumber with linenumber ≥ 1 —
# residue 0 is structurally unpopulated)


def q_conflate_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import cell_join
    from .geo import GRID

    img = base.images_df(spark, sf_dir).filter(
        (F.col("ikey") % DELTA_MOD) == 1
    )
    lyr = base.layer_df(spark, sf_dir).withColumns(
        {"xs": F.array("s_lon"), "ys": F.array("s_lat")}
    )
    offs = GRID.ring1_sql_values()
    d9 = (
        img.select(GRID.encode(F.col("lon"), F.col("lat")).alias("c0"))
        .distinct()
        .select(F.explode(
            F.array(*[F.col("c0") + F.lit(o) for o in offs])
        ).alias("cell0"))
        .distinct()
    )
    lyr_pruned = lyr.join(
        F.broadcast(d9),
        GRID.encode(F.col("s_lon"), F.col("s_lat")) == F.col("cell0"),
        "left_semi",
    )
    pairs = cell_join.candidate_pairs(
        img, lyr_pruned, GRID, p_key="image_id", s_key="feature_id",
        secondary_points=True, ring_secondary=True,
    )
    ref = pairs.withColumn(
        "dist",
        geo.haversine_m(F.col("lon"), F.col("lat"),
                        F.col("s_lon"), F.col("s_lat")),
    ).filter(F.col("dist") <= F.lit(base.THRESHOLD_M))
    best = ref.groupBy("image_id").agg(
        F.min(F.struct(F.col("dist"), F.col("feature_id"))).alias("b")
    )
    return best.select(
        "image_id",
        F.col("b.feature_id").alias("feature_id"),
        F.round("b.dist", 3).alias("dist_m"),
    )


def _sql_conflate_delta() -> str:
    from .geo import _sql_pairs

    # the layer prune is plan-side only; the oracle filters the increment at
    # the end of the unpruned join and must produce identical rows
    return (
        f"WITH {_sql_pairs()} "
        "SELECT image_id, feature_id, round(dist, 3) AS dist_m FROM"
        " (SELECT *, row_number() OVER (PARTITION BY image_id"
        " ORDER BY dist, feature_id) AS rn FROM ref"
        f" WHERE dist <= {geo.dlit(base.THRESHOLD_M)}"
        f" AND ikey % {DELTA_MOD} = 1) t WHERE rn = 1"
    )


QUERIES["conflate_delta"] = (q_conflate_delta, _sql_conflate_delta())
