"""The flagship conflation pipeline (SURVEY §3.1) — images × existing layer.

Reference semantics (osm_merge/conflator.py): for every primary feature,
find secondary features within a distance threshold, score tag agreement
(fuzzy name ratio, ref tokens, exact-geometry), pick the best candidate
(max hits then min distance), merge tags with old_* preservation and bump
version; primaries with no candidate become "new" features
(conflator.py:318-325).

Spark-first plan (one lazy DataFrame graph, no driver loops):
    scan → cell encode → ring-1 explode → [broadcast | salted-shuffle] join
    → exact distance refine (haversine / point→polyline) → fuzzy+ref gates
    → window rank → matched/new split.

Intentional, documented divergences from the reference implementation:
  - deterministic top-5 by distance instead of scan-order early exit
    (conflator.py:262-267);
  - true-meter distances (haversine; mercator planar × cos(lat) for lines)
    instead of raw EPSG:3857 planar meters which overestimate by 1/cos(lat);
  - candidates are ranked globally per primary, not per worker chunk.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import fuzzy, geo
from ..functions.cells import CellGrid
from . import cell_join, knn


@dataclass(frozen=True)
class ConflateParams:
    """Thresholds mirror the reference defaults."""

    threshold_m: float = 7.0      # class default, conflator.py:357
    fuzz_min: float = 85.0        # conflator.py:596-598
    len_diff_max: int = 3         # conflator.py:597
    candidate_cap: int = 5        # conflator.py:262-267
    n_salt: int = cell_join.DEFAULT_SALT
    hot_threshold: int = cell_join.DEFAULT_HOT_THRESHOLD
    use_indel_ratio: bool = True  # exact fuzz.ratio kernel vs native lev approx


def point_polyline_dist_native(px, py, xs, ys) -> F.Column:
    """Min point→segment distance over a packed polyline as a PURE Catalyst
    expression: clamped projection onto each segment, array_min over
    segments. Same math as kernels.point_polyline_dist (the Arrow kernel
    stays as the test oracle) but runs inside codegen — at 18M candidate
    pairs the per-row Python loop was the single hottest spot in the whole
    engine. Inputs must be planar (pre-projected) coordinates."""

    def seg(k):
        ax, ay = F.element_at(xs, k), F.element_at(ys, k)
        # try_element_at: a 1-point geometry has no k+1 vertex (ANSI mode)
        bx = F.coalesce(F.try_element_at(xs, k + 1), ax)
        by = F.coalesce(F.try_element_at(ys, k + 1), ay)
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        t_raw = ((px - ax) * dx + (py - ay) * dy) / seg2
        t = F.when(seg2 == F.lit(0.0), F.lit(0.0)).otherwise(
            F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
        )
        cx, cy = ax + t * dx, ay + t * dy
        return F.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))

    nseg = F.greatest(F.size(xs) - 1, F.lit(1))
    return F.array_min(F.transform(F.sequence(F.lit(1), nseg), seg))


def refine_distance(pairs: DataFrame, p_lon: str = "lon", p_lat: str = "lat") -> DataFrame:
    """Exact distance in meters for candidate pairs (X2/X3).

    Points: haversine. Lines/rings: planar point→polyline in mercator
    meters × cos(lat) local-scale correction. All native column math —
    no Python anywhere in the refine stage.

    The projected arrays go through an eval_once barrier: without it,
    Catalyst's CollapseProject inlines `transform(xs, mercator)` into every
    element_at of the per-segment math (~30 re-projections of the whole
    array per segment), and filter pushdown can drag the entire inlined
    expression INTO a join condition — both observed in the n=8M plan.
    """
    from ..functions.barrier import eval_once

    pairs = eval_once(
        pairs.withColumn(
            "__mxs", F.transform("xs", lambda x: geo.mercator_x(x))
        ).withColumn(
            "__mys", F.transform("ys", lambda y: geo.mercator_y(y))
        ),
        ["__mxs", "__mys"],
    )
    s_lon1 = F.element_at("xs", 1)
    s_lat1 = F.element_at("ys", 1)
    point_d = geo.haversine_m(F.col(p_lon), F.col(p_lat), s_lon1, s_lat1)
    merc_px = geo.mercator_x(F.col(p_lon))
    merc_py = geo.mercator_y(F.col(p_lat))
    line_d = point_polyline_dist_native(
        merc_px, merc_py, F.col("__mxs"), F.col("__mys")
    ) * F.cos(F.radians(F.col(p_lat)))
    return pairs.withColumn(
        "dist_m", F.when(F.size("xs") == 1, point_d).otherwise(line_d)
    ).drop("__mxs", "__mys")


def score_hits(pairs: DataFrame, params: ConflateParams,
               p_caption: str = "caption", s_caption: str = "s_caption") -> DataFrame:
    """Tag-agreement score (X1/X9 + exact-geometry bonus).

    hits = fuzzy-name match (ratio > fuzz_min AND |len diff| ≤ len_diff_max)
         + ref-token match (upper token equality, conflator.py:605-622)
         + exact-geometry (dist == 0, conflator.py:229-234).
    """
    a, b = F.col(p_caption), F.col(s_caption)
    ratio = (fuzzy.ratio_indel(a, b) if params.use_indel_ratio else fuzzy.ratio_lev(a, b))
    name_hit = (
        (F.col("ratio") > F.lit(params.fuzz_min))
        & (F.abs(F.length(a) - F.length(b)) <= F.lit(params.len_diff_max))
    ).cast("int")
    ref_a = F.upper(F.element_at(F.split(F.coalesce(F.col("p_ref"), F.lit("")), " "), -1))
    ref_b = F.upper(F.element_at(F.split(F.coalesce(F.col("s_ref"), F.lit("")), " "), -1))
    has_refs = (F.length(ref_a) > 0) & (F.length(ref_b) > 0)
    ref_hit = (has_refs & (ref_a == ref_b)).cast("int")
    geom_hit = (F.col("dist_m") == 0.0).cast("int")
    out = pairs.withColumn("ratio", ratio)
    for c in ("p_ref", "s_ref"):
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast("string"))
    return out.withColumn("hits", name_hit + ref_hit + geom_hit)


def merged_tags_col() -> F.Column:
    """Tag merge with precedence + old_* preservation (X10,
    conflator.py:554,626; docs/calculations.md:77-101): primary (incoming)
    values win; overwritten secondary values are preserved as old_<key>."""
    p, s = F.col("p_tags"), F.col("s_tags")
    overwritten = F.map_filter(s, lambda k, v: F.map_contains_key(p, k) & (F.element_at(p, k) != v))
    olds = F.map_from_entries(
        F.transform(
            F.map_entries(overwritten),
            lambda e: F.struct(F.concat(F.lit("old_"), e.key).alias("key"), e.value.alias("value")),
        )
    )
    kept_secondary = F.map_filter(s, lambda k, v: ~F.map_contains_key(p, k))
    return F.map_concat(kept_secondary, p, olds)


def prepare_images(images: DataFrame) -> DataFrame:
    """Normalize the primary side: tags → p_tags (built from caption when
    absent), project p_ref for the ref-token gate."""
    p = images.withColumnRenamed("tags", "p_tags") if "tags" in images.columns else \
        images.withColumn("p_tags", F.map_from_arrays(
            F.array(F.lit("name")), F.array(F.col("caption"))))
    return p.withColumn("p_ref", F.element_at("p_tags", "ref:usfs"))


def new_features(p: DataFrame, matched_keys: DataFrame) -> DataFrame:
    """J7: primaries with no accepted candidate become new features
    (informal=yes + fixme, version=1 — conflator.py:318-325). p must be
    prepare_images() output; matched_keys needs only image_id."""
    return (
        # shuffle_hash: both sides are corpus-scale (every unmatched image ×
        # every match) — SMJ would sort both for an equi-key with no
        # ordering value (same rationale as the banded dedup joins)
        p.join(matched_keys.select("image_id").hint("shuffle_hash"),
               "image_id", "left_anti")
        .select(
            "image_id", "caption", "lon", "lat",
            F.lit(1).alias("version"),
            F.map_concat(
                F.col("p_tags"),
                F.create_map(
                    F.lit("informal"), F.lit("yes"),
                    F.lit("fixme"), F.lit("new feature, needs validation"),
                ),
            ).alias("tags"),
        )
    )


def suppress_identical(matched: DataFrame) -> DataFrame:
    """U2 (conflator.py:236-247): drop matches whose incoming tags add
    nothing over the existing feature's tags — the reference skips emitting
    them because there is nothing to edit. Expects p_tags/s_tags columns
    (apply before the final projection)."""
    p, s = F.col("p_tags"), F.col("s_tags")
    subset_of_s = F.forall(
        F.map_entries(p), lambda e: F.element_at(s, e["key"]).eqNullSafe(e["value"])
    )
    return matched.filter(~subset_of_s)


def conflate(images: DataFrame, layer: DataFrame,
             params: ConflateParams = ConflateParams(),
             broadcast_layer: bool | None = None,
             layer_is_points: bool = False,
             explode_multipart: bool = False) -> tuple[DataFrame, DataFrame]:
    """Run the full ladder. Returns (matched, new).

    images: (image_id, caption, lon, lat, [p_tags map], ...payload excluded
            by caller — join on ids, re-attach bytes afterwards)
    layer:  (feature_id, version, geom_type, xs, ys, tags, caption)

    matched: image_id, feature_id, dist_m, ratio, hits, version (bumped),
             tags (merged + debug counters like conflator.py:250-253)
    new:     image_id, caption, lon, lat, version=1, tags with
             informal=yes + fixme (conflator.py:318-325)
    """
    grid = CellGrid.for_radius(params.threshold_m * 1.05,
                               max_abs_lat=70.0)
    p = prepare_images(images)
    s = (layer
         .withColumnRenamed("tags", "s_tags")
         .withColumnRenamed("caption", "s_caption")
         .withColumn("s_ref", F.element_at("s_tags", "ref:usfs")))

    # SLIM join: only ids + coordinates flow through the cell join, the
    # 9× ring explode, the refine, and the top-5 window — captions/tag
    # maps/versions re-attach AFTER capping, when the row count is back to
    # ≤5·|images|. Payload-wide candidate rows were both the dominant
    # shuffle volume and (when AQE broadcasts the layer) a serial
    # driver-side hash build of the full payload.
    # images without an explicit tag map derive p_tags from the caption —
    # carrying the (short) caption through the slim join then costs ~13
    # bytes/row but saves a whole post-cap shuffle join (and its stage
    # barrier); with a real tag map the join is the cheaper trade.
    # Measured tradeoff (n=2M, pinned): carrying ALL scoring strings
    # through the 78M-row candidate set costs more than the post-cap
    # joins it saves (50s vs 31s at 8 cores). Keep candidates minimal;
    # only the probe caption rides along when the image table has no tag
    # map (it replaces a whole p-side join).
    p_has_tags = "tags" in images.columns
    p_slim = (
        p.select("image_id", "lon", "lat")
        if p_has_tags
        else p.select("image_id", "lon", "lat", "caption")
    )
    s_slim = s.select("feature_id", "xs", "ys")
    if explode_multipart:
        # multi-part geometries ride as NaN-separated packed arrays
        # (sources/geojson); per-part rows join/refine independently and
        # the best-part aggregation below takes min-over-sub-geometries
        # (conflator.py:485-528)
        from .multipart import explode_parts

        s_slim = explode_parts(s_slim).drop("part_idx")

    # Planar bbox prefilter bound — cheap compares per candidate BEFORE
    # the transcendental refine. A point within threshold_m of a geometry
    # is within threshold of its bbox; 110574 m/deg is the MINIMUM
    # meridian scale and the 1.2 margin swallows both its latitude
    # variation and the lon/lat metric difference, so the prefilter is a
    # strict superset of the exact dist_m <= threshold filter (semantics
    # unchanged; the cell join admits ~15 candidates per true match and
    # this rejects most of them for arithmetic instead of trig cost).
    deg = params.threshold_m * 1.2 / 110_574.0
    deg_lon = F.lit(deg) / F.cos(F.radians(F.col("lat")))
    slim_cols = ["image_id", "lon", "lat", "feature_id", "dist_m"] + (
        [] if p_has_tags else ["caption"]
    )

    def points_refined(s_part: DataFrame) -> DataFrame:
        # point features join + refine on SCALAR coordinates: the
        # broadcast hash relation holds ~24 B/row (vs ~90 B with packed
        # 1-element arrays) — the broadcast collect is the serial term
        # BOTH simulated cluster sizes pay identically, so its byte count
        # directly caps the N→4N scaling efficiency.
        s_pts = s_part.select(
            "feature_id",
            F.element_at("xs", 1).alias("s_lon"),
            F.element_at("ys", 1).alias("s_lat"),
        )
        pp = cell_join.candidate_pairs_points(
            p_slim, s_pts, grid,
            broadcast_secondary=broadcast_layer,
            n_salt=params.n_salt, hot_threshold=params.hot_threshold,
        )
        pp = pp.filter(
            (F.col("lat") >= F.col("s_lat") - F.lit(deg))
            & (F.col("lat") <= F.col("s_lat") + F.lit(deg))
            & (F.col("lon") >= F.col("s_lon") - deg_lon)
            & (F.col("lon") <= F.col("s_lon") + deg_lon)
        )
        d = geo.haversine_m(
            F.col("lon"), F.col("lat"), F.col("s_lon"), F.col("s_lat")
        )
        return (
            pp.withColumn("dist_m", d)
            .filter(F.col("dist_m") <= F.lit(params.threshold_m))
            .select(*slim_cols)
        )

    def lines_refined(s_part: DataFrame) -> DataFrame:
        lp = cell_join.candidate_pairs(
            p_slim, s_part, grid,
            broadcast_secondary=broadcast_layer,
            n_salt=params.n_salt, hot_threshold=params.hot_threshold,
            secondary_points=False,
        )
        lp = lp.filter(
            (F.col("lat") >= F.array_min("ys") - F.lit(deg))
            & (F.col("lat") <= F.array_max("ys") + F.lit(deg))
            & (F.col("lon") >= F.array_min("xs") - deg_lon)
            & (F.col("lon") <= F.array_max("xs") + deg_lon)
        )
        return (
            refine_distance(lp)
            .filter(F.col("dist_m") <= F.lit(params.threshold_m))
            .select(*slim_cols)
        )

    def fused_refined(s_part: DataFrame) -> DataFrame:
        # shuffle-first (broadcast_layer=False): ring-1 on the LAYER side,
        # both geometry kinds through ONE shuffle-hash join — no broadcast
        # build (the serial driver floor both simulated cluster sizes paid
        # identically, BASELINE.md §4.4), no pair-dedup aggregation (each
        # pair meets in exactly one cell), probe scanned once.
        pairs = cell_join.candidate_pairs_fused(
            p_slim, s_part, grid, project_mercator=True
        )
        # branch-free bbox prefilter: for a point feature all four bbox
        # scalars collapse to its coordinate, so one range test covers
        # both geometry kinds (no when(), no array_min per pair)
        pairs = pairs.filter(
            (F.col("lat") >= F.col("bymin") - F.lit(deg))
            & (F.col("lat") <= F.col("bymax") + F.lit(deg))
            & (F.col("lon") >= F.col("bxmin") - deg_lon)
            & (F.col("lon") <= F.col("bxmax") + deg_lon)
        )
        is_pt = F.col("__mxs").isNull()
        point_d = geo.haversine_m(
            F.col("lon"), F.col("lat"), F.col("bxmin"), F.col("bymin")
        )
        # __mxs/__mys were projected per FEATURE before the shuffle (the
        # exchange is the CSE barrier), so the per-pair refine only reads
        line_d = point_polyline_dist_native(
            geo.mercator_x(F.col("lon")), geo.mercator_y(F.col("lat")),
            F.col("__mxs"), F.col("__mys"),
        ) * F.cos(F.radians(F.col("lat")))
        return (
            pairs.withColumn("dist_m", F.when(is_pt, point_d).otherwise(line_d))
            .filter(F.col("dist_m") <= F.lit(params.threshold_m))
            .select(*slim_cols)
        )

    if broadcast_layer is False:
        refined = fused_refined(s_slim)
    elif layer_is_points:
        refined = points_refined(s_slim)
    else:
        # mixed layers split by geometry: point features (the vast
        # majority in real layers) take the scalar fast path; only
        # line/ring features pay the covering-cells explode + pair-dedup
        # + polyline refine.
        refined = points_refined(s_slim.filter(F.size("xs") == 1)).unionByName(
            lines_refined(s_slim.filter(F.size("xs") > 1))
        )
    if explode_multipart:
        # best-part aggregation: one row per (image, feature) with the
        # minimum part distance — partial (map-side) min, no sort
        refined = refined.groupBy("image_id", "feature_id").agg(
            F.min("dist_m").alias("dist_m"),
            *[F.first(c).alias(c) for c in slim_cols
              if c not in ("image_id", "feature_id", "dist_m")],
        )
    # top-5 cap: two formulations, both exact, relative cost re-measured
    # each round (SPARK_GRAFT_CAP toggles; see BASELINE.md §4.5):
    #   agg    — collect_list/array_sort/slice hash aggregation (r2 winner)
    #   window — row_number over one exchange + per-partition sort.
    #            An ISOLATED r3 micro-bench had window ahead, but in the
    #            full ladder agg wins again at both 8 and 32 cores
    #            (n=2M: 6.03 vs 6.66 s) — measure in context, not in
    #            isolation (BASELINE.md §4.5)
    import os as _os

    cap_strategy = _os.environ.get("SPARK_GRAFT_CAP", "agg")
    if cap_strategy == "window":
        capped = knn.top_k(
            refined, "image_id",
            [F.asc("dist_m"), F.asc("feature_id")], params.candidate_cap,
        )
    else:
        capped = knn.top_k_agg(
            refined, "image_id", "dist_m", "feature_id", params.candidate_cap,
            const_cols=["lon", "lat"] if p_has_tags else ["lon", "lat", "caption"],
        )
    enriched = capped
    if p_has_tags:
        enriched = enriched.join(
            p.select("image_id", "caption", "p_tags", "p_ref"), "image_id"
        )
    else:
        enriched = enriched.withColumn(
            "p_tags",
            F.map_from_arrays(F.array(F.lit("name")), F.array(F.col("caption"))),
        ).withColumn("p_ref", F.lit(None).cast("string"))
    enrich_src = s.select("feature_id", "s_caption", "s_tags", "s_ref", "version")
    if broadcast_layer is False:
        # shuffle-first mode: the payload side shuffles in parallel instead
        # of a driver-side broadcast hash build of every tag map
        enrich_src = enrich_src.hint("SHUFFLE_HASH")
    enriched = enriched.join(enrich_src, "feature_id")
    scored = score_hits(enriched, params)
    best = knn.best_candidate(scored, "image_id")

    matched = best.select(
        "image_id", "feature_id",
        F.round("dist_m", 9).alias("dist_m"),
        F.round("ratio", 6).alias("ratio"),
        "hits",
        (F.col("version") + 1).alias("version"),  # bump, conflator.py:945-947
        F.map_concat(
            merged_tags_col(),
            F.create_map(
                F.lit("hits"), F.col("hits").cast("string"),
                F.lit("dist"), F.round("dist_m", 6).cast("string"),
                F.lit("ratio"), F.round("ratio", 2).cast("string"),
            ),
        ).alias("tags"),
        "lon", "lat",
    )
    new = new_features(p, best.select("image_id"))
    return matched, new
