"""Semantics tests for the round-3b pipeline operators: quality-based
cluster representatives, leakage-free splits, aspect bucketing, and
polyline simplification (beyond the DuckDB parity bar, which checks the
same queries value-for-value in test_oracle_parity.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_merge_spark.queries import geo4, text


# --- dedup_keep_best ---------------------------------------------------------
def test_keep_best_picks_max_quality_then_min_id(spark, sf_dir):
    best = {
        r["cluster_id"]: r
        for r in text.q_dedup_keep_best(spark, sf_dir).collect()
    }
    members = text.q_dedup_cluster(spark, sf_dir).collect()
    quality = {
        r["doc_id"]: r["q_e6"]
        for r in text._doc_quality_e6(spark, sf_dir).collect()
    }
    by_cluster: dict[int, list[int]] = {}
    for r in members:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert set(best) == set(by_cluster)
    for cid, docs in by_cluster.items():
        expect = min(docs, key=lambda d: (-quality[d], d))
        row = best[cid]
        assert row["keep_doc_id"] == expect, cid
        assert row["best_quality_e6"] == quality[expect]
        assert row["n_members"] == len(docs)


def test_keep_best_no_window_no_sort(spark, sf_dir):
    plan = text.q_dedup_keep_best(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "SortExec" not in plan.replace("SortMergeJoin", "")


# --- cluster_split -----------------------------------------------------------
def test_cluster_split_is_cluster_atomic(spark, sf_dir):
    rows = text.q_cluster_split(spark, sf_dir).collect()
    split_of_cluster: dict[int, str] = {}
    for r in rows:
        prev = split_of_cluster.setdefault(r["cluster_id"], r["split"])
        # every member of a cluster lands in the SAME split — no leakage
        assert prev == r["split"], r["cluster_id"]
    # all three splits are populated and train dominates
    counts = {s: 0 for s in ("train", "val", "test")}
    for r in rows:
        counts[r["split"]] += 1
    assert counts["train"] > counts["val"] > 0
    assert counts["test"] > 0


def test_cluster_split_covers_every_document(spark, sf_dir):
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert text.q_cluster_split(spark, sf_dir).count() == n_docs


# --- aspect_buckets ----------------------------------------------------------
def test_aspect_bucket_is_nearest_in_log_space(spark, sf_dir):
    import math

    rows = geo4.q_aspect_buckets(spark, sf_dir).collect()
    # rollup covers every image exactly once
    img_n = geo4.base.images_df(spark, sf_dir).count()
    assert sum(r["n_images"] for r in rows) == img_n
    # the CASE-ladder thresholds are exactly the log-space argmin:
    # re-derive per-image assignments and cross-check a sample
    img = geo4.base.images_df(spark, sf_dir)
    key = F.col("ikey")
    w, h = geo4._dims(key)
    sample = img.select(w.alias("w"), h.alias("h")).limit(500).collect()
    for r in sample:
        aspect = r["w"] / r["h"]
        nearest = min(
            range(len(geo4.BUCKETS)),
            key=lambda i: (abs(math.log(aspect) - math.log(geo4._ASPECTS[i])), i),
        )
        ladder = next(
            (i for i, t in enumerate(geo4._THRESH) if aspect < t),
            len(geo4._ASPECTS) - 1,
        )
        assert ladder == nearest, (r["w"], r["h"])


def test_aspect_buckets_plan_is_projection_only(spark, sf_dir):
    plan = geo4.q_aspect_buckets(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    # one aggregation exchange for the 9-row rollup; NO join for the
    # bucket lookup (the argmin compiled to a CASE ladder)
    assert "CartesianProduct" not in plan
    # only images_df's own lineitem-part joins — adding the bucket argmin
    # must not add ANY join (it compiles to a CASE ladder projection)
    base_plan = geo4.base.images_df(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert (plan.count("BroadcastHashJoin")
            <= base_plan.count("BroadcastHashJoin"))


# --- simplify_ways -----------------------------------------------------------
def test_simplify_keeps_endpoints_and_corners_drops_jitter(spark, sf_dir):
    rows = geo4.q_simplify_ways(spark, sf_dir).collect()
    assert rows
    for r in rows:
        kept = [int(i) for i in r["kept_csv"].split(",")]
        assert r["n_in"] == geo4.N_TRACE
        assert kept[0] == 1 and kept[-1] == geo4.N_TRACE
        # planted corners survive; their neighbours may too (the corner
        # displaces THEIR triangles as well) but plain-jitter interior
        # vertices far from corners must be gone
        for c in geo4.TRACE_CORNERS:
            assert c in kept, r["way_id"]
        near_corner = {
            c + d for c in geo4.TRACE_CORNERS for d in (-1, 0, 1)
        }
        for i in range(2, geo4.N_TRACE):
            if i not in near_corner:
                assert i not in kept, (r["way_id"], i)


def test_simplify_matches_bruteforce(spark, sf_dir):
    tr = geo4._trace_df(spark, sf_dir).collect()
    got = {
        r["way_id"]: [int(i) for i in r["kept_csv"].split(",")]
        for r in geo4.q_simplify_ways(spark, sf_dir).collect()
    }
    from osm_merge_spark.operators.simplify import MX, MY

    for r in tr:
        xs, ys, n = r["xs"], r["ys"], len(r["xs"])
        kept = []
        for i in range(1, n + 1):
            if i in (1, n):
                kept.append(i)
                continue
            x1, y1 = xs[i - 2] * MX, ys[i - 2] * MY
            x2, y2 = xs[i - 1] * MX, ys[i - 1] * MY
            x3, y3 = xs[i] * MX, ys[i] * MY
            area = abs((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) * 0.5
            if area >= geo4.SIMPLIFY_EPS_M2:
                kept.append(i)
        assert got[r["way_id"]] == kept


def test_simplify_plan_is_shuffle_free(spark, sf_dir):
    from osm_merge_spark.operators import simplify

    tr = geo4._trace_df(spark, sf_dir)
    kept = simplify.kept_indices(F.col("xs"), F.col("ys"),
                                 geo4.SIMPLIFY_EPS_M2)
    df = tr.select("way_id", F.size(kept).alias("n_out"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection: no shuffle at any scale


# --- Douglas–Peucker ----------------------------------------------------------
def _dp_brute(x, y, eps):
    """Independent recursive DP implementation for cross-checking."""
    def rec(i, j, keep):
        if j <= i + 1:
            return
        best, bd = -1, -1.0
        dx, dy = x[j] - x[i], y[j] - y[i]
        seg2 = dx * dx + dy * dy
        for k in range(i + 1, j):
            px, py = x[k] - x[i], y[k] - y[i]
            if seg2 == 0.0:
                d = (px * px + py * py) ** 0.5
            else:
                d = abs(px * dy - py * dx) / seg2 ** 0.5
            if d > bd:
                best, bd = k, d
        if bd > eps:
            keep[best] = True
            rec(i, best, keep)
            rec(best, j, keep)

    keep = [False] * len(x)
    keep[0] = keep[-1] = True
    rec(0, len(x) - 1, keep)
    return [i + 1 for i, k in enumerate(keep) if k]


def test_dp_matches_independent_recursion_and_guarantee(spark, sf_dir):
    from osm_merge_spark.operators import simplify

    eps_m = 50.0
    tr = geo4._trace_df(spark, sf_dir)
    udf = simplify.dp_kept_indices_udf(eps_m)
    got = {
        r["way_id"]: list(r["kept"])
        for r in tr.select(
            "way_id", udf(F.col("xs"), F.col("ys")).alias("kept")
        ).collect()
    }
    for r in tr.collect():
        x = [v * simplify.MX for v in r["xs"]]
        y = [v * simplify.MY for v in r["ys"]]
        want = _dp_brute(x, y, eps_m)
        assert got[r["way_id"]] == want, r["way_id"]
        # the DP guarantee: every DROPPED vertex is within eps of the
        # simplified polyline
        kept = got[r["way_id"]]
        for i in range(1, len(x) + 1):
            if i in kept:
                continue
            import bisect

            pos = bisect.bisect_left(kept, i)
            a, b = kept[pos - 1] - 1, kept[pos] - 1
            dx, dy = x[b] - x[a], y[b] - y[a]
            seg2 = dx * dx + dy * dy
            px, py = x[i - 1] - x[a], y[i - 1] - y[a]
            d = (abs(px * dy - py * dx) / seg2 ** 0.5 if seg2
                 else (px * px + py * py) ** 0.5)
            assert d <= eps_m + 1e-9, (r["way_id"], i, d)


def test_dp_hypothesis_random_polylines():
    from hypothesis import given, settings, strategies as st
    import numpy as np
    from osm_merge_spark.operators.simplify import dp_keep_mask

    coords = st.lists(
        st.tuples(
            st.floats(-1000, 1000, allow_nan=False),
            st.floats(-1000, 1000, allow_nan=False),
        ),
        min_size=3, max_size=40,
    )

    @settings(max_examples=150, deadline=None)
    @given(coords, st.floats(0.1, 200))
    def run(pts, eps):
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        keep = dp_keep_mask(x, y, eps)
        want = _dp_brute(list(x), list(y), eps)
        assert (np.flatnonzero(keep) + 1).tolist() == want
        # idempotence: simplifying the simplified line changes nothing
        kx, ky = x[keep], y[keep]
        keep2 = dp_keep_mask(kx, ky, eps)
        assert keep2.all()

    run()


def test_dp_is_projection_only(spark, sf_dir):
    from osm_merge_spark.operators import simplify

    tr = geo4._trace_df(spark, sf_dir)
    udf = simplify.dp_kept_indices_udf(50.0)
    df = tr.select("way_id", udf(F.col("xs"), F.col("ys")).alias("kept"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # Arrow-batched, not row-at-a-time


# --- plan-shape pins for the round-3b window queries ---------------------------
def test_hard_negatives_plan_topk_pushdown(spark, sf_dir):
    from osm_merge_spark.queries.vectors import q_hard_negatives

    plan = q_hard_negatives(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    # the rank<=k filter must reach the map side: a partial WindowGroupLimit
    # cuts every partition to k rows per qid BEFORE the final shuffle, so
    # the exchange carries k·partitions rows, not the full pair stream
    assert plan.count("WindowGroupLimit") >= 2
    # probe side broadcasts (inequality join => nested-loop w/ broadcast);
    # the text corpus must never sort-merge
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_token_shards_plan_single_window(spark, sf_dir):
    from osm_merge_spark.queries.text2 import q_token_shards

    plan = q_token_shards(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    # one shuffle on lang feeding one ordered window — nothing else
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1


# --- geo_sample / image_assemble -----------------------------------------------
def test_geo_sample_caps_every_tile_and_is_deterministic(spark, sf_dir):
    rows = geo4.q_geo_sample(spark, sf_dir).collect()
    per_tile: dict[int, list] = {}
    for r in rows:
        per_tile.setdefault(r["tile_id"], []).append(r["rank"])
    assert per_tile
    for tid, ranks in per_tile.items():
        ranks.sort()
        assert ranks == list(range(1, len(ranks) + 1)), tid
        assert len(ranks) <= geo4.GEO_SAMPLE_K
    # tiles with more than K source images are capped exactly AT K
    from osm_merge_spark.queries.geo import TILES

    img = geo4.base.images_df(spark, sf_dir)
    full = {
        r["tile_id"]: r["n"]
        for r in img.select(
            TILES.tile_id(F.col("lon"), F.col("lat")).alias("tile_id")
        ).groupBy("tile_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_tile) == set(full)
    for tid, n in full.items():
        assert len(per_tile[tid]) == min(n, geo4.GEO_SAMPLE_K), tid


def test_geo_sample_plan_topk_pushdown(spark, sf_dir):
    plan = geo4.q_geo_sample(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2  # partial + final cut
    assert "SortMergeJoin" not in plan


def test_image_assemble_is_the_intersection(spark, sf_dir):
    got = {r["image_id"] for r in
           geo4.q_image_assemble(spark, sf_dir).collect()}
    kept = {r["image_id"] for r in
            geo4.q_image_filter(spark, sf_dir).filter(F.col("keep")).collect()}
    sampled = {r["image_id"] for r in
               geo4.q_geo_sample(spark, sf_dir).collect()}
    assert got == kept & sampled
    assert got  # non-degenerate fixture


# --- ann_mrl_topk ---------------------------------------------------------------
def test_mrl_recall_grows_with_candidate_width(spark, sf_dir):
    """Staged retrieval semantics: the 16-dim prefix stage is genuinely
    lossy on these untrained (uniform-random) embeddings — the worst case
    for MRL — and recall vs exact top-5 must grow monotonically with the
    candidate width, reaching 1.0 when the width covers the corpus.
    Measured on sf0.001: 25→0.26, 50→0.44, 100→0.64, 200→0.85."""
    import numpy as np

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id").collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    from osm_merge_spark.queries.vectors import MRL_DIM, QUERY_MOD

    p = x[:, :MRL_DIM]
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)

    def recall(width):
        out = []
        for qi in np.where(ids % QUERY_MOD == 0)[0]:
            ce = xn @ xn[qi]
            ce[qi] = -9
            exact5 = set(ids[np.argsort(-ce)[:5]])
            pc = pn @ pn[qi]
            pc[qi] = -9
            cand = np.argsort(-pc)[:width]
            c2 = xn[cand] @ xn[qi]
            got5 = set(ids[cand[np.argsort(-c2)[:5]]])
            out.append(len(exact5 & got5) / 5)
        return float(np.mean(out))

    r25, r100, rfull = recall(25), recall(100), recall(len(ids) - 1)
    assert r25 >= 0.15
    assert r100 > r25
    assert rfull == 1.0


def test_mrl_stage2_scores_are_exact(spark, sf_dir):
    """Whatever stage 1 lets through, stage 2's cosine must equal the
    brute-force cosine for those exact pairs."""
    from osm_merge_spark.queries.vectors import q_ann_mrl_topk
    import numpy as np

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id").collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    idx = {v: i for i, v in enumerate(ids)}
    for r in q_ann_mrl_topk(spark, sf_dir).collect():
        want = float(xn[idx[r["qid"]]] @ xn[idx[r["nid"]]])
        assert abs(r["cos"] - want) < 5e-7, (r["qid"], r["nid"])


# --- hll_users -------------------------------------------------------------------
def test_hll_estimate_within_error_bounds(spark, sf_dir):
    """HLL with m=64 registers has σ ≈ 1.04/√64 ≈ 13%; assert the estimate
    lands within 2σ of the exact distinct count (measured on the fixture:
    +5.3% at sf0.001, +8.8% at sf0.01)."""
    from osm_merge_spark.queries.relational import q_distinct_users, q_hll_users

    est = {r["event_type"]: r["est_e6"] / 1e6
           for r in q_hll_users(spark, sf_dir).collect()}
    exact = {r["event_type"]: r["n_users"]
             for r in q_distinct_users(spark, sf_dir).collect()}
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] / n - 1) < 0.26, (t, n, est[t])


def test_hll_shuffle_carries_registers_not_users(spark, sf_dir):
    """The first aggregation's grouping key is (event_type, bucket) — the
    partial agg caps every map task's output at m=64 rows per type. The
    plan must show partial_max on that key, and never a distinct over
    user_id."""
    from osm_merge_spark.queries.relational import q_hll_users

    plan = q_hll_users(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_max" in plan
    assert "distinct" not in plan.lower()


# --- decontaminate_bloom ----------------------------------------------------------
def test_bloom_flags_superset_of_exact_with_tiny_fp(spark, sf_dir):
    """Bloom membership can only ADD false positives: every exactly-hit
    document must be flagged with n_flagged >= its exact n_hits, and the
    extra flagged mass must stay tiny (fill^k ≈ 5e-5 here)."""
    exact = {r["doc_id"]: r["n_hits"]
             for r in text.q_decontaminate(spark, sf_dir).collect()}
    bloom = {r["doc_id"]: r["n_flagged"]
             for r in text.q_decontaminate_bloom(spark, sf_dir).collect()}
    assert set(exact) <= set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n, d
    extra_docs = set(bloom) - set(exact)
    extra_shingles = (sum(bloom.values()) - sum(exact.values()))
    total = sum(bloom.values())
    assert extra_shingles <= max(2, 0.01 * total), (extra_docs,
                                                    extra_shingles)


def test_bloom_position_set_is_bounded(spark, sf_dir):
    """The broadcast side is ≤ m positions regardless of eval-corpus size —
    the entire point of the swap."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from osm_merge_spark.operators import dedup
    from pyspark.sql import functions as FF

    ev = dedup._doc_shingles(
        docs.filter(FF.col("doc_id") % text.DECON_MOD == 0),
        "text", "doc_id", text.DECON_K,
    ).select("sh").distinct()
    n_pos = ev.select(FF.explode(FF.array(*[
        text._bloom_pos(FF.col("sh"), s) for s in range(text.BLOOM_K)
    ])).alias("pos")).distinct().count()
    assert n_pos <= text.BLOOM_M


# --- cms_user_counts ---------------------------------------------------------------
def test_cms_estimates_are_tight_upper_bounds(spark, sf_dir):
    """Count-Min guarantee: est >= true count always; overestimate ≤ 2N/w
    with prob ≥ 1-2^-d — at this fixture's N and w=1024 the bound is loose
    enough that est should be EXACT for nearly every probe."""
    from osm_merge_spark.queries.relational import (CMS_PROBE_MOD,
                                                    q_cms_user_counts)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["user_id"]: r["n"]
        for r in ev.filter(F.col("user_id") % CMS_PROBE_MOD == 0)
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    est = {r["user_id"]: r["est_count"]
           for r in q_cms_user_counts(spark, sf_dir).collect()}
    assert set(est) == set(exact)
    n_total = ev.count()
    from osm_merge_spark.operators.sketches import CMS_W

    bound = 2 * n_total / CMS_W
    for u, n in exact.items():
        assert est[u] >= n, u                      # never underestimates
        assert est[u] <= n + max(bound, 1), u      # CM error bound
