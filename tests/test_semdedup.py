"""SemDeDup (queries/vectors.q_semdedup) vs an independent NumPy pass."""

from __future__ import annotations

import numpy as np

from osm_merge_spark.queries import vectors


def _seq_dot(a, b) -> float:
    """Left-to-right sequential fold — the engine's F.aggregate(zip_with)
    form, bit for bit. BLAS matmul sums in a build-dependent order, which
    can flip argmax assignment / the τ keep flag at near-tie boundaries on
    other platforms (ADVICE r3)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _seq_cos(a, b) -> float:
    import math

    return _seq_dot(a, b) / (math.sqrt(_seq_dot(a, a)) * math.sqrt(_seq_dot(b, b)))


def _numpy_semdedup(ids: np.ndarray, X: np.ndarray):
    """Independent reimplementation: argmax-cosine assignment to the SEM_K
    lowest-id centroids, within-cluster pairwise cosine ≥ τ, drop the pair
    member with the larger (cos-to-centroid, id) key. Cosines use the same
    sequential summation as the engine so equality is exact by construction,
    not by luck of no near-ties."""
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    C = X[: vectors.SEM_K]
    cid_vals = ids[: vectors.SEM_K]
    sims = np.array([[_seq_cos(x, c) for c in C] for x in X])
    assign = sims.argmax(axis=1)  # first max = lowest centroid index
    c2c = sims[np.arange(len(ids)), assign]
    dropped = set()
    for c in range(vectors.SEM_K):
        idx = np.where(assign == c)[0]
        for ai in range(len(idx)):
            for bi in range(ai + 1, len(idx)):
                x, y = idx[ai], idx[bi]
                if _seq_cos(X[x], X[y]) >= vectors.SEM_TAU:
                    loser = x if (c2c[x], ids[x]) > (c2c[y], ids[y]) else y
                    dropped.add(int(ids[loser]))
    return {int(i): (int(cid_vals[a]), int(i) not in dropped)
            for i, a in zip(ids, assign)}


def test_semdedup_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    want = _numpy_semdedup(ids, X)

    got = {r["vec_id"]: (r["cluster"], r["keep"])
           for r in vectors.q_semdedup(spark, sf_dir).collect()}
    assert len(got) == len(want)
    # exact equality is safe: the oracle's cosines use the engine's own
    # sequential summation order, so there are no cross-build near-ties
    assert got == want
    # the rule actually fires: some rows dropped, most kept
    n_drop = sum(1 for _, k in got.values() if not k)
    assert 0 < n_drop < len(got) // 2


def test_clip_percentile_keeps_exact_top_fraction(spark, sf_dir):
    rows = vectors.q_clip_percentile(spark, sf_dir).collect()
    kept = sorted(r["score_e6"] for r in rows if r["keep"])
    dropped = [r["score_e6"] for r in rows if not r["keep"]]
    n = len(rows)
    n_keep_min = int(vectors.CLIP_TOP_FRAC * n)
    # at least ⌊p·N⌋ kept; overshoot only by the cutoff tie class
    assert len(kept) >= n_keep_min
    assert len(kept) - n_keep_min < max(2, n // 10)
    # total order: every kept score ≥ every dropped score
    if dropped:
        assert kept[0] >= max(dropped)
