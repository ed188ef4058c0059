"""Pixel-derived DCT pHash (operators/phash.py).

Verification strategy: (1) the batched tensor DCT matches an independent
O(n^4) direct-cosine-sum implementation bit-for-bit; (2) the hash is stable
under the QNT lossy codec (the same perturbation class real JPEG introduces)
and separates distinct images by a wide hamming margin; (3) the Spark
operator is a single Arrow-batched projection (no Exchange) whose values
equal the local single-image path; (4) undecodable formats yield NULL
instead of failing the batch.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_merge_spark.data import images as codec
from osm_merge_spark.operators import phash as P


def _naive_phash(px: np.ndarray) -> int:
    """Independent direct DCT-II (no matrix trick) — the parity reference."""
    g = P.resize_nn(P.luma(px))
    n = 32
    d = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(n):
                for y in range(n):
                    s += (g[x, y]
                          * np.cos(np.pi * (2 * x + 1) * u / (2 * n))
                          * np.cos(np.pi * (2 * y + 1) * v / (2 * n)))
            cu = np.sqrt(1.0 / n) if u == 0 else np.sqrt(2.0 / n)
            cv = np.sqrt(1.0 / n) if v == 0 else np.sqrt(2.0 / n)
            d[u, v] = cu * cv * s
    low = d.reshape(-1)
    med = np.median(low)
    val = 0
    for b in low > med:
        val = (val << 1) | int(b)
    return val


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def _u64(h: int) -> int:
    return h & (2**64 - 1)


def test_batched_dct_matches_direct_sum():
    for seed in (7, 123):
        px = codec.pixels_for_seed(seed, 16, 16)
        assert _u64(P.phash_single(px)) == _naive_phash(px)


def test_lossy_codec_stability_and_distinct_separation():
    twin, distinct = [], []
    for i in range(120):
        px = codec.pixels_for_seed(i, 16, 16)
        a = P.phash_single(codec.decode(codec.encode(px, "png"), "png"))
        b = P.phash_single(codec.decode(codec.encode(px, "qnt"), "qnt"))
        twin.append(_ham(a, b))
        c = P.phash_single(codec.pixels_for_seed(i + 10_000, 16, 16))
        distinct.append(_ham(a, c))
    assert max(twin) <= 7, f"lossy twin drifted: max hamming {max(twin)}"
    assert min(distinct) >= 12, f"distinct collided: min hamming {min(distinct)}"


def test_compute_phash_matches_local_and_nulls_unknown_fmt(spark):
    rows = []
    for i in range(8):
        px = codec.pixels_for_seed(i, 16, 16)
        fmt = "qnt" if i % 3 == 0 else "png"
        rows.append((f"img-{i}", codec.encode(px, fmt), fmt))
    rows.append(("img-jpeg", b"\xff\xd8\xff", "jpeg"))  # no codec in env
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["image_id"]: r["phash_px"] for r in P.compute_phash(df).collect()}
    assert got["img-jpeg"] is None
    for i in range(8):
        px = codec.pixels_for_seed(i, 16, 16)
        fmt = "qnt" if i % 3 == 0 else "png"
        expect = P.phash_single(codec.decode(codec.encode(px, fmt), fmt))
        assert got[f"img-{i}"] == expect


def test_compute_phash_plan_is_exchange_free(spark):
    df = spark.createDataFrame(
        [("a", codec.encode(codec.pixels_for_seed(1, 16, 16), "png"), "png")],
        "image_id string, bytes binary, fmt string",
    )
    plan = P.compute_phash(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower(), plan


def test_end_to_end_near_dup_from_pixels(spark):
    """decode → hash → banded join recovers exactly the planted twin set."""
    from osm_merge_spark.operators import dedup

    rows = []
    for i in range(30):
        px = codec.pixels_for_seed(i, 16, 16)
        rows.append((f"img-{i}", codec.encode(px, "png"), "png"))
        if i % 5 == 0:
            rows.append((f"twn-{i}", codec.encode(px, "qnt"), "qnt"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    pairs = dedup.phash_near_dup(
        P.compute_phash(df), phash_col="phash_px", id_col="image_id",
        max_hamming=7, n_bands=8,
    )
    got = {(r["d1"], r["d2"]) for r in pairs.collect()}
    want = {(f"img-{i}", f"twn-{i}") for i in range(0, 30, 5)}
    assert got == want
