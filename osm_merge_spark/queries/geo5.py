"""Round-4 registry additions: the per-tile pixel rollup and depth-limited
Douglas–Peucker, promoted from pytest-only to oracle-checked (r3 verdict
item #4).

tile_image_stats — raster rollup over REAL pixels: decode each synthetic
image (Arrow-batched zlib codec), roll integer channel sums up per map tile.
Non-tautological oracle: the Spark side must recover the sums through the
full encode → decode ladder (PNG roundtrip / QNT quantization), while the
DuckDB side replays the pixel GENERATOR's closed form — splitmix64
(data/images.py:29) emulated in SQL with 32-bit-half arithmetic (HUGEINT
only inside the two multiplies) plus the QNT dequantization formula. One
unstable bit anywhere in the codec or the decode path breaks the match.

dp_simplify — Douglas–Peucker kept-index sets over the 24-vertex GPS-trace
fixture (geo4._trace_df), depth-limited so the recursion is finitely
SQL-expressible: the oracle is a recursive CTE over (way_id, lo, hi, depth)
chord intervals; kept vertices = the union of all interval endpoints. The
reference reaches DP through shapely's geometry.simplify (GEOS) when
preparing fieldwork payloads (osm_merge/utilities tile prep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashes
from ..functions.cells import TileGrid
from ..functions.geo import dlit

QUERIES: dict = {}

# ---------------------------------------------------------------------------
# tile_image_stats
# ---------------------------------------------------------------------------
TIS_N = 240            # decode cost ~240 tiny 16×16 images — test-sized
TIS_W = TIS_H = 16     # synth_images default dims
TIS_TILE_M = 20_000.0  # ~20 km tiles → a handful over the AOI

_B32 = 1 << 32


def _halves(v: int) -> tuple[int, int]:
    return v >> 32, v & 0xFFFFFFFF


_SM_C = 0x9E3779B97F4A7C15   # splitmix64 golden-ratio increment
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB


def _mul64_sql(h: str, l: str, k: int) -> tuple[str, str]:
    """(h,l) * k mod 2^64 as 32-bit halves. Only the partial products go
    through HUGEINT (each < 2^64 — BIGINT would overflow); the result comes
    back as BIGINT halves."""
    kh, kl = _halves(k)
    p = (
        f"(CAST({l} AS HUGEINT) * {kl}"
        f" + ((CAST({l} AS HUGEINT) * {kh} + CAST({h} AS HUGEINT) * {kl})"
        f" % {_B32}) * {_B32})"
    )
    return (
        f"CAST((({p}) // {_B32}) % {_B32} AS BIGINT)",
        f"CAST(({p}) % {_B32} AS BIGINT)",
    )


def _shr64_sql(h: str, l: str, s: int) -> tuple[str, str]:
    """(h,l) >> s for 0 < s < 32, via exact integer division."""
    return (
        f"(({h}) // {1 << s})",
        f"((({h}) % {1 << s}) * {1 << (32 - s)} + ({l}) // {1 << s})",
    )


def _xor64(h1: str, l1: str, h2: str, l2: str) -> tuple[str, str]:
    return f"xor({h1}, {h2})", f"xor({l1}, {l2})"


def _splitmix_word_sql(x: str) -> tuple[str, str]:
    """splitmix64(x) for BIGINT x < 2^40 (our seeds never exceed it, so the
    first addition cannot wrap 2^64), as (high, low) 32-bit halves."""
    ch, cl = _halves(_SM_C)
    al = f"((({x}) % {_B32} + {cl}) % {_B32})"
    carry = f"((({x}) % {_B32} + {cl}) // {_B32})"
    ah = f"((({x}) // {_B32} + {ch} + {carry}) % {_B32})"
    sh, sl = _shr64_sql(ah, al, 30)
    bh, bl = _xor64(ah, al, sh, sl)
    ch_, cl_ = _mul64_sql(bh, bl, _SM_M1)
    sh, sl = _shr64_sql(ch_, cl_, 27)
    dh, dl = _xor64(ch_, cl_, sh, sl)
    eh, el = _mul64_sql(dh, dl, _SM_M2)
    sh, sl = _shr64_sql(eh, el, 31)
    return _xor64(eh, el, sh, sl)


def _decode_channel_sums(images: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) → (image_id, sr, sg, sb): integer per-channel
    pixel sums from the REAL decoded bytes. Arrow-batched; pixels reduce to
    three longs executor-side, so bytes never shuffle."""
    import pandas as pd

    def run(batches):
        import numpy as np

        from ..data import images as codec

        for pdf in batches:
            out = {"image_id": [], "sr": [], "sg": [], "sb": []}
            for iid, buf, fmt in zip(pdf["image_id"], pdf["bytes"],
                                     pdf["fmt"]):
                px = codec.decode(bytes(buf), fmt).astype(np.int64)
                s = px.reshape(-1, 3).sum(axis=0)
                out["image_id"].append(iid)
                out["sr"].append(int(s[0]))
                out["sg"].append(int(s[1]))
                out["sb"].append(int(s[2]))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema="image_id string, sr long, sg long, sb long"
    )


def q_tile_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..data import synth

    img = synth.synth_images(spark, TIS_N, with_bytes=True)
    sums = _decode_channel_sums(img)
    grid = TileGrid(tile_m=TIS_TILE_M)
    keyed = img.select(
        "image_id", grid.tile_id(F.col("lon"), F.col("lat")).alias("tile_id")
    ).join(sums, "image_id")
    return keyed.groupBy("tile_id").agg(
        F.count("*").alias("n_images"),
        F.sum("sr").alias("sum_r"),
        F.sum("sg").alias("sum_g"),
        F.sum("sb").alias("sum_b"),
    )


def _sql_tile_image_stats() -> str:
    from ..data import synth

    # --- pixel channel sums: splitmix64 replay --------------------------
    n_bytes = TIS_W * TIS_H * 3
    n_words = n_bytes // 8  # 768 % 8 == 0: the generator's +1 pad word is
    #                         sliced off before it contributes any byte
    wh, wl = _splitmix_word_sql("x")
    sums = (
        f"xs AS (SELECT i, j, CAST(i AS BIGINT) * 2654435761 + 1 + j AS x"
        f" FROM imgs, range({n_words}) w(j)), "
        f"wd AS (SELECT i, j, {wh} AS wh, {wl} AS wl FROM xs), "
        # little-endian byte t of word j = byte position p = 8j + t
        f"pxb AS (SELECT i, (8 * j + t) % 3 AS ch,"
        f" CASE WHEN t < 4 THEN (wl // CAST(power(256, t) AS BIGINT)) % 256"
        f" ELSE (wh // CAST(power(256, t - 4) AS BIGINT)) % 256 END AS v"
        f" FROM wd, range(8) r(t)), "
        # decode: png is lossless; qnt (i%3=0) dequantizes to bin centers
        # (v//6)*6+3 — always in [3,255], so the codec's clip is identity
        f"dec AS (SELECT i, ch,"
        f" CASE WHEN i % 3 = 0 THEN (v // 6) * 6 + 3 ELSE v END AS dv"
        f" FROM pxb), "
        f"sums AS (SELECT i,"
        f" CAST(sum(dv) FILTER (ch = 0) AS BIGINT) AS sr,"
        f" CAST(sum(dv) FILTER (ch = 1) AS BIGINT) AS sg,"
        f" CAST(sum(dv) FILTER (ch = 2) AS BIGINT) AS sb"
        f" FROM dec GROUP BY i)"
    )
    # --- positions: data/synth._position mirror -------------------------
    spread = synth._hot_spread(TIS_N)
    h1 = hashes.md5i_sql("'lon' || CAST(i AS VARCHAR)")
    h2 = hashes.md5i_sql("'lat' || CAST(i AS VARCHAR)")
    u1 = f"(CAST(({h1}) % 1000000 AS DOUBLE) / {dlit(1_000_000.0)})"
    u2 = f"(CAST(({h2}) % 1000000 AS DOUBLE) / {dlit(1_000_000.0)})"
    lon = (
        f"(CASE WHEN i % {synth.HOT_FRAC_MOD} = 0 THEN {dlit(synth.HOT_LON)}"
        f" + ({u1} - {dlit(0.5)}) * {dlit(spread)}"
        f" ELSE {dlit(synth.LON_MIN)}"
        f" + {u1} * {dlit(synth.LON_MAX - synth.LON_MIN)} END)"
    )
    lat = (
        f"(CASE WHEN i % {synth.HOT_FRAC_MOD} = 0 THEN {dlit(synth.HOT_LAT)}"
        f" + ({u2} - {dlit(0.5)}) * {dlit(spread)}"
        f" ELSE {dlit(synth.LAT_MIN)}"
        f" + {u2} * {dlit(synth.LAT_MAX - synth.LAT_MIN)} END)"
    )
    grid = TileGrid(tile_m=TIS_TILE_M)
    tile = grid.tile_id_sql("lon", "lat")
    return (
        f"WITH imgs AS (SELECT CAST(i AS BIGINT) AS i FROM range({TIS_N}) t(i)), "
        f"{sums}, "
        f"pos AS (SELECT i, {lon} AS lon, {lat} AS lat FROM imgs), "
        f"tiled AS (SELECT i, {tile} AS tile_id FROM pos) "
        f"SELECT tile_id, count(*) AS n_images,"
        f" CAST(sum(sr) AS BIGINT) AS sum_r,"
        f" CAST(sum(sg) AS BIGINT) AS sum_g,"
        f" CAST(sum(sb) AS BIGINT) AS sum_b"
        f" FROM tiled JOIN sums USING (i) GROUP BY tile_id"
    )


QUERIES["tile_image_stats"] = (q_tile_image_stats, _sql_tile_image_stats())


# ---------------------------------------------------------------------------
# dp_simplify — depth-limited Douglas–Peucker kept-index sets
# ---------------------------------------------------------------------------
DP_EPS_M = 25.0     # jitter (~1 m) dropped, planted corners (~1.1 km) kept
DP_MAX_DEPTH = 6    # ≤ 2^6 chord intervals per way; n=24 → effectively full


def q_dp_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import simplify
    from .geo4 import _trace_df

    tr = _trace_df(spark, sf_dir)
    udf = simplify.dp_kept_indices_udf(DP_EPS_M, max_depth=DP_MAX_DEPTH)
    kept = udf(F.col("xs"), F.col("ys"))
    return tr.select(
        "way_id",
        F.size("xs").alias("n_in"),
        F.size(kept).alias("n_out"),
        F.array_join(
            F.transform(kept, lambda i: i.cast("string")), ","
        ).alias("kept_csv"),
    )


def _sql_dp_simplify() -> str:
    from ..operators.simplify import MX, MY
    from .geo4 import _TRACE_SQL

    # per-chord deviation of vertex k from the (lo, hi) chord — the exact
    # numpy forms from operators/simplify.dp_keep_mask, elementwise IEEE
    dist = (
        "(CASE WHEN (X[hi] - X[lo]) * (X[hi] - X[lo])"
        " + (Y[hi] - Y[lo]) * (Y[hi] - Y[lo]) = 0.0e0"
        " THEN sqrt((X[k] - X[lo]) * (X[k] - X[lo])"
        " + (Y[k] - Y[lo]) * (Y[k] - Y[lo]))"
        " ELSE abs((X[k] - X[lo]) * (Y[hi] - Y[lo])"
        " - (Y[k] - Y[lo]) * (X[hi] - X[lo]))"
        " / sqrt((X[hi] - X[lo]) * (X[hi] - X[lo])"
        " + (Y[hi] - Y[lo]) * (Y[hi] - Y[lo])) END)"
    )
    return (
        f"WITH RECURSIVE tr AS ({_TRACE_SQL}), "
        f"sc AS (SELECT way_id,"
        f" list_transform(xs, v -> v * {dlit(MX)}) AS X,"
        f" list_transform(ys, v -> v * {dlit(MY)}) AS Y,"
        f" len(xs) AS n FROM tr), "
        # chord intervals: root (1, n); an interval splits at its argmax-
        # deviation vertex (first max — numpy argmax ties) while the max
        # deviation exceeds eps and depth < DP_MAX_DEPTH. Kept vertices =
        # the union of every interval endpoint ever created.
        "iv(way_id, lo, hi, depth) AS ("
        " SELECT way_id, 1, n, 0 FROM sc"
        " UNION ALL"
        " SELECT t.way_id,"
        "  CASE WHEN r.side = 0 THEN t.lo ELSE t.ks END,"
        "  CASE WHEN r.side = 0 THEN t.ks ELSE t.hi END,"
        "  t.depth + 1"
        " FROM ("
        "  SELECT iv.way_id, iv.lo, iv.hi, iv.depth,"
        "   iv.lo + list_position(ds, list_max(ds)) AS ks,"
        "   list_max(ds) AS dmax"
        "  FROM (SELECT iv.way_id, iv.lo, iv.hi, iv.depth,"
        f"    list_transform(range(iv.lo + 1, iv.hi), k -> {dist}) AS ds"
        "   FROM iv JOIN sc ON sc.way_id = iv.way_id"
        f"   WHERE iv.hi > iv.lo + 1 AND iv.depth < {DP_MAX_DEPTH}) iv"
        " ) t, range(2) r(side)"
        f" WHERE t.dmax > {dlit(DP_EPS_M)}"
        "), "
        # DuckDB 1.0 fails to dedup a plain UNION whose branches both read a
        # recursive CTE — outer DISTINCT over UNION ALL is the reliable form
        "kept AS (SELECT DISTINCT way_id, idx FROM"
        " (SELECT way_id, lo AS idx FROM iv"
        "  UNION ALL SELECT way_id, hi AS idx FROM iv)) "
        "SELECT k.way_id, CAST(s.n AS INT) AS n_in,"
        " CAST(k.n_out AS INT) AS n_out, k.kept_csv"
        " FROM (SELECT way_id, count(*) AS n_out,"
        " string_agg(CAST(idx AS VARCHAR), ',' ORDER BY idx) AS kept_csv"
        " FROM kept GROUP BY way_id) k"
        " JOIN sc s ON s.way_id = k.way_id"
    )


QUERIES["dp_simplify"] = (q_dp_simplify, _sql_dp_simplify())
