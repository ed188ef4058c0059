"""Z-order bucketed table layout + partition-pruned spatial reads — the
data-layout half of the 100 TB story.

At 10^12 rows the cheapest query is the one whose files are never opened.
`write_zordered` lays a table out as `zb=<bucket>/` directory partitions,
where the bucket is the TOP bits of the row's Morton key (functions/
zorder.zorder_key): spatially-near rows land in the same directory, and
within each file rows are sorted by the full key so parquet row-group
min/max stats are tight. `read_bbox` then turns a lon/lat bbox into the
exact bucket set that can contain it — enumerated driver-side over the
(small, configurable) bucket space, never the data — and hands Spark an
`IN` predicate on the partition column, which Catalyst resolves at plan
time into directory-level PartitionFilters: pruned buckets are never
listed, opened, or scanned.

This is the mechanism Delta/Iceberg `OPTIMIZE ZORDER BY` + partition
evolution provide; the reference (flat per-AOI GeoJSON files,
tm-splitter's manual task directories) has no layout notion. The bucket
count is a config constant (default 256 = 4 Morton bits per axis), so the
driver-side enumeration is O(buckets), independent of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import zorder

BUCKET_BITS = 8  # 2^8 = 256 directory buckets (4 Morton bits per axis)
# must stay even: the bucket is the key's top BUCKET_BITS after a shift of
# 2*BITS-BUCKET_BITS, and only an even shift keeps x on even bit positions
assert BUCKET_BITS % 2 == 0


def zbucket(lon, lat,
            lon_range: tuple[float, float] = (-180.0, 180.0),
            lat_range: tuple[float, float] = (-90.0, 90.0)) -> F.Column:
    """Directory bucket = top BUCKET_BITS of the interleaved Morton key."""
    key = zorder.zorder_key(lon, lat, lon_range, lat_range)
    return F.shiftright(key, 2 * zorder.BITS - BUCKET_BITS).cast("int")


def _bucket_cell(b: int) -> tuple[int, int]:
    """De-interleave a bucket id back to its (x, y) coarse cell — the
    bucket spans x ∈ [cx, cx+1) · 2^(BITS-hx) quant units etc."""
    hx = BUCKET_BITS // 2 + (BUCKET_BITS % 2)  # x gets the extra bit (even
    hy = BUCKET_BITS // 2                      # positions are x's)
    cx = cy = 0
    for i in range(hx):
        cx |= ((b >> (2 * i)) & 1) << i
    for i in range(hy):
        cy |= ((b >> (2 * i + 1)) & 1) << i
    return cx, cy


def buckets_for_bbox(lon_min: float, lat_min: float, lon_max: float,
                     lat_max: float,
                     lon_range: tuple[float, float] = (-180.0, 180.0),
                     lat_range: tuple[float, float] = (-90.0, 90.0)) -> list[int]:
    """All buckets whose footprint intersects the bbox. Driver-side loop
    over the 2^BUCKET_BITS bucket space (256 by default) — O(buckets),
    never O(rows); the classic Z-range decomposition (litmax/bigmin) is
    unnecessary at this coarse granularity."""
    hx = BUCKET_BITS // 2 + (BUCKET_BITS % 2)
    hy = BUCKET_BITS // 2
    nx, ny = 1 << hx, 1 << hy
    qx = (1 << zorder.BITS) // nx  # quant units per bucket cell, x axis
    qy = (1 << zorder.BITS) // ny

    def quant(v: float, lo: float, hi: float) -> int:
        s = int((v - lo) / (hi - lo) * (1 << zorder.BITS))
        return min(max(s, 0), (1 << zorder.BITS) - 1)

    x0, x1 = quant(lon_min, *lon_range), quant(lon_max, *lon_range)
    y0, y1 = quant(lat_min, *lat_range), quant(lat_max, *lat_range)
    out = []
    for b in range(1 << BUCKET_BITS):
        cx, cy = _bucket_cell(b)
        bx0, bx1 = cx * qx, (cx + 1) * qx - 1
        by0, by1 = cy * qy, (cy + 1) * qy - 1
        if bx1 >= x0 and bx0 <= x1 and by1 >= y0 and by0 <= y1:
            out.append(b)
    return out


ROW_GROUP_BYTES = 8 * 1024 * 1024  # see write_zordered docstring


def write_zordered(df: DataFrame, out_dir: str,
                   lon_col: str = "lon", lat_col: str = "lat",
                   lon_range: tuple[float, float] | None = None,
                   lat_range: tuple[float, float] | None = None,
                   row_group_bytes: int = ROW_GROUP_BYTES) -> None:
    """Write df partitioned by Z-bucket directory, rows sorted by the full
    Morton key within each file (tight row-group min/max stats). One
    shuffle (repartition on the bucket) — at 10^12 rows this is the same
    one-time cost as any table rewrite, amortized over every spatial read
    that follows.

    The quantization domain defaults to the TABLE'S OWN extent (one cheap
    min/max agg — the same first step Delta's OPTIMIZE ZORDER runs): a
    global ±180/±90 domain would collapse a country-sized table into one
    bucket. The chosen ranges persist as `_zmeta.json` in the layout so
    readers reconstruct the identical bucket geometry.

    Row groups are capped at `row_group_bytes` (default 8 MiB, vs
    parquet's 128 MiB default) for two pruned-read reasons. (1) Task
    parallelism: Spark assigns parquet work at ROW-GROUP granularity — a
    byte-range split only yields rows for the row groups whose midpoint it
    covers — so a bbox read that prunes down to a handful of buckets
    (9/256 in the §6 bench) of single-row-group files concentrates ALL
    downstream map work (cell-cover explode, shuffle write) in ≤files
    tasks no matter how many byte splits Spark makes; measured at n=200M
    this starved the snap ladder's round 1 to ~0.8× of the flat scan.
    Small row groups restore ~bytes/8MiB-way parallelism on exactly the
    reads the layout exists for. (2) Stats granularity: the files are
    key-sorted, so each 8 MiB group spans a narrow Morton range and the
    residual bbox predicate prunes groups ~16× more precisely. The cost —
    more page headers on a full scan — lands on the access pattern the
    layout is not for."""
    import json
    import os

    if lon_range is None or lat_range is None:
        ext = df.agg(
            F.min(lon_col), F.max(lon_col), F.min(lat_col), F.max(lat_col)
        ).first()
        if ext[0] is None:
            # Empty input: the extent agg returns NULLs and the resulting
            # layout would hold only _zmeta.json (unreadable by read_bbox).
            raise ValueError(
                f"write_zordered: input has no rows, cannot derive a "
                f"quantization extent for {out_dir!r}; pass explicit "
                f"lon_range/lat_range if an empty layout is intended"
            )

        # epsilon pad so the max row quantizes inside the top cell instead
        # of clamping onto the boundary
        def pad(lo: float, hi: float) -> tuple[float, float]:
            span = max(hi - lo, 1e-9)
            return lo, hi + span * 1e-6

        lon_range = lon_range or pad(ext[0], ext[1])
        lat_range = lat_range or pad(ext[2], ext[3])

    keyed = df.withColumn(
        "zb", zbucket(F.col(lon_col), F.col(lat_col), lon_range, lat_range)
    ).withColumn(
        "__zkey", zorder.zorder_key(
            F.col(lon_col), F.col(lat_col), lon_range, lat_range
        )
    )
    (
        # repartitionByRange, not repartition("zb"): a hash partition per
        # bucket puts a HOT bucket (urban core, the synth hot cell) in one
        # straggler task; the range partitioner on (zb, key) splits a hot
        # bucket across tasks at key boundaries — each writes its own
        # internally-sorted file into the same zb= directory, so pruning
        # and row-group stats are unchanged while the write balances
        keyed.repartitionByRange("zb", "__zkey")
        .sortWithinPartitions("zb", "__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .option("parquet.block.size", str(row_group_bytes))
        .partitionBy("zb").parquet(out_dir)
    )
    with open(os.path.join(out_dir, "_zmeta.json"), "w") as f:
        json.dump({
            "lon_range": list(lon_range), "lat_range": list(lat_range),
            "bucket_bits": BUCKET_BITS,
            "lon_col": lon_col, "lat_col": lat_col,
        }, f)


def layout_meta(out_dir: str) -> dict:
    import json
    import os

    with open(os.path.join(out_dir, "_zmeta.json")) as f:
        return json.load(f)


def read_bbox(spark: SparkSession, out_dir: str,
              lon_min: float, lat_min: float, lon_max: float,
              lat_max: float) -> DataFrame:
    """Bbox read over a write_zordered layout: the bucket IN-list becomes
    directory-level PartitionFilters (pruned buckets are never even
    listed); the exact bbox predicate remains on the data columns and
    additionally prunes row groups via the sorted files' min/max stats."""
    meta = layout_meta(out_dir)
    lon_range = tuple(meta["lon_range"])
    lat_range = tuple(meta["lat_range"])
    lon_col, lat_col = meta["lon_col"], meta["lat_col"]
    bks = buckets_for_bbox(lon_min, lat_min, lon_max, lat_max,
                           lon_range, lat_range)
    df = spark.read.parquet(out_dir)
    return df.filter(
        F.col("zb").isin(bks)
        & (F.col(lon_col) >= lon_min) & (F.col(lon_col) <= lon_max)
        & (F.col(lat_col) >= lat_min) & (F.col(lat_col) <= lat_max)
    )
