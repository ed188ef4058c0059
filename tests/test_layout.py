"""Z-order bucketed layout: partition pruning must be visible in the plan
AND in the files actually read, with zero correctness loss vs a full scan."""

from __future__ import annotations

import pyspark.sql.functions as F

from osm_merge_spark.operators import layout
from osm_merge_spark.queries import base


BBOX = (-108.9, 43.5, -108.6, 43.75)  # interior slice of the synth AOI


def _source(spark, sf_dir):
    return base.images_df(spark, sf_dir).select("image_id", "lon", "lat")


def test_bbox_read_prunes_partitions_and_matches_full_scan(spark, sf_dir, tmp_path):
    out = str(tmp_path / "zlayout")
    src = _source(spark, sf_dir)
    layout.write_zordered(src, out)

    pruned = layout.read_bbox(spark, out, *BBOX)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "zb" in plan

    # correctness: identical rows to the unpruned predicate
    want = sorted(
        r["image_id"] for r in src.filter(
            (F.col("lon") >= BBOX[0]) & (F.col("lon") <= BBOX[2])
            & (F.col("lat") >= BBOX[1]) & (F.col("lat") <= BBOX[3])
        ).collect()
    )
    got = sorted(r["image_id"] for r in pruned.collect())
    assert got == want and len(got) > 0

    # pruning is real: the scan node selects strictly fewer directory
    # partitions than the layout has (inputFiles() ignores filters, so ask
    # the FileSourceScanExec itself)
    n_dirs = len({f.split("/zb=")[1].split("/")[0]
                  for f in spark.read.parquet(out).inputFiles()})
    leaves = pruned._jdf.queryExecution().executedPlan().collectLeaves()
    scan = None
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "FileSourceScan" in node.getClass().getName():
            scan = node
            break
    assert scan is not None, "no file scan leaf found"
    # the collect() above executed the scan, so its SQL metrics are final:
    # numPartitions = directory partitions actually selected post-pruning
    n_selected = int(scan.metrics().apply("numPartitions").value())
    assert 0 < n_selected < n_dirs
    meta = layout.layout_meta(out)
    bks = set(layout.buckets_for_bbox(
        *BBOX, lon_range=tuple(meta["lon_range"]),
        lat_range=tuple(meta["lat_range"]),
    ))
    assert n_selected <= len(bks)


def test_bucket_enumeration_covers_every_row(spark, sf_dir, tmp_path):
    """No bucket containing a bbox row may be pruned: for every row inside
    the bbox, its zbucket must be in buckets_for_bbox (completeness of the
    driver-side footprint math — the property pruning correctness rests on)."""
    out = str(tmp_path / "zcover")
    src = _source(spark, sf_dir)
    layout.write_zordered(src, out)
    meta = layout.layout_meta(out)
    lon_r, lat_r = tuple(meta["lon_range"]), tuple(meta["lat_range"])
    inside = src.filter(
        (F.col("lon") >= BBOX[0]) & (F.col("lon") <= BBOX[2])
        & (F.col("lat") >= BBOX[1]) & (F.col("lat") <= BBOX[3])
    ).select(
        layout.zbucket(F.col("lon"), F.col("lat"), lon_r, lat_r).alias("zb")
    ).distinct()
    row_buckets = {r["zb"] for r in inside.collect()}
    assert row_buckets <= set(
        layout.buckets_for_bbox(*BBOX, lon_range=lon_r, lat_range=lat_r)
    )


def test_files_internally_sorted_by_zkey(spark, sf_dir, tmp_path):
    """Rows within each written file must be Morton-sorted so row-group
    min/max stats are tight (the second pruning level)."""
    from osm_merge_spark.functions import zorder

    out = str(tmp_path / "zsorted")
    layout.write_zordered(_source(spark, sf_dir), out)
    meta = layout.layout_meta(out)
    lon_r, lat_r = tuple(meta["lon_range"]), tuple(meta["lat_range"])
    files = spark.read.parquet(out).inputFiles()
    checked = 0
    for one in files[:5]:
        df = spark.read.parquet(one).withColumn(
            "k", zorder.zorder_key(F.col("lon"), F.col("lat"), lon_r, lat_r)
        )
        ks = [r["k"] for r in df.collect()]
        assert ks == sorted(ks)
        checked += len(ks)
    assert checked > 1


def test_bucket_footprint_complete_hypothesis():
    """Property: for ANY bbox and ANY point inside it, the point's bucket is
    in buckets_for_bbox — pure driver-side math, no Spark. A miss here is a
    silently-dropped row at read time, the worst failure a layout can have."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from osm_merge_spark.functions import zorder
    from osm_merge_spark.operators.layout import (
        BUCKET_BITS, _bucket_cell, buckets_for_bbox,
    )

    def py_bucket(lon, lat, lon_r, lat_r):
        # mirror of layout.zbucket's quant + interleave + top-bits shift
        def quant(v, lo, hi):
            s = int((v - lo) / (hi - lo) * (1 << zorder.BITS))
            return min(max(s, 0), (1 << zorder.BITS) - 1)

        x, y = quant(lon, *lon_r), quant(lat, *lat_r)
        key = 0
        for i in range(zorder.BITS):
            key |= ((x >> i) & 1) << (2 * i)
            key |= ((y >> i) & 1) << (2 * i + 1)
        return key >> (2 * zorder.BITS - BUCKET_BITS)

    rng = st.floats(-109.2, -108.2, allow_nan=False)
    rat = st.floats(0.0, 1.0, allow_nan=False)

    @settings(max_examples=200, deadline=None)
    @given(a=rng, b=rng, la=st.floats(43.4, 44.0), lb=st.floats(43.4, 44.0),
           fx=rat, fy=rat)
    def run(a, b, la, lb, fx, fy):
        lon0, lon1 = min(a, b), max(a, b)
        lat0, lat1 = min(la, lb), max(la, lb)
        lon_r, lat_r = (-109.2, -108.2 + 1e-6), (43.4, 44.0 + 1e-6)
        # a point inside the bbox (interpolated)
        plon = lon0 + fx * (lon1 - lon0)
        plat = lat0 + fy * (lat1 - lat0)
        bks = set(buckets_for_bbox(lon0, lat0, lon1, lat1,
                                   lon_range=lon_r, lat_range=lat_r))
        assert py_bucket(plon, plat, lon_r, lat_r) in bks
        # sanity on the de-interleave helper
        for bk in list(bks)[:4]:
            cx, cy = _bucket_cell(bk)
            assert 0 <= cx < 16 and 0 <= cy < 16

    run()


def test_write_zordered_empty_input_raises_clearly(spark, tmp_path):
    """Empty input has no extent to quantize — must fail with a clear
    ValueError, not a TypeError from pad(None, None) or an unreadable
    layout holding only _zmeta.json."""
    import pytest
    from pyspark.sql import functions as F

    empty = spark.range(1).select(
        F.col("id").cast("double").alias("lon"),
        F.col("id").cast("double").alias("lat"),
    ).filter(F.lit(False))
    with pytest.raises(ValueError, match="no rows"):
        layout.write_zordered(empty, str(tmp_path / "z_empty"))


def test_row_group_bound_splits_files_for_pruned_read_parallelism(
        spark, sf_dir, tmp_path):
    """Spark assigns parquet work at row-group granularity, so a pruned
    read over few single-row-group files concentrates all downstream map
    work in <=files tasks (measured 0.8x of flat scan at n=200M). The
    layout must therefore write row groups capped at row_group_bytes: a
    file larger than the bound holds multiple groups, each within ~2x of
    the bound (parquet flushes at the first size check PAST the target)."""
    import glob

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    # sf0.001 files never reach the bound; synthesize a hot cluster —
    # explicit quantization ranges 200x the data extent land every row in
    # a handful of buckets, so files MUST flush several 64K groups
    src = spark.range(300_000).select(
        F.col("id").alias("image_id"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 2000.0).alias("lon"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)) / 2000.0).alias("lat"),
    )
    out = str(tmp_path / "z_rg")
    layout.write_zordered(src, out, row_group_bytes=64 * 1024,
                          lon_range=(0.0, 100.0), lat_range=(0.0, 100.0))
    split = worst = 0
    for f in glob.glob(f"{out}/zb=*/*.parquet"):
        md = pq.ParquetFile(f).metadata
        if md.num_row_groups > 1:
            split += 1
        for i in range(md.num_row_groups):
            worst = max(worst, md.row_group(i).total_byte_size)
    assert split > 0, "no file held more than one row group at a 64K bound"
    assert worst <= 4 * 64 * 1024, f"row group {worst}B blew the bound"
