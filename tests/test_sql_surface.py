"""The engine is reachable through plain Spark SQL, not just the DataFrame
API (BASELINE.json input_hint: "API: pyspark.sql DataFrame"; users of the
reference drive everything through CLI + SQL-ish PostGIS queries). Register
the canonical tables as temp views and express the core joins in SQL —
results must match the DataFrame formulations exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_merge_spark.functions.cells import TileGrid
from osm_merge_spark.queries import base


def test_sql_tile_assign_matches_dataframe(spark, sf_dir):
    from osm_merge_spark.queries.geo import TILES, q_tile_assign

    img = base.images_df(spark, sf_dir)
    img.createOrReplaceTempView("images_v")
    size = TILES.tile_m
    nx = TILES.nx
    r = 6378137.0
    got = spark.sql(f"""
        SELECT CAST(floor(({r} * ln(tan(radians(lat) / 2 + pi() / 4))) / {size})
                    * {nx}
                  + floor(({r} * radians(lon)) / {size}) AS BIGINT) AS tile_id,
               count(*) AS n_images
        FROM images_v GROUP BY 1
    """)
    want = q_tile_assign(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sql_distance_join_matches_dataframe(spark, sf_dir):
    """The J1 cell join expressed as SQL over the same views: encode cells
    with a SQL expression, LATERAL-explode the ring, equi-join, refine with
    SQL haversine. Must reproduce the engine's dist_join row set."""
    from osm_merge_spark.queries.geo import GRID, q_dist_join

    img = base.images_df(spark, sf_dir)
    lyr = base.layer_df(spark, sf_dir)
    img.createOrReplaceTempView("img_v")
    lyr.createOrReplaceTempView("lyr_v")
    cell_img = GRID.encode(F.col("lon"), F.col("lat"))
    cell_lyr = GRID.encode(F.col("s_lon"), F.col("s_lat"))
    # materialize the cell keys via DataFrame (the encode expression), then
    # run the join + refine purely in SQL
    img.withColumn("cell", cell_img).createOrReplaceTempView("img_c")
    lyr.withColumn("cell0", cell_lyr).createOrReplaceTempView("lyr_c")
    offs = ", ".join(str(o) for o in GRID.ring1_sql_values())
    thr = base.THRESHOLD_M
    got = spark.sql(f"""
        WITH sc AS (
          SELECT l.*, l.cell0 + o.off AS cell
          FROM lyr_c l LATERAL VIEW explode(array({offs})) o AS off
        )
        SELECT i.image_id, s.feature_id,
               round(2 * 6371008.8 * asin(sqrt(
                 pow(sin((radians(s.s_lat) - radians(i.lat)) / 2), 2)
                 + cos(radians(i.lat)) * cos(radians(s.s_lat))
                   * pow(sin((radians(s.s_lon) - radians(i.lon)) / 2), 2))), 3) AS dist_m
        FROM img_c i JOIN sc s USING (cell)
        WHERE 2 * 6371008.8 * asin(sqrt(
                 pow(sin((radians(s.s_lat) - radians(i.lat)) / 2), 2)
                 + cos(radians(i.lat)) * cos(radians(s.s_lat))
                   * pow(sin((radians(s.s_lon) - radians(i.lon)) / 2), 2))) <= {thr}
    """)
    want = q_dist_join(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
