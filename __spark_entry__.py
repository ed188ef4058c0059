"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship conflation pipeline on sf0.001 (full ladder with the
               engine's cell join, Arrow refine kernels, ranking windows).
queries()    — one entry per implemented operator from SURVEY.md §2 plus the
               training-data ops, each over the driver's parquet tables.
oracle_sql() — bit-identical ANSI SQL for DuckDB (same column names; every
               double routed through round() in both engines).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm_merge_spark.queries import registry  # noqa: E402
from osm_merge_spark.session import _ship_package  # noqa: E402

_TESTDATA_SF0001 = "/root/testdata/sf0.001"


def _wrap(fn):
    """Ship the package zip to executors on whatever session the driver
    hands us — its python workers can't otherwise import the module-level
    pandas UDFs (the driver session didn't run our get_spark)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full conflation (J1→J3→J7 ladder) over the image+caption
    table derived from sf0.001, via the engine's conflate() operator."""
    from pyspark.sql import functions as F

    from osm_merge_spark.operators.conflate import ConflateParams, conflate
    from osm_merge_spark.queries import base

    _ship_package(spark)

    img = base.images_df(spark, _TESTDATA_SF0001)
    lyr = base.layer_df(spark, _TESTDATA_SF0001).select(
        "feature_id",
        "version",
        F.lit("Point").alias("geom_type"),
        F.array("s_lon").alias("xs"),
        F.array("s_lat").alias("ys"),
        F.map_from_arrays(
            F.array(F.lit("name")), F.array(F.col("s_caption"))
        ).alias("tags"),
        F.col("s_caption").alias("caption"),
    )
    matched, _new = conflate(img, lyr, ConflateParams(), layer_is_points=True)
    return matched.select(
        "image_id", "feature_id", "dist_m", "ratio", "hits", "version"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in registry().items() if sql is not None
    }
