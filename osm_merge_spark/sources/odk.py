"""ODK submission ingest (S3 in SURVEY §2.1).

The reference parses ODK Central CSV/JSON submission exports through
osm_fieldwork's ODKParsers (osm_merge/conflator.py:836-845) into per-POI
dicts with a location and tag set. Re-expressed Spark-first:

  - spark.read.csv / spark.read.json does the format work (distributed,
    schema-inferring, splittable — the reference loads whole files in RAM);
  - the ODK conventions are plain column expressions: the geopoint column
    is 'lat lon alt acc' space-separated, headers carry group paths joined
    by '-' (e.g. 'all-name') whose leaf is the tag key, metadata columns
    are dropped.

Output schema matches the conflation ladder's primary side:
(image_id, caption, lon, lat, tags map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ODK metadata columns that never become OSM tags
_META = {"instanceid", "submissiondate", "start", "end", "today", "deviceid",
         "key", "submitterid", "submittername", "attachmentspresent",
         "attachmentsexpected", "status", "reviewstate", "edits"}


def _leaf(name: str) -> str:
    """'all-compound-name' → 'name' (ODK group paths join with '-')."""
    return name.rsplit("-", 1)[-1].lower()


def read_odk_csv(spark: SparkSession, path: str,
                 geopoint_col: str = "xlocation",
                 id_col: str = "instanceID") -> DataFrame:
    """ODK Central CSV submission export → normalized POI rows."""
    df = spark.read.option("header", True).csv(path)
    return _normalize(df, geopoint_col, id_col)


def read_odk_json(spark: SparkSession, path: str,
                  geopoint_col: str = "xlocation",
                  id_col: str = "instanceID") -> DataFrame:
    """ODK Central JSON submission export (one object per line)."""
    df = spark.read.json(path)
    return _normalize(df, geopoint_col, id_col)


def _normalize(df: DataFrame, geopoint_col: str, id_col: str) -> DataFrame:
    pt = F.split(F.col(geopoint_col).cast("string"), " ")
    # ODK geopoints are 'lat lon altitude accuracy'
    lat = F.element_at(pt, 1).cast("double")
    lon = F.element_at(pt, 2).cast("double")
    tag_cols = [
        c for c in df.columns
        if c not in (geopoint_col, id_col) and _leaf(c) not in _META
    ]
    entries = F.filter(
        F.array(*[
            F.struct(
                F.lit(_leaf(c)).alias("key"),
                F.col(c).cast("string").alias("value"),
            )
            for c in tag_cols
        ]),
        lambda e: e["value"].isNotNull() & (e["value"] != F.lit("")),
    )
    tags = F.map_from_entries(entries)
    return df.select(
        F.col(id_col).cast("string").alias("image_id"),
        F.element_at(tags, "name").alias("caption"),
        lon.alias("lon"),
        lat.alias("lat"),
        tags.alias("tags"),
    ).filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())
