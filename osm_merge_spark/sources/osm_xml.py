"""OSM XML source/sink (S2/S8 in SURVEY §2.1).

Reference behavior (osm_merge/conflator.py):
  - loadFile (:631-728): stream-parse nodes (id, version, timestamp, lat,
    lon, tags) and ways (id, version, refs, tags); drop `tiger:*` tags;
    dereference way refs through the node coordinate cache into
    LineStrings (:719-722).
  - writeOSM (:919-991): emit modified nodes/ways, version+1, action
    attribute, refs as <nd ref=...>.

Spark-first: one XML file = one unit of parallelism (spark.read "binaryFile"
→ mapInPandas parse). Planet-scale inputs are pre-split per tile/region by
the upstream prep stage — exactly the reference's osmium-extract layout
(contrib/update.sh:146-149) — so a 100 TB corpus parses as N files × M
executors with no cross-file state. Way dereference is the J9 join
(posexplode ⋈ nodes → ordered reassembly), not a driver-side dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, MapType, StringType,
    StructField, StructType,
)

NODE_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("version", IntegerType()),
    StructField("ts", StringType()),
    StructField("lat", DoubleType()),
    StructField("lon", DoubleType()),
    StructField("tags", MapType(StringType(), StringType())),
])

WAY_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("version", IntegerType()),
    StructField("ts", StringType()),
    StructField("refs", ArrayType(LongType())),
    StructField("tags", MapType(StringType(), StringType())),
])


def _parse_bytes(content: bytes, want: str):
    """Parse one OSM XML document; yield node or way dicts."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    for el in root:
        if el.tag != want:
            continue
        tags = {
            t.get("k"): t.get("v")
            for t in el.findall("tag")
            if not (t.get("k") or "").startswith("tiger:")
        }
        base = {
            "id": int(el.get("id")),
            "version": int(el.get("version", "1")),
            "ts": el.get("timestamp", ""),
            "tags": tags,
        }
        if want == "node":
            base["lat"] = float(el.get("lat"))
            base["lon"] = float(el.get("lon"))
        else:
            base["refs"] = [int(nd.get("ref")) for nd in el.findall("nd")]
        yield base


def _reader(want: str, schema: StructType):
    import pandas as pd

    cols = [f.name for f in schema.fields]

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(_parse_bytes(bytes(content), want))
            yield pd.DataFrame(rows, columns=cols)

    return parse


def read_nodes(spark: SparkSession, path: str) -> DataFrame:
    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(_reader("node", NODE_SCHEMA), schema=NODE_SCHEMA)


def read_ways(spark: SparkSession, path: str) -> DataFrame:
    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(_reader("way", WAY_SCHEMA), schema=WAY_SCHEMA)


def deref_ways(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J9: way refs → ordered packed LineString arrays, as a join —
    posexplode(refs) ⋈ nodes on id → array_sort(collect_list(struct)).
    (conflator.py:696-726 does this with a driver-side dict.)"""
    exploded = ways.select(
        F.col("id").alias("way_id"), "version", "tags",
        F.posexplode("refs").alias("pos", "node_id"),
    )
    joined = exploded.join(
        nodes.select(F.col("id").alias("node_id"), "lon", "lat"), "node_id"
    )
    pts = joined.groupBy("way_id", "version", "tags").agg(
        F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))).alias("pts")
    )
    return pts.select(
        "way_id", "version", "tags",
        F.transform("pts", lambda p: p["lon"]).alias("xs"),
        F.transform("pts", lambda p: p["lat"]).alias("ys"),
    )


def _xml_escape(col):
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    return F.regexp_replace(out, '"', "&quot;")


def write_osm_xml(nodes: DataFrame | None, ways: DataFrame | None,
                  filespec: str, bump_version: bool = True) -> None:
    """S8 sink: final curated outputs (the reference's JOSM-bound files).

    Row fragments are rendered distributively as columns and WRITTEN by the
    executors (df.write.text part files); the driver only streams those
    part files into the final document between header and footer — O(1)
    driver memory at any row count (the round-1 version collect()ed every
    fragment to the driver). Fragment order across partitions is not
    preserved; OSM XML imposes no element order. Version bump + modify
    action mirror conflator.py:945-991. XML-escape matches mvum.py:144's
    `<` fix, generalized."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="osmxml_")
    frag_dirs: list[str] = []

    def tag_frag(tags_col):
        return F.concat_ws(
            "",
            F.transform(
                F.map_entries(tags_col),
                lambda e: F.concat(
                    F.lit('  <tag k="'), _xml_escape(e["key"]),
                    F.lit('" v="'), _xml_escape(e["value"]), F.lit('"/>\n'),
                ),
            ),
        )

    bump = (F.col("version") + (1 if bump_version else 0)).cast("string")
    if nodes is not None:
        frags = nodes.select(
            F.concat(
                F.lit('<node id="'), F.col("id").cast("string"),
                F.lit('" version="'), bump,
                F.lit('" action="modify" lat="'), F.col("lat").cast("string"),
                F.lit('" lon="'), F.col("lon").cast("string"), F.lit('">\n'),
                tag_frag(F.col("tags")), F.lit("</node>"),
            ).alias("value")
        )
        frags.write.mode("overwrite").text(f"{tmp}/nodes")
        frag_dirs.append(f"{tmp}/nodes")
    if ways is not None:
        nd_frag = F.concat_ws(
            "",
            F.transform(
                F.col("refs"),
                lambda r: F.concat(
                    F.lit('  <nd ref="'), r.cast("string"), F.lit('"/>\n')
                ),
            ),
        )
        frags = ways.select(
            F.concat(
                F.lit('<way id="'), F.col("id").cast("string"),
                F.lit('" version="'), bump, F.lit('" action="modify">\n'),
                nd_frag, tag_frag(F.col("tags")), F.lit("</way>"),
            ).alias("value")
        )
        frags.write.mode("overwrite").text(f"{tmp}/ways")
        frag_dirs.append(f"{tmp}/ways")
    with open(filespec, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<osm version="0.6" generator="osm-merge-spark">\n')
        for d in frag_dirs:
            for part in sorted(glob.glob(f"{d}/part-*")):
                with open(part) as pf:
                    shutil.copyfileobj(pf, f)
        f.write("</osm>\n")
    shutil.rmtree(tmp, ignore_errors=True)
