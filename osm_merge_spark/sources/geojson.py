"""GeoJSON source/sink + .poly + per-tile task sinks (S1/S7/S10/S11).

Reference: Conflator.parseFile loads whole FeatureCollections into RAM
(conflator.py:811-846); writeGeoJson dumps them back (:993-1006);
geojson2poly.py writes osmosis .poly boundaries; tm-splitter.py writes one
task file per tile (:131-190).

Spark-first: features normalize into the engine's packed-geometry row form
(geom_type, xs, ys, tags). Big corpora should be line-delimited GeoJSON
(one feature per line — spark.read.json splits natively); classic
FeatureCollection files parse per-file like the XML source.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, MapType, StringType, StructField, StructType,
)

FEATURE_SCHEMA = StructType([
    StructField("geom_type", StringType()),
    StructField("xs", ArrayType(DoubleType())),
    StructField("ys", ArrayType(DoubleType())),
    StructField("tags", MapType(StringType(), StringType())),
])


def _flatten(geom: dict) -> tuple[str, list[float], list[float]]:
    gt = geom.get("type", "")
    cs = geom.get("coordinates", [])
    if gt == "Point":
        return gt, [cs[0]], [cs[1]]
    if gt == "LineString":
        return gt, [c[0] for c in cs], [c[1] for c in cs]
    if gt == "Polygon":
        # outer ring + interior rings (holes), NaN-separated like multipart
        # parts. Every GeoJSON ring is closed (first == last), so even-odd
        # parity over the packed array is exact: XOR of per-ring ray casts
        # (kernels.point_in_ring splits on the NaN sentinels). The
        # reference's shapely `contains` respects holes (geosupport.py:
        # 201-224) — a survey point in a courtyard is OUTSIDE.
        xs, ys = [], []
        for ring in cs:
            if xs:
                xs.append(float("nan"))
                ys.append(float("nan"))
            xs.extend([c[0] for c in ring])
            ys.extend([c[1] for c in ring])
        return gt, xs, ys
    if gt == "MultiLineString":
        # NaN-SEPARATED parts in one packed array: part boundaries survive
        # the packed row form and operators.multipart.explode_parts
        # recovers first-class per-part rows (conflator.py:485-495
        # dispatches per sub-geometry; a plain concatenation would invent
        # phantom bridge segments between parts)
        xs, ys = [], []
        for seg in cs:
            if xs:
                xs.append(float("nan"))
                ys.append(float("nan"))
            xs.extend([c[0] for c in seg])
            ys.extend([c[1] for c in seg])
        return gt, xs, ys
    if gt == "MultiPolygon":
        # every ring of every polygon (outers AND holes), NaN-separated.
        # Even-odd parity over all rings is exact for disjoint polygons;
        # per-ring rows from explode_parts are also what the boundary-
        # distance refine wants (a hole edge IS part of the boundary).
        xs, ys = [], []
        for poly in cs:
            for ring in poly:
                if xs:
                    xs.append(float("nan"))
                    ys.append(float("nan"))
                xs.extend([c[0] for c in ring])
                ys.extend([c[1] for c in ring])
        return gt, xs, ys
    if gt == "GeometryCollection":
        xs, ys = [], []
        for sub in geom.get("geometries", []):
            _, sx, sy = _flatten(sub)
            if not sx:
                continue
            if xs:
                xs.append(float("nan"))
                ys.append(float("nan"))
            xs.extend(sx)
            ys.extend(sy)
        return gt, xs, ys
    return gt, [], []


def read_feature_collection(spark: SparkSession, path: str) -> DataFrame:
    """Whole-FeatureCollection files: per-file parse (file = parallelism
    unit), normalized to the packed row form."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                fc = json.loads(bytes(content))
                for feat in fc.get("features", []):
                    if not feat.get("geometry") or not feat.get("properties"):
                        continue  # F4 null-geometry guard (conflator.py:165-167)
                    gt, xs, ys = _flatten(feat["geometry"])
                    rows.append({
                        "geom_type": gt, "xs": xs, "ys": ys,
                        "tags": {str(k): str(v) for k, v in
                                 feat["properties"].items()},
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(parse, schema=FEATURE_SCHEMA)


def feature_json_col(geom_type="geom_type", xs="xs", ys="ys", tags="tags"):
    """One GeoJSON Feature per row as a JSON string column (distributed —
    the sink for line-delimited output at scale)."""
    coords_pt = F.concat(
        F.lit("["), F.element_at(xs, 1).cast("string"), F.lit(","),
        F.element_at(ys, 1).cast("string"), F.lit("]"),
    )
    coords_line = F.concat(
        F.lit("["),
        F.concat_ws(",", F.zip_with(
            F.col(xs), F.col(ys),
            lambda x, y: F.concat(F.lit("["), x.cast("string"), F.lit(","),
                                  y.cast("string"), F.lit("]")),
        )),
        F.lit("]"),
    )
    coords = F.when(F.col(geom_type) == "Point", coords_pt).otherwise(coords_line)
    return F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"'), F.col(geom_type),
        F.lit('","coordinates":'), coords,
        F.lit('},"properties":'), F.to_json(F.col(tags)), F.lit("}"),
    )


def write_feature_collection(df: DataFrame, filespec: str) -> None:
    """S7 sink: classic FeatureCollection file (small, final outputs)."""
    rows = df.select(feature_json_col().alias("j")).collect()
    with open(filespec, "w") as f:
        f.write('{"type":"FeatureCollection","features":[\n')
        f.write(",\n".join(r.j for r in rows))
        f.write("\n]}\n")


def write_ndjson_features(df: DataFrame, out_dir: str,
                          partition_by: str | None = None) -> None:
    """Line-delimited feature sink — the scale path (S9/S11): one feature
    per line, optionally hash-partitioned into per-tile directories."""
    out = df.select(
        *( [F.col(partition_by)] if partition_by else [] ),
        feature_json_col().alias("value"),
    )
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.text(out_dir)


def write_poly(ring_xy: list[tuple[float, float]], name: str,
               filespec: str) -> None:
    """S10: osmosis .poly boundary writer (geojson2poly.py:82-113 —
    outer rings only)."""
    with open(filespec, "w") as f:
        f.write(f"{name}\n1\n")
        for x, y in ring_xy:
            f.write(f"   {x:E}   {y:E}\n")
        f.write("END\nEND\n")
