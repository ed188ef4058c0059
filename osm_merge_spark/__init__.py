"""osm_merge_spark — a from-scratch PySpark-native spatial conflation +
tiling engine with the query semantics of hotosm/osm-merge.

Built Spark-first: logical plans are declared with the DataFrame API and
optimized by Catalyst; geometry/text kernels that Catalyst cannot express
are Arrow-vectorized pandas UDFs (never per-row Python UDFs).

Layout:
  functions/  column-expression + pandas-UDF kernels (geo, cells, fuzzy, text)
  operators/  spatial joins, kNN, conflation ladder, tiling, dedupe, ANN
  sources/    ingest (GeoJSON, OSM-XML-shaped tables) and sinks
  plans/      end-to-end pipelines, checkpoint manifest, lineage/metrics
  streaming/  chunked/micro-batch ingestion (readjson.py equivalent)
  data/       deterministic synthetic fixtures (images+captions, layer, AOI)
"""

__version__ = "0.1.0"
