"""spark-submit entry: flagship conflation on synthetic data (north rule:
runs via spark-submit --py-files on any cluster size)."""
import json
import sys

from pyspark.sql import SparkSession

from osm_merge_spark.data.synth import synth_images, synth_layer
from osm_merge_spark.operators.conflate import ConflateParams, conflate

spark = SparkSession.builder.appName("osm-merge-spark-submit-smoke").getOrCreate()
n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
matched, new = conflate(synth_images(spark, n), synth_layer(spark, n))
print(json.dumps({"n": n, "matched": matched.count(), "new": new.count()}))
spark.stop()
