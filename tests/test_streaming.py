"""Structured Streaming jobs drained with AvailableNow must equal their
batch twins on the same input (SURVEY §2.9)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm_merge_spark.streaming import jobs

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
EVENTS = f"{SF_DIR}/events.parquet"


def _stream_events(spark, tmp_path):
    # file-source streams need a directory; split the input into several
    # files so AvailableNow actually exercises multiple micro-batches
    src = str(tmp_path / "events_dir")
    if not os.path.exists(src):
        spark.read.parquet(EVENTS).repartition(4).write.parquet(src)
    schema = spark.read.parquet(EVENTS).schema
    return jobs.chunked_ingest(spark, src, schema)


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    stream = jobs.windowed_event_counts(_stream_events(spark, tmp_path))
    got = jobs.run_available_now(
        stream, str(tmp_path / "ck1"), query_name="wc"
    ).orderBy("window_start_us", "event_type").collect()

    batch = (
        spark.read.parquet(EVENTS)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type", "n", "sum_value",
        )
        .orderBy("window_start_us", "event_type")
        .collect()
    )
    assert len(got) == len(batch) > 0
    for g, b in zip(got, batch):
        assert (g.window_start_us, g.event_type, g.n) == (
            b.window_start_us, b.event_type, b.n
        )
        assert abs(g.sum_value - b.sum_value) < 1e-6


def test_session_window_equals_lag_cumsum_sessionizer(spark, tmp_path):
    # watermark > data span: the test checks gap-close semantics — late-drop
    # policy would otherwise differ run-to-run with unordered input files
    stream = jobs.session_events(_stream_events(spark, tmp_path),
                                 watermark="1000 hours")
    got = jobs.run_available_now(
        stream, str(tmp_path / "ck2"), query_name="sess"
    )

    from osm_merge_spark.queries.relational import q_sessionize

    batch = q_sessionize(spark, SF_DIR)
    a = {(r.user_id, r.start_us): r.n_events for r in got.collect()}
    b = {(r.user_id, r.start_us): r.n_events for r in batch.collect()}
    assert a == b and len(a) > 0


def test_streaming_conflation_equals_batch(spark, tmp_path):
    """foreachBatch conflation over a chunked image stream must produce
    exactly the batch result (per-image independence ⇒ chunk-invariant)."""
    from osm_merge_spark.data.synth import synth_images, synth_layer
    from osm_merge_spark.operators.conflate import ConflateParams, conflate

    n = 600
    images = synth_images(spark, n)
    layer = synth_layer(spark, n)

    src = str(tmp_path / "img_stream")
    images.repartition(4).write.parquet(src)  # 4 files → multiple batches
    schema = images.schema
    stream = jobs.chunked_ingest(spark, src, schema, max_files_per_trigger=1)
    out = str(tmp_path / "out")
    q = jobs.conflate_stream(stream, layer, out, str(tmp_path / "ck"))
    q.awaitTermination()

    got_matched = spark.read.parquet(f"{out}/matched")
    got_new = spark.read.parquet(f"{out}/new")
    want_matched, want_new = conflate(images, layer, ConflateParams())
    gm = {(r.image_id, r.feature_id) for r in got_matched.collect()}
    wm = {(r.image_id, r.feature_id) for r in want_matched.collect()}
    assert gm == wm and len(gm) > 0
    gn = {r.image_id for r in got_new.collect()}
    wn = {r.image_id for r in want_new.collect()}
    assert gn == wn and len(gn) > 0


def test_dedup_stream_equals_batch_dropduplicates(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): streaming
    first-occurrence dedup over a duplicated multi-file stream must keep
    exactly one row per key — state survives across micro-batches (the
    same key arriving in a LATER file must still be dropped)."""
    from osm_merge_spark.data.synth import synth_images

    n = 400
    images = synth_images(spark, n).select("image_id", "caption", "lon", "lat")
    # two copies in two separate files → duplicates arrive in different
    # micro-batches with maxFilesPerTrigger=1
    src = str(tmp_path / "dups")
    images.coalesce(1).write.parquet(src)
    images.coalesce(1).write.mode("append").parquet(src)

    stream = jobs.chunked_ingest(spark, src, images.schema,
                                 max_files_per_trigger=1)
    deduped = jobs.dedup_stream(stream, "image_id")
    got = jobs.run_available_now(
        deduped, str(tmp_path / "ck_dedup"), output_mode="append",
        query_name="dd",
    )
    ids = [r.image_id for r in got.collect()]
    assert len(ids) == n                      # one survivor per key
    assert len(set(ids)) == n
    assert set(ids) == {r.image_id for r in images.collect()}


def test_dedup_stream_state_ttl_reemits_expired_keys(spark, tmp_path):
    """VERDICT r2 #6: with state_ttl_ms, a key idle past the TTL is
    forgotten (its state is REMOVED by the processing-time timeout, so the
    store stays bounded) and re-emitted on its next occurrence; a key
    whose duplicates keep arriving has its idle clock restarted and stays
    suppressed. TTL needs a periodic trigger (timeouts fire on dataless
    triggers): availableNow backfills never idle, so they take the
    NoTimeout path — this test drives a real processingTime trigger."""
    import time

    src = str(tmp_path / "ttl_src")
    os.makedirs(src)
    schema = "image_id string, v int"

    def add_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def emitted():
        return sorted(r.image_id for r in spark.sql(
            "SELECT * FROM ttlq").collect())

    def wait_for(pred, timeout_s=120):
        t0 = time.time()
        while time.time() - t0 < timeout_s:
            try:
                if pred():
                    return True
            except Exception:
                pass
            time.sleep(0.3)
        return False

    # TTL 8 s / idle 2xTTL: wide margins — under co-tenant load the
    # processing-time triggers can stall for seconds, and the final phase
    # needs the add to land well inside B's refreshed TTL window
    TTL_MS = 8000
    add_file([("A", 1), ("B", 1)])
    stream = jobs.chunked_ingest(
        spark, src, spark.createDataFrame([], schema).schema
    )
    dd = jobs.dedup_stream(stream, "image_id", state_ttl_ms=TTL_MS)
    q = (
        dd.writeStream.format("memory").queryName("ttlq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ttl_ck"))
        .trigger(processingTime="250 milliseconds").start()
    )
    try:
        assert wait_for(lambda: emitted() == ["A", "B"])  # both firsts
        time.sleep(2.0 * TTL_MS / 1000)  # idle > TTL: dataless triggers expire A and B
        add_file([("B", 2), ("C", 1)])
        # B was forgotten while idle → re-emitted; C is a first
        assert wait_for(lambda: emitted() == ["A", "B", "B", "C"])
        # immediately (well inside the refreshed TTL): A re-emitted (it
        # stayed expired — no f2 sighting), B suppressed (f2 restarted
        # its clock)
        add_file([("A", 3), ("B", 3)])
        assert wait_for(lambda: emitted().count("A") == 2)
        assert emitted() == ["A", "A", "B", "B", "C"]
    finally:
        q.stop()


def test_phash_dedup_stream_suppresses_cross_batch_near_dups(spark, tmp_path):
    """Streaming pixel-pHash near-dup: batch 1 carries originals (png);
    batch 2 carries QNT re-encodes of half of them (near-dups, hamming ≤ 7)
    plus genuinely new images. The lossy twins must be suppressed by the
    persisted band table; the new images must survive. Within batch 1 a
    planted intra-batch twin must also collapse to one survivor."""
    from osm_merge_spark.data import images as codec

    schema = "image_id string, bytes binary, fmt string"

    def rows_png(seeds, prefix):
        return [(f"{prefix}-{s}", codec.encode(codec.pixels_for_seed(s, 16, 16), "png"), "png")
                for s in seeds]

    def rows_qnt(seeds, prefix):
        return [(f"{prefix}-{s}", codec.encode(codec.pixels_for_seed(s, 16, 16), "qnt"), "qnt")
                for s in seeds]

    src = str(tmp_path / "imgs")
    # batch 1: seeds 0..9 as png, plus an intra-batch twin of seed 0 (qnt)
    b1 = rows_png(range(10), "a") + rows_qnt([0], "zz")
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    # batch 2: qnt twins of seeds 0..4 (cross-batch dups) + new seeds 100..104
    b2 = rows_qnt(range(5), "b") + rows_png(range(100, 105), "b")
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = jobs.chunked_ingest(
        spark, src, spark.createDataFrame(b1, schema).schema,
        max_files_per_trigger=1,
    )
    q = jobs.phash_dedup_stream(
        stream, str(tmp_path / "seen"), str(tmp_path / "out"),
        str(tmp_path / "ck_ph"),
    )
    q.awaitTermination(120)
    got = {r.image_id for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}

    # batch-1 originals all survive; the intra-batch twin zz-0 lost to a-0
    assert {f"a-{s}" for s in range(10)} <= got
    assert "zz-0" not in got
    # batch-2 lossy twins suppressed by the seen table; new images survive
    assert not any(f"b-{s}" in got for s in range(5))
    assert {f"b-{s}" for s in range(100, 105)} <= got
    assert len(got) == 15


def test_phash_dedup_batch_replay_is_idempotent(spark, tmp_path):
    """Crash-replay: foreachBatch re-delivers a micro-batch whose outputs
    were already written. The seen-table read must ignore the batch's OWN
    pre-crash band rows (batch < batch_id) — otherwise every image matches
    itself at hamming 0 and the replay clobbers both outputs with empty
    data (ADVICE r3, high)."""
    from osm_merge_spark.data import images as codec

    schema = "image_id string, bytes binary, fmt string"
    rows = [
        (f"r-{s}", codec.encode(codec.pixels_for_seed(s, 16, 16), "png"), "png")
        for s in range(6)
    ]
    batch = spark.createDataFrame(rows, schema)
    seen_dir, out_dir = str(tmp_path / "seen"), str(tmp_path / "out")

    jobs.phash_dedup_batch(batch, 0, seen_dir, out_dir)
    first = {r.image_id for r in spark.read.parquet(out_dir).collect()}
    assert first == {f"r-{s}" for s in range(6)}

    # replay the same batch id (crash after the writes, before the commit)
    jobs.phash_dedup_batch(batch, 0, seen_dir, out_dir)
    replayed = {r.image_id for r in spark.read.parquet(out_dir).collect()}
    assert replayed == first

    # a later batch still dedups against batch 0's band state
    jobs.phash_dedup_batch(batch, 1, seen_dir, out_dir)
    after = {r.image_id for r in spark.read.parquet(out_dir).collect()}
    assert after == first  # batch 1 rows are all dups of batch 0's


def test_zonal_rollup_stream_equals_batch_query(spark, tmp_path):
    """Streaming per-zone pixel rollups across micro-batches must equal the
    batch q_zonal_stats rows exactly (counts and integer channel sums)."""
    from osm_merge_spark.data import synth
    from osm_merge_spark.queries.geo5 import TIS_N, q_zonal_stats

    src = str(tmp_path / "zimg")
    synth.synth_images(spark, TIS_N, with_bytes=True) \
        .repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # several micro-batches
        .parquet(src)
    )
    got = {
        r["zone_id"]: (r["n_images"], r["sum_r"], r["sum_g"], r["sum_b"])
        for r in jobs.run_available_now(
            jobs.zonal_image_rollup(stream), str(tmp_path / "ckz"),
            query_name="zonal",
        ).collect()
    }
    want = {
        r["zone_id"]: (r["n_images"], r["sum_r"], r["sum_g"], r["sum_b"])
        for r in q_zonal_stats(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want and len(got) == 4


def test_tile_mosaic_stream_equals_batch_query(spark, tmp_path):
    """The running per-tile best across micro-batches must equal the batch
    q_tile_mosaic rows exactly (winner, count, score) once the source
    drains — and the state held is one (struct, count) per tile."""
    from osm_merge_spark.queries import base
    from osm_merge_spark.queries.geo6 import q_tile_mosaic

    src = str(tmp_path / "mimg")
    base.images_df(spark, "/root/testdata/sf0.001").select(
        "image_id", "ikey", "lon", "lat"
    ).repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # several micro-batches
        .parquet(src)
    )
    got = {
        r["tile_id"]: (r["image_id"], r["n_images"], r["q_e6"])
        for r in jobs.run_available_now(
            jobs.tile_mosaic_stream(stream), str(tmp_path / "ckm"),
            query_name="mosaic",
        ).collect()
    }
    want = {
        r["tile_id"]: (r["image_id"], r["n_images"], r["q_e6"])
        for r in q_tile_mosaic(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want and len(got) > 100
