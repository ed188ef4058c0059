"""Round-2 regression tests for the judge/advisor findings:

  - shingles() on documents shorter than k words (ADVICE high: descending
    sequence + element_at under ANSI mode used to hard-fail),
  - fuzzy batch padding soundness with NUL characters (ADVICE low),
  - ngram_jaccard_pairs stop_df hot-shingle guard (VERDICT #4),
  - foreachBatch sink idempotency under replay (ADVICE medium).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from osm_merge_spark.functions import text
from osm_merge_spark.functions.fuzzy import _indel_ratio_batch, indel_ratio_oracle
from osm_merge_spark.operators import dedup


# ---------------------------------------------------------------------------
# shingles on short docs
# ---------------------------------------------------------------------------
def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_shingles_short_docs_do_not_crash(spark):
    df = _docs_df(spark, [
        ("d0", ""),                      # 0 words
        ("d1", "hello"),                 # 1 word
        ("d2", "hello world"),           # 2 words
        ("d3", "one two three"),         # exactly k=3 → 1 shingle
        ("d4", "one two three four"),    # 2 shingles
    ])
    got = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", text.shingles(text.words(F.col("text"))).alias("sh")
        ).collect()
    }
    assert got["d0"] == []
    assert got["d1"] == []
    assert got["d2"] == []
    assert got["d3"] == ["one two three"]
    assert got["d4"] == ["one two three", "two three four"]


def test_ngram_and_minhash_survive_short_docs(spark):
    # realistic corpus: includes 0/1/2-word docs alongside near-dup pairs
    df = _docs_df(spark, [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy cat"),
        ("s0", ""),
        ("s1", "ok"),
        ("s2", "two words"),
    ])
    pairs = dedup.ngram_jaccard_pairs(df).collect()
    assert {(r.d1, r.d2) for r in pairs} == {("a", "b")}
    sigs = dedup.minhash_signatures(df).collect()
    # short docs contribute no shingles → no signature row (matches oracle)
    assert {r.doc for r in sigs} == {"a", "b"}


# ---------------------------------------------------------------------------
# fuzzy padding soundness
# ---------------------------------------------------------------------------
def test_indel_ratio_batch_nul_characters_in_padding_zone():
    # row 0's a is much shorter than the batch max, so it is padded; b's
    # NULs land in the padded region and must NOT match the pad sentinel.
    av = ["ab", "abcdefghijklmnop"]
    bv = ["ab" + "\x00" * 10, "abcdefghijklmnop"]
    got = _indel_ratio_batch(av, bv)
    want = np.array([indel_ratio_oracle(a, b) for a, b in zip(av, bv)])
    assert np.allclose(got, want)


def test_indel_ratio_batch_nul_only_strings():
    av = ["\x00\x00", "x" * 8]
    bv = ["ab", "\x00" * 8]
    got = _indel_ratio_batch(av, bv)
    want = np.array([indel_ratio_oracle(a, b) for a, b in zip(av, bv)])
    assert np.allclose(got, want)


# ---------------------------------------------------------------------------
# stop_df hot-shingle guard
# ---------------------------------------------------------------------------
def test_stop_df_drops_hot_shingle_pairs(spark):
    # every doc shares the same boilerplate 3-gram; without the guard all
    # C(6,2) pairs collide on it, with the guard only the true near-dup
    # pair (x/y share two content shingles) survives min_inter=2.
    boiler = "copyright acme corp"
    rows = [(f"d{i}", f"{boiler} item{i} alpha{i} beta{i}") for i in range(4)]
    rows += [("x", f"{boiler} same same same thing"),
             ("y", f"{boiler} same same same other")]
    df = _docs_df(spark, rows)

    unguarded = dedup.ngram_jaccard_pairs(df, min_inter=1)
    # every pair shares the boilerplate shingle → quadratic in df(shingle)
    assert unguarded.count() == 15  # C(6,2)

    guarded = dedup.ngram_jaccard_pairs(df, min_inter=1, stop_df=5)
    got = {(r.d1, r.d2) for r in guarded.collect()}
    assert got == {("x", "y")}


def test_stop_df_matches_duckdb_oracle(spark):
    import duckdb

    rows = [(f"d{i}", f"shared prefix tokens unique{i} tail{i}")
            for i in range(8)]
    df = _docs_df(spark, rows)
    got = {
        (r.d1, r.d2, r.inter, r.jaccard_e6)
        for r in dedup.ngram_jaccard_pairs(df, min_inter=1, stop_df=4).collect()
    }
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    sql = dedup.ngram_jaccard_sql(min_inter=1, stop_df=4)
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# streaming sink idempotency
# ---------------------------------------------------------------------------
def test_conflate_stream_replay_is_idempotent(spark, tmp_path):
    """Replaying the whole stream against the same out_dir (fresh
    checkpoint — the worst-case at-least-once scenario: every batch is
    'retried') must not duplicate any output row."""
    from osm_merge_spark.data.synth import synth_images, synth_layer
    from osm_merge_spark.streaming import jobs

    n = 300
    images = synth_images(spark, n)
    layer = synth_layer(spark, n)
    src = str(tmp_path / "img_stream")
    images.repartition(3).write.parquet(src)
    stream_df = lambda: jobs.chunked_ingest(  # noqa: E731
        spark, src, images.schema, max_files_per_trigger=1
    )
    out = str(tmp_path / "out")

    q = jobs.conflate_stream(stream_df(), layer, out, str(tmp_path / "ck1"))
    q.awaitTermination()
    first = sorted(
        (r.image_id, r.feature_id)
        for r in spark.read.parquet(f"{out}/matched").collect()
    )
    assert len(first) > 0 and len(first) == len(set(first))

    # full replay into the same out_dir
    q = jobs.conflate_stream(stream_df(), layer, out, str(tmp_path / "ck2"))
    q.awaitTermination()
    second = sorted(
        (r.image_id, r.feature_id)
        for r in spark.read.parquet(f"{out}/matched").collect()
    )
    assert second == first
