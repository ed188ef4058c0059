"""Snapshot commits + time travel on the table seam (sources/tables.py):
the Iceberg contract — immutable snapshots, version/timestamp reads,
crash-safe pointer, expiry — on plain parquet + a JSON log."""

from __future__ import annotations

import pytest

from osm_merge_spark.sources import tables


def _df(spark, n):
    return spark.range(n).withColumnRenamed("id", "k")


def test_version_and_timestamp_travel(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    v1 = tables.commit_snapshot(_df(spark, 3), tgt)
    t_between = tables.snapshots(tgt)[-1]["ts"] + 1e-4
    v2 = tables.commit_snapshot(_df(spark, 7), tgt)
    assert (v1, v2) == (1, 2)

    assert tables.read_snapshot(spark, tgt).count() == 7           # current
    assert tables.read_snapshot(spark, tgt, version=1).count() == 3
    assert tables.read_snapshot(spark, tgt, as_of=t_between).count() == 3
    with pytest.raises(LookupError):
        tables.read_snapshot(spark, tgt, as_of=0.0)  # before first commit


def test_crash_before_pointer_swap_keeps_previous_current(spark, tmp_path):
    """A half-written snapshot (data present, log/pointer not advanced)
    must be invisible to readers and safely overwritten by the next
    commit — the commit point is the pointer swap, not the data write."""
    import os

    tgt = str(tmp_path / "tbl")
    tables.commit_snapshot(_df(spark, 5), tgt)
    # simulate the crash: data for v2 lands, log + pointer never advance
    tables.write_table(_df(spark, 99), os.path.join(tgt, "snap-v2"))
    assert tables.read_snapshot(spark, tgt).count() == 5
    assert [s["v"] for s in tables.snapshots(tgt)] == [1]
    v2 = tables.commit_snapshot(_df(spark, 8), tgt)
    assert v2 == 2
    assert tables.read_snapshot(spark, tgt).count() == 8


def test_expire_keeps_current_and_drops_history(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    for n in (2, 4, 6):
        tables.commit_snapshot(_df(spark, n), tgt)
    expired = tables.expire_snapshots(tgt, keep_last=1)
    assert expired == [1, 2]
    assert tables.read_snapshot(spark, tgt).count() == 6
    with pytest.raises(LookupError):
        tables.read_snapshot(spark, tgt, version=1)


def test_snapshot_diff_feeds_incremental_conflation(spark, sf_dir, tmp_path):
    """The time-travel story composing with the delta-conflation story:
    two committed layer snapshots diff (exceptAll on content) into exactly
    the changed/new feature set — the increment the pruned conflation path
    (queries/geo4.q_conflate_delta) consumes instead of rebuilding the
    world. At 10^12 rows both reads are snapshot-pinned parquet scans and
    the diff is one shuffled-hash anti semantics, never a table rewrite."""
    from pyspark.sql import functions as F

    from osm_merge_spark.queries import base

    lyr = base.layer_df(spark, sf_dir).select(
        "feature_id", "version", "s_lon", "s_lat"
    )
    v1_df = lyr.filter(F.col("feature_id") % 2 == 0)
    v2_df = lyr.withColumn(
        "version",
        F.when(F.col("feature_id") % 10 == 0,
               F.col("version") + 1).otherwise(F.col("version")),
    )
    tgt = str(tmp_path / "layer_tbl")
    tables.commit_snapshot(v1_df, tgt)
    tables.commit_snapshot(v2_df, tgt)

    old = tables.read_snapshot(spark, tgt, version=1)
    new = tables.read_snapshot(spark, tgt, version=2)
    delta = new.exceptAll(old)

    n_total = lyr.count()
    n_odd = lyr.filter(F.col("feature_id") % 2 == 1).count()
    n_bumped_even = lyr.filter(
        (F.col("feature_id") % 10 == 0) & (F.col("feature_id") % 2 == 0)
    ).count()
    # delta = every odd feature (absent from v1) + every even feature whose
    # version was bumped (content changed)
    assert delta.count() == n_odd + n_bumped_even
    assert 0 < delta.count() < n_total
    # and the delta contains no unchanged row
    assert delta.join(old, ["feature_id", "version", "s_lon", "s_lat"],
                      "left_semi").count() == 0


def test_expire_keep_last_zero_keeps_only_current(spark, tmp_path):
    """keep_last=0 means "only the current pointer survives" — a bare
    snaps[-0:] slice would keep everything and make expiry a no-op."""
    tgt = str(tmp_path / "tbl")
    for n in (2, 4, 6):
        tables.commit_snapshot(_df(spark, n), tgt)
    expired = tables.expire_snapshots(tgt, keep_last=0)
    assert expired == [1, 2]
    assert [s["v"] for s in tables.snapshots(tgt)] == [3]
    assert tables.read_snapshot(spark, tgt).count() == 6


def test_missing_current_falls_back_to_latest_logged(spark, tmp_path):
    """Crash window on the FIRST commit: log appended, pointer swap never
    ran. The latest logged snapshot is the only committed state — a
    default read resumes from it instead of raising FileNotFoundError."""
    import os

    tgt = str(tmp_path / "tbl")
    tables.commit_snapshot(_df(spark, 5), tgt)
    os.remove(os.path.join(tgt, "_current"))
    assert tables.read_snapshot(spark, tgt).count() == 5


def test_compact_snapshot_reduces_files_preserves_rows(spark, tmp_path):
    """Compaction rewrites the current snapshot into fewer files as a NEW
    version: same rows, old versions' files untouched (time travel)."""
    import glob

    tgt = str(tmp_path / "tbl")
    # commit a deliberately fragmented snapshot (32 files of ~nothing)
    tables.commit_snapshot(_df(spark, 500).repartition(32), tgt)
    before = glob.glob(f"{tgt}/snap-v1/*.parquet")
    assert len(before) == 32
    v = tables.compact_snapshot(spark, tgt, target_bytes=1 << 30)
    assert v == 2
    after = glob.glob(f"{tgt}/snap-v2/*.parquet")
    assert len(after) == 1
    cur = tables.read_snapshot(spark, tgt)
    old = tables.read_snapshot(spark, tgt, version=1)
    assert cur.count() == old.count() == 500
    assert cur.exceptAll(old).count() == 0
    # v1's fragmented files survive for pinned readers
    assert len(glob.glob(f"{tgt}/snap-v1/*.parquet")) == 32


def test_compaction_preserves_snapshot_diff_semantics(spark, sf_dir, tmp_path):
    """Maintenance must be invisible to queries: after compacting the
    current (v2) snapshot into v3, the v-pinned diff v2∖v1 is unchanged,
    and the CURRENT-vs-v1 diff through the compacted table equals it row
    for row — rewrite_data_files semantics, not a content change."""
    from pyspark.sql import functions as F

    from osm_merge_spark.queries import base

    lyr = base.layer_df(spark, sf_dir).select(
        "feature_id", "version", "s_lon", "s_lat"
    )
    v1_df = lyr.filter(F.col("feature_id") % 2 == 0)
    v2_df = lyr.withColumn(
        "version",
        F.when(F.col("feature_id") % 10 == 0,
               F.col("version") + 1).otherwise(F.col("version")),
    )
    tgt = str(tmp_path / "layer_tbl")
    tables.commit_snapshot(v1_df.repartition(16), tgt)
    tables.commit_snapshot(v2_df.repartition(16), tgt)
    before = tables.read_snapshot(spark, tgt, version=2) \
        .exceptAll(tables.read_snapshot(spark, tgt, version=1))
    n_before = before.count()

    v3 = tables.compact_snapshot(spark, tgt, target_bytes=1 << 30)
    assert v3 == 3
    cur = tables.read_snapshot(spark, tgt)  # now the compacted v3
    after = cur.exceptAll(tables.read_snapshot(spark, tgt, version=1))
    assert after.count() == n_before
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0
