"""Analytical rollups and sketch-accuracy bounds (queries/analytics.py:
lineitem_pricing_summary, events_value_quantiles[_approx],
approx_distinct_users)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.queries import QUERIES
from ecommerce_data_pipeline_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_pricing_summary_shape_and_totals(spark):
    out = QUERIES["lineitem_pricing_summary"](spark, SF_DIR).collect()
    # 2 return flags x 2 line statuses max; every group has positive sums.
    assert 1 <= len(out) <= 6
    li = load_table(spark, SF_DIR, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    assert sum(r["count_order"] for r in out) == li.count()
    for r in out:
        assert r["sum_disc_price"] <= r["sum_base_price"]
        assert r["sum_charge"] >= r["sum_disc_price"]
        assert abs(r["avg_qty"] - r["sum_qty"] / r["count_order"]) < 1e-3


def test_approx_quantiles_close_to_exact(spark):
    """The approx twin emits its own accuracy contract (exact quantile
    band + in-band boolean per percentile): every check must hold and the
    bands must be well-formed and consistent with the exact twin."""
    exact = {r["event_type"]: r for r in QUERIES["events_value_quantiles"](spark, SF_DIR).collect()}
    approx = {r["event_type"]: r for r in QUERIES["events_value_quantiles_approx"](spark, SF_DIR).collect()}
    assert exact.keys() == approx.keys()
    for et, e in exact.items():
        a = approx[et]
        assert a["n"] == e["n"]
        for p in (50, 90, 99):
            assert a[f"p{p}_ok"] is True, (et, p)
            # Band brackets the exact quantile and is ordered.
            assert a[f"p{p}_lo"] <= e[f"p{p}"] <= a[f"p{p}_hi"], (et, p)


def test_hll_distinct_users_within_error_bound(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["u"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    got = {
        r["event_type"]: r
        for r in QUERIES["approx_distinct_users"](spark, SF_DIR).collect()
    }
    assert exact.keys() == got.keys()
    for et, u in exact.items():
        assert got[et]["exact_users"] == u, et
        # lgConfigK=14 → relative error ~0.8%; the query's own 5% bound.
        assert got[et]["within_bound"] is True, et


def test_sketch_table_merges_match_full_build(spark):
    """The property that makes the sketch table incrementally maintainable:
    union(first-half sketches, second-half sketches) == full-corpus
    estimate, and both land within HLL error of the exact count."""
    from ecommerce_data_pipeline_spark.operators.sketches import (
        daily_user_sketches,
        merge_sketches,
    )

    ev = load_table(spark, SF_DIR, "events")
    cut = ev.agg(
        F.date_trunc("day", F.timestamp_micros(F.expr("percentile(unix_micros(cast(ts as timestamp_ltz)), 0.5)").cast("long"))).alias("c")
    ).first()["c"]
    daily = daily_user_sketches(ev).cache()
    full = merge_sketches(daily).first()
    halves = merge_sketches(
        daily.filter(F.col("day") < cut).unionByName(daily.filter(F.col("day") >= cut))
    ).first()
    exact = ev.agg(F.countDistinct("user_id").alias("u")).first()["u"]
    assert halves["approx_distinct"] == full["approx_distinct"]  # merge-invariant
    assert full["n_events"] == ev.count()
    assert abs(full["approx_distinct"] - exact) <= max(0.05 * exact, 2)
    daily.unpersist()
