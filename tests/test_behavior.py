"""Behavioral operators: sequential funnel, cohort retention, anomalies."""

from __future__ import annotations

from conftest import ts

from ecommerce_data_pipeline_spark.operators import behavior as bh


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )


def test_funnel_requires_step_order(spark):
    df = _events(
        spark,
        [
            # u1 completes in order: view < click < purchase
            (1, ts("2024-01-01T10:00:00"), "view", 0.0),
            (1, ts("2024-01-01T10:05:00"), "click", 0.0),
            (1, ts("2024-01-01T10:10:00"), "purchase", 5.0),
            # u2 clicked BEFORE first view -> stops at step 1
            (2, ts("2024-01-01T09:00:00"), "click", 0.0),
            (2, ts("2024-01-01T09:30:00"), "view", 0.0),
            # u3 never viewed -> not in funnel at all
            (3, ts("2024-01-01T11:00:00"), "purchase", 1.0),
        ],
    )
    out = {
        r["event_type"]: (r["step"], r["users"], r["pct_of_first"])
        for r in bh.funnel_steps(df, ["view", "click", "purchase"]).collect()
    }
    assert out["view"] == (1, 2, 1.0)
    assert out["click"] == (2, 1, 0.5)
    assert out["purchase"] == (3, 1, 0.5)


def test_funnel_anchor_advances_not_first_click(spark):
    # click1 < view < click2: the step-2 anchor must be click2 (after view),
    # and a purchase between click1 and click2 must NOT count.
    df = _events(
        spark,
        [
            (1, ts("2024-01-01T09:00:00"), "click", 0.0),
            (1, ts("2024-01-01T10:00:00"), "view", 0.0),
            (1, ts("2024-01-01T10:30:00"), "purchase", 1.0),
            (1, ts("2024-01-01T11:00:00"), "click", 0.0),
        ],
    )
    rows = bh.funnel_users(df, ["view", "click", "purchase"]).collect()
    assert rows == []  # purchase predates the valid click anchor
    two = bh.funnel_users(df, ["view", "click"]).collect()
    assert len(two) == 1 and two[0]["completed_ts"] == ts("2024-01-01T11:00:00")


def test_retention_matrix_offsets(spark):
    df = _events(
        spark,
        [
            # u1 first seen Mon 2024-01-01 week; active again 2 weeks later
            (1, ts("2024-01-02T10:00:00"), "view", 0.0),
            (1, ts("2024-01-16T10:00:00"), "click", 0.0),
            # u2 same cohort, only week 0 (two events, one distinct week)
            (2, ts("2024-01-03T10:00:00"), "view", 0.0),
            (2, ts("2024-01-04T10:00:00"), "view", 0.0),
        ],
    )
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r["users"]
        for r in bh.retention_matrix(df).collect()
    }
    assert out == {("2024-01-01", 0): 2, ("2024-01-01", 2): 1}


def test_minute_anomalies_flags_spike(spark):
    rows = []
    # 30 calm minutes at $1.00, then a $500 spike
    for i in range(30):
        rows.append((1, ts(f"2024-01-01T10:{i:02d}:00"), "purchase", 1.0))
    # tiny jitter so trailing stddev > 0
    rows[5] = (1, ts("2024-01-01T10:05:00"), "purchase", 1.2)
    rows.append((1, ts("2024-01-01T10:30:00"), "purchase", 500.0))
    df = _events(spark, rows)
    out = bh.minute_value_anomalies(df, min_history=10, lookback=60)
    flagged = {str(r["minute_bucket"]) for r in out.filter("is_anomaly").collect()}
    assert flagged == {"2024-01-01 10:30:00"}
    # early minutes (insufficient history) are unscored, not flagged
    early = out.filter("minute_bucket < timestamp'2024-01-01 10:10:00'").collect()
    assert all(r["z"] is None and not r["is_anomaly"] for r in early)


def _state_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, state string, ts timestamp, event_id long"
    )


def test_scd2_incremental_equals_rebuild(spark):
    from ecommerce_data_pipeline_spark.operators.state import (
        scd2_apply,
        scd2_collapse,
    )

    batch1 = _state_events(
        spark,
        [
            (1, "created", ts("2024-01-01T10:00:00"), 1),
            (1, "created", ts("2024-01-01T10:05:00"), 2),  # dup: collapses
            (1, "paid", ts("2024-01-01T11:00:00"), 3),
            (2, "created", ts("2024-01-01T09:00:00"), 4),
        ],
    )
    batch2 = _state_events(
        spark,
        [
            (1, "shipped", ts("2024-01-02T08:00:00"), 5),
            (2, "created", ts("2024-01-02T09:00:00"), 6),  # same state: no-op
            (3, "created", ts("2024-01-02T10:00:00"), 7),  # brand-new key
        ],
    )
    kw = dict(key_col="user_id", state_col="state", ts_col="ts", order_col="event_id")
    incr = scd2_apply(scd2_collapse(batch1, **kw), batch2, **kw)
    full = scd2_collapse(batch1.unionByName(batch2), **kw)
    key = lambda r: (r["user_id"], str(r["valid_from"]))  # noqa: E731
    as_map = lambda df: {  # noqa: E731
        key(r): (r["state"], str(r["valid_to"]), r["is_current"])
        for r in df.collect()
    }
    assert as_map(incr) == as_map(full)
    # untouched key 2 kept exactly one open row; dup states never split
    rows = {r["user_id"]: [] for r in incr.collect()}
    for r in incr.collect():
        rows[r["user_id"]].append(r)
    assert len(rows[2]) == 1 and rows[2][0]["is_current"]
    assert [r["state"] for r in sorted(rows[1], key=lambda r: r["valid_from"])] == [
        "created",
        "paid",
        "shipped",
    ]


def test_quarantine_split_and_null_semantics(spark):
    from pyspark.sql import functions as F

    from ecommerce_data_pipeline_spark.quality import quarantine

    df = spark.createDataFrame(
        [(1, 10.0, "click"), (2, -5.0, "click"), (3, None, "view"), (4, 1.0, "bogus")],
        "id long, value double, event_type string",
    )
    good, bad = quarantine(
        df,
        {
            "non_negative": F.col("value") >= 0,
            "known_type": F.col("event_type").isin("click", "view"),
        },
    )
    good_ids = sorted(r["id"] for r in good.collect())
    bad_map = {
        r["id"]: list(r["failed_rules"]) for r in bad.collect()
    }
    assert good_ids == [1]
    assert bad_map[2] == ["non_negative"]
    assert bad_map[3] == ["non_negative"]  # NULL value -> constraint failure
    assert bad_map[4] == ["known_type"]
    assert set(df.columns) == set(good.columns)  # good side is schema-clean


def test_cms_overestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from ecommerce_data_pipeline_spark.operators.sketches import (
        cms_lookup,
        cms_table,
    )

    items = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "token string"
    )
    # tiny width forces collisions; estimates must never undercount
    cms = cms_table(items, depth=3, width=4)
    probes = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1)], "token string, exact_n long"
    )
    est = {
        r["token"]: r["cms_est"]
        for r in cms_lookup(cms, probes, depth=3, width=4).collect()
    }
    assert est["a"] >= 5 and est["b"] >= 3 and est["c"] >= 1
    # sketch state is bounded by depth*width regardless of input size
    assert cms.count() <= 3 * 4
    # mergeability: sum of two half-sketches == sketch of the union
    half1 = spark.createDataFrame([("a",)] * 5, "token string")
    half2 = spark.createDataFrame([("b",)] * 3 + [("c",)] * 1, "token string")
    h1 = cms_table(half1, depth=3, width=4)
    h2 = cms_table(half2, depth=3, width=4)
    merged = (
        h1.unionByName(h2).groupBy("i", "bucket").agg(F.sum("n").alias("n"))
    )
    full = {(r["i"], r["bucket"]): r["n"] for r in cms.collect()}
    assert {(r["i"], r["bucket"]): r["n"] for r in merged.collect()} == full
