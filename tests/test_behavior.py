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
