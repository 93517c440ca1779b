"""Behavioral analytics over the event stream: sequential funnels, cohort
retention, and rolling anomaly detection.

The reference serves its event stream to Metabase dashboards
(README.md:154-190) but ships no behavioral queries beyond the minute fact;
these are the operators an analytics user of that stack reaches for next,
built Spark-first:

- funnels / retention shuffle on ``user_id`` only (co-partitioned joins —
  every stage reuses the same hash partitioning, AQE merges them);
- anomaly windows run over the *aggregated* minute series, which is tiny at
  any raw-data scale (one row per minute: a year of 100 TB ingest is still
  ~525k rows), so the single-partition ORDER BY window is a non-issue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Sequential (ordered) funnel: a user converts at step k iff they have
    an event of type ``steps[k]`` strictly after their first qualifying
    event of step k-1.

    Classic "first-touch" funnel semantics: step 1 anchors at the user's
    earliest ``steps[0]`` event; each later step takes the earliest event
    after the previous step's anchor. Output one row per step:
    (step INT 1-based, event_type, users BIGINT, pct_of_first DOUBLE).

    Scale: each stage is ``filter → groupBy(user)`` then an equi-join on
    ``user_id`` with the previous anchor frame — all stages hash-partition
    on the same key, so AQE/Exchange reuse keeps this at one effective
    shuffle of each step's filtered slice; the per-step outputs are
    single-row aggregates unioned lazily (ONE job, no driver-side counts),
    and the pct_of_first denominator arrives via a 1-row broadcast join.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")

    anchor_frames = _anchor_cascade(events, steps, user_col, ts_col, type_col)
    step_counts = [
        a.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i + 1).alias("step"),
            F.lit(steps[i]).alias("event_type"),
            "users",
        )
        for i, a in enumerate(anchor_frames)
    ]
    unioned = step_counts[0]
    for frame in step_counts[1:]:
        unioned = unioned.unionByName(frame)
    first = F.broadcast(
        anchor_frames[0].agg(F.count(F.lit(1)).alias("first_users"))
    )
    return unioned.crossJoin(first).select(
        "step",
        "event_type",
        "users",
        F.round(
            F.col("users") / F.greatest(F.col("first_users"), F.lit(1)), 4
        ).alias("pct_of_first"),
    )


def _anchor_cascade(
    events: DataFrame,
    steps: list[str],
    user_col: str,
    ts_col: str,
    type_col: str,
) -> list[DataFrame]:
    """Per-step anchor frames (user_id, anchor_ts): frame k holds the users
    who completed steps 0..k in order, anchored at their step-k time."""
    u, t = F.col(user_col), F.col(ts_col)
    anchors = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias("user_id"))
        .agg(F.min(t).alias("anchor_ts"))
    )
    frames = [anchors]
    for step in steps[1:]:
        anchors = (
            events.filter(F.col(type_col) == step)
            .select(u.alias("user_id"), t.alias("ts"))
            .join(anchors, "user_id")
            .filter(F.col("ts") > F.col("anchor_ts"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("anchor_ts"))
        )
        frames.append(anchors)
    return frames


def funnel_users(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Distributed form of :func:`funnel_steps`: the per-user anchor frame
    after the full cascade, one row per user who completed every step —
    (user_id, completed_ts). Use this as a building block when the funnel
    output feeds another join."""
    frames = _anchor_cascade(events, steps, user_col, ts_col, type_col)
    return frames[-1].select(
        "user_id", F.col("anchor_ts").alias("completed_ts")
    )


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = Monday-truncated week of the user's
    first event; a (cohort, offset) cell counts users from that cohort with
    any activity ``offset`` whole weeks later.

    Output: (cohort_week DATE, week_offset INT, users BIGINT). The offset-0
    cell is the cohort size, so retention % is users / users@offset0.

    Scale: first-event is one ``groupBy(user)``; activity is a
    user×week ``distinct`` (same user_id hash partitioning); the join is
    co-partitioned on user_id and the final rollup groups a frame already
    reduced to one row per user-week. No skew risk beyond power users,
    which the distinct bounds at O(weeks) rows per user.
    """
    u, t = F.col(user_col), F.col(ts_col)
    week = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731

    firsts = (
        events.groupBy(u.alias("user_id"))
        .agg(F.min(t).alias("first_ts"))
        .select("user_id", week(F.col("first_ts")).alias("cohort_week"))
    )
    active = events.select(
        u.alias("user_id"), week(t).alias("active_week")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )


def minute_value_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str | None = "event_type",
    event_type: str | None = "purchase",
    lookback: int = 60,
    min_history: int = 30,
    z_threshold: float = 2.5,
) -> DataFrame:
    """Rolling z-score anomaly detection on the minute-bucketed value series.

    Aggregates the (optionally type-filtered) events to one row per minute
    (cents-exact sum, order-independent), then scores each minute against
    the trailing ``lookback``-minute window (current row excluded):
    z = (x - mean) / stddev. Minutes with fewer than ``min_history``
    trailing points are unscored.

    Output: (minute_bucket TIMESTAMP, minute_value DOUBLE, z DOUBLE,
    is_anomaly BOOLEAN) — z rounded to 4 dp for cross-engine stability.

    Scale: the raw scan + minute groupBy is the only data-sized stage
    (map-side partial agg, one shuffle on minute). The window runs on the
    post-aggregation series — one row per minute, ~0.5M rows/year no
    matter the input size — so the unpartitioned ORDER BY window is cheap
    by construction; partition it by day/week only if the series itself
    ever outgrows one executor.
    """
    src = events
    if type_col is not None and event_type is not None:
        src = src.filter(F.col(type_col) == event_type)

    cents: Column = F.round(F.col(value_col) * 100).cast("long")
    per_minute = (
        src.groupBy(F.date_trunc("minute", F.col(ts_col)).alias("minute_bucket"))
        .agg((F.sum(cents) / 100.0).alias("minute_value"))
    )
    w = (
        Window.orderBy("minute_bucket")
        .rowsBetween(-lookback, -1)
    )
    mean = F.avg("minute_value").over(w)
    sd = F.stddev_samp("minute_value").over(w)
    n = F.count(F.lit(1)).over(w)
    z = F.when(
        (n >= min_history) & (sd > 0),
        F.round((F.col("minute_value") - mean) / sd, 4),
    )
    return per_minute.select(
        "minute_bucket",
        "minute_value",
        z.alias("z"),
        (F.abs(F.coalesce(z, F.lit(0.0))) > z_threshold).alias("is_anomaly"),
    )
