"""As-of (point-in-time) join and binned interval-overlap join.

Spark has no native ASOF JOIN (DuckDB/kdb/pandas `merge_asof` semantics:
for each left row, the single right row with the greatest right_ts <=
left_ts per key). The naive formulation — non-equi join then argmax —
explodes to |L|x|R| rows per key before pruning. This module implements
the scalable **union-sort** plan instead:

  union(tagged L, tagged R) -> one shuffle on the key ->
  per-key sort by (ts, tag) -> running last(right-row) carries each right
  row forward to every later left row -> filter tag = left.

Cost: ONE shuffle of |L|+|R| rows and one per-key sort — O((|L|+|R|) log)
per key, no intermediate blow-up, identical to what a merge-join-based
engine does natively. Skewed keys degrade to a big per-key sort, which AQE
cannot split; for a pathological single key, pre-bucket by time and patch
bucket boundaries (not needed for the reference's keyspaces).

Interval overlap joins (session-vs-session, session-vs-event) use the
standard **binned range join**: explode each interval onto fixed-width time
buckets, equi-join on (key, bucket), then apply the exact range predicate
and de-duplicate. Choosing the bucket ~= median interval length bounds the
per-row fan-out to O(1) buckets, turning the O(|A|x|B|) nested-loop plan
Catalyst would otherwise pick for a pure non-equi join into an equi-join
shuffle — the same trick as Databricks' range-join binning hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_data_pipeline_spark.functions import epoch_micros, epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "matched_",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (backward as-of,
    inclusive — DuckDB ``ASOF JOIN ... ON r.ts <= l.ts`` semantics).

    Inner-join behavior: left rows with no prior right row are dropped.
    With ``tolerance_seconds``, matches older than the tolerance are
    dropped too.

    The matched right columns come back prefixed. The right row is carried
    as a single struct through the running ``last(ignorenulls)`` so all of
    its columns come from the SAME matched row even when some of its fields
    are null.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    right_struct = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__tag"),
        right_struct.alias("__rrow"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__rrow"].dataType).alias("__rrow"),
        *[c for c in left.columns if c not in on],
    )
    # At equal timestamps the right row sorts first (__tag 0 < 1), making
    # the inclusive <= match; row_number-free, single window pass. The
    # trailing __rrow term makes ties among right rows with identical
    # (key, ts) deterministic (the struct-wise max row wins) — left rows
    # all carry null __rrow, so their relative order is unaffected.
    w = (
        Window.partitionBy(*on)
        .orderBy("__ats", "__tag", "__rrow")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__m", F.last("__rrow", ignorenulls=True).over(w))
        .filter((F.col("__tag") == 1) & F.col("__m").isNotNull())
    )
    if tolerance_seconds is not None:
        # Integer-microsecond comparison: the oracles apply the cutoff as
        # exact integer micros (gap_us <= tol*1e6); fractional-second
        # doubles carry ~5e-7 s rounding at 2026-era epochs, enough to
        # flip a boundary-exact match between engines.
        matched = matched.filter(
            epoch_micros(F.col("__ats")) - epoch_micros(F.col("__m")[right_ts])
            <= int(tolerance_seconds) * 1_000_000
        )
    out_cols = (
        [F.col(c) for c in on]
        + [F.col(c) for c in left.columns if c not in on]
        + [F.col("__m")[right_ts].alias(prefix + right_ts)]
        + [F.col("__m")[c].alias(prefix + c) for c in value_cols]
    )
    return matched.select(*out_cols)


def interval_overlap_pairs(
    intervals: DataFrame,
    id_cols: list[str],
    start_col: str = "session_start",
    end_col: str = "session_end",
    partition_col: str | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Self-join: all pairs of intervals (from DIFFERENT ``partition_col``
    groups, e.g. different users) that overlap in time:
    ``a.start <= b.end AND b.start <= a.end``.

    Binned plan: each interval lands on ``floor(start/W)..floor(end/W)``
    buckets (exploded), pairs meet on an equi-join over the bucket id, the
    exact predicate prunes, and pairs spanning several shared buckets are
    de-duplicated by keeping only the first shared bucket — a pure
    expression (`greatest` of the two start buckets), NO distinct shuffle.

    Output: a_*/b_* id columns plus both intervals' bounds (callers derive
    overlap in their preferred unit), pairs oriented a < b
    lexicographically on (partition, ids).
    """
    W = int(bucket_seconds)
    # Materialize the binned intervals once: both sides of the self-join
    # otherwise re-run the whole upstream lineage (for session overlap
    # that's two window passes over the raw event stream — per side).
    # Intervals are aggregates, orders of magnitude smaller than their
    # source events, so the checkpoint is cheap at any scale.
    binned = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(F.col(start_col)) / W).cast("long"),
                F.floor(epoch_seconds(F.col(end_col)) / W).cast("long"),
            )
        ),
    ).localCheckpoint(eager=False)
    key_cols = ([partition_col] if partition_col else []) + id_cols
    a = binned.select(
        F.col("__bucket"),
        *[F.col(c).alias(f"a_{c}") for c in key_cols],
        F.col(start_col).alias("a_start"),
        F.col(end_col).alias("a_end"),
    )
    b = binned.select(
        F.col("__bucket"),
        *[F.col(c).alias(f"b_{c}") for c in key_cols],
        F.col(start_col).alias("b_start"),
        F.col(end_col).alias("b_end"),
    )
    order_a = F.struct(*[F.col(f"a_{c}") for c in key_cols])
    order_b = F.struct(*[F.col(f"b_{c}") for c in key_cols])
    distinct_group = (
        (F.col(f"a_{partition_col}") != F.col(f"b_{partition_col}"))
        if partition_col
        else F.lit(True)
    )
    first_shared_bucket = F.greatest(
        F.floor(epoch_seconds(F.col("a_start")) / W).cast("long"),
        F.floor(epoch_seconds(F.col("b_start")) / W).cast("long"),
    )
    pairs = (
        a.join(b, "__bucket")
        .filter(distinct_group & (order_a < order_b))
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .filter(F.col("__bucket") == first_shared_bucket)
    )
    return pairs.select(
        *[F.col(f"a_{c}") for c in key_cols],
        *[F.col(f"b_{c}") for c in key_cols],
        "a_start",
        "a_end",
        "b_start",
        "b_end",
    )


def resample_locf(
    observations: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    step: str = "interval 1 hour",
    origin_trunc: str = "hour",
) -> DataFrame:
    """Hypertable-style regularization: resample an irregular per-key
    series onto a fixed grid with last-observation-carried-forward.

    Grid: per key, ``date_trunc(origin_trunc, min(ts)) .. max(ts)`` in
    ``step`` increments (sequence+explode — generated distributed, sized by
    each key's own span, no driver loop). Values: one as-of join of grid
    points against observations — the union-sort plan, so the whole
    operator is two shuffles on the key (bounds agg + as-of) regardless of
    grid density. Grid points before the first observation are dropped
    (inner as-of semantics).

    Output: key cols, grid_ts, matched_<ts_col> (the carried observation's
    time) and matched_<value_cols>.
    """
    obs = observations.select(*on, ts_col, *(value_cols or []))
    bounds = obs.groupBy(*on).agg(
        F.date_trunc(origin_trunc, F.min(ts_col)).alias("__t0"),
        F.max(ts_col).alias("__t1"),
    )
    grid = bounds.select(
        *on,
        F.explode(F.sequence("__t0", "__t1", F.expr(step))).alias("grid_ts"),
    )
    return asof_join(
        grid,
        obs,
        on=on,
        left_ts="grid_ts",
        right_ts=ts_col,
        value_cols=value_cols,
    )
