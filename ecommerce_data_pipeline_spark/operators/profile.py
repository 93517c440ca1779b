"""Single-pass table profiling — the Deequ/dbt-profiler analyzer tier.

Every curation decision upstream of a 100 TB training run starts from a
table profile: null fractions before imputation, NDVs before choosing a
join strategy or bucketing count, value ranges before binning. Running
one job per column per metric re-scans the table O(columns × metrics)
times; this operator computes the whole profile in ONE aggregation over
ONE scan:

- ``count(distinct col)`` for every column in the same Aggregate —
  Catalyst rewrites multi-distinct aggs into a single Expand + two-level
  aggregation, so the table is read once and the ×k row expansion is
  map-side (never shuffled raw).
- Null counts, min/max and cents-exact means ride the same pass as plain
  conditional aggregates.
- The wide 1-row result is unpivoted driver-side into one row per column
  (a k-element literal stack, no second scan).

Determinism discipline: numeric means are cents-exact (int64 cents sum /
count, rounded once) so the profile hash never depends on float fold
order — same rule as functions.money_sum. Min/max are reported in the
column's own domain cast to double (numerics) or as plain strings, never
engine-formatted timestamps.

Reference parity: the reference has no profiling surface (its dbt tests
assert fixed expectations; analytics/dbt/.../schema.yml) — this is the
analyzer that DERIVES those expectations, an extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def column_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_ndv: bool = False,
    rsd: float = 0.05,
    avg_scale: int = 100,
) -> DataFrame:
    """One row per column: ``(col_name, n_rows, n_nulls, ndv, min_num,
    max_num, avg_num, min_str, max_str)`` — numeric stats null for string
    columns and vice versa. One scan, one Aggregate, regardless of how
    many columns are profiled.

    ``approx_ndv=True`` swaps exact ``count(distinct)`` for
    ``approx_count_distinct`` (HyperLogLog++, relative error ``rsd``):
    the 100 TB default — the exact path's Expand shuffles one record per
    distinct value per column, while the HLL sketch keeps the shuffle at
    O(partitions × sketch bytes) and needs no Expand at all. Exact mode
    stays the ORACLE-certified path (sketches aren't cross-engine
    deterministic); the approx path is bound-tested instead
    (tests/test_profile_fileindex.py).

    ``avg_scale`` is the mean's fixed-point quantum: values are summed
    as ``round(v * avg_scale)`` int64 units so the mean never depends on
    float fold order. The default 100 (cents) fits money columns; for
    sub-cent domains (rates, probabilities, normalized scores) pass 10^d
    for d significant decimals — at the default a 0.003-scale column's
    mean quantizes to 0.0 while its min/max stay exact. Int64 bound:
    |v| × avg_scale × n_rows must stay under ~9.2e18 (the money_sum
    arithmetic bound, SCALE.md §10)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"columns not in frame: {unknown}")

    # Parallelism-adaptive spread (guide §2: scale-adaptive partitioning,
    # not a constant): string min/max buffers are not UnsafeRow-mutable,
    # so this aggregation plans as SortAggregate — and over a single-file
    # input the whole Expand+sort+partial-agg leg runs on ONE task. Only
    # rebalance when the scan has fewer splits than cores (the small/local
    # case); a production many-file table is already parallel and must not
    # pay a full-table shuffle here.
    if cols:
        sc = df.sparkSession.sparkContext
        if df.rdd.getNumPartitions() < sc.defaultParallelism:
            df = df.select(*dict.fromkeys(cols)).repartition(
                sc.defaultParallelism
            )

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
        )
        aggs.append(
            (
                F.approx_count_distinct(F.col(c), rsd)
                if approx_ndv
                else F.count_distinct(F.col(c))
            ).alias(f"__ndv_{c}")
        )
        if isinstance(dt, NumericType):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
            # Fixed-point-exact mean: int64 unit sum / non-null count, one
            # rounded division — no float accumulation order anywhere.
            aggs.append(
                F.sum(
                    F.round(F.col(c) * avg_scale).cast("long")
                ).alias(f"__cs_{c}")
            )
            aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        elif isinstance(dt, StringType):
            aggs.append(F.min(F.col(c)).alias(f"__smin_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__smax_{c}"))
    wide = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = []
    for c in cols:
        dt = fields[c]
        numeric = isinstance(dt, NumericType)
        stringy = isinstance(dt, StringType)
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__ndv_{c}").alias("ndv"),
                (F.col(f"__min_{c}") if numeric else null_d).alias("min_num"),
                (F.col(f"__max_{c}") if numeric else null_d).alias("max_num"),
                (
                    F.round(
                        F.col(f"__cs_{c}")
                        / F.lit(float(avg_scale))
                        / F.nullif(F.col(f"__nn_{c}"), F.lit(0)),
                        6,
                    )
                    if numeric
                    else null_d
                ).alias("avg_num"),
                (F.col(f"__smin_{c}") if stringy else null_s).alias("min_str"),
                (F.col(f"__smax_{c}") if stringy else null_s).alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def profile_oracle_sql(table: str, cols: dict[str, str], avg_scale: int = 100) -> str:
    """DuckDB twin of ``column_profile`` for oracle certification:
    ``cols`` maps column → 'num' | 'str' | 'other' (nulls+ndv only). Emitted as one UNION ALL over
    per-column single-row aggregates (DuckDB folds them into one scan of
    a parquet view; the SHAPE matches the Spark result exactly).
    ``avg_scale`` must equal the ``column_profile`` call's fixed-point
    quantum (default 100 = cents) — it is emitted into the SQL so a
    non-default profile can't silently hash-mismatch its oracle."""
    parts = []
    for c, kind in cols.items():
        if kind == "num":
            mins = f"CAST(min({c}) AS DOUBLE)"
            maxs = f"CAST(max({c}) AS DOUBLE)"
            avgs = (
                f"round(sum(CAST(round({c} * {avg_scale}) AS BIGINT)) "
                f"/ {float(avg_scale)} / nullif(count({c}), 0), 6)"
            )
            smin = "CAST(NULL AS VARCHAR)"
            smax = "CAST(NULL AS VARCHAR)"
        elif kind == "str":
            mins = maxs = avgs = "CAST(NULL AS DOUBLE)"
            smin = f"min({c})"
            smax = f"max({c})"
        else:
            mins = maxs = avgs = "CAST(NULL AS DOUBLE)"
            smin = smax = "CAST(NULL AS VARCHAR)"
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows,\n"
            f"  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS n_nulls,\n"
            f"  count(DISTINCT {c}) AS ndv,\n"
            f"  {mins} AS min_num, {maxs} AS max_num, {avgs} AS avg_num,\n"
            f"  {smin} AS min_str, {smax} AS max_str\n"
            f"FROM {table}"
        )
    return "\nUNION ALL\n".join(parts)
