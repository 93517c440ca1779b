"""Data-quality assertions — dbt-test parity as Spark checks (SURVEY.md §5).

Reimplements the reference's gold schema tests
(analytics/dbt/ecom_analytics/models/gold/schema.yml:4-20: not_null ×4,
unique minute_bucket), the commented-out non-negativity expressions, and the
source-freshness SLO (models/sources.yml:6-14: error after 2h staleness on
event_ts).

Each check is a single aggregate over the table — one pass, no collect of
data rows — and returns a CheckResult; ``run_checks`` evaluates a suite and
raises on failure like ``dbt build`` failing the DAG.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    name: str
    passed: bool
    failing_rows: int
    detail: str = ""


def not_null(df: DataFrame, column: str) -> CheckResult:
    n = df.filter(F.col(column).isNull()).count()
    return CheckResult(f"not_null:{column}", n == 0, n)


def unique(df: DataFrame, column: str) -> CheckResult:
    n = (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    return CheckResult(f"unique:{column}", n == 0, n)


def non_negative(df: DataFrame, column: str) -> CheckResult:
    n = df.filter(F.col(column) < 0).count()
    return CheckResult(f"non_negative:{column}", n == 0, n)


def freshness(
    df: DataFrame,
    ts_column: str,
    error_after: dt.timedelta = dt.timedelta(hours=2),
    now: dt.datetime | None = None,
) -> CheckResult:
    """Source freshness: max(ts) must be within ``error_after`` of now.
    ``now`` is injectable for deterministic tests."""
    row = df.agg(F.max(ts_column).alias("m")).first()
    max_ts = row["m"] if row else None
    if max_ts is None:
        return CheckResult(f"freshness:{ts_column}", False, 0, "table empty")
    now = now or dt.datetime.utcnow()
    stale = now - max_ts
    return CheckResult(
        f"freshness:{ts_column}",
        stale <= error_after,
        0 if stale <= error_after else 1,
        f"staleness={stale}",
    )


def gold_fact_suite(fact: DataFrame) -> list[CheckResult]:
    """The exact dbt suite on gold.fct_sales_minute (schema.yml:4-20).

    All seven checks fold into ONE two-level aggregation (per-bucket
    counts, then a global roll-up) — running them as individual jobs
    re-scanned the fact seven times, and on an every-build gate the scan
    count is the latency. Same CheckResult names and failing-row
    semantics as the primitive checks."""
    per = fact.groupBy("minute_bucket").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("gmv").isNull(), 1).otherwise(0)).alias("n_gmv"),
        F.sum(
            F.when(F.col("paid_orders").isNull(), 1).otherwise(0)
        ).alias("n_po"),
        F.sum(
            F.when(F.col("processed_ts").isNull(), 1).otherwise(0)
        ).alias("n_pts"),
        F.sum(F.when(F.col("gmv") < 0, 1).otherwise(0)).alias("n_neg_gmv"),
        F.sum(
            F.when(F.col("paid_orders") < 0, 1).otherwise(0)
        ).alias("n_neg_po"),
    )
    row = per.agg(
        F.sum(
            F.when(F.col("minute_bucket").isNull(), F.col("c")).otherwise(0)
        ).alias("nb"),
        F.sum("n_gmv").alias("ng"),
        F.sum("n_po").alias("np"),
        F.sum("n_pts").alias("nt"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("dups"),
        F.sum("n_neg_gmv").alias("neg_g"),
        F.sum("n_neg_po").alias("neg_p"),
    ).first()
    c = {
        k: int(row[k] or 0)
        for k in ("nb", "ng", "np", "nt", "dups", "neg_g", "neg_p")
    }
    return [
        CheckResult("not_null:minute_bucket", c["nb"] == 0, c["nb"]),
        CheckResult("not_null:gmv", c["ng"] == 0, c["ng"]),
        CheckResult("not_null:paid_orders", c["np"] == 0, c["np"]),
        CheckResult("not_null:processed_ts", c["nt"] == 0, c["nt"]),
        CheckResult("unique:minute_bucket", c["dups"] == 0, c["dups"]),
        CheckResult("non_negative:gmv", c["neg_g"] == 0, c["neg_g"]),
        CheckResult("non_negative:paid_orders", c["neg_p"] == 0, c["neg_p"]),
    ]


def run_checks(results: list[CheckResult]) -> None:
    failed = [r for r in results if not r.passed]
    if failed:
        lines = ", ".join(f"{r.name}({r.failing_rows} rows {r.detail})" for r in failed)
        raise AssertionError(f"quality checks failed: {lines}")


def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Row-level expectations: split ``df`` into (good, bad) on named
    boolean rules (True = row passes). Bad rows carry ``failed_rules``,
    the sorted array of rule names they violated — dbt
    ``store_failures`` / Delta table-constraint semantics, expressed as
    one projection + filter (no shuffle, stays in codegen; each side
    re-reads the same scan, or cache upstream to split one pass).

    A null rule result counts as a FAILURE (constraint semantics: the
    row could not be proven valid), unlike SQL WHERE.
    """
    failed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(~F.coalesce(expr, F.lit(False)), F.lit(name))
                    for name, expr in rules.items()
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    tagged = df.withColumn("failed_rules", failed)
    good = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    bad = tagged.filter(F.size("failed_rules") > 0)
    return good, bad



def _quality_metrics(df: DataFrame) -> list[Column]:
    cols = set(df.columns)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if "order_id" in cols:
        metrics.append(
            F.sum(F.col("order_id").isNull().cast("long")).alias("null_keys")
        )
    if "total_amount" in cols:
        metrics.append(
            F.sum((F.col("total_amount") < 0).cast("long")).alias(
                "negative_amounts"
            )
        )
    return metrics


def observe_quality(df: DataFrame, name: str = "quality"):
    """Attach IN-FLIGHT quality metrics via ``Dataset.observe``: row count,
    null keys, negative amounts accumulate WHILE the frame's real action
    runs — zero extra passes over the data, unlike the assertion suite
    above which is one aggregate job per check. dbt-test economics
    inverted: the pipeline pays nothing for observability and the metrics
    arrive with the write.

    Batch: returns ``(observed_df, Observation)`` — run any action, then
    ``observation.get`` yields the metrics dict. Streaming: returns
    ``(observed_df, None)`` — per-batch metrics surface through
    ``StreamingQueryProgress.observedMetrics[name]`` (the ST6 freshness
    probe without a second query).
    """
    from pyspark.sql.observation import Observation

    metrics = _quality_metrics(df)
    if df.isStreaming:
        return df.observe(name, *metrics), None
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
