"""Analytical depth: scan-heavy rollups and distribution statistics
(exact and sketch-based)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_data_pipeline_spark.functions import money_sum, money_sum_sql
from ecommerce_data_pipeline_spark.operators import curate as cu
from ecommerce_data_pipeline_spark.operators import dedup as dd
from ecommerce_data_pipeline_spark.operators import similarity as sim
from ecommerce_data_pipeline_spark.operators import text as tx
from ecommerce_data_pipeline_spark.operators import windows as win
from ecommerce_data_pipeline_spark.operators.dedup import kafka_identity_dedup
from ecommerce_data_pipeline_spark.operators.enrich import enrich_orders
from ecommerce_data_pipeline_spark.operators.fact import sales_minute_agg
from ecommerce_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media_features,
)
from ecommerce_data_pipeline_spark.operators.parse import (
    bronze_projection,
    parse_orders,
    parse_payments,
)
from ecommerce_data_pipeline_spark.operators.service import (
    cart_totals,
    inventory_counters,
)
from ecommerce_data_pipeline_spark.sources.events import orders_events, payments_events
from ecommerce_data_pipeline_spark.sources.parquet import load_table, register_views

from ecommerce_data_pipeline_spark.queries._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    register,
)


# ---------------------------------------------------------------------------
# Analytical depth: scan-heavy rollups and distribution statistics
# ---------------------------------------------------------------------------


@register(
    "lineitem_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
  sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0
    AS sum_disc_price,
  sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS BIGINT))/1000000.0
    AS sum_charge,
  round(sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 / count(*), 4) AS avg_qty,
  round(sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 / count(*), 4)
    AS avg_price,
  round(sum(CAST(round(l_discount*100) AS BIGINT))/100.0 / count(*), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical scan-heavy rollup.
    One pass over the fact table, filter pushed to the parquet scan, all
    aggregation map-side partial then a 4-group shuffle — the plan is
    scan-bound at any scale. Money math in exact integer sub-units
    (cents / 1e-4 / 1e-6) so the double sums are order-independent and
    bit-stable; at >sf1000 swap the 1e-6-unit int64 sums for
    DecimalType(38,6) (overflow headroom)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    disc_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    charge_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 1000000
    ).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
            (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
            (F.sum(disc_u) / 10000.0).alias("sum_disc_price"),
            (F.sum(charge_u) / 1000000.0).alias("sum_charge"),
            F.round((F.sum(cents("l_quantity")) / 100.0) / F.count(F.lit(1)), 4).alias("avg_qty"),
            F.round((F.sum(cents("l_extendedprice")) / 100.0) / F.count(F.lit(1)), 4).alias("avg_price"),
            F.round((F.sum(cents("l_discount")) / 100.0) / F.count(F.lit(1)), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "events_value_quantiles",
    oracle="""
SELECT event_type,
  round(quantile_cont(value, 0.5), 4) AS p50,
  round(quantile_cont(value, 0.9), 4) AS p90,
  round(quantile_cont(value, 0.99), 4) AS p99,
  count(*) AS n
FROM events GROUP BY event_type
""",
)
def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group value quantiles (linear interpolation — identical
    semantics to DuckDB quantile_cont). Exact percentile sorts each group;
    at 100 TB use the approx_percentile twin below (t-digest-style sketch,
    mergeable map-side, no per-group sort)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.9), 4).alias("p90"),
        F.round(F.percentile("value", 0.99), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


# Quantile-band half-width for the approx-vs-exact check below. Must cover
# the sketch's rank-error guarantee (eps = 1/accuracy = 1e-4) PLUS one
# discrete-rank gap at the smallest fixture group (~2k rows/group at
# sf0.001 → 1 rank ≈ 5e-4 quantile): 5e-3 covers both with margin while
# staying a tight, meaningful band. p99 + 0.005 < 1.0.
_Q_BAND = 0.005


@register(
    "events_value_quantiles_approx",
    oracle=f"""
SELECT event_type,
  round(quantile_cont(value, 0.5 - {_Q_BAND}), 4) AS p50_lo,
  round(quantile_cont(value, 0.5 + {_Q_BAND}), 4) AS p50_hi,
  TRUE AS p50_ok,
  round(quantile_cont(value, 0.9 - {_Q_BAND}), 4) AS p90_lo,
  round(quantile_cont(value, 0.9 + {_Q_BAND}), 4) AS p90_hi,
  TRUE AS p90_ok,
  round(quantile_cont(value, 0.99 - {_Q_BAND}), 4) AS p99_lo,
  round(quantile_cont(value, 0.99 + {_Q_BAND}), 4) AS p99_hi,
  TRUE AS p99_ok,
  count(*) AS n
FROM events GROUP BY event_type
""",
)
def q_events_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB formulation of events_value_quantiles: approx_percentile
    (mergeable quantile sketch, map-side combine, no sort). The sketch
    estimate itself is engine-specific, so the DETERMINISTIC contract is
    emitted instead: the exact quantile band [p-band, p+band] each
    estimate must land in (band covers the sketch's eps rank guarantee —
    see _Q_BAND) plus a boolean that it does. The oracle recomputes the
    exact bands and expects every check TRUE — a driver-hashable proof of
    the sketch's accuracy contract, per-group, any merge order."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.approx_percentile("value", F.lit(0.9), F.lit(10000)).alias("a90"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("a99"),
        *[
            F.round(F.percentile("value", p + s * _Q_BAND), 4).alias(
                f"p{int(p * 100)}_{'hi' if s > 0 else 'lo'}"
            )
            for p in (0.5, 0.9, 0.99)
            for s in (-1, 1)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    cols = ["event_type"]
    for p in (50, 90, 99):
        cols += [
            f"p{p}_lo",
            f"p{p}_hi",
            (
                (F.col(f"a{p}") >= F.col(f"p{p}_lo"))
                & (F.col(f"a{p}") <= F.col(f"p{p}_hi"))
            ).alias(f"p{p}_ok"),
        ]
    return agg.select(*cols, "n")


@register(
    "approx_distinct_users",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS exact_users,
  count(*) AS n_events, TRUE AS within_bound
FROM events GROUP BY event_type
""",
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user counts per event_type: hll_sketch_agg
    builds mergeable binary sketches map-side (fixed bytes per group —
    the shuffle is independent of cardinality), hll_sketch_estimate reads
    them out. The estimate is engine-specific, so the deterministic
    contract is emitted instead: the exact count (oracle-checkable) and a
    boolean that the estimate is within 5% of it (lgK=14 → rsd 0.81%, so
    5% is a 6-sigma bound; HLL register-max merge is order-independent,
    making the boolean stable under any partitioning)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias(
                "_est"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("_est") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("within_bound"),
        )
    )


