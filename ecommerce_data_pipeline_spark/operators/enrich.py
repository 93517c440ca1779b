"""Order–payment enrichment (operators A1 + J1, SURVEY.md §2.3-2.4).

Reproduces silver_enrich.py:25-44: aggregate payments per order
(sum(amount), max(event_ts)), left-join onto orders, derive
``paid_amount`` (coalesced 0.0), ``fully_paid = paid_amount >= total_amount``
and ``updated_ts = greatest(order_ts, last_payment_ts)``.

Scale notes: both sides shuffle on order_id — the natural key both tables
are already keyed by upstream (Kafka partitions by order_id), so on a real
cluster bucketing both silver tables by order_id makes this a zero-shuffle
sort-merge join. The payment aggregate is map-side-combined by Catalyst
(partial sum before shuffle). Orphan payments (no matching order) drop out
of the left join by construction — reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.functions import money_sum


def payments_per_order(payments: DataFrame) -> DataFrame:
    """A1: groupBy(order_id).agg(sum(amount), max(event_ts))
    (silver_enrich.py:25-30). The sum is cents-exact (see functions.money_sum)
    so split payments reconstruct the total bit-exactly."""
    return payments.groupBy("order_id").agg(
        money_sum("amount").alias("paid_amount_raw"),
        F.max("event_ts").alias("last_payment_ts"),
    )


def enrich_orders(orders_clean: DataFrame, payments_clean: DataFrame) -> DataFrame:
    """J1: one enriched row per order (silver_enrich.py:32-44).

    Doubles are rounded to 2dp at the money boundary so ``fully_paid``
    comparisons are stable across summation orders (SURVEY.md §7.3 risk 1).
    """
    pays = payments_per_order(payments_clean)
    return (
        orders_clean.select(
            "order_id",
            "user_id",
            F.round("total_amount", 2).alias("total_amount"),
            "currency",
            F.col("event_ts").alias("order_ts"),
        )
        .join(pays, "order_id", "left")
        .select(
            "order_id",
            "user_id",
            "total_amount",
            "currency",
            F.round(F.coalesce(F.col("paid_amount_raw"), F.lit(0.0)), 2).alias(
                "paid_amount"
            ),
            (
                F.round(F.coalesce(F.col("paid_amount_raw"), F.lit(0.0)), 2)
                >= F.round(F.col("total_amount"), 2)
            ).alias("fully_paid"),
            "order_ts",
            "last_payment_ts",
            F.greatest(
                F.col("order_ts"), F.coalesce(F.col("last_payment_ts"), F.col("order_ts"))
            ).alias("updated_ts"),
        )
    )
