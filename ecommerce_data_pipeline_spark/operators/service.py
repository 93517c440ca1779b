"""Service-tier aggregates re-expressed as Spark operators (SURVEY.md §2.4
A5/A6).

The reference computes these row-at-a-time in Python microservices:

- A5 cart total: ``total += qty * unit_price_cents`` per cart item
  (services/order/app/api/routes.py:140-147) — integer cents.
- A6 inventory counters: reserve/commit/restock arithmetic under row locks
  (services/catalog/app/api/inventory.py:52-125).

Here they are set-oriented: one hash aggregation each, cents-exact money
discipline (functions.money_sum rationale). At 100 TB both are single
shuffles on their natural keys; the order-status join for A6 lets AQE pick
broadcast vs shuffle by actual side size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cart_totals(lineitem: DataFrame) -> DataFrame:
    """A5: per-order cart total in integer cents, reported as dollars.

    unit_price_cents = round(extendedprice/qty * 100) mirrors the OLTP
    schema's integer-cents unit price (init_catalog.py:16); the sum is exact
    int64 arithmetic, so the result is bit-stable across partial-agg orders.
    Output: (order_id, n_items, cart_total).
    """
    unit_cents = F.round(
        F.col("l_extendedprice") / F.col("l_quantity") * 100
    ).cast("long")
    return (
        lineitem.groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (
                F.sum(F.col("l_quantity").cast("long") * unit_cents) / F.lit(100.0)
            ).alias("cart_total"),
        )
    )


def inventory_counters(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """A6: per-product inventory movement counters.

    Models the reference's reserve/commit counters over the order stream:
    open orders ('O') hold reservations, fulfilled ('F') are committed
    stock movements. One join + one hash agg on product id.
    Output: (product_id, reserved_qty, committed_qty, n_movements).
    """
    status = orders.select(
        F.col("o_orderkey").alias("l_orderkey"), F.col("o_orderstatus").alias("status")
    )
    qty = F.col("l_quantity").cast("long")
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_quantity")
        .join(status, "l_orderkey")
        .groupBy(F.col("l_partkey").alias("product_id"))
        .agg(
            F.sum(F.when(F.col("status") == "O", qty).otherwise(F.lit(0))).alias(
                "reserved_qty"
            ),
            F.sum(F.when(F.col("status") == "F", qty).otherwise(F.lit(0))).alias(
                "committed_qty"
            ),
            F.count(F.lit(1)).alias("n_movements"),
        )
    )


def reconcile_orders_payments(orders: DataFrame, payments: DataFrame) -> DataFrame:
    """Per-order ledger reconciliation via **cogrouped applyInPandas**: for
    each order_id, compare the order's total against the sum of its
    payment legs and classify the residue (unpaid / partial / exact /
    overpaid), with the leg count and cents-exact delta.

    The aggregate itself is expressible with groupBy+join (and the enrich
    operator does exactly that); this variant exists for the kernel shapes
    that are NOT — per-key ledger matching, ordered leg walks, FIFO
    allocation — and demonstrates the cogroup API: both sides arrive
    hash-partitioned by the key, each group as two aligned pandas frames,
    output one report row per key. One shuffle per side, no row blow-up.
    """
    import pandas as pd

    o = orders.select("order_id", "total_amount")
    p = payments.select("order_id", "amount")

    def _reconcile(key, o_pdf: pd.DataFrame, p_pdf: pd.DataFrame) -> pd.DataFrame:
        total_c = (
            round(float(o_pdf["total_amount"].iloc[0]) * 100)
            if len(o_pdf)
            else None
        )
        paid_c = int(round(p_pdf["amount"] * 100).sum()) if len(p_pdf) else 0
        if total_c is None:
            status = "orphan_payment"
            delta_c = paid_c
        elif paid_c == 0:
            status, delta_c = "unpaid", -total_c
        elif paid_c < total_c:
            status, delta_c = "partial", paid_c - total_c
        elif paid_c == total_c:
            status, delta_c = "exact", 0
        else:
            status, delta_c = "overpaid", paid_c - total_c
        return pd.DataFrame(
            {
                "order_id": [key[0]],
                "status": [status],
                "n_legs": [len(p_pdf)],
                "delta": [delta_c / 100.0],
            }
        )

    return (
        o.groupBy("order_id")
        .cogroup(p.groupBy("order_id"))
        .applyInPandas(
            _reconcile,
            schema="order_id string, status string, n_legs long, delta double",
        )
    )
