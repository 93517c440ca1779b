"""Bronze projection + silver JSON parse (operators P1-P3, SURVEY.md §2.2).

Reference behavior being reproduced:
- P1 bronze projection: cast Kafka key/value bytes to string, rename the
  broker timestamp, stamp ``ingest_ts`` (bronze_orders_raw.py:45-53).
- P2 parse: ``from_json(raw_value, schema)`` then flatten ``j.*`` with casts
  (silver_orders.py:52-67, silver_payments.py:39-55). Null-tolerant: bad JSON
  → all-null struct, missing fields → null, row retained.
- P3 derived times: ``event_ts = to_timestamp(event_time)``,
  ``event_date = to_date(event_ts)`` (silver_orders.py:68-69); payments reuse
  the Kafka timestamp as ``event_ts`` (silver_payments.py:56).

Everything is built-in column expressions — no UDFs — so the whole parse
stays inside whole-stage codegen and scales linearly with input splits: at
100 TB this stage is embarrassingly parallel (no shuffle at all; verify with
plans.scan_report that the plan is scan→project only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.functions import (
    cents_to_dollars,
    synthetic_id,
)
from ecommerce_data_pipeline_spark.schemas import (
    ORDER_EVENT_SCHEMA,
    PAYMENT_EVENT_SCHEMA,
)

KAFKA_META_COLS = ["topic", "partition", "offset", "kafka_timestamp"]


def bronze_projection(raw: DataFrame) -> DataFrame:
    """P1: Kafka records → bronze rows (bronze_orders_raw.py:45-53).

    Accepts either binary or string key/value columns (Kafka source yields
    binary; the derived fixture stream yields string).
    """

    def _as_string(name: str) -> Column:
        return F.col(name).cast("string")

    cols = [
        _as_string("raw_key").alias("raw_key")
        if "raw_key" in raw.columns
        else _as_string("key").alias("raw_key"),
        _as_string("raw_value").alias("raw_value")
        if "raw_value" in raw.columns
        else _as_string("value").alias("raw_value"),
        F.col("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        (
            F.col("kafka_timestamp")
            if "kafka_timestamp" in raw.columns
            else F.col("timestamp").alias("kafka_timestamp")
        ),
        F.current_timestamp().alias("ingest_ts"),
        (
            F.col("timestampType").cast("int")
            if "timestampType" in raw.columns
            else F.lit(0).cast("int")
        ).alias("timestampType"),
    ]
    return raw.select(*cols)


def parse_orders(bronze: DataFrame) -> DataFrame:
    """P2+P3 for order.created → silver.orders_clean (silver_orders.py:52-70)."""
    j = F.from_json(F.col("raw_value"), ORDER_EVENT_SCHEMA).alias("j")
    return bronze.select(*KAFKA_META_COLS, j, F.col("ingest_ts")).select(
        *KAFKA_META_COLS,
        F.col("j.event_type").alias("event_type"),
        F.col("j.order_id").cast("string").alias("order_id"),
        F.col("j.user_id").alias("user_id"),
        F.col("j.items").alias("items"),
        F.col("j.currency").alias("currency"),
        F.col("j.total_amount").cast("double").alias("total_amount"),
        F.col("j.status").alias("status"),
        F.col("j.event_time").alias("event_time"),
        F.col("j.event_id").alias("event_id"),
        F.col("ingest_ts"),
        F.to_timestamp(F.col("j.event_time"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "event_ts"
        ),
        F.to_date(
            F.to_timestamp(F.col("j.event_time"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        ).alias("event_date"),
    )


def parse_payments(bronze: DataFrame) -> DataFrame:
    """P2+P3 for payment.succeeded → silver.payments_clean
    (silver_payments.py:39-58).

    Notable reference quirks preserved:
    - amounts arrive as integer cents and convert to double dollars
      (``amount_cents/100.0``, silver_payments.py:45);
    - there is no business timestamp: ``event_ts`` is the Kafka broker
      timestamp (silver_payments.py:56);
    - ``event_id``/``payment_id`` are synthetic sha256 lineage ids over the
      Kafka identity (silver_payments.py:53-54).
    """
    j = F.from_json(F.col("raw_value"), PAYMENT_EVENT_SCHEMA).alias("j")
    ident = F.concat_ws(
        ":", F.col("topic"), F.col("partition"), F.col("offset")
    )
    return bronze.select(*KAFKA_META_COLS, j).select(
        *KAFKA_META_COLS,
        F.col("j.order_id").cast("string").alias("order_id"),
        cents_to_dollars(F.col("j.amount_cents")).alias("amount"),
        F.col("j.currency").alias("currency"),
        F.lit("succeeded").alias("status"),
        F.lit(None).cast("string").alias("method"),
        F.lit(None).cast("string").alias("event_time"),
        F.lit(None).cast("timestamp").alias("ingest_ts"),
        synthetic_id("evt", ident).alias("event_id"),
        synthetic_id("pay", ident).alias("payment_id"),
        F.col("kafka_timestamp").alias("event_ts"),
        F.to_date(F.col("kafka_timestamp")).alias("event_date"),
    )
