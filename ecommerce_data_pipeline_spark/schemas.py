"""Schema contracts (SURVEY.md §1.4).

Hand-declared StructTypes for the event envelopes and medallion tables —
schema-on-read with null-tolerant ``from_json`` exactly like the reference
(analytics/spark/jobs/silver_orders.py:11-29, silver_payments.py:11-17):
unknown JSON fields are dropped, missing fields become null, and a malformed
document yields an all-null struct rather than a failed job. At 100 TB this
matters: one poison record must never kill a stream.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Event envelopes (docs/events.md:15-31; services/order/app/api/routes.py:197-215)
# ---------------------------------------------------------------------------

ORDER_ITEM_SCHEMA = StructType(
    [
        StructField("product_id", IntegerType()),
        StructField("qty", IntegerType()),
        StructField("price", DoubleType()),
    ]
)

# order.created payload (silver_orders.py:11-29). `shipping` is an opaque
# struct in the reference (empty StructType placeholder); we keep it as a
# string blob via get_json_object when needed instead of a brittle subschema.
ORDER_EVENT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("event_version", StringType()),
        StructField("trace_id", StringType()),
        StructField("order_id", StringType()),
        StructField("user_id", StringType()),
        StructField("items", ArrayType(ORDER_ITEM_SCHEMA)),
        StructField("currency", StringType()),
        StructField("total_amount", DoubleType()),
        StructField("status", StringType()),
        StructField("event_time", StringType()),
        StructField("event_id", StringType()),
    ]
)

# payment.succeeded flat payload (services/payment/app/api/routes.py:87-93):
# {"type": ..., "order_id": int, "amount_cents": long, "currency", "user_email"}
PAYMENT_EVENT_SCHEMA = StructType(
    [
        StructField("type", StringType()),
        StructField("order_id", LongType()),
        StructField("amount_cents", LongType()),
        StructField("currency", StringType()),
        StructField("user_email", StringType()),
    ]
)

# Generic driver-testdata event props ({"k": int} JSON in events.props).
EVENT_PROPS_SCHEMA = StructType([StructField("k", IntegerType())])

# ---------------------------------------------------------------------------
# Medallion table contracts (README.md:119-135 of the reference)
# ---------------------------------------------------------------------------

# bronze_raw.*_raw (bronze_orders_raw.py:45-53)
BRONZE_RAW_SCHEMA = StructType(
    [
        StructField("raw_key", StringType()),
        StructField("raw_value", StringType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("kafka_timestamp", TimestampType()),
        StructField("ingest_ts", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

# silver.orders_clean (silver_orders.py:52-70)
SILVER_ORDERS_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("kafka_timestamp", TimestampType()),
        StructField("event_type", StringType()),
        StructField("order_id", StringType()),
        StructField("user_id", StringType()),
        StructField("items", ArrayType(ORDER_ITEM_SCHEMA)),
        StructField("currency", StringType()),
        StructField("total_amount", DoubleType()),
        StructField("status", StringType()),
        StructField("event_time", StringType()),
        StructField("event_id", StringType()),
        StructField("ingest_ts", TimestampType()),
        StructField("event_ts", TimestampType()),
        StructField("event_date", DateType()),
    ]
)

# silver.payments_clean (silver_payments.py:39-58)
SILVER_PAYMENTS_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("kafka_timestamp", TimestampType()),
        StructField("order_id", StringType()),
        StructField("amount", DoubleType()),
        StructField("currency", StringType()),
        StructField("status", StringType()),
        StructField("method", StringType()),
        StructField("event_time", StringType()),
        StructField("ingest_ts", TimestampType()),
        StructField("event_id", StringType()),
        StructField("payment_id", StringType()),
        StructField("event_ts", TimestampType()),
        StructField("event_date", DateType()),
    ]
)

# silver.order_payments_enriched (silver_enrich.py:32-44)
ENRICHED_SCHEMA = StructType(
    [
        StructField("order_id", StringType()),
        StructField("user_id", StringType()),
        StructField("total_amount", DoubleType()),
        StructField("currency", StringType()),
        StructField("paid_amount", DoubleType()),
        StructField("fully_paid", BooleanType()),
        StructField("order_ts", TimestampType()),
        StructField("last_payment_ts", TimestampType()),
        StructField("updated_ts", TimestampType()),
    ]
)

# gold.fct_sales_minute (fct_sales_minute.sql:29-41)
FCT_SALES_MINUTE_SCHEMA = StructType(
    [
        StructField("minute_bucket", TimestampType()),
        StructField("gmv", DoubleType()),
        StructField("paid_orders", LongType()),
        StructField("processed_ts", TimestampType()),
    ]
)
